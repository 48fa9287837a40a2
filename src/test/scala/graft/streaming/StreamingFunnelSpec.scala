package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Stateful streaming funnel specs: cross-batch progress, strictly-after
  * boundary, no-retraction posture, post-completion eviction. */
class StreamingFunnelSpec extends SparkTestBase {

  case class E(event_id: Long, user_id: Long, event_type: String, time: Long, value: Double)

  private def start(name: String) = {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[E]
    val q = StreamingFunnel.completions(mem.toDF(), Seq("signup", "view", "buy"))
      .writeStream.outputMode(OutputMode.Append).format("memory").queryName(name).start()
    (mem, q)
  }

  private def rows(name: String): Seq[(Long, Long, String, Long)] = {
    val s = spark
    s.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq.sorted
  }

  test("steps complete across micro-batches; same-ms events do not satisfy the next step") {
    val (mem, q) = start("sf_cross")
    try {
      mem.addData(E(1, 7, "signup", 100L, 0), E(2, 7, "view", 100L, 0)) // view ties → no
      q.processAllAvailable()
      assert(rows("sf_cross") == Seq((7L, 1L, "signup", 100L)))
      mem.addData(E(3, 7, "view", 200L, 0))
      q.processAllAvailable()
      mem.addData(E(4, 7, "buy", 300L, 0))
      q.processAllAvailable()
      assert(rows("sf_cross") == Seq((7L, 1L, "signup", 100L),
        (7L, 2L, "view", 200L), (7L, 3L, "buy", 300L)))
    } finally q.stop()
  }

  test("in-batch event-time ordering: a later-arriving earlier event wins within the batch") {
    val (mem, q) = start("sf_order")
    try {
      // arrival order buy(50) signup(10) view(20) — sorted by time the
      // chain completes fully in one batch
      mem.addData(E(1, 1, "buy", 50L, 0), E(2, 1, "signup", 10L, 0), E(3, 1, "view", 20L, 0))
      q.processAllAvailable()
      assert(rows("sf_order") == Seq((1L, 1L, "signup", 10L),
        (1L, 2L, "view", 20L), (1L, 3L, "buy", 50L)))
    } finally q.stop()
  }

  test("no retraction: a late would-have-been-earlier step event emits nothing; " +
    "replays after completion emit nothing") {
    val (mem, q) = start("sf_late")
    try {
      mem.addData(E(1, 1, "signup", 100L, 0), E(2, 1, "view", 500L, 0))
      q.processAllAvailable()
      // late view at 200 would have been the batch first-touch — stream keeps 500
      mem.addData(E(3, 1, "view", 200L, 0))
      q.processAllAvailable()
      assert(rows("sf_late") == Seq((1L, 1L, "signup", 100L), (1L, 2L, "view", 500L)))
      mem.addData(E(4, 1, "buy", 600L, 0))
      q.processAllAvailable()
      // completed → tombstone retained: even a fresh signup (which would
      // RESTART an evicted user) emits nothing inside the funnel TTL
      mem.addData(E(5, 1, "signup", 700L, 0), E(6, 1, "view", 750L, 0))
      q.processAllAvailable()
      assert(rows("sf_late") == Seq((1L, 1L, "signup", 100L),
        (1L, 2L, "view", 500L), (1L, 3L, "buy", 600L)))
    } finally q.stop()
  }
}
