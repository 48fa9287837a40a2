package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Session-window streaming specs: the exact-gap MERGE boundary (split
  * only at `delta > gap` — the same rule as the batch lag formulation,
  * which is what lets one oracle serve both), watermark-gated once-only
  * emission, and in-gap merge. */
class StreamingSessionsSpec extends SparkTestBase {

  case class E(event_id: Long, user_id: Long, event_type: String, time: Long, value: Double)

  private def run(name: String)(feed: MemoryStream[E] => Unit): Seq[(Long, Long, Long, Long, Double)] = {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[E]
    val q = StreamingSessions.sessions(mem.toDF(), gap = "10 seconds", lateness = "5 seconds")
      .writeStream.outputMode(OutputMode.Append).format("memory").queryName(name).start()
    try {
      feed(mem)
      q.processAllAvailable()
    } finally q.stop()
    s.table(name).collect().map(r =>
      (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime,
        r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq.sorted
  }

  test("events within the gap merge; the session emits once the watermark passes its end") {
    val got = run("ss_merge") { mem =>
      mem.addData(E(1, 7, "click", 0L, 1.0), E(2, 7, "click", 9999L, 2.0))
      // sentinel on another user pushes the watermark far past the session end
      mem.addData(E(3, 9, "click", 500000L, 0.0))
    }
    // one finalized session: [0, 9999 + 10000); the sentinel's own session
    // is still open (watermark = 495000 < 510000)
    assert(got == Seq((0L, 19999L, 7L, 2L, 3.0)))
  }

  test("an event exactly gap after the previous one still MERGES (split only at > gap)") {
    val got = run("ss_boundary") { mem =>
      mem.addData(E(1, 7, "click", 0L, 1.0), E(2, 7, "click", 10000L, 2.0))
      mem.addData(E(3, 9, "click", 500000L, 0.0))
    }
    assert(got == Seq((0L, 20000L, 7L, 2L, 3.0)))
    // one ms past the gap DOES split
    val split = run("ss_boundary2") { mem =>
      mem.addData(E(1, 7, "click", 0L, 1.0), E(2, 7, "click", 10001L, 2.0))
      mem.addData(E(3, 9, "click", 500000L, 0.0))
    }
    assert(split == Seq((0L, 10000L, 7L, 1L, 1.0), (10001L, 20001L, 7L, 1L, 2.0)))
  }

  test("sessions emit exactly once; a later batch does not re-emit finalized sessions") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[E]
    val q = StreamingSessions.sessions(mem.toDF(), gap = "10 seconds", lateness = "5 seconds")
      .writeStream.outputMode(OutputMode.Append).format("memory").queryName("ss_once").start()
    try {
      mem.addData(E(1, 7, "click", 0L, 1.0))
      q.processAllAvailable()
      mem.addData(E(2, 9, "click", 500000L, 0.0))
      q.processAllAvailable()
      assert(s.table("ss_once").count() == 1)
      mem.addData(E(3, 9, "click", 600000L, 0.0))
      q.processAllAvailable()
      // the watermark (595000) now finalizes user 9's FIRST session
      // [500000, 510000); user 7's is not re-emitted, and user 9's second
      // session (end 610000) is still open
      val rows = s.table("ss_once").collect()
        .map(r => (r.getLong(2), r.getTimestamp(0).getTime)).sorted
      assert(rows.toSeq == Seq((7L, 0L), (9L, 500000L)))
    } finally q.stop()
  }
}
