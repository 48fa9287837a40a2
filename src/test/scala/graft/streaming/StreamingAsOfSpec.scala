package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming as-of enrichment: cross-batch state, equal-time boundary,
  * no-retraction posture. */
class StreamingAsOfSpec extends SparkTestBase {

  case class E(event_id: Long, user_id: Long, event_type: String, time: Long, value: Double)

  private def run(name: String) = {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[E]
    val q = StreamingAsOf.enrich(mem.toDF(), leftType = "buy", rightType = "click")
      .writeStream.outputMode(OutputMode.Append).format("memory").queryName(name).start()
    (mem, q)
  }

  private def rows(name: String) = spark.table(name).collect()
    .map(r => (r.getLong(0), Option(r.get(4)), Option(r.get(5)))).sortBy(_._1).toSeq

  test("state crosses batches; equal-time right wins (inclusive); equal-time dups take max event_id") {
    val (mem, q) = run("sa_cross")
    try {
      mem.addData(E(1, 7, "click", 100L, 1.0), E(2, 7, "click", 100L, 9.0)) // dup ts
      q.processAllAvailable()
      mem.addData(E(3, 7, "buy", 100L, 0.0), E(4, 7, "buy", 200L, 0.0))
      q.processAllAvailable()
      assert(rows("sa_cross") == Seq(
        (3L, Some(9.0), Some(100L)),  // inclusive; event_id 2 beat 1
        (4L, Some(9.0), Some(100L))))
    } finally q.stop()
  }

  test("left before any right gets nulls; later right does not retract it") {
    val (mem, q) = run("sa_null")
    try {
      mem.addData(E(1, 7, "buy", 100L, 0.0))
      q.processAllAvailable()
      mem.addData(E(2, 7, "click", 50L, 5.0), E(3, 7, "buy", 300L, 0.0))
      q.processAllAvailable()
      assert(rows("sa_null") == Seq(
        (1L, None, None),             // emitted before the (late) click — kept
        (3L, Some(5.0), Some(50L)))) // new left sees the recovered state
    } finally q.stop()
  }
}
