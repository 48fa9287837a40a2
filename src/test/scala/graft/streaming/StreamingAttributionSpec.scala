package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Stream-stream interval join specs: cross-batch pairing, window
  * bounds, and outer null-extension on watermark close. */
class StreamingAttributionSpec extends SparkTestBase {

  case class E(event_id: Long, user_id: Long, event_type: String, time: Long, value: Double)

  private def run(name: String, leftOuter: Boolean) = {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[E]
    val q = StreamingAttribution.attributionPairs(mem.toDF(),
      withinMs = 100L, lateness = "1 second", leftOuter = leftOuter)
      .writeStream.outputMode(OutputMode.Append).format("memory").queryName(name).start()
    (mem, q)
  }

  test("inner: pairs complete across batches; out-of-window clicks never pair") {
    val (mem, q) = run("at_inner", leftOuter = false)
    try {
      mem.addData(E(1, 7, "click", 1000L, 0), E(2, 7, "click", 800L, 0)) // 800 out of window
      q.processAllAvailable()
      mem.addData(E(3, 7, "purchase", 1050L, 9.0))
      q.processAllAvailable()
      val rows = spark.table("at_inner").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(5))).sorted.toSeq
      assert(rows == Seq((1L, 3L, 50L))) // click 1000 → purchase 1050; 800 is 250 ms before
    } finally q.stop()
  }

  test("left outer: unmatched purchase null-extends once the watermark closes its window") {
    val (mem, q) = run("at_outer", leftOuter = true)
    try {
      mem.addData(E(1, 7, "purchase", 1000L, 5.0)) // no click anywhere near
      q.processAllAvailable()
      // nothing yet: a matching click could still arrive
      assert(spark.table("at_outer").isEmpty)
      // advance BOTH sides' watermarks (the global watermark is their
      // MIN — click-only advances would hold the outer result forever)
      mem.addData(E(2, 9, "click", 100000L, 0), E(4, 9, "purchase", 100001L, 1.0))
      q.processAllAvailable()
      mem.addData(E(3, 9, "click", 200000L, 0), E(5, 9, "purchase", 200001L, 1.0))
      q.processAllAvailable()
      val rows = spark.table("at_outer").collect()
      val unmatched = rows.filter(_.getLong(2) == 1L)
      assert(unmatched.length == 1 && unmatched(0).isNullAt(1), rows.mkString(","))
      // the in-window pairs emitted as plain inner results meanwhile
      assert(rows.filter(!_.isNullAt(1)).map(_.getLong(2)).sorted.toSeq == Seq(4L, 5L))
    } finally q.stop()
  }
}
