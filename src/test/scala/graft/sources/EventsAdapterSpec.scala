package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.catalyst.plans.logical.Repartition
import java.nio.file.Files

/** The fixture fan-out must stay a fixture workaround: multi-file inputs
  * already scan in parallel and must NOT pay an always-on shuffle. */
class EventsAdapterSpec extends SparkTestBase {

  test("fixture fan-out repartition is gated on single-file inputs") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => (i.toLong * 1000000, i.toDouble)).toDF("ts", "value")

    val multiDir = Files.createTempDirectory("graft-events-multi").toString
    df.repartition(3).write.parquet(s"$multiDir/events.parquet")
    val multi = EventsAdapter.events(s, multiDir)
    assert(multi.inputFiles.length > 1)
    assert(multi.queryExecution.analyzed.collect { case r: Repartition => r }.isEmpty,
      "a multi-file read must not carry the fixture reshuffle")

    val singleDir = Files.createTempDirectory("graft-events-single").toString
    df.coalesce(1).write.parquet(s"$singleDir/events.parquet")
    val single = EventsAdapter.events(s, singleDir)
    assert(single.inputFiles.length == 1)
    assert(single.queryExecution.analyzed.collect { case r: Repartition => r }.nonEmpty,
      "the single-file fixture keeps its one-shot fan-out")
  }

  test("ts → epoch millis agrees across the fixture's two physical encodings " +
    "(int64 nanos and TIMESTAMP_NTZ micros)") {
    val s = spark
    import s.implicits._
    // one event at 2024-01-01T00:00:01.5Z in both encodings
    val millis = 1704067201500L
    def writeAndReadTime(dir: String, writeTs: org.apache.spark.sql.DataFrame): Long = {
      writeTs.coalesce(1).write.parquet(s"$dir/events.parquet")
      EventsAdapter.gaugePoints(s, dir).select("time").collect().head.getLong(0)
    }
    val nanosDir = Files.createTempDirectory("graft-ts-nanos").toString
    val tN = writeAndReadTime(nanosDir,
      Seq((millis * 1000000L, 1L, "click", 1L, 5.0, """{"k":"v"}"""))
        .toDF("ts", "event_id", "event_type", "user_id", "value", "props"))
    val ntzDir = Files.createTempDirectory("graft-ts-ntz").toString
    // LocalDateTime encodes as TIMESTAMP_NTZ — the round-6 fixture type
    val ntzTs = java.time.LocalDateTime.ofEpochSecond(
      millis / 1000, ((millis % 1000) * 1000000L).toInt, java.time.ZoneOffset.UTC)
    val tT = writeAndReadTime(ntzDir,
      Seq((ntzTs, 1L, "click", 1L, 5.0, """{"k":"v"}"""))
        .toDF("ts", "event_id", "event_type", "user_id", "value", "props"))
    assert(tN == millis, s"nanos encoding gave $tN")
    assert(tT == millis, s"NTZ encoding gave $tT")
  }
}
