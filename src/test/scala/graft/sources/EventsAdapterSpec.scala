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
}
