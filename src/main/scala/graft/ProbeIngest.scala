package graft

import graft.sources.EventsAdapter
import org.apache.spark.sql.functions._

/**
 * Ingest-throughput probe — the engine's analog of the reference's JMH
 * InsertBenchmark (integration-tests/jmh-benchmark/.../InsertBenchmark
 * .java:63-196, BASELINE.md row 1): datapoints/second for a registered
 * gauge batch. The timed region is the service ingest (the canonical
 * slice-partitioned store write, [[graft.storage.GraftStorage.write]])
 * plus ONE bulk catalog upsert of the batch's distinct definitions (the
 * LWW append [[graft.api.MetricsService.createMetric]] performs per id,
 * batched — the reference registers metrics alongside the insert).
 * Batch materialization is excluded (localCheckpoint + count before the
 * clock), each run writes a FRESH store (constant work per run), and the
 * reported figure is points/sec at the min-of-3 wall time — recorded
 * round-over-round in docs/BENCH_NOTES.md like the serve curves.
 */
object ProbeIngest {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val nPoints = args.lift(1).map(_.toInt).getOrElse(100000)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val batch = EventsAdapter.gaugePoints(spark, sfDir)
      .limit(nPoints).localCheckpoint()
    val n = batch.count() // materialized — the adapter never enters the clock
    val defs = batch.groupBy(col("tenant_id"), col("mtype"), col("metric"))
      .agg(first(col("tags")).as("tags"))
      .withColumn("data_retention", lit(null).cast("int"))
      .localCheckpoint()
    val nDefs = defs.count()
    val times = (1 to 3).map { i =>
      val root = s"target/tmp/probe-ingest-$i"
      graft.storage.IndexStore.rmrf(spark, root)
      val svc = new graft.api.MetricsService(spark, root)
      val t0 = System.nanoTime()
      svc.addDataPoints(batch)
      defs.withColumn("ingest_seq",
        lit(graft.storage.GraftStorage.nextIngestSeq()))
        .select("tenant_id", "mtype", "metric", "tags", "data_retention",
          "ingest_seq")
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(s"$root/metrics")
      (System.nanoTime() - t0) / 1e9
    }
    val best = times.min
    println(f"[ingest] points=$n%d defs=$nDefs%d runs=${times.map(t => f"$t%.2f").mkString("/")}s " +
      f"min=$best%.3f s -> ${n / best}%,.0f points/sec (write + catalog upsert)")
    spark.stop()
  }
}
