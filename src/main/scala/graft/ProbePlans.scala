package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev-only plan capture for the optimization rounds: writes
  * `.explain("formatted")` of named SparkEntry queries — and of the
  * shared substrate frames the round touched — to text files under a
  * target directory (committed as `plans/rNN/<name>_{before,after}.txt`).
  *
  * Usage: `runMain graft.ProbePlans <outDir> <suffix> [query ...]`
  * (suffix = "before" | "after"). With no query names it dumps the
  * round's default audit set.
  */
object ProbePlans {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r14")
    val suffix = args.lift(1).getOrElse("after")
    val names = if (args.length > 2) args.drop(2).toSeq else Seq(
      "rollup_stats", "rollup_adaptive", "tagquery_rollup_stats",
      "rest_served_stats", "gauge_stats", "rate_stats")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def dump(name: String, plan: String): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

    // 1. the shared substrate frame of the round: the bounded LWW-resolved
    //    raw window every tier-family refresh aggregates. The _before shape
    //    filters ABOVE the dedup window (slice bound cannot reach the scan:
    //    no PartitionFilters), the _after shape is resolvedWindow (bound
    //    below the window: PartitionFilters prune the slice range).
    val tmp = "target/tmp/probeplans_raw"
    graft.storage.IndexStore.rmrf(spark, tmp)
    graft.storage.GraftStorage.write(
      graft.sources.EventsAdapter.gaugePoints(spark, sf), tmp,
      org.apache.spark.sql.SaveMode.Overwrite)
    val lo = 233000L; val hi = 233042L // an in-fixture slice window
    dump("rollup_resolved_window", fmt(
      graft.storage.GraftStorage.resolvedWindow(spark, tmp, lo, hi)))
    dump("rollup_resolved_filter_above", fmt(
      graft.storage.GraftStorage.readResolved(spark, tmp)
        .filter(col("time_slice") >= lo && col("time_slice") < hi)))

    // 2. named queries: the driver-visible final frames
    for (n <- names; q <- SparkEntry.queries.get(n))
      dump(n, fmt(q(spark, sf)))
    spark.stop()
  }
}
