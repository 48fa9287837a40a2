package graft
import org.apache.spark.sql.SparkSession

/** Dev-only probe: plan audit — pushdown, pruning, codegen spans.
  * Output is captured into docs/PLANS.md. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for (name <- Seq("raw_fetch_desc", "gauge_stats", "tagquery_to_stats",
      "counter_rate", "knn_cosine", "dedup_minhash",
      "frame_sample", "corpus_shard", "dedup_ngram_exact")) {
      println(s"\n===== $name =====")
      println(SparkEntry.queries(name)(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    import org.apache.spark.sql.functions._
    import graft.storage.GraftStorage
    import graft.model.MetricType
    val tmp = java.nio.file.Files.createTempDirectory("probe-prune").toString
    GraftStorage.write(graft.sources.EventsAdapter.gaugePoints(spark, sf), tmp,
      org.apache.spark.sql.SaveMode.Overwrite)
    println("\n===== storage readRange pruning =====")
    println(GraftStorage.readRange(spark, tmp, "acme", MetricType.Gauge,
      1704067200000L, 1704067200000L + 4 * 7200000L)
      .filter(col("metric") === "click/42").select("metric", "time", "n_value")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
