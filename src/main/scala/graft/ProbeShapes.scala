package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape probe: for each query name given as an arg, print shuffle /
  * broadcast / nested-loop counts and (with `-v`) the formatted plan —
  * the audit loop behind docs/PLANS.md. No args → a default set of the
  * most recently added queries. */
object ProbeShapes {
  def main(args: Array[String]): Unit = {
    val verbose = args.contains("-v")
    val names = args.filterNot(_ == "-v") match {
      case a if a.nonEmpty => a.toSeq
      case _ => Seq("source_cap", "corpus_split", "bpe_pair_counts",
        "source_overlap", "knn_trunc", "knn_trunc_rerank", "ann_recall_trunc")
    }
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      val bc = "BroadcastExchange".r.findAllIn(p).length
      val ex = "Exchange".r.findAllIn(p).length - bc
      val nl = "CartesianProduct|BroadcastNestedLoop".r.findAllIn(p).length
      val wsc = "WholeStageCodegen".r.findAllIn(p).length
      println(f"$name%-22s shuffles=$ex%-3d broadcasts=$bc%-3d nestedloop=$nl%-3d codegenSpans=$wsc")
      if (verbose) println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
