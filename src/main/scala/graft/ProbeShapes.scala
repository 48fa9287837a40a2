package graft

/** Plan-shape probe: for each query name given as an arg, print shuffle /
  * broadcast / nested-loop counts and (with `-v`) the formatted plan —
  * the audit loop behind docs/PLANS.md. No args → a default set of the
  * most recently added queries. */
object ProbeShapes {
  def main(args: Array[String]): Unit = {
    val verbose = args.contains("-v")
    val names = args.filterNot(_ == "-v") match {
      case a if a.nonEmpty => a.toSeq
      case _ => Seq("bm25_search", "bm25_index_stored", "asof_enrich",
        "event_sessions", "series_changepoints", "histogram_quantile",
        "rolling_active_users", "media_frame_search", "series_xcorr",
        "forecast_eval")
    }
    // the REAL session config (nanosAsLong, AQE flags, shuffle
    // partitions) — a hand-rolled builder here would audit plans under a
    // config the bench never runs, and crash on the events fixture
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      // ReusedExchange nodes (shuffle or broadcast reuse) are NOT new
      // exchanges — count them separately or sourceCap-style branch
      // reuse reads as extra shuffles
      val reused = "ReusedExchange".r.findAllIn(p).length
      val bc = "(?<!Reused)BroadcastExchange".r.findAllIn(p).length
      val ex = "(?<!Reused|Broadcast)Exchange".r.findAllIn(p).length
      val nl = "CartesianProduct|BroadcastNestedLoop".r.findAllIn(p).length
      val wsc = "WholeStageCodegen".r.findAllIn(p).length
      println(f"$name%-22s shuffles=$ex%-3d broadcasts=$bc%-3d reused=$reused%-3d nestedloop=$nl%-3d codegenSpans=$wsc")
      if (verbose) println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
