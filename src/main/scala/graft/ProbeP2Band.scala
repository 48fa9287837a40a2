package graft

import graft.model.Buckets
import graft.operators.MetricsOps
import graft.sources.EventsAdapter
import org.apache.spark.sql.functions._

/** Dev probe: measures the P² sketch's worst error on the fixture —
  * value-space (|sketch − exact| / bucket range) and rank-space (how far
  * the realized rank of each estimate sits from its target quantile).
  * Runs over the SAME [[MetricsOps.p2SketchAccuracy]] frame the
  * gauge_stats_p2sketch oracle bands, so these numbers calibrate those
  * bands directly. */
object ProbeP2Band {
  def main(args: Array[String]): Unit = {
    val S = 1704067200000L
    val E = 1706659200000L
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args.toSeq match {
      case Nil => Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
      case ds  => ds
    }) {
      val b = Buckets.fromCount(S, E, 60)
      val st = MetricsOps.p2SketchAccuracy(EventsAdapter.gaugePoints(spark, dir), b)
      def verr(sk: String, ex: String) =
        max(abs(col(sk) - col(ex)) / (col("max") - col("min"))).as(s"verr_$ex")
      def rerr(r: String, q: Double) = max(abs(col(r) - lit(q))).as(s"rerr_$r")
      val row = st.agg(
        verr("sk_p90", "p90_0"), verr("sk_p99", "p99_0"), verr("sk_median", "median"),
        rerr("r90", 0.90), rerr("r99", 0.99), rerr("r50", 0.50),
        min(col("samples")).as("min_n")).collect().head
      println(f"$dir: VALUE p90=${row.getDouble(0)}%.4f p99=${row.getDouble(1)}%.4f " +
        f"median=${row.getDouble(2)}%.4f | RANK p90=${row.getDouble(3)}%.4f " +
        f"p99=${row.getDouble(4)}%.4f median=${row.getDouble(5)}%.4f " +
        f"| min_samples=${row.getLong(6)}")
    }
    spark.stop()
  }
}
