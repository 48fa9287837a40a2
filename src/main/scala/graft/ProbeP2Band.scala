package graft

import graft.functions.GraftFunctions
import graft.model.Buckets
import graft.operators.MetricsOps
import graft.sources.EventsAdapter
import org.apache.spark.sql.functions._

/** Dev probe: measures the P² sketch's worst normalized error
  * |sketch − exact| / (max − min) per bucket on the fixture, per
  * quantile — the empirical basis for gauge_stats_p2sketch's band. */
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
      val v = col("n_value").cast("double")
      val in = EventsAdapter.gaugePoints(spark, dir)
        .filter(col("time") >= b.start && col("time") < b.end)
        .withColumn("bucket", GraftFunctions.bucketIndex("time", b))
      val aggs = MetricsOps.statAggs(v, Seq(90.0, 99.0)) ++ Seq(
        GraftFunctions.p2SketchAgg(0.9)(v).as("sk_p90"),
        GraftFunctions.p2SketchAgg(0.99)(v).as("sk_p99"),
        GraftFunctions.p2SketchAgg(0.5)(v).as("sk_median"))
      val st = in.groupBy(col("bucket")).agg(aggs.head, aggs.tail: _*)
      def err(sk: String, ex: String) =
        max(abs(col(sk) - col(ex)) / (col("max") - col("min"))).as(s"err_$ex")
      val r = st.agg(err("sk_p90", "p90_0"), err("sk_p99", "p99_0"),
        err("sk_median", "median"), min(col("samples")).as("min_n")).collect().head
      println(f"$dir: p90=${r.getDouble(0)}%.4f p99=${r.getDouble(1)}%.4f " +
        f"median=${r.getDouble(2)}%.4f min_samples=${r.getLong(3)}")
      // rank error: what FRACTION of the bucket sits at or below the
      // sketch's estimate — the quantity P² actually approximates
      val sk = st.select(col("bucket"), col("sk_p90"), col("sk_p99"), col("sk_median"))
      val joined = in.join(broadcast(sk), "bucket")
      def rerr(skc: String, q: Double) =
        max(abs(sum(when(v <= col(skc), 1).otherwise(0)).cast("double") / count(v) - q))
          .as(s"rerr_$skc")
      val rr = joined.groupBy(col("bucket"))
        .agg((sum(when(v <= col("sk_p90"), 1).otherwise(0)).cast("double") / count(v) - 0.9).as("r90"),
          (sum(when(v <= col("sk_p99"), 1).otherwise(0)).cast("double") / count(v) - 0.99).as("r99"),
          (sum(when(v <= col("sk_median"), 1).otherwise(0)).cast("double") / count(v) - 0.5).as("r50"))
        .agg(max(abs(col("r90"))), max(abs(col("r99"))), max(abs(col("r50")))).collect().head
      println(f"$dir: RANK p90=${rr.getDouble(0)}%.4f p99=${rr.getDouble(1)}%.4f " +
        f"median=${rr.getDouble(2)}%.4f")
    }
    spark.stop()
  }
}
