package graft.functions

import graft.SparkTestBase
import graft.model.Buckets
import graft.operators.MetricsOps
import org.apache.spark.sql.functions._

/** P² sketch: sequential accuracy vs commons-math, merge stability under
  * arbitrary partitioning, and the Spark aggregation path. */
class P2SketchSpec extends SparkTestBase {

  private def exactPct(xs: Seq[Double], q: Double): Double = {
    val s = xs.sorted; val pos = q * (s.size - 1)
    val lo = pos.toInt; val frac = pos - lo
    if (lo + 1 < s.size) s(lo) + frac * (s(lo + 1) - s(lo)) else s(lo)
  }

  test("sequential feed tracks the true quantile") {
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(5000)(rnd.nextDouble() * 1000)
    var b = P2Sketch.empty
    xs.foreach(x => b = P2Sketch.add(0.9, b, x))
    val got = P2Sketch.result(0.9, b).get
    val want = exactPct(xs, 0.9)
    assert(math.abs(got - want) / want < 0.02, s"got $got want $want")
    // matches commons-math's own P² closely (same algorithm family)
    val cm = new org.apache.commons.math3.stat.descriptive.rank.PSquarePercentile(90.0)
    xs.foreach(cm.increment)
    assert(math.abs(got - cm.getResult) / want < 0.02)
  }

  test("small samples are exact") {
    var b = P2Sketch.empty
    Seq(3.0, 1.0, 2.0).foreach(x => b = P2Sketch.add(0.5, b, x))
    assert(P2Sketch.result(0.5, b).contains(2.0))
    assert(P2Sketch.result(0.5, P2Sketch.empty).isEmpty)
  }

  test("merge of disjoint partitions stays near the true quantile") {
    val rnd = new scala.util.Random(23)
    val xs = Seq.fill(8000)(rnd.nextGaussian() * 50 + 500)
    val parts = xs.grouped(1000).toSeq
    val bufs = parts.map { p =>
      var b = P2Sketch.empty
      p.foreach(x => b = P2Sketch.add(0.95, b, x))
      b
    }
    val merged = bufs.reduce((a, b) => P2Sketch.merge(0.95, a, b))
    assert(merged.count == 8000)
    val got = P2Sketch.result(0.95, merged).get
    val want = exactPct(xs, 0.95)
    assert(math.abs(got - want) / want < 0.02, s"got $got want $want")
  }

  test("merge handles tiny+large and preserves global min/max envelope") {
    var big = P2Sketch.empty
    (1 to 100).foreach(i => big = P2Sketch.add(0.5, big, i.toDouble))
    var tiny = P2Sketch.empty
    tiny = P2Sketch.add(0.5, tiny, 1000.0)
    val m = P2Sketch.merge(0.5, big, tiny)
    assert(m.count == 101)
    assert(m.heights(4) == 1000.0)
    assert(m.heights(0) == 1.0)
  }

  test("Spark aggregation path (partial agg across partitions)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val xs = Seq.fill(4000)(rnd.nextDouble() * 100)
    val df = xs.toDF("v").repartition(8)
    val got = df.agg(GraftFunctions.p2SketchAgg(0.9)(col("v")).as("p90"))
      .collect().head.getDouble(0)
    val want = exactPct(xs, 0.9)
    assert(math.abs(got - want) / want < 0.03, s"got $got want $want")
  }

  test("P2Parity reproduces commons-math bit-for-bit in BOTH feed orders") {
    val s = spark
    import s.implicits._
    import graft.model.Order
    val rnd = new scala.util.Random(17)
    val vals = Seq.fill(60)(rnd.nextDouble() * 100)
    val dp = vals.zipWithIndex.map { case (v, i) => ("m", 100L + i, v) }
      .toDF("metric", "time", "n_value")
      .withColumn("tenant_id", lit("t")).withColumn("mtype", lit(0))
    val b = Buckets(100, 60, 1)
    // the reference feeds DESC for gauge stats, ASC for counter stats —
    // P² is order-sensitive so the two differ, and each must match a
    // commons-math estimator fed the same way
    def cm(xs: Seq[Double]): Double = {
      val p = new org.apache.commons.math3.stat.descriptive.rank.PSquarePercentile(90.0)
      xs.foreach(p.increment)
      p.getResult
    }
    val asc = MetricsOps.numericBucketStats(dp, b, Seq(90.0),
      mode = MetricsOps.PercentileMode.P2Parity, parityFeedOrder = Order.Asc)
      .collect().head.getAs[Double]("p90_0")
    val desc = MetricsOps.numericBucketStats(dp, b, Seq(90.0),
      mode = MetricsOps.PercentileMode.P2Parity, parityFeedOrder = Order.Desc)
      .collect().head.getAs[Double]("p90_0")
    assert(asc == cm(vals))
    assert(desc == cm(vals.reverse))
    assert(asc != desc) // order sensitivity is real on this sample
  }

  test("bucket stats in P2Sketch mode produce sane percentiles") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    val dp = (0 until 2000).map(i => ("m", 100L + i % 100, rnd.nextDouble() * 10))
      .toDF("metric", "time", "n_value")
      .withColumn("tenant_id", lit("t")).withColumn("mtype", lit(0))
    val b = Buckets(100, 50, 2)
    val rows = MetricsOps.numericBucketStats(dp, b, Seq(90.0),
      mode = MetricsOps.PercentileMode.P2Sketch).orderBy("bucket").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val p90 = r.getAs[Double]("p90_0")
      assert(p90 > 8.0 && p90 < 10.0)
      val med = r.getAs[Double]("median")
      assert(med > 4.0 && med < 6.0)
    }
  }
}
