package graft

import graft.model.{Buckets, MetricType, TimeRange}
import graft.operators.MetricsOps
import graft.sources.EventsAdapter
import graft.storage.GraftStorage
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * TENANT-axis weak-scaling probe (dev tool) — the CANONICAL tenant-axis
 * measurement: ProbeScale's `tenant_axis` block spot-checks three serves
 * inline; this main covers all five tier families with both the scoped
 * and the all-tenant (keyed) serve per family. Per-tenant data is FIXED
 * and the tier grows as `tenant_id=...` partition directories — the
 * multi-tenant shape the reference serves (every Hawkular request
 * carries a tenant header; reference: api/.../TenantFilter.java) and the
 * 100 TB deployment shape (thousands of tenants, dashboards per tenant).
 *
 * Per tier it times:
 *   - the SINGLE-tenant scoped serve: must stay FLAT as tenants grow.
 *     tenant_id LEADS the tier layout, so the scope resolves as a
 *     partition filter at the directory listing — other tenants' files
 *     are never opened. This is the property that makes per-tenant
 *     dashboards O(one tenant) on a shared store.
 *   - the ALL-tenant merge where the serve carries tenant keys
 *     (avail/counter): output grows ~n by necessity; the point pinned is
 *     that the keyed window/aggregate keeps per-tenant cost constant
 *     (no cross-tenant interleaving blow-up).
 *
 * Usage: runMain graft.ProbeTenants <sfDir> <nTenants>
 */
object ProbeTenants {

  private def rmrf(s: SparkSession, path: String): Unit =
    graft.storage.IndexStore.rmrf(s, path)

  /** Replicate a canonical datapoint frame across n tenant id spaces —
    * SAME metrics, SAME points per tenant (fixed per-tenant work). */
  private def tenants(df: DataFrame, n: Int): DataFrame =
    (0 until n).map(i => df.withColumn("tenant_id", lit(s"t$i")))
      .reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(8)
    val only = args.drop(2).toSet
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val S = 1704067200000L
    val E = 1706659200000L
    val gaugeCode = MetricType.Gauge.code.toInt

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.catalog.clearCache()
    }

    println(s"== tenant-axis probe: $dir x$n tenants ==")

    if (only.isEmpty || only("stats")) {
      val p = "target/tmp/probe-tn-roll"
      rmrf(spark, p)
      GraftStorage.write(tenants(EventsAdapter.gaugePoints(spark, dir), n),
        s"$p/raw", SaveMode.Overwrite)
      var t0 = System.nanoTime()
      GraftStorage.writeRollup(spark, s"$p/raw", s"$p/roll")
      println(f"tn_stats_build             ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      time("tn_stats_serve_1tenant") {
        GraftStorage.rollupStats(spark, s"$p/roll",
          Buckets.fromStep(S, E, 86400000L),
          tenant = Some("t0"), mtypeCode = Some(gaugeCode))
      }
    }
    if (only.isEmpty || only("hist")) {
      val p = "target/tmp/probe-tn-hist"
      rmrf(spark, p)
      GraftStorage.write(tenants(EventsAdapter.gaugePoints(spark, dir), n),
        s"$p/raw", SaveMode.Overwrite)
      var t0 = System.nanoTime()
      GraftStorage.writeRollupHist(spark, s"$p/raw", s"$p/hist",
        vMin = 0.0, vMax = 500.0, bins = 20)
      println(f"tn_hist_build              ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      time("tn_hist_serve_1tenant") {
        MetricsOps.histogramQuantile(
          GraftStorage.rollupHistogram(spark, s"$p/hist",
            Buckets.fromStep(S, E, 86400000L),
            tenant = Some("t0"), mtypeCode = Some(gaugeCode)), 0.95)
      }
    }
    if (only.isEmpty || only("avail")) {
      val p = "target/tmp/probe-tn-avail"
      rmrf(spark, p)
      GraftStorage.write(tenants(EventsAdapter.availabilityPoints(spark, dir), n),
        s"$p/raw", SaveMode.Overwrite)
      var t0 = System.nanoTime()
      GraftStorage.writeRollupAvail(spark, s"$p/raw", s"$p/roll")
      println(f"tn_avail_build             ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      val b = Buckets.fromStep(S, E, 86400000L)
      time("tn_avail_serve_1tenant") {
        GraftStorage.rollupAvailStats(spark, s"$p/roll", b, tenant = Some("t0"))
      }
      time("tn_avail_serve_alltenant") {
        GraftStorage.rollupAvailStats(spark, s"$p/roll", b)
      }
    }
    if (only.isEmpty || only("counter")) {
      val p = "target/tmp/probe-tn-ctr"
      rmrf(spark, p)
      GraftStorage.write(tenants(EventsAdapter.counterPoints(spark, dir), n),
        s"$p/raw", SaveMode.Overwrite)
      var t0 = System.nanoTime()
      GraftStorage.writeRollupCounter(spark, s"$p/raw", s"$p/roll")
      println(f"tn_ctr_build               ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      val r = TimeRange(S, E)
      time("tn_ctr_serve_1tenant") {
        GraftStorage.rollupCounterIncrease(spark, s"$p/roll", r, tenant = Some("t0"))
      }
      time("tn_ctr_serve_alltenant") {
        GraftStorage.rollupCounterIncrease(spark, s"$p/roll", r)
      }
    }
    if (only.isEmpty || only("rate")) {
      val p = "target/tmp/probe-tn-rate"
      rmrf(spark, p)
      GraftStorage.write(tenants(EventsAdapter.counterPoints(spark, dir), n),
        s"$p/raw", SaveMode.Overwrite)
      var t0 = System.nanoTime()
      GraftStorage.writeRollupRate(spark, s"$p/raw", s"$p/roll", isCounter = true)
      println(f"tn_rate_build              ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      time("tn_rate_serve_1tenant") {
        GraftStorage.rollupRateStats(spark, s"$p/roll",
          Buckets.fromStep(S, E, 86400000L), isCounter = true,
          byMetric = true, tenant = Some("t0"))
      }
    }
    spark.stop()
  }
}
