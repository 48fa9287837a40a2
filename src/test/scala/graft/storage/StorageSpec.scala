package graft.storage

import graft.SparkTestBase
import graft.model.MetricType
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode}
import java.nio.file.Files

/** Storage-tier specs: round trip, slice partition pruning, compaction
  * LWW dedup, metric delete, retention sweep. */
class StorageSpec extends SparkTestBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-storage").toString

  private def fixture(rows: Seq[(String, Long, Double)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("metric", "time", "n_value")
      .withColumn("tenant_id", lit("t"))
      .withColumn("mtype", lit(MetricType.Gauge.code.toInt))
      .withColumn("l_value", lit(null).cast("long"))
      .withColumn("avail", lit(null).cast("int"))
      .withColumn("s_value", lit(null).cast("string"))
      .withColumn("tags", map(lit("k"), lit("v")))
  }

  private val H2 = GraftStorage.SliceMs // one storage slice (1 day)

  test("bucketed tables co-locate the metric join: executed plan has no Exchange") {
    val dp = fixture(Seq(("m1", 100L, 1.5), ("m1", 200L, 2.5), ("m2", 300L, 3.5),
      ("m3", 400L, 4.5)))
    val s = spark
    import s.implicits._
    val prevBroadcast = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path — the point is co-location WITHOUT
      // broadcast, the shape the plan takes when the id side is huge
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      GraftStorage.writeBucketedTable(dp, "graft_spec_pts", nBuckets = 4)
      GraftStorage.writeBucketedTable(Seq("m1", "m3").toDF("metric"),
        "graft_spec_ids", nBuckets = 4, sortCols = Seq("metric"))
      val joined = s.table("graft_spec_pts").join(s.table("graft_spec_ids"), "metric")
        .groupBy("metric").agg(count(lit(1)).as("cnt"))
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == Set(("m1", 2L), ("m3", 1L)))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected an Exchange-free plan, got:\n$plan")
      // stale-location recovery: a warehouse dir left by a dead session
      // (no catalog entry) must not break the next write. Derive the dir
      // exactly as the writer does — a hardcoded cwd path would silently
      // miss the scenario if the warehouse location ever moved.
      s.sql("DROP TABLE IF EXISTS graft_spec_stale")
      val staleLoc = new java.io.File(s.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier("graft_spec_stale")))
      staleLoc.mkdirs()
      GraftStorage.writeBucketedTable(dp, "graft_spec_stale", nBuckets = 2)
      assert(s.table("graft_spec_stale").count() == 4)
      s.sql("DROP TABLE IF EXISTS graft_spec_stale")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      s.sql("DROP TABLE IF EXISTS graft_spec_pts")
      s.sql("DROP TABLE IF EXISTS graft_spec_ids")
    }
  }

  test("write → read round trip preserves datapoints and partitions by slice") {
    val path = tmp()
    val dp = fixture(Seq(("m1", 100L, 1.5), ("m1", H2 + 5, 2.5), ("m2", 2 * H2 + 7, 3.5)))
    GraftStorage.write(dp, path, SaveMode.Overwrite)
    val back = GraftStorage.read(spark, path)
    assert(back.count() == 3)
    val got = back.select("metric", "time", "n_value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("m1", 100L, 1.5), ("m1", H2 + 5, 2.5), ("m2", 2 * H2 + 7, 3.5)))
    // physical layout: one directory per slice
    assert(back.select("time_slice").distinct().collect().map(_.getLong(0)).toSet == Set(0L, 1L, 2L))
    // partition pruning: a slice-range read plans only matching partitions
    val pruned = GraftStorage.readRange(spark, path, "t", MetricType.Gauge, 0L, H2)
    assert(pruned.count() == 1)
  }

  test("compaction is last-write-wins on (tenant, type, metric, time)") {
    val path = tmp()
    GraftStorage.write(fixture(Seq(("m1", 100L, 1.0))), path, SaveMode.Overwrite)
    GraftStorage.write(fixture(Seq(("m1", 100L, 9.0))), path) // upsert overwrite
    assert(GraftStorage.read(spark, path).count() == 2)
    GraftStorage.compact(spark, path, upToSlice = 10)
    val after = GraftStorage.read(spark, path).select("n_value").collect()
    assert(after.length == 1 && after.head.getDouble(0) == 9.0)
  }

  test("windowed compaction leaves slices outside [fromSlice, upToSlice) untouched") {
    val path = tmp()
    // duplicates in slice 0 AND slice 2 — both need compaction eventually
    GraftStorage.write(fixture(Seq(("m1", 100L, 1.0), ("m1", 2 * H2 + 5, 3.0))),
      path, SaveMode.Overwrite)
    GraftStorage.write(fixture(Seq(("m1", 100L, 9.0), ("m1", 2 * H2 + 5, 7.0))), path)
    // first maintenance run: compact slice 0 only
    GraftStorage.compact(spark, path, upToSlice = 1, fromSlice = 0)
    def sliceFiles(slice: Long): Map[String, (Long, Long)] = {
      val dir = new java.io.File(s"$path/tenant_id=t/mtype=0/time_slice=$slice")
      dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    }
    val slice2Before = sliceFiles(2L)
    assert(slice2Before.size == 2, "slice 2 must still hold both un-compacted files")
    // second run: compact slice 2's window — slice 0's files must not move
    val slice0After1 = sliceFiles(0L)
    GraftStorage.compact(spark, path, upToSlice = 3, fromSlice = 1)
    assert(sliceFiles(0L) == slice0After1,
      "slices below fromSlice must be byte-identical after an unrelated compact")
    // and the windowed run did its own job: slice 2 collapsed to the winner
    val s2 = GraftStorage.read(spark, path).filter(col("time_slice") === 2L)
      .select("n_value").collect()
    assert(s2.length == 1 && s2.head.getDouble(0) == 7.0)
    // slice 0's earlier compaction result is intact
    val s0 = GraftStorage.read(spark, path).filter(col("time_slice") === 0L)
      .select("n_value").collect()
    assert(s0.length == 1 && s0.head.getDouble(0) == 9.0)
  }

  test("within-batch duplicate (metric, time) rows resolve to a stable winner") {
    // ONE batch carries conflicting rows for the same key: there is no
    // write order inside a batch, so the deterministic value rule decides
    // (greater value tuple wins — the Cassandra same-timestamp rule)
    val dup = fixture(Seq(("m1", 100L, 2.0), ("m1", 100L, 8.0), ("m1", 100L, 5.0)))
    val winners = (1 to 3).map { _ =>
      val path = tmp()
      GraftStorage.write(dup, path, SaveMode.Overwrite)
      GraftStorage.compact(spark, path, upToSlice = 10)
      val compacted = GraftStorage.read(spark, path).select("n_value").collect()
      assert(compacted.length == 1)
      // the resolved read view agrees with the physical compaction
      val resolved = GraftStorage.readResolved(spark, path).select("n_value").collect()
      assert(resolved.length == 1 && resolved.head.getDouble(0) == compacted.head.getDouble(0))
      compacted.head.getDouble(0)
    }
    assert(winners.toSet == Set(8.0), s"winner must be stable across runs: $winners")
    // cross-batch LWW still beats the value rule: a LATER batch with a
    // smaller value wins over an earlier batch's larger one
    val path = tmp()
    GraftStorage.write(fixture(Seq(("m1", 100L, 8.0))), path, SaveMode.Overwrite)
    GraftStorage.write(fixture(Seq(("m1", 100L, 2.0))), path)
    GraftStorage.compact(spark, path, upToSlice = 10)
    val after = GraftStorage.read(spark, path).select("n_value").collect()
    assert(after.length == 1 && after.head.getDouble(0) == 2.0)
  }

  test("deleteMetric removes one series, leaves the rest") {
    val path = tmp()
    GraftStorage.write(fixture(Seq(("m1", 100L, 1.0), ("m2", 200L, 2.0))), path, SaveMode.Overwrite)
    GraftStorage.deleteMetric(spark, path, "t", MetricType.Gauge, "m1")
    val left = GraftStorage.read(spark, path).select("metric").collect().map(_.getString(0)).toSeq
    assert(left == Seq("m2"))
  }

  test("retention sweep lists expired slices only") {
    val path = tmp()
    val now = 10 * 86400000L
    GraftStorage.write(fixture(Seq(("m1", 100L, 1.0), ("m1", now - 1000, 2.0))), path, SaveMode.Overwrite)
    val expired = GraftStorage.expiredSlices(spark, path, retentionDays = 7, now = now)
    assert(expired == Seq(0L))
  }

  test("dropExpiredSlices physically removes old partitions, keeps fresh data") {
    val path = tmp()
    val now = 10 * 86400000L
    GraftStorage.write(fixture(Seq(("m1", 100L, 1.0), ("m1", now - 1000, 2.0))), path, SaveMode.Overwrite)
    val dropped = GraftStorage.dropExpiredSlices(spark, path, retentionDays = 7, now = now)
    assert(dropped == Seq(0L))
    val left = GraftStorage.read(spark, path).select("time", "n_value").collect()
    assert(left.length == 1 && left.head.getDouble(1) == 2.0)
  }

  test("deleteMetric drops slice dirs left empty (sole-metric partitions)") {
    val path = tmp()
    // m1 alone in slice 0; m1+m2 in slice 1
    GraftStorage.write(fixture(Seq(("m1", 100L, 1.0), ("m1", H2 + 1, 2.0), ("m2", H2 + 2, 3.0))),
      path, SaveMode.Overwrite)
    GraftStorage.deleteMetric(spark, path, "t", MetricType.Gauge, "m1")
    val back = GraftStorage.read(spark, path)
    assert(back.select("metric").collect().map(_.getString(0)).toSeq == Seq("m2"))
    assert(back.select("time_slice").distinct().collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("deleteTenant drops the whole tenant subtree") {
    val path = tmp()
    GraftStorage.write(fixture(Seq(("m1", 100L, 1.0))), path, SaveMode.Overwrite)
    GraftStorage.write(fixture(Seq(("m9", 200L, 9.0))).withColumn("tenant_id", lit("other")),
      path)
    GraftStorage.deleteTenant(spark, path, "t")
    val left = GraftStorage.read(spark, path).select("tenant_id").distinct().collect()
    assert(left.map(_.getString(0)).toSeq == Seq("other"))
  }

  test("rollup tier: served buckets are bit-equal to the on-read aggregate; " +
      "LWW resolution precedes rollup; misaligned buckets are rejected; " +
      "windowed refresh leaves other slices' rollups untouched") {
    val path = tmp()
    val H1 = GraftStorage.RollupMs
    // raw points across two hours + a same-(metric,time) overwrite: the
    // rollup must aggregate the RESOLVED value (LWW), not both writes
    GraftStorage.write(fixture(Seq(
      ("m1", 100L, 1.0), ("m1", 200L, 3.0), ("m1", H1 + 100L, 10.0),
      ("m2", 150L, 5.0))), s"$path/raw", SaveMode.Overwrite)
    GraftStorage.write(fixture(Seq(("m1", 200L, 7.0))), s"$path/raw") // LWW winner
    GraftStorage.writeRollup(spark, s"$path/raw", s"$path/roll")
    // Buckets.start must be positive, so serve [1h, 2h): that hour holds
    // only m1 @10.0 on the RESOLVED raw (the 7.0 overwrite lives in hour 0)
    val served = GraftStorage.rollupStats(spark, s"$path/roll",
      graft.model.Buckets.fromStep(H1, 2 * H1, H1))
    val hour1 = served.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getAs[Long]("samples"),
        r.getAs[Double]("min"), r.getAs[Double]("sum"))).toSet
    assert(hour1 == Set(("m1", 0L, 1L, 10.0, 10.0)))
    // LWW precedes rollup: hour 0's stored sum reflects the 7.0 winner
    val h0 = spark.read.parquet(s"$path/roll").filter(col("hour") === 0L)
      .select(col("metric"), col("sum_v").cast("double"), col("samples"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(h0 == Set(("m1", 8.0, 2L), ("m2", 5.0, 1L))) // 1.0 + 7.0, not 3.0
    intercept[IllegalArgumentException] {
      GraftStorage.rollupStats(spark, s"$path/roll",
        graft.model.Buckets.fromStep(1L, GraftStorage.RollupMs + 1, GraftStorage.RollupMs))
    }
    // windowed refresh: slice-0 rollup files untouched by a window that
    // excludes them
    def rollFiles(): Map[String, (Long, Long)] = {
      val dir = new java.io.File(s"$path/roll/tenant_id=t/mtype=0/time_slice=0")
      dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    }
    val before = rollFiles()
    GraftStorage.write(fixture(Seq(("m9", 2 * H2 + 50L, 2.0))), s"$path/raw")
    GraftStorage.writeRollup(spark, s"$path/raw", s"$path/roll",
      upToSlice = 3, fromSlice = 2)
    assert(rollFiles() == before,
      "slice-0 rollups must be byte-identical after an unrelated windowed refresh")
    // the window did its job: slice-2 rollup exists
    val s2 = spark.read.parquet(s"$path/roll")
      .filter(col("time_slice") === 2L).collect()
    assert(s2.length == 1 && s2.head.getAs[Long]("samples") == 1L)
  }

  private def availFixture(rows: Seq[(String, Long, Int)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("metric", "time", "avail")
      .withColumn("tenant_id", lit("t"))
      .withColumn("mtype", lit(MetricType.Availability.code.toInt))
      .withColumn("n_value", lit(null).cast("double"))
      .withColumn("l_value", lit(null).cast("long"))
      .withColumn("s_value", lit(null).cast("string"))
      .withColumn("tags", map(lit("k"), lit("v")))
  }

  test("availability rollup tier: served buckets EXACTLY equal the A3 state " +
    "machine over raw — leading reattribution, empty-hour gap absorption, " +
    "cross-hour not-up runs, trailing extension") {
    val path = tmp()
    val H1 = GraftStorage.RollupMs
    val D = 24 * H1 // positive bucket starts
    // m1: hour 0 (up, then down) — hour 1 EMPTY — hour 2 (up): the down
    //     run must absorb hour 1 and hour 2's leading span;
    // m2: single down point in hour 3 only: bucket-leading attribution
    //     from the bucket start plus trailing extension to the bucket end;
    // m3: a down run CROSSING the hour-0/hour-1 boundary (one not-up
    //     start at bucket grain, two at hour grain), recovering to up
    val rows = Seq(
      ("m1", D + 600L, 0), ("m1", D + 1800L, 1), ("m1", D + 2 * H1 + 100L, 0),
      ("m2", D + 3 * H1 + 500L, 1),
      ("m3", D + 30 * 60000L, 1), ("m3", D + H1 + 10 * 60000L, 1),
      ("m3", D + H1 + 50 * 60000L, 0))
    GraftStorage.write(availFixture(rows), s"$path/raw", SaveMode.Overwrite)
    // a second tenant carrying the SAME metric names but a shifted point
    // set — the tier serve must never interleave tenants' hour timelines
    GraftStorage.write(
      availFixture(rows.map { case (m, t, a) => (m, t + 777L, if (a == 0) 1 else 0) })
        .withColumn("tenant_id", lit("t2")), s"$path/raw")
    GraftStorage.writeRollupAvail(spark, s"$path/raw", s"$path/avroll")
    val cols = Seq("metric", "bucket", "up_ms", "down_ms", "unknown_ms",
      "admin_ms", "last_not_uptime", "not_up_count", "samples", "uptime_ratio")
    def rowsOf(df: DataFrame) = df.select(cols.map(col): _*)
      .collect().map(_.toSeq).toSet
    for (stepHours <- Seq(1, 2, 4); tenant <- Seq("t", "t2")) {
      val b = graft.model.Buckets.fromStep(D, D + 4 * H1, stepHours * H1)
      val served = rowsOf(GraftStorage.rollupAvailStats(spark, s"$path/avroll", b)
        .filter(col("tenant_id") === tenant))
      val onRead = rowsOf(graft.operators.MetricsOps.availabilityBucketStats(
        GraftStorage.readResolved(spark, s"$path/raw")
          .filter(col("tenant_id") === tenant), b))
      assert(served == onRead, s"stepHours=$stepHours tenant=$tenant:\n$served\nvs\n$onRead")
    }
    // spot-pin the trickiest single number: in the 4h bucket m3 has ONE
    // not-up start (the cross-hour down run), not two
    val b4 = graft.model.Buckets.fromStep(D, D + 4 * H1, 4 * H1)
    val m3 = GraftStorage.rollupAvailStats(spark, s"$path/avroll", b4)
      .filter(col("metric") === "m3" && col("tenant_id") === "t").collect().head
    assert(m3.getAs[Long]("not_up_count") == 1L)
    // misaligned serving is rejected loudly
    intercept[IllegalArgumentException] {
      GraftStorage.rollupAvailStats(spark, s"$path/avroll",
        graft.model.Buckets.fromStep(D + 1, D + H1 + 1, H1))
    }
  }

  private def ctrFixture(rows: Seq[(String, Long, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("metric", "time", "l_value")
      .withColumn("tenant_id", lit("t"))
      .withColumn("mtype", lit(MetricType.Counter.code.toInt))
      .withColumn("n_value", lit(null).cast("double"))
      .withColumn("avail", lit(null).cast("int"))
      .withColumn("s_value", lit(null).cast("string"))
      .withColumn("tags", map(lit("k"), lit("v")))
  }

  test("counter rollup tier: served increase/reset accounting EXACTLY equals " +
    "counterIncrease over raw — boundary deltas across hours (and empty " +
    "hours), resets at hour boundaries, single-point hours") {
    val path = tmp()
    val H1 = GraftStorage.RollupMs
    val D = 24 * H1
    // m1: rises within hour 0, RESET at the hour-0/1 boundary, rises in
    //     hour 1, then an empty hour and a positive boundary delta into
    //     hour 3 (single point — no internal deltas);
    // m2: single hour only (merge must add nothing)
    val rows = Seq(
      ("m1", D + 100L, 10L), ("m1", D + 200L, 25L),            // +15
      ("m1", D + H1 + 100L, 5L), ("m1", D + H1 + 200L, 30L),   // reset, +25
      ("m1", D + 3 * H1 + 100L, 42L),                          // boundary +12
      ("m2", D + 2 * H1 + 100L, 7L), ("m2", D + 2 * H1 + 200L, 3L)) // reset
    GraftStorage.write(ctrFixture(rows), s"$path/raw", SaveMode.Overwrite)
    GraftStorage.writeRollupCounter(spark, s"$path/raw", s"$path/ctrroll")
    val range = graft.model.TimeRange(D, D + 4 * H1)
    def rowsOf(df: DataFrame) = df
      .select("metric", "increase", "n_resets", "n_deltas")
      .collect().map(_.toSeq).toSet
    val served = rowsOf(GraftStorage.rollupCounterIncrease(spark, s"$path/ctrroll", range))
    val onRead = rowsOf(graft.operators.MetricsOps.counterIncrease(
      GraftStorage.readResolved(spark, s"$path/raw"), range))
    assert(served == onRead, s"$served vs $onRead")
    // pin the numbers: m1 increase 15+25+12=52, 1 reset (boundary 25→5),
    // deltas 1+1 internal + 2 boundary = 4; m2: 0 increase, 1 reset, 1 delta
    assert(served == Set(Seq("m1", 52L, 1L, 4L), Seq("m2", 0L, 1L, 1L)))
    // misaligned range rejected loudly
    intercept[IllegalArgumentException] {
      GraftStorage.rollupCounterIncrease(spark, s"$path/ctrroll",
        graft.model.TimeRange(D + 1, D + H1 + 1))
    }
  }

  test("tier retention: dropExpiredSlices ages rollup slices out like raw — " +
    "expired tier dirs physically gone, retained ones byte-identical, " +
    "in-window serving unchanged") {
    val path = tmp()
    val H1 = GraftStorage.RollupMs
    GraftStorage.write(fixture(Seq(
      ("m1", 100L, 1.0),                 // slice 0 — expires
      ("m1", H2 + H1 + 100L, 5.0),       // slice 1 — retained
      ("m2", H2 + 2 * H1 + 50L, 7.0))),  // slice 1 — retained
      s"$path/raw", SaveMode.Overwrite)
    GraftStorage.writeRollup(spark, s"$path/raw", s"$path/roll")
    def sliceDir(s: Long) = new java.io.File(
      s"$path/roll/tenant_id=t/mtype=0/time_slice=$s")
    def files(s: Long) = sliceDir(s).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    val retained = files(1L)
    val b = graft.model.Buckets.fromStep(H2 + H1, H2 + 3 * H1, H1)
    val before = GraftStorage.rollupStats(spark, s"$path/roll", b)
      .collect().map(_.toSeq).toSet
    // retention: now = end of slice 2's day, keep 1 day → slice 0 expires
    val dropped = GraftStorage.dropExpiredSlices(spark, s"$path/roll",
      retentionDays = 1, now = 2 * H2)
    assert(dropped == Seq(0L))
    assert(!sliceDir(0L).exists(), "expired tier slice must be physically gone")
    assert(files(1L) == retained, "retained tier files must be byte-identical")
    assert(GraftStorage.rollupStats(spark, s"$path/roll", b)
      .collect().map(_.toSeq).toSet == before,
      "in-window serving must be unchanged by the TTL sweep")
    // idempotent: a second sweep finds nothing
    assert(GraftStorage.dropExpiredSlices(spark, s"$path/roll",
      retentionDays = 1, now = 2 * H2).isEmpty)
  }

  test("rollupStats id-set restriction: equals the unfiltered answer cut to " +
    "the selected metrics, and the raw tier stays unread") {
    val s = spark
    import s.implicits._
    val path = tmp()
    val H1 = GraftStorage.RollupMs
    GraftStorage.write(fixture(Seq(
      ("m1", H1 + 100L, 10.0), ("m1", H1 + 200L, 20.0), ("m2", H1 + 300L, 5.0))),
      s"$path/raw", SaveMode.Overwrite)
    GraftStorage.writeRollup(spark, s"$path/raw", s"$path/roll")
    val aligned = graft.model.Buckets.fromStep(H1, 2 * H1, H1)
    def rows(df: DataFrame) = df
      .select("metric", "bucket", "samples", "min", "avg", "max", "sum")
      .collect().map(_.toSeq).toSet
    val filtered = GraftStorage.rollupStats(spark, s"$path/roll", aligned,
      ids = Some(Seq("m1").toDF("metric")))
    assert(rows(filtered) ==
      rows(GraftStorage.rollupStats(spark, s"$path/roll", aligned))
        .filter(_.head == "m1"))
    val plan = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("/roll") && !plan.contains("/raw]"),
      s"id-filtered serving must read the tier only:\n$plan")
  }

  test("histogram rollup tier: served histogram is bit-equal to valueHistogram " +
    "over resolved raw (LWW precedes, edge bins clamp); the quantile walk " +
    "composes; misaligned serve, missing meta and mismatched refresh params " +
    "are rejected") {
    val path = tmp()
    val H1 = GraftStorage.RollupMs
    // two hours of data + a same-(metric,time) overwrite + out-of-range
    // values on both sides (must clamp into the edge bins, not drop)
    GraftStorage.write(fixture(Seq(
      ("m1", 100L, 1.0), ("m1", 200L, 3.0), ("m1", H1 + 100L, 10.0),
      ("m2", 150L, 5.0), ("m2", H1 + 400L, -3.0), ("m2", H1 + 500L, 99.0))),
      s"$path/raw", SaveMode.Overwrite)
    GraftStorage.write(fixture(Seq(("m1", 200L, 7.0))), s"$path/raw") // LWW winner
    GraftStorage.writeRollupHist(spark, s"$path/raw", s"$path/hist",
      vMin = 0.0, vMax = 10.0, bins = 5)
    val b = graft.model.Buckets.fromStep(H1, 2 * H1, H1)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("bucket", "bin", "cnt", "bin_lo", "bin_hi")
        .collect().map(_.toSeq).toSet
    val served = GraftStorage.rollupHistogram(spark, s"$path/hist", b)
    // materialized now: the plan's file listing goes stale after the
    // idempotent-refresh rewrite below
    val servedRows = rows(served)
    // -3.0 clamps into bin 0, 99.0 into bin 4; 10.0 (== vMax) into bin 4
    assert(servedRows == Set(
      Seq(0L, 0L, 1L, 0.0, 2.0), Seq(0L, 4L, 2L, 8.0, 10.0)))
    // bit-equal to the on-read heatmap aggregate over LWW-resolved raw
    val onRead = graft.operators.MetricsOps.valueHistogram(
      GraftStorage.readResolved(spark, s"$path/raw"), b,
      vMin = 0.0, vMax = 10.0, bins = 5)
    assert(servedRows == rows(onRead))
    // ...including the hour-0 LWW winner in the STORED tier: 7.0 → bin 3
    // (the superseded 3.0 would have landed in bin 1)
    val h0bins = spark.read.parquet(s"$path/hist").filter(col("hour") === 0L)
      .select("bin").collect().map(_.getLong(0)).toSet
    assert(h0bins == Set(0L, 2L, 3L), s"hour-0 bins: $h0bins")
    // the quantile walk over the SERVED histogram equals the walk over
    // the on-read histogram (same integer counts in, same math out)
    def q(df: org.apache.spark.sql.DataFrame) =
      graft.operators.MetricsOps.histogramQuantile(df, 0.5)
        .collect().map(_.toSeq).toSet
    assert(q(served) == q(onRead))
    // misaligned buckets are rejected loudly
    intercept[IllegalArgumentException] {
      GraftStorage.rollupHistogram(spark, s"$path/hist",
        graft.model.Buckets.fromStep(1L, H1 + 1, H1))
    }
    // a refresh with different bin parameters is rejected loudly (mixed
    // widths would merge into silent nonsense)
    intercept[IllegalArgumentException] {
      GraftStorage.writeRollupHist(spark, s"$path/raw", s"$path/hist",
        vMin = 0.0, vMax = 20.0, bins = 5)
    }
    // serving a path with no tier meta is rejected loudly
    intercept[IllegalArgumentException] {
      GraftStorage.rollupHistogram(spark, s"$path/nosuch", b)
    }
    // same-parameter refresh is idempotent
    GraftStorage.writeRollupHist(spark, s"$path/raw", s"$path/hist",
      vMin = 0.0, vMax = 10.0, bins = 5)
    assert(rows(GraftStorage.rollupHistogram(spark, s"$path/hist", b)) == servedRows)
    // id-set restriction: only the selected metric's counts survive the
    // merge (m2's bin-0/bin-4 clamps drop; m1's hour-1 point remains)
    val s0 = spark
    import s0.implicits._
    val only1 = GraftStorage.rollupHistogram(spark, s"$path/hist", b,
      ids = Some(Seq("m1").toDF("metric")))
    assert(rows(only1) == Set(Seq(0L, 4L, 1L, 8.0, 10.0)))
  }

  test("servedStats dispatch: aligned requests read the rollup, misaligned read raw, " +
    "both branches answer identically on aligned buckets") {
    val path = tmp()
    val H1 = GraftStorage.RollupMs
    GraftStorage.write(fixture(Seq(
      ("m1", H1 + 100L, 10.0), ("m1", H1 + 200L, 20.0), ("m2", H1 + 300L, 5.0),
      ("m1", 2 * H1 + 50L, 7.0))), s"$path/raw", SaveMode.Overwrite)
    GraftStorage.writeRollup(spark, s"$path/raw", s"$path/roll")
    val aligned = graft.model.Buckets.fromStep(H1, 3 * H1, H1)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("metric", "bucket", "samples", "min", "avg", "max", "sum")
      .collect().map(_.toSeq).toSet
    val viaDispatch = GraftStorage.servedStats(spark, s"$path/raw", s"$path/roll", aligned)
    // aligned → the plan reads the ROLLUP directory, not raw
    val scanned = viaDispatch.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(scanned.contains("/roll") && !scanned.contains("/raw]"),
      s"aligned dispatch must read the rollup tier:\n$scanned")
    assert(rows(viaDispatch) == rows(GraftStorage.rollupStats(spark, s"$path/roll", aligned)))
    // misaligned (half-hour step) → raw branch, and on the SAME span its
    // re-bucketed answer at hour granularity equals the rollup's
    val misaligned = graft.model.Buckets.fromStep(H1, 3 * H1, H1 / 2)
    val rawServed = GraftStorage.servedStats(spark, s"$path/raw", s"$path/roll", misaligned)
    val rawScan = rawServed.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(rawScan.contains("/raw"), "misaligned dispatch must read raw")
    // exactness contract across branches: sum of raw half-hour buckets
    // per hour equals the rollup-served hour rows
    val rawHourly = rawServed.collect()
      .groupBy(r => (r.getString(0), r.getLong(1) / 2))
      .view.mapValues(_.map(_.getAs[Double]("sum")).sum).toMap
    val rollHourly = GraftStorage.rollupStats(spark, s"$path/roll", aligned).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Double]("sum")).toMap
    assert(rawHourly == rollHourly)
    // the id restriction rides the DISPATCH into both branches: each
    // branch's filtered answer equals its unfiltered answer cut to the
    // selected metric (tag-query + arbitrary-grid dashboard shape)
    val s2 = spark
    import s2.implicits._
    val one = Seq("m1").toDF("metric")
    for (bb <- Seq(aligned, misaligned))
      assert(rows(GraftStorage.servedStats(spark, s"$path/raw", s"$path/roll",
        bb, ids = Some(one))) ==
        rows(GraftStorage.servedStats(spark, s"$path/raw", s"$path/roll", bb))
          .filter(_.head == "m1"),
        s"ids must prune without changing m1's rows (buckets=$bb)")
  }

  test("served* freshness bound: an aligned request extending past the " +
    "supplied refreshedUntil watermark takes the RAW branch on every " +
    "dispatcher (an unrefreshed tail must never serve as silently empty " +
    "tier buckets); within the bound the tier serves") {
    val path = tmp()
    val H1 = GraftStorage.RollupMs
    def plan(df: DataFrame) = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // gauge raw + rollup + hist tiers
    GraftStorage.write(fixture(Seq(
      ("m1", H1 + 100L, 10.0), ("m1", 2 * H1 + 50L, 7.0))),
      s"$path/raw", SaveMode.Overwrite)
    GraftStorage.writeRollup(spark, s"$path/raw", s"$path/roll")
    GraftStorage.writeRollupHist(spark, s"$path/raw", s"$path/hist",
      vMin = 0.0, vMax = 100.0, bins = 4)
    // counter raw + ctr + rate tiers; avail raw + tier
    GraftStorage.write(ctrFixture(Seq(
      ("c1", H1 + 100L, 10L), ("c1", 2 * H1 + 500L, 30L))),
      s"$path/craw", SaveMode.Overwrite)
    GraftStorage.writeRollupCounter(spark, s"$path/craw", s"$path/ctr")
    GraftStorage.writeRollupRate(spark, s"$path/craw", s"$path/rate",
      isCounter = true, valueCol = "l_value")
    GraftStorage.write(availFixture(Seq(
      ("a1", H1 + 100L, 0), ("a1", 2 * H1 + 500L, 1))),
      s"$path/araw", SaveMode.Overwrite)
    GraftStorage.writeRollupAvail(spark, s"$path/araw", s"$path/avroll")
    val b = graft.model.Buckets.fromStep(H1, 3 * H1, H1)
    val r = graft.model.TimeRange(H1, 3 * H1)
    val within = Some(3 * H1) // covers the request
    val past = Some(2 * H1)   // request extends one hour past the watermark
    // each (dispatch, tier dir marker, raw dir marker)
    val cases: Seq[(Option[Long] => DataFrame, String, String)] = Seq(
      ((w: Option[Long]) => GraftStorage.servedStats(spark, s"$path/raw",
        s"$path/roll", b, refreshedUntil = w), "/roll", "/raw"),
      ((w: Option[Long]) => GraftStorage.servedHistogram(spark, s"$path/raw",
        s"$path/hist", b, refreshedUntil = w), "/hist", "/raw"),
      ((w: Option[Long]) => GraftStorage.servedRateStats(spark, s"$path/craw",
        s"$path/rate", b, isCounter = true, refreshedUntil = w), "/rate", "/craw"),
      ((w: Option[Long]) => GraftStorage.servedCounterIncrease(spark,
        s"$path/craw", s"$path/ctr", r, refreshedUntil = w), "/ctr", "/craw"),
      ((w: Option[Long]) => GraftStorage.servedAvailStats(spark, s"$path/araw",
        s"$path/avroll", b, refreshedUntil = w), "/avroll", "/araw"))
    for ((serve, tierDir, rawDir) <- cases) {
      assert(plan(serve(within)).contains(tierDir),
        s"within the watermark the tier ($tierDir) must serve")
      val fallback = plan(serve(past))
      assert(fallback.contains(rawDir) && !fallback.contains(s"$tierDir]"),
        s"past the watermark the dispatch must fall back to raw ($rawDir):\n$fallback")
      // None (caller vouches freshness) keeps the tier branch
      assert(plan(serve(None)).contains(tierDir))
    }
  }

  test("servedAvailStats dispatch: aligned requests read the availability tier, " +
    "misaligned read raw, both branches answer identically on aligned buckets") {
    val path = tmp()
    val H1 = GraftStorage.RollupMs
    GraftStorage.write(availFixture(Seq(
      ("m1", H1 + 100L, 0), ("m1", H1 + 2000L, 1), ("m1", 2 * H1 + 500L, 0),
      ("m2", H1 + 300L, 2))), s"$path/raw", SaveMode.Overwrite)
    GraftStorage.writeRollupAvail(spark, s"$path/raw", s"$path/roll")
    def rows(df: DataFrame) = df
      .select("metric", "bucket", "up_ms", "down_ms", "unknown_ms", "admin_ms",
        "last_not_uptime", "not_up_count", "samples", "uptime_ratio")
      .collect().map(_.toSeq).toSet
    val aligned = graft.model.Buckets.fromStep(H1, 3 * H1, 2 * H1)
    val viaTier = GraftStorage.servedAvailStats(spark, s"$path/raw", s"$path/roll", aligned)
    val tierPlan = viaTier.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(tierPlan.contains("/roll") && !tierPlan.contains("/raw]"),
      s"aligned dispatch must read the availability tier:\n$tierPlan")
    // a misaligned request covering the SAME span (one bucket, off-grid
    // end bumped... use an off-grid STEP) answers from raw — and because
    // this particular span is one bucket either way, the rows match
    val misaligned = graft.model.Buckets.fromStep(H1, 3 * H1 + 1, 2 * H1 + 1)
    val viaRaw = GraftStorage.servedAvailStats(spark, s"$path/raw", s"$path/roll", misaligned)
    assert(viaRaw.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode).contains("/raw"),
      "misaligned dispatch must read raw")
    // branch equality on the aligned request: tier rows equal the raw
    // operator run directly over the resolved store
    assert(rows(viaTier) == rows(
      graft.operators.MetricsOps.availabilityBucketStats(
        GraftStorage.readResolved(spark, s"$path/raw"), aligned)))
  }

  test("servedCounterIncrease dispatch: aligned ranges read the counter tier, " +
    "misaligned read raw, both branches answer identically on aligned ranges") {
    val path = tmp()
    val H1 = GraftStorage.RollupMs
    GraftStorage.write(ctrFixture(Seq(
      ("c1", H1 + 100L, 10L), ("c1", H1 + 2000L, 40L), ("c1", 2 * H1 + 500L, 130L),
      ("c1", 2 * H1 + 900L, 20L))), s"$path/raw", SaveMode.Overwrite)
    GraftStorage.writeRollupCounter(spark, s"$path/raw", s"$path/ctr")
    def rows(df: DataFrame) = df
      .select("metric", "increase", "n_resets", "n_deltas")
      .collect().map(_.toSeq).toSet
    val aligned = graft.model.TimeRange(H1, 3 * H1)
    val viaTier = GraftStorage.servedCounterIncrease(spark, s"$path/raw", s"$path/ctr", aligned)
    val tierPlan = viaTier.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(tierPlan.contains("/ctr") && !tierPlan.contains("/raw]"),
      s"aligned dispatch must read the counter tier:\n$tierPlan")
    assert(rows(viaTier) ==
      rows(GraftStorage.rollupCounterIncrease(spark, s"$path/ctr", aligned)))
    // misaligned start → raw branch; the in-range pair set shrinks by the
    // pre-start points exactly as counterIncrease over raw defines it
    val mis = graft.model.TimeRange(H1 + 1, 3 * H1)
    val viaRaw = GraftStorage.servedCounterIncrease(spark, s"$path/raw", s"$path/ctr", mis)
    assert(viaRaw.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode).contains("/raw"),
      "misaligned dispatch must read raw")
    assert(rows(viaRaw) == rows(graft.operators.MetricsOps.counterIncrease(
      GraftStorage.readResolved(spark, s"$path/raw"), mis)))
  }

  test("servedHistogram dispatch: aligned requests read the distribution tier, " +
    "misaligned read raw with the TIER's declared bin edges; missing meta refuses") {
    val path = tmp()
    val H1 = GraftStorage.RollupMs
    GraftStorage.write(fixture(Seq(
      ("m1", H1 + 100L, 10.0), ("m1", H1 + 200L, 60.0), ("m1", 2 * H1 + 50L, 10.0),
      ("m2", H1 + 300L, 999.0))), s"$path/raw", SaveMode.Overwrite)
    GraftStorage.writeRollupHist(spark, s"$path/raw", s"$path/hist",
      vMin = 0.0, vMax = 100.0, bins = 4)
    def rows(df: DataFrame) = df
      .select("bucket", "bin", "cnt", "bin_lo", "bin_hi")
      .collect().map(_.toSeq).toSet
    val aligned = graft.model.Buckets.fromStep(H1, 3 * H1, H1)
    val viaTier = GraftStorage.servedHistogram(spark, s"$path/raw", s"$path/hist", aligned)
    val tierPlan = viaTier.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(tierPlan.contains("/hist") && !tierPlan.contains("/raw]"),
      s"aligned dispatch must read the distribution tier:\n$tierPlan")
    assert(rows(viaTier) == rows(
      GraftStorage.rollupHistogram(spark, s"$path/hist", aligned)))
    // misaligned → raw branch with the STORE's edges (0..100, 4 bins):
    // the out-of-range 999.0 clamps into the top bin exactly as stored
    val mis = graft.model.Buckets.fromStep(H1 + 1, 3 * H1 + 1, H1)
    val viaRaw = GraftStorage.servedHistogram(spark, s"$path/raw", s"$path/hist", mis)
    assert(viaRaw.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode).contains("/raw"),
      "misaligned dispatch must read raw")
    assert(rows(viaRaw) == rows(graft.operators.MetricsOps.valueHistogram(
      GraftStorage.readResolved(spark, s"$path/raw"), mis, 0.0, 100.0, 4)))
    // a store with no _histmeta has no declared edges — refuse loudly
    intercept[IllegalArgumentException] {
      GraftStorage.servedHistogram(spark, s"$path/raw", s"$path/nohist", aligned)
    }
  }

  test("rollup refresh clears ghost partitions after raw deletes") {
    val path = tmp()
    GraftStorage.write(fixture(Seq(("m1", 100L, 1.0), ("m2", 200L, 2.0))),
      s"$path/raw", SaveMode.Overwrite)
    GraftStorage.writeRollup(spark, s"$path/raw", s"$path/roll")
    assert(spark.read.parquet(s"$path/roll").count() == 2)
    // drop the whole tenant from raw, refresh: the rollup must not keep
    // serving ghosts (dynamic overwrite alone cannot clear a partition)
    GraftStorage.deleteTenant(spark, s"$path/raw", "t")
    // raw tier is now empty — a refresh has nothing to aggregate
    GraftStorage.write(fixture(Seq(("m9", 100L, 9.0))).filter(col("metric") === "none"),
      s"$path/raw") // keep the raw root readable (zero rows)
    GraftStorage.writeRollup(spark, s"$path/raw", s"$path/roll")
    // every rollup slice partition is gone — empty parent dirs may remain
    // (the deleteMetric convention); a parquet read of a fully emptied
    // tier would fail schema inference, so check the filesystem
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val leftover = Option(fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$path/roll/*/*/time_slice=*")))
      .getOrElse(Array.empty)
    assert(leftover.isEmpty,
      s"deleted raw data must not survive in the rollup tier: ${leftover.mkString(",")}")
  }

  /** Counter fixture: canonical rows with l_value set. */
  private def ctrFixture(rows: Seq[(String, Long, Long)],
                         tenant: String = "t"): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("metric", "time", "l_value")
      .withColumn("tenant_id", lit(tenant))
      .withColumn("mtype", lit(MetricType.Counter.code.toInt))
      .withColumn("n_value", lit(null).cast("double"))
      .withColumn("avail", lit(null).cast("int"))
      .withColumn("s_value", lit(null).cast("string"))
      .withColumn("tags", map(lit("k"), lit("v")))
  }

  test("rate rollup tier: served bucket stats EXACTLY equal rate+A1 over raw " +
    "— within-hour partials, boundary pairs across gaps, reset pairs dropped " +
    "at both grains, pre-range anchors, single-point hours; misaligned serve " +
    "rejected") {
    val s0 = spark
    import s0.implicits._
    val path = tmp()
    val H1 = GraftStorage.RollupMs
    // m1: within-hour pairs in hour 0; an hour-1 single point (no pair,
    //     boundary anchor only); a gap (hour 2 empty) then hour 3 — the
    //     boundary pair must bridge the gap like the raw adjacent pair;
    //     a within-hour RESET in hour 3 (500 -> 100)
    // m2: a reset ACROSS the hour boundary (900 -> 50): the boundary pair
    //     drops but hour-1's own pair still counts
    val rows = Seq(
      ("m1", H1 + 100L, 10L), ("m1", H1 + 2000L, 40L), ("m1", H1 + 60000L, 100L),
      ("m1", 2 * H1 + 500L, 130L),
      ("m1", 4 * H1 + 100L, 500L), ("m1", 4 * H1 + 900L, 100L),
      ("m1", 4 * H1 + 2000L, 160L),
      ("m2", H1 + 700L, 900L), ("m2", 2 * H1 + 300L, 50L), ("m2", 2 * H1 + 800L, 75L))
    GraftStorage.write(ctrFixture(rows), s"$path/raw", SaveMode.Overwrite)
    GraftStorage.writeRollupRate(spark, s"$path/raw", s"$path/rate", isCounter = true)
    def base5(df: DataFrame, keys: Seq[String]) = df
      .select((keys ++ Seq("min", "avg", "max", "sum", "samples")).map(col): _*)
      .collect().map(_.toSeq).toSet
    val raw = ctrFixture(rows)
    // pooled, 2-hour buckets over the full span
    val b2 = graft.model.Buckets.fromStep(H1, 5 * H1, 2 * H1)
    assert(base5(GraftStorage.rollupRateStats(spark, s"$path/rate", b2,
      isCounter = true), Seq("bucket")) ==
      base5(graft.operators.MetricsOps.rateStats(raw, b2, isCounter = true,
        valueCol = "l_value"), Seq("bucket")))
    // by-metric, 1-hour buckets
    val b1 = graft.model.Buckets.fromStep(H1, 5 * H1, H1)
    assert(base5(GraftStorage.rollupRateStats(spark, s"$path/rate", b1,
      isCounter = true, byMetric = true), Seq("metric", "bucket")) ==
      base5(graft.operators.MetricsOps.numericBucketStats(
        graft.operators.MetricsOps.rate(raw, isCounter = true, valueCol = "l_value"),
        b1, byMetric = true, valueCol = "rate"), Seq("metric", "bucket")))
    // pre-range anchor: a serve starting at hour 2 still yields the
    // boundary rate into hour 2 (raw derives over the whole series and
    // range-filters rate TIMESTAMPS — the pair anchored in hour 1 counts)
    val bTail = graft.model.Buckets.fromStep(2 * H1, 5 * H1, H1)
    assert(base5(GraftStorage.rollupRateStats(spark, s"$path/rate", bTail,
      isCounter = true, byMetric = true), Seq("metric", "bucket")) ==
      base5(graft.operators.MetricsOps.numericBucketStats(
        graft.operators.MetricsOps.rate(raw, isCounter = true, valueCol = "l_value"),
        bTail, byMetric = true, valueCol = "rate"), Seq("metric", "bucket")))
    // id restriction equals the unfiltered answer cut to the metric, and
    // the plan reads the TIER directory only
    val only1 = GraftStorage.rollupRateStats(spark, s"$path/rate", b1,
      isCounter = true, byMetric = true, ids = Some(Seq("m1").toDF("metric")))
    assert(base5(only1, Seq("metric", "bucket")) ==
      base5(GraftStorage.rollupRateStats(spark, s"$path/rate", b1,
        isCounter = true, byMetric = true), Seq("metric", "bucket"))
        .filter(_.head == "m1"))
    val plan = only1.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("/rate") && !plan.contains("/raw]"),
      s"rate tier serving must read the tier only:\n$plan")
    // misaligned buckets are rejected loudly
    intercept[IllegalArgumentException] {
      GraftStorage.rollupRateStats(spark, s"$path/rate",
        graft.model.Buckets.fromStep(1L, H1 + 1, H1), isCounter = true)
    }
    // the id restriction rides the rate DISPATCH into both branches
    for (bb <- Seq(b1,
      graft.model.Buckets.fromStep(H1 + 1, 5 * H1 + 1, H1) /* raw branch */ ))
      assert(base5(GraftStorage.servedRateStats(spark, s"$path/raw", s"$path/rate",
        bb, isCounter = true, byMetric = true,
        ids = Some(Seq("m1").toDF("metric"))), Seq("metric", "bucket")) ==
        base5(GraftStorage.servedRateStats(spark, s"$path/raw", s"$path/rate",
          bb, isCounter = true, byMetric = true), Seq("metric", "bucket"))
          .filter(_.head == "m1"),
        s"ids must prune without changing m1's rows (buckets=$bb)")
    // gauge mode (no reset filter): the reset deltas COUNT as negative rates
    GraftStorage.writeRollupRate(spark, s"$path/raw", s"$path/grate",
      isCounter = false, valueCol = "l_value")
    assert(base5(GraftStorage.rollupRateStats(spark, s"$path/grate", b2,
      isCounter = false), Seq("bucket")) ==
      base5(graft.operators.MetricsOps.rateStats(raw, b2, isCounter = false,
        valueCol = "l_value"), Seq("bucket")))
  }

  test("rate histogram tier: served rate heatmap is bit-equal to " +
    "valueHistogram over the raw rate series — within-hour bins from the " +
    "distribution tier, boundary rates reconstructed from the rate tier " +
    "and binned at serve; quantile walk composes; meta/params guarded") {
    val s0 = spark
    import s0.implicits._
    val path = tmp()
    val H1 = GraftStorage.RollupMs
    val rows = Seq(
      ("m1", H1 + 100L, 10L), ("m1", H1 + 2000L, 40L), ("m1", H1 + 60000L, 100L),
      ("m1", 2 * H1 + 500L, 130L),
      ("m1", 4 * H1 + 100L, 500L), ("m1", 4 * H1 + 900L, 100L),
      ("m1", 4 * H1 + 2000L, 160L),
      ("m2", H1 + 700L, 900L), ("m2", 2 * H1 + 300L, 50L), ("m2", 2 * H1 + 800L, 75L))
    GraftStorage.write(ctrFixture(rows), s"$path/raw", SaveMode.Overwrite)
    GraftStorage.writeRollupRate(spark, s"$path/raw", s"$path/rate", isCounter = true)
    GraftStorage.writeRollupRateHist(spark, s"$path/raw", s"$path/rhist",
      isCounter = true, vMin = 0.0, vMax = 4000.0, bins = 8)
    def rows5(df: DataFrame) = df.select("bucket", "bin", "cnt", "bin_lo", "bin_hi")
      .collect().map(_.toSeq).toSet
    val b = graft.model.Buckets.fromStep(H1, 5 * H1, 2 * H1)
    val served = GraftStorage.rollupRateHistogram(spark, s"$path/rhist",
      s"$path/rate", b, isCounter = true)
    val onRead = graft.operators.MetricsOps.valueHistogram(
      graft.operators.MetricsOps.rate(ctrFixture(rows), isCounter = true,
        valueCol = "l_value"),
      b, vMin = 0.0, vMax = 4000.0, bins = 8, valueCol = "rate")
    assert(rows5(served) == rows5(onRead),
      "served rate histogram must equal the on-read rate heatmap")
    // quantile walk composes identically over both
    def q(df: DataFrame) = graft.operators.MetricsOps.histogramQuantile(df, 0.95)
      .collect().map(_.toSeq).toSet
    assert(q(served) == q(onRead))
    // pre-range anchor parity: a serve starting at hour 2 still bins the
    // hour-1→2 boundary rates (raw filters rate TIMESTAMPS only)
    val bTail = graft.model.Buckets.fromStep(2 * H1, 5 * H1, H1)
    assert(rows5(GraftStorage.rollupRateHistogram(spark, s"$path/rhist",
      s"$path/rate", bTail, isCounter = true)) ==
      rows5(graft.operators.MetricsOps.valueHistogram(
        graft.operators.MetricsOps.rate(ctrFixture(rows), isCounter = true,
          valueCol = "l_value"),
        bTail, vMin = 0.0, vMax = 4000.0, bins = 8, valueCol = "rate")))
    // mismatched refresh params refuse loudly
    intercept[IllegalArgumentException] {
      GraftStorage.writeRollupRateHist(spark, s"$path/raw", s"$path/rhist",
        isCounter = true, vMin = 0.0, vMax = 8000.0, bins = 8)
    }
  }

  test("servedRateStats dispatch: aligned requests read the rate tier, " +
    "misaligned read raw, both branches answer identically on aligned buckets") {
    val path = tmp()
    val H1 = GraftStorage.RollupMs
    GraftStorage.write(ctrFixture(Seq(
      ("m1", H1 + 100L, 10L), ("m1", H1 + 2000L, 40L), ("m1", 2 * H1 + 500L, 130L),
      ("m2", H1 + 700L, 900L), ("m2", 2 * H1 + 300L, 50L), ("m2", 2 * H1 + 800L, 75L))),
      s"$path/raw", SaveMode.Overwrite)
    GraftStorage.writeRollupRate(spark, s"$path/raw", s"$path/rate", isCounter = true)
    val aligned = graft.model.Buckets.fromStep(H1, 3 * H1, H1)
    def rows(df: DataFrame) = df
      .select("metric", "bucket", "min", "avg", "max", "sum", "samples")
      .collect().map(_.toSeq).toSet
    val viaTier = GraftStorage.servedRateStats(spark, s"$path/raw", s"$path/rate",
      aligned, isCounter = true, byMetric = true)
    val tierPlan = viaTier.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(tierPlan.contains("/rate") && !tierPlan.contains("/raw]"),
      s"aligned dispatch must read the rate tier only:\n$tierPlan")
    // force the raw branch at the same (aligned) buckets: both branches
    // must answer identically — the dispatch-invisibility contract
    val viaRaw = GraftStorage.servedRateStats(spark, s"$path/raw", s"$path/nosuch",
      aligned, isCounter = true, byMetric = true)
    assert(rows(viaTier) == rows(viaRaw),
      "tier and raw branches must agree on aligned buckets")
    // misaligned buckets route to raw even with the tier present
    val mis = graft.model.Buckets.fromStep(H1 + 1, H1 + 1 + 2 * H1, H1)
    val viaMis = GraftStorage.servedRateStats(spark, s"$path/raw", s"$path/rate",
      mis, isCounter = true, byMetric = true)
    val misPlan = viaMis.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(misPlan.contains("/raw]"),
      s"misaligned dispatch must fall back to raw:\n$misPlan")
  }

  test("histogram tier multi-tenant guard: unscoped serve over a two-tenant " +
    "tier refuses loudly; tenant-scoped serve equals the single-tenant answer") {
    val path = tmp()
    val H1 = GraftStorage.RollupMs
    val t1 = fixture(Seq(("m1", H1 + 100L, 1.0), ("m1", H1 + 200L, 9.0)))
    val t2 = fixture(Seq(("m1", H1 + 150L, 5.0))).withColumn("tenant_id", lit("t2"))
    GraftStorage.write(t1.union(t2), s"$path/raw", SaveMode.Overwrite)
    GraftStorage.writeRollupHist(spark, s"$path/raw", s"$path/hist",
      vMin = 0.0, vMax = 10.0, bins = 5)
    val b = graft.model.Buckets.fromStep(H1, 2 * H1, H1)
    // two (tenant, mtype) partitions feed the merge → loud refusal
    val err = intercept[IllegalArgumentException] {
      GraftStorage.rollupHistogram(spark, s"$path/hist", b)
    }
    assert(err.getMessage.contains("tenant"), err.getMessage)
    // scoped: each tenant's histogram is exactly its own-tier answer
    def rows(df: DataFrame) = df.select("bucket", "bin", "cnt")
      .collect().map(_.toSeq).toSet
    GraftStorage.write(t1, s"$path/rawT1", SaveMode.Overwrite)
    GraftStorage.writeRollupHist(spark, s"$path/rawT1", s"$path/histT1",
      vMin = 0.0, vMax = 10.0, bins = 5)
    assert(rows(GraftStorage.rollupHistogram(spark, s"$path/hist", b,
      tenant = Some("t"), mtypeCode = Some(MetricType.Gauge.code.toInt))) ==
      rows(GraftStorage.rollupHistogram(spark, s"$path/histT1", b)))
    assert(rows(GraftStorage.rollupHistogram(spark, s"$path/hist", b,
      tenant = Some("t2"))) == Set(Seq(0L, 2L, 1L)))
  }

  test("histogram tier meta discipline: data partitions with no _histmeta " +
    "refuse a refresh (unknowable bin edges) instead of adopting new ones") {
    val path = tmp()
    GraftStorage.write(fixture(Seq(("m1", 100L, 1.0))), s"$path/raw",
      SaveMode.Overwrite)
    GraftStorage.writeRollupHist(spark, s"$path/raw", s"$path/hist",
      vMin = 0.0, vMax = 10.0, bins = 5)
    // simulate the crashed-pre-meta legacy state: tier data, meta gone
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$path/hist/_histmeta"), true))
    val err = intercept[IllegalArgumentException] {
      GraftStorage.writeRollupHist(spark, s"$path/raw", s"$path/hist",
        vMin = 0.0, vMax = 20.0, bins = 5)
    }
    assert(err.getMessage.contains("_histmeta"), err.getMessage)
  }

  test("availability tier id restriction: equals the unfiltered answer cut " +
    "to the selected metrics, and the plan reads the tier only") {
    val s0 = spark
    import s0.implicits._
    val path = tmp()
    val H1 = GraftStorage.RollupMs
    val av = fixture(Seq(("m1", H1 + 100L, 0.0), ("m1", 2 * H1 + 200L, 0.0),
      ("m2", H1 + 300L, 0.0), ("m2", 2 * H1 + 400L, 0.0)))
      .withColumn("mtype", lit(MetricType.Availability.code.toInt))
      .withColumn("avail",
        when(col("metric") === "m1", lit(0)).otherwise(lit(1)))
      .withColumn("n_value", lit(null).cast("double"))
    GraftStorage.write(av, s"$path/raw", SaveMode.Overwrite)
    GraftStorage.writeRollupAvail(spark, s"$path/raw", s"$path/avroll")
    val b = graft.model.Buckets.fromStep(H1, 3 * H1, 2 * H1)
    def rows(df: DataFrame) = df
      .select("metric", "bucket", "up_ms", "down_ms", "not_up_count", "samples")
      .collect().map(_.toSeq).toSet
    val only2 = GraftStorage.rollupAvailStats(spark, s"$path/avroll", b,
      ids = Some(Seq("m2").toDF("metric")))
    assert(rows(only2) ==
      rows(GraftStorage.rollupAvailStats(spark, s"$path/avroll", b))
        .filter(_.head == "m2"))
    val plan = only2.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("/avroll") && !plan.contains("/raw]"),
      s"id-filtered availability serving must read the tier only:\n$plan")
  }

  test("multi-tenant tiers: serves that drop tenant keys refuse an unscoped " +
    "merge and scope via partition filters; keyed serves prune to one " +
    "tenant without changing that tenant's answer") {
    val path = tmp()
    val H1 = GraftStorage.RollupMs
    // same metric NAME for two tenants, different values — the mixing
    // hazard the guards exist for
    def gRaw(t: String, bump: Double) = fixture(Seq(
      ("m1", H1 + 100L, 1.0 + bump), ("m1", H1 + 200L, 3.0 + bump),
      ("m1", 2 * H1 + 100L, 10.0 + bump))).withColumn("tenant_id", lit(t))
    GraftStorage.write(gRaw("ta", 0.0), s"$path/raw", SaveMode.Overwrite)
    GraftStorage.write(gRaw("tb", 100.0), s"$path/raw")
    GraftStorage.writeRollup(spark, s"$path/raw", s"$path/roll")
    val b = graft.model.Buckets.fromStep(H1, 3 * H1, H1)
    // sums tier: unscoped over two tenants refuses loudly…
    val e1 = intercept[IllegalArgumentException] {
      GraftStorage.rollupStats(spark, s"$path/roll", b)
    }
    assert(e1.getMessage.contains("tenant"))
    // …and the scoped serve answers ta alone (bump 0, not 100-mixed)
    val scoped = GraftStorage.rollupStats(spark, s"$path/roll", b,
      tenant = Some("ta"), mtypeCode = Some(MetricType.Gauge.code.toInt))
    assert(scoped.select("metric", "bucket", "samples", "min", "sum")
      .collect().map(_.toSeq).toSet ==
      Set(Seq("m1", 0L, 2L, 1.0, 4.0), Seq("m1", 1L, 1L, 10.0, 10.0)))
    // the scope reaches the scan as a PARTITION filter (tenant_id leads
    // the tier layout — pruning happens at the listing, not per-row)
    def tenantPartitionFilter(df: DataFrame, t: String): Boolean =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("tenant_id") && l.contains(t))
    assert(tenantPartitionFilter(scoped, "ta"),
      "expected tenant_id partition filter on the scoped sums serve")
    // rate tier (output also drops tenant keys): same refuse-or-scope
    GraftStorage.writeRollupRate(spark, s"$path/raw", s"$path/rate",
      isCounter = false, valueCol = "n_value")
    intercept[IllegalArgumentException] {
      GraftStorage.rollupRateStats(spark, s"$path/rate", b, isCounter = false)
    }
    val rateTa = GraftStorage.rollupRateStats(spark, s"$path/rate", b,
      isCounter = false, byMetric = true, tenant = Some("ta"))
    assert(rateTa.select("metric", "bucket", "samples", "min", "avg", "max", "sum")
      .collect().map(_.toSeq).toSet ==
      GraftStorage.rollupRateStats(spark,
        { val p2 = tmp()
          GraftStorage.write(gRaw("ta", 0.0), s"$p2/raw", SaveMode.Overwrite)
          GraftStorage.writeRollupRate(spark, s"$p2/raw", s"$p2/rate",
            isCounter = false, valueCol = "n_value"); s"$p2/rate" }, b,
        isCounter = false, byMetric = true)
        .select("metric", "bucket", "samples", "min", "avg", "max", "sum")
        .collect().map(_.toSeq).toSet)
    // counter tier (keyed output — tenant scope is pruning only): the
    // scoped serve equals the unscoped answer cut to that tenant
    def cRaw(t: String, base: Long) = ctrFixture(Seq(
      ("c1", H1 + 100L, base + 10L), ("c1", H1 + 2000L, base + 40L),
      ("c1", 2 * H1 + 500L, base + 130L)), tenant = t)
    GraftStorage.write(cRaw("ta", 0L), s"$path/craw", SaveMode.Overwrite)
    GraftStorage.write(cRaw("tb", 1000L), s"$path/craw")
    GraftStorage.writeRollupCounter(spark, s"$path/craw", s"$path/ctr")
    val r = graft.model.TimeRange(H1, 3 * H1)
    def rows(df: DataFrame) = df
      .select("tenant_id", "metric", "increase", "n_resets")
      .collect().map(_.toSeq).toSet
    assert(rows(GraftStorage.rollupCounterIncrease(spark, s"$path/ctr", r,
      tenant = Some("ta"))) ==
      rows(GraftStorage.rollupCounterIncrease(spark, s"$path/ctr", r))
        .filter(_.head == "ta"))
    assert(tenantPartitionFilter(
      GraftStorage.rollupCounterIncrease(spark, s"$path/ctr", r,
        tenant = Some("ta")), "ta"),
      "expected tenant_id partition filter on the scoped counter serve")
    // DISPATCH-level coherence: the guard must fire on BOTH branches —
    // otherwise request alignment would flip between the tier guard's
    // loud refusal and a silent cross-tenant merge on the raw fallback
    val H = GraftStorage.RollupMs
    for (bb <- Seq(b /* aligned → tier */ ,
      graft.model.Buckets.fromStep(H + 1, 3 * H + 1, H) /* misaligned → raw */ ))
      intercept[IllegalArgumentException] {
        GraftStorage.servedStats(spark, s"$path/raw", s"$path/roll", bb)
      }
    // …while the scoped dispatch answers ta alone on EITHER branch
    def five(df: DataFrame) = df
      .select("metric", "bucket", "samples", "min", "sum")
      .collect().map(_.toSeq).toSet
    val expectTa = Set(Seq("m1", 0L, 2L, 1.0, 4.0), Seq("m1", 1L, 1L, 10.0, 10.0))
    assert(five(GraftStorage.servedStats(spark, s"$path/raw", s"$path/roll", b,
      tenant = Some("ta"), mtypeCode = Some(MetricType.Gauge.code.toInt))) == expectTa)
    assert(five(GraftStorage.servedStats(spark, s"$path/raw", s"$path/nosuchtier", b,
      tenant = Some("ta"), mtypeCode = Some(MetricType.Gauge.code.toInt))) == expectTa,
      "raw branch (no tier) must serve the scoped tenant identically")
  }

  test("rate tier (tenant, mtype) guard: a single-tenant tier holding counter- " +
    "AND gauge-rates refuses an unscoped serve; mtype scope serves one family " +
    "exactly and threads through the dispatch") {
    val path = tmp()
    val H1 = GraftStorage.RollupMs
    val ctrRows = Seq(
      ("m1", H1 + 100L, 10L), ("m1", H1 + 2000L, 40L), ("m1", 2 * H1 + 500L, 130L))
    GraftStorage.write(ctrFixture(ctrRows), s"$path/craw", SaveMode.Overwrite)
    GraftStorage.writeRollupRate(spark, s"$path/craw", s"$path/rate",
      isCounter = true, valueCol = "l_value")
    // a gauge-rate family under the SAME tenant and metric NAME…
    GraftStorage.write(fixture(Seq(
      ("m1", H1 + 300L, 5.0), ("m1", H1 + 4000L, 9.0), ("m1", 2 * H1 + 700L, 2.0))),
      s"$path/graw", SaveMode.Overwrite)
    GraftStorage.writeRollupRate(spark, s"$path/graw", s"$path/grate",
      isCounter = false, valueCol = "n_value")
    // …lands in the same tier dir (the mixed-family layout the pair guard
    // exists for — however a deployment got there, the serve must refuse
    // to pool counter-rates with gauge-rates)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val g = MetricType.Gauge.code.toInt
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$path/grate/tenant_id=t/mtype=$g"),
      new org.apache.hadoop.fs.Path(s"$path/rate/tenant_id=t/mtype=$g")))
    val b = graft.model.Buckets.fromStep(H1, 3 * H1, H1)
    // ONE tenant, TWO mtypes: unscoped refuses loudly (the old
    // tenants-only guard would have silently pooled the families)
    val e = intercept[IllegalArgumentException] {
      GraftStorage.rollupRateStats(spark, s"$path/rate", b, isCounter = true)
    }
    assert(e.getMessage.contains("mtype"))
    def five(df: DataFrame) = df
      .select("bucket", "min", "avg", "max", "sum", "samples")
      .collect().map(_.toSeq).toSet
    // scoped to the counter family the serve equals the raw-path answer
    val expect = five(graft.operators.MetricsOps.rateStats(
      ctrFixture(ctrRows), b, isCounter = true, valueCol = "l_value"))
    assert(five(GraftStorage.rollupRateStats(spark, s"$path/rate", b,
      isCounter = true, tenant = Some("t"),
      mtypeCode = Some(MetricType.Counter.code.toInt))) == expect)
    // the scope threads through the DISPATCH: tier branch and raw branch
    // (nonexistent tier) answer the scoped family identically
    for (rp <- Seq(s"$path/rate", s"$path/nosuch"))
      assert(five(GraftStorage.servedRateStats(spark, s"$path/craw", rp, b,
        isCounter = true, valueCol = "l_value", tenant = Some("t"),
        mtypeCode = Some(MetricType.Counter.code.toInt))) == expect,
        s"scoped rate dispatch must serve the counter family alone (tier=$rp)")
    // …and the unscoped dispatch refuses on the tier branch (raw listing
    // alone cannot see the tier's extra family)
    intercept[IllegalArgumentException] {
      GraftStorage.servedRateStats(spark, s"$path/craw", s"$path/rate", b,
        isCounter = true, valueCol = "l_value")
    }
  }

  test("counter-sums dispatch: servedStats with valueCol=l_value answers " +
    "identically from the counter tier and the raw fallback") {
    val path = tmp()
    val H1 = GraftStorage.RollupMs
    GraftStorage.write(ctrFixture(Seq(
      ("c1", H1 + 100L, 10L), ("c1", H1 + 2000L, 40L), ("c1", 2 * H1 + 500L, 130L))),
      s"$path/raw", SaveMode.Overwrite)
    GraftStorage.writeRollup(spark, s"$path/raw", s"$path/ctrsums",
      valueCol = "l_value")
    val b = graft.model.Buckets.fromStep(H1, 3 * H1, H1)
    def rows(df: DataFrame) = df
      .select("metric", "bucket", "min", "avg", "max", "sum", "samples")
      .collect().map(_.toSeq).toSet
    val viaTier = GraftStorage.servedStats(spark, s"$path/raw", s"$path/ctrsums",
      b, tenant = Some("t"), mtypeCode = Some(MetricType.Counter.code.toInt),
      valueCol = "l_value")
    val viaRaw = GraftStorage.servedStats(spark, s"$path/raw", s"$path/nosuch",
      b, tenant = Some("t"), mtypeCode = Some(MetricType.Counter.code.toInt),
      valueCol = "l_value")
    assert(rows(viaTier) == rows(viaRaw) && rows(viaTier).nonEmpty,
      "counter-sums dispatch must be branch-invisible")
    assert(rows(viaTier).exists(_.contains(130.0)),
      "values must come from the LONG counter column, double-cast")
  }

  test("availability dispatch tier guard: a tier holding more tenants than " +
    "raw refuses an unscoped aligned serve instead of silently emitting " +
    "duplicate rows; tenant scope serves both branches identically") {
    val path = tmp()
    val H1 = GraftStorage.RollupMs
    def av(t: String) = availFixture(Seq(
      ("m1", H1 + 100L, 0), ("m1", 2 * H1 + 500L, 1)))
      .withColumn("tenant_id", lit(t))
    // the TIER was built over a two-tenant raw…
    GraftStorage.write(av("ta"), s"$path/fullraw", SaveMode.Overwrite)
    GraftStorage.write(av("tb"), s"$path/fullraw")
    GraftStorage.writeRollupAvail(spark, s"$path/fullraw", s"$path/avroll")
    // …while the serving-time raw holds ONE tenant (retention-swept twin):
    // the dispatch guard's raw listing passes, but the tier branch would
    // emit each (metric, bucket) twice with tenant keys dropped
    GraftStorage.write(av("ta"), s"$path/raw", SaveMode.Overwrite)
    val aligned = graft.model.Buckets.fromStep(H1, 3 * H1, H1)
    val e = intercept[IllegalArgumentException] {
      GraftStorage.servedAvailStats(spark, s"$path/raw", s"$path/avroll", aligned)
    }
    assert(e.getMessage.contains("tenant"))
    def rows(df: DataFrame) = df
      .select("metric", "bucket", "up_ms", "down_ms", "not_up_count", "samples")
      .collect().map(_.toSeq).toSet
    val viaTier = GraftStorage.servedAvailStats(spark, s"$path/raw",
      s"$path/avroll", aligned, tenant = Some("ta"))
    val viaRaw = GraftStorage.servedAvailStats(spark, s"$path/raw",
      s"$path/nosuch", aligned, tenant = Some("ta"))
    assert(rows(viaTier) == rows(viaRaw) && rows(viaTier).nonEmpty,
      "tenant-scoped availability dispatch must answer identically from either branch")
  }

  test("AtomicSwap.swapDir create-or-replace: a fresh build commits via the " +
    "single tmp rename; a crashed build's dot-tmp is pre-cleaned; a rebuild " +
    "replaces the whole unit") {
    val s = spark
    import s.implicits._
    val parent = tmp()
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    // crash residue from a failed FIRST build: only the invisible tmp
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$parent/.ix.compact/partial"))
    AtomicSwap.swapDir(spark, parent, "ix") { tmpDir =>
      Seq((1L, "a")).toDF("id", "v").write.parquet(s"$tmpDir/t")
    }
    assert(s.read.parquet(s"$parent/ix/t").count() == 1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$parent/.ix.compact")),
      "the crashed build's tmp must not survive the successful one")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$parent/.ix.old")),
      "a fresh build has no old copy to park")
    // rebuild: full replacement, old contents gone
    AtomicSwap.swapDir(spark, parent, "ix") { tmpDir =>
      Seq((2L, "b"), (3L, "c")).toDF("id", "v").write.parquet(s"$tmpDir/t2")
    }
    assert(s.read.parquet(s"$parent/ix/t2").count() == 2)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$parent/ix/t")),
      "a rebuild must replace the whole unit")
  }

  test("AtomicSwap warns on copy-rename object-store schemes and stays " +
    "silent on rename-atomic filesystems") {
    for (s <- Seq("s3a", "S3A", "gs", "abfs"))
      assert(AtomicSwap.nonAtomicRenameWarning(s, "t").exists(_.contains("non-atomic")),
        s"scheme $s must warn")
    for (s <- Seq("file", "hdfs", "viewfs"))
      assert(AtomicSwap.nonAtomicRenameWarning(s, "t").isEmpty, s"scheme $s must not warn")
  }
}
