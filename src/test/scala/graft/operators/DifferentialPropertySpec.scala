package graft.operators

import graft.SparkTestBase

/** Seeded randomized differential tests: the distributed operators vs
  * naive in-memory references over adversarial random inputs (ties,
  * duplicates, sparse keys). Fixed seeds — failures reproduce. */
class DifferentialPropertySpec extends SparkTestBase {

  private val rnd = new scala.util.Random(0xD1FF5EEDL)

  private def randomEvents(n: Int, users: Int, maxT: Long): Seq[(Long, Long, String, Long, Double)] =
    (1 to n).map { i =>
      (i.toLong, rnd.nextInt(users).toLong,
        Seq("click", "buy")(rnd.nextInt(2)),
        rnd.nextLong(maxT), math.floor(rnd.nextDouble() * 100) / 10)
    }

  test("sessionize agrees with a naive per-user reference over random ties and gaps") {
    val s = spark
    import s.implicits._
    val ev = randomEvents(400, 12, 2000L) // dense → many ties and tiny gaps
    val gap = 50L
    val got = EventOps.sessionize(
      ev.toDF("event_id", "user_id", "event_type", "time", "value"), gap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))
      .toSet
    // reference: sort per user by (time, event_id), split on delta > gap
    val expected = ev.groupBy(_._2).toSeq.flatMap { case (user, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._1))
      val sessions = sorted.tail.foldLeft(Vector(Vector(sorted.head))) { (acc, e) =>
        if (e._4 - acc.last.last._4 > gap) acc :+ Vector(e)
        else acc.init :+ (acc.last :+ e)
      }
      sessions.zipWithIndex.map { case (ss, i) =>
        (user, i + 1L, ss.head._4, ss.last._4, ss.length.toLong)
      }
    }.toSet
    assert(got == expected)
  }

  test("asOf agrees with a naive latest-at-or-before scan over random data") {
    val s = spark
    import s.implicits._
    val ev = randomEvents(300, 8, 500L) // dense times → equal-ts collisions
    val left = ev.filter(_._3 == "buy")
    // right deduped per (user, time) by max event_id — the documented contract
    val rightRows = ev.filter(_._3 == "click")
      .groupBy(r => (r._2, r._4)).map { case ((u, t), rs) => (u, t, rs.maxBy(_._1)._5) }
      .toSeq
    val got = AsOfJoin.asOf(
      left.map(r => (r._1, r._2, r._4, r._5)).toDF("event_id", "user_id", "time", "value"),
      rightRows.toDF("user_id", "time", "v"), "user_id", "time", "v")
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(4)), Option(r.get(5)))).toMap
    left.foreach { l =>
      val preds = rightRows.filter(r => r._1 == l._2 && r._2 <= l._4)
      val expected =
        if (preds.isEmpty) (None, None)
        else {
          val best = preds.maxBy(_._2)
          (Some(best._3), Some(best._2))
        }
      assert(got(l._1) == expected, s"left ${l._1} (user ${l._2}, t ${l._4})")
    }
  }

  test("PPM decode round-trips 100 random images (geometry, whitespace, " +
    "comments, pixel bytes); truncations answer None; resize picks exactly " +
    "in(2x,2y)") {
    for (_ <- 1 to 100) {
      val w = 1 + rnd.nextInt(20); val h = 1 + rnd.nextInt(20)
      val mx = 1 + rnd.nextInt(255)
      val pix = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
      val ws = () => Seq(" ", "\n", "\t", " \n", " # noise\n")(rnd.nextInt(5))
      val header = s"P6${ws()}$w${ws()}$h${ws()}$mx\n"
      val payload = header.getBytes("UTF-8") ++ pix
      val img = Multimodal.decodePpm(payload)
        .getOrElse(fail(s"decode failed for ${header.replace("\n", "\\n")}"))
      assert(img.width == w && img.height == h && img.maxVal == mx)
      assert(img.pixels.toSeq == pix.toSeq)
      // any truncation inside the pixel region must refuse, not misparse
      val cut = header.length + rnd.nextInt(pix.length)
      assert(Multimodal.decodePpm(payload.take(cut)).isEmpty, s"cut=$cut")
      // resize: every output pixel is the exact (2x, 2y) source pixel
      if (w >= 2 && h >= 2) {
        val ow = w / 2; val oh = h / 2
        var expect = 0L
        for (y <- 0 until oh; x <- 0 until ow; c <- 0 until 3)
          expect += pix(((2 * y) * w + 2 * x) * 3 + c) & 0xff
        val s2 = spark
        import s2.implicits._
        val r = Multimodal.ppmResize(
          Seq((1L, payload, "image")).toDF("doc_id", "payload", "modality"))
          .collect().head
        assert(r.out_w == ow && r.out_h == oh && r.out_checksum == expect)
      }
    }
  }

  test("GV1 demux round-trips random containers; any pixel-region truncation refuses") {
    for (_ <- 1 to 60) {
      val nf = 1 + rnd.nextInt(6); val w = 1 + rnd.nextInt(8); val h = 1 + rnd.nextInt(8)
      val fs = w * h * 3
      val frames = Array.fill[Byte](nf * fs)(rnd.nextInt(256).toByte)
      val payload = s"GV1\n$nf $w $h\n".getBytes("UTF-8") ++ frames
      val v = Multimodal.demuxVideo(payload)
        .getOrElse(fail(s"demux failed nf=$nf w=$w h=$h"))
      assert(v.nFrames == nf && v.width == w && v.height == h)
      for (k <- 0 until nf)
        assert(v.frames(k).toSeq == frames.slice(k * fs, (k + 1) * fs).toSeq)
      val cut = payload.length - 1 - rnd.nextInt(fs)
      assert(Multimodal.demuxVideo(payload.take(cut)).isEmpty)
    }
  }

  test("distributedClusters agrees with an in-memory union-find over random " +
    "graphs (self-loops, duplicate edges, isolated pairs)") {
    val s = spark
    import s.implicits._
    for (trial <- 1 to 3) {
      val nodes = 30 + trial * 10
      val edges = (1 to 80).map(_ =>
        (rnd.nextInt(nodes).toLong, rnd.nextInt(nodes).toLong)) ++
        Seq((nodes.toLong, nodes.toLong)) // self loop
      val got = Dedup.distributedClusters(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference union-find
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val allNodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // canonical label = min node of the component
      val byRoot = allNodes.groupBy(find)
      val expected = byRoot.values.flatMap(ns => ns.map(_ -> ns.min)).toMap
      assert(got == expected, s"trial $trial")
    }
  }

  // ---- rollup-tier merges vs the raw-path operators: the raw operators
  // are DuckDB-oracled elsewhere, so these pin the TIER MERGE logic
  // (boundary reattribution, empty-hour absorption, boundary deltas)
  // over adversarial random inputs — sparse hours, random states/values,
  // hour-edge collisions — at several enclosing widths.

  private def canonicalPoints(rows: Seq[(String, Long, Option[Double], Option[Long], Option[Int])]) = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    rows.toDF("metric", "time", "n_value", "l_value", "avail")
      .withColumn("tenant_id", lit("t"))
      .withColumn("mtype", lit(0))
      .withColumn("s_value", lit(null).cast("string"))
      .withColumn("tags", map(lit("k"), lit("v")))
  }

  test("availability tier merge agrees with the A3 state machine over random " +
    "sparse multi-hour series at several bucket widths") {
    import graft.storage.GraftStorage
    val H1 = GraftStorage.RollupMs
    val D = 24 * H1
    val path = java.nio.file.Files.createTempDirectory("graft-avprop").toString
    val pts = (0 until 4).flatMap { m =>
      // sparse: each metric populates a random subset of the 8 hours,
      // with hour-edge-adjacent timestamps in the mix
      (1 to 50).map { _ =>
        val t = D + rnd.nextInt(8) * H1 +
          Seq(0L, 1L, H1 - 1, rnd.nextInt(H1.toInt).toLong)(rnd.nextInt(4))
        (s"m$m", t, None: Option[Double], None: Option[Long],
          Some(rnd.nextInt(4)): Option[Int])
      }
    }.groupBy(p => (p._1, p._2)).map(_._2.head).toSeq // unique (metric, time)
    GraftStorage.write(canonicalPoints(pts), s"$path/raw",
      org.apache.spark.sql.SaveMode.Overwrite)
    GraftStorage.writeRollupAvail(spark, s"$path/raw", s"$path/roll")
    val cols = Seq("metric", "bucket", "up_ms", "down_ms", "unknown_ms",
      "admin_ms", "last_not_uptime", "not_up_count", "samples", "uptime_ratio")
    for (stepHours <- Seq(1, 2, 4, 8)) {
      val b = graft.model.Buckets.fromStep(D, D + 8 * H1, stepHours * H1)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select(cols.map(org.apache.spark.sql.functions.col): _*)
          .collect().map(_.toSeq).toSet
      val served = rows(GraftStorage.rollupAvailStats(spark, s"$path/roll", b))
      val onRead = rows(MetricsOps.availabilityBucketStats(
        GraftStorage.readResolved(spark, s"$path/raw"), b))
      assert(served == onRead, s"stepHours=$stepHours")
    }
  }

  test("counter tier merge agrees with counterIncrease over random resetting " +
    "sparse series") {
    import graft.storage.GraftStorage
    val H1 = GraftStorage.RollupMs
    val D = 24 * H1
    val path = java.nio.file.Files.createTempDirectory("graft-ctrprop").toString
    val pts = (0 until 4).flatMap { m =>
      (1 to 60).map { _ =>
        val t = D + rnd.nextInt(8) * H1 +
          Seq(0L, 1L, H1 - 1, rnd.nextInt(H1.toInt).toLong)(rnd.nextInt(4))
        // random values dip randomly → organic resets at random positions
        (s"m$m", t, None: Option[Double],
          Some(rnd.nextInt(1000).toLong): Option[Long], None: Option[Int])
      }
    }.groupBy(p => (p._1, p._2)).map(_._2.head).toSeq
    GraftStorage.write(canonicalPoints(pts), s"$path/raw",
      org.apache.spark.sql.SaveMode.Overwrite)
    GraftStorage.writeRollupCounter(spark, s"$path/raw", s"$path/roll")
    val range = graft.model.TimeRange(D, D + 8 * H1)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("metric", "increase", "n_resets", "n_deltas")
        .collect().map(_.toSeq).toSet
    val served = rows(GraftStorage.rollupCounterIncrease(spark, s"$path/roll", range))
    val onRead = rows(MetricsOps.counterIncrease(
      GraftStorage.readResolved(spark, s"$path/raw"), range, valueCol = "l_value"))
    assert(served == onRead)
  }

  test("histogram tier merge agrees with valueHistogram over random values " +
    "including out-of-range clamps, at two grains") {
    import graft.storage.GraftStorage
    val H1 = GraftStorage.RollupMs
    val D = 24 * H1
    val path = java.nio.file.Files.createTempDirectory("graft-histprop").toString
    // values straddle the declared [0, 100) range on both sides → edge
    // bins clamp; random in-hour positions incl. hour edges
    val pts = (0 until 4).flatMap { m =>
      (1 to 80).map { _ =>
        val t = D + rnd.nextInt(8) * H1 +
          Seq(0L, 1L, H1 - 1, rnd.nextInt(H1.toInt).toLong)(rnd.nextInt(4))
        (s"m$m", t, Some(rnd.nextDouble() * 160 - 30): Option[Double],
          None: Option[Long], None: Option[Int])
      }
    }.groupBy(p => (p._1, p._2)).map(_._2.head).toSeq
    GraftStorage.write(canonicalPoints(pts), s"$path/raw",
      org.apache.spark.sql.SaveMode.Overwrite)
    GraftStorage.writeRollupHist(spark, s"$path/raw", s"$path/hist",
      vMin = 0.0, vMax = 100.0, bins = 5)
    val raw = GraftStorage.readResolved(spark, s"$path/raw")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("bucket", "bin", "cnt", "bin_lo", "bin_hi")
        .collect().map(_.toSeq).toSet
    for (b <- Seq(graft.model.Buckets.fromStep(D, D + 8 * H1, H1),
      graft.model.Buckets.fromStep(D, D + 8 * H1, 4 * H1)))
      assert(rows(GraftStorage.rollupHistogram(spark, s"$path/hist", b)) ==
        rows(MetricsOps.valueHistogram(raw, b, 0.0, 100.0, 5)),
        s"grain ${b.step}")
  }

  test("rate tier merge agrees with rate+A1 over random resetting sparse " +
    "series, both modes, two grains") {
    import graft.storage.GraftStorage
    val H1 = GraftStorage.RollupMs
    val D = 24 * H1
    val path = java.nio.file.Files.createTempDirectory("graft-rateprop").toString
    // random in-hour positions incl. hour edges; random dips → reset
    // pairs at random places, some hours empty, some single-point
    val pts = (0 until 4).flatMap { m =>
      (1 to 60).map { _ =>
        val t = D + rnd.nextInt(8) * H1 +
          Seq(0L, 1L, H1 - 1, rnd.nextInt(H1.toInt).toLong)(rnd.nextInt(4))
        (s"m$m", t, None: Option[Double],
          Some(rnd.nextInt(1000).toLong): Option[Long], None: Option[Int])
      }
    }.groupBy(p => (p._1, p._2)).map(_._2.head).toSeq
    GraftStorage.write(canonicalPoints(pts), s"$path/raw",
      org.apache.spark.sql.SaveMode.Overwrite)
    val raw = GraftStorage.readResolved(spark, s"$path/raw")
    def rows(df: org.apache.spark.sql.DataFrame, keys: Seq[String]) =
      df.select((keys ++ Seq("min", "avg", "max", "sum", "samples"))
        .map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toSeq).toSet
    for (counterMode <- Seq(true, false)) {
      val tier = s"$path/rate_$counterMode"
      GraftStorage.writeRollupRate(spark, s"$path/raw", tier,
        isCounter = counterMode)
      // per-metric at the hour grain AND pooled at a 3h grain (several
      // boundary pairs per bucket; start offset leaves a pre-range anchor)
      val b1 = graft.model.Buckets.fromStep(D + H1, D + 8 * H1, H1)
      assert(rows(GraftStorage.rollupRateStats(spark, tier, b1,
        isCounter = counterMode, byMetric = true), Seq("metric", "bucket")) ==
        rows(MetricsOps.numericBucketStats(
          MetricsOps.rate(raw, isCounter = counterMode, valueCol = "l_value"),
          b1, byMetric = true, valueCol = "rate"), Seq("metric", "bucket")),
        s"per-metric hour grain, isCounter=$counterMode")
      val b3 = graft.model.Buckets.fromStep(D + H1, D + 7 * H1, 3 * H1)
      assert(rows(GraftStorage.rollupRateStats(spark, tier, b3,
        isCounter = counterMode), Seq("bucket")) ==
        rows(MetricsOps.rateStats(raw, b3, isCounter = counterMode,
          valueCol = "l_value"), Seq("bucket")),
        s"pooled 3h grain, isCounter=$counterMode")
    }
  }

  test("changePoints agrees with a naive double-window scan (random series)") {
    val s = spark
    import s.implicits._
    val vals = (1 to 120).map(i => (i * 10L, math.floor(rnd.nextDouble() * 1000) / 10))
    val dp = vals.map { case (t, v) => ("t", 0, "m", t, v) }
      .toDF("tenant_id", "mtype", "metric", "time", "n_value")
    val w = 4; val thr = 11.5
    val got = MetricsOps.changePoints(dp, graft.model.TimeRange(1L, 10000L), w, thr)
      .collect().map(_.getLong(1)).toSet
    val expected = vals.indices.collect {
      case i if i >= w && i + w <= vals.length &&
        math.abs(vals.slice(i, i + w).map(_._2).sum / w -
          vals.slice(i - w, i).map(_._2).sum / w) >= thr => vals(i)._1
    }.toSet
    assert(got == expected)
  }

  test("tier-serving API differential: tiered and plain services agree over " +
    "random fixtures on random aligned AND misaligned grids (gauge, " +
    "counter, availability)") {
    import graft.api.MetricsService
    import graft.model.{BucketConfig, MetricId, MetricType, TimeRange}
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val H = graft.storage.GraftStorage.RollupMs
    val root = java.nio.file.Files.createTempDirectory("graft-tierdiff").toString
    val tiered = new MetricsService(spark, root, Some(MetricsService.defaultTiers(root)))
    val plain = new MetricsService(spark, root)
    // unique (metric, time) pairs: the raw fetch path serves the
    // pre-compaction view (no LWW resolve), the tier builds from the
    // resolved read — on a duplicate-free store the two views coincide
    def times(n: Int) = rnd.shuffle((1 until (6 * H / 1000).toInt).toVector)
      .take(n).map(_ * 1000L)
    val metrics = Seq("ma", "mb", "mc")
    val gRows = metrics.flatMap(m => times(80).map(t =>
      (m, t, math.floor(rnd.nextDouble() * 1000) / 10)))
    val cRows = metrics.flatMap(m => times(60).sorted.zipWithIndex.map {
      case (t, i) => (m, t, (i * 7 + rnd.nextInt(5)).toLong) })
    val aRows = metrics.flatMap(m => times(50).map(t => (m, t, rnd.nextInt(4))))
    tiered.addDataPoints(canonicalPoints(
      gRows.toDF("metric", "time", "n_value"), MetricType.Gauge))
    tiered.addDataPoints(canonicalPoints(
      cRows.toDF("metric", "time", "l_value"), MetricType.Counter))
    tiered.addDataPoints(canonicalPoints(
      aRows.toDF("metric", "time", "avail"), MetricType.Availability))
    tiered.refreshTiers()
    // BACKFILL step: late points land below the freshness watermark (new
    // unique timestamps, preserving the duplicate-free contract above) —
    // the ingest marks their slices dirty, and a BOUNDED refresh whose
    // own window does NOT cover them (fromSlice = 1; all data sits in
    // slice 0) must still fold them into the tiers via the dirty sweep
    val late = metrics.flatMap(m => times(10).map(t =>
      (m, t + 7L, math.floor(rnd.nextDouble() * 1000) / 10)))
    tiered.addDataPoints(canonicalPoints(
      late.toDF("metric", "time", "n_value"), MetricType.Gauge))
    tiered.refreshTiers(fromSlice = 1)
    def rows(df: org.apache.spark.sql.DataFrame, cols: Seq[String]) =
      df.select(("bucket" +: cols).map(col): _*).collect().map(_.toSeq).toSet
    val five = Seq("min", "avg", "max", "sum", "samples")
    val aCols = Seq("up_ms", "down_ms", "unknown_ms", "admin_ms",
      "last_not_uptime", "not_up_count", "samples", "uptime_ratio")
    (1 to 8).foreach { _ =>
      // random grid: aligned when the random step divides into hours
      val startH = 1 + rnd.nextInt(3) // Buckets requires a positive start
      val spanH = 1 + rnd.nextInt(6 - startH)
      val aligned = rnd.nextBoolean()
      val cfg =
        if (aligned) BucketConfig(
          TimeRange(startH * H, (startH + spanH) * H), Some(spanH), None)
        else BucketConfig(
          TimeRange(startH * H + 1 + rnd.nextInt(1000),
            (startH + spanH) * H + 1 + rnd.nextInt(1000)),
          Some(1 + rnd.nextInt(7)), None)
      val m = metrics(rnd.nextInt(metrics.length))
      val g = MetricId("t1", MetricType.Gauge.code, m)
      val c = MetricId("t1", MetricType.Counter.code, m)
      val av = MetricId("t1", MetricType.Availability.code, m)
      assert(rows(tiered.findGaugeStats(g, cfg), five) ==
        rows(plain.findGaugeStats(g, cfg), five), s"gauge $cfg")
      assert(rows(tiered.findCounterStats(c, cfg), five) ==
        rows(plain.findCounterStats(c, cfg), five), s"counter $cfg")
      assert(rows(tiered.findAvailabilityStats(av, cfg), aCols) ==
        rows(plain.findAvailabilityStats(av, cfg), aCols), s"avail $cfg")
      assert(rows(tiered.findRateStats(c, cfg), five) ==
        rows(plain.findRateStats(c, cfg), five), s"rate $cfg")
      // pooled multi-metric over a random id subset
      val ids = rnd.shuffle(metrics).take(1 + rnd.nextInt(3))
      assert(rows(tiered.findNumericStats("t1", MetricType.Gauge, ids, cfg,
        Seq.empty, stacked = false), five) ==
        rows(plain.findNumericStats("t1", MetricType.Gauge, ids, cfg,
          Seq.empty, stacked = false), five), s"pooled $ids $cfg")
    }
  }
}
