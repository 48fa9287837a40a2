package graft.streaming

import graft.SparkTestBase
import graft.model.MetricType
import graft.storage.GraftStorage
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming ingest specs: watermark late-data semantics (the reference's
  * slice-expiry behavior, SURVEY §2.9) and streaming dedup. */
class StreamingIngestSpec extends SparkTestBase {

  private val H2 = GraftStorage.SliceMs

  case class P(tenant_id: String, mtype: Int, metric: String, time: Long, n_value: Double)
  case class CP(tenant_id: String, mtype: Int, metric: String, time: Long,
                n_value: Option[Double], l_value: Option[Long])

  test("streaming ingest lands in the partitioned raw tier; in-stream dups collapse") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val path = Files.createTempDirectory("graft-stream").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val mem = MemoryStream[P]
    val q = StreamingIngest.start(mem.toDF(), path, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    mem.addData(P("t", 0, "m1", 1000L, 1.0), P("t", 0, "m1", 1000L, 1.0), // dup in stream
      P("t", 0, "m1", H2 + 500, 2.0))
    q.processAllAvailable()
    q.stop()
    val back = GraftStorage.read(s, path)
    assert(back.count() == 2) // dup collapsed by dropDuplicatesWithinWatermark
    assert(back.select("time_slice").distinct().count() == 2)
  }

  test("streaming histogram-tier maintenance: each batch refreshes only its " +
    "slice span (other slices' files byte-identical), and the drained tier " +
    "equals a fresh batch build over the same raw") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val base = Files.createTempDirectory("graft-sthist").toString
    val H1 = GraftStorage.RollupMs
    val mem = MemoryStream[P]
    // widen the fixture to the canonical column set — the tier refresh
    // reads RESOLVED raw, whose LWW tiebreak references every value column
    val pts = mem.toDF()
      .withColumn("l_value", lit(null).cast("long"))
      .withColumn("avail", lit(null).cast("int"))
      .withColumn("s_value", lit(null).cast("string"))
      .withColumn("tags", map(lit("k"), lit("v")))
    val q = StreamingIngest.startWithHistTier(pts, s"$base/raw",
      s"$base/hist", s"$base/ckpt", vMin = 0.0, vMax = 10.0, bins = 5,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    // wave 1: slice 0 (hour 1) — edge-bin values
    mem.addData(P("t", 0, "m1", H1 + 100, 1.0), P("t", 0, "m1", H1 + 200, 9.0))
    q.processAllAvailable()
    def sliceFiles(slice: Long): Map[String, (Long, Long)] = {
      val dir = new java.io.File(s"$base/hist/tenant_id=t/mtype=0/time_slice=$slice")
      dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    }
    val wave1Files = sliceFiles(0L)
    assert(wave1Files.nonEmpty)
    // wave 2: slice 1 only (one SliceMs day later) — the refresh window
    // must not touch slice 0's tier files
    mem.addData(P("t", 0, "m2", H2 + 3 * H1 + 100, 5.0))
    q.processAllAvailable()
    q.stop()
    assert(sliceFiles(0L) == wave1Files,
      "slice-0 tier files must be byte-identical after a slice-1-only batch")
    // drained tier == fresh batch build over the same raw
    GraftStorage.writeRollupHist(s, s"$base/raw", s"$base/hist2",
      vMin = 0.0, vMax = 10.0, bins = 5)
    val b = graft.model.Buckets.fromStep(H1, H2 + 4 * H1, H1)
    def rows(p: String) = GraftStorage.rollupHistogram(s, p, b)
      .collect().map(_.toSeq).toSet
    val streamed = rows(s"$base/hist")
    assert(streamed == rows(s"$base/hist2"))
    // and the counts are the expected bins: 1.0→bin0, 9.0→bin4 (hour-1
    // bucket 0), 5.0→bin2 (hour-27 bucket 26)
    assert(streamed == Set(
      Seq(0L, 0L, 1L, 0.0, 2.0), Seq(0L, 4L, 1L, 8.0, 10.0),
      Seq(26L, 2L, 1L, 4.0, 6.0)))
  }

  test("streaming corpus dedup: in-batch dups collapse; a RESTART from the " +
    "checkpoint recovers the admitted-hash state and drops replayed content") {
    val s = spark
    import s.implicits._
    val src = Files.createTempDirectory("graft-docs-src").toString
    val tier = Files.createTempDirectory("graft-docs-tier").toString + "/tier"
    val ckpt = Files.createTempDirectory("graft-docs-ckpt").toString
    def land(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    land(Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma")))
    val schema = s.read.parquet(src).schema
    def drain(): Unit = {
      val q = StreamingCorpus.dedupIngest(
        s.readStream.schema(schema).parquet(src), tier, ckpt)
      q.awaitTermination()
    }
    drain()
    assert(s.read.parquet(tier).count() == 2) // in-batch dup collapsed
    // second wave under a FRESH query from the same checkpoint: a
    // duplicate of already-admitted content plus a new text — recovered
    // state must drop the former, admit the latter
    land(Seq((4L, "alpha beta"), (5L, "delta")))
    drain()
    val back = s.read.parquet(tier)
    assert(back.count() == 3)
    assert(back.select("content_md5").distinct().count() == 3)
    assert(back.select("text").as[String].collect().toSet ==
      Set("alpha beta", "gamma", "delta"))
  }

  test("streaming ingest restart: the checkpoint skips processed files and " +
    "recovers dedup state, so nothing lands twice") {
    val s = spark
    import s.implicits._
    val src = Files.createTempDirectory("graft-restart-src").toString
    val tier = Files.createTempDirectory("graft-restart-tier").toString + "/tier"
    val ckpt = Files.createTempDirectory("graft-restart-ckpt").toString
    def land(rows: Seq[(String, Int, String, Long, Double)]): Unit =
      rows.toDF("tenant_id", "mtype", "metric", "time", "n_value")
        .coalesce(1).write.mode("append").parquet(src)
    land(Seq(("t", 0, "m1", 1000L, 1.0), ("t", 0, "m1", 2000L, 2.0)))
    val schema = s.read.parquet(src).schema
    def drain(): Unit = {
      val q = StreamingIngest.start(s.readStream.schema(schema).parquet(src), tier, ckpt)
      q.awaitTermination()
    }
    drain()
    assert(GraftStorage.read(s, tier).count() == 2)
    // second wave: one new point + a REPLAY of an already-ingested one.
    // The restarted query must (a) not reprocess the first file and
    // (b) recover the dedup state store, dropping the replayed point.
    land(Seq(("t", 0, "m1", 3000L, 3.0), ("t", 0, "m1", 1000L, 1.0)))
    drain()
    val back = GraftStorage.read(s, tier)
    assert(back.count() == 3, s"expected exactly-once landing, got ${back.count()}")
    assert(back.groupBy("time").count().filter(col("count") > 1).count() == 0)
  }

  test("streaming counter rate: state crosses batches, resets drop the pair") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[CP]
    val q = StreamingRate.rates(mem.toDF(), isCounter = true)
      .writeStream.format("memory").queryName("rates").outputMode("append").start()
    val t0 = 1000000L
    mem.addData(CP("t", 2, "c", t0, None, Some(100L)),
      CP("t", 2, "c", t0 + 30000, None, Some(200L)))
    q.processAllAvailable()
    // next batch: reset (50 < 200) then recovery — state carried over
    mem.addData(CP("t", 2, "c", t0 + 60000, None, Some(50L)),
      CP("t", 2, "c", t0 + 90000, None, Some(80L)))
    q.processAllAvailable()
    q.stop()
    val got = s.sql("SELECT time, rate FROM rates ORDER BY time")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((t0 + 30000, 200.0), (t0 + 90000, 60.0)))
  }

  test("streaming rate: idle series state is evicted past the watermark horizon; " +
    "a revived series re-seeds instead of pairing across the eviction") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val Day = 86400000L
    val mem = MemoryStream[CP]
    // idle horizon 24h, lateness 2h
    val q = StreamingRate.rates(mem.toDF(), isCounter = false)
      .writeStream.format("memory").queryName("evict_rates").outputMode("append").start()
    mem.addData(CP("t", 0, "a", 1000L, Some(1.0), None),
      CP("t", 0, "b", 1000L, Some(1.0), None))
    q.processAllAvailable()
    // b's next point drives event time to 3d → watermark 3d-2h, far past
    // a's idle deadline (1000ms + 24h)
    mem.addData(CP("t", 0, "b", 3 * Day, Some(2.0), None))
    q.processAllAvailable()
    // one more batch so the advanced watermark fires a's timeout
    mem.addData(CP("t", 0, "b", 3 * Day + 1000, Some(3.0), None))
    q.processAllAvailable()
    // a revives: with state evicted this must RE-SEED (no rate), not pair
    // against the pre-eviction point
    mem.addData(CP("t", 0, "a", 3 * Day + 2000, Some(9.0), None))
    q.processAllAvailable()
    q.stop()
    val aRates = s.sql("SELECT * FROM evict_rates WHERE metric = 'a'").collect()
    assert(aRates.isEmpty, s"evicted series must not pair across eviction: ${aRates.toSeq}")
    assert(s.sql("SELECT * FROM evict_rates WHERE metric = 'b'").count() == 2)
  }

  case class AP(tenant_id: String, mtype: Int, metric: String, time: Long, avail: Int)

  test("streaming availability buckets: state machine fires once on watermark; " +
    "late point neither contributes nor re-emits") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val Day = 86400000L
    val mem = MemoryStream[AP]
    val q = StreamingAvail.slices(mem.toDF()).toDF()
      .writeStream.format("memory").queryName("avail_slices").outputMode("append").start()
    // day 0: UP from bucket start, DOWN for the second half
    mem.addData(AP("t", 1, "m", 1000L, 0), AP("t", 1, "m", Day / 2, 1))
    q.processAllAvailable()
    mem.addData(AP("t", 1, "m", 4 * Day, 0)) // watermark → 4d - 2h > day-0 end
    q.processAllAvailable()
    // late day-0 point (far behind the watermark): must be filtered, not
    // resurrect the finalized bucket as a duplicate row
    mem.addData(AP("t", 1, "m", 2000L, 1))
    q.processAllAvailable()
    mem.addData(AP("t", 1, "m", 8 * Day, 0))
    q.processAllAvailable()
    q.stop()
    val rows = s.sql("SELECT * FROM avail_slices WHERE bucket_start = 0").collect()
    assert(rows.length == 1, s"expected one finalized day-0 row, got ${rows.toSeq}")
    val r = rows.head
    assert(r.getAs[Long]("up_ms") == Day / 2)       // first point covers from bucket start
    assert(r.getAs[Long]("down_ms") == Day / 2)     // last segment extends to bucket end
    assert(r.getAs[Long]("last_not_uptime") == Day)
    assert(r.getAs[Long]("not_up_count") == 1)
    assert(r.getAs[Long]("samples") == 2)           // late point never contributed
    assert(r.getAs[Double]("uptime_ratio") == 0.5)
  }

  test("streaming availability keeps multi-tenant series distinct in the output") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val Day = 86400000L
    val mem = MemoryStream[AP]
    val q = StreamingAvail.slices(mem.toDF()).toDF()
      .writeStream.format("memory").queryName("mt_avail").outputMode("append").start()
    // same metric name, two tenants, DIFFERENT availability histories
    mem.addData(AP("t1", 1, "m", 1000L, 0), AP("t2", 1, "m", 1000L, 1))
    q.processAllAvailable()
    mem.addData(AP("t1", 1, "m", 4 * Day, 0)) // advance the watermark
    q.processAllAvailable()
    mem.addData(AP("t1", 1, "m", 8 * Day, 0))
    q.processAllAvailable()
    q.stop()
    val rows = s.sql(
      "SELECT tenant_id, up_ms, down_ms FROM mt_avail WHERE bucket_start = 0").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // without tenant_id in Out these two would collapse into duplicate
    // indistinguishable (metric, bucket) rows
    assert(rows == Map("t1" -> ((Day, 0L)), "t2" -> ((0L, Day))), rows.toString)
  }

  test("windowed stats finalize on watermark; late data beyond it is dropped") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[P]
    val stats = StreamingIngest.slidingStats(mem.toDF())
    val q = stats.writeStream.format("memory").queryName("slices")
      .outputMode("append").start()
    // window 0 data, then advance event time far past the watermark
    mem.addData(P("t", 0, "m1", 1000L, 5.0), P("t", 0, "m1", 2000L, 7.0))
    q.processAllAvailable()
    mem.addData(P("t", 0, "m1", 4 * H2, 1.0)) // watermark → 4*H2 - 2h = 2*H2
    q.processAllAvailable()
    // late point for window 0 — beyond watermark, must be dropped
    mem.addData(P("t", 0, "m1", 1500L, 100.0))
    q.processAllAvailable()
    mem.addData(P("t", 0, "m1", 8 * H2, 1.0)) // push watermark further to flush
    q.processAllAvailable()
    q.stop()
    val w0 = s.sql("SELECT samples, min, max, sum FROM slices WHERE slice_start = timestamp_millis(0)")
      .collect()
    assert(w0.length == 1)
    // the late 100.0 never contributed
    assert(w0.head.getLong(0) == 2 && w0.head.getDouble(1) == 5.0 &&
      w0.head.getDouble(2) == 7.0 && w0.head.getDouble(3) == 12.0)
  }

  test("rolling stats: a point lands in size/slide overlapping windows, each " +
      "finalizing once on its own watermark crossing") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[P]
    val H1 = 3600000L
    val stats = StreamingIngest.rollingStats(mem.toDF()) // 4h windows, 1h slide
    val q = stats.writeStream.format("memory").queryName("rolling")
      .outputMode("append").start()
    // one point at t = 3.5h: covers windows starting 0h, 1h, 2h, 3h
    mem.addData(P("t", 0, "m1", 3 * H1 + 1800000L, 5.0))
    q.processAllAvailable()
    // advance the watermark far enough to close ALL covering windows
    // (last window end = 3h + 4h = 7h; watermark = max - 2h → need 9h+)
    mem.addData(P("t", 0, "m1", 10 * H1, 1.0))
    q.processAllAvailable()
    mem.addData(P("t", 0, "m1", 20 * H1, 1.0)) // flush the 10h point's windows
    q.processAllAvailable()
    q.stop()
    val got = s.sql(
      "SELECT unix_millis(window_start) AS ws, samples, sum FROM rolling " +
      "WHERE unix_millis(window_start) < 3600000 * 4 ORDER BY ws").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // exactly the four covering windows, one emission each, all holding 5.0
    assert(got.toSeq == Seq((0L, 1L, 5.0), (H1, 1L, 5.0), (2 * H1, 1L, 5.0), (3 * H1, 1L, 5.0)))
  }

  test("late-data drops are COUNTED, not silent: lateDropCount and the " +
    "listener both see a watermark-dropped row (reference drops it with " +
    "no signal — DataAccessImpl.java:984-1007)") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val path = Files.createTempDirectory("graft-late").toString
    val ckpt = Files.createTempDirectory("graft-late-ckpt").toString
    val listener = new StreamingIngest.LateDropListener
    s.streams.addListener(listener)
    try {
      val mem = MemoryStream[P]
      val q = StreamingIngest.start(mem.toDF(), path, ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      // batch 1 advances the watermark to 10h - 2h = 8h
      mem.addData(P("t", 0, "m1", 10L * 3600000, 1.0))
      q.processAllAvailable()
      // batch 2: one on-time point + one point far below the watermark
      mem.addData(P("t", 0, "m1", 10L * 3600000 + 1000, 2.0),
        P("t", 0, "m1", 1000L, 9.0)) // deliberately late → dropped
      q.processAllAvailable()
      q.stop()
      assert(StreamingIngest.lateDropCount(q) == 1L)
      assert(listener.dropped(q.id) == 1L)
      // the late row is NOT in the tier; the on-time rows are
      val back = GraftStorage.read(s, path)
      assert(back.count() == 2)
      assert(back.filter(col("time") === 1000L).isEmpty)
    } finally s.streams.removeListener(listener)
  }
}
