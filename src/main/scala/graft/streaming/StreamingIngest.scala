package graft.streaming

import graft.storage.GraftStorage
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SaveMode}

/**
 * Structured-Streaming ingest — the Spark-native replacement for the
 * reference's RxJava `addDataPoints` path (MetricsServiceImpl.java:635-644)
 * and its 2-hour temp-table lifecycle (SURVEY §2.9):
 *
 *  - the reference accepts a late point while its 2h slice's temp table
 *    still exists and silently drops it afterwards
 *    (DataAccessImpl.java:952-961, 984-1007). That is exactly watermark
 *    semantics: `withWatermark("event_time", "2 hours")`;
 *  - Cassandra's upsert (last-write-wins per (metric, ts),
 *    DataAccessImpl.java:215-221) becomes `dropDuplicatesWithinWatermark`
 *    on the primary key — stateful dedup whose state is bounded by the
 *    same watermark;
 *  - the write lands in the partitioned raw tier via `foreachBatch` →
 *    GraftStorage.write. foreachBatch + Parquet append is AT-LEAST-ONCE:
 *    a micro-batch retried after a partial write appends its rows again.
 *    Each batch is stamped with the same strictly-increasing
 *    (millis << 20 | counter) `ingest_seq` the batch path uses — one seq
 *    scale across batch backfill and streaming, so last-write-wins stays
 *    meaningful when a tier sees both. A replayed batch therefore lands
 *    with a NEWER seq but byte-identical values: `GraftStorage
 *    .readResolved` (LWW per point key) and `compact` collapse it to the
 *    same values either way, and plain `read` is only exposed to
 *    duplicates in the window between a replayed batch and the next
 *    compaction. KNOWN at-least-once limit: if an out-of-band write
 *    corrects one of the replayed keys IN BETWEEN the failed attempt and
 *    its replay, the replay's newer seq resurrects the stale value —
 *    eliminating that window needs an atomic/transactional sink (an ACID
 *    table format's commit protocol), not a sequence scheme.
 */
object StreamingIngest {

  /** Canonical datapoint stream → raw tier. `points` must be a STREAMING
    * frame with the canonical columns (tenant_id, mtype, metric, time, …).
    * The default trigger drains whatever is available then stops (bounded
    * backfill / test runs); pass `Trigger.ProcessingTime(...)` for a
    * continuously-running ingest. */
  def start(points: DataFrame, path: String, checkpoint: String,
            lateness: String = "2 hours",
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    points
      .withColumn("event_time", timestamp_millis(col("time")))
      .withWatermark("event_time", lateness)
      .dropDuplicatesWithinWatermark("tenant_id", "mtype", "metric", "time")
      .drop("event_time")
      .writeStream
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        GraftStorage.write(batch, path, SaveMode.Append)
      }
      .start()

  /** Ingest + rollup-tier maintenance in ONE continuous query: each
    * micro-batch lands in the raw tier, then `refresh` rebuilds the
    * derived tier(s) for exactly the slice span the batch touched — the
    * windowed-refresh discipline in streaming form: a batch
    * re-aggregates its own slices from RESOLVED raw, slices outside the
    * span keep byte-identical tier files. At-least-once replay is safe
    * end-to-end: raw replays collapse by LWW, and the tier refresh
    * re-DERIVES from resolved raw, so a replayed refresh rewrites the
    * same values (idempotent by construction, the same posture as the
    * IVF/BM25 streaming maintainers). `refresh(spark, fromSlice,
    * upToSlice)` is any composition of the GraftStorage tier builders. */
  def startWithTierRefresh(points: DataFrame, rawPath: String, checkpoint: String,
                           lateness: String = "2 hours",
                           trigger: Trigger = Trigger.AvailableNow())
                          (refresh: (org.apache.spark.sql.SparkSession, Long, Long) => Unit)
  : StreamingQuery =
    points
      .withColumn("event_time", timestamp_millis(col("time")))
      .withWatermark("event_time", lateness)
      .dropDuplicatesWithinWatermark("tenant_id", "mtype", "metric", "time")
      .drop("event_time")
      .writeStream
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // checkpoint: the frame feeds the raw write AND the slice-set
        // action — without it the batch recomputes; unpersisted per batch
        // so blocks don't accumulate across a drain's micro-batches
        val b = batch.localCheckpoint()
        try {
          GraftStorage.write(b, rawPath, SaveMode.Append)
          // refresh per contiguous RUN of touched slices, not the whole
          // [min, max] span: one late point riding a current batch would
          // otherwise re-aggregate every slice between them (the distinct
          // set is batch-slice-count-sized — collect-safe)
          val touched = GraftStorage.withSlice(b).select(col("time_slice"))
            .distinct().collect().map(_.getLong(0)).sorted
          val runs = touched.foldLeft(Vector.empty[(Long, Long)]) { (acc, s) =>
            acc.lastOption match {
              case Some((lo, hi)) if s == hi + 1 => acc.init :+ (lo, s)
              case _ => acc :+ ((s, s))
            }
          }
          runs.foreach { case (lo, hi) => refresh(b.sparkSession, lo, hi + 1) }
        } finally b.unpersist()
      }
      .start()

  /** [[startWithTierRefresh]] wired to the histogram (distribution)
    * rollup tier. */
  def startWithHistTier(points: DataFrame, rawPath: String, histPath: String,
                        checkpoint: String,
                        vMin: Double, vMax: Double, bins: Int,
                        lateness: String = "2 hours",
                        trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    startWithTierRefresh(points, rawPath, checkpoint, lateness, trigger) {
      (s, lo, hi) =>
        GraftStorage.writeRollupHist(s, rawPath, histPath, vMin, vMax, bins,
          fromSlice = lo, upToSlice = hi)
    }

  /**
   * Rows dropped as too-late by the watermark across a query's reported
   * progress — the ingest path's drop counter. The reference drops a
   * point whose 2h slice temp table has expired WITHOUT any signal
   * (DataAccessImpl.java:984-1007, the insert just no-ops); at 100 TB a
   * silent drop stream is an operational blind spot, so we surface the
   * count from the state-store metrics every stateful operator already
   * reports (`numRowsDroppedByWatermark` — populated by the
   * dropDuplicatesWithinWatermark dedup in [[start]]).
   *
   * Reads `recentProgress` (ring buffer, default last 100 batches) —
   * right for bounded drains and tests. A long-running ingest should
   * accumulate the same field continuously via
   * `spark.streams.addListener(new LateDropListener)` instead.
   */
  def lateDropCount(q: StreamingQuery): Long =
    q.recentProgress.iterator
      .flatMap(p => Option(p.stateOperators).iterator.flatMap(_.iterator))
      .map(_.numRowsDroppedByWatermark).sum

  /** Accumulating listener twin of [[lateDropCount]] for continuously
    * running queries, where the progress ring buffer ages out: total
    * too-late-dropped rows per query id, readable at any time. */
  final class LateDropListener
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    private val drops =
      new java.util.concurrent.ConcurrentHashMap[java.util.UUID, java.lang.Long]()
    def dropped(queryId: java.util.UUID): Long =
      Option(drops.get(queryId)).map(_.longValue).getOrElse(0L)
    override def onQueryStarted(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
      val batchDrops = Option(e.progress.stateOperators)
        .map(_.iterator.map(_.numRowsDroppedByWatermark).sum).getOrElse(0L)
      if (batchDrops > 0)
        drops.merge(e.progress.id, java.lang.Long.valueOf(batchDrops),
          (a, b) => java.lang.Long.valueOf(a.longValue + b.longValue))
    }
    override def onQueryTerminated(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }

  /**
   * Streaming 2h tumbling per-metric stats (the query-side analog of the
   * reference's slice cadence): emits finalized windows once the watermark
   * passes — late data beyond the watermark is dropped, matching
   * slice-expiry semantics.
   */
  def slidingStats(points: DataFrame, lateness: String = "2 hours"): DataFrame =
    rollingStats(points, size = "2 hours", slide = "2 hours", lateness = lateness)
      .withColumnRenamed("window_start", "slice_start")

  /** Windowed event-type counts as a continuous query (append mode —
    * each window's counts emit exactly once on watermark finalization).
    * The top-k RANK is deliberately NOT in the stream: ranking is a
    * serving-time concern over the (tiny) finalized count rollup, and
    * keeping the streamed state a plain count aggregate is what lets it
    * stay mergeable/restartable. Callers rank the sink (see the
    * streaming_top_events entry). */
  def windowedTypeCounts(events: DataFrame, size: String = "1 day",
                         lateness: String = "2 hours"): DataFrame =
    events
      .withColumn("event_time", timestamp_millis(col("time")))
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), size), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("event_type"), col("cnt"))

  /**
   * True OVERLAPPING sliding windows — `size` > `slide`, e.g. 4 h
   * rolling stats advancing hourly: the "metrics over the last N hours"
   * view dashboards poll, which the tumbling slice cadence above cannot
   * answer without client-side re-aggregation. Spark expands each event
   * into its size/slide covering windows BEFORE the stateful aggregate,
   * so state is (open windows × metrics)-keyed — bounded by the
   * watermark exactly like the tumbling case — and each window still
   * emits exactly once when the watermark passes its end. Same decimal
   * sum discipline, same late-data drop contract.
   */
  def rollingStats(points: DataFrame, size: String = "4 hours",
                   slide: String = "1 hour",
                   lateness: String = "2 hours"): DataFrame =
    points
      .withColumn("event_time", timestamp_millis(col("time")))
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), size, slide),
        col("tenant_id"), col("mtype"), col("metric"))
      .agg(count(lit(1)).as("samples"),
        min(col("n_value")).as("min"),
        max(col("n_value")).as("max"),
        sum(col("n_value").cast("decimal(28,10)")).cast("double").as("sum"))
      .select(col("window.start").as("window_start"), col("tenant_id"),
        col("mtype"), col("metric"), col("samples"), col("min"), col("max"), col("sum"))
}
