package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/**
 * A3 as a continuous query: the availability bucket state machine
 * (reference AvailabilityDataPointCollector.java:34-109) over the ingest
 * stream. This is the one A-family operator windowed aggregation cannot
 * express — per-state durations depend on the TIME ORDER of the points
 * inside a bucket (each point's state runs until the next point; the
 * first runs from bucket start; the last to bucket end) — so it runs as
 * `flatMapGroupsWithState` keyed by (series, bucket):
 *
 *  - data arrival appends (time, avail) to the bucket's buffer and arms
 *    an event-time timeout at BUCKET END;
 *  - the timeout fires when the watermark (max event time − lateness)
 *    passes the bucket end — exactly when no admissible late point can
 *    still land in the bucket — and the group sorts its buffer once,
 *    runs the segment state machine, emits ONE finalized row, and drops
 *    its state. Emission depends only on the final watermark, not on
 *    micro-batch boundaries, so results are deterministic under any
 *    batching (the same contract as StreamingIngest.slidingStats).
 *
 * State is bounded by (open buckets × points per bucket) — the watermark
 * evicts every closed bucket, so steady-state memory is one bucket's
 * points per live series.
 *
 * Semantics parity with the batch operator/oracle: segment attribution,
 * `last_not_uptime`, `not_up_count` (notUP segment STARTS, first point
 * counting), and `uptime_ratio = up/step` all mirror
 * MetricsOps.availabilityBucketStats.
 */
object StreamingAvail {

  case class Key(tenant_id: String, mtype: Int, metric: String, bucket_start: Long)
  // event_time rides along so the watermark attribute reaches the stateful
  // operator — FlatMapGroupsWithStateExec only filters LATE rows when the
  // watermark column is present in its input; dropping it would let a
  // too-late point recreate an already-finalized bucket's group and emit
  // a duplicate row
  case class Pt(tenant_id: String, mtype: Int, metric: String, time: Long,
                avail: Int, bucket_start: Long, event_time: java.sql.Timestamp)
  case class Buf(points: Seq[(Long, Int)])
  // tenant_id/mtype ride through to the output: groups are keyed by the
  // full series identity, so a multi-tenant stream must not collapse to
  // indistinguishable (metric, bucket_start) rows
  case class Out(tenant_id: String, mtype: Int, metric: String, bucket_start: Long,
                 up_ms: Long, down_ms: Long,
                 unknown_ms: Long, admin_ms: Long, last_not_uptime: Long,
                 not_up_count: Long, samples: Long, uptime_ratio: Double)

  /** The per-bucket state machine over time-sorted points — one pass,
    * pure; shared with the spec. Equal timestamps collapse to ONE point
    * (last buffered wins) BEFORE sorting, mirroring the batch operator,
    * which reads post-dedup storage where (metric, time) is unique.
    * Caveat: within a micro-batch the group iterator's order after the
    * groupByKey shuffle is not guaranteed, so if the UPSTREAM stream can
    * carry duplicate (metric, time) points with DIFFERENT avail values,
    * which of them wins is arbitrary (stable across replays of the same
    * batching, but not across different batchings). Streams needing
    * deterministic tie-breaks should dedup with an ingest sequence before
    * this operator (as StreamingIngest's storage path does); the duration
    * totals are unaffected either way. */
  private[streaming] def bucketStats(key: Key, be: Long,
                                     pts: Seq[(Long, Int)]): Out = {
    val bs = key.bucket_start
    val sorted = pts.reverse.distinctBy(_._1).sortBy(_._1)
    var up = 0L; var down = 0L; var unknown = 0L; var admin = 0L
    var lastNotUp = 0L; var notUpCount = 0L
    var i = 0
    while (i < sorted.length) {
      val (t, a) = sorted(i)
      val segStart = if (i == 0) bs else t
      val segEnd = if (i == sorted.length - 1) be else sorted(i + 1)._1
      val dur = segEnd - segStart
      a match {
        case 0 => up += dur
        case 1 => down += dur
        case 2 => unknown += dur
        case _ => admin += dur
      }
      if (a != 0) {
        lastNotUp = math.max(lastNotUp, segEnd)
        if (i == 0 || sorted(i - 1)._2 == 0) notUpCount += 1
      }
      i += 1
    }
    Out(key.tenant_id, key.mtype, key.metric, bs, up, down, unknown, admin,
      lastNotUp, notUpCount,
      sorted.length.toLong, up.toDouble / (be - bs))
  }

  private def advance(bucketMs: Long)(
      key: Key, rows: Iterator[Pt], state: GroupState[Buf]): Iterator[Out] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(b =>
        bucketStats(key, key.bucket_start + bucketMs, b.points))
      state.remove()
      out.iterator
    } else {
      val bucketEnd = key.bucket_start + bucketMs
      // An ADMITTED row can still be too late for its bucket: Spark
      // filters late rows with the PREVIOUS batch's watermark but
      // validates timeout timestamps against the CURRENT eviction
      // watermark, so when the watermark has reached this bucket's end,
      // re-arming would throw and kill the query (the timeout must be
      // strictly after the watermark). For a group with NO state the
      // reference semantics apply — the slice is expired, the point is
      // silently dropped (DataAccessImpl.java:984-1007). A buffer that
      // ALREADY exists finalizes once the watermark STRICTLY passes
      // bucketEnd (Spark fires event-time timeouts only when
      // timeoutTimestamp < watermark — at exact equality the firing waits
      // for the next watermark advance), so its admitted edge rows are
      // merged into the buffer — WITHOUT re-arming — and make it into the
      // emitted row, matching the batch oracle, which counts every point
      // of a finalized bucket regardless of micro-batch boundaries.
      if (state.getCurrentWatermarkMs() >= bucketEnd) {
        state.getOption.foreach { b =>
          state.update(Buf(b.points ++ rows.map(p => (p.time, p.avail))))
        }
        Iterator.empty
      } else {
        val buf = state.getOption.map(_.points).getOrElse(Seq.empty) ++
          rows.map(p => (p.time, p.avail))
        state.update(Buf(buf))
        state.setTimeoutTimestamp(bucketEnd)
        Iterator.empty
      }
    }
  }

  /** `points` is a STREAMING canonical availability frame. Emits one row
    * per (metric, bucket) once the watermark finalizes the bucket. */
  def slices(points: DataFrame, bucketMs: Long = 86400000L,
             lateness: String = "2 hours"): Dataset[Out] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .withColumn("event_time", timestamp_millis(col("time")))
      .withWatermark("event_time", lateness)
      .select(col("tenant_id"), col("mtype").cast("int").as("mtype"), col("metric"),
        col("time"), col("avail").cast("int").as("avail"),
        expr(s"(time div $bucketMs) * $bucketMs").as("bucket_start"),
        col("event_time"))
      .as[Pt]
      .groupByKey(p => Key(p.tenant_id, p.mtype, p.metric, p.bucket_start))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        advance(bucketMs))
  }
}
