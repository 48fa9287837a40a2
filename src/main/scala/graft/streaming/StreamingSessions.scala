package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming twin of [[graft.operators.EventOps.sessionize]], built on
 * Spark's native `session_window` aggregate: per-user sessions grow
 * while events keep arriving within `gap` of the session's end, and a
 * session emits EXACTLY ONCE (append mode) when the watermark passes
 * its end — late events within `lateness` still merge/extend, later
 * ones drop.
 *
 * Semantics note: Spark merges a session with a following event whose
 * window `[t, t+gap)` starts AT OR BEFORE the session's current end —
 * an event exactly `gap` after the previous one still merges (split
 * only at `delta > gap`), identical to the batch lag-formulation's
 * rule. The boundary is spec-pinned (StreamingSessionsSpec), so a
 * Spark-side semantics change would fail loudly, not drift.
 *
 * Scale: state is (open sessions × users with in-flight activity),
 * watermark-evicted — never the stream's history; the emitted window's
 * end is `last event + gap` (Spark's session end), so downstream
 * consumers recover the batch `session_end` as `window_end - gap`.
 */
object StreamingSessions {

  def sessions(events: DataFrame, gap: String = "12 hours",
               lateness: String = "2 hours"): DataFrame =
    events
      .withColumn("event_time", timestamp_millis(col("time")))
      .withWatermark("event_time", lateness)
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,10)")).cast("double").as("value_sum"))
      .select(col("session_window.start").as("window_start"),
        col("session_window.end").as("window_end"),
        col("user_id"), col("n_events"), col("value_sum"))
}
