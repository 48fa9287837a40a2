package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Watermarked STREAM-STREAM interval join — the attribution query
 * "every purchase paired with each click by the same user in the
 * preceding `withinMs`": the one Structured Streaming operator class
 * the engine's other continuous queries (windowed/session aggregates,
 * flatMapGroupsWithState machines) don't cover. Both sides are
 * type-filters of the SAME event stream; each carries its own
 * watermark, and the time-RANGE join condition is what lets Spark
 * bound both state stores — clicks evict once the watermark passes
 * `click_time + withinMs` (no future purchase can match), purchases
 * as soon as their window closes. An inner pair emits in the batch
 * that completes it, exactly once.
 *
 * State: clicks within `withinMs` of the watermark + in-flight
 * purchases — horizon-bounded, never history-sized.
 */
object StreamingAttribution {

  /** `leftOuter = true` keeps purchases with NO qualifying click: the
    * null-extended row emits once the watermark proves no match can
    * still arrive — the outer-emission semantics of stream-stream joins
    * (spec-pinned; inner pairs emit in the completing batch either
    * way). */
  def attributionPairs(events: DataFrame, clickType: String = "click",
                       buyType: String = "purchase",
                       withinMs: Long = 3600000L,
                       lateness: String = "2 hours",
                       leftOuter: Boolean = false): DataFrame = {
    require(withinMs > 0, s"withinMs must be positive, got $withinMs")
    val clicks = events.filter(col("event_type") === clickType)
      .select(col("user_id"), col("event_id").as("click_id"),
        col("time").as("click_time"),
        timestamp_millis(col("time")).as("click_et"))
      .withWatermark("click_et", lateness)
    val buys = events.filter(col("event_type") === buyType)
      .select(col("user_id").as("buy_user"), col("event_id").as("buy_id"),
        col("time").as("buy_time"), col("value").as("buy_value"),
        timestamp_millis(col("time")).as("buy_et"))
      .withWatermark("buy_et", lateness)
    val cond = col("user_id") === col("buy_user") &&
      col("buy_et") >= col("click_et") &&
      col("buy_et") <= col("click_et") + expr(s"INTERVAL $withinMs MILLISECONDS")
    if (leftOuter)
      // purchases drive; unmatched ones null-extend on watermark close
      buys.join(clicks, cond, "left_outer")
        .select(col("buy_user").as("user_id"), col("click_id"), col("buy_id"),
          col("click_time"), col("buy_time"),
          (col("buy_time") - col("click_time")).as("gap_ms"), col("buy_value"))
    else
      clicks.join(buys, cond)
        .select(col("user_id"), col("click_id"), col("buy_id"),
          col("click_time"), col("buy_time"),
          (col("buy_time") - col("click_time")).as("gap_ms"), col("buy_value"))
  }
}
