package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.DataFrame

/**
 * Structured-Streaming corpus ingest with ONLINE exact dedup — the
 * streaming twin of [[graft.operators.Dedup.exactGroups]] for a
 * continuously-arriving document feed (a crawl frontier, an upload
 * queue): each micro-batch admits only texts whose content hash has not
 * been seen, then lands survivors in a parquet tier.
 *
 * State contract: `dropDuplicates` keys on `content_md5` with UNBOUNDED
 * state by design — corpus-level dedup has no expiry; the admitted-hash
 * set IS the product. At 100 TB the state store is the scaling knob
 * (RocksDB state backend + changelog checkpointing; the state per key is
 * just the 32-byte hash). When the feed carries an event time and the
 * pipeline tolerates re-admission after a horizon, swap in
 * `dropDuplicatesWithinWatermark` to bound state, exactly like the
 * metrics ingest ([[StreamingIngest]]).
 *
 * Determinism contract: WHICH duplicate survives is arrival-order
 * dependent (first seen wins), but survivors' CONTENT is identical by
 * construction — so content-level reads off the tier (counts, token
 * sums, hashes) are deterministic while survivor doc_ids are not. The
 * batch [[graft.operators.Dedup.exactGroups]] (min doc_id wins) is the
 * deterministic-survivor variant; this is the online one.
 */
object StreamingCorpus {

  /** Document stream → dedup'd tier. `docs` must be a STREAMING frame
    * with at least (doc_id, text). The default trigger drains available
    * input then stops (bounded backfill / test runs).
    *
    * The sink is the built-in parquet FILE sink, not foreachBatch:
    * foreachBatch + plain append is at-least-once (a micro-batch retried
    * after a partial write would append its survivors AGAIN — silently
    * breaking the very dedup guarantee this operator exists for), while
    * the file sink's `_spark_metadata` commit log makes replays
    * exactly-once for downstream Spark reads. */
  def dedupIngest(docs: DataFrame, path: String, checkpoint: String,
                  trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs
      .withColumn("content_md5", md5(col("text").cast("binary")))
      .dropDuplicates("content_md5")
      .writeStream
      .format("parquet")
      .option("path", path)
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .start()
}
