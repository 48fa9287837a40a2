package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.DataFrame

/**
 * Structured-Streaming NEAR-dup screening — the streaming twin of
 * [[graft.operators.Dedup.simHashPairs]], for a continuously-arriving
 * document feed: every arriving document is checked against everything
 * the stream has admitted so far, and each near-dup pair (SimHash
 * Hamming distance ≤ maxHamming) is emitted as it is discovered.
 *
 * Shape: the banded 60-bit fingerprint projection is SHARED with the
 * batch operator ([[Dedup.simHashBanded]] — pure projection + explode,
 * streaming-legal), then `flatMapGroupsWithState` keyed by
 * (band, band_val) holds each band bucket's seen (doc_id, fingerprint)
 * list and compares arrivals against it. Pigeonhole over maxHamming+1
 * bands guarantees any pair within the radius shares at least one
 * intact band — the same exact-recall argument as the batch join, so
 * the DISTINCT pair set equals the batch result regardless of how the
 * feed was micro-batched (a pair discovered in several shared bands is
 * emitted once per band; readers distinct on (doc_a, doc_b)).
 *
 * State contract: unbounded by design, like the exact streaming dedup
 * ([[StreamingCorpus]]) — corpus-level screening has no expiry; state
 * per band bucket is 16 bytes per member doc. The band keying also
 * SHARDS the comparison: a new doc compares only against its buckets'
 * members, never the whole corpus — the streaming analog of the batch
 * band join. Within a band bucket the comparison is linear in bucket
 * size; uniform fingerprint bits keep buckets small (the batch
 * operator's candidate argument), and a hot bucket is a data-quality
 * signal (boilerplate flood), not a plan defect.
 *
 * Determinism contract: the PAIR SET is deterministic (symmetric in the
 * pair, so arrival order cannot change membership — only emission
 * batch/row order varies). `hamming` is a pure function of the pair.
 */
object StreamingNearDup {

  case class BandKey(band: Int, band_val: Long)
  case class BandRow(doc_id: Long, simhash: Long, band: Int, band_val: Long)
  case class Seen(docs: Seq[(Long, Long)])
  case class Pair(doc_a: Long, doc_b: Long, hamming: Int)

  /** Streaming (doc_id, text) frame → stream of near-dup pairs. */
  def nearDupPairsStream(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    Dedup.simHashBanded(docs, maxHamming)
      .as[BandRow]
      .groupByKey(r => BandKey(r.band, r.band_val))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: BandKey, rows: Iterator[BandRow], state: org.apache.spark.sql.streaming.GroupState[Seen]) => {
          val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          seen ++= state.getOption.map(_.docs).getOrElse(Seq.empty)
          val out = Seq.newBuilder[Pair]
          // batch arrivals process in doc_id order so within-batch pair
          // emission is replay-stable; the pair SET is order-independent
          // either way (symmetric relation)
          for ((docId, fp) <- rows.map(r => (r.doc_id, r.simhash)).toSeq.sorted) {
            for ((d2, fp2) <- seen if d2 != docId) {
              val ham = java.lang.Long.bitCount(fp ^ fp2)
              if (ham <= maxHamming)
                out += Pair(math.min(docId, d2), math.max(docId, d2), ham)
            }
            seen += ((docId, fp))
          }
          state.update(Seen(seen.toSeq))
          out.result().iterator
        })
      .toDF()
  }

  /** Pair stream → parquet tier. Same exactly-once rationale as
    * [[StreamingCorpus.dedupIngest]]: the file sink's commit log makes
    * micro-batch replays idempotent for downstream Spark reads. */
  def screen(docs: DataFrame, path: String, checkpoint: String,
             maxHamming: Int = 3,
             trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    nearDupPairsStream(docs, maxHamming)
      .writeStream
      .format("parquet")
      .option("path", path)
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .start()
}
