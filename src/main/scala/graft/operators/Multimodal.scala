package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing for LLM data pipelines: media (image/audio/
 * video) rides as an opaque `binary` payload column with typed metadata;
 * decode / feature-extraction runs per-partition over payload batches.
 *
 * The container has no media codecs, so [[stubDecode]] is a deterministic
 * STAND-IN (byte-level features) — the Spark-side contract (schema,
 * partition-batched processing, nullable feature struct) is the real,
 * tested part; swap `decodeBytes` for an actual codec in production.
 */
object Multimodal {

  /** Attach a binary payload + modality metadata to a documents frame.
    * (The synthetic corpus has no real media; UTF-8 text bytes stand in.) */
  def asMediaFrame(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      // modality routed from source id — stand-in for a real MIME column
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(regexp_extract(col("source"), "\\d+", 0).cast("long"), lit(3)) + 1).cast("int"))
        .as("modality"))

  final case class MediaFeatures(
      doc_id: Long, modality: String, byte_len: Long,
      header_hex: String, checksum: Long)

  /** The per-payload "decode": deterministic byte-level features. This is
    * the seam where a real image/audio decoder plugs in. */
  private def decodeBytes(id: Long, modality: String, payload: Array[Byte]): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    val header = payload.take(4).map(b => f"${b & 0xff}%02X").mkString
    MediaFeatures(id, modality, payload.length.toLong, header, sum)
  }

  /**
   * Feature extraction over payload batches — `mapPartitions` so a real
   * decoder could amortize per-partition setup (model load, codec init)
   * exactly like a Pandas-UDF batch would.
   */
  def stubDecode(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "modality", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, m, p) => decodeBytes(id, m, p) })
  }

  /** Full pipeline: docs → media frame → batched decode → features DF. */
  def mediaFeatures(docs: DataFrame): DataFrame = stubDecode(asMediaFrame(docs)).toDF()
}
