package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
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

  /**
   * Frame sampling over video payloads: fixed-size byte windows stand in
   * for codec frame boundaries (the seam where a demuxer plugs in), every
   * `everyNth` frame kept. Pure column expressions — `sequence` + `explode`
   * generate the frame index spine and `substring`/`md5` run codegen'd per
   * frame, so sampling a 100 TB video corpus is one scan, no UDF, and the
   * per-doc fan-out is bounded by payload size / frameBytes.
   */
  def frameSample(media: DataFrame, frameBytes: Int = 64, everyNth: Int = 2): DataFrame = {
    val nFrames = expr(s"(octet_length(payload) + ${frameBytes - 1}) div $frameBytes")
    // the empty-payload filter matters: sequence(0, -1) DESCENDS ([0, -1])
    // rather than returning an empty array, which would emit a phantom
    // frame 0 for an empty video
    media.filter(col("modality") === "video" && octet_length(col("payload")) > 0)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0L), nFrames.cast("long") - 1)).as("frame_idx"))
      .filter(pmod(col("frame_idx"), lit(everyNth.toLong)) === 0)
      .select(col("doc_id"), col("frame_idx"),
        md5(expr(s"substring(payload, cast(frame_idx * $frameBytes + 1 as int), $frameBytes)"))
          .as("frame_md5"))
  }

  /**
   * Deterministic per-frame pseudo-embedding: dim `d` derives from
   * md5(frame_md5 ‖ d) scaled into [−1, 1] — the stand-in for a real
   * frame encoder (CLIP-style) at the same seam, chosen hash-based so
   * the DuckDB oracle reproduces it bit-exactly. Pure codegen'd column
   * expressions; fan-out = frames × dims literals, no UDF.
   */
  def frameEmbeddings(media: DataFrame, frameBytes: Int = 64, everyNth: Int = 2,
                      dims: Int = 8): DataFrame = {
    require(dims >= 1 && dims <= 64, s"dims must be in [1, 64], got $dims")
    val comps = (0 until dims).map { d =>
      (pmod(conv(substring(md5(concat(col("frame_md5"), lit(d.toString))), 1, 15),
        16, 10).cast("long"), lit(2000001L)) - lit(1000000L)).cast("double") /
        lit(1000000.0)
    }
    frameSample(media, frameBytes, everyNth)
      .select(col("doc_id"), col("frame_idx"), array(comps: _*).as("embedding"))
  }

  /**
   * Frame-level similarity search — the multimodal retrieval
   * composition end-to-end: payload → frame sampling → (stub) frame
   * encoder → cosine top-k of query frames against the corpus frames.
   * Query side broadcasts (frames of a few query docs); the corpus side
   * is one scan — the labeled exact baseline exactly like knn_cosine
   * (the scale path is the IVF/SRP stack over the same frame vectors).
   */
  def frameSearch(media: DataFrame, maxQueryDoc: Long = 3L, k: Int = 5,
                  frameBytes: Int = 64, everyNth: Int = 2, dims: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = frameEmbeddings(media, frameBytes, everyNth, dims)
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val withNorm = emb.withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))
    val q = broadcast(withNorm
      .filter(col("doc_id") < maxQueryDoc)
      .select(col("doc_id").as("q_doc"), col("frame_idx").as("q_frame"),
        col("embedding").as("qe"), col("nrm").as("q_nrm")))
    val w = Window.partitionBy(col("q_doc"), col("q_frame"))
      .orderBy(col("cosine").desc, col("doc_id").asc, col("frame_idx").asc)
    withNorm.crossJoin(q)
      .filter(col("doc_id") =!= col("q_doc") || col("frame_idx") =!= col("q_frame"))
      .withColumn("cosine", dot(col("qe"), col("embedding")) / (col("q_nrm") * col("nrm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_doc"), col("q_frame"), col("doc_id"), col("frame_idx"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /**
   * "Resize" stand-in: strided byte sampling inside the same
   * mapPartitions seam as [[stubDecode]] — a real implementation decodes,
   * scales, and re-encodes per batch; the Spark-side contract (binary in,
   * smaller binary + metadata out, partition-amortized setup) is what's
   * exercised here.
   */
  final case class ResizedMedia(doc_id: Long, in_len: Long, out_len: Long, out_checksum: Long)

  def resizeStub(media: DataFrame, stride: Int = 4): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("modality") === "image")
      .select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        val out = Array.range(0, p.length, stride).map(p)
        var sum = 0L
        out.foreach(b => sum += b & 0xff)
        ResizedMedia(id, p.length.toLong, out.length.toLong, sum)
      })
  }
}
