package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing for LLM data pipelines: media (image/audio/
 * video) rides as an opaque `binary` payload column with typed metadata;
 * decode / feature-extraction runs per-partition over payload batches.
 *
 * Two decode tiers coexist behind the same seam:
 *  - [[decodePpm]] / [[demuxVideo]] are REAL pure-JVM decoders (Netpbm P6
 *    header parse + pixel walk; a framed video container with header
 *    demux) — no native codec needed, so `media_resize`/`frame_sample`
 *    exercise actual byte geometry (width/height/stride arithmetic);
 *  - [[stubDecode]] keeps deterministic byte-level features for payloads
 *    no decoder claims (the posture for codecs absent in this container —
 *    JPEG/H.264 would plug in at exactly this seam).
 * The synthetic corpus has no real media files, so [[asPpmFrame]] /
 * [[asVideoFrame]] synthesize REAL container bytes (valid P6 / GV1
 * streams) from the doc text with pure column expressions — which also
 * makes every decoded geometry a deterministic function of the payload
 * header that the DuckDB oracle reproduces independently.
 */
object Multimodal {

  /** Source-id → modality routing shared by every media frame builder
    * (stand-in for a real MIME column). */
  private val modalityCol =
    element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(regexp_extract(col("source"), "\\d+", 0).cast("long"), lit(3)) + 1).cast("int"))

  /** Attach a binary payload + modality metadata to a documents frame.
    * (UTF-8 text bytes stand in as the opaque payload.) */
  def asMediaFrame(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      modalityCol.as("modality"))

  // ------------------------------------------------------------------
  // real decode tier: Netpbm P6 images
  // ------------------------------------------------------------------

  /**
   * Synthesize a REAL binary PPM (P6) payload for each image-modality
   * doc: `P6\n{w} {h}\n255\n` + w·h·3 pixel bytes cycled from the doc's
   * text (pixel i = text byte i mod len — `repeat` + `substring`, all
   * codegen'd). Geometry derives from the text length (w = 4 + len%13,
   * h = 3 + len%7), so every header field is a deterministic function
   * of the row — the property the decode oracles verify end-to-end.
   */
  def asPpmFrame(docs: DataFrame): DataFrame =
    docs.withColumn("modality", modalityCol)
      .filter(col("modality") === "image" && octet_length(col("text")) > 0)
      .withColumn("mlen", octet_length(col("text")).cast("long"))
      .withColumn("w", lit(4L) + pmod(col("mlen"), lit(13L)))
      .withColumn("h", lit(3L) + pmod(col("mlen"), lit(7L)))
      .withColumn("np", col("w") * col("h") * lit(3L))
      .select(col("doc_id"),
        encode(concat(
          lit("P6\n"), col("w").cast("string"), lit(" "), col("h").cast("string"),
          lit("\n255\n"),
          expr("substring(repeat(text, cast(ceil(np / cast(mlen as double)) as int)), 1, cast(np as int))")),
          "UTF-8").as("payload"),
        col("modality"))

  /** A decoded P6 image: geometry + the raw interleaved RGB bytes. */
  final case class PpmImage(width: Int, height: Int, maxVal: Int, pixels: Array[Byte])

  /**
   * Pure-JVM P6 (binary PPM) decoder — a REAL parser per the Netpbm
   * spec: '#' comments and arbitrary whitespace between header tokens,
   * single whitespace after maxval, then width·height·3 raw bytes.
   * None on malformed/truncated payloads (callers fall back to the
   * hash-stub tier).
   */
  def decodePpm(payload: Array[Byte]): Option[PpmImage] = {
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6') return None
    var i = 2
    def skipWs(): Unit = {
      var go = true
      while (go && i < payload.length) {
        val b = payload(i)
        if (b == '#') { while (i < payload.length && payload(i) != '\n') i += 1 }
        else if (b == ' ' || b == '\t' || b == '\n' || b == '\r') i += 1
        else go = false
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = -1
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
        v = (if (v < 0) 0 else v) * 10 + (payload(i) - '0'); i += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val mx = readInt()
    if (w <= 0 || h <= 0 || mx <= 0 || mx > 255 || i >= payload.length) return None
    i += 1 // the single whitespace byte after maxval
    val n = w * h * 3
    if (n / 3 / w != h) return None // overflow guard
    if (payload.length - i < n) return None
    Some(PpmImage(w, h, mx, java.util.Arrays.copyOfRange(payload, i, i + n)))
  }

  final case class DecodedImage(doc_id: Long, width: Long, height: Long,
                                n_pixels: Long, pixel_checksum: Long)

  /** REAL decode over PPM payloads (mapPartitions — per-partition setup
    * amortizable exactly like a codec init): header → geometry, pixel
    * walk → checksum. Undecodable payloads drop out (None). */
  def decodePpmFrames(media: DataFrame): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        decodePpm(p).map { img =>
          var s = 0L; var k = 0
          while (k < img.pixels.length) { s += img.pixels(k) & 0xff; k += 1 }
          DecodedImage(id, img.width.toLong, img.height.toLong,
            img.width.toLong * img.height, s)
        }
      })
  }

  final case class PpmResized(doc_id: Long, width: Long, height: Long,
                              out_w: Long, out_h: Long, out_len: Long,
                              out_checksum: Long)

  /**
   * REAL nearest-neighbor ×2 downscale with actual pixel-stride
   * geometry: out(x, y, c) = in(2x, 2y, c) walked over the decoded
   * pixel array, re-encoded as a valid P6 (so the output is itself
   * decodable). Reports the decoded input geometry, output geometry,
   * re-encoded byte length (header + out_w·out_h·3) and the output
   * PIXEL checksum — every column a deterministic function of the
   * input payload, independently recomputable by the oracle.
   */
  def ppmResize(media: DataFrame): Dataset[PpmResized] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        decodePpm(p).map { img =>
          val ow = math.max(1, img.width / 2)
          val oh = math.max(1, img.height / 2)
          val out = new Array[Byte](ow * oh * 3)
          var y = 0
          while (y < oh) {
            var x = 0
            while (x < ow) {
              val src = ((2 * y) * img.width + 2 * x) * 3
              val dst = (y * ow + x) * 3
              out(dst) = img.pixels(src)
              out(dst + 1) = img.pixels(src + 1)
              out(dst + 2) = img.pixels(src + 2)
              x += 1
            }
            y += 1
          }
          val header = s"P6\n$ow $oh\n255\n".getBytes("UTF-8")
          var s = 0L; var k = 0
          while (k < out.length) { s += out(k) & 0xff; k += 1 }
          PpmResized(id, img.width.toLong, img.height.toLong, ow.toLong, oh.toLong,
            (header.length + out.length).toLong, s)
        }
      })
  }

  // ------------------------------------------------------------------
  // real decode tier: GV1 framed video container
  // ------------------------------------------------------------------

  /**
   * Synthesize a REAL framed container for each video-modality doc:
   * `GV1\n{nframes} {w} {h}\n` + nframes frames of w·h·3 raw bytes
   * (text cycled), the [[asPpmFrame]] discipline one level up — frame
   * boundaries are real byte offsets the demuxer must compute from the
   * header, not fixed windows.
   */
  def asVideoFrame(docs: DataFrame): DataFrame =
    docs.withColumn("modality", modalityCol)
      .filter(col("modality") === "video" && octet_length(col("text")) > 0)
      .withColumn("mlen", octet_length(col("text")).cast("long"))
      .withColumn("nf", lit(2L) + pmod(col("mlen"), lit(5L)))
      .withColumn("w", lit(4L) + pmod(col("mlen"), lit(5L)))
      .withColumn("h", lit(2L) + pmod(col("mlen"), lit(3L)))
      .withColumn("np", col("nf") * col("w") * col("h") * lit(3L))
      .select(col("doc_id"),
        encode(concat(
          lit("GV1\n"), col("nf").cast("string"), lit(" "),
          col("w").cast("string"), lit(" "), col("h").cast("string"), lit("\n"),
          expr("substring(repeat(text, cast(ceil(np / cast(mlen as double)) as int)), 1, cast(np as int))")),
          "UTF-8").as("payload"),
        col("modality"))

  /** A demuxed video: geometry + per-frame byte slices. */
  final case class VideoFrames(nFrames: Int, width: Int, height: Int,
                               frames: Vector[Array[Byte]])

  /** Pure-JVM GV1 demuxer: parse `GV1\n{n} {w} {h}\n`, then slice the
    * n frames at their real w·h·3 strides. None on malformed/truncated. */
  def demuxVideo(payload: Array[Byte]): Option[VideoFrames] = {
    if (payload.length < 4 || payload(0) != 'G' || payload(1) != 'V' ||
      payload(2) != '1' || payload(3) != '\n') return None
    var i = 4
    def readInt(): Int = {
      while (i < payload.length &&
        (payload(i) == ' ' || payload(i) == '\n')) i += 1
      var v = -1
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
        v = (if (v < 0) 0 else v) * 10 + (payload(i) - '0'); i += 1
      }
      v
    }
    val nf = readInt(); val w = readInt(); val h = readInt()
    if (nf <= 0 || w <= 0 || h <= 0 || i >= payload.length) return None
    i += 1 // the newline closing the header
    // overflow guard (decodePpm's n/3/w check, long-math form): a hostile
    // header like "30000 30000" would wrap w*h*3 negative and defeat the
    // truncation check below — refuse instead of crashing the task
    if (w.toLong * h * 3 > Int.MaxValue) return None
    val fs = w * h * 3
    if (payload.length - i < nf.toLong * fs) return None
    val frames = Vector.tabulate(nf)(k =>
      java.util.Arrays.copyOfRange(payload, i + k * fs, i + (k + 1) * fs))
    Some(VideoFrames(nf, w, h, frames))
  }

  final case class DemuxedFrame(doc_id: Long, n_frames: Long, width: Long,
                                height: Long, frame_idx: Long,
                                frame_bytes: Array[Byte])

  /**
   * REAL frame sampling: demux the container header, slice every
   * `everyNth` frame at its computed stride. The per-partition decode
   * seam ([[stubDecode]]'s shape) with actual boundary arithmetic —
   * a truncated payload yields no frames rather than garbage slices.
   */
  def sampleVideoFrames(media: DataFrame, everyNth: Int = 2): Dataset[DemuxedFrame] = {
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        demuxVideo(p).iterator.flatMap { v =>
          (0 until v.nFrames).iterator.filter(_ % everyNth == 0).map(k =>
            DemuxedFrame(id, v.nFrames.toLong, v.width.toLong, v.height.toLong,
              k.toLong, v.frames(k)))
        }
      })
  }

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
   * Frame-level similarity search at SCALE — the IVF path over the same
   * frame vectors [[frameSearch]] scores exactly: k-means cells trained
   * on the (dims-dimensional) frame embeddings route both the corpus
   * partitioning and the query probes, so a query scores only its
   * `nprobe` cells instead of the whole frame corpus (the labeled exact
   * baseline's crossJoin). Frame identity packs into one key
   * (`doc_id << 32 | frame_idx`): frame_idx derives from a payload whose
   * length is a JVM Int, so it is always < 2³¹ and the 32-bit packing
   * can NEVER drop a frame — no bound filter, no silent loss.
   */
  def frameSearchIvf(media: DataFrame, maxQueryDoc: Long = 30L, k: Int = 5,
                     frameBytes: Int = 64, everyNth: Int = 2, dims: Int = 8,
                     kCells: Int = 4, nprobe: Int = 2, iters: Int = 2): DataFrame = {
    val emb = frameEmbeddings(media, frameBytes, everyNth, dims)
      .select((shiftleft(col("doc_id").cast("long"), 32) + col("frame_idx")).as("vec_id"),
        col("embedding"))
    val queries = emb.filter(col("vec_id") < maxQueryDoc * (1L << 32))
    Similarity.ivfKmeansTopK(emb, queries, k, nprobe, kCells, iters, dim = dims)
      .select(shiftrightunsigned(col("query_id"), 32).as("q_doc"),
        (col("query_id").bitwiseAND(lit(0xFFFFFFFFL))).as("q_frame"),
        shiftrightunsigned(col("neighbor_id"), 32).as("doc_id"),
        (col("neighbor_id").bitwiseAND(lit(0xFFFFFFFFL))).as("frame_idx"),
        round(col("cosine"), 6).as("cosine"))
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
