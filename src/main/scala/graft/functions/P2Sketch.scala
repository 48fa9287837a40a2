package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * P² (Jain & Chlamtac, CACM 1985) streaming percentile estimator as a
 * distributed Spark `Aggregator` — the scale-safe replacement for the
 * reference's per-bucket in-memory accumulation
 * (NumericDataPointCollector.java:45-61 wraps commons-math
 * PSquarePercentile; that object cannot merge, so a faithful Spark port
 * would need all of a bucket's points on one machine).
 *
 * State: an exact buffer of up to [[InitCap]] raw values, then the
 * classic 5 markers (heights + integer positions). Partial aggregation
 * (map-side combine) works because `merge` treats each buffer's markers
 * as a piecewise-linear empirical CDF and resamples the count-weighted
 * mixture at the desired quantile grid — O(1) state, O(1) merge, any
 * partitioning.
 *
 * Why the buffer is 64, not P²'s textbook 5: under partial aggregation
 * many SMALL partials merge pairwise, and every marker-marker merge
 * collapses two CDFs back to 5 points — with a 5-value buffer the
 * collapse starts almost immediately and the loss compounds up the merge
 * tree (measured ~10-20pp rank error on ~150-point groups split across
 * 32 partitions). With a 64-value exact stage, raw buffers concatenate
 * LOSSLESSLY, marker init happens once from a well-resolved sorted
 * sample (quantile-positioned, not first-5), and small groups never
 * leave the exact stage at all. State stays O(1): ≤ 64 doubles.
 */
object P2Sketch {

  /** Exact-buffer capacity before markers take over. */
  val InitCap = 64

  /** < [[InitCap]] raw values stay — UNSORTED — in `init` (consumers
    * sort on demand; sorting per append would be O(k² log k) per group
    * on the hot aggregation path); past that the 5 markers live in
    * (heights, pos) and `init` empties. Raw vs marker stage is
    * discriminated by `heights.isEmpty`, never by count. */
  case class Buf(count: Long, init: Array[Double], heights: Array[Double], pos: Array[Long])

  private def desired(q: Double): Array[Double] = Array(0.0, q / 2, q, (1 + q) / 2, 1.0)

  def empty: Buf = Buf(0L, Array.empty, Array.empty, Array.empty)

  private def bootstrap(q: Double, values: Array[Double]): Buf =
    if (values.length < InitCap) Buf(values.length, values, Array.empty, Array.empty)
    else initMarkers(q, values)

  /** Marker init at the DESIRED quantile positions of the sorted buffer —
    * exact at this instant, unlike the textbook first-5 init. The ONE
    * sort in the raw→marker transition happens here. */
  private def initMarkers(q: Double, values: Array[Double]): Buf = {
    val s = values.sorted
    val n = s.length
    val pos = desired(q).map(p => math.round(1 + p * (n - 1)))
    pos(0) = 1; pos(4) = n.toLong
    // strictly increasing, within [1, n]: raise interior markers off the
    // floor, then lower them off the ceiling — the endpoints stay pinned
    // at 1 and n (n >= InitCap >= 5 guarantees room for 3 interiors)
    var i = 1
    while (i < 4) { if (pos(i) <= pos(i - 1)) pos(i) = pos(i - 1) + 1; i += 1 }
    i = 3
    while (i >= 1) { if (pos(i) >= pos(i + 1)) pos(i) = pos(i + 1) - 1; i -= 1 }
    val heights = pos.map(p => s((p - 1).toInt))
    Buf(n, Array.empty, heights, pos)
  }

  /** One P² update step (markers already initialized). */
  private def insert(q: Double, b: Buf, x: Double): Buf = {
    val h = b.heights.clone()
    val n = b.pos.clone()
    val count = b.count + 1
    // find cell k and update extreme heights
    var k = -1
    if (x < h(0)) { h(0) = x; k = 0 }
    else if (x >= h(4)) { h(4) = math.max(h(4), x); k = 3 }
    else {
      k = 0
      while (k < 3 && x >= h(k + 1)) k += 1
    }
    var i = k + 1
    while (i < 5) { n(i) += 1; i += 1 }
    // desired positions for the new count
    val d = desired(q).map(p => 1 + p * (count - 1))
    // adjust interior markers
    i = 1
    while (i <= 3) {
      val diff = d(i) - n(i)
      if ((diff >= 1 && n(i + 1) - n(i) > 1) || (diff <= -1 && n(i - 1) - n(i) < -1)) {
        val dSign = math.signum(diff).toInt
        // parabolic (P²) prediction
        val hp = h(i) + dSign.toDouble / (n(i + 1) - n(i - 1)) *
          ((n(i) - n(i - 1) + dSign) * (h(i + 1) - h(i)) / (n(i + 1) - n(i)) +
            (n(i + 1) - n(i) - dSign) * (h(i) - h(i - 1)) / (n(i) - n(i - 1)))
        h(i) =
          if (h(i - 1) < hp && hp < h(i + 1)) hp
          else // linear fallback
            h(i) + dSign * (h(i + dSign) - h(i)) / (n(i + dSign) - n(i))
        n(i) += dSign
      }
      i += 1
    }
    Buf(count, b.init, h, n)
  }

  def add(q: Double, b: Buf, x: Double): Buf =
    if (b.heights.nonEmpty) insert(q, b, x)
    else {
      val init = b.init :+ x // O(1) logical append, no per-add sort
      if (init.length >= InitCap) initMarkers(q, init)
      else Buf(init.length, init, Array.empty, Array.empty)
    }

  /** Piecewise-linear empirical CDF breakpoints (value, cumulative rank). */
  private def cdfPoints(b: Buf): Array[(Double, Double)] =
    if (b.heights.isEmpty) b.init.sorted.zipWithIndex.map { case (v, i) => (v, (i + 1).toDouble) }
    else b.heights.zip(b.pos.map(_.toDouble))

  /** Inverse of the count-weighted CDF mixture at rank r ∈ [1, total]. */
  private def mixtureQuantile(pts1: Array[(Double, Double)], c1: Long,
                              pts2: Array[(Double, Double)], c2: Long, p: Double): Double = {
    def rankAt(pts: Array[(Double, Double)], total: Long, x: Double): Double = {
      if (pts.isEmpty || total == 0) return 0.0
      if (x <= pts.head._1) return if (x == pts.head._1) pts.head._2 else 0.0
      if (x >= pts.last._1) return total.toDouble
      var i = 0
      while (i < pts.length - 1 && pts(i + 1)._1 < x) i += 1
      val (x0, r0) = pts(i); val (x1, r1) = pts(i + 1)
      if (x1 == x0) r1 else r0 + (x - x0) / (x1 - x0) * (r1 - r0)
    }
    val total = c1 + c2
    val target = p * total
    // binary search on value axis over the union envelope
    var lo = math.min(pts1.headOption.map(_._1).getOrElse(Double.MaxValue),
      pts2.headOption.map(_._1).getOrElse(Double.MaxValue))
    var hi = math.max(pts1.lastOption.map(_._1).getOrElse(Double.MinValue),
      pts2.lastOption.map(_._1).getOrElse(Double.MinValue))
    var it = 0
    while (it < 60 && hi - lo > 1e-12 * math.max(1.0, math.abs(hi))) {
      val mid = (lo + hi) / 2
      if (rankAt(pts1, c1, mid) + rankAt(pts2, c2, mid) < target) lo = mid else hi = mid
      it += 1
    }
    (lo + hi) / 2
  }

  def merge(q: Double, b1: Buf, b2: Buf): Buf = {
    if (b1.count == 0) return b2
    if (b2.count == 0) return b1
    val raw1 = b1.heights.isEmpty
    val raw2 = b2.heights.isEmpty
    // raw + raw concatenates LOSSLESSLY (bootstrap re-inits markers from
    // the union if it crosses InitCap); raw values feed into an
    // initialized side one by one, exactly like sequential arrival
    if (raw1 && raw2) return bootstrap(q, b1.init ++ b2.init)
    if (raw1) return b1.init.foldLeft(b2)((b, v) => insert(q, b, v))
    if (raw2) return b2.init.foldLeft(b1)((b, v) => insert(q, b, v))
    // both initialized: resample the mixture CDF at the desired grid
    val total = b1.count + b2.count
    val p1 = cdfPoints(b1); val p2 = cdfPoints(b2)
    val d = desired(q)
    val heights = new Array[Double](5)
    heights(0) = math.min(b1.heights(0), b2.heights(0))
    heights(4) = math.max(b1.heights(4), b2.heights(4))
    var i = 1
    while (i <= 3) { heights(i) = mixtureQuantile(p1, b1.count, p2, b2.count, d(i)); i += 1 }
    // enforce monotone heights
    i = 1
    while (i < 5) { if (heights(i) < heights(i - 1)) heights(i) = heights(i - 1); i += 1 }
    val pos = d.map(p => math.max(1L, math.round(1 + p * (total - 1))))
    // positions must be strictly increasing for the update parabola
    i = 1
    while (i < 5) { if (pos(i) <= pos(i - 1)) pos(i) = pos(i - 1) + 1; i += 1 }
    Buf(total, Array.empty, heights, pos)
  }

  def result(q: Double, b: Buf): Option[Double] =
    if (b.count == 0) None
    else if (b.heights.isEmpty) {
      // raw stage: exact interpolated percentile over the buffered values
      val s = b.init.sorted
      val posd = q * (s.length - 1)
      val lo = posd.toInt; val frac = posd - lo
      Some(if (lo + 1 < s.length) s(lo) + frac * (s(lo + 1) - s(lo)) else s(lo))
    } else Some(b.heights(2))

  /** Spark Aggregator; register with `functions.udaf(new P2Aggregator(0.9))`.
    * Input is BOXED Double so NULLs reach `reduce` and are skipped — with a
    * primitive encoder they would decode as 0.0 and be counted, diverging
    * from the Exact mode's `percentile()` null handling. */
  class P2Aggregator(q: Double) extends Aggregator[java.lang.Double, Buf, Option[Double]] {
    override def zero: Buf = empty
    override def reduce(b: Buf, a: java.lang.Double): Buf =
      if (a == null) b else add(q, b, a.doubleValue())
    override def merge(b1: Buf, b2: Buf): Buf = P2Sketch.merge(q, b1, b2)
    override def finish(reduction: Buf): Option[Double] = result(q, reduction)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Option[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
