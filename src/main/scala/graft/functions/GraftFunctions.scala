package graft.functions

import graft.model.Buckets
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Scalar/column function library.
 *
 * Everything here stays inside whole-stage codegen (built-in expressions)
 * except the P² percentile evaluator, which is a deliberate scalar UDF over
 * small per-bucket arrays (see [[p2Percentile]]).
 */
object GraftFunctions {

  /**
   * Filter-pattern semantics of the reference
   * (core/metrics-core-service/.../PatternUtil.java:26-40):
   * `"*"` matches everything, a leading `"!"` negates the regex, otherwise
   * the value must FULLY match the Java regex (`Matcher.matches()`, hence
   * the `^(?:...)$` anchoring — Spark's `rlike` is find()-semantics).
   */
  def filterPattern(value: Column, pattern: String): Column =
    if (pattern == "*") value.isNotNull
    else if (pattern.startsWith("!")) {
      val p = pattern.substring(1)
      if (isLiteral(p)) value.isNotNull && value =!= p
      else value.isNotNull && !value.rlike(anchored(p))
    }
    else if (isLiteral(pattern)) value === pattern // also null-safe: === is null-rejecting
    else value.isNotNull && value.rlike(anchored(pattern))

  /** Anchor + EAGER compile: a malformed pattern (TagsITest's `a1:**`)
    * must fail at plan construction — where the REST facade maps
    * IllegalArgumentException (PatternSyntaxException is one) to 400 —
    * not inside an executor task, where it would surface as a 500. */
  private def anchored(regex: String): String = {
    val a = "^(?:" + regex + ")$"
    java.util.regex.Pattern.compile(a)
    a
  }

  /** Regex-free pattern → plain equality (the reference's regex→exact-seek
    * rewrite, SimpleTagQueryParser.java:209-230 / IS_REGEXP heuristic):
    * equality is cheaper per row and keeps the plan simpler. */
  private def isLiteral(p: String): Boolean = p.forall(c => !"\\^$.|?*+()[]{}".contains(c))

  /** Bucket index `(time - start) div step` — exact long arithmetic
    * (reference Buckets.java:77-88). Takes the column name so the integral
    * `div` operator (no double rounding) can be used. */
  def bucketIndex(timeCol: String, b: Buckets): Column =
    expr(s"($timeCol - ${b.start}L) div ${b.step}L")

  /** Bucket start/end timestamps for a bucket-index column. */
  def bucketStart(bucket: Column, b: Buckets): Column = lit(b.start) + bucket * lit(b.step)
  def bucketEnd(bucket: Column, b: Buckets): Column = bucketStart(bucket, b) + lit(b.step)

  /** Clamped fixed-width value-bin index — ONE definition shared by the
    * heatmap histogram aggregate (MetricsOps.valueHistogram) and the
    * histogram rollup tier (GraftStorage.writeRollupHist), so the tier's
    * stored counts are bit-equal to the on-read histogram (the tier's
    * exactness contract rests on the bin function being identical). */
  def valueBin(v: Column, vMin: Double, width: Double, bins: Int): Column =
    least(greatest(floor((v - vMin) / width), lit(0.0)), lit((bins - 1).toDouble))
      .cast("long")

  /**
   * P² (Jain & Chlamtac 1985) streaming percentile — the estimator the
   * reference feeds per bucket (NumericDataPointCollector.java:45-61 wraps
   * commons-math `PSquarePercentile`). P² is order-sensitive, so callers
   * must pass a deterministically ordered array (time-ascending, matching
   * the reference's single-threaded per-bucket accumulation).
   *
   * Used for reference-parity results; the DuckDB-oracled queries use exact
   * `percentile()` instead (see SparkEntry notes).
   */
  /** The distributed P² marker sketch (scale path) — see [[P2Sketch]].
    * Quantile in [0,1]. */
  def p2SketchAgg(quantile: Double): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new P2Sketch.P2Aggregator(quantile), org.apache.spark.sql.Encoders.DOUBLE)

  val p2Percentile: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (values: Seq[Double], quantile: Double) =>
      if (values == null || values.isEmpty) None
      else {
        val p = new org.apache.commons.math3.stat.descriptive.rank.PSquarePercentile(quantile)
        values.foreach(p.increment)
        val r = p.getResult
        if (r.isNaN) None else Some(r)
      }
    }

  // Vector math lives in graft.plans.VectorDot (native codegen loop over
  // float/double arrays); MinHash permutation math lives inline in
  // graft.operators.Dedup (pmod column expressions over xxhash64). The
  // earlier higher-order-function / unrolled-element_at formulations were
  // superseded by those and removed.
}
