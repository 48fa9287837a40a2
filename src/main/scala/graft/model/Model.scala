package graft.model

/**
 * Core data model, re-expressed as Scala case classes for use with Spark
 * `Dataset[T]` encoders.
 *
 * Reference shapes:
 *  - MetricId  (core/metrics-model/.../MetricId.java:27-38)
 *  - DataPoint (core/metrics-model/.../DataPoint.java:37-65) — per-point tags allowed
 *  - Metric    (core/metrics-model/.../Metric.java:48-54,137-144)
 *  - NumericBucketPoint (core/metrics-model/.../NumericBucketPoint.java:30-51)
 *  - AvailabilityBucketPoint (core/metrics-model/.../AvailabilityBucketPoint.java:31-46)
 *  - TaggedBucketPoint (core/metrics-model/.../TaggedBucketPoint.java:26-35)
 *  - Percentile (core/metrics-model/.../Percentile.java:22-38)
 */
final case class MetricId(tenantId: String, mtype: Byte, name: String)

/** Row shape of the canonical datapoint DataFrame ("one nullable column per value type",
  * mirroring the reference's fixed Cassandra schema, bootstrap.groovy:101-115). */
final case class DataPointRow(
    tenant_id: String,
    mtype: Byte,
    metric: String,
    time: Long, // epoch millis — exact arithmetic for bucket math
    n_value: Option[Double],
    l_value: Option[Long],
    avail: Option[Byte],
    s_value: Option[String],
    tags: Map[String, String])

final case class Metric(
    id: MetricId,
    tags: Map[String, String],
    dataRetention: Option[Int],
    minTimestamp: Option[Long],
    maxTimestamp: Option[Long])

/** Quantile keeps the user's original string form (reference Percentile.java:22-38). */
final case class PercentileValue(quantile: String, value: Double)

final case class NumericBucketPoint(
    start: Long,
    end: Long,
    min: Option[Double],
    avg: Option[Double],
    median: Option[Double],
    max: Option[Double],
    sum: Option[Double],
    samples: Option[Long],
    percentiles: Seq[PercentileValue]) {
  def isEmpty: Boolean = samples.forall(_ == 0L)
}

final case class AvailabilityBucketPoint(
    start: Long,
    end: Long,
    upMs: Option[Long],
    downMs: Option[Long],
    unknownMs: Option[Long],
    adminMs: Option[Long],
    lastNotUptime: Option[Long],
    uptimeRatio: Option[Double],
    notUpCount: Option[Long],
    samples: Option[Long])

final case class TaggedBucketPoint(
    tags: Map[String, String],
    min: Option[Double],
    avg: Option[Double],
    median: Option[Double],
    max: Option[Double],
    sum: Option[Double],
    samples: Option[Long],
    percentiles: Seq[PercentileValue])

/** (metricName, dataPoint) pair for multi-metric raw queries
  * (reference NamedDataPoint.java). */
final case class NamedDataPoint(metric: String, time: Long, value: Double)
