package graft.sources

import graft.model.{AvailabilityType, MetricType}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * Adapter from the driver's synthetic `events` table to the engine's
 * canonical datapoint frame (tenant_id, mtype, metric, time, n_value,
 * l_value, avail, s_value, tags).
 *
 * Mapping (deterministic, oracle-reproducible in ANSI SQL):
 *  - metric    := event_type || '/' || user_id  (one series per type×user)
 *  - time      := epoch millis of ts (exact integer ns div 1e6)
 *  - n_value   := value (gauge)
 *  - avail     := DOWN for 'error' events, UNKNOWN when value < 20, else UP
 *  - l_value   := running-sum counter with synthetic resets (mod 5000)
 *  - s_value   := high/mid/low level string derived from value
 *  - tags      := {"k": props.k} per-point tags (DataPoint.java:37-65 allows
 *                 per-point tags, not just per-metric)
 */
object EventsAdapter {

  /** Raw events; `ts` arrives as Long nanos (nanosAsLong).
    *
    * The driver fixture is a SINGLE-row-group parquet file, so its scan is
    * one task no matter the split size — fan out once (a ~2 MB shuffle) so
    * every downstream per-row pipeline uses all cores. The fan-out is
    * GATED on the input actually being one file: a real multi-file
    * deployment already scans in parallel, and an unconditional
    * repartition there would be an always-on full-data shuffle on every
    * read. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // NTZ wall clock must resolve as UTC (oracle parity; see tsMillis)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    singleFileFanOut(spark, spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** Repartition ONLY single-file inputs (see [[events]]); `inputFiles`
    * is driver-side metadata already gathered by the read, not a job. */
  private[graft] def singleFileFanOut(spark: SparkSession, df: DataFrame): DataFrame =
    if (df.inputFiles.length <= 1) df.repartition(spark.sparkContext.defaultParallelism)
    else df

  val Tenant = "acme"

  private val PointCols =
    Seq("tenant_id", "mtype", "metric", "time", "n_value", "l_value", "avail", "s_value", "tags")

  /** Canonical gauge datapoints. */
  def gaugePoints(spark: SparkSession, sfDir: String): DataFrame =
    gaugeFrom(base(spark, sfDir))

  private def gaugeFrom(b: DataFrame): DataFrame =
    b.withColumn("mtype", lit(MetricType.Gauge.code.toInt))
      .withColumn("n_value", col("value"))
      .withColumn("l_value", lit(null).cast("long"))
      .withColumn("avail", lit(null).cast("int"))
      .withColumn("s_value", lit(null).cast("string"))
      .select(PointCols.map(col): _*)

  /** Shared streaming source: the canonical base frame over a file-source
    * stream of the events fixture (the file source needs a directory
    * path; glob-filter to the fixture). */
  private def streamBase(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    baseFrom(spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir))
  }

  /** STREAMING variant of [[gaugePoints]]: the same canonical mapping over
    * a file-source stream of the events fixture — the entry point for
    * end-to-end Structured-Streaming ingest runs. */
  def gaugePointsStream(spark: SparkSession, sfDir: String): DataFrame =
    gaugeFrom(streamBase(spark, sfDir))

  /** Canonical availability datapoints (synthetic state mapping). */
  def availabilityPoints(spark: SparkSession, sfDir: String): DataFrame =
    availFrom(base(spark, sfDir))

  private def availFrom(b: DataFrame): DataFrame =
    b.withColumn("mtype", lit(MetricType.Availability.code.toInt))
      .withColumn("avail",
        when(col("event_type") === "error", lit(AvailabilityType.Down.code.toInt))
          .when(col("value") < 20.0, lit(AvailabilityType.Unknown.code.toInt))
          .otherwise(lit(AvailabilityType.Up.code.toInt)))
      .withColumn("n_value", lit(null).cast("double"))
      .withColumn("l_value", lit(null).cast("long"))
      .withColumn("s_value", lit(null).cast("string"))
      .select(PointCols.map(col): _*)

  /** STREAMING variant of [[availabilityPoints]] (same mapping over the
    * file-source stream — see [[gaugePointsStream]]). */
  def availabilityPointsStream(spark: SparkSession, sfDir: String): DataFrame =
    availFrom(streamBase(spark, sfDir))

  /** STREAMING read of the documents fixture (file-source stream, same
    * pattern as [[gaugePointsStream]]) — feeds the streaming corpus
    * ingest ([[graft.streaming.StreamingCorpus]]). */
  def documentsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
  }

  /**
   * Canonical counter datapoints: a monotonic running sum of floor(value)
   * per metric, wrapped mod 5000 so counter resets occur (exercises the
   * reset-drop path, reference MetricsServiceImpl.java:870-872).
   * Window ordered by (time, event_id) for a fully deterministic sum.
   */
  def counterPoints(spark: SparkSession, sfDir: String): DataFrame = {
    // window keys match MetricsOps.rate's (tenant, mtype, metric) exactly so
    // the downstream rate window reuses this exchange instead of reshuffling
    val w = Window.partitionBy(col("tenant_id"), col("mtype"), col("metric"))
      .orderBy(col("time"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base(spark, sfDir)
      .withColumn("mtype", lit(MetricType.Counter.code.toInt))
      .withColumn("l_value", pmod(sum(floor(col("value")).cast("long")).over(w), lit(5000L)))
      .withColumn("n_value", lit(null).cast("double"))
      .withColumn("avail", lit(null).cast("int"))
      .withColumn("s_value", lit(null).cast("string"))
      .select(PointCols.map(col): _*)
  }

  /** Canonical string datapoints: three-level quantization of the value so
    * distinct-contiguous (F7) has runs to collapse. */
  def stringPoints(spark: SparkSession, sfDir: String): DataFrame =
    base(spark, sfDir)
      .withColumn("mtype", lit(MetricType.Str.code.toInt))
      .withColumn("s_value",
        when(col("value") >= 66.0, lit("high"))
          .when(col("value") >= 33.0, lit("mid"))
          .otherwise(lit("low")))
      .withColumn("n_value", lit(null).cast("double"))
      .withColumn("l_value", lit(null).cast("long"))
      .withColumn("avail", lit(null).cast("int"))
      .select(PointCols.map(col): _*)

  /**
   * Metric-definition catalog (replaces metrics_idx + metrics_tags_idx,
   * reference bootstrap.groovy:117-137): one row per (mtype, metric) with
   * metric-level tags {type, user, seg}.
   */
  def catalog(spark: SparkSession, sfDir: String,
              mtype: MetricType = MetricType.Gauge): DataFrame =
    events(spark, sfDir)
      .select(col("event_type"), col("user_id"))
      .distinct()
      .select(
        lit(Tenant).as("tenant_id"),
        lit(mtype.code.toInt).as("mtype"),
        concat(col("event_type"), lit("/"), col("user_id")).as("metric"),
        map(
          lit("type"), col("event_type"),
          lit("user"), col("user_id").cast("string"),
          lit("seg"), concat(lit("s"), pmod(col("user_id"), lit(5)).cast("string"))
        ).as("tags"))

  /** Catalog across all user-insertable metric types (same series names per
    * type, as the reference allows — MetricId is (tenant, type, name)). */
  def catalogAll(spark: SparkSession, sfDir: String): DataFrame =
    Seq(MetricType.Gauge, MetricType.Availability, MetricType.Counter, MetricType.Str)
      .map(t => catalog(spark, sfDir, t))
      .reduce(_ unionAll _)

  private def base(spark: SparkSession, sfDir: String): DataFrame =
    baseFrom(events(spark, sfDir))

  /** Canonical behavioral-event frame for the session/funnel operators
    * ([[graft.operators.EventOps]]): one row per fixture event —
    * (event_id, user_id, event_type, time epoch-millis, value). Same
    * `ts` dispatch as the datapoint adapters. */
  def eventFrame(spark: SparkSession, sfDir: String): DataFrame =
    base(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("time"), col("value"))

  /** STREAMING variant of [[eventFrame]] (file-source stream, same
    * pattern as [[gaugePointsStream]]) — feeds the streaming
    * sessionization path ([[graft.streaming.StreamingSessions]]). */
  def eventFrameStream(spark: SparkSession, sfDir: String): DataFrame =
    streamBase(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("time"), col("value"))

  /** [[eventFrameStream]] over a caller-owned STAGING directory (every
    * parquet file, not the fixture glob) — queries that need to append
    * watermark-advancing sentinel files (outer-join flushes) stage the
    * fixture plus their sentinels here. */
  def eventFrameStreamDir(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val schema = spark.read.parquet(dir).schema
    baseFrom(spark.readStream.schema(schema).parquet(dir))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("time"), col("value"))
  }

  /** Fixture `ts` → epoch millis, matching the oracle's `epoch_ms(ts)`.
    * The driver fixture has shipped two physical encodings across rounds:
    * TIMESTAMP(NANOS) (read as Long under nanosAsLong → exact integer
    * ns div 1e6) and TIMESTAMP(MICROS) without timezone (read as
    * TIMESTAMP_NTZ → wall clock interpreted as UTC, which is what the
    * DuckDB oracle does). Dispatch on the resolved type so both work. */
  private def tsMillis(events: DataFrame): Column =
    events.schema("ts").dataType match {
      case LongType                        => expr("ts div 1000000")
      case TimestampNTZType | TimestampType => unix_millis(col("ts").cast(TimestampType))
      case other => throw new IllegalArgumentException(s"unsupported ts type: $other")
    }

  private def baseFrom(events: DataFrame): DataFrame =
    events.select(
      lit(Tenant).as("tenant_id"),
      concat(col("event_type"), lit("/"), col("user_id")).as("metric"),
      tsMillis(events).as("time"),
      col("event_type"),
      col("user_id"),
      col("event_id"),
      col("value"),
      map(lit("k"), get_json_object(col("props"), "$.k")).as("tags"))
}
