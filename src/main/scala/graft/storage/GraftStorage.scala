package graft.storage

import graft.model.MetricType
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Raw-tier storage: the Spark-native replacement for the reference's
 * Cassandra tables (2-hour temp tables + Gorilla-compressed blocks,
 * DataAccessImpl.java:963-1008, MetricsServiceImpl.java:764-818).
 *
 * Layout: Parquet partitioned by (tenant_id, mtype, time_slice) where
 * time_slice = floor(time / 2h) — the reference's `dpart`/temp-table-per-
 * slice scheme re-expressed as partition pruning. Files within a slice are
 * sorted by (metric, time) so metric+range scans touch few row groups.
 *
 * The reference's three tiers collapse to one: Parquet encodings + ZSTD
 * replace Gorilla (SURVEY §1.4), and `compact` replaces the 2h compression
 * job (S8) — rewrite a closed slice as fewer, sorted, ZSTD files.
 */
object GraftStorage {

  val SliceMs: Long = 2L * 60 * 60 * 1000 // 2-hour UTC slices (DateTimeService 2h block math)

  def withSlice(dp: DataFrame): DataFrame =
    dp.withColumn("time_slice", expr(s"time div $SliceMs"))

  // write-batch sequence for last-write-wins: wall-clock millis << 20 | a
  // process-local counter — strictly increasing across batches, which is
  // what Cassandra's upsert timestamp provided (DataAccessImpl.java:215-221)
  private val seqCounter = new java.util.concurrent.atomic.AtomicLong()
  private def nextIngestSeq(): Long =
    (System.currentTimeMillis() << 20) | (seqCounter.getAndIncrement() & 0xfffffL)

  /**
   * S1 — batch append of canonical datapoints. `sortWithinPartitions`
   * before write gives run-length-friendly pages and clustered row groups;
   * repartition by the physical partition columns keeps one task per
   * output partition (no small-file explosion at 1000 executors).
   */
  def write(dp: DataFrame, path: String, mode: SaveMode = SaveMode.Append): Unit =
    withSlice(dp)
      .withColumn("ingest_seq", lit(nextIngestSeq()))
      .repartition(col("tenant_id"), col("mtype"), col("time_slice"))
      .sortWithinPartitions(col("metric"), col("time"))
      .write
      .partitionBy("tenant_id", "mtype", "time_slice")
      .option("compression", "zstd")
      .mode(mode)
      .parquet(path)

  /** Range scan entry: partition pruning on (tenant, type, slice range)
    * happens before any file is opened. Partition columns come back from
    * directory names as INT — normalize to the canonical types. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .withColumn("time_slice", col("time_slice").cast("long"))
      .withColumn("mtype", col("mtype").cast("int"))

  def readRange(spark: SparkSession, path: String, tenantId: String,
                mtype: MetricType, start: Long, end: Long): DataFrame =
    read(spark, path)
      .filter(col("tenant_id") === tenantId && col("mtype") === mtype.code.toInt)
      .filter(col("time_slice") >= start / SliceMs && col("time_slice") <= (end - 1) / SliceMs)
      .filter(col("time") >= start && col("time") < end)

  /**
   * S8 — compaction of closed slices (the TempDataCompressor analog): read
   * the slice back, last-write-wins dedup on the primary key (Cassandra
   * upsert semantics, DataAccessImpl.java:215-221), rewrite sorted+ZSTD
   * with one file per partition, atomically replace via overwrite of the
   * matching partitions only (dynamic partition overwrite).
   */
  def compact(spark: SparkSession, path: String, upToSlice: Long): Unit = {
    val closed = read(spark, path).filter(col("time_slice") < upToSlice)
    val deduped = closed
      .groupBy(col("tenant_id"), col("mtype"), col("time_slice"), col("metric"), col("time"))
      .agg(max_by(struct(col("n_value"), col("l_value"), col("avail"), col("s_value"), col("tags")),
        col("ingest_seq")).as("v"),
        max(col("ingest_seq")).as("ingest_seq"))
      .select(col("tenant_id"), col("mtype"), col("metric"), col("time"),
        col("v.n_value"), col("v.l_value"), col("v.avail"), col("v.s_value"), col("v.tags"),
        col("ingest_seq"), col("time_slice"))
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // localCheckpoint truncates lineage so the overwrite does not read from
    // the path it is replacing (prod would land in a table format with an
    // atomic REPLACE instead)
    try deduped.localCheckpoint()
      .repartition(col("tenant_id"), col("mtype"), col("time_slice"))
      .sortWithinPartitions(col("metric"), col("time"))
      .write
      .partitionBy("tenant_id", "mtype", "time_slice")
      .option("compression", "zstd")
      .mode(SaveMode.Overwrite)
      .parquet(path)
    finally prev.foreach(spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
  }

  /**
   * Retention sweep (TTL analog, MetricsServiceImpl.java:1058-1067): drop
   * whole expired slice partitions — a metadata-only delete, no rewrite.
   */
  def expiredSlices(spark: SparkSession, path: String, retentionDays: Int,
                    now: Long): Seq[Long] = {
    val cutoff = (now - retentionDays * 86400000L) / SliceMs
    read(spark, path).select(col("time_slice")).distinct()
      .filter(col("time_slice") < cutoff)
      .collect().map(_.getLong(0)).toSeq
  }

  /** S9 — delete a metric: rewrite only the partitions that contain it. */
  def deleteMetric(spark: SparkSession, path: String, tenantId: String,
                   mtype: MetricType, metric: String): Unit = {
    val remaining = read(spark, path)
      .filter(col("tenant_id") === tenantId && col("mtype") === mtype.code.toInt)
      .filter(col("metric") =!= metric)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try remaining.localCheckpoint()
      .repartition(col("tenant_id"), col("mtype"), col("time_slice"))
      .sortWithinPartitions(col("metric"), col("time"))
      .write
      .partitionBy("tenant_id", "mtype", "time_slice")
      .option("compression", "zstd")
      .mode(SaveMode.Overwrite)
      .parquet(path)
    finally prev.foreach(spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
  }
}
