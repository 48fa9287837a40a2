package graft

import graft.sources.EventsAdapter
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Dev tool: A/B slice granularity and codec for the raw-tier write path. */
object ProbeStorage {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val gauge = EventsAdapter.gaugePoints(spark, sfDir).cache()
    gauge.count() // isolate write cost from the adapter pipeline
    for (sliceMs <- Seq(2L * 3600 * 1000, 24L * 3600 * 1000);
         codec <- Seq("zstd", "snappy")) {
      val path = s"target/tmp/probe_${sliceMs}_$codec"
      val w = (1 to 3).map { _ =>
        time {
          gauge.withColumn("time_slice", expr(s"time div $sliceMs"))
            .withColumn("ingest_seq", lit(1L))
            .repartition(col("tenant_id"), col("mtype"), col("time_slice"))
            .sortWithinPartitions(col("metric"), col("time"))
            .write.partitionBy("tenant_id", "mtype", "time_slice")
            .option("compression", codec).mode(SaveMode.Overwrite).parquet(path)
        }
      }.min
      val r = (1 to 3).map { _ =>
        time(spark.read.parquet(path).write.format("noop").mode("overwrite").save())
      }.min
      println(f"[probe] slice=${sliceMs / 3600000}%2dh codec=$codec%-6s write=$w%6.3f read=$r%6.3f")
    }
    spark.stop()
  }
}
