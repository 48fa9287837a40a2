package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: doc_fingerprint cost breakdown at sf0.1. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").repartition(32).cache()
    docs.count()
    def timed(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    import graft.operators.Dedup
    timed("content_md5_only")(docs.select(col("doc_id"), md5(col("text").cast("binary"))))
    timed("shingles_only")(docs.select(col("doc_id"), Dedup.shingles(col("text"), 5)))
    timed("shingle_md5_min")(docs.select(col("doc_id"),
      array_min(transform(Dedup.shingles(col("text"), 5), s => md5(s.cast("binary"))))))
    timed("shingle_xxhash_min")(docs.select(col("doc_id"),
      array_min(transform(Dedup.shingles(col("text"), 5), s => xxhash64(s)))))
    timed("explode_min_md5")(
      docs.select(col("doc_id"), explode(Dedup.shingles(col("text"), 5)).as("s"))
        .groupBy("doc_id").agg(min(md5(col("s").cast("binary")))))
    timed("full_fingerprints")(graft.operators.TextOps.fingerprints(docs))
    timed("full_fingerprints_again")(graft.operators.TextOps.fingerprints(docs))
    spark.stop()
  }
}
