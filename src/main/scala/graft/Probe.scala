package graft
import org.apache.spark.sql.SparkSession

/** Dev-only probe: isolate slow bench queries at sf0.1. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def timed(name: String): Unit = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sf).write.format("noop").mode("overwrite").save()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    timed("doc_fingerprint")
    timed("dedup_minhash")
    timed("doc_fingerprint")
    timed("distinct_string")
    spark.stop()
  }
}
