package graft
import org.apache.spark.sql.SparkSession

/** Dev-only probe: drives the driver contract surface (entry smoke +
  * spot queries) exactly as the harness would. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // t1 smoke: flagship entry on sf0.001, driver checks rows > 0
    val e = SparkEntry.entry(spark)
    println(s"entry rows=${e.count()}")
    e.show(5, truncate = false)
    // probe: queries on the smallest sf (metric may not exist there)
    val sparse = SparkEntry.queries("gauge_stats_sparse")(spark, "/root/testdata/sf0.001")
    println(s"sparse@sf0.001 rows=${sparse.count()}")
    val mh = SparkEntry.queries("dedup_minhash")(spark, "/root/testdata/sf0.001")
    println(s"minhash@sf0.001 rows=${mh.count()}")
    spark.stop()
  }
}
