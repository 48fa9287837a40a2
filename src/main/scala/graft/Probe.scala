package graft
import org.apache.spark.sql.SparkSession

/** Dev-only probe: schema/read checks on the driver-generated testdata. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.show(3, truncate = false)
    import org.apache.spark.sql.functions._
    ev.select(unix_millis(col("ts")).as("ms")).show(3)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.printSchema()
    spark.stop()
  }
}
