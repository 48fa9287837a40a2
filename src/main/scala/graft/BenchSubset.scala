package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a subset of SparkEntry queries (args = names) on
  * SPARK_GRAFT_SF_DIR, two passes, min per query. Not part of the driver
  * contract — used while tuning individual operators. */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.read.parquet(s"$sfDir/events.parquet").write.format("noop").mode("overwrite").save()
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    val names = if (args.nonEmpty) args.toSeq else Seq("dedup_clusters")
    val p1 = names.map(n => n -> once(n))
    val p2 = names.map(n => n -> once(n))
    p1.zip(p2).foreach { case ((n, a), (_, b)) =>
      println(f"[subset] $n%-24s min=${math.min(a, b)}%7.3f  (p1=$a%7.3f p2=$b%7.3f)")
    }
    spark.stop()
  }
}
