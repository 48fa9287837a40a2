package graft

import graft.operators.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev tool: stage-level breakdown of exactJaccardPairs at sf0.1. */
object ProbeNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    val threshold = 0.5
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    println(s"[probe] docs=${docs.count()}")
    val sh = Dedup.shingleFrame(docs, 3)
      .select(col("doc_id"), xxhash64(col("shingle")).as("h")).cache()
    t("shingle+cache")(println(s"[probe] sh rows=${sh.count()}"))
    val df = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df").asc, col("h").asc)
    val wSize = Window.partitionBy(col("doc_id"))
    val prefix = sh.join(df, Seq("h"))
      .withColumn("rn", row_number().over(wDoc))
      .withColumn("n", count(lit(1)).over(wSize))
      .filter(col("rn") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select("doc_id", "h", "n", "rn").cache()
    t("prefix")(println(s"[probe] prefix rows=${prefix.count()}"))
    val required = lit(threshold / (1.0 + threshold)) * (col("na") + col("nb"))
    val cand = prefix.select(col("doc_id").as("doc_a"), col("h"), col("n").as("na"), col("rn").as("ra"))
      .join(prefix.select(col("doc_id").as("doc_b"), col("h"), col("n").as("nb"), col("rn").as("rb")), Seq("h"))
      .filter(col("doc_a") < col("doc_b") &&
        least(col("na"), col("nb")) >= lit(threshold) * greatest(col("na"), col("nb")) &&
        (lit(1) + least(col("na") - col("ra"), col("nb") - col("rb"))) >= required)
      .select("doc_a", "doc_b").distinct().cache()
    t("candidates")(println(s"[probe] cand rows=${cand.count()}"))
    t("verify")(println(s"[probe] verified=${
      Dedup.verifyJaccard(cand, sh).filter(col("jaccard") >= threshold).count()}"))
    spark.stop()
  }
}
