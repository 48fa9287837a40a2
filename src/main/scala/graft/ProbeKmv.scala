package graft

import org.apache.spark.sql.functions._

/** One-off audit: KMV estimate vs exact Jaccard deviation, in σ units
  * (σ² = J(1−J)/k), across every source pair — the measurement behind
  * the source_overlap band constant. */
object ProbeKmv {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(256)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = graft.operators.Sketches.sourceOverlapDebug(docs, 3, k)
      .orderBy(desc("abs_sigma")).collect()
    out.take(8).foreach(println)
    val maxSigma = out.headOption.map(_.getAs[Double]("abs_sigma")).getOrElse(0.0)
    println(s"pairs=${out.length} maxSigma=$maxSigma")
    spark.stop()
  }
}
