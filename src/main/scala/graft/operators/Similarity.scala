package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * Similarity search over an embedding column (`embeddings` frame:
 * vec_id LONG, embedding ARRAY<FLOAT>, label INT).
 *
 * All vector math is expression-based (`zip_with`/`aggregate`, see
 * GraftFunctions) — strict left-to-right folds, so results are
 * deterministic and reproducible in the DuckDB oracle. Floats are cast to
 * double BEFORE any arithmetic so both engines compute on identical values.
 *
 * Scale posture:
 *  - bruteForceTopK broadcasts the (small) query set and scans the corpus
 *    once — the right plan when |queries| is small; it is the exact
 *    baseline the approximate variants are measured against.
 *  - ivfTopK is the 100 TB path: corpus bucketed by nearest centroid
 *    (here: per-label mean vectors — stand-ins for k-means centroids),
 *    queries probe only the closest `nprobe` cells. Join is on cell id —
 *    no cross join anywhere.
 */
object Similarity {

  /** embedding cast to array<double> for exact arithmetic. */
  private def dvec(c: String) = transform(col(c), x => x.cast("double"))

  /** Exact top-k cosine neighbors for each query vector (self excluded). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), dvec("embedding").as("qv")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), dvec("embedding").as("cv"))
    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", GraftFunctions.cosineSimilarity(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
  }

  /** All pairs (a < b) with cosine >= threshold — embedding near-dup
    * detection. Exact; for the bucketed scale path see ivf/simhash LSH. */
  def thresholdPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("vec_a"), dvec("embedding").as("va"))
    val b = corpus.select(col("vec_id").as("vec_b"), dvec("embedding").as("vb"))
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", GraftFunctions.cosineSimilarity(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "cosine")
  }

  /** Per-cell mean vectors (IVF "centroids"); `cellCol` is the partition
    * assignment (the synthetic `label` column here; k-means ids in prod). */
  def centroids(corpus: DataFrame, cellCol: String = "label"): DataFrame = {
    val dim = 64
    val sums = (0 until dim).map(i =>
      sum(element_at(dvec("embedding"), i + 1)).as(s"c$i"))
    val aggs = sums :+ count(lit(1)).as("n")
    corpus.groupBy(col(cellCol).as("cell"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("cell"),
        array((0 until dim).map(i => col(s"c$i") / col("n")): _*).as("centroid"))
  }

  /**
   * IVF approximate top-k: probe the `nprobe` cells whose centroids are
   * closest to the query, exact cosine within probed cells only.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nprobe: Int = 2,
              cellCol: String = "label"): DataFrame = {
    val cents = broadcast(centroids(corpus, cellCol))
    val q = queries.select(col("vec_id").as("query_id"), dvec("embedding").as("qv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist").desc, col("cell").asc)
    val probes = q.crossJoin(cents) // |queries| × |cells| — both tiny
      .withColumn("cdist", GraftFunctions.cosineSimilarity(col("qv"), col("centroid")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell"))
    val c = corpus.select(col(cellCol).as("cell"),
      col("vec_id").as("neighbor_id"), dvec("embedding").as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.join(broadcast(probes), Seq("cell")) // equi-join on cell — no cross join with the corpus
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", GraftFunctions.cosineSimilarity(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
  }
}
