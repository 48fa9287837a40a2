package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Full-text retrieval over the corpus: Okapi BM25 scoring (Robertson &
 * Walker SIGIR'94; the idf form is Lucene's non-negative
 * `ln(1 + (N - df + 0.5)/(df + 0.5))`) and reciprocal-rank-fusion of
 * lexical + vector result lists (Cormack et al. SIGIR'09). Retrieval
 * is a first-class curation tool at corpus scale — targeted
 * decontamination, near-duplicate triage, and quality spot-checks are
 * all "find the documents like THIS" queries.
 *
 * Scale notes (100 TB): the corpus is NEVER shuffled on content. Doc
 * length is a projection computed in the same scan that explodes
 * tokens; non-query tokens are dropped map-side by a broadcast
 * semi-join on the (tiny) query-term set BEFORE the only corpus-sized
 * exchange — the (doc, term) tf aggregate, whose input is
 * matching-postings-sized, exactly an inverted-index posting read.
 * df/idf frames are |terms|-sized and broadcast back; the final top-k
 * is a per-query rank window over a candidates-only frame.
 *
 * Determinism: per-term BM25 partials are rounded to integer
 * MICRO-UNITS and summed as longs (the engine's micro-nat discipline,
 * see TextOps.unigramSurprisal) — bit-identical across partitionings
 * and engines; ties rank by doc_id.
 */
object Retrieval {

  /**
   * BM25 top-k: `queries` is (query_id: Long, terms: array<string>);
   * duplicate terms within one query are deduped (classic BM25 scores
   * unique terms; query-side tf weighting is a variant we don't need).
   * Output: (query_id, doc_id, score, rank) for the top `k` docs per
   * query, score = sum of per-term micro-unit partials / 1e6.
   */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val words = split(lower(col("text")), " ")
    // one-row corpus stats frame: N and avgdl (exact integer inputs)
    val stats = docs
      .select(size(split(lower(col("text")), " ")).cast("long").as("dl"))
      .agg(count(lit(1)).cast("long").as("n_docs"), sum(col("dl")).as("dl_sum"))
      .select(col("n_docs"),
        (col("dl_sum").cast("double") / col("n_docs")).as("avgdl"))
    val qterms = queries
      .select(col("query_id"), explode(array_distinct(col("terms"))).as("token"))
    val termSet = qterms.select(col("token")).distinct()
    // matching postings only: the broadcast semi-join prunes map-side,
    // so the ONLY corpus-sized exchange carries query-term hits
    // materialized ONCE: both the scoring join and the df aggregate read
    // this frame — without the checkpoint Catalyst re-derives the whole
    // tokenize+shuffle subtree for df, a second full corpus pass
    val tf = docs
      .select(col("doc_id"), size(words).cast("long").as("dl"),
        explode(words).as("token"))
      .join(broadcast(termSet), Seq("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).cast("long").as("tf"), max(col("dl")).as("dl"))
      .localCheckpoint()
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).cast("long").as("df"))
    val partial = tf
      .join(broadcast(dfreq), Seq("token"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("tfn",
        col("tf") * (lit(k1) + lit(1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .withColumn("term_score_u",
        round(col("idf") * col("tfn") * lit(1000000.0), 0).cast("long"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_u").desc, col("doc_id").asc)
    partial
      .join(broadcast(qterms), Seq("token"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_score_u")).as("score_u"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        round(col("score_u").cast("double") / lit(1000000.0), 6).as("score"),
        col("rank"))
  }

  /**
   * Reciprocal-rank fusion of two ranked lists (e.g. BM25 + embedding
   * cosine): fused(q, d) = Σ over lists of 1/(rrfK + rank). A doc
   * absent from one list simply contributes nothing from it — the
   * standard RRF treatment (no score normalization needed, which is
   * the method's point: ranks fuse where raw scores can't).
   *
   * Inputs are (query_id, doc_id, rank) frames — shortlist-sized (≤
   * queries × k rows), so the outer join and rank window cost nothing
   * relative to the searches that produced them. Fused partials use
   * the same micro-unit long discipline as [[bm25TopK]].
   */
  def rrfFuse(lexical: DataFrame, vector: DataFrame, k: Int,
              rrfK: Int = 60): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    def contrib(df: DataFrame, name: String): DataFrame =
      df.select(col("query_id"), col("doc_id"),
        round(lit(1000000.0) / (lit(rrfK) + col("rank")), 0).cast("long").as(name),
        col("rank").as(s"${name}_rank"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("fused_u").desc, col("doc_id").asc)
    contrib(lexical, "lex_u")
      .join(contrib(vector, "vec_u"), Seq("query_id", "doc_id"), "full_outer")
      .withColumn("fused_u", coalesce(col("lex_u"), lit(0L)) + coalesce(col("vec_u"), lit(0L)))
      .withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= k)
      .select(col("query_id"), col("doc_id"),
        round(col("fused_u").cast("double") / lit(1000000.0), 6).as("fused_score"),
        col("fused_rank"), col("lex_u_rank").as("lex_rank"), col("vec_u_rank").as("vec_rank"))
  }
}
