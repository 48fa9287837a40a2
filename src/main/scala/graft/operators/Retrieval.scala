package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    require(k1 > 0, s"k1 must be positive, got $k1")
    require(b >= 0 && b <= 1, s"b must be in [0, 1], got $b")
    val qterms = queries
      .select(col("query_id"), explode(array_distinct(col("terms"))).as("token"))
    // matching postings only (see postingsFor); materialized ONCE: both
    // the scoring join and the df aggregate read this frame — without
    // the checkpoint Catalyst re-derives the whole tokenize+shuffle
    // subtree for df, a second full corpus pass. LAZY (eager would run
    // the posting job at plan-BUILD time even if the query is never
    // executed — the mixedTypeStats lesson); the first action computes
    // it once and both plan branches read the same checkpointed RDD.
    val tf = postingsFor(docs, qterms.select(col("token")).distinct())
      .localCheckpoint(eager = false)
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).cast("long").as("df"))
    scoreAndRank(tf, dfreq, corpusStats(docs), qterms, k, k1, b)
  }

  /** Token-hash partition count of the stored index (int partition
    * column, the Dedup.IndexBuckets discipline). */
  val IndexBuckets = 64

  private def words = split(lower(col("text")), " ")

  private def tokenBucket(token: Column): Column =
    pmod(xxhash64(token), lit(IndexBuckets.toLong)).cast("int")

  /** (doc_id, token, tf, dl) posting rows, restricted to `termSet` when
    * given — the broadcast semi-join drops non-query tokens map-side, so
    * the exchange under the aggregate carries matching postings only. */
  private def postingsFor(docs: DataFrame, termSet: DataFrame = null): DataFrame = {
    val exploded = docs.select(col("doc_id"), size(words).cast("long").as("dl"),
      explode(words).as("token"))
    val pruned =
      if (termSet == null) exploded
      else exploded.join(broadcast(termSet), Seq("token"))
    pruned
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).cast("long").as("tf"), max(col("dl")).as("dl"))
  }

  /** One-row (n_docs, avgdl) corpus-stats frame (exact integer inputs). */
  private def corpusStats(docs: DataFrame): DataFrame =
    docs
      .select(size(words).cast("long").as("dl"))
      .agg(count(lit(1)).cast("long").as("n_docs"), sum(col("dl")).as("dl_sum"))
      .select(col("n_docs"),
        (col("dl_sum").cast("double") / col("n_docs")).as("avgdl"))

  /** Shared scoring tail: postings × df × corpus stats → micro-unit
    * per-term partials → per-(query, doc) long sums → rank window. The
    * arithmetic tree is mirrored operation-for-operation by the DuckDB
    * oracle — don't reassociate it. */
  private def scoreAndRank(tf: DataFrame, dfreq: DataFrame, stats: DataFrame,
                           qterms: DataFrame, k: Int,
                           k1: Double, b: Double): DataFrame = {
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
   * Build → store: the persisted inverted index. Three tables under
   * `path`: `postings` (doc_id, token, tf, dl) PARTITIONED by the
   * token-hash bucket (so serving reads only the queried terms'
   * buckets), `tokenstats` (token, df) on the same partitioning, and
   * the one-row `corpusstats` (n_docs, avgdl inputs). One tokenize
   * pass feeds all three (cached posting frame); `meta` pins the
   * bucket count so a probe with a different modulus fails loudly
   * instead of silently missing partitions.
   */
  def writeBm25Index(docs: DataFrame, path: String): Unit = {
    val spark = docs.sparkSession
    // a REBUILD at a path whose previous store had pending deletes must
    // not inherit them ([[graft.storage.IndexStore.clearSideTables]])
    graft.storage.IndexStore.clearSideTables(spark, path, Seq("deleted_docs"))
    val tf = postingsFor(docs)
      .withColumn("bucket", tokenBucket(col("token"))).cache()
    tf.count() // materialize eagerly — two writers + df read it
    try {
      // four independent table writes off the one materialized postings
      // frame (disjoint output paths, no ordering constraint) —
      // concurrent (§2.6); META lands last, below
      graft.storage.IndexStore.inParallel(Seq(
        // bucketed writes via the shared lifecycle (file count ∝ buckets,
        // not tasks×buckets — IndexStore primitive 3)
        () => graft.storage.IndexStore.writeBucketed(tf, path, "postings", overwrite = true),
        () => graft.storage.IndexStore.writeBucketed(
          tf.groupBy(col("token"), col("bucket"))
            .agg(count(lit(1)).cast("long").as("df")),
          path, "tokenstats", overwrite = true),
        () => docs.agg(count(lit(1)).cast("long").as("n_docs"),
            sum(size(words).cast("long")).as("dl_sum"))
          .coalesce(1).write.mode("overwrite").parquet(s"$path/corpusstats"),
        // per-doc lengths: the append path's id screen + stats inputs
        () => docs.select(col("doc_id"), size(words).cast("long").as("dl"))
          .write.mode("overwrite").parquet(s"$path/docstats")))
      // meta lands LAST, never concurrently: it is the streaming
      // maintainer's bootstrap-vs-append discriminator — its existence
      // must imply every table landed
      graft.storage.IndexStore.writeMeta(spark, path, Seq("buckets" -> IndexBuckets))
    } finally tf.unpersist()
  }

  /**
   * Serve from the stored index: NO corpus scan, no tokenization. The
   * query-term BUCKET list is collected (|terms|-sized — the same
   * model-sized-collect budget as IVF centroids) and pushed as a STATIC
   * `bucket IN (...)` partition filter on both stores — pruning at plan
   * time, stronger than DPP (which also wouldn't fire here: the
   * unfiltered query frame has no selective predicate for the rule to
   * reuse). Within the surviving buckets a broadcast term join keeps
   * exactness; the scoring tail is byte-for-byte [[scoreAndRank]], so
   * stored answers equal the inline [[bm25TopK]] answers (spec-pinned).
   */
  /**
   * Incremental maintenance: append a document batch WITHOUT rebuilding.
   * Already-indexed doc_ids are anti-joined away first, so a replayed
   * batch is a no-op (the same idempotency contract as the near-dup and
   * IVF appends). Work is batch-bounded everywhere except the two
   * unavoidable store touches: the id anti-join (one pass over the
   * docstats id column) and the tokenstats merge, which rewrites ONLY
   * the buckets the batch's tokens hash into (dynamic partition
   * overwrite of a localCheckpoint-materialized merge — never
   * read-and-overwrite in place). After the append, serving answers
   * equal a fresh rebuild over the union corpus exactly (spec-pinned:
   * df, avgdl, and n_docs all shift — the merge has to get every one
   * of them right).
   */
  def appendToBm25Index(spark: org.apache.spark.sql.SparkSession, path: String,
                        batch: DataFrame): Unit = {
    graft.storage.IndexStore.requireMeta(spark, path, Seq("buckets" -> IndexBuckets))
    // revival: a batch re-registering a DELETED doc purges the id's stale
    // rows first — postings/docstats by anti-join, then the two stats
    // tables REBUILD from the repaired base tables (they are corpus
    // aggregates; a targeted decrement would drift on any crash replay) —
    // and only then does the tombstone clear, so a crash at any point
    // replays idempotently. Store-sized work (rewrites + two aggregates,
    // a compaction's order of cost) but targeted in SCOPE: other pending
    // tombstones stay pending, a batch of revivals pays once, and normal
    // appends never enter this branch.
    deletedDocs(spark, path).foreach { d =>
      val revived = batch.select(col("doc_id")).distinct()
        .join(broadcast(d), Seq("doc_id"), "left_semi").localCheckpoint()
      if (!revived.isEmpty) {
        purgeDocs(spark, path, revived)
        graft.storage.IndexStore.clearDeletes(spark, path, "deleted_docs",
          revived, Seq("doc_id"))
      }
    }
    val fresh = graft.storage.IndexStore.screenFresh(batch, path, "docstats", Seq("doc_id"))
    // localCheckpoint, NOT cache: it must (a) resolve the anti-join against
    // the PRE-append store, and (b) survive the docstats append below —
    // a cached plan still references the docstats path, and Spark's
    // refreshByPath on that append would RECOMPUTE it against the
    // post-append listing (anti-joining the batch away → empty postings).
    // Lineage truncation makes the materialized batch immune to that.
    val tf = postingsFor(fresh)
      .withColumn("bucket", tokenBucket(col("token"))).localCheckpoint()
    try {
      // corpus deltas are computed against the PRE-append store, before any
      // write lands
      val add = fresh.agg(count(lit(1)).cast("long").as("n_docs"),
        coalesce(sum(size(words).cast("long")), lit(0L)).as("dl_sum")).collect()(0)
      val old = spark.read.parquet(s"$path/corpusstats").collect()(0)
      // The replay-idempotency screen (docstats) is written FIRST: a crash
      // anywhere after this line makes the replayed batch a full no-op, so
      // postings/tokenstats can never be double-applied. The failure mode
      // this chooses is the benign one — a crash between here and the
      // postings append leaves the batch's docs registered but unsearchable
      // (zero postings), repaired by a rebuild; the alternative order
      // (postings first) silently double-counts tf/df on replay.
      fresh.select(col("doc_id"), size(words).cast("long").as("dl"))
        .write.mode("append").parquet(s"$path/docstats")
      val batchDf = tf.groupBy(col("token"), col("bucket"))
        .agg(count(lit(1)).cast("long").as("df"))
      val affected = batchDf.select(col("bucket")).distinct()
        .collect().map(_.getInt(0)).sorted.toSeq
      if (affected.nonEmpty) {
        // merge batch df into ONLY the affected buckets; EAGER
        // materialization is load-bearing here (unlike bm25TopK's lazy
        // share): the merge READS the partitions the write below
        // overwrites — a lazy checkpoint would still be reading the live
        // files at write time
        val merged = spark.read.parquet(s"$path/tokenstats")
          .filter(col("bucket").isin(affected: _*))
          .unionByName(batchDf)
          .groupBy(col("token"), col("bucket"))
          .agg(sum(col("df")).cast("long").as("df"))
          .localCheckpoint()
        // the tokenstats bucket-merge and the postings append are
        // unordered w.r.t. each other (either half-landed state is healed
        // by compaction's rebuildStats, exactly as before) — overlap (§2.6)
        graft.storage.IndexStore.inParallel(Seq(
          () => merged.repartition(col("bucket"))
            .write.mode("overwrite").partitionBy("bucket")
            .option("partitionOverwriteMode", "dynamic") // per-writer, race-free
            .parquet(s"$path/tokenstats"),
          () => graft.storage.IndexStore.writeBucketed(tf, path, "postings", overwrite = false)))
      }
      // corpus stats: one stored row + one batch row → new exact totals
      // (add/old were captured before any write, against the pre-state),
      // swapped through the SHARED crash-safe helper — it checks every
      // rename and its recovery discipline restores a copy stranded at
      // .corpusstats.old by a crash between the two renames
      import spark.implicits._
      graft.storage.AtomicSwap.swapTable(spark, path, "corpusstats")(_ =>
        Seq((old.getAs[Long]("n_docs") + add.getAs[Long]("n_docs"),
            old.getAs[Long]("dl_sum") + add.getAs[Long]("dl_sum")))
          .toDF("n_docs", "dl_sum")
          .coalesce(1).write.parquet(s"$path/.corpusstats.compact"))
    } finally tf.unpersist() // checkpoint blocks; freed by the cleaner on GC otherwise
  }

  /**
   * Compact the stored index after append waves: each table rewrites to
   * one well-sized file set (postings/tokenstats back to one layout per
   * bucket, docstats to a parallelism-sized set) behind the crash-safe
   * double-rename swap (`live → .old`, `.compact → live` — a crash at
   * any point leaves a servable or recoverable copy, the
   * compactNearDupIndex discipline). Serving answers are unchanged —
   * spec-pinned equal to pre-compaction.
   *
   * Compaction also REPAIRS the append path's documented crash window:
   * appendToBm25Index writes the docstats replay-screen BEFORE postings,
   * so a crash between the two leaves docs registered but postings-less
   * (benign for scoring, but a replay of that batch no-ops and the docs
   * are lost). Orphans (dl > 0, no postings) are removed from docstats
   * and subtracted from corpusstats here, so re-appending the batch
   * lands it.
   */
  def compactBm25Index(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import graft.storage.IndexStore
    IndexStore.requireMeta(spark, path, Seq("buckets" -> IndexBuckets))
    // orphan detection runs against the PRE-compaction store: docs the
    // append crash window registered without landing their postings
    // (pre-swap snapshot, lineage truncated so the swaps below cannot
    // invalidate or recompute it against the post-swap store)
    val postedIds = spark.read.parquet(s"$path/postings")
      .select(col("doc_id")).distinct()
    val orphanIds = spark.read.parquet(s"$path/docstats")
      .filter(col("dl") > 0)
      .join(postedIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id")).localCheckpoint()
    // the physical half of [[deleteFromBm25Index]]: tombstoned docs purge
    // inside the rewrites this compaction performs anyway — and because
    // the two stats tables rebuild from the purged base tables below,
    // post-compaction scores equal a FRESH REBUILD over the surviving
    // corpus (df/avgdl/n_docs all shed the deleted docs here, never
    // before — the documented stale-stats-until-compaction semantics)
    val dead = deletedDocs(spark, path).map(_.localCheckpoint())
    def purge(df: DataFrame): DataFrame =
      dead.fold(df)(d => df.join(broadcast(d), Seq("doc_id"), "left_anti"))
    // the two base-table rewrites are independent (disjoint swaps; their
    // inputs are checkpointed above) — concurrent; the stats rebuild must
    // FOLLOW both (it reads the post-swap base tables), and the tombstone
    // drop stays last (crash discipline)
    IndexStore.inParallel(Seq(
      () => IndexStore.compactBucketed(spark, path, "postings", purge),
      () => IndexStore.compactFlat(spark, path, "docstats",
        df => purge(df).join(orphanIds, Seq("doc_id"), "left_anti"))))
    rebuildStats(spark, path)
    dead.foreach(_ => IndexStore.dropDeletes(spark, path, "deleted_docs"))
  }

  /** Rebuild the two derived stats tables from their (purged/repaired)
    * base tables, behind the crash-safe swap. The invariants are
    * tokenstats ≡ aggregate(postings) and corpusstats ≡
    * aggregate(docstats) — rebuilding (instead of compacting the stored
    * copies) heals BOTH append crash windows (tokenstats merged but
    * postings never landed; postings landed but corpusstats write never
    * ran) and is what makes a tombstone purge shift every score exactly
    * as a fresh rebuild would. Cost is one aggregate over each base
    * table — the same magnitude as the rewrites compaction already pays. */
  private def rebuildStats(spark: org.apache.spark.sql.SparkSession, path: String): Unit =
    // the two derived tables rebuild from DIFFERENT base tables behind
    // their own swaps — concurrent (§2.6)
    graft.storage.IndexStore.inParallel(Seq(
      () => graft.storage.IndexStore.replaceBucketed(spark, path, "tokenstats",
        spark.read.parquet(s"$path/postings")
          .groupBy(col("token"), col("bucket"))
          .agg(count(lit(1)).cast("long").as("df"))),
      () => graft.storage.AtomicSwap.swapTable(spark, path, "corpusstats")(_ =>
        spark.read.parquet(s"$path/docstats")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            coalesce(sum(col("dl")), lit(0L)).as("dl_sum"))
          .coalesce(1).write.parquet(s"$path/.corpusstats.compact"))))

  /** Purge `ids`' rows from the two base tables and restore the stats
    * invariants — the revival path's physical delete (store-sized
    * rewrites, targeted in scope: only `ids` purge). */
  private def purgeDocs(spark: org.apache.spark.sql.SparkSession, path: String,
                        ids: DataFrame): Unit = {
    def purge(df: DataFrame): DataFrame =
      df.join(broadcast(ids), Seq("doc_id"), "left_anti")
    graft.storage.IndexStore.inParallel(Seq(
      () => graft.storage.IndexStore.compactBucketed(spark, path, "postings", purge),
      () => graft.storage.IndexStore.compactFlat(spark, path, "docstats", purge)))
    rebuildStats(spark, path)
  }

  /** Pending doc tombstones, or None when none exist (the cheap common
    * case — serving plans stay anti-join-free). */
  private def deletedDocs(spark: org.apache.spark.sql.SparkSession,
                          path: String): Option[DataFrame] =
    graft.storage.IndexStore.pendingDeletes(spark, path, "deleted_docs", Seq("doc_id"))

  /**
   * Takedown / decontamination removal from the stored BM25 index — the
   * retrieval dual of [[graft.operators.Dedup.deleteFromNearDupIndex]]:
   * a removed document must stop being SERVED immediately.
   * Tombstone-append-only (no table rewrite, no swap window — safe
   * against a live store): [[bm25StoredTopK]] screens its candidate
   * postings against `deleted_docs/` (broadcast anti-join, delete-rate-
   * sized; ranks recompute over the survivors), while the RANKING STATS
   * (df, n_docs, avgdl) keep their build-time values until the next
   * [[compactBm25Index]] purges the rows and rebuilds the stats tables —
   * the standard search-engine takedown semantics (immediate result
   * removal, deferred stats refresh). Idempotent; a later
   * re-registration of the id is [[appendToBm25Index]]'s revival path.
   */
  def deleteFromBm25Index(spark: org.apache.spark.sql.SparkSession, path: String,
                          docIds: DataFrame): Unit = {
    graft.storage.IndexStore.requireMeta(spark, path, Seq("buckets" -> IndexBuckets))
    graft.storage.IndexStore.appendDeletes(spark, path, "deleted_docs",
      docIds, registry = "docstats", Seq("doc_id"))
  }

  def bm25StoredTopK(spark: org.apache.spark.sql.SparkSession, path: String,
                     queries: DataFrame, k: Int,
                     k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    graft.storage.IndexStore.requireMeta(spark, path, Seq("buckets" -> IndexBuckets))
    val qterms = queries
      .select(col("query_id"), explode(array_distinct(col("terms"))).as("token"))
    val qtb = qterms.select(col("token")).distinct()
      .withColumn("bucket", tokenBucket(col("token")))
    val buckets = qtb.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    def pruned(table: String): DataFrame =
      spark.read.parquet(s"$path/$table")
        .filter(col("bucket").isin(buckets: _*))
        .join(broadcast(qtb.select(col("bucket"), col("token"))),
          Seq("bucket", "token"))
    // pending delete tombstones screen the candidate postings (broadcast
    // anti-join, delete-rate-sized) — a deleted doc stops ranking the
    // instant [[deleteFromBm25Index]] lands, before any purge runs, and
    // ranks recompute over the survivors; absent tombstones leave the
    // plan untouched. df/avgdl stay build-time until compaction (doc'd).
    val tf0 = pruned("postings").select("doc_id", "token", "tf", "dl")
    val tf = deletedDocs(spark, path).fold(tf0)(d =>
      tf0.join(broadcast(d), Seq("doc_id"), "left_anti"))
    val dfreq = pruned("tokenstats").select("token", "df")
    val stats = spark.read.parquet(s"$path/corpusstats")
      .select(col("n_docs"),
        (col("dl_sum").cast("double") / col("n_docs")).as("avgdl"))
    scoreAndRank(tf, dfreq, stats, qterms, k, k1, b)
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
    require(rrfK >= 1, s"rrfK must be >= 1, got $rrfK")
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
