package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Text-analysis operators for LLM training-data pipelines, over a
 * `documents`-shaped frame (doc_id, text, lang, source, n_chars).
 *
 * Pure column expressions — every operator is a narrow projection over one
 * scan, fully inside whole-stage codegen, trivially 100 TB-safe.
 */
object TextOps {

  private[operators] def words(text: Column): Column = split(lower(text), " ")

  /** Content-hash residue from a 15-hex-char slice of the text's md5
    * (< 2^60: ANSI-safe, reproducible in any engine). `offset` selects
    * WHICH slice, so independent decisions (shard assignment at 1,
    * sample keep at 17) draw from disjoint hash bits — a shared residue
    * would correlate them whenever one modulus divides the other. */
  private def contentHashBucket(text: Column, mod: Long, offset: Int = 1): Column =
    pmod(conv(substring(md5(text.cast("binary")), offset, 15), 16, 10).cast("long"), lit(mod))

  /** Tiny high-frequency function-word list used by the quality and
    * language-id heuristics (deterministic, oracle-reproducible). */
  val StopWords: Seq[String] = Seq("the", "a", "of", "to", "and", "in", "is", "it")

  /** Count of space-delimited tokens that exactly equal one of `members` —
    * the codegen'd replacement for `size(filter(ws, _.isin(members)))`:
    * higher-order-function lambdas evaluate INTERPRETED (20-50x slower
    * until the JIT warms), while `regexp_count` runs inside whole-stage
    * codegen. Zero-width lookarounds anchor each token at the surrounding
    * spaces without consuming them, so adjacent marker words both count. */
  private def tokenMatchCount(text: Column, members: Seq[String]): Column =
    regexp_count(concat(lit(" "), lower(text), lit(" ")),
      lit(members.map(java.util.regex.Pattern.quote).mkString("(?<= )(", "|", ")(?= )")))

  /**
   * Per-document quality/statistics row: word count, char count, average
   * word length, type-token ratio, stopword ratio, punctuation count, and a
   * composite quality score in [0,1] (length-normalized TTR minus stopword
   * excess — a stand-in for a trained quality classifier, same plumbing).
   */
  def textStats(docs: DataFrame): DataFrame = {
    val ws = words(col("text"))
    val nWords = size(ws)
    val nChars = length(col("text"))
    val nStop = tokenMatchCount(col("text"), StopWords)
    val nPunct = nChars - length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""))
    val distinctWords = size(array_distinct(ws))
    docs.select(
      col("doc_id"),
      nWords.cast("long").as("n_words"),
      nChars.cast("long").as("n_chars_calc"),
      round((nChars - (nWords - lit(1))).cast("double") / nWords, 6).as("avg_word_len"),
      round(distinctWords.cast("double") / nWords, 6).as("ttr"),
      round(nStop.cast("double") / nWords, 6).as("stopword_ratio"),
      nPunct.cast("long").as("n_punct"))
  }

  /**
   * Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
   * Models", appendix A1.1 — adapted from character fractions to
   * occurrence fractions): the share of word-BIGRAM occurrences taken by
   * the single most frequent bigram, and the share of word-5-GRAM
   * occurrences that are duplicates (appear more than once). Documents
   * over either threshold flag as repetitive — the standard "remove
   * boilerplate/degenerate text" pre-training filter.
   *
   * Scale shape: one explode → count → per-doc aggregate pipeline per n;
   * both shuffles key on (doc_id, gram) — cardinality grows with the
   * corpus, so partitions stay small as executors scale. No driver-side
   * work, no UDFs; gram windows come from the codegen'd
   * [[graft.plans.WordShingles]] loop (NOT the interpreted
   * transform/concat_ws formulation it exists to replace).
   */
  def repetitionStats(docs: DataFrame,
                      topBigramThreshold: Double = 0.20,
                      dup5gramThreshold: Double = 0.15): DataFrame = {
    def gramCounts(n: Int): DataFrame =
      docs.select(col("doc_id"),
        explode(graft.plans.WordShingles(split(col("text"), " "), n)).as("g"))
        .groupBy("doc_id", "g").count()
    val bg = gramCounts(2).groupBy("doc_id")
      .agg(max("count").as("mx"), sum("count").as("tot2"))
    val g5 = gramCounts(5).groupBy("doc_id")
      .agg(sum(when(col("count") > 1, col("count")).otherwise(0L)).as("dup"),
        sum("count").as("tot5"))
    docs.select("doc_id")
      .join(bg, Seq("doc_id"), "left")
      .join(g5, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("tot2"), lit(0L)).as("n_bigrams"),
        round(coalesce(col("mx").cast("double") / col("tot2"), lit(0.0)), 6)
          .as("top_bigram_frac"),
        round(coalesce(col("dup").cast("double") / col("tot5"), lit(0.0)), 6)
          .as("dup_5gram_frac"))
      .withColumn("flag_repetitive",
        col("top_bigram_frac") > topBigramThreshold ||
          col("dup_5gram_frac") > dup5gramThreshold)
  }

  /**
   * Composite quality verdict — the Gopher-rule filter stack (Rae et al.
   * 2021 A1.1) as ONE pass/fail row per document with the failed rules
   * spelled out: word-count bounds, mean-word-length bounds, minimum
   * stopword ratio, minimum lexical diversity (type-token ratio), and the
   * [[repetitionStats]] repetitive flag. `fail_reasons` is a comma-joined
   * list in rule order (empty ⇒ `passed`) — what a curation pipeline logs
   * so every dropped document is attributable to a rule. Rules are
   * INDEPENDENT signals: a 2-word doc trips repetition too (its single
   * bigram is 100% of occurrences) — the word-count bound, not a gate on
   * the other rules, is what drops tiny documents.
   *
   * Composition proof for [[textStats]] + [[repetitionStats]]: one
   * doc_id-keyed join of two narrow aggregates; the verdict itself is a
   * codegen'd projection (`concat_ws` skips the null arms of unfired
   * `when`s — no array materialization, no UDF).
   */
  def qualityFilter(docs: DataFrame,
                    minWords: Int = 25, maxWords: Int = 10000,
                    minAvgWordLen: Double = 3.0, maxAvgWordLen: Double = 10.0,
                    minStopwordRatio: Double = 0.03,
                    minTtr: Double = 0.35): DataFrame = {
    val verdict = concat_ws(",",
      when(col("n_words") < minWords || col("n_words") > maxWords, lit("word_count")),
      when(col("avg_word_len") < minAvgWordLen || col("avg_word_len") > maxAvgWordLen,
        lit("word_length")),
      when(col("stopword_ratio") < minStopwordRatio, lit("stopwords")),
      when(col("ttr") < minTtr, lit("diversity")),
      when(col("flag_repetitive"), lit("repetition")))
    textStats(docs)
      .join(repetitionStats(docs).select("doc_id", "flag_repetitive"), Seq("doc_id"))
      .select(col("doc_id"), verdict.as("fail_reasons"))
      .withColumn("passed", col("fail_reasons") === "")
  }

  /**
   * Corpus vocabulary: the top-N tokens by DOCUMENT frequency (ties broken
   * lexicographically), with total term frequency alongside — the
   * stopword-list / tokenizer-vocab bootstrap over a raw corpus.
   *
   * Scale shape: explode → (doc_id, token) count → token-keyed aggregate,
   * both with map-side partial combine, then `orderBy.limit(topN)` — which
   * Spark plans as TakeOrderedAndProject (per-partition top-N heaps merged
   * on the driver, nothing close to a global sort). The rank window runs
   * AFTER the limit, over ≤ topN driver-sized rows.
   */
  def vocabulary(docs: DataFrame, topN: Int = 100): DataFrame = {
    val perDoc = docs
      .select(col("doc_id"), explode(words(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    perDoc.groupBy(col("token"))
      .agg(count(lit(1)).as("doc_freq"), sum(col("tf")).as("term_freq"))
      .orderBy(col("doc_freq").desc, col("token").asc)
      .limit(topN)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("doc_freq").desc, col("token").asc))
          .cast("long"))
  }

  /**
   * Vocabulary coverage — the fraction of corpus token OCCURRENCES the
   * top-N token types (by occurrence count) cover: the audit that sizes
   * a tokenizer vocab (coverage curves flatten where the long tail
   * starts). One row: top-N size actually available, covered and total
   * occurrence counts, coverage ratio.
   *
   * Scale shape: one token-keyed aggregate into a TakeOrderedAndProject
   * top-N (per-partition heaps), plus a shuffle-free one-scan aggregate
   * for the total. All counts are exact longs.
   */
  def vocabCoverage(docs: DataFrame, topN: Int = 100): DataFrame = {
    // ranked by OCCURRENCE count (term_freq) — the tokenizer-sizing
    // question is "how much mass do N types cover", not document reach
    val top = docs.select(explode(words(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("term_freq"))
      .orderBy(col("term_freq").desc, col("token").asc)
      .limit(topN)
      .agg(count(lit(1)).cast("long").as("top_n"),
        sum(col("term_freq")).cast("long").as("covered_tf"))
    // the denominator is a shuffle-free one-scan aggregate: total token
    // occurrences = Σ per-doc word counts
    val total = docs.agg(sum(size(words(col("text")))).cast("long").as("total_tf"))
    top.crossJoin(broadcast(total))
      .select(col("top_n"), col("covered_tf"), col("total_tf"),
        round(col("covered_tf").cast("double") / col("total_tf"), 6).as("coverage"))
  }

  /**
   * Per-document TF-IDF top-k terms — keyword extraction over a raw
   * corpus (tfidf = tf · ln(N/df)): the classic distinctive-term feature
   * for topic tagging, near-dup triage, and quality heuristics. The
   * ranking (and emitted score) uses the ROUNDED tfidf so cross-engine
   * ordering can't hinge on a last-ulp `ln` difference; exact rounded
   * ties break lexicographically.
   *
   * Scale shape: the document count joins in as a broadcast 1-row frame
   * (no eager driver action); the doc-frequency join shuffles on token,
   * the top-k window on doc_id — both corpus-keyed, no global sort, no
   * driver state.
   */
  def tfidfTerms(docs: DataFrame, topK: Int = 5): DataFrame = {
    val perDoc = docs.select(col("doc_id"), explode(words(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = perDoc.groupBy(col("token")).agg(count(lit(1)).as("doc_freq"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("token").asc)
    perDoc.join(dfreq, Seq("token")).crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("doc_freq")), 6))
      .withColumn("term_rank", row_number().over(w).cast("long"))
      .filter(col("term_rank") <= topK)
      .select("doc_id", "token", "tf", "doc_freq", "tfidf", "term_rank")
  }

  /**
   * BPE-ish token count: word pieces = runs of letters, runs of digits, or
   * single other non-space characters — the classic pre-tokenizer split.
   */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
        .cast("long").as("n_tokens"))

  /**
   * Language-ID heuristic: score = stopword hit ratio against per-language
   * marker lists; predict the argmax language, 'und' when every score is 0.
   * (Real profiles would be char-n-gram frequency tables; the scoring
   * pipeline — explode, score, argmax — is the operator under test.)
   */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "is"),
    "de" -> Seq("der", "die", "und", "nicht"),
    "es" -> Seq("el", "la", "que", "de"),
    "fr" -> Seq("le", "la", "et", "les"),
    "zh" -> Seq("de", "le", "shi", "bu"))

  /** Per-language marker-hit-ratio score expression (rounded to 6, the
    * oracle's form). */
  private def langScore(markers: Seq[String]): Column =
    round(tokenMatchCount(col("text"), markers).cast("double") / size(words(col("text"))), 6)

  /** Argmax language with the deterministic first-listed tiebreak (the
    * CASE chain reproduced verbatim in the DuckDB oracles) — `score`
    * supplies each language's score expression, so [[langId]] (named
    * columns) and [[corpusReport]] (inline) share ONE pick definition. */
  private def argmaxLang(score: String => Column): Column = {
    val maxScore = greatest(LangMarkers.map { case (l, _) => score(l) }: _*)
    val pick = LangMarkers.foldRight(lit("und"): Column) { case ((l, _), els) =>
      when(score(l) === maxScore, lit(l)).otherwise(els)
    }
    when(maxScore > 0, pick).otherwise(lit("und"))
  }

  def langId(docs: DataFrame): DataFrame = {
    val scored = docs.select(
      (Seq(col("doc_id"), col("lang").as("lang_actual")) ++
        LangMarkers.map { case (l, ms) => langScore(ms).as(s"score_$l") }): _*)
    scored.withColumn("lang_pred", argmaxLang(l => col(s"score_$l")))
  }

  /**
   * Document fingerprints: full-content md5 plus the minimum 5-word-shingle
   * md5 (1-permutation MinHash — a content-defined sample that is stable
   * under local edits; the building block of winnowing).
   *
   * Shape: explode + min-aggregate rather than `array_min(transform(_, md5))`
   * — md5 inside a lambda evaluates interpreted; as a top-level expression
   * over the exploded frame it stays in whole-stage codegen, and the
   * min-agg gets map-side partial combine.
   */
  def fingerprints(docs: DataFrame, shingleK: Int = 5): DataFrame = {
    val minShingle = Dedup.shingleFrame(docs, shingleK)
      .groupBy(col("doc_id"))
      .agg(min(md5(col("shingle").cast("binary"))).as("min_shingle_md5"))
    docs.select(col("doc_id"), md5(col("text").cast("binary")).as("content_md5"))
      .join(minShingle, Seq("doc_id"), "left")
  }

  /**
   * End-to-end training-shard builder — the composition a real pipeline
   * runs nightly, as ONE declarative plan:
   *
   *   quality filter (length + lexical diversity) ∧ language filter
   *   → exact-dedup survivors (min doc_id per identical text)
   *   → deterministic shard assignment (content hash mod nShards)
   *   → per-shard document/token budgets.
   *
   * Every stage reuses the standalone operators ([[langId]], [[textStats]],
   * [[Dedup.exactGroups]], [[tokenCounts]]), so this is also the
   * integration proof that they compose. Scale shape: three narrow
   * projections joined on doc_id (co-partitioned after the first shuffle),
   * one dedup-survivor semi-join keyed by content hash, and a final
   * nShards-group aggregation with map-side partials.
   */
  def corpusShards(docs: DataFrame, nShards: Int = 8, lang: String = "en",
                   minWords: Int = 30, minTtr: Double = 0.5): DataFrame = {
    val kept = langId(docs).filter(col("lang_pred") === lang).select("doc_id")
      .join(textStats(docs).filter(col("n_words") >= minWords && col("ttr") >= minTtr)
        .select("doc_id", "n_words"), Seq("doc_id"))
    // exact-dedup survivorship: only the min doc_id of each identical-text
    // group contributes to a shard
    val survivors = docs
      .join(Dedup.exactGroups(docs).select(col("keep_id").as("doc_id")), Seq("doc_id"), "left_semi")
    val sharded = survivors
      .join(kept, Seq("doc_id"), "left_semi")
      .join(tokenCounts(docs), Seq("doc_id"))
      .withColumn("shard", contentHashBucket(col("text"), nShards.toLong))
    sharded.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("min_doc_id"), max(col("doc_id")).as("max_doc_id"))
  }

  /**
   * [[corpusShards]] with NEAR-dup survivorship layered on top: the
   * MinHash-LSH pair set completes to connected components and only each
   * component's min doc_id enters the pipeline. Exact-dedup survivorship
   * still applies downstream — texts shorter than the shingle window
   * produce no pairs, so their identical copies are only caught by the
   * exact hash. One more left-anti semi-join on doc_id in front of the
   * shared plan; the LSH stages are the bucketed ones [[Dedup]] proves.
   */
  def corpusShardsNearDup(docs: DataFrame, nShards: Int = 8, lang: String = "en",
                          minWords: Int = 30, minTtr: Double = 0.5,
                          shingleK: Int = 3, threshold: Double = 0.8): DataFrame = {
    val losers = Dedup.nearDupClusters(Dedup.nearDupPairs(docs, shingleK, threshold))
      .filter(col("doc_id") =!= col("cluster")).select("doc_id")
    corpusShards(docs.join(losers, Seq("doc_id"), "left_anti"),
      nShards, lang, minWords, minTtr)
  }

  /**
   * Deterministic stratified sampling — corpus curation's downsample
   * step. The keep decision comes from the document's own content hash
   * (not an RNG), so the sample is reproducible across runs, engines and
   * partitionings, and duplicate texts share a fate — composable with
   * dedup. Stratified: each `byCol` stratum carries its own rate; strata
   * missing from the map fall back to `defaultRate`.
   *
   * Scale shape: one narrow projection + filter, rate map folded into the
   * plan as literals — no shuffle, no sort, no sampler state.
   */
  def deterministicSample(docs: DataFrame, rates: Map[String, Double],
                          byCol: String = "lang", defaultRate: Double = 0.0,
                          hashMod: Int = 10000): DataFrame = {
    require(hashMod > 0 && (rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be probabilities and hashMod positive")
    val bucket = contentHashBucket(col("text"), hashMod.toLong, offset = 17)
    // sorted fold → a deterministic when-chain regardless of map order
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (k, p)) => when(col(byCol) === k, lit(p)).otherwise(acc)
    }
    docs.withColumn("sample_bucket", bucket)
      .filter(col("sample_bucket") < rate * hashMod)
  }

  /**
   * Seeded training-order shuffle → sharded reader order. Every epoch a
   * training run needs the corpus in a fresh pseudo-random order,
   * materialized as shards each reader consumes sequentially. The
   * shuffle key is md5(seed ':' doc_id) — id-keyed (identical texts
   * still move independently), reproducible from the seed alone, and a
   * new seed is a full reshuffle. Shard = high hash bits mod nShards;
   * `pos_in_shard` = rank of the key within the shard.
   *
   * Scale shape: one hash-partitioned exchange on shard + a per-shard
   * sort — there is NO global row-number (a global order would serialize
   * through one partition at 100 TB); global order is recovered as
   * (round-robin over shards at equal pos), which is how multi-reader
   * training loaders consume shards anyway.
   */
  def corpusShuffle(docs: DataFrame, seed: Int = 0, nShards: Int = 8): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val key = md5(concat(lit(s"$seed:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("shuffle_key"), col("doc_id"))
    docs.select(col("doc_id"), key.as("shuffle_key"))
      .withColumn("shard",
        pmod(conv(substring(col("shuffle_key"), 1, 15), 16, 10).cast("long"),
          lit(nShards.toLong)))
      .withColumn("pos_in_shard", row_number().over(w).cast("long"))
  }

  /**
   * Fixed-size token chunking with overlap — the tokenize-and-pack step
   * every training pipeline runs before batching. Chunk i covers tokens
   * [i·stride, i·stride + chunkTokens) with stride = chunkTokens −
   * overlap; the last chunk is short rather than padded. One scan →
   * codegen'd `explode(sequence)` + `slice` — fan-out bounded by
   * tokens/stride, no shuffle, no UDF (the same plan shape as
   * frame_sample's byte windows, over tokens instead).
   *
   * `includeText=true` additionally emits the chunk's text (`chunk`) —
   * what a training pipeline actually packs; the default keeps the
   * verification-friendly narrow schema.
   */
  def chunkDocs(docs: DataFrame, chunkTokens: Int = 128, overlap: Int = 32,
                includeText: Boolean = false): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens (got $overlap / $chunkTokens)")
    val stride = chunkTokens - overlap
    val chunk = array_join(slice(col("toks"), col("start") + 1, lit(chunkTokens)), " ")
    val base = Seq(
      col("doc_id"),
      (col("start") / stride).cast("long").as("chunk_idx"),
      least(lit(chunkTokens), col("n") - col("start")).cast("long").as("chunk_tokens"),
      md5(chunk.cast("binary")).as("chunk_md5"))
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0), col("n") - 1, lit(stride))).as("start"))
      .select((if (includeText) base :+ chunk.as("chunk") else base): _*)
  }

  /**
   * Benchmark decontamination — flag corpus documents sharing any k-token
   * shingle with an evaluation set (the standard n-gram-overlap test-set
   * leak check). Returns one row per CONTAMINATED document with its
   * distinct shared-shingle count; clean documents are absent.
   *
   * Scale shape: the benchmark is eval-set-sized (thousands of docs), so
   * its distinct shingles BROADCAST; the corpus-side check is a map-side
   * hash join over the exploded shingle frame — the 100 TB corpus is
   * scanned once and never shuffled on content.
   */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, shingleK: Int = 8): DataFrame = {
    val bench = Dedup.shingleFrame(benchmark, shingleK).select(col("shingle")).distinct()
    Dedup.shingleFrame(docs, shingleK)
      .join(broadcast(bench), Seq("shingle"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
  }

  /**
   * The eval-set-side view of [[decontaminate]]: per BENCHMARK document,
   * how many OTHER corpus documents share at least one `shingleK`-gram
   * with it and how many of its distinct shingles are compromised — the
   * per-item leak report an eval-set owner acts on (drop the item,
   * re-split, or blocklist the corpus docs). Self-matches are excluded:
   * an eval item that also sits in the corpus (as here, where the
   * benchmark is a corpus slice) should not report itself as leakage.
   *
   * Same scale shape as [[decontaminate]]: the benchmark's (doc, shingle)
   * frame is the broadcast side, the corpus shingle stream passes it
   * once, and every aggregate after the join is bench-sized.
   */
  def decontaminationReport(docs: DataFrame, benchmark: DataFrame,
                            shingleK: Int = 8): DataFrame = {
    val bench = Dedup.shingleFrame(benchmark, shingleK)
      .select(col("doc_id").as("bench_doc_id"), col("shingle"))
    val totals = bench.groupBy(col("bench_doc_id"))
      .agg(count(lit(1)).as("n_shingles"))
    val hits = Dedup.shingleFrame(docs, shingleK)
      .join(broadcast(bench), Seq("shingle"))
      .filter(col("doc_id") =!= col("bench_doc_id"))
      .groupBy(col("bench_doc_id"))
      .agg(countDistinct(col("doc_id")).as("n_corpus_docs"),
        countDistinct(col("shingle")).as("n_shared_shingles"))
    totals.join(hits, Seq("bench_doc_id"), "left")
      .na.fill(0L, Seq("n_corpus_docs", "n_shared_shingles"))
      .select(col("bench_doc_id"), col("n_shingles"),
        col("n_corpus_docs"), col("n_shared_shingles"),
        round(col("n_shared_shingles").cast("double") / col("n_shingles"), 6)
          .as("leak_ratio"))
  }

  /**
   * Split-assignment audit for [[stratifiedSplit]]: per (split, source),
   * document and token mass — the frame a release checklist compares
   * against the requested fractions (hash-uniformity makes each source
   * land near them; this is the evidence). One projection + one
   * |splits|×|sources|-group aggregate.
   */
  def splitReport(docs: DataFrame,
                  fractions: Seq[(String, Double)] = Seq(
                    "train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
                  hashMod: Int = 10000): DataFrame =
    stratifiedSplit(docs, fractions, hashMod)
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(words(col("text")))).cast("long").as("n_tokens"))

  /**
   * Cross-split near-dup leakage audit: the [[stratifiedSplit]] hash
   * guarantees EXACT duplicates share a fate (same text → same residue),
   * but NEAR-duplicates can land in different splits — train/test
   * contamination no hash split can prevent. This emits every verified
   * near-dup pair that straddles a split boundary, the frame an eval
   * owner either drops from test or collapses before splitting.
   *
   * Scale shape: the pair set is [[Dedup.nearDupPairs]]'s (banded
   * equi-join, estimate-pruned, exact-verified — result-sized); the two
   * split lookups join that result-sized frame against the assignment
   * projection, never corpus × corpus.
   */
  def splitLeakage(docs: DataFrame,
                   fractions: Seq[(String, Double)] = Seq(
                     "train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
                   shingleK: Int = 3, threshold: Double = 0.8,
                   hashMod: Int = 10000): DataFrame = {
    val sp = stratifiedSplit(docs, fractions, hashMod).select(col("doc_id"), col("split"))
    Dedup.nearDupPairs(docs, shingleK, threshold)
      .join(sp.select(col("doc_id").as("doc_a"), col("split").as("split_a")), Seq("doc_a"))
      .join(sp.select(col("doc_id").as("doc_b"), col("split").as("split_b")), Seq("doc_b"))
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /**
   * Substring-level duplicate-SPAN detection (the span-dedup idea of Lee
   * et al. 2022, "Deduplicating Training Data Makes Language Models
   * Better", arXiv:2107.06499 — their suffix-array ExactSubstr finds
   * repeated character spans; this is the token-shingle formulation): a
   * token position is duplicated when the `gramK`-gram starting there
   * occurs >= `minCount` times across the CORPUS (within-doc repeats
   * count too), and runs of duplicated positions merge into maximal
   * spans — the unit a span-level dedup would cut out, rather than
   * dropping whole documents.
   *
   * Shape: one shingle projection (codegen'd [[graft.plans.WordShingles]])
   * → ONE shuffle on the gram for the occurrence count (a count window,
   * not a groupBy+self-join — the positions frame moves once) → one
   * (doc_id)-keyed window pair for the classic interval merge (running
   * max of span ends decides continuity, a prefix sum numbers the
   * groups). Gram cardinality grows with the corpus, so partitions stay
   * small at any scale; the doc_id window is bounded by tokens/doc.
   *
   * Output: (doc_id, span_start, span_end, span_tokens) — token indices,
   * end exclusive — one row per maximal duplicated span.
   */
  def duplicateSpans(docs: DataFrame, gramK: Int = 8, minCount: Long = 2,
                     skewSafe: Boolean = false): DataFrame = {
    require(gramK >= 1 && minCount >= 2,
      s"need gramK >= 1 and minCount >= 2, got $gramK / $minCount")
    val gramPos = docs
      .select(col("doc_id"),
        posexplode(graft.plans.WordShingles(words(col("text")), gramK)))
    // Two equivalent plans (output-identical, both oracled):
    //  - window (default): ONE gram shuffle, positions move once — the
    //    right cost while no single gram dominates a partition;
    //  - skewSafe: per-gram counts via a map-side-combined AGGREGATE
    //    (hot grams collapse to one partial per input partition —
    //    skew-immune) filtered to duplicated grams BEFORE a sort-merge
    //    join, which AQE's skew-split can further divide. A corpus with
    //    boilerplate mega-grams (licenses, headers — guaranteed at
    //    100 TB) pays one extra positions exchange to avoid the window's
    //    un-splittable hot partition.
    val pos =
      if (skewSafe) {
        val dupGrams = gramPos.groupBy(col("col"))
          .agg(count(lit(1)).as("occ"))
          .filter(col("occ") >= minCount)
          .select(col("col"))
        gramPos.join(dupGrams, Seq("col")).select(col("doc_id"), col("pos"))
      } else
        gramPos
          .withColumn("occ", count(lit(1)).over(Window.partitionBy(col("col"))))
          .filter(col("occ") >= minCount)
          .select(col("doc_id"), col("pos"))
    mergeSpans(pos, gramK)
      .withColumn("span_tokens", col("span_end") - col("span_start"))
  }

  /** Classic interval merge over gram start positions: each pos covers
    * [pos, pos+gramK); a running max of span ends (over preceding rows)
    * decides continuity, a prefix sum numbers the runs. Per-doc window
    * pair, bounded by tokens/doc. In: (doc_id, pos). Out: one row per
    * maximal span — (doc_id, span_start, span_end), end exclusive. */
  private def mergeSpans(pos: DataFrame, gramK: Int): DataFrame = {
    val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    pos
      .withColumn("prev_end", max(col("pos") + gramK).over(wPrev))
      .withColumn("is_new",
        when(col("prev_end").isNull || col("pos") > col("prev_end"), 1L).otherwise(0L))
      .withColumn("grp", sum(col("is_new")).over(wRun))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + gramK).cast("long").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"))
  }

  /**
   * The CUT step completing [[duplicateSpans]] — span-level dedup
   * accounting with the first-occurrence-wins policy of Lee et al.'s
   * ExactSubstr dedup: for every duplicated gram the occurrence with the
   * lowest (doc_id, pos) survives; every LOSING occurrence's span is cut.
   * Overlapping loser spans merge before counting, so a token is never
   * cut twice. Emits one row per document (clean docs included):
   * (doc_id, n_tokens, n_spans, cut_tokens, kept_tokens).
   *
   * Same scale shape as [[duplicateSpans]] plus a row_number on the gram
   * partition (the winner election) and a broadcast-sized per-doc join.
   */
  /** Losing gram occurrences — every occurrence of a duplicated gram
    * except the global (doc_id, pos)-first. Window form (default): one
    * gram shuffle, rows move once. skewSafe form: the winner election
    * becomes `min(struct(doc_id, pos))` inside a map-side-combined
    * aggregate (identical ordering — struct comparison is
    * lexicographic), joined back with AQE skew-split available — the
    * same boilerplate-mega-gram rationale as [[duplicateSpans]]. */
  private def loserPositions(docs: DataFrame, gramK: Int, minCount: Long,
                             skewSafe: Boolean): DataFrame = {
    val gramPos = docs.select(col("doc_id"),
      posexplode(graft.plans.WordShingles(words(col("text")), gramK)))
    if (skewSafe) {
      val winners = gramPos.groupBy(col("col"))
        .agg(count(lit(1)).as("occ"),
          min(struct(col("doc_id"), col("pos"))).as("w"))
        .filter(col("occ") >= minCount)
        .select(col("col"), col("w.doc_id").as("w_doc"), col("w.pos").as("w_pos"))
      gramPos.join(winners, Seq("col"))
        .filter(col("doc_id") =!= col("w_doc") || col("pos") =!= col("w_pos"))
        .select(col("doc_id"), col("pos"))
    } else {
      val wG = Window.partitionBy(col("col"))
      gramPos
        .withColumn("occ", count(lit(1)).over(wG))
        .withColumn("rn", row_number().over(wG.orderBy(col("doc_id"), col("pos"))))
        .filter(col("occ") >= minCount && col("rn") > 1)
        .select(col("doc_id"), col("pos"))
    }
  }

  def spanDedupStats(docs: DataFrame, gramK: Int = 8, minCount: Long = 2,
                     skewSafe: Boolean = false): DataFrame = {
    require(gramK >= 1 && minCount >= 2,
      s"need gramK >= 1 and minCount >= 2, got $gramK / $minCount")
    val losers = loserPositions(docs, gramK, minCount, skewSafe)
    val perDoc = mergeSpans(losers, gramK)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start")).as("cut_tokens"))
    docs.select(col("doc_id"), size(words(col("text"))).cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_spans", "cut_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("n_spans"), col("cut_tokens"),
        (col("n_tokens") - col("cut_tokens")).as("kept_tokens"))
  }

  /**
   * The APPLY step completing [[spanDedupStats]]: materialize each
   * document's deduplicated text — every token inside a merged loser
   * span removed, survivors rejoined in position order. Emits one row
   * per document (clean docs included): (doc_id, n_tokens, kept_tokens,
   * clean_md5) — the md5 rather than the body keeps the result frame
   * narrow (the piiScrub convention); real pipelines write the
   * reconstructed string column itself, same plan.
   *
   * Scale shape: the loser-span election is [[spanDedupStats]]'s single
   * gram-keyed shuffle; the cut is a doc_id-equi join of the token
   * stream against the (small, per-doc-bounded) span list with the
   * range predicate as the join residual — a token row never fans out
   * (left_anti). Reconstruction is one per-doc aggregate whose
   * array_sort is bounded by tokens/doc. A doc whose every token loses
   * (a full duplicate of an earlier doc) answers kept_tokens=0 with
   * md5('') — the cut-to-empty contract.
   */
  def spanDedupText(docs: DataFrame, gramK: Int = 8, minCount: Long = 2,
                    skewSafe: Boolean = false): DataFrame = {
    require(gramK >= 1 && minCount >= 2,
      s"need gramK >= 1 and minCount >= 2, got $gramK / $minCount")
    val spans = mergeSpans(loserPositions(docs, gramK, minCount, skewSafe), gramK)
    val toks = docs.select(col("doc_id"),
      posexplode(words(col("text"))).as(Seq("pos", "tok")))
    val kept = toks.join(spans,
      toks("doc_id") === spans("doc_id") &&
        col("pos") >= col("span_start") && col("pos") < col("span_end"),
      "left_anti")
    val rebuilt = kept.groupBy(col("doc_id")).agg(
      count(lit(1)).as("kept_tokens"),
      md5(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").cast("binary")).as("clean_md5"))
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e" // md5 of ""
    docs.select(col("doc_id"), size(words(col("text"))).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("clean_md5"), lit(emptyMd5)).as("clean_md5"))
  }

  /** Email / phone / digit-run redaction patterns (RE2- and Java-regex
    * compatible, so the DuckDB oracle applies the identical patterns). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\d{3}-\\d{3}-\\d{4}"
  val NumberPattern = "\\d+"

  /**
   * PII scrubbing — redact emails, phone-shaped numbers, then remaining
   * digit runs, with per-category counts. Applied in that order so the
   * digit-run pass cannot eat a phone number first; each count is taken
   * against the PREVIOUS stage's text, so categories never double-count.
   * Pure `regexp_replace`/`regexp_count` projection — one scan, codegen,
   * no shuffle; the real-pipeline extension point is swapping patterns
   * for a compiled recognizer list, same plan shape.
   */
  def piiScrub(docs: DataFrame): DataFrame = {
    val s1 = regexp_replace(col("text"), lit(EmailPattern), lit("<EMAIL>"))
    val s2 = regexp_replace(s1, lit(PhonePattern), lit("<PHONE>"))
    val s3 = regexp_replace(s2, lit(NumberPattern), lit("<NUM>"))
    docs.select(col("doc_id"),
      regexp_count(col("text"), lit(EmailPattern)).cast("long").as("n_email"),
      regexp_count(s1, lit(PhonePattern)).cast("long").as("n_phone"),
      regexp_count(s2, lit(NumberPattern)).cast("long").as("n_number"),
      md5(s3.cast("binary")).as("scrubbed_md5"))
  }

  /** Salted content-hash bucket: hashes `salt || text` so the residue is
    * statistically independent of every [[contentHashBucket]] slice —
    * required when a NEW hash decision (e.g. mixing) must not correlate
    * with sharding (offset 1) or sampling (offset 17) when composed. */
  private def saltedHashBucket(text: Column, salt: String, mod: Long): Column =
    pmod(conv(substring(md5(concat(lit(salt), text).cast("binary")), 1, 15), 16, 10)
      .cast("long"), lit(mod))

  /**
   * Corpus mixing — derive per-stratum sampling rates FROM the corpus so
   * the kept tokens hit a target mixture (the "domain reweighting" step of
   * training-data assembly: e.g. 30% web, 30% code, 40% books of a 10%
   * overall budget). For stratum s with observed `tokens_s`:
   *
   *   rate_s = min(1, share_s · budgetFrac · total_tokens / tokens_s)
   *
   * then documents keep deterministically via a salted content-hash bucket
   * (independent of the shard/sample hash slices, so mixing composes with
   * both). An over-demanded stratum clamps at 1.0 — it contributes all it
   * has, like real mixtures. Returns the per-stratum audit row (rate, kept
   * docs/tokens); strata absent from `targetShares` get share 0.
   *
   * Scale shape: the stratum→tokens aggregate is |strata|-sized (map-side
   * combine), so the rate table BROADCASTS back onto the one corpus scan;
   * the keep decision is a codegen'd projection — no corpus shuffle at all
   * before the final |strata|-group aggregate.
   */
  def mixCorpus(docs: DataFrame, targetShares: Map[String, Double],
                budgetFrac: Double, byCol: String = "source",
                hashMod: Int = 10000): DataFrame = {
    require(hashMod > 0 && budgetFrac > 0 && budgetFrac <= 1 &&
      targetShares.values.forall(v => v >= 0 && v <= 1),
      "budgetFrac and shares must be probabilities, hashMod positive")
    val base = docs.select(col("doc_id"), col(byCol).as("stratum"), col("text"),
      size(words(col("text"))).cast("long").as("n_tokens"))
    val perStratum = base.groupBy(col("stratum")).agg(sum(col("n_tokens")).as("src_tokens"))
    // total from the |strata|-row aggregate, NOT a third corpus scan
    val total = perStratum.agg(sum(col("src_tokens")).as("total_tokens"))
    // sorted fold → deterministic when-chain regardless of map order
    val share = targetShares.toSeq.sortBy(_._1).foldLeft(lit(0.0): Column) {
      case (acc, (k, v)) => when(col("stratum") === k, lit(v)).otherwise(acc)
    }
    val rates = perStratum.crossJoin(broadcast(total))
      .withColumn("rate",
        round(least(lit(1.0),
          share * lit(budgetFrac) * col("total_tokens") / col("src_tokens")), 6))
      .select(col("stratum"), col("rate"))
    base.join(broadcast(rates), Seq("stratum"))
      .filter(saltedHashBucket(col("text"), "mix:", hashMod.toLong) < col("rate") * hashMod)
      .groupBy(col("stratum"), col("rate"))
      .agg(count(lit(1)).as("n_docs_kept"), sum(col("n_tokens")).as("n_tokens_kept"))
  }

  /**
   * Per-source document cap — the "domain cap" step web-curation
   * pipelines run so one giant crawl domain cannot dominate the mixture
   * (RefinedWeb/FineWeb keep at most N pages per registered domain).
   * Selection is deterministic: rank = salted content-hash residue with
   * the doc_id tiebreak, so which documents survive depends on content,
   * not on arrival order or partitioning, and re-runs agree.
   *
   * Scale shape: a per-source count (|sources|-row aggregate) broadcasts
   * back onto the scan, and sources AT or UNDER the cap bypass ranking
   * entirely — no sort, no shuffle for the common case. Only over-cap
   * sources pay the rank window, and that window's partition key is the
   * source, so the work is per-source top-N, never a corpus-wide sort.
   * (A single source bigger than one executor's partition would need the
   * two-pass threshold refinement — count residues per coarse bucket,
   * pick the boundary bucket, rank only that bucket — the standard
   * distributed top-N-per-key escalation; at `cap` values that fit a
   * partition the window form is the right cost.)
   */
  def sourceCap(docs: DataFrame, cap: Int, hashMod: Long = 1000000000L): DataFrame = {
    require(cap > 0, "cap must be positive")
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("__src_n"))
    val withN = docs.join(broadcast(counts), Seq("source"))
    val under = withN.filter(col("__src_n") <= cap).drop("__src_n")
    val w = Window.partitionBy(col("source"))
      .orderBy(col("__rank_bucket").asc, col("doc_id").asc)
    val overCapped = withN.filter(col("__src_n") > cap).drop("__src_n")
      .withColumn("__rank_bucket", saltedHashBucket(col("text"), "cap:", hashMod))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rank_bucket", "__rn")
    under.unionByName(overCapped)
  }

  /**
   * Deterministic train/validation/test split: each document's split is
   * a pure function of its content — a salted hash residue landing in
   * one of the cumulative-fraction intervals — so the assignment is
   * stable under corpus growth, reordering, and re-partitioning, and a
   * document can never migrate between splits across pipeline runs (the
   * leakage property eval hygiene needs). The salt makes the decision
   * independent of the shard/sample/mix/cap hash decisions, so splitting
   * composes with all of them. Stratification is the hash-uniformity
   * kind: within any stratum (source, language) the residues are
   * uniform, so each stratum lands in every split at ~the requested
   * fractions without per-stratum bookkeeping — the only form that
   * needs no second pass at 100 TB.
   *
   * `fractions` is an ordered (name, fraction) list; fractions must be
   * positive and sum to 1 (to within 1e-9). One codegen'd projection,
   * zero shuffles.
   */
  def stratifiedSplit(docs: DataFrame,
                      fractions: Seq[(String, Double)] = Seq(
                        "train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
                      hashMod: Int = 10000): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0) &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must be positive and sum to 1")
    require(hashMod > 0, "hashMod must be positive")
    val bucket = saltedHashBucket(col("text"), "split:", hashMod.toLong)
    // cumulative upper boundaries; the LAST split takes everything left,
    // so rounding in `fraction * hashMod` can never drop a residue
    val bounds = fractions.init.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val assign = fractions.init.zip(bounds).foldRight(
      lit(fractions.last._1): Column) { case (((name, _), hi), acc) =>
      when(bucket < hi * hashMod, lit(name)).otherwise(acc)
    }
    docs.withColumn("split", assign)
  }

  /**
   * DSIR importance weights (Xie et al. 2023, "Data Selection for
   * Language Models via Importance Resampling", arXiv:2302.03169): score
   * every document by the log-likelihood ratio of a TARGET-domain
   * bag-of-hashed-ngrams model over the RAW-corpus model — the weight
   * DSIR then resamples by to tilt a web-scale corpus toward a target
   * domain. Features are the paper's: unigrams + bigrams, hashed into
   * `buckets` buckets (10k in the paper; the hash is the salted
   * md5-residue, engine-reproducible); both models are add-1-smoothed
   * bucket multinomials; a document's weight is
   * Σ_feat [ln p_target(b(feat)) − ln p_raw(b(feat))].
   *
   * Determinism: the per-BUCKET log term rounds to integer micro-nats in
   * the `buckets`-row model frame, so per-doc sums are integer additions —
   * no float-order dependence under AQE or re-partitioning.
   *
   * Scale shape: one feature projection (codegen'd shingles) feeding one
   * bucket-keyed aggregate (`buckets` rows — map-side combined), then the
   * tiny model frame broadcast-joins back onto the feature stream for a
   * doc_id-keyed sum. The corpus never shuffles on content; the only
   * wide exchange is the final doc_id aggregate.
   */
  def dsirWeights(docs: DataFrame, isTarget: Column, buckets: Int = 256): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val feats = docs
      .select(col("doc_id"), isTarget.as("tgt"), words(col("text")).as("ws"))
      .select(col("doc_id"), col("tgt"),
        explode(concat(col("ws"), graft.plans.WordShingles(col("ws"), 2))).as("feat"))
      .withColumn("bucket", saltedHashBucket(col("feat"), "dsir:", buckets.toLong))
      .select("doc_id", "tgt", "bucket")
    val byBucket = feats.groupBy(col("bucket")).agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cr"))
    val totals = byBucket.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    val model = byBucket.crossJoin(broadcast(totals))
      .withColumn("term",
        round((log((col("ct") + 1).cast("double") / (col("tt") + buckets)) -
               log((col("cr") + 1).cast("double") / (col("tr") + buckets))) * 1e6)
          .cast("long"))
      .select(col("bucket"), col("term"))
    feats.join(broadcast(model), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("term")).as("s"))
      .select(col("doc_id"), col("n_feats"),
        round(col("s").cast("double") / 1e6, 6).as("logratio"),
        round(col("s").cast("double") / 1e6 / col("n_feats"), 6).as("avg_logratio"))
  }

  /**
   * Unigram-LM surprisal scoring — per-document cross-entropy against the
   * corpus's own unigram distribution (the classic cheap perplexity proxy
   * for quality filtering: rare-token-soup documents score high, natural
   * text scores near the corpus entropy). No smoothing is needed: the LM
   * is fit on the same corpus, so every token has nonzero count.
   *
   * Determinism: each token's surprisal ln(total/cnt) is rounded to
   * integer MICRO-NATS and summed as a long, so the per-doc sum cannot
   * depend on float addition order across engines/partitionings; the
   * final mean divides two exactly-equal quantities.
   *
   * Scale shape: explode → (doc,token) count → token-keyed join against
   * the vocab aggregate (both map-side combined, both shuffling on
   * corpus-cardinality keys) → doc-keyed sum. The 1-row total broadcasts.
   * ppl = exp(cross-entropy), the familiar per-token perplexity form.
   */
  def unigramSurprisal(docs: DataFrame): DataFrame = {
    val perDoc = docs.select(col("doc_id"), explode(words(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val vocab = perDoc.groupBy(col("token")).agg(sum(col("tf")).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("total"))
    val meanSurprisal = col("s").cast("double") / lit(1000000.0) / col("n_tokens")
    perDoc.join(vocab, Seq("token"))
      .crossJoin(broadcast(total))
      .withColumn("term",
        round(log(col("total").cast("double") / col("cnt")) * lit(1000000.0), 0)
          .cast("long") * col("tf"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("long").as("n_tokens"), sum(col("term")).cast("long").as("s"))
      .select(col("doc_id"), col("n_tokens"),
        round(meanSurprisal, 6).as("cross_entropy"),
        round(exp(meanSurprisal), 4).as("ppl"))
  }

  /**
   * Bigram-LM surprisal — per-document cross-entropy under the corpus's
   * own bigram model, P(w₂|w₁) = cnt(w₁w₂)/cnt(w₁·) with cnt(w₁·)
   * counting BIGRAM starts (so the distribution sums to 1 and no
   * smoothing is needed: the model is fit on the same corpus). The
   * conditional model scores repetitive/templated text far lower than
   * [[unigramSurprisal]]'s bag-of-words — the standard step up the
   * quality-proxy ladder. Documents shorter than 2 tokens are absent.
   *
   * Determinism: the same micro-nat integer discipline as
   * [[unigramSurprisal]] — ln rounds to integer micro-nats per bigram
   * TYPE, multiplies by the exact occurrence count, sums in longs.
   *
   * Scale shape: one [[graft.plans.WordShingles]] explode → (doc,bigram)
   * count → bigram-keyed join against the two corpus-level count
   * aggregates (bigram types and start types, both map-side combined,
   * both shuffling on corpus-cardinality keys) → doc-keyed long sum.
   */
  def bigramSurprisal(docs: DataFrame): DataFrame = {
    val perDoc = docs
      .select(col("doc_id"),
        explode(graft.plans.WordShingles(words(col("text")), 2)).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("tf"))
    val bgCnt = perDoc.groupBy(col("bg")).agg(sum(col("tf")).as("cnt"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val w1Cnt = bgCnt.groupBy(col("w1")).agg(sum(col("cnt")).as("w1_cnt"))
    // join the two TYPE-level aggregates first (bigram-type-sized, and
    // the only place the skew-prone w1 key appears), then ONE bg-keyed
    // join back to the corpus-sized perDoc frame
    val model = bgCnt.join(w1Cnt, Seq("w1")).select(col("bg"), col("cnt"), col("w1_cnt"))
    val meanSurprisal = col("s").cast("double") / lit(1000000.0) / col("n_bigrams")
    perDoc.join(model, Seq("bg"))
      .withColumn("term",
        round(log(col("w1_cnt").cast("double") / col("cnt")) * lit(1000000.0), 0)
          .cast("long") * col("tf"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("long").as("n_bigrams"), sum(col("term")).cast("long").as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        round(meanSurprisal, 6).as("cross_entropy"),
        round(exp(meanSurprisal), 4).as("ppl"))
  }

  /**
   * Token-budget batch packing — assign documents to fixed-token-budget
   * training batches. Global greedy packing is inherently sequential, so
   * the scalable form shards first (content hash, the same slice as
   * [[corpusShards]] so co-composition reuses the decision), then packs
   * WITHIN each shard by running token count over a deterministic order
   * (content md5, then doc_id): batch k of a shard covers the docs whose
   * exclusive prefix sum lands in [k·budget, (k+1)·budget). A document
   * longer than the budget gets a batch of its own rather than splitting —
   * chunking ([[chunkDocs]]) is the upstream fix for oversized docs.
   *
   * Scale shape: one window per shard — parallelism = nShards, so at
   * 100 TB nShards is sized to make each shard executor-resident (tens of
   * thousands); the window's sort key is (md5, doc_id) within a shard
   * partition, an executor-local sort. Integer arithmetic end to end.
   */
  def packBatches(docs: DataFrame, budgetTokens: Long = 512,
                  nShards: Int = 8): DataFrame = {
    require(budgetTokens > 0 && nShards > 0, "budget and shard count must be positive")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("text_md5").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"),
        size(words(col("text"))).cast("long").as("n_tokens"),
        contentHashBucket(col("text"), nShards.toLong).as("shard"),
        md5(col("text").cast("binary")).as("text_md5"))
      .withColumn("prefix", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor(col("prefix") / budgetTokens).cast("long").as("batch_in_shard"))
  }

  /**
   * CCNet-style text normalization (Wenzek et al. 2020 §4.1, adapted:
   * lowercase, digit runs → 0, punctuation stripped, whitespace
   * squeezed) — the canonical form near-dup pipelines hash so that
   * case/punctuation/number jitter cannot hide a duplicate. Pure
   * regexp projection, fully in codegen, one scan.
   */
  def normalizeExpr(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(lower(text), "\\s+", " "), // newlines/tabs → space FIRST,
          "[0-9]+", "0"),                           // else the strip glues words
        "[^a-z0-9 ]", ""),
      " +", " "))

  /**
   * Exact dedup over NORMALIZED text: per document, its normalized-form
   * hash, the group survivor (min doc_id — the same deterministic
   * survivorship as [[Dedup.exactGroups]]), and the survivor flag.
   * Catches the near-identical documents raw-content dedup misses.
   * Documents whose normalized form is EMPTY (punctuation-only,
   * non-Latin script this normalizer strips entirely) share no content
   * — each one survives alone rather than collapsing into a spurious
   * md5('') group.
   *
   * Scale shape: one projection + ONE shuffle on the normalized hash
   * (the partition-min window); no join, no second scan.
   */
  def normalizedDedup(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("norm_md5"))
    docs.select(col("doc_id"), normalizeExpr(col("text")).as("norm"))
      .select(col("doc_id"), col("norm"), md5(col("norm").cast("binary")).as("norm_md5"))
      .withColumn("keep_id",
        when(col("norm") === "", col("doc_id")).otherwise(min(col("doc_id")).over(w)))
      .withColumn("is_survivor", col("doc_id") === col("keep_id"))
      .drop("norm")
  }

  /**
   * Per-source corpus report card — the audit table a curation run
   * prints before training: document/token mass, exact-dup rate, and
   * language share per source. Word count, content hash, and the
   * [[argmaxLang]] prediction are all per-row projections, so the whole
   * report is ONE corpus scan feeding the |sources|-group aggregate —
   * zero joins, one shuffle; the distinct-hash count is Spark's
   * two-phase partial distinct.
   */
  def corpusReport(docs: DataFrame): DataFrame = {
    val markers = LangMarkers.toMap
    docs.select(col("source"),
        size(words(col("text"))).cast("long").as("n_words"),
        md5(col("text").cast("binary")).as("h"),
        argmaxLang(l => langScore(markers(l))).as("lang_pred"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_tokens"),
        countDistinct(col("h")).as("n_unique"),
        sum(when(col("lang_pred") === "en", 1L).otherwise(0L)).as("n_en"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_unique"),
        round(lit(1.0) - col("n_unique").cast("double") / col("n_docs"), 4).as("dup_frac"),
        round(col("n_en").cast("double") / col("n_docs"), 4).as("en_frac"))
  }

  /**
   * Per-source quality calibration: "keep the top `keepFrac` of each
   * SOURCE by quality" — the curation rule that survives sources with
   * very different score distributions (a global threshold would
   * silently empty a low-scoring-but-wanted source). Score here is the
   * type-token ratio (distinct words / words — repetitive spam scores
   * low); the calibrated position is `percent_rank` within the source,
   * ties broken by doc_id so ranks are deterministic. Emits every doc
   * with its score, in-source percentile, and keep verdict.
   *
   * Scale: one exchange on `source` feeding the rank window. Sources
   * with more docs than a partition escalate the same way as
   * [[sourceCap]] (coarse score-bucket counts pick the boundary bucket,
   * only it gets ranked); at corpus-typical source counts the window
   * form is the right cost.
   */
  /**
   * Distribution drift per source: KL(P_source ‖ P_rest) over token
   * unigrams with add-one smoothing on the UNION vocabulary — the
   * corpus-monitoring number that flags a source whose language shifted
   * between pipeline runs (crawl drift, a broken extractor, an
   * injected spam burst) before it reaches training.
   *
   * Shape: one (source, token) aggregate off a single corpus scan;
   * vocab and per-source totals derive from it (token-keyed /
   * |sources|-sized). The smoothed sum needs a term for EVERY (union
   * token × source) pair, so the vocab frame fans out by the
   * (broadcast, |sources|-row) source list — vocab-sized × S rows, one
   * projection, no extra corpus pass — then folds back to one row per
   * source.
   *
   * Determinism: per-term contributions `p·ln(p/q)` round to integer
   * PICO-nats (1e12 — terms are O(p) small, so micro would truncate)
   * and sum as longs; the oracle mirrors every division and the ln
   * operation-for-operation.
   */
  def corpusDrift(docs: DataFrame): DataFrame = {
    val tc = docs.select(col("source"), explode(words(col("text"))).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("cnt"))
    val tot = tc.groupBy(col("source")).agg(sum(col("cnt")).as("n"))
    val vocab = tc.groupBy(col("token")).agg(sum(col("cnt")).as("cnt_tot"))
    val grand = vocab.agg(count(lit(1)).as("vsize"), sum(col("cnt_tot")).as("ntot"))
    val p = (col("cnt") + lit(1L)).cast("double") / (col("n") + col("vsize"))
    val q = (col("cnt_tot") - col("cnt") + lit(1L)).cast("double") /
      (col("ntot") - col("n") + col("vsize"))
    vocab.crossJoin(broadcast(tot))
      .join(tc, Seq("source", "token"), "left")
      .na.fill(0L, Seq("cnt"))
      .crossJoin(broadcast(grand))
      .withColumn("term_u",
        round(p * log(p / q) * lit(1000000000000.0), 0).cast("long"))
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_tokens"), sum(col("term_u")).as("kl_u"))
      .select(col("source"), col("n_tokens"),
        round(col("kl_u").cast("double") / lit(1000000000000.0), 6).as("kl_vs_rest"))
  }

  def qualityCalibration(docs: DataFrame, keepFrac: Double): DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1, s"keepFrac must be in (0, 1], got $keepFrac")
    val toks = words(col("text"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score").asc, col("doc_id").asc)
    docs
      .select(col("doc_id"), col("source"),
        (size(array_distinct(toks)).cast("double") / size(toks)).as("score"))
      .withColumn("pct", percent_rank().over(w))
      .select(col("doc_id"), col("source"), round(col("score"), 6).as("score"),
        round(col("pct"), 6).as("pct"),
        (col("pct") >= lit(1.0) - lit(keepFrac)).as("kept"))
  }

  /**
   * The SCALABLE escalation of [[qualityCalibration]], implemented (not
   * just documented): when one source outgrows a window partition, rank
   * only where ranking matters. Phase 1 histograms scores into `bins`
   * coarse buckets per source (a map-side-combined aggregate —
   * skew-immune) and marks each (source, bin) as fully-dropped,
   * fully-kept, or BOUNDARY from the cumulative counts; phase 2
   * exact-ranks ONLY the boundary bin's rows (one window over a
   * bin-sized slice) and offsets by the bin's cumulative start. Ties
   * can't straddle bins (equal scores share a bin), and the kept-rank
   * threshold is derived with the SAME double-division predicate as the
   * window form's percent_rank, candidate-checked around ceil — so the
   * keep SET is identical BY CONSTRUCTION (spec + shared oracle), not
   * merely approximately.
   */
  def qualityCalibrationScalable(docs: DataFrame, keepFrac: Double,
                                 bins: Int = 64): DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1, s"keepFrac must be in (0, 1], got $keepFrac")
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val toks = words(col("text"))
    val t = lit(1.0) - lit(keepFrac)
    val scored = docs.select(col("doc_id"), col("source"),
      (size(array_distinct(toks)).cast("double") / size(toks)).as("score"))
      .withColumn("bin",
        least(floor(col("score") * bins), lit(bins - 1)).cast("int"))
    // (source, bin) histogram + cumulative-from-low — |sources|×bins rows
    val wCum = Window.partitionBy(col("source")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(col("source"))
    // kept-min-INDEX m (0-based): smallest m with m/(n−1) >= t, derived
    // with the same division the window form uses; n = 1 keeps its row
    // (percent_rank 0 >= t only when t <= 0 — mirrored by the n=1 guard)
    def keptMinIdx(n: Column): Column = {
      val m0 = ceil(t * (n - 1))
      when(n === 1, when(t <= 0.0, lit(0.0)).otherwise(lit(1.0)))
        .otherwise(
          when((m0 - 1) / (n - 1) >= t, m0 - 1)
            .when(m0 / (n - 1) >= t, m0)
            .otherwise(m0 + 1))
    }
    val binStats = scored.groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum_before", coalesce(sum(col("cnt")).over(wCum), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(wTot))
      .withColumn("r_min", keptMinIdx(col("n")) + lit(1.0)) // 1-based kept rank
      .withColumn("verdict",
        when(col("cum_before") + col("cnt") < col("r_min"), lit("drop"))
          .when((col("cum_before") + 1) >= col("r_min"), lit("keep"))
          .otherwise(lit("boundary")))
    // NO broadcast hint: binStats is |sources|×bins — tiny for a handful
    // of corpus sources, but calibration BY DOMAIN makes |sources|
    // web-scale; let AQE pick broadcast-vs-shuffle from the measured
    // size (the shuffle lands on the same source key phase 2 uses)
    val tagged = scored.join(binStats, Seq("source", "bin"))
    val settled = tagged.filter(col("verdict") =!= "boundary")
      .select(col("doc_id"), col("source"), (col("verdict") === "keep").as("kept"))
    val wExact = Window.partitionBy(col("source"))
      .orderBy(col("score").asc, col("doc_id").asc)
    val boundary = tagged.filter(col("verdict") === "boundary")
      .withColumn("rn", row_number().over(wExact))
      .select(col("doc_id"), col("source"),
        ((col("cum_before") + col("rn")) >= col("r_min")).as("kept"))
    settled.unionByName(boundary)
  }
}
