package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * BPE tokenizer training and application at corpus scale (Sennrich et
 * al. 2016, "Neural Machine Translation of Rare Words with Subword
 * Units") — the tokenizer-fitting step of a training-data pipeline.
 *
 * The scale split mirrors how production tokenizer trainers work: the
 * ONLY corpus-sized stage is the word-frequency aggregation (one scan,
 * map-side combined groupBy). Everything after — the merge loop, the
 * per-word-type encode — operates on word TYPES, whose count grows
 * sublinearly with the corpus (Heaps' law) and is capped loudly here
 * (`maxWordTypes`), exactly like the sampled/bounded dictionaries real
 * BPE trainers fit on. Per-document subword accounting then joins the
 * type-level encode result back onto the exploded corpus — UDF cost is
 * vocabulary-sized, never corpus-sized.
 *
 * Merges are GPT-2-style word-internal (tokens never span a space); no
 * end-of-word marker symbol — the pair statistics are per-word already,
 * so a boundary marker would only matter for detokenization, which this
 * accounting surface doesn't do.
 *
 * Determinism contract: the merge chosen at every step is the
 * (count DESC, left ASC, right ASC) maximum — bit-stable across runs,
 * partitionings, and engines. Counts are exact longs.
 */
object Bpe {

  /** The corpus-sized stage: word-frequency table (word TYPES + exact
    * counts). Map-side combine collapses each partition's duplicates
    * before the one shuffle. */
  def wordFreqs(docs: DataFrame): DataFrame =
    docs.select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Iteration-0 adjacent character-pair counts, weighted by word
    * frequency — the distributed form of BPE's first merge decision,
    * and the audit frame for the driver loop's starting state. The
    * pair explode runs over word TYPES (the post-aggregate frame), so
    * its fan-out is type-count × word length, not corpus tokens. */
  def pairCounts(docs: DataFrame): DataFrame =
    wordFreqs(docs)
      .filter(length(col("w")) >= 2)
      .select(col("w"), col("freq"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(expr("substring(w, i, 1)").as("left"),
        expr("substring(w, i + 1, 1)").as("right"),
        col("freq"))
      .groupBy(col("left"), col("right"))
      .agg(sum(col("freq")).as("pair_count"))

  /** One BPE merge step over a symbol sequence: replace every
    * non-overlapping, left-to-right occurrence of (l, r) with l+r. */
  private def applyMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Code-POINT symbol split — `w.map(_.toString)` would cut
    * supplementary-plane chars into lone surrogates, diverging from
    * Spark's `substring`/DuckDB's `substr` (both code-point-indexed)
    * that [[pairCounts]] and its oracle count with. */
  private[operators] def codePointSyms(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Greedy BPE encode of one word with a trained rank table: repeatedly
    * apply the LOWEST-rank merge present until none applies — the
    * standard BPE tokenize loop. */
  private[operators] def encodeWord(w: String,
                                    ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = codePointSyms(w)
    var done = false
    while (!done && syms.length >= 2) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i + 1 < syms.length) {
        val rk = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < best) { best = rk; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else syms = applyMerge(syms, syms(bi), syms(bi + 1))
    }
    syms
  }

  /** The trained-model row shape: (merge_rank, left, right, merged,
    * pair_count at selection time). */
  private val mergeCols = Seq("merge_rank", "left", "right", "merged", "pair_count")

  /**
   * Train `numMerges` BPE merges. The corpus contributes ONE aggregate
   * (word→freq); the loop runs on the driver over at most
   * `maxWordTypes` word types (top by frequency, word-asc tiebreak —
   * deterministic), like every production tokenizer's bounded/sampled
   * dictionary fit. The cap is loud: capping changes the fitted counts,
   * so exceeding it logs rather than silently truncating.
   *
   * Driver memory is type-count × word length — the same size class as
   * the k-means/SRP model collects elsewhere in this library (a model,
   * not data). Returns the merge table, the driver-resident artifact
   * that [[subwordStats]] broadcasts.
   */
  def trainMerges(docs: DataFrame, numMerges: Int,
                  maxWordTypes: Int = 100000): DataFrame = {
    require(numMerges > 0, "numMerges must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val freqs = wordFreqs(docs)
    val dict: Array[(String, Long)] = freqs
      .orderBy(col("freq").desc, col("w").asc)
      .limit(maxWordTypes + 1)
      .as[(String, Long)].collect()
    if (dict.length > maxWordTypes)
      System.err.println(
        s"[bpe] word types exceed maxWordTypes=$maxWordTypes — training on the " +
          "top types by frequency (the bounded-dictionary fit real trainers use)")
    val capped = dict.take(maxWordTypes)

    // word types as mutable symbol sequences
    var vocab: Array[(Vector[String], Long)] =
      capped.map { case (w, f) => (codePointSyms(w), f) }
    val merges = Vector.newBuilder[(Int, String, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // deterministic argmax: count DESC, then (left, right) ASC
        val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((rank, l, r, l + r, c))
        vocab = vocab.map { case (syms, f) => (applyMerge(syms, l, r), f) }
        rank += 1
      }
    }
    merges.result().toDF(mergeCols: _*)
  }

  /**
   * The fitted tokenizer's corpus-frequency vocabulary: every subword
   * the trained merges produce, with its exact corpus occurrence count
   * (top `topN` by count desc, subword asc). Same type-level shape as
   * [[subwordStats]] — the encode runs per word TYPE, the exploded
   * subwords re-aggregate weighted by the word's corpus frequency, and
   * the TakeOrdered finish is per-partition heaps, no global sort. The
   * (merges table, vocabulary) pair is the complete tokenizer artifact.
   */
  def subwordVocab(docs: DataFrame, merges: DataFrame, topN: Int = 100): DataFrame = {
    val ranks: Map[(String, String), Int] = collectRanks(merges)
    val subsUdf = udf { (w: String) => encodeWord(w, ranks) }
    wordFreqs(docs)
      .withColumn("sub", explode(subsUdf(col("w"))))
      .groupBy(col("sub").as("subword"))
      .agg(sum(col("freq")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("subword").asc)
      .limit(topN)
  }

  private def collectRanks(merges: DataFrame): Map[(String, String), Int] = merges
    .select(col("merge_rank").cast("int"), col("left"), col("right"))
    .collect()
    .map(r => (r.getString(1), r.getString(2)) -> r.getInt(0))
    .toMap

  /**
   * Per-document subword accounting under a trained merge table:
   * (doc_id, n_words, n_subwords, n_chars_tokenized). The encode UDF
   * runs once per word TYPE (the distinct-word frame), and the result
   * joins back onto the exploded corpus on the word key — one
   * token-keyed shuffle join (the tfidf shape), with the UDF cost
   * bounded by the vocabulary. `merges` is driver-resident
   * (numMerges-sized — a model artifact) and broadcasts inside the UDF
   * closure. Every document answers a row — a doc with no non-empty
   * tokens reports zeros (the spanDedup* per-doc contract).
   */
  def subwordStats(docs: DataFrame, merges: DataFrame): DataFrame = {
    val ranks: Map[(String, String), Int] = collectRanks(merges)
    val nSubwordsUdf = udf { (w: String) => encodeWord(w, ranks).length }
    val tokens = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
    // encode each word TYPE once; join the result back by word
    val types = tokens.select(col("w")).distinct()
      .withColumn("n_sub", nSubwordsUdf(col("w")))
      .withColumn("n_chr", length(col("w")).cast("long"))
    val perDoc = tokens.join(types, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sub")).cast("long").as("n_subwords"),
        sum(col("n_chr")).cast("long").as("n_chars_tokenized"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_words", "n_subwords", "n_chars_tokenized"))
  }

  /**
   * Tokenizer fertility report: per source, subwords-per-word
   * (fertility — the tokenizer-evaluation metric; 1.0 = every word is
   * one token) and chars-per-subword (compression). The frame a
   * tokenizer-sizing decision reads next to [[subwordVocab]]. Derived
   * entirely from [[subwordStats]] + one broadcast-small doc→source
   * join and a |sources|-group aggregate. A source with no tokens
   * answers null ratios rather than an ANSI divide-by-zero.
   */
  def fertilityReport(docs: DataFrame, merges: DataFrame): DataFrame =
    subwordStats(docs, merges)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).cast("long").as("n_words"),
        sum(col("n_subwords")).cast("long").as("n_subwords"),
        sum(col("n_chars_tokenized")).cast("long").as("n_chars"))
      .select(col("source"), col("n_docs"), col("n_words"), col("n_subwords"),
        when(col("n_words") > 0,
          round(col("n_subwords").cast("double") / col("n_words"), 6)).as("fertility"),
        when(col("n_subwords") > 0,
          round(col("n_chars").cast("double") / col("n_subwords"), 6))
          .as("chars_per_subword"))
}
