package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}

/**
 * Probabilistic-sketch operators for corpus audits at 100 TB scale —
 * Bloom-prefiltered decontamination, Count-Min heavy hitters, and an HLL
 * vocabulary-cardinality audit.
 *
 * Each sketch result is checked against the exact answer computed in the
 * same job, and the emitted frame carries the exact values plus
 * `*_in_band` booleans (the accuracy envelope), so the driver's DuckDB
 * oracle hash-verifies the guarantee itself — the same rank-band pattern
 * as `gauge_stats_p2sketch`. Raw estimates never reach the output: they
 * are engine-specific, the bands are not.
 */
object Sketches {

  /**
   * Bloom-prefiltered benchmark decontamination — same contract and same
   * exact output as [[TextOps.decontaminate]] (one row per contaminated
   * document with its distinct shared-shingle count), via a two-stage
   * plan for eval sets too large to broadcast as a hash relation:
   *
   *   1. the eval set's distinct shingles aggregate into ONE Bloom filter
   *      (`DataFrameStatFunctions.bloomFilter` — a distributed,
   *      mergeable aggregate; the bitset at fpp=1% is ~1.2 bytes per
   *      shingle, ~10x smaller than a broadcast hash relation of the
   *      strings), broadcast once;
   *   2. the corpus's shingle stream drops non-members MAP-SIDE — the
   *      100 TB side is scanned once and never shuffled on content;
   *      survivors ≈ true contamination + fpp·|corpus shingles|;
   *   3. the survivor set (tiny by construction) joins the eval shingles
   *      exactly, so Bloom false positives are removed and the result is
   *      EXACT — the sketch only prunes, it never decides.
   *
   * The membership probe is a Scala UDF over the broadcast bitset (the
   * documented model-scoring exception: Spark exposes no codegen
   * expression over a driver-built BloomFilter); it sits behind a
   * codegen'd shingle explosion and ahead of a 99%-selective filter, so
   * the interpreted boundary sees each shingle once.
   */
  def decontaminateBloom(docs: DataFrame, benchmark: DataFrame,
                         shingleK: Int = 8, fpp: Double = 0.01): DataFrame = {
    val spark = docs.sparkSession
    // localCheckpoint, not .cache(): the eval shingle set feeds three
    // consumers (sizing count, Bloom build, exact-verify join) — a cache
    // would pin an InMemoryRelation in the cache manager FOREVER in a
    // long-lived screening session (and leak one per call), while
    // checkpoint blocks are context-cleaned once the returned frame is
    // unreachable, as is the broadcast bitset below
    val bench = Dedup.shingleFrame(benchmark, shingleK).select(col("shingle")).distinct()
      .localCheckpoint(true)
    // sizing count + filter build: two eval-set-sized actions, no corpus scan
    val nBench = math.max(bench.count(), 1L)
    val bloom = bench.stat.bloomFilter(col("shingle"), nBench, fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((s: String) => s != null && bc.value.mightContainString(s))
    Dedup.shingleFrame(docs, shingleK)
      .filter(mightContain(col("shingle")))
      // exact verify: survivor-sized join (no broadcast hint on purpose —
      // this is the path for eval sets ABOVE broadcast size; AQE may
      // still choose broadcast when the set is actually small)
      .join(bench, Seq("shingle"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
  }

  /**
   * Count-Min heavy hitters — the exact top-K corpus tokens (count desc,
   * token asc — fully deterministic) audited against a Count-Min sketch
   * of the whole token stream.
   *
   * Scale shape: the exact top-K is one token-keyed aggregate into a
   * TakeOrderedAndProject (per-partition heaps — no global sort); the
   * sketch is a mergeable `eps × confidence`-sized aggregate (a few MB,
   * independent of corpus size) built in one pass by
   * `DataFrameStatFunctions.countMinSketch`. Only the K result rows are
   * probed on the driver.
   *
   * Band: CMS never underestimates, and overestimates by at most
   * eps·N (N = total token occurrences) with probability ≥ confidence
   * per query; `cms_in_band` asserts exactly that envelope.
   */
  def cmsHeavyHitters(docs: DataFrame, topK: Int = 20,
                      eps: Double = 1e-4, confidence: Double = 0.999,
                      seed: Int = 42): DataFrame = {
    val spark = docs.sparkSession
    // ONE corpus scan: the token-keyed count aggregate feeds both the
    // exact top-K and the sketch — CMS is linear, so adding (token, cnt)
    // equals adding the token cnt times, and only the vocab-sized count
    // frame is read twice (cached), never the corpus
    val counts = docs.select(explode(TextOps.words(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt")).cache()
    val exact = counts
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(topK)
      .collect() // K rows — result-sized, not data-sized
    val cms = counts.select(col("token"), col("cnt")).rdd
      .mapPartitions { it =>
        val s = org.apache.spark.util.sketch.CountMinSketch.create(eps, confidence, seed)
        it.foreach(r => s.addString(r.getString(0), r.getLong(1)))
        Iterator(s)
      }
      .treeReduce { (a, b) => a.mergeInPlace(b); a }
    counts.unpersist()
    val maxOver = math.ceil(eps * cms.totalCount()).toLong
    val rows = exact.zipWithIndex.map { case (r, i) =>
      val token = r.getString(0)
      val cnt = r.getLong(1)
      val est = cms.estimateCount(token)
      Row(token, cnt, (i + 1).toLong, est >= cnt && est - cnt <= maxOver)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("token", StringType), StructField("cnt", LongType),
        StructField("rank", LongType), StructField("cms_in_band", BooleanType))))
  }

  /**
   * Bounded bottom-k aggregator: keeps the k smallest DISTINCT longs
   * seen. The buffer is ALWAYS a sorted distinct array of ≤ k values, so
   * once it is full the overwhelmingly common case — a value at or above
   * the current k-th minimum — is rejected in O(log k) with NO copy;
   * only a value that actually enters the bottom-k pays an O(k)
   * insertion copy, which happens an expected k·ln(n) times total over n
   * inputs (expected O(1) amortized). Mergeable and order-independent —
   * the final array is the same under any partitioning — which is what
   * makes it a KMV signature aggregate. State is ≤ `k × 8` bytes per
   * group: constant in the corpus, exactly like the P² sketch.
   */
  private final class BottomK(k: Int)
    extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Array[Long]] {
    private def trim(b: Array[Long], keep: Int): Array[Long] = {
      val d = b.distinct
      if (d.length <= keep) d.sorted else { java.util.Arrays.sort(d); d.take(keep) }
    }
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(b: Array[Long], v: Long): Array[Long] = {
      // invariant: b is sorted & distinct, length <= k
      if (b.length >= k && v >= b(b.length - 1)) return b // common case: no-op
      val i = java.util.Arrays.binarySearch(b, v)
      if (i >= 0) return b // already present
      val at = -i - 1
      val outLen = math.min(b.length + 1, k)
      val out = new Array[Long](outLen)
      System.arraycopy(b, 0, out, 0, at)
      out(at) = v
      System.arraycopy(b, at, out, at + 1, outLen - at - 1)
      out
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = trim(a ++ b, k)
    def finish(b: Array[Long]): Array[Long] = trim(b, k)
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] = bufferEncoder
  }

  /**
   * Cross-source content-overlap audit — exact per-source-pair shingle
   * Jaccard next to a KMV (k-minimum-values / bottom-k) sketch estimate's
   * accuracy band (Bar-Yossef et al. 2002; Beyer et al. 2007) — the
   * "how much does snapshot/source A repeat B" question de-dup planning
   * starts from.
   *
   * Scale shape: the EXACT side is the expensive path (a shingle-keyed
   * self-join over distinct (source, shingle) rows) and exists as the
   * audit; the KMV side is one pass — per source, the k smallest 64-bit
   * shingle hashes via a bounded mergeable aggregate (O(k) state,
   * map-side combined, no per-source sort), after which ALL pair math
   * runs on the |sources| × k signature frame: sketch-sized, corpus-free.
   * At 100 TB only the sketch path runs; this operator is the evidence
   * it can be trusted.
   *
   * Estimator: for pair (A, B), take the k smallest values of
   * sig(A) ∪ sig(B); Ĵ = (how many of those appear in both) / k — the
   * classic bottom-k Jaccard estimator. When the union carries fewer
   * than k distinct hashes the sketch holds the whole set and Ĵ is
   * exact. `kmv_in_band` allows 3σ (σ² = J(1−J)/k) plus the 1/k
   * quantization step; the estimate itself is deterministic but
   * hash-engine-specific, so only the exact values and the band boolean
   * cross the oracle boundary (the cms/hll precedent above).
   */
  /** Debug frame behind [[sourceOverlapKMV]]'s band constant: per pair,
    * the raw estimate, the exact value, and the deviation in σ units. */
  private[graft] def sourceOverlapDebug(docs: DataFrame, shingleK: Int,
                                        k: Int): DataFrame =
    sourceOverlapKMV(docs, shingleK, k, debug = true)

  def sourceOverlapKMV(docs: DataFrame, shingleK: Int = 3,
                       k: Int = 256): DataFrame =
    sourceOverlapKMV(docs, shingleK, k, debug = false)

  private def sourceOverlapKMV(docs: DataFrame, shingleK: Int,
                               k: Int, debug: Boolean): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    // distinct (source, shingle): the one corpus-sized frame, read by the
    // exact join and the signature aggregate
    val sh = Dedup.shingleFrame(docs.select(col("doc_id"), col("text")), shingleK)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("source"), col("shingle")).distinct()
      .localCheckpoint()
    val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    // pair spine: |sources|² rows — broadcast-tiny, so disjoint pairs
    // still answer an exact 0
    val spine = sizes.select(col("source").as("src_a"), col("n").as("n_a"))
      .crossJoin(broadcast(sizes.select(col("source").as("src_b"), col("n").as("n_b"))))
      .filter(col("src_a") < col("src_b"))
    val exact = spine.join(inter, Seq("src_a", "src_b"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("jaccard",
        col("n_shared").cast("double") / (col("n_a") + col("n_b") - col("n_shared")))
    // KMV signatures: one bounded aggregate per source
    val bottomK = udaf(new BottomK(k))
    val sigs = sh.select(col("source"), xxhash64(col("shingle")).as("h"))
      .groupBy(col("source")).agg(bottomK(col("h")).as("sig"))
    val kmvJaccard = udf { (a: Seq[Long], b: Seq[Long]) =>
      val sa = a.toSet; val sb = b.toSet
      val unionK = (sa ++ sb).toArray.sorted.take(k)
      val shared = unionK.count(h => sa.contains(h) && sb.contains(h))
      shared.toDouble / math.max(unionK.length, 1)
    }
    val est = sigs.select(col("source").as("src_a"), col("sig").as("sig_a"))
      .join(broadcast(sigs.select(col("source").as("src_b"), col("sig").as("sig_b"))),
        col("src_a") < col("src_b"))
      .withColumn("kmv_est", kmvJaccard(col("sig_a"), col("sig_b")))
      .select(col("src_a"), col("src_b"), col("kmv_est"))
    val joined = exact.join(est, Seq("src_a", "src_b"))
    if (debug)
      joined.select(col("src_a"), col("src_b"), col("jaccard"), col("kmv_est"),
        (abs(col("kmv_est") - col("jaccard")) /
          sqrt(greatest(col("jaccard") * (lit(1.0) - col("jaccard")), lit(1e-12))
            / lit(k.toDouble))).as("abs_sigma"))
    else joined
      .select(col("src_a"), col("src_b"),
        col("n_a"), col("n_b"), col("n_shared"),
        round(col("jaccard"), 6).as("jaccard"),
        (abs(col("kmv_est") - col("jaccard")) <=
          lit(BandSigma) * sqrt(col("jaccard") * (lit(1.0) - col("jaccard")) / lit(k.toDouble)) +
          lit(1.0 / k)).as("kmv_in_band"))
  }

  /** source_overlap band width in σ: a PER-PAIR 3σ envelope holds 99.7%
    * per pair, but the audit emits |sources|² pairs in one frame — at
    * 190 pairs a ~3σ outlier is almost expected once (p ≈ 0.4), and the
    * fixture's fixed hash makes any such pair fail DETERMINISTICALLY
    * (observed: sf0.1 src6–src9, 3.1σ). 4.5σ puts the family-wise miss
    * probability near 190 × 3.4e-6 ≈ 6e-4 while still certifying the
    * estimator (a broken sketch is tens of σ out). */
  private val BandSigma = 4.5

  /**
   * Vocabulary-cardinality audit — exact distinct-token count next to the
   * HyperLogLog++ estimate's accuracy band. At 100 TB the exact count is
   * the expensive path (a token-keyed distinct aggregate); the HLL
   * estimate is one mergeable pass with KB-sized state — this audit is
   * the evidence that the cheap path is trustworthy, measured on the
   * same corpus the pipeline actually runs on.
   *
   * `hll_in_band` allows 3 standard deviations of the configured relative
   * error (99.7% envelope); the estimate itself is deterministic (register
   * maxes are order- and partitioning-independent) but engine-specific,
   * so only the band crosses the oracle boundary.
   */
  def vocabCardinality(docs: DataFrame, rsd: Double = 0.05): DataFrame =
    docs.select(explode(TextOps.words(col("text"))).as("token"))
      .agg(
        countDistinct(col("token")).as("exact_vocab"),
        approx_count_distinct(col("token"), rsd).as("hll_est"))
      .select(
        col("exact_vocab"),
        // empty corpus: 0 distinct is "in band" iff the estimate is also
        // 0 — and never an ANSI divide-by-zero
        when(col("exact_vocab") === 0, col("hll_est") === 0)
          .otherwise(abs(col("hll_est") - col("exact_vocab")).cast("double") /
            col("exact_vocab") <= lit(3 * rsd))
          .as("hll_in_band"))
}
