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
