package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BPE tokenizer training/application specs — the Sennrich et al. 2016
  * worked example plus the determinism and accounting contracts. */
class BpeSpec extends SparkTestBase {

  private def docsOf(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  /** The classic BPE dictionary: low×5, lower×2, newest×6, widest×3. */
  private def sennrichCorpus = docsOf(
    (1L, Seq.fill(5)("low").mkString(" ")),
    (2L, Seq.fill(2)("lower").mkString(" ")),
    (3L, Seq.fill(6)("newest").mkString(" ")),
    (4L, Seq.fill(3)("widest").mkString(" ")))

  test("pairCounts: word-frequency-weighted adjacent char pairs") {
    val got = Bpe.pairCounts(sennrichCorpus).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // e-s: newest(6) + widest(3); l-o and o-w: low(5) + lower(2)
    assert(got(("e", "s")) == 9L)
    assert(got(("s", "t")) == 9L)
    assert(got(("l", "o")) == 7L)
    assert(got(("o", "w")) == 7L)
    assert(got(("e", "r")) == 2L)
    assert(!got.contains(("t", "n"))) // pairs never span words
  }

  test("trainMerges: the worked-example merge sequence with deterministic tie-breaks") {
    val merges = Bpe.trainMerges(sennrichCorpus, numMerges = 5)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // count 9 ties (e,s)/(s,t): pair-asc picks (e,s); after it, (es,t) is 9
    assert(merges(0) == ((0, "e", "s", "es", 9L)))
    assert(merges(1) == ((1, "es", "t", "est", 9L)))
    // count 7 ties (l,o)/(o,w): pair-asc picks (l,o); then (lo,w) is 7
    assert(merges(2) == ((2, "l", "o", "lo", 7L)))
    assert(merges(3) == ((3, "lo", "w", "low", 7L)))
    // count 6 ties (n,e)/(e,w→)… after low: newest = n e w est → pairs
    // (n,e)6 (e,w)6 (w,est)6 — pair-asc picks (e,w)
    assert(merges(4) == ((4, "e", "w", "ew", 6L)))
  }

  test("trainMerges is bit-stable across runs") {
    val a = Bpe.trainMerges(sennrichCorpus, 5).orderBy("merge_rank").collect().toSeq
    val b = Bpe.trainMerges(sennrichCorpus, 5).orderBy("merge_rank").collect().toSeq
    assert(a == b)
  }

  test("trainMerges stops when no pairs remain (single-char vocabulary)") {
    val merges = Bpe.trainMerges(docsOf((1L, "a b a b")), numMerges = 10).collect()
    assert(merges.isEmpty)
  }

  test("encodeWord: greedy lowest-rank-first application") {
    val ranks = Map(("e", "s") -> 0, ("es", "t") -> 1, ("l", "o") -> 2, ("lo", "w") -> 3)
    assert(Bpe.encodeWord("lowest", ranks) == Vector("low", "est"))
    assert(Bpe.encodeWord("low", ranks) == Vector("low"))
    // "set" has no (e,s) adjacency — s-e and e-t are unranked, nothing merges
    assert(Bpe.encodeWord("set", ranks) == Vector("s", "e", "t"))
    assert(Bpe.encodeWord("eslowest", ranks) == Vector("es", "low", "est"))
  }

  test("subwordStats: zero merges = character accounting; merges only shrink") {
    val s = spark
    import s.implicits._
    val docs = docsOf((1L, "low lowest"), (2L, "newest"))
    val none = Seq.empty[(Int, String, String, String, Long)]
      .toDF("merge_rank", "left", "right", "merged", "pair_count")
    val zero = Bpe.subwordStats(docs, none).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(zero(1L) == ((2L, 9L, 9L))) // "low"(3) + "lowest"(6) chars
    assert(zero(2L) == ((1L, 6L, 6L)))

    val merges = Bpe.trainMerges(sennrichCorpus, 5)
    val got = Bpe.subwordStats(docs, merges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // low → [low]; lowest → [low, est]; newest → n e w est →(e,w)→ [n, ew, est]
    assert(got(1L) == ((2L, 3L, 9L)))
    assert(got(2L) == ((1L, 3L, 6L)))
  }

  test("maxWordTypes cap trains on the top-frequency types only") {
    // cap out "widest"/"lower": dictionary = low×5, newest×6 only
    val merges = Bpe.trainMerges(sennrichCorpus, numMerges = 2, maxWordTypes = 2)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    // counts now: newest-only e-s 6, s-t 6, n-e 6, e-w 6, w-e 6; low: l-o 5, o-w 5
    // pair-asc among count-6: (e,s)
    assert(merges(0) == (("e", "s", 6L)))
  }

  test("subwordVocab: corpus-weighted subword frequencies under the fitted merges") {
    val merges = Bpe.trainMerges(sennrichCorpus, 5)
    val got = Bpe.subwordVocab(sennrichCorpus, merges, topN = 4).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // est: newest(6)+widest(3); low: low(5)+lower(2); ew/n: newest(6);
    // ties break subword-asc
    assert(got == Seq(("est", 9L), ("low", 7L), ("ew", 6L), ("n", 6L)))
  }

  test("code-point symbols: supplementary-plane chars stay whole, matching pairCounts") {
    // U+1D11E (musical G clef) is outside the BMP — two UTF-16 units
    val clef = new String(Character.toChars(0x1D11E))
    assert(Bpe.codePointSyms(s"a${clef}b") == Vector("a", clef, "b"))
    assert(Bpe.encodeWord(s"a${clef}b", Map.empty) == Vector("a", clef, "b"))
    // Spark-side pair counting sees the same 3 symbols → 2 pairs
    val got = Bpe.pairCounts(docsOf((1L, s"a${clef}b")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", clef) -> 1L, (clef, "b") -> 1L))
    // and trainMerges counts agree with pairCounts on the astral corpus
    val m = Bpe.trainMerges(docsOf((1L, s"a${clef}b a${clef}b")), 1).collect().head
    assert((m.getString(1), m.getString(2), m.getLong(4)) == (("a", clef, 2L)))
  }

  test("subwordStats answers a zero row for token-less documents") {
    val docs = docsOf((1L, "low"), (2L, ""), (3L, " "))
    val got = Bpe.subwordStats(docs, Bpe.trainMerges(sennrichCorpus, 5)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((1L, 1L, 3L)))
    assert(got(2L) == ((0L, 0L, 0L)))
    assert(got(3L) == ((0L, 0L, 0L)))
  }

  test("property: encode is lossless and merges only shrink (100 random words × " +
      "the fitted ranks)") {
    val ranks = Bpe.trainMerges(sennrichCorpus, 5).collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getInt(0)).toMap
    val gen = org.scalacheck.Gen.listOfN(12,
      org.scalacheck.Gen.oneOf(('a' to 'z') :+ '\u00e9')).map(_.mkString)
    val seed = org.scalacheck.rng.Seed(42L)
    val words = Iterator.iterate(seed)(_.next)
      .map(sd => gen.apply(org.scalacheck.Gen.Parameters.default, sd))
      .collect { case Some(w) => w }.take(100).toList
    words.foreach { w =>
      val subs = Bpe.encodeWord(w, ranks)
      assert(subs.mkString("") == w, s"lossy encode of '$w': $subs")
      assert(subs.length <= w.length, s"encode grew '$w'")
      assert(subs.forall(_.nonEmpty))
    }
  }

  test("fertilityReport: zero merges = chars/word fertility; null-safe on empty sources") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "low lowest", "a"),   // 2 words, 9 chars
      (2L, "newest", "a"),       // 1 word, 6 chars
      (3L, "", "b")              // token-less source
    ).toDF("doc_id", "text", "source")
    val none = Seq.empty[(Int, String, String, String, Long)]
      .toDF("merge_rank", "left", "right", "merged", "pair_count")
    val got = Bpe.fertilityReport(docs, none).collect()
      .map(r => r.getString(0) -> r).toMap
    // zero merges: every char is a subword → fertility = chars/words = 15/3
    assert(got("a").getAs[Long]("n_words") == 3L)
    assert(got("a").getAs[Long]("n_subwords") == 15L)
    assert(math.abs(got("a").getAs[Double]("fertility") - 5.0) < 1e-9)
    assert(math.abs(got("a").getAs[Double]("chars_per_subword") - 1.0) < 1e-9)
    // the empty source answers nulls, not a divide-by-zero
    assert(got("b").isNullAt(got("b").fieldIndex("fertility")))
  }
}
