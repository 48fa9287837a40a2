package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkTestBase {

  private def docsDf(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("decontaminateBloom output equals exact decontaminate (fp removed by verify join)") {
    val bench = docsDf(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six"))
    val corpus = docsDf(
      (10L, "zzz alpha beta gamma delta epsilon yyy"), // planted 5-gram
      (11L, "two three four five six seven one two three four five six"), // two shared
      (12L, "alpha beta gamma other words here"),      // prefix only — clean
      (13L, "completely unrelated text body today"))
    // fpp=0.5 makes Bloom false positives likely on the clean docs'
    // shingles — the exact verify join must still remove every one
    val got = Sketches.decontaminateBloom(corpus, bench, shingleK = 5, fpp = 0.5)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_shared")).toMap
    val exact = TextOps.decontaminate(corpus, bench, shingleK = 5)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_shared")).toMap
    assert(got == exact, s"bloom path $got != exact $exact")
    assert(got.keySet == Set(10L, 11L))
  }

  test("cmsHeavyHitters: exact counts and ranks, overestimate band holds") {
    val corpus = docsDf(
      (1L, "a a a a b b b c c d"),
      (2L, "a a b b c d e f g h"))
    val rows = Sketches.cmsHeavyHitters(corpus, topK = 4).collect()
    val byRank = rows.sortBy(_.getAs[Long]("rank"))
      .map(r => (r.getString(0), r.getAs[Long]("cnt"), r.getAs[Boolean]("cms_in_band")))
    assert(byRank.toSeq == Seq(("a", 6L, true), ("b", 5L, true), ("c", 3L, true), ("d", 2L, true)),
      byRank.mkString(", "))
  }

  test("vocabCardinality: exact distinct count, HLL band true at default rsd") {
    val corpus = docsDf(
      (1L, "a b c d e f g h"),
      (2L, "a b c x y z"))
    val r = Sketches.vocabCardinality(corpus).collect().head
    assert(r.getAs[Long]("exact_vocab") == 11L)
    assert(r.getAs[Boolean]("hll_in_band"))
  }

  test("vocabCardinality: empty corpus is in-band (0 vs 0), no divide-by-zero") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val r = Sketches.vocabCardinality(empty).collect().head
    assert(r.getAs[Long]("exact_vocab") == 0L)
    assert(r.getAs[Boolean]("hll_in_band"))
  }

  test("corpusShuffle: a permutation — dense per-shard positions, seed-stable, seed-sensitive") {
    val corpus = docsDf((0L until 64L).map(i => (i, s"doc number $i")): _*)
    val a = TextOps.corpusShuffle(corpus, seed = 7, nShards = 4).collect()
    assert(a.length == 64 && a.map(_.getLong(0)).distinct.length == 64, "must be a permutation")
    // positions are dense 1..n within every shard
    a.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rows) =>
      val pos = rows.map(_.getAs[Long]("pos_in_shard")).sorted
      assert(pos.toSeq == (1L to rows.length).toSeq, s"shard $shard positions not dense: ${pos.toSeq}")
    }
    // same seed → identical assignment; different seed → different order
    val a2 = TextOps.corpusShuffle(corpus, seed = 7, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("shard"), r.getAs[Long]("pos_in_shard"))).toSet
    val aSet = a.map(r => (r.getLong(0), r.getAs[Long]("shard"), r.getAs[Long]("pos_in_shard"))).toSet
    assert(a2 == aSet, "same seed must reproduce the exact shuffle")
    val b = TextOps.corpusShuffle(corpus, seed = 8, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("shard"), r.getAs[Long]("pos_in_shard"))).toSet
    assert(b != aSet, "a new seed must reshuffle")
  }

  test("plan shapes: corpusShuffle has no global sort; bloom corpus side has no broadcast of it") {
    val corpus = docsDf((0L until 32L).map(i => (i, s"text body $i here")): _*)
    val shufflePlan = TextOps.corpusShuffle(corpus).queryExecution.executedPlan.toString
    // per-shard window sort only — a global order would serialize through
    // one partition at scale
    assert(!shufflePlan.contains("rangepartitioning"),
      s"corpusShuffle must not range-partition globally:\n$shufflePlan")
    assert(shufflePlan.contains("hashpartitioning"),
      s"corpusShuffle must hash-partition by shard:\n$shufflePlan")
  }

  test("sourceOverlapKMV: exact pairwise Jaccard, full pair spine, " +
      "exact-regime sketch band, partition-stable") {
    val s0 = spark
    import s0.implicits._
    val docs = Seq(
      (1L, "a b c d", "A"),   // shingles: "a b c", "b c d"
      (2L, "a b c e", "B"),   // shingles: "a b c", "b c e"
      (3L, "x y z w", "C")    // disjoint
    ).toDF("doc_id", "text", "source")
    val got = Sketches.sourceOverlapKMV(docs, shingleK = 3, k = 256).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getBoolean(6))).toMap
    assert(got.keySet == Set(("A", "B"), ("A", "C"), ("B", "C"))) // full spine
    // A∩B = {"a b c"}, union 3 → J = 1/3
    assert(got(("A", "B")) == ((2L, 2L, 1L, 0.333333, true)))
    // disjoint pairs answer exact zeros, still in band
    assert(got(("A", "C")) == ((2L, 2L, 0L, 0.0, true)))
    // k exceeds every union size → the sketch IS the set: bands exact-true,
    // and the whole frame is partitioning-independent
    val again = Sketches.sourceOverlapKMV(docs.repartition(7), shingleK = 3, k = 256)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getBoolean(6))).toMap
    assert(again == got)
  }

  test("sourceOverlapKMV: bounded-k sketch stays in the 3-sigma band on an " +
      "overlapping synthetic pair") {
    val s0 = spark
    import s0.implicits._
    // two sources sharing half their shingle vocabulary, ~600 shingles each,
    // k=64 forces genuine sketch-regime estimation
    def body(ids: Range) = ids.map(i => s"tok$i next$i tok$i end$i").mkString(" ")
    val docs = Seq(
      (1L, body(0 until 200), "P"),
      (2L, body(100 until 300), "Q")
    ).toDF("doc_id", "text", "source")
    val got = Sketches.sourceOverlapKMV(docs, shingleK = 3, k = 64).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getBoolean(6), s"kmv estimate out of band: $r")
  }
}
