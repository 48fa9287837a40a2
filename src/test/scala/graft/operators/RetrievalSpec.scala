package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BM25 retrieval + reciprocal-rank fusion specs, hand-computed. */
class RetrievalSpec extends SparkTestBase {

  private def docsDf(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def queriesDf(rows: (Long, Seq[String])*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("query_id", "terms")
  }

  // Corpus: 3 docs. "cat" appears in docs 1 (tf 2, dl 4) and 2 (tf 1, dl 2);
  // doc 3 has neither term. N=3, avgdl=(4+2+3)/3=3.
  private val corpus = docsDf(
    (1L, "cat cat dog bird"),
    (2L, "cat fish"),
    (3L, "lion tiger bear"))

  test("bm25TopK: hand-computed scores, rank order, absent terms ignored") {
    val got = Retrieval.bm25TopK(corpus, queriesDf((7L, Seq("cat", "unseen"))), k = 10)
      .orderBy("rank").collect()
    // idf(cat) = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
    val idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    def tfn(tf: Double, dl: Double) =
      tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 3.0))
    def score(tf: Double, dl: Double) =
      math.rint(idf * tfn(tf, dl) * 1e6) / 1e6
    // doc1: tfn = 4.4/(2+1.2*1.25) ≈ 1.2571; doc2: tfn = 2.2/1.9 ≈ 1.1579
    assert(got.length == 2) // doc 3 matches nothing; "unseen" has no postings
    assert(got(0).getAs[Long]("doc_id") == 1L) // tf=2 outweighs the length penalty
    assert(got(1).getAs[Long]("doc_id") == 2L)
    assert(math.abs(got(0).getAs[Double]("score") - score(2, 4)) < 1e-9)
    assert(math.abs(got(1).getAs[Double]("score") - score(1, 2)) < 1e-9)
    assert(got.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L))
  }

  test("bm25TopK: duplicate query terms dedupe; k truncates; doc_id tiebreak") {
    val twice = Retrieval.bm25TopK(corpus, queriesDf((1L, Seq("cat", "cat"))), k = 10)
      .collect()
    val once = Retrieval.bm25TopK(corpus, queriesDf((1L, Seq("cat"))), k = 10)
      .collect()
    assert(twice.map(r => (r.getLong(1), r.getDouble(2))).toSet ==
      once.map(r => (r.getLong(1), r.getDouble(2))).toSet)
    val top1 = Retrieval.bm25TopK(corpus, queriesDf((1L, Seq("cat"))), k = 1).collect()
    assert(top1.length == 1 && top1(0).getAs[Long]("rank") == 1L)
    // equal scores → lower doc_id first: two identical docs
    val tie = Retrieval.bm25TopK(
      docsDf((5L, "cat dog"), (4L, "cat dog"), (9L, "fish")),
      queriesDf((1L, Seq("cat"))), k = 10).orderBy("rank").collect()
    assert(tie.map(_.getAs[Long]("doc_id")).toSeq == Seq(4L, 5L))
  }

  test("stored BM25 index: bucket-partitioned layout, statically pruned serving, " +
    "answers identical to the inline path; bucket-count mismatch fails loudly") {
    val s = spark
    val corpus = docsDf((0 until 30).map(i =>
      (i.toLong, s"cat w$i dog ${if (i % 3 == 0) "cat fish" else "bird"}")): _*)
    val queries = queriesDf((1L, Seq("cat", "fish")), (2L, Seq("dog")))
    val inline = Retrieval.bm25TopK(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sorted.toSeq
    val path = java.nio.file.Files.createTempDirectory("graft-bm25idx").toString
    Retrieval.writeBm25Index(corpus, path)
    val dirs = new java.io.File(s"$path/postings").list().filter(_.startsWith("bucket="))
    assert(dirs.nonEmpty, "expected bucket=N partition directories")
    val storedDf = Retrieval.bm25StoredTopK(s, path, queries, k = 5)
    val stored = storedDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).sorted.toSeq
    assert(stored == inline, "stored-index search must match the inline path")
    // serving reads only the query terms' buckets: a STATIC partition
    // filter on the bucket column of both store scans (postings +
    // tokenstats — AQE hides scan nodes from executedPlan.collect, so
    // assert on the formatted explain)
    val plan = storedDf.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pruned = "PartitionFilters: \\[bucket#\\d+ IN".r.findAllIn(plan).length
    assert(pruned >= 2,
      s"expected bucket IN (...) partition filters on both store scans:\n$plan")
    // corrupt meta → loud failure, not silent partition misses
    import s.implicits._
    Seq(99).toDF("buckets").coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    intercept[IllegalArgumentException] {
      Retrieval.bm25StoredTopK(s, path, queries, k = 5)
    }
  }

  test("BM25 index append: stored answers equal a fresh rebuild over the union; " +
    "replay is a no-op; df/avgdl/n_docs all shift") {
    val s = spark
    val docsA = docsDf((0 until 20).map(i =>
      (i.toLong, s"cat w$i ${if (i % 2 == 0) "dog" else "bird fish"}")): _*)
    // the batch changes every global: adds docs with 'cat' (df), longer
    // docs (avgdl), and new docs (n_docs)
    val docsB = docsDf((20 until 30).map(i =>
      (i.toLong, s"cat cat dog extra tokens here w$i plus more words")): _*)
    val queries = queriesDf((1L, Seq("cat", "fish")), (2L, Seq("dog")))
    def answers(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).sorted.toSeq
    val appended = java.nio.file.Files.createTempDirectory("graft-bm25app").toString
    Retrieval.writeBm25Index(docsA, appended)
    Retrieval.appendToBm25Index(s, appended, docsB)
    val rebuilt = java.nio.file.Files.createTempDirectory("graft-bm25reb").toString
    Retrieval.writeBm25Index(docsA.unionByName(docsB), rebuilt)
    val afterAppend = answers(Retrieval.bm25StoredTopK(s, appended, queries, k = 8))
    assert(afterAppend == answers(Retrieval.bm25StoredTopK(s, rebuilt, queries, k = 8)),
      "append must equal a fresh rebuild over the union corpus")
    // replayed batch: ids already indexed → no state change
    Retrieval.appendToBm25Index(s, appended, docsB)
    assert(answers(Retrieval.bm25StoredTopK(s, appended, queries, k = 8)) == afterAppend)
    assert(s.read.parquet(s"$appended/corpusstats").collect()(0).getLong(0) == 30L)
  }

  test("BM25 index compact: merges append-wave files without moving answers; " +
    "repairs the crash-orphan window (registered doc, no postings) so a " +
    "re-append of the lost batch lands") {
    val s = spark
    import s.implicits._
    val docsA = docsDf((0 until 20).map(i =>
      (i.toLong, s"cat w$i ${if (i % 2 == 0) "dog" else "bird fish"}")): _*)
    val docsB = docsDf((20 until 30).map(i =>
      (i.toLong, s"cat cat dog extra tokens here w$i plus more words")): _*)
    val queries = queriesDf((1L, Seq("cat", "fish")), (2L, Seq("dog")))
    def answers(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).sorted.toSeq
    val path = java.nio.file.Files.createTempDirectory("graft-bm25cmp").toString
    Retrieval.writeBm25Index(docsA, path)
    Retrieval.appendToBm25Index(s, path, docsB)
    val before = answers(Retrieval.bm25StoredTopK(s, path, queries, k = 8))
    def postingFiles(): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(s"$path/postings"))
    }
    val filesBefore = postingFiles()
    Retrieval.compactBm25Index(s, path)
    assert(answers(Retrieval.bm25StoredTopK(s, path, queries, k = 8)) == before,
      "compaction must not change serving answers")
    assert(postingFiles() < filesBefore,
      s"expected fewer posting files after compaction (before=$filesBefore)")
    // corpusstats invariant holds after compact
    val cs = s.read.parquet(s"$path/corpusstats").collect()(0)
    assert(cs.getLong(0) == 30L)

    // crash-orphan repair: simulate the documented append window — the
    // docstats screen landed, postings did not (the batch is "lost":
    // a replay would anti-join away). Compact must deregister it.
    Seq((99L, 4L)).toDF("doc_id", "dl")
      .write.mode("append").parquet(s"$path/docstats")
    Retrieval.compactBm25Index(s, path)
    assert(s.read.parquet(s"$path/docstats")
      .filter(col("doc_id") === 99L).isEmpty, "orphan must be deregistered")
    assert(s.read.parquet(s"$path/corpusstats").collect()(0).getLong(0) == 30L)
    // ... so re-appending the lost doc now lands it for real
    Retrieval.appendToBm25Index(s, path, docsDf((99L, "cat dog bird q")))
    assert(s.read.parquet(s"$path/docstats").filter(col("doc_id") === 99L).count() == 1)
    assert(s.read.parquet(s"$path/corpusstats").collect()(0).getLong(0) == 31L)
    assert(s.read.parquet(s"$path/postings")
      .filter(col("doc_id") === 99L).count() == 4)
  }

  test("bm25TopK edge cases: no-posting query answers empty; empty query set answers empty") {
    val none = Retrieval.bm25TopK(corpus, queriesDf((1L, Seq("zzz", "qqq"))), k = 5)
    assert(none.collect().isEmpty)
    val noQ = Retrieval.bm25TopK(corpus, queriesDf(), k = 5)
    assert(noQ.collect().isEmpty)
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(corpus, queriesDf((1L, Seq("cat"))), k = 5, b = 1.5)
    }
  }

  test("rrfFuse: fused ordering, one-sided docs contribute one term, null ranks") {
    val s = spark
    import s.implicits._
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("query_id", "doc_id", "rank")
    val vec = Seq((1L, 11L, 1L), (1L, 12L, 2L)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(lex, vec, k = 10, rrfK = 60)
      .orderBy("fused_rank").collect()
    // doc 11: 1/62 + 1/61 ≈ 0.032524 beats doc 10 (1/61) and doc 12 (1/62)
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(11L, 10L, 12L))
    val d11 = got(0)
    val expected = (math.rint(1e6 / 62) + math.rint(1e6 / 61)) / 1e6
    assert(math.abs(d11.getAs[Double]("fused_score") - expected) < 1e-9)
    assert(d11.getAs[Long]("lex_rank") == 2L && d11.getAs[Long]("vec_rank") == 1L)
    // one-sided entries carry a null rank on the absent side
    assert(got(1).isNullAt(got(1).fieldIndex("vec_rank")))
    assert(got(2).isNullAt(got(2).fieldIndex("lex_rank")))
  }
}
