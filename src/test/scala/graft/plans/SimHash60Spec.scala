package graft.plans

import graft.SparkTestBase
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Native SimHash expression: parity with the composed explode/aggregate
  * formulation it replaced, codegen/interpreted parity, SQL registration,
  * and a seeded recall property for the full MinHash-LSH pipeline. */
class SimHash60Spec extends SparkTestBase {

  private def docsDf(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("matches the composed explode + bit-vote aggregate formulation") {
    val s = spark
    import s.implicits._
    val docs = docsDf((1L, "the quick brown fox"), (2L, "a b  c"), // double space → empty token
      (3L, "SAME same Same"), (4L, "x"))
    // the replaced pipeline, reconstructed inline
    val tok = docs
      .select(col("doc_id"), explode(array_distinct(split(lower(col("text")), " "))).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok").cast("binary")), 1, 15), 16, 10).cast("long"))
    val bitSums = (0 until 60).map { j =>
      sum(shiftright(col("h"), j) % 2 * 2 - 1).as(s"s$j")
    }
    val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 60).map { j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val composed = agg.select(col("doc_id"), fp.as("simhash")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = docs.select(col("doc_id"), SimHash60(col("text")).as("simhash")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == composed)
  }

  test("codegen and interpreted modes agree; SQL registration works") {
    val s = spark
    import s.implicits._
    val df = Seq("alpha beta gamma").toDF("t")
    def one(codegen: Boolean): Long = {
      s.conf.set("spark.sql.codegen.factoryMode", if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN")
      try df.select(SimHash60(col("t"))).collect().head.getLong(0)
      finally s.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(one(codegen = true) == one(codegen = false))
    // SQL surface (registry injection — getOrCreate reuses the session, so
    // register directly like GraftExtensions would)
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      s.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    df.createOrReplaceTempView("sh_docs")
    val viaSql = s.sql("SELECT simhash60(t) FROM sh_docs").collect().head.getLong(0)
    assert(viaSql == one(codegen = true))
  }

  test("recall property: planted near-dups at J≈0.9 are all found (seeded)") {
    val rnd = new scala.util.Random(7)
    // 30 planted pairs: 40-token docs differing in ONE mid-doc token —
    // 3 of 38 trigram shingles change, so shingle-level J = 35/41 ≈ 0.854;
    // miss probability per pair with 20x3 banding is (1-0.854³)²⁰ ≈ 2e-9 —
    // plus 60 unrelated noise docs that must produce no pairs
    val planted = (0 until 30).map { i =>
      val base = Seq.tabulate(40)(j => s"w${i}_$j")
      val mutated = base.updated(20, s"mut${i}_a")
      (i.toLong * 2, base.mkString(" "), i.toLong * 2 + 1, mutated.mkString(" "))
    }
    val noise = (0 until 60).map { i =>
      (1000L + i, Seq.fill(40)(s"n${i}_${rnd.nextInt(100000)}").mkString(" "))
    }
    val docs = docsDf(
      planted.flatMap(p => Seq((p._1, p._2), (p._3, p._4))) ++ noise: _*)
    val pairs = Dedup.nearDupPairs(docs, shingleK = 3, threshold = 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = planted.map(p => (p._1, p._3)).toSet
    assert(pairs == expected) // perfect recall on planted pairs, zero noise pairs
  }
}
