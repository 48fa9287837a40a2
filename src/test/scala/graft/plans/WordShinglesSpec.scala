package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Native shingle expression: codegen/interpreted parity and edge cases. */
class WordShinglesSpec extends SparkTestBase {

  private def run(text: String, k: Int, codegen: Boolean): Seq[String] = {
    val s = spark
    import s.implicits._
    s.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
    s.conf.set("spark.sql.codegen.factoryMode",
      if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN")
    try Seq(text).toDF("t")
      .select(WordShingles(split(col("t"), " "), k).as("sh"))
      .collect().head.getSeq[String](0)
    finally {
      s.conf.set("spark.sql.codegen.wholeStage", "true")
      s.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("shingle windows, both execution modes") {
    for (cg <- Seq(true, false)) {
      assert(run("a b c d", 3, cg) == Seq("a b c", "b c d"))
      assert(run("a b c d", 1, cg) == Seq("a", "b", "c", "d"))
      assert(run("a b", 3, cg) == Seq.empty) // shorter than k
      assert(run("solo", 1, cg) == Seq("solo"))
    }
  }

  test("null input → null output") {
    val s = spark
    import s.implicits._
    val got = Seq(Option.empty[String]).toDF("t")
      .select(WordShingles(split(col("t"), " "), 2).as("sh")).collect().head
    assert(got.isNullAt(0))
  }

  test("matches the composable higher-order formulation") {
    val s = spark
    import s.implicits._
    val texts = Seq("x y z w v", "p q", "one two three four")
    val df = texts.toDF("t")
    val ws = split(col("t"), " ")
    val hof = transform(sequence(lit(0), size(ws) - 3),
      i => concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2), element_at(ws, i + 3)))
    val both = df.filter(size(ws) >= 3)
      .select(WordShingles(ws, 3).as("native"), hof.as("hof")).collect()
    both.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }
}
