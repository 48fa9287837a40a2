package graft.plans

import graft.SparkTestBase

/** SQL-surface registration of the native expressions. The function
  * triples are injected into the shared session's registry — the same
  * builders `spark.sql.extensions=graft.plans.GraftExtensions` wires at
  * session build. */
class GraftExtensionsSpec extends SparkTestBase {

  test("word_shingles and vector_dot are SQL-callable") {
    val registry = spark.sessionState.functionRegistry
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
    val sh = spark.sql("SELECT word_shingles(split('a b c d', ' '), 3) AS sh")
      .collect().head.getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val dot = spark.sql("SELECT vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(dot == 11.0)
    intercept[Exception](spark.sql("SELECT word_shingles(array('a'), 'x')").collect())
  }

  test("graft_tag_match compiles the tag grammar inside SQL") {
    val registry = spark.sessionState.functionRegistry
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
    val s = spark
    import s.implicits._
    Seq(
      ("m1", Map("type" -> "error", "seg" -> "s1")),
      ("m2", Map("type" -> "view", "seg" -> "s1")),
      ("m3", Map("type" -> "error", "seg" -> "s4")),
      ("m4", Map("seg" -> "s1"))
    ).toDF("metric", "tags").createOrReplaceTempView("cat_sql")
    val got = spark.sql(
      "SELECT metric FROM cat_sql WHERE graft_tag_match(tags, 'type = error AND seg IN [s1, s2]')")
      .collect().map(_.getString(0)).toSet
    assert(got == Set("m1"))
    // non-literal query must fail at resolution, not silently no-op
    intercept[Exception](
      spark.sql("SELECT graft_tag_match(tags, metric) FROM cat_sql").collect())
  }
}
