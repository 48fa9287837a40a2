package graft.tagquery

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/**
 * The reference's ExpressionTagQueryITest vectors, ported 1:1
 * (ExpressionTagQueryITest.java:52-156: fixture :196-240, queries with
 * lowercase keywords, no-space `=`, dotted tag names, dotted unquoted
 * values) — the grammar-compat suite for TagQueryParser over the gauge
 * and counter tag fixtures.
 */
class ExpressionTagQueryVectorsSpec extends SparkTestBase {

  private lazy val gauges = {
    val s = spark
    import s.implicits._
    Seq(
      ("m1", Map("a1" -> "abc", "a2" -> "jkl")),
      ("m2", Map("a1" -> "defg")),
      ("m3", Map("a1" -> "jkl")),
      ("m4", Map("a1" -> "defg", "a2" -> "jkl")),
      ("m5", Map("a1" -> "defg", "a2" -> "xyz")),
      ("m6", Map("a2" -> "defg")),
      ("mA", Map("hostname" -> "webfin01")),
      ("mB", Map("hostname" -> "webswe02")),
      ("mC", Map("hostname" -> "backendfin01")),
      ("mD", Map("hostname" -> "backendswe02")),
      ("mE", Map("owner" -> "hede")),
      ("mF", Map("owner" -> "hades")),
      ("mG", Map("owner" -> "had")),
      ("gl1", Map("label" -> "test:test,test1:test2,test3:test4")),
      ("gl2", Map("label" -> "test1:test2,test3:test4")),
      ("gl3", Map("label" -> "test:,test1:test2"))
    ).toDF("metric", "tags")
  }

  private lazy val counters = {
    val s = spark
    import s.implicits._
    Seq(
      ("c1", Map("a1" -> "5")),
      ("c2", Map("a2.label1" -> "5")),
      ("c3", Map("a2.label1" -> "5.6.7"))
    ).toDF("metric", "tags")
  }

  private def ids(df: org.apache.spark.sql.DataFrame, q: String): Set[String] =
    df.filter(TagQueryParser.compile(q, col("tags")))
      .select("metric").collect().map(_.getString(0)).toSet

  test("gauge vectors (ExpressionTagQueryITest.tagValueSearch)") {
    assert(ids(gauges, "a1 ='abc'") == Set("m1"))
    assert(ids(gauges, "a1 ~ '*'") == Set("m1", "m2", "m3", "m4", "m5"))
    assert(ids(gauges, "a1") == Set("m1", "m2", "m3", "m4", "m5"))
    assert(ids(gauges, "not a1") ==
      Set("m6", "mA", "mB", "mC", "mD", "mE", "mF", "mG", "gl1", "gl2", "gl3"))
    assert(ids(gauges, "not a1 and not a2") ==
      Set("mA", "mB", "mC", "mD", "mE", "mF", "mG", "gl1", "gl2", "gl3"))
    assert(ids(gauges, "a1 != 'abc'") == Set("m2", "m3", "m4", "m5"))
    assert(ids(gauges, "a1 ='abc' OR a2='defg'") == Set("m1", "m6"))
    assert(ids(gauges, "a1 ='11' OR a2 = '22'") == Set.empty)
    assert(ids(gauges, "a1='defg' AND (a2='jkl' OR a2='xyz')") == Set("m4", "m5"))
    assert(ids(gauges, "a1 ='defg' AND (a2 in ['jkl', 'xyz'])") == Set("m4", "m5"))
    assert(ids(gauges, "a1 ='defg' AND (a2 not in ['jkl'])") == Set("m5"))
    assert(ids(gauges, "hostname ~'web.*'") == Set("mA", "mB"))
    assert(ids(gauges, "hostname ~'web.*' or a1~'*'") ==
      Set("m1", "m2", "m3", "m4", "m5", "mA", "mB"))
    assert(ids(gauges, "a1 ='abc' and a1='abc'") == Set("m1"))
    assert(ids(gauges, "a1=abc or a1=jkl") == Set("m1", "m3"))
    assert(ids(gauges, "a1=defg AND (a2 in [jkl, xyz])") == Set("m4", "m5"))
    assert(ids(gauges, "a1 !~ 'def.*'") == Set("m1", "m3"))
  }

  test("dotted tag names and dotted unquoted values (tagValueSearchWithDot)") {
    assert(ids(counters, "a2.label1 =5") == Set("c2"))
    assert(ids(counters, "a2.label1 = '5'") == Set("c2"))
    assert(ids(counters, "a2.label1 = '5.6.7'") == Set("c3"))
    assert(ids(counters, "a2.label1 = 5.6.7") == Set("c3"))
    assert(ids(counters, "a2.label1") == Set("c2", "c3"))
    assert(ids(counters, "a2.label1 ~ '5.*'") == Set("c2", "c3"))
  }

  test("bad syntax rejected (badTagValueSearch)") {
    intercept[IllegalArgumentException](TagQueryParser.parse("a1 == abc'"))
  }

  // ---- TagsITest simple `name:pattern` syntax vectors (fixture
  // TagsITest.java:406-439, queries :84-138) ----

  private lazy val simpleFixture = {
    val s = spark
    import s.implicits._
    Seq(
      ("m1", Map("a1" -> "1")),
      ("m2", Map("a1" -> "2", "a3" -> "3")),
      ("m3", Map("a1" -> "2", "a2" -> "2")),
      ("m4", Map("a1" -> "2", "a2" -> "3")),
      ("m5", Map("a1" -> "2", "a2" -> "4")),
      ("m6", Map("a2" -> "4")),
      ("mA", Map("hostname" -> "webfin01")),
      ("mB", Map("hostname" -> "webswe02")),
      ("mC", Map("hostname" -> "backendfin01")),
      ("mD", Map("hostname" -> "backendswe02")),
      ("mE", Map("owner" -> "hede")),
      ("mF", Map("owner" -> "hades")),
      ("mG", Map("owner" -> "had"))
    ).toDF("metric", "tags")
  }

  private def simpleIds(q: String): Set[String] =
    simpleFixture.filter(TagQueryParser.compileSimple(q, col("tags")))
      .select("metric").collect().map(_.getString(0)).toSet

  test("simple syntax vectors (TagsITest)") {
    assert(simpleIds("a1:*") == Set("m1", "m2", "m3", "m4", "m5"))
    assert(simpleIds("a1:*,a2:2") == Set("m3"))
    assert(simpleIds("a1:*,a2:2|3") == Set("m3", "m4"))
    assert(simpleIds("a2:2|3") == Set("m3", "m4"))
    assert(simpleIds("a1:*,a2:*") == Set("m3", "m4", "m5"))
    assert(simpleIds("a1:*,a5:*") == Set.empty)
    assert(simpleIds("a4:*,a5:none") == Set.empty)
    assert(simpleIds("a1:2,a2:2") == Set("m3"))
    // NOT operator (leading !)
    assert(simpleIds("a2:!4") == Set("m3", "m4"))
    assert(simpleIds("a1:2,a2:!4") == Set("m3", "m4"))
    assert(simpleIds("a2:!4|3") == Set("m3"))
  }

  test("simple syntax: a !-prefixed NAME means the tag must not exist " +
    "(SimpleTagQueryParser GROUP_C, value ignored)") {
    // reference: key.startsWith("!") routes to tagNotExistsFilter(name)
    // regardless of the value (SimpleTagQueryParserTest.testReOrder's
    // '!seek' entry; SimpleTagQueryParser.java:156-158,467)
    assert(simpleIds("a1:*,!a2:x") == Set("m1", "m2"))
    assert(simpleIds("!a1:ignored") ==
      Set("m6", "mA", "mB", "mC", "mD", "mE", "mF", "mG"))
    assert(simpleIds("!a9:x") == simpleFixture.select("metric")
      .collect().map(_.getString(0)).toSet)
  }
}
