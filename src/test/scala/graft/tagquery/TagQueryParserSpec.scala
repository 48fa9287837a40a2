package graft.tagquery

import graft.SparkTestBase
import graft.tagquery.TagQueryParser._
import org.apache.spark.sql.functions.col

/** Tag-query grammar parity with the reference ANTLR grammar
  * (TagQuery.g4:40-110) + compile semantics over a catalog frame
  * (FIXTURES.md F-D vectors). */
class TagQueryParserSpec extends SparkTestBase {

  test("pair forms parse") {
    assert(parse("env") == HasKey("env"))
    assert(parse("NOT env") == NotKey("env"))
    assert(parse("env = prod") == Eq("env", "prod"))
    assert(parse("env != prod") == Neq("env", "prod"))
    assert(parse("env ~ 'p.*'") == Regex("env", "p.*"))
    assert(parse("env !~ 'p.*'") == NotRegex("env", "p.*"))
    assert(parse("pod IN [p1, p2]") == In("pod", Seq("p1", "p2")))
    assert(parse("pod NOT IN [p1]") == NotIn("pod", Seq("p1")))
  }

  test("AND/OR are equal precedence, left associative (ANTLR left recursion)") {
    assert(parse("a OR b AND c") == And(Or(HasKey("a"), HasKey("b")), HasKey("c")))
    assert(parse("a AND b OR c") == Or(And(HasKey("a"), HasKey("b")), HasKey("c")))
    assert(parse("a OR (b AND c)") == Or(HasKey("a"), And(HasKey("b"), HasKey("c"))))
  }

  test("quoted values: escapes, spaces, unicode") {
    assert(parse("k = 'a b'") == Eq("k", "a b"))
    assert(parse("""k = 'don\'t'""") == Eq("k", "don't"))
    assert(parse("""k = 'tab\there'""") == Eq("k", "tab\there"))
    assert(parse("""k = 'A'""") == Eq("k", "A"))
    intercept[IllegalArgumentException](parse("k = 'unterminated"))
  }

  test("junk is rejected") {
    intercept[IllegalArgumentException](parse(""))
    intercept[IllegalArgumentException](parse("a AND"))
    intercept[IllegalArgumentException](parse("a = "))
    intercept[IllegalArgumentException](parse("(a = b"))
    intercept[IllegalArgumentException](parse("a ! b"))
  }

  test("compile semantics over a catalog (F-D)") {
    import scala.jdk.CollectionConverters._
    val s = spark
    import s.implicits._
    val cat = Seq(
      ("m1", Map("env" -> "prod", "dc" -> "east", "pod_id" -> "p1")),
      ("m2", Map("env" -> "prod", "dc" -> "west", "pod_id" -> "p2")),
      ("m3", Map("env" -> "dev", "dc" -> "east", "pod_id" -> "p3", "odd" -> "y")),
      ("m4", Map("env" -> "dev", "dc" -> "west", "pod_id" -> "p4")),
      ("m5", Map("dc" -> "east", "pod_id" -> "p5"))
    ).toDF("metric", "tags")
    def ids(q: String): Set[String] =
      cat.filter(TagQueryParser.compile(q, col("tags")))
        .select("metric").collect().map(_.getString(0)).toSet

    assert(ids("env = prod") == Set("m1", "m2"))
    assert(ids("env != prod") == Set("m3", "m4")) // m5 lacks env → excluded
    assert(ids("dc ~ 'e.*'") == Set("m1", "m3", "m5"))
    assert(ids("dc !~ 'e.*'") == Set("m2", "m4"))
    assert(ids("pod_id IN [p1, p2]") == Set("m1", "m2"))
    assert(ids("pod_id NOT IN [p1]") == Set("m2", "m3", "m4", "m5"))
    assert(ids("NOT odd") == Set("m1", "m2", "m4", "m5"))
    assert(ids("odd") == Set("m3"))
    assert(ids("(env = prod AND dc = east) OR pod_id = p5") == Set("m1", "m5"))
    assert(ids("dc ~ '*'") == Set("m1", "m2", "m3", "m4", "m5"))
    assert(ids("dc ~ '!east'") == Set("m2", "m4")) // PatternUtil '!' negation
    // literal fast path (regex-free pattern compiles to equality)
    assert(ids("dc ~ 'east'") == Set("m1", "m3", "m5"))
    // empty IN lists
    assert(ids("pod_id IN []") == Set.empty)
    assert(ids("env NOT IN []") == Set("m1", "m2", "m3", "m4"))
  }
}
