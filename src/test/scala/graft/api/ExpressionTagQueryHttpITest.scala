package graft.api

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkTestBase
import scala.jdk.CollectionConverters._

/**
 * Port of the reference tag-query-grammar REST integration suite over
 * the real HTTP transport — the assertions of
 * rest-tests-jaxrs/.../ExpressionTagQueryITest.groovy:35-211: the full
 * expression grammar (`~ '*'` existence, AND/OR/parens, != and !~
 * (exist-and-not-match), IN / NOT IN with quoted and UNQUOTED members,
 * unquoted scalar values, bare-name existence, `not name`, dotted tag
 * names, case-sensitive names, no-match → 204) driving
 * GET /metrics?tags=... against the six-metric fixture, per metric type.
 */
class ExpressionTagQueryHttpITest extends SparkTestBase with HttpSpecSupport {

  private val mapper = new ObjectMapper()
  private val MetricTypes = Seq("gauges", "counters", "availability", "strings")

  private val Fixture = Seq(
    ("m1", """{"a1":"d","b1":"B","a2":"a"}"""),
    ("m2", """{"a1":"xyz","b1":"B","a2":"b"}"""),
    ("m3", """{"a1":"abcd","b1":"C"}"""),
    ("m4", """{"a1":"ab","b1":"B"}"""),
    ("m5", """{"a1":"xyz","b1":"C"}"""),
    ("m6", """{"c1":"C","a.b":"c.d"}"""))

  private def ids(body: String): Set[String] =
    mapper.readTree(body).elements().asScala.map(_.get("id").asText).toSet

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)

  test("the expression tag-query grammar selects the reference's id sets on " +
    "every metric type") {
    MetricTypes.foreach { path =>
      val t = Some(s"t-exprtag-$path")
      Fixture.foreach { case (id, tags) =>
        assert(call("POST", s"/$path", t,
          Some(s"""{"id":"$id","tags":$tags}"""))._1 == 204, s"$path/$id")
      }

      def q(expr: String): (Int, Set[String]) = {
        val (st, body) = call("GET", s"/metrics?tags=${enc(expr)}", t)
        (st, if (st == 200) ids(body) else Set.empty)
      }
      def expect(expr: String, expected: String*): Unit = {
        val (st, got) = q(expr)
        assert(st == 200 && got == expected.toSet,
          s"$path: `$expr` → $st $got, expected ${expected.toSet}")
      }
      def expectEmpty(expr: String): Unit = {
        val (st, _) = q(expr)
        assert(st == 204, s"$path: `$expr` → $st, expected 204")
      }

      expect("a1 ~ '*'", "m1", "m2", "m3", "m4", "m5")
      expect("a1 ~ '*' AND b1 = 'B'", "m1", "m2", "m4")
      expect("a1 ~ '*' AND b1 != 'B'", "m3", "m5")
      expect("a1 IN ['xyz','abcd'] AND b1 ~ '*'", "m2", "m3", "m5")
      expect("c1 ~ '*' OR b1 != 'B'", "m3", "m5", "m6")
      expect("c1 ~ '*' OR (b1 != 'B' AND a1 = 'abcd')", "m3", "m6")
      expect("a1 NOT IN ['xyz', 'abcd']", "m1", "m4")
      expect("a1 NOT IN ['xyz','abcd'] OR b1 = 'B'", "m1", "m2", "m4")
      expect("a1 = 'd' OR ( a1 = 'ab' OR ( c1 ~ '*'))", "m1", "m4", "m6")
      expectEmpty("c1 = '100'")
      expectEmpty("c1 = 100")
      expect("a1 = d OR a1 = abcd", "m1", "m3") // unquoted scalars
      expect("c1 = '100' OR a1 = 'xyz' OR a1 IN ['abcd']", "m2", "m3", "m5")
      expect("c1 = '100' OR a1 = xyz OR a1 IN [abcd]", "m2", "m3", "m5")
      expectEmpty("A1 in ['xyz', 'abcd']") // tag names are case-sensitive
      expect("a2", "m1", "m2") // bare name = existence
      expect("not a2", "m3", "m4", "m5", "m6")
      expect("a.b", "m6") // dotted tag names
      expect("a.b = c.d", "m6")
      expect("a.b = 'c.d'", "m6")
      expect("a.b ~ 'c.*'", "m6")
      // !~ = tag EXISTS and value does not match
      expect("a1 !~ 'ab.*'", "m1", "m2", "m5")
      expect("a1 !~ 'ab.+'", "m1", "m2", "m4", "m5")
    }
  }
}
