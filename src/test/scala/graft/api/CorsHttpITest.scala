package graft.api

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkTestBase
import scala.jdk.CollectionConverters._

/**
 * Port of the reference CORS suite over the real HTTP transport —
 * rest-tests-jaxrs/.../CORSITest.groovy, against a transport configured
 * like the reference test deployment (pom.xml:216-217:
 * allowed-cors-origins = the two test origins, extra allow headers =
 * random-header1,random-header2):
 *  - :40-62   preflight on /ping: 200, empty, full header set; a junk
 *             Access-Control-Allow-Headers REQUEST header is ignored
 *  - :64-86   bad origins (literal `*`, wrong scheme) → 400, empty
 *  - :88-112  subdomain origins are allowed and echoed
 *  - :114-186 preflight needs no tenant even on data routes; actual
 *             GETs with Origin carry data AND the CORS headers
 *  - :219-242 bad-origin actual request → 400, empty, but the CORS
 *             headers still present echoing the bad origin
 *  - :245+    POST query routes carry the headers too
 */
class CorsHttpITest extends SparkTestBase with HttpSpecSupport {

  private val testOrigin = "http://test.hawkular.org"
  override protected def allowedCorsOrigins =
    s"$testOrigin,https://secure.hawkular.io"
  override protected def extraCorsAllowHeaders =
    Some("random-header1,random-header2")

  private val expectedAllowHeaders =
    Cors.DefaultAllowHeaders + ",random-header1,random-header2"
  private val mapper = new ObjectMapper()

  private def assertCorsHeaders(h: Map[String, String], origin: String): Unit = {
    // callH lower-cases response header names
    assert(h.get(Cors.AllowMethods.toLowerCase).contains(Cors.DefaultAllowMethods), h)
    assert(h.get(Cors.AllowHeaders.toLowerCase).contains(expectedAllowHeaders), h)
    assert(h.get(Cors.AllowOrigin.toLowerCase).contains(origin), h)
    assert(h.get(Cors.AllowCredentials.toLowerCase).contains("true"), h)
    assert(h.get(Cors.MaxAge.toLowerCase).contains((72 * 60 * 60).toString), h)
  }

  test("preflight with an allowed origin: 200, empty body, full CORS header " +
    "set; a client-sent Access-Control-Allow-Headers is ignored") {
    val (st, body, h) = callH("OPTIONS", "/ping",
      headers = Map(
        "Access-Control-Request-Method" -> "POST",
        Cors.AllowHeaders -> "test-header", // ignored by the container
        Cors.Origin -> testOrigin))
    assert(st == 200 && body.isEmpty, s"$st $body")
    assertCorsHeaders(h, testOrigin)
  }

  test("bad origins answer 400 with an empty body: the literal *, and a " +
    "scheme mismatch on an otherwise-allowed host") {
    val (s1, b1, _) = callH("OPTIONS", "/gauges/test/raw",
      headers = Map("Access-Control-Request-Method" -> "OPTIONS",
        Cors.Origin -> "*"))
    assert(s1 == 400 && b1.isEmpty, s"$s1 $b1")
    val (s2, b2, _) = callH("OPTIONS", "/gauges/test/raw",
      headers = Map("Access-Control-Request-Method" -> "GET",
        Cors.Origin -> "https://test.hawkular.org"))
    assert(s2 == 400 && b2.isEmpty, s"$s2 $b2")
  }

  test("subdomains of an allowed origin are allowed and echoed back") {
    val sub = "http://tester.test.hawkular.org"
    val (st, body, h) = callH("OPTIONS", "/gauges/test/raw",
      headers = Map("Access-Control-Request-Method" -> "GET",
        Cors.Origin -> sub))
    assert(st == 200 && body.isEmpty, s"$st $body")
    assertCorsHeaders(h, sub)
  }

  test("preflight needs no tenant even on data routes; actual requests with " +
    "an allowed origin answer data plus the CORS headers") {
    val t = Some("t-cors-data")
    val start = System.currentTimeMillis() - 20 * 60000L
    // the reference answers 200 here; this transport collapses write
    // successes to 204 (HttpTransport scaladoc) — same success class
    assert(call("POST", "/gauges/raw", t, Some(
      s"""[{"id":"m11","data":[{"timestamp":$start,"value":1.1},
         |{"timestamp":${start + 60000},"value":1.2}]},
         |{"id":"m12","data":[{"timestamp":$start,"value":2.1},
         |{"timestamp":${start + 60000},"value":2.2}]}]""".stripMargin))._1 == 204)

    def assertDefs(body: String): Unit = {
      val defs = mapper.readTree(body).elements().asScala.toSeq.sortBy(_.get("id").asText())
      assert(defs.map(_.get("id").asText()) == Seq("m11", "m12"), body)
      defs.foreach { d =>
        assert(d.get("type").asText() == "gauge" && d.get("dataRetention").asInt() == 7, body)
        assert(d.get("minTimestamp").asLong() == start, body)
        assert(d.get("maxTimestamp").asLong() == start + 60000, body)
      }
    }
    val (gs, gbody) = call("GET", "/metrics?type=gauge&timestamps=true", t)
    assert(gs == 200, gbody)
    assertDefs(gbody)

    // preflight the same path WITHOUT a tenant header: never routed
    val (ps, pbody, ph) = callH("OPTIONS", "/metrics?type=gauge",
      headers = Map("Access-Control-Request-Method" -> "GET",
        Cors.Origin -> testOrigin))
    assert(ps == 200 && pbody.isEmpty, s"$ps $pbody")
    assertCorsHeaders(ph, testOrigin)

    // re-query with Origin riding along: data AND headers
    val (rs, rbody, rh) = callH("GET", "/metrics?type=gauge&timestamps=true", t,
      headers = Map(Cors.Origin -> testOrigin))
    assert(rs == 200, rbody)
    assertDefs(rbody)
    assertCorsHeaders(rh, testOrigin)
  }

  test("an actual request with a bad origin answers 400, empty, yet still " +
    "carries the CORS headers echoing that origin") {
    val t = Some("t-cors-bad")
    val wrongScheme = "https://test.hawkular.org"
    val (st, body, h) = callH("GET", "/metrics?type=gauge", t,
      headers = Map("Access-Control-Request-Method" -> "GET",
        Cors.Origin -> wrongScheme))
    assert(st == 400 && body.isEmpty, s"$st $body")
    assertCorsHeaders(h, wrongScheme)
  }

  test("POST query routes carry the CORS headers too") {
    val t = Some("t-cors-post")
    val start = System.currentTimeMillis() - 20 * 60000L
    assert(call("POST", "/gauges/raw", t, Some(
      s"""[{"id":"m12","data":[{"timestamp":$start,"value":2.1},
         |{"timestamp":${start + 60000},"value":2.2}]}]""".stripMargin))._1 == 204)
    val (st, body, h) = callH("POST", "/gauges/raw/query", t,
      Some(s"""{"ids":["m12"],"start":${start - 1},"end":${start + 120000}}"""),
      headers = Map(Cors.Origin -> testOrigin))
    assert(st == 200, s"$st $body")
    val data = mapper.readTree(body)
    assert(data.get(0).get("id").asText() == "m12" &&
      data.get(0).get("data").size() == 2, body)
    assertCorsHeaders(h, testOrigin)
  }
}
