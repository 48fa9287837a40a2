package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.SparkTestBase
import scala.jdk.CollectionConverters._

/**
 * Port of the mixed-ingest sections of the reference metrics REST suite
 * over the real HTTP transport —
 * rest-tests-jaxrs/.../MetricsITest.groovy:
 *  - :31-69   dualPathTest — data-only inserts surface in GET /metrics
 *             AND its short alias GET /m;
 *  - :71-230  addMixedData — one POST /metrics/raw carrying all four
 *             families, read back per-type in the DESC default order;
 *  - :231-433 the missing-section variants, and the 400 family for
 *             array / empty-string / {} / sections-present-but-empty
 *             payloads.
 *
 * The reference answers 200 on successful mixed ingest; this transport
 * collapses write successes to 204 (HttpTransport scaladoc) — the same
 * success class, asserted as 204 here.
 */
class MixedMetricsHttpITest extends SparkTestBase with HttpSpecSupport {

  private val mapper = new ObjectMapper()

  private def points(body: String): Seq[(Long, JsonNode)] =
    mapper.readTree(body).elements().asScala.toSeq
      .map(n => (n.get("timestamp").asLong, n.get("value")))

  test("dualPathTest: data-only mixed insert lists on GET /metrics and GET /m") {
    val t = Some("t-mix-dual")
    val start = System.currentTimeMillis() - 10 * 60000L
    assert(call("POST", "/metrics/raw", t, Some(
      s"""{"gauges":[{"id":"CG1","data":[
         |  {"timestamp":$start,"value":10.032},
         |  {"timestamp":${start + 60000},"value":9.589}]}],
         |"availabilities":[{"id":"CA1","data":[
         |  {"timestamp":$start,"value":"down"},
         |  {"timestamp":${start + 60000},"value":"up"}]}]}""".stripMargin))._1 == 204)

    for (path <- Seq("/metrics", "/m")) {
      val (st, body) = call("GET", path, t)
      assert(st == 200, s"$path: $body")
      val ids = mapper.readTree(body).elements().asScala.map(_.get("id").asText()).toSet
      assert(ids == Set("CG1", "CA1"), s"$path: $body")
    }
  }

  test("addMixedData: all four families in one POST, read back per type " +
    "in the DESC default order") {
    val t = Some("t-mix-all")
    val s0 = System.currentTimeMillis() - 10 * 60000L
    def m(i: Int) = s0 + i * 60000L
    assert(call("POST", "/metrics/raw", t, Some(
      s"""{"gauges":[
         |  {"id":"G1","data":[{"timestamp":$s0,"value":10.032},{"timestamp":${m(1)},"value":9.589}]},
         |  {"id":"G2","data":[{"timestamp":$s0,"value":33.51},{"timestamp":${m(1)},"value":57.327}]}],
         |"counters":[
         |  {"id":"C1","data":[{"timestamp":$s0,"value":10},{"timestamp":${m(1)},"value":20}]},
         |  {"id":"C2","data":[{"timestamp":$s0,"value":150},{"timestamp":${m(1)},"value":225},{"timestamp":${m(2)},"value":300}]}],
         |"availabilities":[
         |  {"id":"A1","data":[{"timestamp":$s0,"value":"down"},{"timestamp":${m(1)},"value":"up"}]},
         |  {"id":"A2","data":[{"timestamp":$s0,"value":"up"},{"timestamp":${m(1)},"value":"up"}]}],
         |"strings":[
         |  {"id":"S1","data":[{"timestamp":$s0,"value":"server accepting writes"},{"timestamp":${m(1)},"value":"server accepting reads"}]},
         |  {"id":"S2","data":[{"timestamp":$s0,"value":"entering maintenance mode"},{"timestamp":${m(1)},"value":"rebuilding index"}]}]}"""
        .stripMargin))._1 == 204)

    def readback(path: String): Seq[(Long, JsonNode)] = {
      val (st, body) = call("GET", path, t)
      assert(st == 200, s"$path: $body")
      points(body)
    }
    val g1 = readback("/gauges/G1/raw")
    assert(g1.map(_._1) == Seq(m(1), s0) &&
      g1.map(_._2.asDouble) == Seq(9.589, 10.032), g1)
    val g2 = readback("/gauges/G2/raw")
    assert(g2.map(_._2.asDouble) == Seq(57.327, 33.51), g2)
    val c1 = readback("/counters/C1/raw")
    assert(c1.map(_._2.asLong) == Seq(20L, 10L), c1)
    val c2 = readback("/counters/C2/raw")
    assert(c2.map(_._1) == Seq(m(2), m(1), s0) &&
      c2.map(_._2.asLong) == Seq(300L, 225L, 150L), c2)
    val a1 = readback("/availability/A1/raw")
    assert(a1.map(_._2.asText) == Seq("up", "down"), a1)
    val a2 = readback("/availability/A2/raw")
    assert(a2.map(_._2.asText) == Seq("up", "up"), a2)
    val s1 = readback("/strings/S1/raw")
    assert(s1.map(_._2.asText) ==
      Seq("server accepting reads", "server accepting writes"), s1)
    val s2 = readback("/strings/S2/raw")
    assert(s2.map(_._2.asText) ==
      Seq("rebuilding index", "entering maintenance mode"), s2)
  }

  test("partial mixed bodies: each family section is independently optional") {
    val t = Some("t-mix-partial")
    val s0 = System.currentTimeMillis() - 10 * 60000L
    // counters + availabilities only (addMixedDataMissingGauges)
    assert(call("POST", "/metrics/raw", t, Some(
      s"""{"counters":[{"id":"GC1","data":[{"timestamp":$s0,"value":10},{"timestamp":${s0 + 60000},"value":20}]}],
         |"availabilities":[{"id":"GA1","data":[{"timestamp":$s0,"value":"down"},{"timestamp":${s0 + 60000},"value":"up"}]}]}"""
        .stripMargin))._1 == 204)
    assert(points(call("GET", "/counters/GC1/raw", t)._2).map(_._2.asLong) == Seq(20L, 10L))
    assert(points(call("GET", "/availability/GA1/raw", t)._2).map(_._2.asText) == Seq("up", "down"))

    // gauges + counters only (addMixedDataMissingAvailabilities)
    assert(call("POST", "/metrics/raw", t, Some(
      s"""{"gauges":[{"id":"AG1","data":[{"timestamp":$s0,"value":10.032},{"timestamp":${s0 + 60000},"value":9.589}]}],
         |"counters":[{"id":"AC1","data":[{"timestamp":$s0,"value":10},{"timestamp":${s0 + 60000},"value":20}]}]}"""
        .stripMargin))._1 == 204)
    assert(points(call("GET", "/gauges/AG1/raw", t)._2).map(_._2.asDouble) == Seq(9.589, 10.032))
    assert(points(call("GET", "/counters/AC1/raw", t)._2).map(_._2.asLong) == Seq(20L, 10L))
  }

  test("invalid mixed payloads answer 400: a JSON array, an empty body, " +
    "an empty object, and sections present but all empty") {
    val t = Some("t-mix-bad")
    assert(call("POST", "/metrics/raw", t, Some("[]"))._1 == 400)
    assert(call("POST", "/metrics/raw", t, Some(""))._1 == 400)
    assert(call("POST", "/metrics/raw", t, Some("{}"))._1 == 400)
    assert(call("POST", "/metrics/raw", t,
      Some("""{"gauges":[],"counters":[]}"""))._1 == 400)
  }
}
