package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.SparkTestBase
import scala.jdk.CollectionConverters._

/**
 * Port of the reference availability REST integration suite over the
 * real HTTP transport — the assertions of
 * rest-tests-jaxrs/.../AvailabilityITest.groovy:31-46 (invalid
 * range/bucket configs), :47-79 (empty payloads), :104-133 (invalid
 * datapoint shapes answer 400: missing/null/mistyped timestamp,
 * missing/null/array value), :88-103 + :185-241 (single-definition GET
 * carries minTimestamp/maxTimestamp once data exists, absent before;
 * ?timestamps=true on the collection GETs), :134-184
 * (addTaggedDataPoints — DESC fetch, per-point tags), :242-309
 * (availability/raw/query answers the nested [{id, data}] shape with
 * availability TEXT codes).
 */
class AvailabilityHttpITest extends SparkTestBase with HttpSpecSupport {

  private val mapper = new ObjectMapper()

  private def parse(body: String): Seq[JsonNode] =
    mapper.readTree(body).elements().asScala.toSeq

  private def point(n: JsonNode): (Long, String) =
    (n.get("timestamp").asLong, n.get("value").asText)

  // AvailabilityITest.groovy:31-46
  test("invalid range and double bucket config answer 400") {
    val t = Some("t-av-bad")
    assert(call("GET", "/availability/test/raw?start=1000&end=500", t)._1 == 400)
    assert(call("GET",
      "/availability/test/stats?start=500&end=100&buckets=10&bucketDuration=10ms", t)._1 == 400)
  }

  // AvailabilityITest.groovy:47-79
  test("empty payloads answer 400 on create and both ingest routes") {
    val t = Some("t-av-empty")
    assert(call("POST", "/availability", t, Some(""))._1 == 400)
    assert(call("POST", "/availability/pimpo/raw", t, Some(""))._1 == 400)
    assert(call("POST", "/availability/pimpo/raw", t, Some("[]"))._1 == 400)
    assert(call("POST", "/availability/raw", t, Some(""))._1 == 400)
    assert(call("POST", "/availability/raw", t, Some("[]"))._1 == 400)
  }

  // AvailabilityITest.groovy:104-133
  test("invalid datapoint shapes answer 400, never a silent coercion") {
    val t = Some("t-av-invalid")
    def bad(points: String): Unit = {
      val (st, body) = call("POST", "/availability/test/raw", t, Some(points))
      assert(st == 400, s"expected 400 for $points, got $st $body")
    }
    bad("""[{"value":"up"}]""")                  // missing timestamp
    bad("""[{"timestamp":null,"value":"up"}]""") // null timestamp
    bad("""[{"timestamp":"aaa","value":"up"}]""")// mistyped timestamp
    bad("""[{"timestamp":13}]""")                // missing value
    bad("""[{"timestamp":13,"value":null}]""")   // null value
    bad("""[{"timestamp":13,"value":["dsqdqs"]}]""") // non-scalar value
  }

  // AvailabilityITest.groovy:88-103 + 185-241
  test("single-definition GET gains minTimestamp/maxTimestamp once data " +
    "exists; collection GETs enrich under timestamps=true") {
    val t = Some("t-av-minmax")
    assert(call("POST", "/availability", t, Some("""{"id":"minmaxtest"}"""))._1 == 204)

    val (s0, b0) = call("GET", "/availability/minmaxtest", t)
    assert(s0 == 200, b0)
    val d0 = mapper.readTree(b0)
    assert(d0.get("id").asText == "minmaxtest" && d0.get("type").asText == "availability", b0)
    assert(!d0.has("minTimestamp") && !d0.has("maxTimestamp"),
      s"no data yet → no timestamp attrs: $b0")

    assert(call("POST", "/availability/minmaxtest/raw", t,
      Some("""[{"timestamp":3,"value":"up"}]"""))._1 == 204)
    val (s1, b1) = call("GET", "/availability/minmaxtest", t)
    assert(s1 == 200, b1)
    val d1 = mapper.readTree(b1)
    assert(d1.get("minTimestamp").asLong == 3 && d1.get("maxTimestamp").asLong == 3, b1)

    assert(call("POST", "/availability/minmaxtest/raw", t, Some(
      """[{"timestamp":1,"value":"down"},{"timestamp":2,"value":"up"},
        |{"timestamp":4,"value":"down"}]""".stripMargin))._1 == 204)
    val (s2, b2) = call("GET", "/availability/minmaxtest", t)
    assert(s2 == 200, b2)
    val d2 = mapper.readTree(b2)
    assert(d2.get("minTimestamp").asLong == 1 && d2.get("maxTimestamp").asLong == 4, b2)

    Seq("/availability?timestamps=true", "/metrics?timestamps=true").foreach { path =>
      val (ls, lb) = call("GET", path, t)
      assert(ls == 200, s"$path: $lb")
      val m = parse(lb).find(_.get("id").asText == "minmaxtest")
      assert(m.isDefined, s"$path: $lb")
      assert(m.get.get("minTimestamp").asLong == 1 &&
        m.get.get("maxTimestamp").asLong == 4, s"$path: $lb")
    }
  }

  // AvailabilityITest.groovy:81-87 (shouldStoreLargePayloadSize +
  // RESTTest.checkLargePayload:158-166): one ingest POST larger than the
  // reference's write-batch size (BatchStatementTransformer
  // .DEFAULT_BATCH_SIZE = 10) must land whole — and, beyond the
  // reference's 200-only check, every point must fetch back
  test("a payload larger than one write batch lands whole") {
    val t = Some("t-av-large")
    val codes = Seq("up", "down", "unknown", "admin")
    val points = (0 to 20).map(i =>
      s"""{"timestamp":$i,"value":"${codes(i % codes.length)}"}""").mkString(",")
    assert(call("POST", "/availability/test/raw", t, Some(s"[$points]"))._1 == 204)
    val (st, body) = call("GET", "/availability/test/raw?start=0&end=100&order=asc", t)
    assert(st == 200, body)
    val got = parse(body).map(point)
    assert(got.size == 21, s"all 21 points must land: $body")
    assert(got == (0 to 20).map(i => (i.toLong, codes(i % codes.length))), body)
  }

  // AvailabilityITest.groovy:134-184
  test("tagged availability points fetch back DESC with their tags and text " +
    "codes") {
    val t = Some("t-av-tagged")
    val start = System.currentTimeMillis() - 30 * 60000L
    assert(call("POST", "/availability/A1/raw", t, Some(
      s"""[{"timestamp":$start,"value":"up","tags":{"x":"1","y":"2"}},
         |{"timestamp":${start + 60000},"value":"down","tags":{"y":"3","z":"5"}},
         |{"timestamp":${start + 3 * 60000},"value":"up","tags":{"x":"4","z":"6"}}]"""
        .stripMargin))._1 == 204)

    val (st, body) = call("GET", "/availability/A1/raw", t)
    assert(st == 200, body)
    val got = parse(body)
    assert(got.map(point) == Seq(
      (start + 3 * 60000, "up"), (start + 60000, "down"), (start, "up")), body)
    assert(got(1).get("tags").get("z").asText == "5", body)
  }

  // AvailabilityITest.groovy:242-309
  test("POST /availability/raw/query answers the nested [{id, data}] shape") {
    val t = Some("t-av-query")
    val start = System.currentTimeMillis() - 2 * 3600000L
    assert(call("POST", "/availability/raw", t, Some(
      s"""[{"id":"A1","data":[{"timestamp":$start,"value":"up"},
         |  {"timestamp":${start + 60000},"value":"down"}]},
         | {"id":"A2","data":[{"timestamp":$start,"value":"up"},
         |  {"timestamp":${start + 60000},"value":"up"}]},
         | {"id":"A3","data":[{"timestamp":$start,"value":"down"},
         |  {"timestamp":${start + 60000},"value":"down"}]}]""".stripMargin))._1 == 204)

    val (st, body) = call("POST", "/availability/raw/query", t,
      Some("""{"ids":["A1","A2","A3"]}"""))
    assert(st == 200, body)
    val byId = parse(body).map(n => n.get("id").asText ->
      n.get("data").elements().asScala.toSeq.map(point)).toMap
    assert(byId("A1") == Seq((start + 60000, "down"), (start, "up")), body)
    assert(byId("A2") == Seq((start + 60000, "up"), (start, "up")), body)
    assert(byId("A3") == Seq((start + 60000, "down"), (start, "down")), body)
  }

  private def queryById(body: String): Map[String, Seq[(Long, String)]] =
    parse(body).map(n => n.get("id").asText ->
      n.get("data").elements().asScala.toSeq.map(point)).toMap

  // AvailabilityITest.groovy:311-438
  // fetchMRawDataFromMultipleAvailabilityMetricsWithQueryParams: `limit`
  // bounds EACH series (per-id fan-out, MetricsServiceImpl
  // .findDataPoints(List,…)), and fromEarliest recovers every point
  test("multi-availability query: limit bounds each series; fromEarliest " +
    "recovers all points per series") {
    val t = Some("t-av-qparams")
    val start = System.currentTimeMillis() - 4 * 3600000L
    def h(i: Int) = start + i * 3600000L
    assert(call("POST", "/availability/raw", t, Some(
      s"""[{"id":"A1","data":[{"timestamp":$start,"value":"up"},
         |  {"timestamp":${h(1)},"value":"up"},{"timestamp":${h(2)},"value":"down"},
         |  {"timestamp":${h(3)},"value":"down"},{"timestamp":${h(4)},"value":"up"}]},
         | {"id":"A2","data":[{"timestamp":$start,"value":"up"},
         |  {"timestamp":${h(1)},"value":"down"},{"timestamp":${h(2)},"value":"up"},
         |  {"timestamp":${h(3)},"value":"down"},{"timestamp":${h(4)},"value":"down"}]},
         | {"id":"A3","data":[{"timestamp":$start,"value":"down"},
         |  {"timestamp":${h(1)},"value":"up"},{"timestamp":${h(2)},"value":"up"},
         |  {"timestamp":${h(3)},"value":"up"},{"timestamp":${h(4)},"value":"down"}]}]"""
        .stripMargin))._1 == 204)

    val (st, body) = call("POST", "/availability/raw/query", t, Some(
      s"""{"ids":["A1","A2","A3"],"start":${h(1)},"end":${h(4)},
         |"limit":2,"order":"desc"}""".stripMargin))
    assert(st == 200, body)
    val byId = queryById(body)
    assert(byId.size == 3, body)
    assert(byId("A1") == Seq((h(3), "down"), (h(2), "down")), body)
    assert(byId("A2") == Seq((h(3), "down"), (h(2), "up")), body)
    assert(byId("A3") == Seq((h(3), "up"), (h(2), "up")), body)

    val (fs, fbody) = call("POST", "/availability/raw/query", t, Some(
      """{"ids":["A1","A2","A3"],"fromEarliest":true,"order":"desc"}"""))
    assert(fs == 200, fbody)
    val full = queryById(fbody)
    assert(full("A1") == Seq((h(4), "up"), (h(3), "down"), (h(2), "down"),
      (h(1), "up"), (start, "up")), fbody)
    assert(full("A2") == Seq((h(4), "down"), (h(3), "down"), (h(2), "up"),
      (h(1), "down"), (start, "up")), fbody)
    assert(full("A3") == Seq((h(4), "down"), (h(3), "up"), (h(2), "up"),
      (h(1), "up"), (start, "down")), fbody)
  }

  // AvailabilityITest.groovy:440-560
  // fetchMRawDataFromMultipleAvailabilityMetricsByTag: tag selection with
  // the per-series limit, the GET tags/{tags}/raw twin, and two-tag AND
  test("tag-selected availability query honors the per-series limit and " +
    "matches its GET twin") {
    val t = Some("t-av-bytag")
    val start = System.currentTimeMillis() - 4 * 3600000L
    def h(i: Int) = start + i * 3600000L
    assert(call("POST", "/availability", t,
      Some("""{"id":"A1","tags":{"letter":"A","number":"1"}}"""))._1 == 204)
    assert(call("POST", "/availability", t,
      Some("""{"id":"A2","tags":{"letter":"A","number":"2"}}"""))._1 == 204)
    assert(call("POST", "/availability/raw", t, Some(
      s"""[{"id":"A1","data":[{"timestamp":$start,"value":"up"},
         |  {"timestamp":${h(1)},"value":"up"},{"timestamp":${h(2)},"value":"down"},
         |  {"timestamp":${h(3)},"value":"down"},{"timestamp":${h(4)},"value":"up"}]},
         | {"id":"A2","data":[{"timestamp":$start,"value":"up"},
         |  {"timestamp":${h(1)},"value":"down"},{"timestamp":${h(2)},"value":"up"},
         |  {"timestamp":${h(3)},"value":"down"},{"timestamp":${h(4)},"value":"down"}]}]"""
        .stripMargin))._1 == 204)

    val q = s"""{"tags":"letter:A","start":${h(1)},"end":${h(4)},"limit":2,"order":"desc"}"""
    val (st, body) = call("POST", "/availability/raw/query", t, Some(q))
    assert(st == 200, body)
    val byId = queryById(body)
    assert(byId.size == 2, body)
    assert(byId("A1") == Seq((h(3), "down"), (h(2), "down")), body)
    assert(byId("A2") == Seq((h(3), "down"), (h(2), "up")), body)

    // the GET twin answers identically
    val (gs, gbody) = call("GET",
      s"/availability/tags/letter:A/raw?start=${h(1)}&end=${h(4)}&limit=2&order=desc", t)
    assert(gs == 200, gbody)
    assert(queryById(gbody) == byId, s"GET twin diverged:\n$body\n$gbody")

    // two-tag AND narrows to A1
    val (as_, abody) = call("POST", "/availability/raw/query", t, Some(
      s"""{"tags":"letter:A,number:1","start":${h(1)},"end":${h(4)},"limit":2,"order":"desc"}"""))
    assert(as_ == 200, abody)
    val and = queryById(abody)
    assert(and.size == 1 && and("A1") == Seq((h(3), "down"), (h(2), "down")), abody)
  }
}
