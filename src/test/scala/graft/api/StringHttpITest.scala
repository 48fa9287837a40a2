package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.SparkTestBase
import scala.jdk.CollectionConverters._

/**
 * Port of the reference string-metric REST integration suite over the
 * real HTTP transport — the assertions of
 * rest-tests-jaxrs/.../StringITest.groovy:32-39
 * (shouldNotAcceptInvalidTimeRange), :40-65 (empty payloads on both
 * ingest routes), :66-80 (the 2048-byte size cap), :81-131
 * (addAndFetchDataForSingleMetric — DESC default order, per-point
 * tags), :132-207 (addDataForMultipleMetrics), :208-252
 * (findDistinctValuesInAscendingOrder — contiguous-run collapse keeps
 * the run's FIRST point under ASC), :253-320
 * (fetchRawDataFromMultipleStringMetrics — POST /strings/raw/query
 * answers the nested [{id, data}] shape), :450-506
 * (fetchRawStringWithQueryParamsLimitAndOrder).
 */
class StringHttpITest extends SparkTestBase with HttpSpecSupport {

  private val mapper = new ObjectMapper()

  private def parse(body: String): Seq[JsonNode] =
    mapper.readTree(body).elements().asScala.toSeq

  private def point(n: JsonNode): (Long, String) =
    (n.get("timestamp").asLong, n.get("value").asText)

  // StringITest.groovy:32-39
  test("an inverted time range answers 400") {
    val (st, body) = call("GET", "/strings/test/raw?start=1000&end=500",
      Some("t-str-range"))
    assert(st == 400 && body.contains("errorMsg"), s"$st $body")
  }

  // StringITest.groovy:40-65
  test("empty payloads answer 400 on both string ingest routes") {
    val t = Some("t-str-empty")
    assert(call("POST", "/strings/MyString/raw", t, Some(""))._1 == 400)
    assert(call("POST", "/strings/MyString/raw", t, Some("[]"))._1 == 400)
    assert(call("POST", "/strings/raw", t, Some(""))._1 == 400)
    assert(call("POST", "/strings/raw", t, Some("[]"))._1 == 400)
  }

  // StringITest.groovy:66-80 — the reference rejects values past the
  // configured max (2048 by default)
  test("a string value exceeding the size cap answers 400") {
    val t = Some("t-str-cap")
    val big = "X" + (" " * 2999)
    val (st, body) = call("POST", "/strings/MyString/raw", t,
      Some(s"""[{"timestamp":100,"value":"$big"}]"""))
    assert(st == 400, s"$st $body")
  }

  // StringITest.groovy:81-131
  test("single-metric string fetch: DESC default order, per-point tags on " +
    "the wire") {
    val t = Some("t-str-single")
    val start = System.currentTimeMillis() - 20 * 60000L
    assert(call("POST", "/strings/MyString/raw", t, Some(
      s"""[{"timestamp":$start,"value":"stopped","tags":{"x":"1","y":"2"}},
         |{"timestamp":${start + 2 * 60000},"value":"starting","tags":{"y":"3","z":"5"}},
         |{"timestamp":${start + 4 * 60000},"value":"running","tags":{"x":"4","z":"6"}}]"""
        .stripMargin))._1 == 204)

    val (st, body) = call("GET", "/strings/MyString/raw", t)
    assert(st == 200, body)
    val got = parse(body)
    assert(got.map(point) == Seq(
      (start + 4 * 60000, "running"),
      (start + 2 * 60000, "starting"),
      (start, "stopped")), body)
    assert(got.head.get("tags").get("x").asText == "4" &&
      got.head.get("tags").get("z").asText == "6", body)
    assert(got.last.get("tags").get("y").asText == "2", body)
  }

  // StringITest.groovy:132-207
  test("multi-metric string ingest fetches back per metric, DESC") {
    val t = Some("t-str-multi")
    val start = System.currentTimeMillis() - 20 * 60000L
    assert(call("POST", "/strings/raw", t, Some(
      s"""[{"id":"S1","data":[
         |  {"timestamp":$start,"value":"starting","tags":{"hostname":"server1"}},
         |  {"timestamp":${start + 5 * 60000},"value":"running","tags":{"hostname":"server1"}}]},
         | {"id":"S2","data":[
         |  {"timestamp":${start + 5 * 60000},"value":"running","tags":{"hostname":"server2"}},
         |  {"timestamp":${start + 10 * 60000},"value":"stopping","tags":{"hostname":"server2"}}]}]"""
        .stripMargin))._1 == 204)

    val (s1, b1) = call("GET", "/strings/S1/raw", t)
    assert(s1 == 200 && parse(b1).map(point) == Seq(
      (start + 5 * 60000, "running"), (start, "starting")), b1)
    val (s2, b2) = call("GET", "/strings/S2/raw", t)
    assert(s2 == 200 && parse(b2).map(point) == Seq(
      (start + 10 * 60000, "stopping"), (start + 5 * 60000, "running")), b2)
  }

  // StringITest.groovy:208-252
  test("distinct + ASC collapses contiguous runs to their first point") {
    val t = Some("t-str-distinct")
    val start = System.currentTimeMillis() - 20 * 60000L
    def min_(m: Int) = start + m * 60000L
    val values = Seq(
      0 -> "stopped", 2 -> "stopped", 4 -> "starting", 6 -> "running",
      8 -> "running", 10 -> "running", 12 -> "stopping", 14 -> "stopping",
      16 -> "stopped")
    val body = values.map { case (m, v) =>
      s"""{"timestamp":${min_(m)},"value":"$v"}"""
    }.mkString("[", ",", "]")
    assert(call("POST", "/strings/MyString/raw", t, Some(body))._1 == 204)

    val (st, got) = call("GET",
      s"/strings/MyString/raw?start=${min_(2)}&end=${min_(14)}&order=asc&distinct=true", t)
    assert(st == 200, got)
    assert(parse(got).map(point) == Seq(
      (min_(2), "stopped"), (min_(4), "starting"),
      (min_(6), "running"), (min_(12), "stopping")), got)
  }

  // StringITest.groovy:253-320
  test("POST /strings/raw/query answers the nested [{id, data}] shape, DESC " +
    "per metric") {
    val t = Some("t-str-query")
    val start = System.currentTimeMillis() - 2 * 3600000L
    assert(call("POST", "/strings/raw", t, Some(
      s"""[{"id":"S1","data":[{"timestamp":$start,"value":"down"},
         |  {"timestamp":${start + 60000},"value":"starting"}]},
         | {"id":"S2","data":[{"timestamp":$start,"value":"running"},
         |  {"timestamp":${start + 60000},"value":"stopping"}]},
         | {"id":"S3","data":[{"timestamp":$start,"value":"restart"},
         |  {"timestamp":${start + 60000},"value":"down"}]}]""".stripMargin))._1 == 204)

    val (st, body) = call("POST", "/strings/raw/query", t,
      Some("""{"ids":["S1","S2","S3"]}"""))
    assert(st == 200, body)
    val got = parse(body)
    assert(got.length == 3, body)
    val byId = got.map(n => n.get("id").asText ->
      n.get("data").elements().asScala.toSeq.map(point)).toMap
    assert(byId("S1") == Seq((start + 60000, "starting"), (start, "down")), body)
    assert(byId("S2") == Seq((start + 60000, "stopping"), (start, "running")), body)
    assert(byId("S3") == Seq((start + 60000, "down"), (start, "restart")), body)
  }

  // StringITest.groovy:450-506
  test("limit + order on a string fetch: ASC takes the earliest N, DESC the " +
    "latest N") {
    val t = Some("t-str-limit")
    val start = System.currentTimeMillis() - 4 * 3600000L
    def hour(h: Int) = start + h * 3600000L
    assert(call("POST", "/strings/raw", t, Some(
      s"""[{"id":"St1","data":[
         |  {"timestamp":${hour(0)},"value":"running1"},
         |  {"timestamp":${hour(1)},"value":"running2"},
         |  {"timestamp":${hour(2)},"value":"maintenance1"},
         |  {"timestamp":${hour(3)},"value":"maintenance2"},
         |  {"timestamp":${hour(4)},"value":"down"}]}]""".stripMargin))._1 == 204)

    val (as, ascBody) = call("GET", "/strings/St1/raw?limit=2&order=asc", t)
    assert(as == 200, ascBody)
    assert(parse(ascBody).map(point) == Seq(
      (hour(0), "running1"), (hour(1), "running2")), ascBody)

    val (ds, descBody) = call("GET", "/strings/St1/raw?limit=2&order=desc", t)
    assert(ds == 200, descBody)
    assert(parse(descBody).map(point) == Seq(
      (hour(4), "down"), (hour(3), "maintenance2")), descBody)
  }

  private def queryById(body: String): Map[String, Seq[(Long, String)]] =
    parse(body).map(n => n.get("id").asText ->
      n.get("data").elements().asScala.toSeq.map(point)).toMap

  // StringITest.groovy:322-449
  // fetchMRawDataFromMultipleStringMetricsWithQueryParams: the ranged
  // multi-string query bounds EACH series with `limit`
  test("multi-string query: limit bounds each series") {
    val t = Some("t-str-qparams")
    val start = System.currentTimeMillis() - 4 * 3600000L
    def h(i: Int) = start + i * 3600000L
    assert(call("POST", "/strings/raw", t, Some(
      s"""[{"id":"S1","data":[{"timestamp":$start,"value":"up"},
         |  {"timestamp":${h(1)},"value":"up"},{"timestamp":${h(2)},"value":"down"},
         |  {"timestamp":${h(3)},"value":"down"},{"timestamp":${h(4)},"value":"up"}]},
         | {"id":"S2","data":[{"timestamp":$start,"value":"up"},
         |  {"timestamp":${h(1)},"value":"down"},{"timestamp":${h(2)},"value":"up"},
         |  {"timestamp":${h(3)},"value":"down"},{"timestamp":${h(4)},"value":"down"}]}]"""
        .stripMargin))._1 == 204)
    val (st, body) = call("POST", "/strings/raw/query", t, Some(
      s"""{"ids":["S1","S2"],"start":${h(1)},"end":${h(4)},"limit":2,"order":"desc"}"""))
    assert(st == 200, body)
    val byId = queryById(body)
    assert(byId.size == 2, body)
    assert(byId("S1") == Seq((h(3), "down"), (h(2), "down")), body)
    assert(byId("S2") == Seq((h(3), "down"), (h(2), "up")), body)
  }

  // StringITest.groovy:507-573 fetchMRawDataFromMultipleStringsMetricsByTag
  test("tag-selected string query matches its GET twin and honors the " +
    "per-series limit") {
    val t = Some("t-str-bytag")
    val start = System.currentTimeMillis() - 4 * 3600000L
    def h(i: Int) = start + i * 3600000L
    assert(call("POST", "/strings", t,
      Some("""{"id":"S1","tags":{"letter":"A","number":"1"}}"""))._1 == 204)
    assert(call("POST", "/strings", t,
      Some("""{"id":"S2","tags":{"letter":"A","number":"2"}}"""))._1 == 204)
    assert(call("POST", "/strings/raw", t, Some(
      s"""[{"id":"S1","data":[{"timestamp":${h(1)},"value":"aa"},
         |  {"timestamp":${h(2)},"value":"ab"},{"timestamp":${h(3)},"value":"ac"}]},
         | {"id":"S2","data":[{"timestamp":${h(1)},"value":"ba"},
         |  {"timestamp":${h(2)},"value":"bb"},{"timestamp":${h(3)},"value":"bc"}]}]"""
        .stripMargin))._1 == 204)

    val (st, body) = call("POST", "/strings/raw/query", t, Some(
      s"""{"tags":"letter:A","start":${h(1)},"end":${h(4)},"limit":2,"order":"desc"}"""))
    assert(st == 200, body)
    val byId = queryById(body)
    assert(byId.size == 2, body)
    assert(byId("S1") == Seq((h(3), "ac"), (h(2), "ab")), body)
    assert(byId("S2") == Seq((h(3), "bc"), (h(2), "bb")), body)

    val (gs, gbody) = call("GET",
      s"/strings/tags/letter:A/raw?start=${h(1)}&end=${h(4)}&limit=2&order=desc", t)
    assert(gs == 200, gbody)
    assert(queryById(gbody) == byId, s"GET twin diverged:\n$body\n$gbody")

    val (ns, nbody) = call("POST", "/strings/raw/query", t, Some(
      s"""{"tags":"letter:A,number:2","start":${h(1)},"end":${h(4)},"limit":2,"order":"desc"}"""))
    assert(ns == 200, nbody)
    val and = queryById(nbody)
    assert(and.size == 1 && and("S2") == Seq((h(3), "bc"), (h(2), "bb")), nbody)
  }
}
