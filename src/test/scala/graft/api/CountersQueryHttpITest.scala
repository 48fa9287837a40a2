package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.SparkTestBase
import scala.jdk.CollectionConverters._

/**
 * Port of the multi-counter query sections of the reference counter
 * REST suite over the real HTTP transport —
 * rest-tests-jaxrs/.../CountersITest.groovy:
 *  - :1780-1845 fetchRawDataFromMultipleCounters — POST
 *    /counters/raw/query by ids, nested [{id, data}], DESC default;
 *  - :1847-1975 fetchMRawDataFromMultipleCountersWithQueryParams —
 *    `limit` bounds EACH series over the bounded range;
 *  - :1977-2057 fetchRatesFromMultipleMetrics — the multi-counter
 *    rate query derives per-minute W1 rates inside the range (the
 *    first in-range point seeds) and limits per series;
 *  - :2139-2259 fetchMRawDataFromMultipleCountersByTag — the tags
 *    selection and its GET /counters/tags/{tags}/raw twin.
 */
class CountersQueryHttpITest extends SparkTestBase with HttpSpecSupport {

  private val mapper = new ObjectMapper()
  private val Eps = 1e-9

  private def byId(body: String): Map[String, Seq[(Long, Double)]] =
    mapper.readTree(body).elements().asScala.toSeq.map { g =>
      g.get("id").asText() -> g.get("data").elements().asScala.toSeq
        .map(n => (n.get("timestamp").asLong, n.get("value").asDouble))
    }.toMap

  private def seed(t: Option[String], start: Long, stepMs: Long): Unit =
    assert(call("POST", "/counters/raw", t, Some(
      s"""[{"id":"C1","data":[
         |  {"timestamp":$start,"value":12},{"timestamp":${start + stepMs},"value":17},
         |  {"timestamp":${start + 2 * stepMs},"value":19},{"timestamp":${start + 3 * stepMs},"value":26},
         |  {"timestamp":${start + 4 * stepMs},"value":37}]},
         | {"id":"C2","data":[
         |  {"timestamp":$start,"value":41},{"timestamp":${start + stepMs},"value":49},
         |  {"timestamp":${start + 2 * stepMs},"value":64},{"timestamp":${start + 3 * stepMs},"value":71},
         |  {"timestamp":${start + 4 * stepMs},"value":95}]},
         | {"id":"C3","data":[
         |  {"timestamp":$start,"value":28},{"timestamp":${start + stepMs},"value":35},
         |  {"timestamp":${start + 2 * stepMs},"value":42},{"timestamp":${start + 3 * stepMs},"value":49},
         |  {"timestamp":${start + 4 * stepMs},"value":59}]}]""".stripMargin))._1 == 204)

  // CountersITest.groovy:1780-1845
  test("POST /counters/raw/query by ids answers nested per-metric data, " +
    "DESC default") {
    val t = Some("t-cq-raw")
    val start = System.currentTimeMillis() - 4 * 3600000L
    seed(t, start, 3600000L)
    val (st, body) = call("POST", "/counters/raw/query", t,
      Some(s"""{"ids":["C1","C2"],"start":$start,"end":${start + 2 * 3600000L}}"""))
    assert(st == 200, body)
    val m = byId(body)
    assert(m.size == 2, body)
    assert(m("C1") == Seq((start + 3600000L, 17.0), (start, 12.0)), body)
    assert(m("C2") == Seq((start + 3600000L, 49.0), (start, 41.0)), body)
  }

  // CountersITest.groovy:1847-1975
  test("multi-counter query: limit bounds each series over the range") {
    val t = Some("t-cq-limit")
    val start = System.currentTimeMillis() - 4 * 3600000L
    def h(i: Int) = start + i * 3600000L
    seed(t, start, 3600000L)
    val (st, body) = call("POST", "/counters/raw/query", t, Some(
      s"""{"ids":["C1","C2","C3"],"start":${h(1)},"end":${h(4)},"limit":2,"order":"desc"}"""))
    assert(st == 200, body)
    val m = byId(body)
    assert(m.size == 3, body)
    assert(m("C1") == Seq((h(3), 26.0), (h(2), 19.0)), body)
    assert(m("C2") == Seq((h(3), 71.0), (h(2), 64.0)), body)
    assert(m("C3") == Seq((h(3), 49.0), (h(2), 42.0)), body)
  }

  // CountersITest.groovy:1977-2057 — rates over [1.5mn, 3mn): the point
  // at 1.5mn seeds, rates land at 2mn and 2.5mn per series
  test("multi-counter rate query derives in-range per-minute rates and " +
    "limits per series") {
    val t = Some("t-cq-rates")
    assert(call("POST", "/counters/raw", t, Some(
      """[{"id":"C1","data":[{"timestamp":60000,"value":12},{"timestamp":90000,"value":34},
        |  {"timestamp":120000,"value":53},{"timestamp":150000,"value":72},{"timestamp":180000,"value":102}]},
        | {"id":"C2","data":[{"timestamp":60000,"value":14},{"timestamp":90000,"value":26},
        |  {"timestamp":120000,"value":51},{"timestamp":150000,"value":88},{"timestamp":180000,"value":109}]},
        | {"id":"C3","data":[{"timestamp":60000,"value":43},{"timestamp":90000,"value":48},
        |  {"timestamp":120000,"value":73},{"timestamp":150000,"value":89},{"timestamp":180000,"value":99}]}]"""
        .stripMargin))._1 == 204)
    val (st, body) = call("POST", "/counters/rate/query", t, Some(
      """{"ids":["C1","C2","C3"],"start":90000,"end":180000,"limit":2,"order":"asc"}"""))
    assert(st == 200, body)
    val m = byId(body)
    assert(m.size == 3, body)
    def rate(v2: Double, v1: Double) = 60000.0 * (v2 - v1) / 30000.0
    def assertRates(id: String, vs: Seq[Double]): Unit = {
      val exp = Seq((120000L, rate(vs(1), vs(0))), (150000L, rate(vs(2), vs(1))))
      assert(m(id).size == 2 &&
        m(id).zip(exp).forall { case ((at, av), (et, ev)) => at == et && math.abs(av - ev) < Eps },
        s"$id: ${m(id)} vs $exp\n$body")
    }
    assertRates("C1", Seq(34, 53, 72))
    assertRates("C2", Seq(26, 51, 88))
    assertRates("C3", Seq(48, 73, 89))
  }

  // CountersITest.groovy:2060-2137 fetchRatesFromEarliest — the
  // fromEarliest window recovers every pairable point per series
  test("multi-counter rate query with fromEarliest derives all rates, DESC") {
    val t = Some("t-cq-ratesearly")
    val start = System.currentTimeMillis() - 4 * 3600000L
    assert(call("POST", "/counters/raw", t, Some(
      s"""[{"id":"C1","data":[{"timestamp":${start + 60000},"value":12},
         |  {"timestamp":${start + 90000},"value":34},{"timestamp":${start + 120000},"value":53}]},
         | {"id":"C2","data":[{"timestamp":${start + 60000},"value":14},
         |  {"timestamp":${start + 90000},"value":26},{"timestamp":${start + 120000},"value":51}]}]"""
        .stripMargin))._1 == 204)
    val (st, body) = call("POST", "/counters/rate/query", t,
      Some("""{"ids":["C1","C2"],"fromEarliest":true,"order":"desc"}"""))
    assert(st == 200, body)
    val m = byId(body)
    assert(m.size == 2, body)
    def r(v2: Double, v1: Double) = 60000.0 * (v2 - v1) / 30000.0
    assert(m("C1").map(_._1) == Seq(start + 120000, start + 90000), body)
    assert(math.abs(m("C1")(0)._2 - r(53, 34)) < Eps &&
      math.abs(m("C1")(1)._2 - r(34, 12)) < Eps, body)
    assert(math.abs(m("C2")(0)._2 - r(51, 26)) < Eps &&
      math.abs(m("C2")(1)._2 - r(26, 14)) < Eps, body)
  }

  // CountersITest.groovy:2139-2259
  test("tag-selected counter query matches its GET twin") {
    val t = Some("t-cq-bytag")
    val start = System.currentTimeMillis() - 4 * 3600000L
    def h(i: Int) = start + i * 3600000L
    assert(call("POST", "/counters", t,
      Some("""{"id":"C1","tags":{"letter":"A","number":"1"}}"""))._1 == 204)
    assert(call("POST", "/counters", t,
      Some("""{"id":"C2","tags":{"letter":"A","number":"2"}}"""))._1 == 204)
    seed(t, start, 3600000L)

    val (st, body) = call("POST", "/counters/raw/query", t, Some(
      s"""{"tags":"letter:A","start":${h(1)},"end":${h(4)},"limit":2,"order":"desc"}"""))
    assert(st == 200, body)
    val m = byId(body)
    assert(m.size == 2, body)
    assert(m("C1") == Seq((h(3), 26.0), (h(2), 19.0)), body)
    assert(m("C2") == Seq((h(3), 71.0), (h(2), 64.0)), body)

    val (gs, gbody) = call("GET",
      s"/counters/tags/letter:A/raw?start=${h(1)}&end=${h(4)}&limit=2&order=desc", t)
    assert(gs == 200, gbody)
    assert(byId(gbody) == m, s"GET twin diverged:\n$body\n$gbody")
  }
}
