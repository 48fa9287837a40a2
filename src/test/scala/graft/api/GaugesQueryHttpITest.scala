package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.SparkTestBase
import scala.jdk.CollectionConverters._

/**
 * Port of the multi-gauge query sections of the reference gauge REST
 * suite over the real HTTP transport —
 * rest-tests-jaxrs/.../GaugesITest.groovy:
 *  - :604-670  POST /gauges/raw/query by ids: nested [{id, data}] in the
 *              DESC default order
 *  - :672-802  the same with start/end/limit/order, then fromEarliest
 *  - :802-820  an ids query over absent metrics answers 204
 *  - :821-968  POST /gauges/rate/query: per-minute W1 rates per series,
 *              ranged and fromEarliest
 *  - :983-1105 tag-selected queries (tags instead of ids) — and the GET
 *              /gauges/tags/{tags}/raw twin answers identically
 *  - :1107-1147 per-datapoint tags round-trip through the nested shape
 */
class GaugesQueryHttpITest extends SparkTestBase with HttpSpecSupport {

  private val mapper = new ObjectMapper()
  private val Eps = 1e-9

  /** nested [{id, data:[{timestamp,value,...}]}] → id → [(ts, node)] */
  private def nested(body: String): Map[String, Seq[(Long, JsonNode)]] =
    mapper.readTree(body).elements().asScala.toSeq.map { g =>
      g.get("id").asText() -> g.get("data").elements().asScala.toSeq
        .map(n => (n.get("timestamp").asLong, n))
    }.toMap

  private def vals(s: Seq[(Long, JsonNode)]): Seq[(Long, Double)] =
    s.map { case (ts, n) => (ts, n.get("value").asDouble) }

  private def seed(t: Option[String], series: Map[String, Seq[(Long, Double)]]): Unit =
    assert(call("POST", "/gauges/raw", t, Some(series.map { case (id, dps) =>
      s"""{"id":"$id","data":${dps.map { case (ts, v) =>
        s"""{"timestamp":$ts,"value":$v}"""
      }.mkString("[", ",", "]")}}"""
    }.mkString("[", ",", "]")))._1 == 204)

  test("POST raw/query by ids: nested per-metric data in the DESC default") {
    val t = Some("t-gq-ids")
    val s0 = System.currentTimeMillis() - 2 * 3600000L
    seed(t, Map(
      "G1" -> Seq(s0 -> 1.23, (s0 + 60000) -> 3.45),
      "G2" -> Seq(s0 -> 1.45, (s0 + 60000) -> 2.36),
      "G3" -> Seq(s0 -> 4.45, (s0 + 60000) -> 5.55)))
    val (st, body) = call("POST", "/gauges/raw/query", t,
      Some("""{"ids":["G1","G2","G3"]}"""))
    assert(st == 200, body)
    val got = nested(body)
    assert(got.keySet == Set("G1", "G2", "G3"), body)
    assert(vals(got("G1")) == Seq((s0 + 60000) -> 3.45, s0 -> 1.23), body)
    assert(vals(got("G2")) == Seq((s0 + 60000) -> 2.36, s0 -> 1.45), body)
    assert(vals(got("G3")) == Seq((s0 + 60000) -> 5.55, s0 -> 4.45), body)
  }

  test("POST raw/query with range+limit+order, then fromEarliest") {
    val t = Some("t-gq-params")
    val s0 = System.currentTimeMillis() - 4 * 3600000L
    def h(i: Int) = s0 + i * 3600000L
    val g1 = Seq(1.23, 3.45, 5.34, 2.22, 5.22)
    val g2 = Seq(1.45, 2.36, 3.62, 2.63, 3.99)
    val g3 = Seq(4.45, 5.55, 4.44, 3.33, 3.77)
    seed(t, Map(
      "G1" -> g1.zipWithIndex.map { case (v, i) => h(i) -> v },
      "G2" -> g2.zipWithIndex.map { case (v, i) => h(i) -> v },
      "G3" -> g3.zipWithIndex.map { case (v, i) => h(i) -> v }))

    val (st, body) = call("POST", "/gauges/raw/query", t, Some(
      s"""{"ids":["G1","G2","G3"],"start":${h(1)},"end":${h(4)},"limit":2,"order":"desc"}"""))
    assert(st == 200, body)
    val got = nested(body)
    assert(got.size == 3, body)
    assert(vals(got("G1")) == Seq(h(3) -> 2.22, h(2) -> 5.34), body)
    assert(vals(got("G2")) == Seq(h(3) -> 2.63, h(2) -> 3.62), body)
    assert(vals(got("G3")) == Seq(h(3) -> 3.33, h(2) -> 4.44), body)

    val (fs, fbody) = call("POST", "/gauges/raw/query", t, Some(
      """{"ids":["G1","G2","G3"],"fromEarliest":true,"order":"desc"}"""))
    assert(fs == 200, fbody)
    val fgot = nested(fbody)
    assert(vals(fgot("G1")) == g1.zipWithIndex.reverse.map { case (v, i) => h(i) -> v }, fbody)
    assert(vals(fgot("G3")) == g3.zipWithIndex.reverse.map { case (v, i) => h(i) -> v }, fbody)
  }

  test("an ids rate query over absent metrics answers 204") {
    val t = Some("t-gq-none")
    assert(call("POST", "/gauges/rate/query", t, Some(
      """{"ids":["G1","G2","G3"],"start":90000,"end":180000,"limit":2,"order":"asc"}"""))._1 == 204)
  }

  test("POST rate/query: per-minute rates per series — ranged, then " +
    "fromEarliest") {
    val t = Some("t-gq-rates")
    // 30 s spacing: rate = 60000·Δv/30000 = 2·Δv, on the later timestamp
    val g1 = Seq(1.23, 3.45, 5.34, 2.22, 5.22)
    val g2 = Seq(1.45, 2.36, 3.62, 2.63, 3.99)
    val g3 = Seq(4.45, 5.55, 4.44, 3.33, 3.77)
    def ts(i: Int) = 60000L + i * 30000L
    seed(t, Map(
      "G1" -> g1.zipWithIndex.map { case (v, i) => ts(i) -> v },
      "G2" -> g2.zipWithIndex.map { case (v, i) => ts(i) -> v },
      "G3" -> g3.zipWithIndex.map { case (v, i) => ts(i) -> v }))

    val (st, body) = call("POST", "/gauges/rate/query", t, Some(
      s"""{"ids":["G1","G2","G3"],"start":${ts(1)},"end":${ts(4)},"limit":2,"order":"asc"}"""))
    assert(st == 200, body)
    val got = nested(body)
    assert(got.size == 3, body)
    def assertRates(id: String, series: Seq[Double]): Unit = {
      val expected = Seq(
        ts(2) -> 2.0 * (series(2) - series(1)),
        ts(3) -> 2.0 * (series(3) - series(2)))
      vals(got(id)).zip(expected).foreach { case ((at, av), (et, ev)) =>
        assert(at == et && math.abs(av - ev) < Eps, s"$id: $at=$av vs $et=$ev")
      }
    }
    assertRates("G1", g1); assertRates("G2", g2); assertRates("G3", g3)

    // fromEarliest over a two-series subset
    val t2 = Some("t-gq-rates-fe")
    val s0 = System.currentTimeMillis() - 4 * 3600000L
    def ts2(i: Int) = s0 + 60000L + i * 30000L
    seed(t2, Map(
      "G1" -> Seq(ts2(0) -> 1.23, ts2(1) -> 3.45, ts2(2) -> 5.34),
      "G2" -> Seq(ts2(0) -> 1.45, ts2(1) -> 2.36, ts2(2) -> 3.62)))
    val (es, ebody) = call("POST", "/gauges/rate/query", t2, Some(
      """{"ids":["G1","G2"],"fromEarliest":true,"order":"asc"}"""))
    assert(es == 200, ebody)
    val egot = nested(ebody)
    assert(egot.size == 2, ebody)
    val e1 = vals(egot("G1")); val e2 = vals(egot("G2"))
    assert(e1.map(_._1) == Seq(ts2(1), ts2(2)) &&
      math.abs(e1(0)._2 - 2.0 * (3.45 - 1.23)) < Eps &&
      math.abs(e1(1)._2 - 2.0 * (5.34 - 3.45)) < Eps, ebody)
    assert(math.abs(e2(0)._2 - 2.0 * (2.36 - 1.45)) < Eps &&
      math.abs(e2(1)._2 - 2.0 * (3.62 - 2.36)) < Eps, ebody)
  }

  test("tag-selected queries answer identically on the POST body and the " +
    "GET /gauges/tags/{tags}/raw twin") {
    val t = Some("t-gq-bytag")
    val s0 = System.currentTimeMillis() - 4 * 3600000L
    def h(i: Int) = s0 + i * 3600000L
    assert(call("POST", "/gauges", t, Some(
      """{"id":"A1","tags":{"letter":"A","number":"1"}}"""))._1 == 204)
    assert(call("POST", "/gauges", t, Some(
      """{"id":"A2","tags":{"letter":"A","number":"2"}}"""))._1 == 204)
    seed(t, Map(
      "A1" -> Seq(h(0) -> 10.0, h(1) -> 20.0, h(2) -> 30.0, h(3) -> 20.0, h(4) -> 10.0),
      "A2" -> Seq(h(0) -> 1.0, h(1) -> 0.0, h(2) -> 1.0, h(3) -> 0.0, h(4) -> 1.0)))

    val q = s"start=${h(1)}&end=${h(4)}&limit=2&order=desc"
    val (ps, pbody) = call("POST", "/gauges/raw/query", t, Some(
      s"""{"tags":"letter:A","start":${h(1)},"end":${h(4)},"limit":2,"order":"desc"}"""))
    assert(ps == 200, pbody)
    val pgot = nested(pbody)
    assert(pgot.keySet == Set("A1", "A2"), pbody)
    assert(vals(pgot("A1")) == Seq(h(3) -> 20.0, h(2) -> 30.0), pbody)
    assert(vals(pgot("A2")) == Seq(h(3) -> 0.0, h(2) -> 1.0), pbody)

    val (gs, gbody) = call("GET", s"/gauges/tags/letter:A/raw?$q", t)
    assert(gs == 200, gbody)
    assert(nested(gbody).view.mapValues(vals).toMap ==
      pgot.view.mapValues(vals).toMap, gbody)

    // two tag filters narrow to A1 only, on both endpoints
    val (p2s, p2body) = call("POST", "/gauges/raw/query", t, Some(
      s"""{"tags":"letter:A,number:1","start":${h(1)},"end":${h(4)},"limit":2,"order":"desc"}"""))
    assert(p2s == 200, p2body)
    assert(nested(p2body).keySet == Set("A1"), p2body)
    val (g2s, g2body) = call("GET", s"/gauges/tags/letter:A,number:1/raw?$q", t)
    assert(g2s == 200, g2body)
    assert(nested(g2body).view.mapValues(vals).toMap ==
      nested(p2body).view.mapValues(vals).toMap, g2body)
  }

  test("per-datapoint tags round-trip through the nested query shape") {
    val t = Some("t-gq-dptags")
    val s0 = System.currentTimeMillis() - 2 * 3600000L
    assert(call("POST", "/gauges/raw", t, Some(
      s"""[{"id":"G1","data":[
         |{"timestamp":$s0,"value":1.23,"tags":{"someKey":"someValue"}},
         |{"timestamp":${s0 + 60000},"value":3.45}]}]""".stripMargin))._1 == 204)
    val (st, body) = call("POST", "/gauges/raw/query", t, Some("""{"ids":["G1"]}"""))
    assert(st == 200, body)
    val g1 = nested(body)("G1")
    assert(vals(g1) == Seq((s0 + 60000) -> 3.45, s0 -> 1.23), body)
    assert(!g1.head._2.has("tags"), body)
    assert(g1(1)._2.get("tags").get("someKey").asText() == "someValue", body)
  }
}
