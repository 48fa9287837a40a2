package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.SparkTestBase
import scala.jdk.CollectionConverters._

/**
 * Port of the reference gauge REST integration suite over the real HTTP
 * transport — the assertions of
 * rest-tests-jaxrs/.../GaugesITest.groovy:114-171
 * (fromEarliestQueryGaugeData — the retention-derived window vs the
 * now-8h default), :172-316 (addDataForSingleGaugeAndFindWithLimitAndSort
 * — the T3 order-defaulting rule: DESC unless limit∧start∧¬end, and
 * non-positive limits ignored), :373-418 (findRate — per-minute gauge
 * rates land on the later timestamp, negatives allowed), :419-474
 * (findRateStats — rate series bucketed through the numeric stats path).
 *
 * The findRateStats bucket-7 median asserts the engine's EXACT
 * interpolated value (185.6 for {172.6, 198.6}) where the groovy
 * expects the reference's P² estimate (172.6) — the documented
 * percentile divergence (GaugeStatsHttpITest scaladoc; the p2parity
 * mode reproduces the reference bit-for-bit).
 */
class GaugesHttpITest extends SparkTestBase with HttpSpecSupport {

  private val mapper = new ObjectMapper()
  private val Delta = 0.001

  private def parse(body: String): Seq[JsonNode] =
    mapper.readTree(body).elements().asScala.toSeq

  private def point(n: JsonNode): (Long, Double) =
    (n.get("timestamp").asLong, n.get("value").asDouble)

  // GaugesITest.groovy:114-171
  test("fromEarliest widens the default now-8h window to all retained data " +
    "but never into the future") {
    val t = Some("t-g-earliest")
    val now = System.currentTimeMillis()
    val start = now - 10 * 3600000L + 10 * 60000L
    def hour(h: Int) = start + h * 3600000L
    val points = Seq(
      hour(0) -> 100.1, hour(1) -> 200.2, hour(2) -> 300.3,
      hour(3) -> 400.4, hour(4) -> 500.5, hour(5) -> 600.6,
      (now + 6 * 3600000L) -> 750.7) // future point — outside every window
    assert(call("POST", "/gauges/G1000/raw", t, Some(points.map { case (ts, v) =>
      s"""{"timestamp":$ts,"value":$v}"""
    }.mkString("[", ",", "]")))._1 == 204)

    // default window [now-8h, now): hours 0-1 fall outside it
    val (ds, defaultBody) = call("GET", "/gauges/G1000/raw?order=asc", t)
    assert(ds == 200, defaultBody)
    assert(parse(defaultBody).map(point) == points.slice(2, 6), defaultBody)

    val (fs, fromEarliest) = call("GET",
      "/gauges/G1000/raw?fromEarliest=true&order=asc", t)
    assert(fs == 200, fromEarliest)
    assert(parse(fromEarliest).map(point) == points.take(6), fromEarliest)
  }

  // GaugesITest.groovy:172-316
  test("limit + the order-defaulting rule: DESC unless limit∧start∧no-end; " +
    "non-positive limits are ignored") {
    val t = Some("t-g-limit")
    val now = System.currentTimeMillis()
    val start = now - 3600000L
    def min_(m: Int) = start + m * 60000L
    val vals = Seq(100.1, 200.2, 300.3, 400.4, 500.5, 600.6)
    val pts = vals.zipWithIndex.map { case (v, i) => min_(i) -> v }
    assert(call("POST", "/gauges/G1/raw", t, Some(
      (pts :+ ((now + 30000L) -> 750.7)).map { case (ts, v) =>
        s"""{"timestamp":$ts,"value":$v}"""
      }.mkString("[", ",", "]")))._1 == 204)

    def get(q: String): Seq[(Long, Double)] = {
      val (st, body) = call("GET", s"/gauges/G1/raw?$q", t)
      assert(st == 200, s"$q: $body")
      parse(body).map(point)
    }
    // limit without start/end → DESC default (latest two)
    assert(get("limit=2") == pts.reverse.take(2).map(identity))
    assert(get("limit=2&order=desc") == pts.reverse.take(2))
    assert(get("limit=3&order=asc") == pts.take(3))
    // limit ∧ start ∧ no end → ASC default (the T3 exception)
    assert(get(s"limit=3&start=${min_(1)}") == pts.slice(1, 4))
    // limit ∧ end → DESC default
    assert(get(s"limit=3&end=${min_(5) + 1}") == pts.reverse.take(3))
    assert(get(s"limit=3&start=${min_(1) - 1}&order=desc") == pts.reverse.take(3))
    // non-positive limits are ignored, not errors
    assert(get("limit=-1&order=desc") == pts.reverse)
    assert(get("limit=-100&order=asc") == pts)
  }

  // GaugesITest.groovy:373-418
  test("gauge rate fetch: per-minute deltas on the later timestamp, " +
    "negatives allowed") {
    val t = Some("t-g-rate")
    assert(call("POST", "/gauges/G1/raw", t, Some(
      """[{"timestamp":60000,"value":321.8},{"timestamp":90000,"value":475.3},
        |{"timestamp":210000,"value":125.1},{"timestamp":300000,"value":123.6},
        |{"timestamp":420000,"value":468.8},{"timestamp":450000,"value":568.1}]"""
        .stripMargin))._1 == 204)

    val (st, body) = call("GET", "/gauges/G1/rate?start=1&order=asc", t)
    assert(st == 200, body)
    val expected = Seq(
      90000L -> 307.0, 210000L -> -175.1, 300000L -> -1.0,
      420000L -> 172.6, 450000L -> 198.6)
    val got = parse(body).map(point)
    assert(got.length == expected.length, body)
    got.zip(expected).foreach { case ((ts, v), (ets, ev)) =>
      assert(ts == ets && math.abs(v - ev) <= Delta, s"$ts=$v vs $ets=$ev: $body")
    }
  }

  // GaugesITest.groovy:419-474
  test("gauge rate stats bucket the rate series through the numeric stats " +
    "path (exact medians)") {
    val t = Some("t-g-ratestats")
    assert(call("POST", "/gauges/G1/raw", t, Some(
      """[{"timestamp":60000,"value":321.8},{"timestamp":90000,"value":475.3},
        |{"timestamp":210000,"value":125.1},{"timestamp":300000,"value":123.6},
        |{"timestamp":420000,"value":468.8},{"timestamp":450000,"value":568.1}]"""
        .stripMargin))._1 == 204)

    val (st, body) = call("GET",
      "/gauges/G1/rate/stats?start=60000&end=480000&bucketDuration=1mn", t)
    assert(st == 200, body)
    val got = parse(body)
    assert(got.length == 7, body)

    def assertSingle(b: JsonNode, start: Long, v: Double): Unit = {
      assert(b.get("start").asLong == start && !b.get("empty").asBoolean, s"$b")
      Seq("min", "avg", "median", "max", "sum").foreach(f =>
        assert(math.abs(b.get(f).asDouble - v) <= Delta, s"$f: $b"))
      assert(b.get("samples").asLong == 1, s"$b")
    }
    assertSingle(got(0), 60000, 307.0)
    assert(got(1).get("empty").asBoolean && got(3).get("empty").asBoolean &&
      got(5).get("empty").asBoolean, body)
    assertSingle(got(2), 180000, -175.1)
    assertSingle(got(4), 300000, -1.0)
    val b7 = got(6)
    assert(b7.get("start").asLong == 420000 && !b7.get("empty").asBoolean, body)
    assert(math.abs(b7.get("min").asDouble - 172.6) <= Delta, body)
    assert(math.abs(b7.get("max").asDouble - 198.6) <= Delta, body)
    assert(math.abs(b7.get("avg").asDouble - 185.6) <= Delta, body)
    assert(math.abs(b7.get("sum").asDouble - 371.2) <= Delta, body)
    // exact interpolated median (the documented P² divergence)
    assert(math.abs(b7.get("median").asDouble - 185.6) <= Delta, body)
    assert(b7.get("samples").asLong == 2, body)
  }

  // GaugesITest.groovy:318-372 minMaxTimestamps (and the CountersITest
  // :1722-1778 twin): the single-definition GET gains min/maxTimestamp
  // once data exists, widens as points land, and ?timestamps=true
  // carries the same pair on the typed and generic collection GETs
  test("minMaxTimestamps track ingested data on the definition GETs, " +
    "for gauges and counters") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    for ((path, vals) <- Seq(("gauges", Seq("4.2", "2.2", "1.2", "7.2")),
        ("counters", Seq("4", "2", "1", "7")))) {
      val t = Some(s"t-minmax-$path")
      assert(call("POST", s"/$path", t, Some("""{"id":"minmaxtest"}"""))._1 == 204)
      val (s0, b0) = call("GET", s"/$path/minmaxtest", t)
      assert(s0 == 200 && !b0.contains("minTimestamp") && !b0.contains("maxTimestamp"), b0)

      assert(call("POST", s"/$path/minmaxtest/raw", t,
        Some(s"""[{"timestamp":3,"value":${vals(0)}}]"""))._1 == 204)
      val d1 = mapper.readTree(call("GET", s"/$path/minmaxtest", t)._2)
      assert(d1.get("minTimestamp").asLong == 3 && d1.get("maxTimestamp").asLong == 3, d1.toString)

      assert(call("POST", s"/$path/minmaxtest/raw", t, Some(
        s"""[{"timestamp":1,"value":${vals(1)}},{"timestamp":2,"value":${vals(2)}},
           |{"timestamp":4,"value":${vals(3)}}]""".stripMargin))._1 == 204)
      val d2 = mapper.readTree(call("GET", s"/$path/minmaxtest", t)._2)
      assert(d2.get("minTimestamp").asLong == 1 && d2.get("maxTimestamp").asLong == 4, d2.toString)

      // collection GETs with timestamps=true — typed and generic
      for (url <- Seq(s"/$path?timestamps=true", s"/metrics?timestamps=true&type=${path.stripSuffix("s")}")) {
        val (cs, cbody) = call("GET", url, t)
        assert(cs == 200, s"$url: $cbody")
        val m = mapper.readTree(cbody).elements()
        var found = false
        while (m.hasNext) {
          val e = m.next()
          if (e.get("id").asText == "minmaxtest") {
            found = true
            assert(e.get("minTimestamp").asLong == 1 && e.get("maxTimestamp").asLong == 4,
              s"$url: $e")
          }
        }
        assert(found, s"$url: $cbody")
      }
    }
  }
}
