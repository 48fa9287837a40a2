package graft.api

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkTestBase
import scala.jdk.CollectionConverters._

/**
 * Port of the reference CountersITest.groovy over the real HTTP
 * transport: parameter validation (:33-47), empty-payload rejection
 * (:49-80), definition lifecycle with the reference's Metric JSON field
 * names (:82-145 createSimpleCounter / shouldNotCreateDuplicateCounter /
 * createCounterWithTagsAndDataRetention), catalog listing (:146-214
 * createAndFindCounters), and ranged raw fetches with the counter
 * integer wire type and DESC default ordering (:216-305).
 *
 * Adaptations, both documented at the source: writes answer 204 (the
 * transport collapses the reference's 200/201 write statuses —
 * HttpTransport scaladoc), and the single-definition GET carries no
 * minTimestamp/maxTimestamp enrichment (reference getMetric composes
 * MinMaxTimestampTransformer; the fields are absent here like they are
 * absent for a data-less metric there, which is what this suite's
 * fixtures assert anyway).
 */
class CountersHttpITest extends SparkTestBase with HttpSpecSupport {

  private val mapper = new ObjectMapper()

  // CountersITest.groovy:33-47
  test("invalid params answer 400: reversed time range, both bucket params") {
    val t = Some("t-cval")
    val (revRange, m1) = call("GET", "/counters/test/raw?start=1000&end=500", t)
    assert(revRange == 400 && m1.contains("errorMsg"), s"$revRange $m1")
    val (bothBuckets, m2) = call("GET",
      "/counters/test/stats?start=100&end=500&buckets=10&bucketDuration=10ms", t)
    assert(bothBuckets == 400 && m2.contains("errorMsg"), s"$bothBuckets $m2")
  }

  // CountersITest.groovy:49-80
  test("empty payloads answer 400 on create and both ingest routes") {
    val t = Some("t-cempty")
    assert(call("POST", "/counters", t, Some(""))._1 == 400)
    assert(call("POST", "/counters/pimpo/raw", t, Some(""))._1 == 400)
    assert(call("POST", "/counters/pimpo/raw", t, Some("[]"))._1 == 400)
    assert(call("POST", "/counters/raw", t, Some(""))._1 == 400)
    assert(call("POST", "/counters/raw", t, Some("[]"))._1 == 400)
  }

  // CountersITest.groovy:82-115 — the definition round-trips in the
  // reference's Metric JSON shape, as ONE object (not a 1-element array)
  test("create simple counter: definition GET answers the reference JSON " +
    "object; duplicate create answers 409") {
    val t = Some("t-csimple")
    assert(call("POST", "/counters", t, Some("""{"id":"C1"}"""))._1 == 204)
    val (st, body) = call("GET", "/counters/C1", t)
    assert(st == 200, body)
    val node = mapper.readTree(body)
    assert(node.isObject, s"single-def GET must answer one JSON object: $body")
    assert(node.get("tenantId").asText == "t-csimple")
    assert(node.get("id").asText == "C1")
    assert(node.get("type").asText == "counter")
    assert(node.get("dataRetention").asInt == 7)
    assert(!node.has("tags"), s"no tags were set: $body")
    val (dup, dupMsg) = call("POST", "/counters", t, Some("""{"id":"C1"}"""))
    assert(dup == 409 && dupMsg.contains("errorMsg"))
  }

  // CountersITest.groovy:117-145
  test("create counter with tags and dataRetention: all fields round-trip") {
    val t = Some("t-ctags")
    assert(call("POST", "/counters", t, Some(
      """{"id":"C1","tags":{"tag1":"one","tag2":"two"},"dataRetention":100}"""))._1 == 204)
    val (st, body) = call("GET", "/counters/C1", t)
    assert(st == 200, body)
    val node = mapper.readTree(body)
    assert(node.get("dataRetention").asInt == 100)
    assert(node.get("tags").get("tag1").asText == "one")
    assert(node.get("tags").get("tag2").asText == "two")
    assert(node.get("type").asText == "counter")
  }

  // CountersITest.groovy:146-214
  test("createAndFindCounters: the type-scoped catalog lists both " +
    "definitions with the reference field names") {
    val t = Some("t-cfind")
    assert(call("POST", "/counters", t, Some("""{"id":"C1"}"""))._1 == 204)
    assert(call("POST", "/counters", t, Some(
      """{"id":"C2","tags":{"tag1":"one","tag2":"two"}}"""))._1 == 204)
    val (st, body) = call("GET", "/metrics?type=counter", t)
    assert(st == 200, body)
    val defs = mapper.readTree(body).elements().asScala.toSeq
    assert(defs.length == 2, body)
    val byId = defs.map(d => d.get("id").asText -> d).toMap
    assert(byId("C1").get("type").asText == "counter")
    assert(byId("C1").get("dataRetention").asInt == 7)
    assert(!byId("C1").has("tags"))
    assert(byId("C2").get("tags").get("tag2").asText == "two")
    assert(byId("C2").get("tenantId").asText == "t-cfind")
  }

  // CountersITest.groovy:216-273 — multi-metric ingest, ranged fetches,
  // DESC default order, end-exclusive ranges, integral wire values
  test("addDataForMultipleCountersAndFindWithDateRange") {
    val t = Some("t-cdata")
    val start = 36000000L
    def min_(m: Int) = start + m * 60000L
    assert(call("POST", "/counters/raw", t, Some(
      s"""[{"id":"C1","data":[{"timestamp":$start,"value":10},
         |                    {"timestamp":${min_(1)},"value":20}]},
         | {"id":"C2","data":[{"timestamp":$start,"value":150},
         |                    {"timestamp":${min_(1)},"value":225},
         |                    {"timestamp":${min_(2)},"value":300}]}]""".stripMargin))._1 == 204)

    // [start, start+1min) keeps only the first point
    val (s1, c1) = call("GET", s"/counters/C1/raw?start=$start&end=${min_(1)}", t)
    assert(s1 == 200 && c1 == s"""[{"timestamp":$start,"value":10}]""", c1)

    // [start, start+2min): two points, DESC default order (no limit,
    // both bounds set), values integral on the wire
    val (s2, c2) = call("GET", s"/counters/C2/raw?start=$start&end=${min_(2)}", t)
    assert(s2 == 200 &&
      c2 == s"""[{"timestamp":${min_(1)},"value":225},{"timestamp":$start,"value":150}]""", c2)
  }

  private def ts(body: String): Seq[(Long, Double)] =
    mapper.readTree(body).elements().asScala.toSeq
      .map(n => (n.get("timestamp").asLong, n.get("value").asDouble))

  // CountersITest.groovy:275-304 — no params: the default window is
  // [now-8h, now), DESC; the boundary insert (exactly 8h ago) and the
  // future point both fall outside by request time
  test("addDataForSingleCounterAndFindWithDefaultDateRange") {
    val t = Some("t-cdefrange")
    val now = System.currentTimeMillis()
    val start = now - 8 * 3600000L
    assert(call("POST", "/counters/C1/raw", t, Some(
      s"""[{"timestamp":$start,"value":100},
         | {"timestamp":${start + 3600000L},"value":200},
         | {"timestamp":${start + 4 * 3600000L},"value":500},
         | {"timestamp":${now + 30000L},"value":750}]""".stripMargin))._1 == 204)
    val (st, body) = call("GET", "/counters/C1/raw", t)
    assert(st == 200, s"$st $body")
    assert(ts(body) == Seq((start + 4 * 3600000L, 500.0), (start + 3600000L, 200.0)), body)
  }

  // CountersITest.groovy:306-449 — the full limit × order × bound matrix
  test("addDataForSingleCounterAndFindWithLimitAndSort") {
    val t = Some("t-climit")
    val now = System.currentTimeMillis()
    val start = now - 3600000L
    def m(i: Int) = start + i * 60000L
    val pts = (0 to 5).map(i => s"""{"timestamp":${m(i)},"value":${(i + 1) * 100}}""")
    assert(call("POST", "/counters/C1/raw", t, Some(
      (pts :+ s"""{"timestamp":${now + 30000L},"value":750}""").mkString("[", ",", "]")))._1 == 204)

    def expect(q: String, want: Seq[(Int, Int)]): Unit = {
      val (st, body) = call("GET", s"/counters/C1/raw$q", t)
      assert(st == 200, s"$q: $st $body")
      assert(ts(body) == want.map { case (i, v) => (m(i), v.toDouble) }, s"$q: $body")
    }
    // limit alone → DESC from the default window's end
    expect("?limit=2", Seq(5 -> 600, 4 -> 500))
    expect("?limit=2&order=desc", Seq(5 -> 600, 4 -> 500))
    expect("?limit=3&order=asc", Seq(0 -> 100, 1 -> 200, 2 -> 300))
    // start alone + limit → ASC default (order follows the given bound)
    expect(s"?limit=3&start=${m(1)}", Seq(1 -> 200, 2 -> 300, 3 -> 400))
    // end alone + limit → DESC default
    expect(s"?limit=3&end=${m(5) + 1}", Seq(5 -> 600, 4 -> 500, 3 -> 400))
    // explicit desc beats the start-implies-asc rule
    expect(s"?limit=3&start=${m(1) - 1}&order=desc", Seq(5 -> 600, 4 -> 500, 3 -> 400))
    // non-positive limits mean unlimited
    expect("?limit=-1&order=desc", Seq(5 -> 600, 4 -> 500, 3 -> 400, 2 -> 300, 1 -> 200, 0 -> 100))
    expect("?limit=-100&order=asc", Seq(0 -> 100, 1 -> 200, 2 -> 300, 3 -> 400, 4 -> 500, 5 -> 600))
  }

  // the findCounterStats / findRate / findRateStats fixture
  // (CountersITest.groovy:551-561 — ts in half-minutes, values 0..1000)
  private def seedStatsFixture(t: Option[String]): Unit =
    assert(call("POST", "/counters/C1/raw", t, Some(
      """[{"timestamp":60000,"value":0},{"timestamp":90000,"value":200},
        |{"timestamp":210000,"value":400},{"timestamp":300000,"value":550},
        |{"timestamp":420000,"value":950},{"timestamp":450000,"value":1000}]"""
        .stripMargin))._1 == 204)

  private def bucketAt(body: String, startMs: Long): com.fasterxml.jackson.databind.JsonNode = {
    val arr = mapper.readTree(body)
    val it = arr.elements().asScala.find(_.get("start").asLong == startMs)
    assert(it.isDefined, s"no bucket at $startMs in $body")
    it.get
  }

  private def assertNumBucket(b: com.fasterxml.jackson.databind.JsonNode,
                              min: Double, avg: Double, median: Double,
                              max: Double, sum: Double, samples: Int): Unit = {
    assert(!b.get("empty").asBoolean, s"expected non-empty: $b")
    assert(math.abs(b.get("min").asDouble - min) <= 0.001, s"min: $b")
    assert(math.abs(b.get("avg").asDouble - avg) <= 0.001, s"avg: $b")
    assert(math.abs(b.get("median").asDouble - median) <= 0.001, s"median: $b")
    assert(math.abs(b.get("max").asDouble - max) <= 0.001, s"max: $b")
    assert(math.abs(b.get("sum").asDouble - sum) <= 0.001, s"sum: $b")
    assert(b.get("samples").asInt == samples, s"samples: $b")
  }

  // CountersITest.groovy:546-604 findCounterStats — 1mn buckets with
  // interleaved empties. The reference's medians are P² estimates
  // (median([0,200])=0): asserted bit-for-bit through the p2parity
  // opt-in; the default mode serves exact interpolated medians
  // (the documented divergence, GaugeStatsHttpITest scaladoc).
  test("findCounterStats: 1mn buckets, empties carry only {start,end,empty}; " +
    "p2parity serves the reference's literal medians") {
    val t = Some("t-cstats")
    seedStatsFixture(t)
    val q = "start=60000&end=480000&bucketDuration=1mn"
    val (st, body) = call("GET", s"/counters/C1/stats?$q", t)
    assert(st == 200, body)
    assert(mapper.readTree(body).size() == 7, s"7 buckets: $body")
    assertNumBucket(bucketAt(body, 60000), 0, 100, 100, 200, 200, 2) // exact median
    assertNumBucket(bucketAt(body, 180000), 400, 400, 400, 400, 400, 1)
    assertNumBucket(bucketAt(body, 300000), 550, 550, 550, 550, 550, 1)
    assertNumBucket(bucketAt(body, 420000), 950, 975, 975, 1000, 1950, 2)
    for (emptyStart <- Seq(120000L, 240000L, 360000L)) {
      val b = bucketAt(body, emptyStart)
      assert(b.get("empty").asBoolean && !b.has("samples") && !b.has("min"), s"empty: $b")
    }
    // p2parity: the reference's own expected medians (0 and 950)
    val (ps, pbody) = call("GET", s"/counters/C1/stats?$q&percentileMode=p2parity", t)
    assert(ps == 200, pbody)
    assert(math.abs(bucketAt(pbody, 60000).get("median").asDouble - 0) <= 0.001, pbody)
    assert(math.abs(bucketAt(pbody, 420000).get("median").asDouble - 950) <= 0.001, pbody)
  }

  // CountersITest.groovy:606-651 findRate
  test("findRate: per-minute pairwise rates, ascending") {
    val t = Some("t-crate")
    seedStatsFixture(t)
    val (st, body) = call("GET", "/counters/C1/rate?start=0&order=asc", t)
    assert(st == 200, body)
    assert(ts(body) == Seq(90000L -> 400.0, 210000L -> 100.0, 300000L -> 100.0,
      420000L -> 200.0, 450000L -> 100.0), body)
  }

  // CountersITest.groovy:652-701 findRateWhenThereAreResets — pairs
  // where the counter decreased are screened, and pairing restarts at
  // the post-reset point
  test("findRate screens counter resets") {
    val t = Some("t-cresets")
    assert(call("POST", "/counters/C1/raw", t, Some(
      """[{"timestamp":60000,"value":1},{"timestamp":90000,"value":2},
        |{"timestamp":210000,"value":3},{"timestamp":300000,"value":1},
        |{"timestamp":420000,"value":2},{"timestamp":450000,"value":3},
        |{"timestamp":480000,"value":1},{"timestamp":510000,"value":2},
        |{"timestamp":540000,"value":3}]""".stripMargin))._1 == 204)
    val (st, body) = call("GET", "/counters/C1/rate?start=0&order=asc", t)
    assert(st == 200, body)
    assert(ts(body) == Seq(90000L -> 2.0, 210000L -> 0.5, 420000L -> 0.5,
      450000L -> 2.0, 510000L -> 2.0, 540000L -> 2.0), body)
  }

  // CountersITest.groovy:702-758 findRateStats — W1 rates bucketed like
  // any numeric series (exact medians, the documented default)
  test("findRateStats: 1mn buckets over the derived rate series") {
    val t = Some("t-cratestats")
    seedStatsFixture(t)
    val (st, body) = call("GET",
      "/counters/C1/rate/stats?start=60000&end=480000&bucketDuration=1mn", t)
    assert(st == 200, body)
    assert(mapper.readTree(body).size() == 7, s"7 buckets: $body")
    assertNumBucket(bucketAt(body, 60000), 400, 400, 400, 400, 400, 1)
    assertNumBucket(bucketAt(body, 180000), 100, 100, 100, 100, 100, 1)
    assertNumBucket(bucketAt(body, 300000), 100, 100, 100, 100, 100, 1)
    assertNumBucket(bucketAt(body, 420000), 100, 150, 150, 200, 300, 2)
    for (emptyStart <- Seq(120000L, 240000L, 360000L))
      assert(bucketAt(body, emptyStart).get("empty").asBoolean, body)
  }

  // CountersITest.groovy:1608-1656 addTaggedDataPoints — per-point tags
  // round-trip on the counter raw routes, DESC default
  test("addTaggedDataPoints: per-point tags round-trip") {
    val t = Some("t-ctagpoints")
    val start = System.currentTimeMillis() - 30 * 60000L
    assert(call("POST", "/counters/C1/raw", t, Some(
      s"""[{"timestamp":$start,"value":11,"tags":{"x":"1","y":"2"}},
         | {"timestamp":${start + 60000},"value":20,"tags":{"y":"3","z":"5"}},
         | {"timestamp":${start + 3 * 60000},"value":33,"tags":{"x":"4","z":"6"}}]"""
        .stripMargin))._1 == 204)
    val (st, body) = call("GET", "/counters/C1/raw", t)
    assert(st == 200, body)
    val pts = mapper.readTree(body)
    assert(pts.size() == 3, body)
    assert(pts.get(0).get("timestamp").asLong == start + 3 * 60000 &&
      pts.get(0).get("value").asLong == 33 &&
      pts.get(0).get("tags").get("x").asText == "4" &&
      pts.get(0).get("tags").get("z").asText == "6", body)
    assert(pts.get(1).get("tags").get("y").asText == "3", body)
    assert(pts.get(2).get("tags").get("x").asText == "1" &&
      pts.get(2).get("tags").get("y").asText == "2", body)
  }

  // CountersITest.groovy:1658-1720 findTaggedDataPointsWithMultipleTagFilters
  // — GET /{id}/stats/tags/{tags}: an OBJECT keyed by the matched tag
  // combination, each entry carrying its tags map and the group's stats
  test("tagged stats answer the reference's combination-keyed object") {
    val t = Some("t-ctagstats")
    val start = System.currentTimeMillis() - 2 * 3600000L
    assert(call("POST", "/counters/C1/raw", t, Some(
      s"""[{"timestamp":$start,"value":11,"tags":{"x":"1","y":"1","z":"1"}},
         | {"timestamp":${start + 2 * 60000},"value":13,"tags":{"x":"2","y":"2","z":"2"}},
         | {"timestamp":${start + 4 * 60000},"value":14,"tags":{"x":"3","y":"2","z":"3"}},
         | {"timestamp":${start + 6 * 60000},"value":15,"tags":{"x":"1","y":"3","z":"4"}}]"""
        .stripMargin))._1 == 204)
    val (st, body) = call("GET", "/counters/C1/stats/tags/x:*,y:2,z:2%7C3", t)
    assert(st == 200, body)
    val obj = mapper.readTree(body)
    assert(obj.isObject && obj.size() == 2, s"two matched combinations: $body")
    for ((key, x, v) <- Seq(("x:2,y:2,z:2", "2", 13.0), ("x:3,y:2,z:3", "3", 14.0))) {
      val e = obj.get(key)
      assert(e != null, s"missing '$key' in $body")
      assert(e.get("tags").get("x").asText == x &&
        e.get("tags").get("y").asText == "2", s"$key tags: $body")
      for (f <- Seq("min", "max", "avg", "median", "sum"))
        assert(e.get(f).asDouble == v, s"$key $f: $body")
      assert(e.get("samples").asLong == 1, s"$key samples: $body")
    }
  }

  // CountersITest.groovy:794-826 percentileParameter — the reference's
  // `400 ± 0.1` p50 expectation is a P² estimate over the ASC counter
  // feed: pinned through p2parity; the exact default serves the
  // interpolated (400+550)/2
  test("percentileParameter: quantile echo and the reference's P² p50 " +
    "via p2parity") {
    val t = Some("t-cpcts")
    seedStatsFixture(t)
    val q = "start=60000&end=480000&buckets=1&percentiles=50.0,90.0,99.9"
    val (st, body) = call("GET", s"/counters/C1/stats?$q&percentileMode=p2parity", t)
    assert(st == 200, body)
    val arr = mapper.readTree(body)
    assert(arr.size() == 1, body)
    val pcts = arr.get(0).get("percentiles")
    assert(pcts != null && pcts.size() == 3, body)
    assert(pcts.get(0).get("quantile").asDouble == 50.0, body)
    assert(math.abs(pcts.get(0).get("value").asDouble - 400) <= 0.1,
      s"reference expectation (CountersITest.groovy:825): $body")

    val (es, ebody) = call("GET", s"/counters/C1/stats?$q", t)
    assert(es == 200, ebody)
    val ep50 = mapper.readTree(ebody).get(0).get("percentiles").get(0)
    assert(math.abs(ep50.get("value").asDouble - 475) <= 0.001,
      s"exact default p50 is interpolated (400+550)/2: $ebody")
  }
}
