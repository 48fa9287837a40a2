package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.SparkTestBase

/**
 * Port of the reference's POST /metrics/stats/query and
 * /metrics/stats/batch/query REST integration tests over the real HTTP
 * transport — the assertions of
 * rest-tests-jaxrs/.../MetricsITest.groovy:633-880 (fetchStats: the
 * metrics-map-driven mixed query, response nested {type: {id:
 * [BucketPoint...]}}), :904-2406 (the per-type and `types`-array
 * variants — fetchGaugeStats, fetchGaugeStatsWithRates,
 * fetchGaugeStatsWithPercentiles, fetchCounterStats{,WithRates},
 * fetchGaugeAndCounterRateStats, fetchRateStats, and the three ByTags
 * combos), :2405-2421 (shouldNotFetchStatsWithoutBucketParam)
 * and :2423-2641 (batchQueriesForGaugesAndCounterRates: the name-keyed
 * `Map<String, StatsQueryRequest>` body, response nested one level
 * deeper per request key, with a tags+types=[counter_rate] element).
 *
 * Expected statistics are recomputed from the raw samples like the
 * Groovy suite does; medians assert the engine's EXACT interpolated
 * value (the documented P² divergence, GaugeStatsHttpITest scaladoc).
 */
class MetricsStatsHttpITest extends SparkTestBase with HttpSpecSupport {

  private val mapper = new ObjectMapper()
  private val Delta = 0.001

  // the shared fixture of MetricsITest.groovy:2427-2500 (a superset of
  // the withDataPoints values the fetchStats test uses)
  private def loadFixture(t: Option[String]): Unit = {
    assert(call("POST", "/gauges", t,
      Some("""{"id":"G1","tags":{"x":"1","y":"1","z":"1"}}"""))._1 == 204)
    assert(call("POST", "/gauges", t,
      Some("""{"id":"G2","tags":{"x":"1","y":"2","z":"2"}}"""))._1 == 204)
    assert(call("POST", "/gauges", t,
      Some("""{"id":"G3","tags":{"x":"2","y":"3","z":"1"}}"""))._1 == 204)
    assert(call("POST", "/counters", t,
      Some("""{"id":"C1","tags":{"x":"1","y":"1","z":"3"}}"""))._1 == 204)
    assert(call("POST", "/counters", t,
      Some("""{"id":"C2","tags":{"x":"1","y":"2","z":"1"}}"""))._1 == 204)
    assert(call("POST", "/counters", t,
      Some("""{"id":"C3","tags":{"x":"2","y":"3","z":"1"}}"""))._1 == 204)
    assert(call("POST", "/gauges/raw", t, Some(
      """[{"id":"G1","data":[{"timestamp":100,"value":1.23},{"timestamp":200,"value":3.45},
        |{"timestamp":300,"value":5.34},{"timestamp":400,"value":2.22},{"timestamp":500,"value":5.22}]},
        |{"id":"G2","data":[{"timestamp":100,"value":1.45},{"timestamp":200,"value":2.36},
        |{"timestamp":300,"value":3.62},{"timestamp":400,"value":2.63},{"timestamp":500,"value":3.99}]},
        |{"id":"G3","data":[{"timestamp":100,"value":4.45},{"timestamp":200,"value":5.55},
        |{"timestamp":300,"value":4.44},{"timestamp":400,"value":3.33},{"timestamp":500,"value":3.77}]}]"""
        .stripMargin))._1 == 204)
    assert(call("POST", "/counters/raw", t, Some(
      """[{"id":"C1","data":[{"timestamp":100,"value":12},{"timestamp":200,"value":17},
        |{"timestamp":300,"value":19},{"timestamp":400,"value":26},{"timestamp":500,"value":37}]},
        |{"id":"C2","data":[{"timestamp":100,"value":41},{"timestamp":200,"value":49},
        |{"timestamp":300,"value":64},{"timestamp":400,"value":71},{"timestamp":500,"value":95}]},
        |{"id":"C3","data":[{"timestamp":100,"value":28},{"timestamp":200,"value":35},
        |{"timestamp":300,"value":42},{"timestamp":400,"value":49},{"timestamp":500,"value":59}]}]"""
        .stripMargin))._1 == 204)
    // availability definitions carry the withDataPoints tags too
    // (MetricsITest.groovy:497-519) — A2/A3 both have z:1, which makes
    // the ByTags `types` filter assertions meaningful: a tag-selected
    // availability metric must NOT leak into a gauge/counter-typed query
    assert(call("POST", "/availability", t,
      Some("""{"id":"A2","tags":{"x":"1","y":"2","z":"1"}}"""))._1 == 204)
    assert(call("POST", "/availability", t,
      Some("""{"id":"A3","tags":{"x":"2","y":"3","z":"1"}}"""))._1 == 204)
    // availability fixture of MetricsITest.groovy:595-627 (A2/A3)
    assert(call("POST", "/availability/raw", t, Some(
      """[{"id":"A2","data":[{"timestamp":100,"value":"down"},{"timestamp":200,"value":"up"},
        |{"timestamp":300,"value":"down"},{"timestamp":400,"value":"up"},{"timestamp":500,"value":"up"}]},
        |{"id":"A3","data":[{"timestamp":100,"value":"up"},{"timestamp":200,"value":"down"},
        |{"timestamp":300,"value":"down"},{"timestamp":400,"value":"up"},{"timestamp":500,"value":"up"}]}]"""
        .stripMargin))._1 == 204)
  }

  private def d(n: JsonNode, f: String): Double = {
    assert(n.hasNonNull(f), s"missing field '$f' in $n")
    n.get(f).asDouble
  }
  private def l(n: JsonNode, f: String): Long = {
    assert(n.hasNonNull(f), s"missing field '$f' in $n")
    n.get(f).asLong
  }

  private def exactMedian(values: Seq[Double]): Double = {
    val s = values.sorted
    val rank = 0.5 * (s.length - 1)
    val lo = s(rank.toInt)
    val hi = s(math.ceil(rank).toInt)
    lo + (rank - rank.toInt) * (hi - lo)
  }

  /** assertNumericBucketEquals (RESTTest.groovy) on a nested section's
    * bucket point. */
  private def assertNumeric(b: JsonNode, start: Long, end: Long,
                            values: Seq[Double]): Unit = {
    assert(l(b, "start") == start && l(b, "end") == end, s"range: $b")
    assert(!b.get("empty").asBoolean, s"expected non-empty: $b")
    assert(l(b, "samples") == values.length, s"samples: $b")
    assert(math.abs(d(b, "min") - values.min) <= Delta, s"min: $b")
    assert(math.abs(d(b, "max") - values.max) <= Delta, s"max: $b")
    assert(math.abs(d(b, "sum") - values.sum) <= Delta, s"sum: $b")
    assert(math.abs(d(b, "avg") - values.sum / values.length) <= Delta, s"avg: $b")
    assert(math.abs(d(b, "median") - exactMedian(values)) <= Delta, s"median: $b")
  }

  /** assertAvailablityBucketEquals (RESTTest.groovy) — the reference wire
    * field names (AvailabilityBucketPoint getters + the text-coded
    * durationMap). */
  private def assertAvail(b: JsonNode, start: Long, end: Long,
                          upMs: Long, downMs: Long, lastNotUptime: Long,
                          uptimeRatio: Double, notUpCount: Long): Unit = {
    assert(l(b, "start") == start && l(b, "end") == end, s"range: $b")
    assert(!b.get("empty").asBoolean, s"expected non-empty: $b")
    assert(l(b, "upDuration") == upMs, s"upDuration: $b")
    assert(l(b, "downDuration") == downMs, s"downDuration: $b")
    assert(l(b, "adminDuration") == 0 && l(b, "unknownDuration") == 0, s"admin/unknown: $b")
    assert(l(b, "notUpDuration") == downMs, s"notUpDuration: $b")
    assert(l(b, "lastNotUptime") == lastNotUptime, s"lastNotUptime: $b")
    assert(math.abs(d(b, "uptimeRatio") - uptimeRatio) <= Delta, s"uptimeRatio: $b")
    assert(l(b, "notUpCount") == notUpCount, s"notUpCount: $b")
    val dm = b.get("durationMap")
    assert(dm != null && dm.isObject, s"durationMap: $b")
    assert((if (dm.hasNonNull("up")) dm.get("up").asLong else 0L) == upMs, s"durationMap.up: $b")
    assert((if (dm.hasNonNull("down")) dm.get("down").asLong else 0L) == downMs, s"durationMap.down: $b")
  }

  // MetricsITest.groovy:633-880 fetchStats
  test("POST /metrics/stats/query with a metrics map nests {type: {id: [buckets]}} " +
    "across gauge, counter and availability sections") {
    val t = Some("t-fetchstats")
    loadFixture(t)
    val (st, body) = call("POST", "/metrics/stats/query", t, Some(
      """{"metrics":{"gauge":["G1","G3"],"counter":["C2","C3"],
        |"availability":["A2","A3"]},"buckets":2,"start":200,"end":500}""".stripMargin))
    assert(st == 200, s"stats query failed: $body")
    val data = mapper.readTree(body)
    assert(data.size() == 3, s"exactly the three queried sections: $body")

    val gauge = data.get("gauge")
    assert(gauge != null && gauge.size() == 2, s"gauge section: $body")
    assertNumeric(gauge.get("G1").get(0), 200, 350, Seq(3.45, 5.34))
    assertNumeric(gauge.get("G1").get(1), 350, 500, Seq(2.22))
    assertNumeric(gauge.get("G3").get(0), 200, 350, Seq(5.55, 4.44))
    assertNumeric(gauge.get("G3").get(1), 350, 500, Seq(3.33))

    val counter = data.get("counter")
    assert(counter != null && counter.size() == 2, s"counter section: $body")
    assertNumeric(counter.get("C2").get(0), 200, 350, Seq(49, 64))
    assertNumeric(counter.get("C2").get(1), 350, 500, Seq(71))
    assertNumeric(counter.get("C3").get(0), 200, 350, Seq(35, 42))
    assertNumeric(counter.get("C3").get(1), 350, 500, Seq(49))

    val avail = data.get("availability")
    assert(avail != null && avail.size() == 2, s"availability section: $body")
    // A2 in [200,350): up [200,300), down [300,350) → ratio 100/150
    assertAvail(avail.get("A2").get(0), 200, 350,
      upMs = 100, downMs = 50, lastNotUptime = 350, uptimeRatio = 100.0 / 150, notUpCount = 1)
    assertAvail(avail.get("A2").get(1), 350, 500,
      upMs = 150, downMs = 0, lastNotUptime = 0, uptimeRatio = 1.0, notUpCount = 0)
    assertAvail(avail.get("A3").get(0), 200, 350,
      upMs = 0, downMs = 150, lastNotUptime = 350, uptimeRatio = 0.0, notUpCount = 1)
    assertAvail(avail.get("A3").get(1), 350, 500,
      upMs = 150, downMs = 0, lastNotUptime = 0, uptimeRatio = 1.0, notUpCount = 0)

    // the groovy test re-runs the same query with bucketDuration: "150ms"
    // and expects the identical response
    val (st2, body2) = call("POST", "/metrics/stats/query", t, Some(
      """{"metrics":{"gauge":["G1","G3"],"counter":["C2","C3"],
        |"availability":["A2","A3"]},"bucketDuration":"150ms","start":200,"end":500}""".stripMargin))
    assert(st2 == 200 && body2 == body,
      s"buckets=2 and bucketDuration=150ms must serialize identically:\n$body\n$body2")
  }

  // MetricsITest.groovy:2405-2421
  test("stats query without buckets or bucketDuration answers 400") {
    val t = Some("t-nobuckets")
    val (st, body) = call("POST", "/metrics/stats/query", t,
      Some("""{"metrics":{"counter":["C2","C3"]},"start":200,"end":500}"""))
    assert(st == 400, s"expected 400: $st $body")
  }

  // MetricsITest.groovy:2423-2641 batchQueriesForGaugesAndCounterRates
  test("POST /metrics/stats/batch/query with a name-keyed object nests " +
    "{key: {type: {id: [buckets]}}}, mixing id-driven and tag-driven rate entries") {
    val t = Some("t-batchnamed")
    loadFixture(t)
    val (st, body) = call("POST", "/metrics/stats/batch/query", t, Some(
      """{"q1":{"metrics":{"gauge":["G1","G3"]},"buckets":2,"start":200,"end":500},
        |"q2":{"tags":"z = 1","types":["counter_rate"],"buckets":2,"start":200,"end":500}}"""
        .stripMargin))
    assert(st == 200, s"batch failed: $body")
    val data = mapper.readTree(body)
    assert(data.size() == 2, s"two request keys: $body")

    val q1 = data.get("q1")
    assert(q1 != null && q1.size() == 1 && q1.has("gauge"), s"q1 shape: $body")
    assert(q1.get("gauge").get("G1").size() == 2)
    assertNumeric(q1.get("gauge").get("G1").get(0), 200, 350, Seq(3.45, 5.34))
    assertNumeric(q1.get("gauge").get("G1").get(1), 350, 500, Seq(2.22))
    assert(q1.get("gauge").get("G3").size() == 2)
    assertNumeric(q1.get("gauge").get("G3").get(0), 200, 350, Seq(5.55, 4.44))
    assertNumeric(q1.get("gauge").get("G3").get(1), 350, 500, Seq(3.33))

    // q2: tags z=1 resolve counters C2, C3; per-minute rates derive from
    // the IN-RANGE fetch (first in-range point is the seed): C2 rates —
    // 300→(64-49)/100ms = 9000/min, 400→4200/min; C3 — 4200/min at both
    val q2 = data.get("q2")
    assert(q2 != null && q2.size() == 1 && q2.has("counter_rate"), s"q2 shape: $body")
    val rates = q2.get("counter_rate")
    assert(rates.size() == 2 && rates.has("C2") && rates.has("C3"), s"q2 metrics: $body")
    assertNumeric(rates.get("C2").get(0), 200, 350, Seq(9000))
    assertNumeric(rates.get("C2").get(1), 350, 500, Seq(4200))
    assertNumeric(rates.get("C3").get(0), 200, 350, Seq(4200))
    assertNumeric(rates.get("C3").get(1), 350, 500, Seq(4200))
  }

  // checkRequiredParams inside the batch: every element is validated
  // (MetricHandler.findStatsBatched:326 queries.values().forEach)
  test("a batch element without metrics or tags answers 400") {
    val t = Some("t-batchbad")
    val (st, body) = call("POST", "/metrics/stats/batch/query", t, Some(
      """{"q1":{"buckets":2,"start":200,"end":500}}"""))
    assert(st == 400 && body.contains("errorMsg"), s"expected 400: $st $body")
  }

  // ---- the shared expectations of MetricsITest.groovy:904-2406 — the
  // withDataPoints fixture's bucket values, named once. Rates derive
  // from the in-range fetch (first in-range point seeds), per-minute:
  // G1 200→300: (5.34-3.45)/100ms = 1134/min, 300→400: -1872/min;
  // G3: -666/min at both steps; C2: 9000 then 4200; C3: 4200 twice.
  // Gauge rates KEEP negative deltas (no counter-reset screen).
  private def assertGaugeSection(g: JsonNode, body: String): Unit = {
    assert(g != null && g.size() == 2, s"gauge section: $body")
    assertNumeric(g.get("G1").get(0), 200, 350, Seq(3.45, 5.34))
    assertNumeric(g.get("G1").get(1), 350, 500, Seq(2.22))
    assertNumeric(g.get("G3").get(0), 200, 350, Seq(5.55, 4.44))
    assertNumeric(g.get("G3").get(1), 350, 500, Seq(3.33))
  }
  private def assertGaugeRateSection(gr: JsonNode, body: String): Unit = {
    assert(gr != null && gr.size() == 2, s"gauge_rate section: $body")
    assertNumeric(gr.get("G1").get(0), 200, 350, Seq(1134))
    assertNumeric(gr.get("G1").get(1), 350, 500, Seq(-1872))
    assertNumeric(gr.get("G3").get(0), 200, 350, Seq(-666))
    assertNumeric(gr.get("G3").get(1), 350, 500, Seq(-666))
  }
  private def assertCounterSection(c: JsonNode, body: String): Unit = {
    assert(c != null && c.size() == 2, s"counter section: $body")
    assertNumeric(c.get("C2").get(0), 200, 350, Seq(49, 64))
    assertNumeric(c.get("C2").get(1), 350, 500, Seq(71))
    assertNumeric(c.get("C3").get(0), 200, 350, Seq(35, 42))
    assertNumeric(c.get("C3").get(1), 350, 500, Seq(49))
  }
  private def assertCounterRateSection(cr: JsonNode, body: String): Unit = {
    assert(cr != null && cr.size() == 2, s"counter_rate section: $body")
    assertNumeric(cr.get("C2").get(0), 200, 350, Seq(9000))
    assertNumeric(cr.get("C2").get(1), 350, 500, Seq(4200))
    assertNumeric(cr.get("C3").get(0), 200, 350, Seq(4200))
    assertNumeric(cr.get("C3").get(1), 350, 500, Seq(4200))
  }

  private def statsQuery(t: Option[String], json: String): JsonNode = {
    val (st, body) = call("POST", "/metrics/stats/query", t, Some(json))
    assert(st == 200, s"stats query failed: $st $body")
    mapper.readTree(body)
  }

  // MetricsITest.groovy:904-983 fetchGaugeStats
  test("a gauge-only metrics map answers exactly one gauge section") {
    val t = Some("t-gaugestats")
    loadFixture(t)
    val data = statsQuery(t,
      """{"metrics":{"gauge":["G1","G3"]},"buckets":2,"start":200,"end":500}""")
    assert(data.size() == 1, s"only the gauge section: $data")
    assertGaugeSection(data.get("gauge"), data.toString)
  }

  // MetricsITest.groovy:984-1122 fetchGaugeStatsWithRates
  test("types [gauge, gauge_rate] adds a gauge_rate section whose rates " +
    "keep negative deltas") {
    val t = Some("t-gaugerates")
    loadFixture(t)
    val data = statsQuery(t,
      """{"metrics":{"gauge":["G1","G3"]},"types":["gauge","gauge_rate"],
        |"buckets":2,"start":200,"end":500}""".stripMargin)
    assert(data.size() == 2, s"gauge + gauge_rate: $data")
    assertGaugeSection(data.get("gauge"), data.toString)
    assertGaugeRateSection(data.get("gauge_rate"), data.toString)
  }

  // MetricsITest.groovy:1123-1220 fetchGaugeStatsWithPercentiles — the
  // body's percentiles property is a CSV string; expected values are the
  // engine's documented exact interpolation (GaugeStatsHttpITest scaladoc
  // pins the commons-math P² twin behind percentileMode=p2parity)
  test("body percentiles \"95,99\" attach a {quantile, value} array per bucket") {
    val t = Some("t-gaugepcts")
    loadFixture(t)
    val data = statsQuery(t,
      """{"metrics":{"gauge":["G1","G3"]},"buckets":2,"percentiles":"95,99",
        |"start":200,"end":500}""".stripMargin)
    assert(data.size() == 1, s"only the gauge section: $data")
    assertGaugeSection(data.get("gauge"), data.toString)
    def exactPct(q: Double, values: Seq[Double]): Double = {
      val s = values.sorted
      val rank = q / 100.0 * (s.length - 1)
      s(rank.toInt) + (rank - rank.toInt) * (s(math.ceil(rank).toInt) - s(rank.toInt))
    }
    def assertPcts(b: JsonNode, values: Seq[Double]): Unit = {
      val arr = b.get("percentiles")
      assert(arr != null && arr.size() == 2, s"percentiles: $b")
      assert(arr.get(0).get("quantile").asDouble == 95.0 &&
        arr.get(1).get("quantile").asDouble == 99.0, s"quantile echo: $b")
      assert(math.abs(arr.get(0).get("value").asDouble - exactPct(95, values)) <= Delta, s"p95: $b")
      assert(math.abs(arr.get(1).get("value").asDouble - exactPct(99, values)) <= Delta, s"p99: $b")
    }
    assertPcts(data.get("gauge").get("G1").get(0), Seq(3.45, 5.34))
    assertPcts(data.get("gauge").get("G1").get(1), Seq(2.22))
    assertPcts(data.get("gauge").get("G3").get(0), Seq(4.44, 5.55))
    assertPcts(data.get("gauge").get("G3").get(1), Seq(3.33))
  }

  // MetricsITest.groovy:1221-1306 fetchCounterStats
  test("a counter-only metrics map answers exactly one counter section") {
    val t = Some("t-ctrstats")
    loadFixture(t)
    val data = statsQuery(t,
      """{"metrics":{"counter":["C2","C3"]},"buckets":2,"start":200,"end":500}""")
    assert(data.size() == 1, s"only the counter section: $data")
    assertCounterSection(data.get("counter"), data.toString)
  }

  // MetricsITest.groovy:1307-1455 fetchCounterStatsWithRates
  test("types [counter, counter_rate] answers both counter sections") {
    val t = Some("t-ctrrates")
    loadFixture(t)
    val data = statsQuery(t,
      """{"metrics":{"counter":["C2","C3"]},"types":["counter","counter_rate"],
        |"buckets":2,"start":200,"end":500}""".stripMargin)
    assert(data.size() == 2, s"counter + counter_rate: $data")
    assertCounterSection(data.get("counter"), data.toString)
    assertCounterRateSection(data.get("counter_rate"), data.toString)
  }

  // MetricsITest.groovy:1456-1599 fetchGaugeAndCounterRateStats — the
  // types array SUPPRESSES the counter value section even though the
  // metrics map names counters
  test("types [gauge, counter_rate] over a gauge+counter map suppresses " +
    "the counter value section") {
    val t = Some("t-gctrrate")
    loadFixture(t)
    val data = statsQuery(t,
      """{"metrics":{"gauge":["G1","G3"],"counter":["C2","C3"]},
        |"types":["gauge","counter_rate"],"buckets":2,"start":200,"end":500}""".stripMargin)
    assert(data.size() == 2 && data.has("gauge") && data.has("counter_rate"),
      s"gauge + counter_rate only: $data")
    assertGaugeSection(data.get("gauge"), data.toString)
    assertCounterRateSection(data.get("counter_rate"), data.toString)
  }

  // MetricsITest.groovy:1600-1744 fetchRateStats — rate-only types drop
  // BOTH value sections
  test("types [gauge_rate, counter_rate] answers only the rate sections") {
    val t = Some("t-ratesonly")
    loadFixture(t)
    val data = statsQuery(t,
      """{"metrics":{"gauge":["G1","G3"],"counter":["C2","C3"]},
        |"types":["gauge_rate","counter_rate"],"buckets":2,"start":200,"end":500}""".stripMargin)
    assert(data.size() == 2 && data.has("gauge_rate") && data.has("counter_rate"),
      s"rate sections only: $data")
    assertGaugeRateSection(data.get("gauge_rate"), data.toString)
    assertCounterRateSection(data.get("counter_rate"), data.toString)
  }

  // MetricsITest.groovy:1857-1999 fetchGaugeAndCounterRateStatsByTags —
  // the same combos driven by the tags property; z:1 also tags A2/A3,
  // whose availability sections must NOT leak past the types filter
  test("tags z:1 with types [gauge, counter_rate] resolves each section's " +
    "members independently and excludes the tagged availability metrics") {
    val t = Some("t-bytags1")
    loadFixture(t)
    val data = statsQuery(t,
      """{"tags":"z:1","types":["gauge","counter_rate"],
        |"buckets":2,"start":200,"end":500}""".stripMargin)
    assert(data.size() == 2 && data.has("gauge") && data.has("counter_rate"),
      s"gauge + counter_rate only: $data")
    // z:1 gauges are G1 and G3; z:1 counters are C2 and C3
    assertGaugeSection(data.get("gauge"), data.toString)
    assertCounterRateSection(data.get("counter_rate"), data.toString)
  }

  // MetricsITest.groovy:2000-2142 fetchGaugeRateAndCounterStatsByTags
  test("tags z:1 with types [gauge_rate, counter] crosses the families") {
    val t = Some("t-bytags2")
    loadFixture(t)
    val data = statsQuery(t,
      """{"tags":"z:1","types":["gauge_rate","counter"],
        |"buckets":2,"start":200,"end":500}""".stripMargin)
    assert(data.size() == 2 && data.has("gauge_rate") && data.has("counter"),
      s"gauge_rate + counter only: $data")
    assertGaugeRateSection(data.get("gauge_rate"), data.toString)
    assertCounterSection(data.get("counter"), data.toString)
  }

  // MetricsITest.groovy:2143-2405 fetchGaugeAndCounterStatsWithRatesByTags
  test("tags z:1 with all four numeric types answers all four sections") {
    val t = Some("t-bytags4")
    loadFixture(t)
    val data = statsQuery(t,
      """{"tags":"z:1","types":["gauge","gauge_rate","counter","counter_rate"],
        |"buckets":2,"start":200,"end":500}""".stripMargin)
    assert(data.size() == 4, s"all four sections: $data")
    assertGaugeSection(data.get("gauge"), data.toString)
    assertGaugeRateSection(data.get("gauge_rate"), data.toString)
    assertCounterSection(data.get("counter"), data.toString)
    assertCounterRateSection(data.get("counter_rate"), data.toString)
  }
}
