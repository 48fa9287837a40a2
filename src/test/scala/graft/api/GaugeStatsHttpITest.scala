package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.SparkTestBase
import scala.jdk.CollectionConverters._

/**
 * Port of the reference REST integration suite over the real HTTP
 * transport — the assertions of
 * rest-tests-jaxrs/.../GaugeMetricStatisticsITest.groovy:95-167
 * (shouldGroupDataPointsInto10Buckets), :170-218 (largeDataSetTest),
 * :224-330 (the POST /stats/query ≡ GET /stats invariant with tag
 * filters), plus the 400/404/405 paths of ErrorsITest.groovy:37-56.
 *
 * Expected statistics are recomputed in-test from the raw samples,
 * exactly like the Groovy suite recomputes them with commons-math —
 * with ONE documented divergence: the reference's `median` and
 * `percentiles` are P² streaming ESTIMATES (PSquarePercentile,
 * NumericDataPointCollector.java:61), while this engine's REST path
 * serves EXACT interpolated percentiles (SURVEY §7 hard part 1; the
 * P² estimator is available as PercentileMode.P2Parity/P2Sketch).
 * Medians here are therefore asserted against the exact interpolated
 * value, not the P² estimate.
 *
 * Wire shape under test: BucketPoint JSON (`start`/`end`/`empty`,
 * bucket index never leaves the server, empty buckets omit their null
 * stats) in ascending bucket order — HttpTransport.wireShape.
 */
class GaugeStatsHttpITest extends SparkTestBase with HttpSpecSupport {

  private val mapper = new ObjectMapper()
  private val Delta = 0.001 // RESTTest.groovy DELTA

  private def parse(body: String): Seq[JsonNode] =
    mapper.readTree(body).elements().asScala.toSeq

  private def d(n: JsonNode, f: String): Double = {
    assert(n.has(f), s"missing field '$f' in $n")
    n.get(f).asDouble
  }

  /** Exact interpolated percentile — the engine's documented median. */
  private def exactMedian(values: Seq[Double]): Double = {
    val s = values.sorted
    val rank = 0.5 * (s.length - 1)
    val lo = s(rank.toInt)
    val hi = s(math.ceil(rank).toInt)
    lo + (rank - rank.toInt) * (hi - lo)
  }

  /** The engine's decimal-sum recipe (MetricsOps.decSum): each double
    * rounds to decimal(28,10) before the exact sum. */
  private def decSum(values: Seq[Double]): Double =
    values.map(BigDecimal(_).setScale(10, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble

  private def assertBucket(b: JsonNode, start: Long, end: Long,
                           values: Seq[Double]): Unit = {
    assert(b.get("start").asLong == start, s"start: $b")
    assert(b.get("end").asLong == end, s"end: $b")
    if (values.isEmpty) {
      assert(b.get("empty").asBoolean, s"expected empty bucket: $b")
      // the reference omits NaN stats on empty buckets; toJSON omits nulls
      assert(!b.has("min") && !b.has("samples"), s"empty bucket must omit stats: $b")
    } else {
      assert(!b.get("empty").asBoolean, s"expected non-empty bucket: $b")
      assert(b.get("samples").asLong == values.length, s"samples: $b")
      assert(math.abs(d(b, "min") - values.min) <= Delta, s"min: $b")
      assert(math.abs(d(b, "max") - values.max) <= Delta, s"max: $b")
      assert(math.abs(d(b, "sum") - decSum(values)) <= Delta, s"sum: $b")
      assert(math.abs(d(b, "avg") - decSum(values) / values.length) <= Delta, s"avg: $b")
      assert(math.abs(d(b, "median") - exactMedian(values)) <= Delta, s"median: $b")
    }
  }

  // GaugeMetricStatisticsITest.groovy:95-167
  test("data points group into 10 buckets; empties carry only start/end/empty") {
    val t = Some("t-buckets10")
    val start = 36000000L // an hour boundary, like the ITest's start.hour
    val end = start + 3600000L
    val numBuckets = 10
    val bucketSize = (end - start) / numBuckets
    val buckets = (0 until numBuckets).map(i => start + i * bucketSize)

    assert(call("POST", "/gauges/test/raw", t, Some(
      s"""[{"timestamp":${buckets(0)},"value":12.22},
         |{"timestamp":${buckets(0) + 10000},"value":15.37},
         |{"timestamp":${buckets(4)},"value":25},
         |{"timestamp":${buckets(4) + 15000},"value":25},
         |{"timestamp":${buckets(9)},"value":18.367},
         |{"timestamp":${buckets(9) + 10000},"value":19.01}]""".stripMargin))._1 == 204)

    val (st, body) = call("GET",
      s"/gauges/test/stats?start=$start&end=$end&buckets=10", t)
    assert(st == 200, body)
    val got = parse(body)
    assert(got.length == numBuckets, s"exactly ${numBuckets} gap-filled buckets: $body")

    val expected: Seq[Seq[Double]] = Seq(
      Seq(12.22, 15.37), Nil, Nil, Nil, Seq(25.0, 25.0),
      Nil, Nil, Nil, Nil, Seq(18.367, 19.01))
    got.zipWithIndex.foreach { case (b, i) =>
      assertBucket(b, buckets(i), buckets(i) + bucketSize, expected(i))
    }
  }

  // GaugeMetricStatisticsITest.groovy:170-218 — a full day-per-bucket
  // sample set, expectations recomputed from the raw values (the ITest
  // uses unseeded Random; a fixed seed keeps the same coverage and makes
  // the run reproducible)
  test("large data set: 10 day-buckets × 1439 samples via bucketDuration") {
    val t = Some("t-large")
    val nbOfBuckets = 10
    val bucketSize = 86400000L // 1 day
    val interval = 60000L // 1 minute
    val sampleSize = (bucketSize / interval).toInt - 1 // 1439
    val start = 36000000L

    val expected = (0 until nbOfBuckets).map { step =>
      val bucketStart = start + step * bucketSize
      val rnd = new scala.util.Random(7 + step)
      val sample = Seq.fill(sampleSize)(rnd.nextDouble() * 1000d)
      val points = sample.zipWithIndex
        .map { case (v, i) => s"""{"timestamp":${bucketStart + i * interval},"value":$v}""" }
        .mkString("[", ",", "]")
      assert(call("POST", "/gauges/big/raw", t, Some(points))._1 == 204)
      sample
    }

    val (st, body) = call("GET",
      s"/gauges/big/stats?start=$start&end=${start + nbOfBuckets * bucketSize}" +
        s"&bucketDuration=${bucketSize}ms", t)
    assert(st == 200, body)
    val got = parse(body)
    assert(got.length == nbOfBuckets, s"bucket count: ${got.length}")
    got.zipWithIndex.foreach { case (b, i) =>
      assertBucket(b, start + i * bucketSize, start + (i + 1) * bucketSize, expected(i))
    }
  }

  // GaugeMetricStatisticsITest.groovy:224-330 — tag-filtered collection
  // stats; POST /gauges/stats/query with the same params must serialize
  // byte-identically to the GET (the reference maps both bodies through
  // one handler pair, GaugeHandler.java:571-651)
  test("POST /gauges/stats/query ≡ GET /gauges/stats under a tag filter") {
    val t = Some("t-postget")
    val start = 36000000L
    def min_(m: Int) = start + m * 60000L

    // metric definitions carry the tags the filter selects on
    // (reference answers 201 Created; this transport collapses write
    // successes to 204 — HttpTransport scaladoc)
    assert(call("POST", "/gauges", t, Some(
      """{"id":"G1","tags":{"type":"cpu_usage","host":"server1","env":"test"}}"""))._1 == 204)
    assert(call("POST", "/gauges", t, Some(
      """{"id":"G2","tags":{"type":"cpu_usage","host":"server2","env":"dev"}}"""))._1 == 204)
    assert(call("POST", "/gauges", t, Some(
      """{"id":"G3","tags":{"type":"cpu_usage","host":"server3","env":"stage"}}"""))._1 == 204)

    assert(call("POST", "/gauges/raw", t, Some(
      s"""[{"id":"G1","data":[
         |  {"timestamp":${min_(0)},"value":37.45},
         |  {"timestamp":${min_(1)},"value":37.609},
         |  {"timestamp":${min_(2)},"value":39.11},
         |  {"timestamp":${min_(3)},"value":44.07},
         |  {"timestamp":${min_(4)},"value":42.335}]},
         | {"id":"G2","data":[
         |  {"timestamp":${min_(0)},"value":41.18},
         |  {"timestamp":${min_(1)},"value":39.55},
         |  {"timestamp":${min_(2)},"value":40.72},
         |  {"timestamp":${min_(3)},"value":36.94},
         |  {"timestamp":${min_(4)},"value":37.64}]},
         | {"id":"G3","data":[
         |  {"timestamp":${min_(0)},"value":57.12},
         |  {"timestamp":${min_(1)},"value":57.73},
         |  {"timestamp":${min_(2)},"value":55.49},
         |  {"timestamp":${min_(3)},"value":49.19},
         |  {"timestamp":${min_(4)},"value":35.48}]}]""".stripMargin))._1 == 204)

    val query = s"start=$start&end=${min_(4)}&buckets=1" +
      "&tags=type:cpu_usage,host:server1%7Cserver2"
    val (gs, getBody) = call("GET", s"/gauges/stats?$query", t)
    assert(gs == 200, getBody)
    val (ps, postBody) = call("POST", "/gauges/stats/query", t, Some(
      s"""{"start":"$start","end":"${min_(4)}","buckets":1,
         | "tags":"type:cpu_usage,host:server1|server2"}""".stripMargin))
    assert(ps == 200, postBody)
    assert(getBody == postBody, "POST body and GET params must serialize identically")

    // the 8 points inside [start, start+4min) on G1+G2; G3 is filtered
    // out by host, minute-4 points by the exclusive end
    val values = Seq(37.45, 37.609, 39.11, 44.07, 41.18, 39.55, 40.72, 36.94)
    val bucketList = parse(getBody)
    assert(bucketList.length == 1, s"expected one bucket: $getBody")
    assertBucket(bucketList.head, start, min_(4), values)
  }

  // GaugeMetricStatisticsITest.groovy:121-141's own trick at the REST
  // boundary: the reference's percentile expectations are PSquarePercentile
  // recomputations over the raw values — pin that a reference client
  // opting into ?percentileMode=p2parity gets BIT-IDENTICAL estimates
  // (commons-math fed in the reference's DESC gauge order,
  // MetricsServiceImpl.java:914), while the default stays the engine's
  // exact interpolated percentiles
  test("percentileMode=p2parity serves commons-math P² estimates bit-for-bit; " +
    "the default serves exact interpolated percentiles") {
    import org.apache.commons.math3.stat.descriptive.rank.PSquarePercentile
    val t = Some("t-p2parity")
    val start = 36000000L
    val values = (1 to 20).map(i => (i * i).toDouble) // skewed: P² ≠ exact
    val points = values.zipWithIndex
      .map { case (v, i) => s"""{"timestamp":${start + i * 1000L},"value":$v}""" }
      .mkString("[", ",", "]")
    assert(call("POST", "/gauges/p2/raw", t, Some(points))._1 == 204)

    // the reference feeds its estimator in gauge FETCH order = time DESC
    val feed = values.reverse
    def p2(q: Double): Double = {
      val est = new PSquarePercentile(q)
      feed.foreach(est.increment)
      est.getResult
    }
    val exactP95 = { // exact interpolated, the engine default
      val s = values.sorted
      val rank = 0.95 * (s.length - 1)
      s(rank.toInt) + (rank - rank.toInt) * (s(math.ceil(rank).toInt) - s(rank.toInt))
    }
    assert(math.abs(p2(50.0) - exactMedian(values)) > 1e-9,
      "fixture must distinguish the estimators")

    val query = s"start=$start&end=${start + 60000}&buckets=1&percentiles=95.0"
    val (ps, parity) = call("GET",
      s"/gauges/p2/stats?$query&percentileMode=p2parity", t)
    assert(ps == 200, parity)
    val pb = parse(parity).head
    assert(pb.get("median").asDouble == p2(50.0),
      s"parity median must be the P² estimate bit-for-bit: $pb vs ${p2(50.0)}")
    val pctArr = pb.get("percentiles")
    assert(pctArr != null && pctArr.size() == 1, s"percentiles array: $pb")
    val p95 = pctArr.get(0)
    assert(p95.get("quantile").asDouble == 95.0 &&
      p95.get("originalQuantile").asText == "95.0", s"quantile echo: $p95")
    assert(p95.get("value").asDouble == p2(95.0),
      s"parity p95 must be the P² estimate bit-for-bit: $p95 vs ${p2(95.0)}")

    val (es, exact) = call("GET", s"/gauges/p2/stats?$query", t)
    assert(es == 200, exact)
    val eb = parse(exact).head
    assert(math.abs(eb.get("median").asDouble - exactMedian(values)) <= 1e-9,
      s"default median is exact interpolated: $eb")
    assert(math.abs(eb.get("percentiles").get(0).get("value").asDouble - exactP95) <= 1e-9,
      s"default p95 is exact interpolated: $eb")

    // unknown mode text answers 400, not a silent exact fallback
    assert(call("GET", s"/gauges/p2/stats?$query&percentileMode=p2", t)._1 == 400)
  }

  // GaugesITest.groovy:476-532 fetchStatsWithPercentiles — 7 buckets,
  // five empty; the reference's bucket-7 expectations (median 472,
  // p50 472, p99 474) are P² estimates, pinned through the p2parity
  // opt-in; the exact default interpolates (median 473, p99 953.18)
  test("fetchStatsWithPercentiles: sparse buckets carry the percentile " +
    "array; p2parity reproduces the reference's literal values") {
    val t = Some("t-gpctstats")
    assert(call("POST", "/gauges/G1/raw", t, Some(
      """[{"timestamp":60000,"value":321.8},{"timestamp":420000,"value":468.0},
        |{"timestamp":432000,"value":472.0},{"timestamp":450000,"value":968.0},
        |{"timestamp":456000,"value":474.0}]""".stripMargin))._1 == 204)
    val q = "start=60000&end=480000&buckets=7&percentiles=50,99"

    def bucketAt(body: String, startMs: Long) = {
      val b = parse(body).find(_.get("start").asLong == startMs)
      assert(b.isDefined, s"no bucket at $startMs: $body"); b.get
    }
    def pct(b: com.fasterxml.jackson.databind.JsonNode, i: Int): Double =
      b.get("percentiles").get(i).get("value").asDouble

    val (ps, pbody) = call("GET", s"/gauges/G1/stats?$q&percentileMode=p2parity", t)
    assert(ps == 200, pbody)
    assert(parse(pbody).size == 7, pbody)
    val p1 = bucketAt(pbody, 60000)
    assert(d(p1, "median") == 321.8 && pct(p1, 0) == 321.8 && pct(p1, 1) == 321.8, pbody)
    val p7 = bucketAt(pbody, 420000)
    assert(d(p7, "min") == 468.0 && d(p7, "max") == 968.0, pbody)
    assert(math.abs(d(p7, "avg") - 595.5) <= 0.001 && math.abs(d(p7, "sum") - 2382.0) <= 0.001, pbody)
    assert(math.abs(d(p7, "median") - 472.0) <= 0.001, s"P² median (GaugesITest:517): $pbody")
    assert(math.abs(pct(p7, 0) - 472.0) <= 0.001 && math.abs(pct(p7, 1) - 474.0) <= 0.001,
      s"P² p50/p99 (GaugesITest:518-520): $pbody")
    assert(p7.get("samples").asInt == 4, pbody)
    for (es <- Seq(120000L, 180000L, 240000L, 300000L, 360000L))
      assert(bucketAt(pbody, es).get("empty").asBoolean, pbody)

    // the exact default: interpolated median/percentiles over [468,472,474,968]
    val (xs, xbody) = call("GET", s"/gauges/G1/stats?$q", t)
    assert(xs == 200, xbody)
    val x7 = bucketAt(xbody, 420000)
    assert(math.abs(d(x7, "median") - 473.0) <= 0.001, xbody)
    assert(math.abs(pct(x7, 0) - 473.0) <= 0.001, xbody)
    assert(math.abs(pct(x7, 1) - (474.0 + 0.97 * (968.0 - 474.0))) <= 0.001, xbody)
  }

  // GaugesITest.groovy:533-603 fetchStackedStatsWithPercentiles — the
  // aggregated POST body with stacked=true: per-series bucket stats
  // (percentile values INCLUDED, SumNumericBucketPointCollector) sum
  // across series; samples counts contributing SERIES. The engine
  // default is exact per-series percentiles (documented divergence from
  // the reference's per-series P² — 846 vs its 844 on bucket 7).
  test("fetchStackedStatsWithPercentiles: stacked sums every stat " +
    "including percentile values; samples counts series") {
    val t = Some("t-gstackpcts")
    assert(call("POST", "/gauges/G1/raw", t, Some(
      """[{"timestamp":60000,"value":321.8},{"timestamp":420000,"value":468.0},
        |{"timestamp":432000,"value":472.0},{"timestamp":450000,"value":968.0},
        |{"timestamp":456000,"value":474.0}]""".stripMargin))._1 == 204)
    assert(call("POST", "/gauges/G2/raw", t, Some(
      """[{"timestamp":60000,"value":100.0},{"timestamp":420000,"value":368.0},
        |{"timestamp":432000,"value":372.0},{"timestamp":450000,"value":868.0},
        |{"timestamp":456000,"value":374.0}]""".stripMargin))._1 == 204)
    val (st, body) = call("POST", "/gauges/stats/query", t, Some(
      """{"metrics":["G1","G2"],"start":60000,"end":480000,"buckets":7,
        |"stacked":true,"percentiles":"50,99"}""".stripMargin))
    assert(st == 200, body)
    val buckets = parse(body)
    assert(buckets.size == 7, body)
    val b1 = buckets.find(_.get("start").asLong == 60000).get
    for (f <- Seq("min", "avg", "median", "max", "sum"))
      assert(math.abs(d(b1, f) - 421.8) <= 0.001, s"$f: $body")
    assert(b1.get("percentiles").get(0).get("value").asDouble == 421.8 &&
      b1.get("percentiles").get(1).get("value").asDouble == 421.8, body)
    assert(b1.get("samples").asInt == 2, body)
    val b7 = buckets.find(_.get("start").asLong == 420000).get
    assert(math.abs(d(b7, "min") - 836.0) <= 0.001 && math.abs(d(b7, "max") - 1836.0) <= 0.001, body)
    assert(math.abs(d(b7, "avg") - 1091.0) <= 0.001 && math.abs(d(b7, "sum") - 4364.0) <= 0.001, body)
    // exact per-series medians 473 + 373 (reference's P² twins: 472+372)
    assert(math.abs(d(b7, "median") - 846.0) <= 0.001, body)
    assert(math.abs(b7.get("percentiles").get(0).get("value").asDouble - 846.0) <= 0.001, body)
    // p99: (474 + .97*494) + (374 + .97*494) = 848 + 958.36... summed
    val p99 = (474.0 + 0.97 * 494.0) + (374.0 + 0.97 * 494.0)
    assert(math.abs(b7.get("percentiles").get(1).get("value").asDouble - p99) <= 0.001, body)
    assert(b7.get("samples").asInt == 2, s"samples counts series: $body")
  }

  // GaugeMetricStatisticsITest.groovy:967-1014 multipleMetricsFromEarliest
  // — pooled collection stats with the cross-metric fromEarliest window,
  // identical through the GET params and the POST body twin
  test("multi-metric pooled stats with fromEarliest: earliest data bucket " +
    "through now, GET ≡ POST") {
    val t = Some("t-multiearliest")
    val hour = (System.currentTimeMillis() / 3600000L) * 3600000L
    assert(call("POST", "/gauges/G1/raw", t, Some(
      s"""[{"timestamp":${hour - 3 * 3600000L},"value":3},
         | {"timestamp":${hour - 2 * 3600000L},"value":2}]""".stripMargin))._1 == 204)
    assert(call("POST", "/gauges/G2/raw", t, Some(
      s"""[{"timestamp":${hour - 3 * 3600000L},"value":5},
         | {"timestamp":${hour - 2 * 3600000L},"value":4}]""".stripMargin))._1 == 204)

    def assertBody(body: String): Unit = {
      val arr = parse(body).sortBy(_.get("start").asLong)
      assert(arr.size == 4, s"4 buckets from earliest through now: $body")
      for ((mn, mx, av, i) <- Seq((3.0, 5.0, 4.0, 0), (2.0, 4.0, 3.0, 1))) {
        assert(d(arr(i), "min") == mn && d(arr(i), "max") == mx &&
          d(arr(i), "avg") == av, s"bucket $i: $body")
      }
      assert(arr(2).get("empty").asBoolean && arr(3).get("empty").asBoolean, body)
    }
    val (gs, gbody) = call("GET",
      "/gauges/stats?metrics=G1,G2&fromEarliest=true&bucketDuration=1h", t)
    assert(gs == 200, s"$gs $gbody")
    assertBody(gbody)
    val (ps, pbody) = call("POST", "/gauges/stats/query", t, Some(
      """{"metrics":["G1","G2"],"fromEarliest":true,"bucketDuration":"1h"}"""))
    assert(ps == 200, s"$ps $pbody")
    assertBody(pbody)
  }

  // GaugeMetricStatisticsITest.groovy:1016-1100 findTaggedBuckets — the
  // gauge stats/tags wire shape: an object keyed per matched tag
  // combination, grouped by the points' own tag VALUES (medians assert
  // the exact default, the documented P² divergence)
  test("gauge tagged stats group per datapoint tag value in the " +
    "combination-keyed object") {
    val t = Some("t-gtagbuckets")
    val start = System.currentTimeMillis() - 2 * 3600000L
    val pts = Seq((0, 23.17, "1"), (5, 14.93, "2"), (10, 31.06, "3"),
      (15, 25.55, "1"), (20, 16.66, "2"), (25, 34.33, "3"))
      .map { case (min, v, x) =>
        s"""{"timestamp":${start + min * 60000L},"value":$v,"tags":{"x":"$x"}}"""
      }.mkString("[", ",", "]")
    assert(call("POST", "/gauges/tagged-buckets/raw", t, Some(pts))._1 == 204)

    val (st, body) = call("GET",
      s"/gauges/tagged-buckets/stats/tags/x:*?start=$start&end=${start + 7200000L}", t)
    assert(st == 200, body)
    val obj = mapper.readTree(body)
    assert(obj.isObject && obj.size() == 3, s"three tag-value groups: $body")
    for ((key, lo, hi) <- Seq(("x:1", 23.17, 25.55), ("x:2", 14.93, 16.66),
        ("x:3", 31.06, 34.33))) {
      val e = obj.get(key)
      assert(e != null, s"missing '$key': $body")
      assert(e.get("tags").get("x").asText == key.stripPrefix("x:"), s"$key: $body")
      assert(math.abs(d(e, "min") - lo) <= Delta && math.abs(d(e, "max") - hi) <= Delta, s"$key: $body")
      assert(math.abs(d(e, "sum") - (lo + hi)) <= Delta, s"$key: $body")
      assert(math.abs(d(e, "avg") - (lo + hi) / 2) <= Delta, s"$key: $body")
      assert(math.abs(d(e, "median") - (lo + hi) / 2) <= Delta, s"$key exact median: $body")
      assert(e.get("samples").asLong == 2, s"$key: $body")
    }
  }

  // GaugeMetricStatisticsITest.groovy:232-804 — the gauge downsample
  // matrix (Simple=pooled / Sum=stacked × tags / metrics selection),
  // condensed to the two distinct aggregate semantics; every variant
  // pins GET /gauges/stats ≡ POST /gauges/stats/query
  test("pooled and stacked gauge downsampling by tags and by names, " +
    "GET ≡ POST") {
    val t = Some("t-downsample")
    val start = System.currentTimeMillis() - 10 * 60000L
    def m(i: Int) = start + i * 60000L
    for ((id, host) <- Seq(("G1", "server1"), ("G2", "server2"), ("G3", "server3")))
      assert(call("POST", "/gauges", t, Some(
        s"""{"id":"$id","tags":{"type":"cpu_usage","host":"$host"}}"""))._1 == 204)
    val g1 = Seq(37.45, 37.609, 39.11, 44.07, 42.335)
    val g2 = Seq(41.18, 39.55, 40.72, 36.94, 37.64)
    val g3 = Seq(57.12, 57.73, 55.49, 49.19, 35.48)
    def dps(vs: Seq[Double]) = vs.zipWithIndex
      .map { case (v, i) => s"""{"timestamp":${m(i)},"value":$v}""" }.mkString("[", ",", "]")
    assert(call("POST", "/gauges/raw", t, Some(
      s"""[{"id":"G1","data":${dps(g1)}},{"id":"G2","data":${dps(g2)}},
         |{"id":"G3","data":${dps(g3)}}]""".stripMargin))._1 == 204)

    val q = s"start=$start&end=${m(4)}&buckets=1"
    val body = s""""start":$start,"end":${m(4)},"buckets":1"""
    val in1 = g1.take(4); val in2 = g2.take(4) // range end-exclusive
    def one(st: Int, b: String): JsonNode = {
      assert(st == 200, s"$st $b"); val a = parse(b); assert(a.size == 1, b); a.head
    }
    def assertPair(get: (Int, String), post: (Int, String),
                   mn: Double, mx: Double, av: Double, sm: Double): Unit = {
      for ((s, b) <- Seq(get, post)) {
        val bk = one(s, b)
        assert(bk.get("start").asLong == start && bk.get("end").asLong == m(4), b)
        assert(math.abs(d(bk, "min") - mn) <= Delta, s"min: $b")
        assert(math.abs(d(bk, "max") - mx) <= Delta, s"max: $b")
        assert(math.abs(d(bk, "avg") - av) <= Delta, s"avg: $b")
        assert(math.abs(d(bk, "sum") - sm) <= Delta, s"sum: $b")
        assert(!bk.get("empty").asBoolean && bk.hasNonNull("median"), b)
      }
    }
    val all = in1 ++ in2
    // pooled (Simple): one A1 over the combined points — by tags, by names
    assertPair(
      call("GET", s"/gauges/stats?$q&tags=type:cpu_usage,host:server1%7Cserver2", t),
      call("POST", "/gauges/stats/query", t,
        Some(s"""{$body,"tags":"type:cpu_usage,host:server1|server2"}""")),
      all.min, all.max, all.sum / all.size, all.sum)
    assertPair(
      call("GET", s"/gauges/stats?$q&metrics=G1&metrics=G2", t),
      call("POST", "/gauges/stats/query", t,
        Some(s"""{$body,"metrics":["G1","G2"]}""")),
      all.min, all.max, all.sum / all.size, all.sum)
    // stacked (Sum): per-series stats summed — by tags, by names
    assertPair(
      call("GET", s"/gauges/stats?$q&tags=type:cpu_usage,host:server1%7Cserver2&stacked=true", t),
      call("POST", "/gauges/stats/query", t,
        Some(s"""{$body,"tags":"type:cpu_usage,host:server1|server2","stacked":true}""")),
      in1.min + in2.min, in1.max + in2.max,
      in1.sum / 4 + in2.sum / 4, all.sum)
    assertPair(
      call("GET", s"/gauges/stats?$q&metrics=G1&metrics=G2&stacked=true", t),
      call("POST", "/gauges/stats/query", t,
        Some(s"""{$body,"metrics":["G1","G2"],"stacked":true}""")),
      in1.min + in2.min, in1.max + in2.max,
      in1.sum / 4 + in2.sum / 4, all.sum)
  }

  // GaugeMetricStatisticsITest.groovy:804-899 — the multi-metric
  // collection stats GET validates its selection params: exactly one of
  // metrics/tags, and a bucket param, are required
  test("collection stats GET: metrics XOR tags required, bucket param required") {
    val t = Some("t-statsparams")
    val q = "start=100&end=500&buckets=2"
    // neither selection param
    assert(call("GET", s"/gauges/stats?$q", t)._1 == 400)
    // both selection params
    assert(call("GET", s"/gauges/stats?$q&metrics=G1&tags=a:b", t)._1 == 400)
    // selection without a bucket param
    assert(call("GET", "/gauges/stats?start=100&end=500&metrics=G1", t)._1 == 400)
  }

  // ErrorsITest.groovy:37-56 over the wire
  test("error paths: 405 wrong method, 404 unknown route, 400 bad buckets number") {
    val t = Some("t-errs")
    // testNotAllowedException — POST on a GET/PUT/DELETE-only route
    val (notAllowed, _) = call("POST", "/gauges/test/tags", t, Some("{}"))
    assert(notAllowed == 405)
    // testNotFoundException
    val (notFound, _) = call("GET", "/gaugesssss/test/raw", t)
    assert(notFound == 404)
    // testNumberFormatException — an int param that does not fit an Int
    val (badBuckets, msg) = call("GET",
      "/gauges/test/stats?buckets=999999999999999999999999&start=1&end=100", t)
    assert(badBuckets == 400 && msg.contains("errorMsg"), s"$badBuckets $msg")
  }
}
