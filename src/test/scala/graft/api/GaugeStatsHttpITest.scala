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
