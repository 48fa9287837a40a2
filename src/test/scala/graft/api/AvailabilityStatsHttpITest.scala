package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.SparkTestBase
import scala.jdk.CollectionConverters._

/**
 * Port of the reference availability-stats REST integration suite over
 * the real HTTP transport — the assertions of
 * rest-tests-jaxrs/.../AvailabilityMetricStatisticsITest.groovy:
 * :37-74 (shouldNotAcceptInvalidParams — every bucket-grammar violation
 * answers 400), :76-112 (emptyNotEmptyTest — empty buckets carry only
 * start/end/empty, the single-up-point bucket reads uptimeRatio 1.0),
 * :114-156 (bucketPointTest — 10 hour-buckets x 60 minute-points with
 * every 4th point down: downDuration/lastNotUptime/uptimeRatio/
 * notUpCount per bucket).
 *
 * Wire shape under test: AvailabilityBucketPoint JSON
 * (AvailabilityBucketPoint.java:31-125 getters) — durationMap keyed by
 * availability TEXT codes, the convenience *Duration getters,
 * lastNotUptime (bucket end when the bucket ends not-up, 0 when fully
 * up), uptimeRatio, notUpCount/upCount, and the empty-bucket omission
 * rule (null getters are dropped by the NON_NULL mapper config).
 */
class AvailabilityStatsHttpITest extends SparkTestBase with HttpSpecSupport {

  private val mapper = new ObjectMapper()
  private val Delta = 0.001

  private def parse(body: String): Seq[JsonNode] =
    mapper.readTree(body).elements().asScala.toSeq

  private def l(n: JsonNode, f: String): Long = {
    assert(n.hasNonNull(f), s"missing field '$f' in $n")
    n.get(f).asLong
  }

  // AvailabilityMetricStatisticsITest.groovy:37-74
  test("invalid bucket params answer 400: zero count, zero step, illegal " +
    "duration, too many buckets, count+duration together") {
    val t = Some("t-avail-bad")
    assert(call("POST", "/availability/test/raw", t,
      Some("""[{"timestamp":36000000,"value":"up"}]"""))._1 == 204)
    val start = 36000000L
    val end = start + 3600000L
    def status(q: String): Int =
      call("GET", s"/availability/test/stats?$q", t)._1
    assert(status(s"start=$start&end=$end&buckets=0") == 400, "bucket count = 0")
    assert(status(s"start=$start&end=$end&buckets=${Int.MaxValue}") == 400,
      "bucket size = 0")
    assert(status(s"start=$start&end=$end&bucketDuration=1w") == 400,
      "illegal duration")
    assert(status(s"start=1&end=${Long.MaxValue}&bucketDuration=1ms") == 400,
      "number of buckets too large")
    assert(status(s"start=$start&end=$end&buckets=1&bucketDuration=1d") == 400,
      "both buckets and bucketDuration")
  }

  // AvailabilityMetricStatisticsITest.groovy:76-112
  test("empty buckets carry only start/end/empty; a lone up point fills its " +
    "bucket with uptimeRatio 1.0") {
    val t = Some("t-avail-empty")
    val start = 36000000L
    val end = start + 3600000L
    val numBuckets = 3
    val bucketSize = (end - start) / numBuckets
    val buckets = (0 until numBuckets).map(i => start + i * bucketSize)

    assert(call("POST", "/availability/test/raw", t, Some(
      s"""[{"timestamp":${buckets(1) + 60000},"value":"up"}]"""))._1 == 204)

    val (st, body) = call("GET",
      s"/availability/test/stats?start=$start&end=$end&buckets=$numBuckets", t)
    assert(st == 200, body)
    val got = parse(body)
    assert(got.length == numBuckets, s"dense bucket list: $body")

    def assertEmpty(b: JsonNode, i: Int): Unit = {
      assert(l(b, "start") == buckets(i) && l(b, "end") == buckets(i) + bucketSize, s"range: $b")
      assert(b.get("empty").asBoolean, s"expected empty: $b")
      // the reference's empty availability getters answer null → omitted
      assert(!b.has("uptimeRatio") && !b.has("downDuration") && !b.has("notUpCount"),
        s"empty bucket must omit stats: $b")
    }
    assertEmpty(got(0), 0)
    assertEmpty(got(2), 2)

    val b1 = got(1)
    assert(l(b1, "start") == buckets(1) && !b1.get("empty").asBoolean, s"bucket 1: $b1")
    assert(l(b1, "downDuration") == 0, s"downDuration: $b1")
    assert(l(b1, "lastNotUptime") == 0, s"lastNotUptime: $b1")
    assert(math.abs(b1.get("uptimeRatio").asDouble - 1.0) <= Delta, s"uptimeRatio: $b1")
    assert(l(b1, "notUpCount") == 0, s"notUpCount: $b1")
    assert(l(b1, "upDuration") == bucketSize, s"upDuration: $b1")
    assert(b1.get("durationMap").get("up").asLong == bucketSize, s"durationMap: $b1")
  }

  // AvailabilityMetricStatisticsITest.groovy:114-156
  test("10 hour-buckets x 60 minute-points, every 4th down: per-bucket " +
    "downDuration/lastNotUptime/uptimeRatio/notUpCount match the state machine") {
    val t = Some("t-avail-buckets")
    val start = 36000000L
    val bucketsCount = 10
    val hourMs = 3600000L

    (1 to bucketsCount).foreach { step =>
      val hour = start + (step - 1) * hourMs
      val data = (1 to 60).map { i =>
        val v = if (i % 4 == 0) "down" else "up"
        s"""{"timestamp":${hour + (i - 1) * 60000L},"value":"$v"}"""
      }.mkString("[", ",", "]")
      assert(call("POST", "/availability/test/raw", t, Some(data))._1 == 204)
    }

    val (st, body) = call("GET",
      s"/availability/test/stats?start=$start&end=${start + bucketsCount * hourMs}" +
        "&bucketDuration=1h", t)
    assert(st == 200, body)
    val got = parse(body)
    assert(got.length == bucketsCount, s"10 hour buckets: $body")

    got.zipWithIndex.foreach { case (b, i) =>
      val bStart = start + i * hourMs
      assert(l(b, "start") == bStart && l(b, "end") == bStart + hourMs, s"range: $b")
      assert(!b.get("empty").asBoolean, s"non-empty: $b")
      // 15 down minutes (minutes 3, 7, ..., 59), each a 1-minute segment
      assert(l(b, "downDuration") == 15 * 60000L, s"downDuration: $b")
      // minute 59 is down → the last not-up segment runs to bucket end
      assert(l(b, "lastNotUptime") == bStart + hourMs, s"lastNotUptime: $b")
      assert(math.abs(b.get("uptimeRatio").asDouble - 0.75) <= Delta, s"uptimeRatio: $b")
      assert(l(b, "notUpCount") == 15, s"notUpCount: $b")
      assert(l(b, "upDuration") == 45 * 60000L, s"upDuration: $b")
      assert(l(b, "notUpDuration") == 15 * 60000L, s"notUpDuration: $b")
      assert(l(b, "samples") == 60 && l(b, "upCount") == 45, s"samples/upCount: $b")
      val dm = b.get("durationMap")
      assert(dm.get("up").asLong == 45 * 60000L && dm.get("down").asLong == 15 * 60000L,
        s"durationMap: $b")
    }
  }
}
