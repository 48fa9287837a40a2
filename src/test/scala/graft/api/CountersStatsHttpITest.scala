package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.SparkTestBase
import scala.jdk.CollectionConverters._

/**
 * Port of the multi-counter stacked stats sections of the reference
 * counter REST suite over the real HTTP transport —
 * rest-tests-jaxrs/.../CountersITest.groovy:
 *  - :827-976   findStackedStatsForMultipleCounters — GET /counters/stats
 *               with stacked=true: per-series sub-buckets aggregate then
 *               SUM across series (min=Σmin, max=Σmax, avg=Σavg); the
 *               tag selection `type:…,host:server1|server2` (an OR
 *               value list) answers identically to the ids selection
 *  - :1238-1393 findStackedStatsForMultipleCounterRates — the same
 *               stacking over W1 rate series: the stacked bucket equals
 *               the SUM of each member's own /rate/stats bucket
 *
 * The reference seeds with sorted randoms; this port pins them to a
 * fixed sorted list — the asserted relationships are value-independent.
 */
class CountersStatsHttpITest extends SparkTestBase with HttpSpecSupport {

  private val mapper = new ObjectMapper()
  private val Delta = 0.001
  // the groovy's randomList, pinned (sorted, like rand.nextInt(100).sort())
  private val R = Seq(3, 7, 12, 21, 33, 41, 48, 55, 76, 90)

  private def seedCounters(t: Option[String], start: Long): (Seq[Long], Seq[Long]) = {
    for ((id, host, env) <- Seq(("C1", "server1", "stage"), ("C2", "server2", "dev"),
        ("C3", "server3", "stage")))
      assert(call("POST", "/counters", t, Some(
        s"""{"id":"$id","tags":{"type":"counter_cpu_usage","host":"$host","env":"$env"}}"""))._1 == 204)
    val c1 = Seq(510 + R(0), 512 + R(1), 514 + R(2), 516 + R(3), 518 + R(4)).map(_.toLong)
    val c2 = Seq(378 + R(5), 381 + R(6), 384 + R(7), 387 + R(8), 390 + R(9)).map(_.toLong)
    val c3 = Seq(5712L, 5773L, 5949L, 5979L, 6548L)
    def dps(vs: Seq[Long]) = vs.zipWithIndex.map { case (v, i) =>
      s"""{"timestamp":${start + i * 60000L},"value":$v}"""
    }.mkString("[", ",", "]")
    assert(call("POST", "/counters/raw", t, Some(
      s"""[{"id":"C1","data":${dps(c1)}},{"id":"C2","data":${dps(c2)}},
         |{"id":"C3","data":${dps(c3)}}]""".stripMargin))._1 == 204)
    (c1, c2)
  }

  private def oneBucket(path: String, t: Option[String]): JsonNode = {
    val (st, body) = call("GET", path, t)
    assert(st == 200, s"$path: $body")
    val arr = mapper.readTree(body)
    assert(arr.size() == 1, body)
    arr.get(0)
  }

  private def d(n: JsonNode, f: String): Double = n.get(f).asDouble

  test("stacked multi-counter stats: min/max/avg are per-series sums, and " +
    "the OR-value tag selection equals the ids selection") {
    val t = Some("t-cs-stacked")
    val start = System.currentTimeMillis() - 10 * 60000L
    val (c1all, c2all) = seedCounters(t, start)
    // range [start, start+4mn): the 5th point of each series is excluded
    val c1 = c1all.take(4); val c2 = c2all.take(4)
    val q = s"start=$start&end=${start + 4 * 60000L}&buckets=1"

    val byTag = oneBucket(s"/counters/stats?$q" +
      "&tags=type:counter_cpu_usage,host:server1%7Cserver2&stacked=true", t)
    assert(byTag.get("start").asLong == start, byTag)
    assert(byTag.get("end").asLong == start + 4 * 60000L, byTag)
    assert(math.abs(d(byTag, "min") - (c1.min + c2.min)) < Delta, byTag)
    assert(math.abs(d(byTag, "max") - (c1.max + c2.max)) < Delta, byTag)
    assert(math.abs(d(byTag, "sum") - (c1.sum + c2.sum)) < Delta, byTag)
    val expectedAvg = c1.sum / 4.0 + c2.sum / 4.0
    assert(math.abs(d(byTag, "avg") - expectedAvg) < Delta, byTag)
    assert(!byTag.get("empty").asBoolean, byTag)
    assert(byTag.hasNonNull("median"), byTag)

    val byIds = oneBucket(s"/counters/stats?$q&metrics=C1&metrics=C2&stacked=true", t)
    for (f <- Seq("start", "end", "min", "max", "sum", "avg", "samples"))
      assert(byIds.get(f) == byTag.get(f), s"$f: $byIds vs $byTag")
  }

  test("stacked multi-counter RATE stats equal the sum of each member's " +
    "own /rate/stats bucket, by tags and by ids alike") {
    val t = Some("t-cs-ratestacked")
    val start = System.currentTimeMillis() - 10 * 60000L
    seedCounters(t, start)
    val q = s"start=$start&end=${start + 4 * 60000L}&buckets=1"

    val c1Rates = oneBucket(s"/counters/C1/rate/stats?$q", t)
    val c2Rates = oneBucket(s"/counters/C2/rate/stats?$q", t)

    def assertStacked(b: JsonNode): Unit = {
      assert(b.get("start").asLong == start, b)
      assert(b.get("end").asLong == start + 4 * 60000L, b)
      assert(math.abs(d(b, "min") - (d(c1Rates, "min") + d(c2Rates, "min"))) < Delta, b)
      assert(math.abs(d(b, "max") - (d(c1Rates, "max") + d(c2Rates, "max"))) < Delta, b)
      assert(math.abs(d(b, "sum") - (d(c1Rates, "sum") + d(c2Rates, "sum"))) < Delta, b)
      assert(math.abs(d(b, "avg") - (d(c1Rates, "avg") + d(c2Rates, "avg"))) < Delta, b)
      assert(!b.get("empty").asBoolean, b)
      assert(b.hasNonNull("median"), b)
    }
    assertStacked(oneBucket(s"/counters/rate/stats?$q" +
      "&tags=type:counter_cpu_usage,host:server1%7Cserver2&stacked=true", t))
    assertStacked(oneBucket(s"/counters/rate/stats?$q&metrics=C2&metrics=C1&stacked=true", t))
  }

  // CountersITest.groovy:976-1085 findStackedStatsForMultipleCountersAsymmetricData
  // — a bucket where only SOME selected series have points stacks over
  // the present members only; `samples` counts contributing series; a
  // bucket no member touches stays empty
  test("asymmetric stacked stats sum over present members only") {
    val t = Some("t-cs-asym")
    val start = System.currentTimeMillis() - 10 * 60000L
    def m(i: Int) = start + i * 60000L
    for ((id, host) <- Seq(("C1", "server1"), ("C2", "server2"), ("C3", "server3")))
      assert(call("POST", "/counters", t, Some(
        s"""{"id":"$id","tags":{"type":"counter_cpu_usage","host":"$host"}}"""))._1 == 204)
    // C1 at minutes 0-3; C2 at minutes 1,3,5 (5 falls past the range);
    // C3 everywhere but not selected
    val c1 = Seq(513L, 519L, 526L, 537L)
    val c2 = Seq(422L, 435L, 445L)
    assert(call("POST", "/counters/raw", t, Some(
      s"""[{"id":"C1","data":[
         |  {"timestamp":${m(0)},"value":${c1(0)}},{"timestamp":${m(1)},"value":${c1(1)}},
         |  {"timestamp":${m(2)},"value":${c1(2)}},{"timestamp":${m(3)},"value":${c1(3)}}]},
         | {"id":"C2","data":[
         |  {"timestamp":${m(1)},"value":${c2(0)}},{"timestamp":${m(3)},"value":${c2(1)}},
         |  {"timestamp":${m(5)},"value":${c2(2)}}]},
         | {"id":"C3","data":[
         |  {"timestamp":${m(0)},"value":5712},{"timestamp":${m(1)},"value":5773},
         |  {"timestamp":${m(2)},"value":5949},{"timestamp":${m(3)},"value":5979},
         |  {"timestamp":${m(4)},"value":6548}]}]""".stripMargin))._1 == 204)

    val (st, body) = call("GET", s"/counters/stats?start=$start&end=${m(5)}" +
      "&buckets=5&tags=type:counter_cpu_usage,host:server1%7Cserver2&stacked=true", t)
    assert(st == 200, body)
    val arr = mapper.readTree(body)
    assert(arr.size() == 5, body)
    val buckets = (0 until 5).map(arr.get).sortBy(_.get("start").asLong)
    def assertBucket(i: Int, vals: Seq[Long]): Unit =
      if (vals.isEmpty) {
        assert(buckets(i).get("empty").asBoolean && !buckets(i).has("samples"),
          s"bucket $i empty: $body")
      } else {
        val s = vals.sum.toDouble
        for (f <- Seq("min", "max", "avg", "sum"))
          assert(math.abs(d(buckets(i), f) - s) < Delta, s"bucket $i $f: $body")
        assert(buckets(i).get("samples").asInt == vals.size,
          s"bucket $i samples counts contributing series: $body")
        assert(buckets(i).hasNonNull("median"), s"bucket $i: $body")
      }
    assertBucket(0, Seq(c1(0)))
    assertBucket(1, Seq(c1(1), c2(0)))
    assertBucket(2, Seq(c1(2)))
    assertBucket(3, Seq(c1(3), c2(1)))
    assertBucket(4, Seq.empty)
  }

  // CountersITest.groovy:1087-1236 findSimpleStatsForMultipleCounters —
  // the UNSTACKED default pools every selected series' in-range points
  // into one A1 bucket; tag and ids selections answer identically
  test("pooled multi-counter stats equal the recomputation over the " +
    "combined in-range points, by tags and by ids alike") {
    val t = Some("t-cs-pooled")
    val start = System.currentTimeMillis() - 10 * 60000L
    val (c1, c2) = seedCounters(t, start)
    // range [start, start+4min) keeps each series' first four points
    val combined = (c1.take(4) ++ c2.take(4)).map(_.toDouble)
    val q = s"start=$start&end=${start + 4 * 60000L}&buckets=1"

    def assertPooled(b: JsonNode): Unit = {
      assert(b.get("start").asLong == start, b)
      assert(b.get("end").asLong == start + 4 * 60000L, b)
      assert(math.abs(d(b, "min") - combined.min) < Delta, b)
      assert(math.abs(d(b, "max") - combined.max) < Delta, b)
      assert(math.abs(d(b, "sum") - combined.sum) < Delta, b)
      assert(math.abs(d(b, "avg") - combined.sum / combined.size) < Delta, b)
      assert(!b.get("empty").asBoolean, b)
      assert(b.hasNonNull("median"), b)
      assert(b.get("samples").asInt == combined.size, b)
    }
    assertPooled(oneBucket(s"/counters/stats?$q" +
      "&tags=type:counter_cpu_usage,host:server1%7Cserver2", t))
    assertPooled(oneBucket(s"/counters/stats?$q&metrics=C2&metrics=C1", t))
  }

  // CountersITest.groovy:1393-1545 findSimpleStatsForMultipleCounterRates
  // — the UNSTACKED multi-counter rate stats pool every member's derived
  // rate points into one bucket
  test("pooled multi-counter RATE stats equal the recomputation over the " +
    "combined per-minute rates") {
    val t = Some("t-cs-ratepooled")
    val start = System.currentTimeMillis() - 10 * 60000L
    val (c1, c2) = seedCounters(t, start)
    // per-minute steps → rate = value delta per pair inside the range
    val rates = (c1.take(4).sliding(2).map(p => (p(1) - p(0)).toDouble) ++
      c2.take(4).sliding(2).map(p => (p(1) - p(0)).toDouble)).toSeq
    val q = s"start=$start&end=${start + 4 * 60000L}&buckets=1"

    def assertPooled(b: JsonNode): Unit = {
      assert(math.abs(d(b, "min") - rates.min) < Delta, b)
      assert(math.abs(d(b, "max") - rates.max) < Delta, b)
      assert(math.abs(d(b, "sum") - rates.sum) < Delta, b)
      assert(math.abs(d(b, "avg") - rates.sum / rates.size) < Delta, b)
      assert(b.get("samples").asInt == rates.size, b)
    }
    assertPooled(oneBucket(s"/counters/rate/stats?$q" +
      "&tags=type:counter_cpu_usage,host:server1%7Cserver2", t))
    assertPooled(oneBucket(s"/counters/rate/stats?$q&metrics=C2&metrics=C1", t))
  }

  // CounterHandler.java:826-844 deprecatedFindCounterRateDataStats —
  // the deprecated GET /counters/rate answers the SAME BucketPoint list
  // as /counters/rate/stats; the literal carries GET only
  test("deprecated GET /counters/rate aliases the collection rate stats") {
    val t = Some("t-cs-deprecated")
    val start = System.currentTimeMillis() - 10 * 60000L
    seedCounters(t, start)
    val q = s"start=$start&end=${start + 4 * 60000L}&buckets=1&metrics=C2&metrics=C1"
    val (as_, abody) = call("GET", s"/counters/rate?$q", t)
    val (bs, bbody) = call("GET", s"/counters/rate/stats?$q", t)
    assert(as_ == 200 && bs == 200, s"$as_ $bs")
    assert(abody == bbody, s"alias diverged:\n$abody\n$bbody")
    // the literal never falls back to the {id} template for other verbs
    assert(call("DELETE", "/counters/rate", t)._1 == 405)
    // gauges have no such literal: GET /gauges/rate is the {id} GET
    // (204 — no definition named "rate" in this tenant)
    assert(call("GET", "/gauges/rate", t)._1 == 204)
  }

  // CountersITest.groovy:1547-1578 fromEarliestWithData — fromEarliest
  // derives the window from the data, drops LEADING empty buckets, and
  // keeps trailing empties up to now
  test("fromEarliest counter stats start at the earliest data bucket and " +
    "null-fill through now") {
    val t = Some("t-cs-earliest")
    val hour = (System.currentTimeMillis() / 3600000L) * 3600000L
    assert(call("POST", "/counters/testStats/raw", t, Some(
      s"""[{"timestamp":${hour - 2 * 3600000L},"value":2}]"""))._1 == 204)
    assert(call("POST", "/counters/testStats/raw", t, Some(
      s"""[{"timestamp":${hour - 3 * 3600000L},"value":3}]"""))._1 == 204)
    val (st, body) = call("GET",
      "/counters/testStats/stats?fromEarliest=true&bucketDuration=1h", t)
    assert(st == 200, s"$st $body")
    val arr = mapper.readTree(body)
    assert(arr.size() == 4, s"4 buckets from earliest through now: $body")
    val buckets = (0 until 4).map(arr.get).sortBy(_.get("start").asLong)
    for ((exp, i) <- Seq(Some(3.0), Some(2.0), None, None).zipWithIndex) exp match {
      case Some(v) =>
        assert(!buckets(i).get("empty").asBoolean, s"bucket $i: $body")
        for (f <- Seq("min", "max", "avg"))
          assert(buckets(i).get(f).asDouble == v, s"bucket $i $f: $body")
      case None =>
        assert(buckets(i).get("empty").asBoolean, s"bucket $i: $body")
    }
  }

  // CountersITest.groovy:1580-1606 fromEarliestWithoutDataAndBad
  test("fromEarliest without data answers 204; a malformed bucketDuration " +
    "answers 400") {
    val t = Some("t-cs-earliestbad")
    assert(call("POST", "/counters", t,
      Some("""{"id":"testStats","tags":{"type":"counter_cpu_usage"}}"""))._1 == 204)
    val now = System.currentTimeMillis()
    // explicit range with no data still answers the bucket list
    assert(call("GET", s"/counters/testStats/stats?start=1&end=$now&bucketDuration=1000d", t)._1 == 200)
    assert(call("GET", "/counters/testStats/stats?fromEarliest=true&bucketDuration=a", t)._1 == 400)
    assert(call("GET", "/counters/testStats/stats?fromEarliest=true&bucketDuration=1h", t)._1 == 204)
  }
}
