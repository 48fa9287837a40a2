package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Model-layer unit vectors: Buckets math (reference Buckets.java:120-175),
  * the duration grammar, TimeRange offsets, Order defaulting (T3),
  * BucketConfig validation, Tags parsing. */
class ModelSpec extends AnyFunSuite {

  // ---- Buckets (reference BucketsTest vectors + property) ----

  test("fromCount exact division") {
    val b = Buckets.fromCount(100, 200, 10)
    assert(b.step == 10 && b.count == 10 && b.start == 100)
  }

  test("fromCount remainder prefers larger step only when needed") {
    // (end-start)=105, count=10 → quotient 10 rem 5; 9*11=99 < 105 → step 11
    val b = Buckets.fromCount(100, 205, 10)
    assert(b.step == 11)
    // (end-start)=101: quotient 10 rem 1; 9*11=99 < 101 → step 11
    assert(Buckets.fromCount(100, 201, 10).step == 11)
    // (end-start)=109: 9*11=99 < 109 → step 11
    assert(Buckets.fromCount(100, 209, 10).step == 11)
  }

  test("fromStep rounds count up and clamps to one bucket") {
    assert(Buckets.fromStep(100, 200, 10).count == 10)
    assert(Buckets.fromStep(100, 205, 10).count == 11)
    val clamped = Buckets.fromStep(100, 150, 1000)
    assert(clamped.count == 1 && clamped.step == 1000)
  }

  test("getIndex is (ts - start) / step") {
    val b = Buckets(10, 10, 10)
    assert(b.getIndex(10) == 0 && b.getIndex(19) == 0 && b.getIndex(20) == 1 && b.getIndex(109) == 9)
    intercept[IllegalArgumentException](b.getIndex(110))
    intercept[IllegalArgumentException](b.getIndex(9))
  }

  test("property: every ts in range maps to a valid bucket whose range contains it") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val start = 1 + rnd.nextLong(1000000L)
      val step = 1 + rnd.nextLong(10000L)
      val count = 1 + rnd.nextInt(1000)
      val b = Buckets(start, step, count)
      val ts = start + rnd.nextLong(step * count)
      val i = b.getIndex(ts)
      assert(i >= 0 && i < b.count)
      assert(b.getBucketStart(i) <= ts && ts < b.getBucketStart(i) + b.step)
    }
  }

  // ---- Duration grammar (reference Duration.java:41-55) ----

  test("duration grammar ms|s|mn|h|d") {
    assert(GDuration.parse("250ms").toMillis == 250)
    assert(GDuration.parse("30s").toMillis == 30000)
    assert(GDuration.parse("5mn").toMillis == 300000)
    assert(GDuration.parse("2h").toMillis == 7200000)
    assert(GDuration.parse("7d").toMillis == 604800000)
    intercept[IllegalArgumentException](GDuration.parse("5m"))
    intercept[IllegalArgumentException](GDuration.parse("h"))
  }

  // ---- TimeRange (reference TimeRange.java:31-73) ----

  test("time range defaults to [now-8h, now) and accepts relative offsets") {
    val now = 1704067200000L
    val def_ = TimeRange(None, None, now)
    assert(def_.start == now - 8 * 3600000L && def_.end == now)
    val rel = TimeRange(Some("-2h"), Some("+30mn"), now)
    assert(rel.start == now - 7200000 && rel.end == now + 1800000)
    val abs = TimeRange(Some("100"), Some("200"), now)
    assert(abs.start == 100 && abs.end == 200)
    intercept[IllegalArgumentException](TimeRange(Some("200"), Some("100"), now))
  }

  // ---- BucketConfig (reference BucketConfig.java:37-72) ----

  test("bucket config requires exactly one of count/duration") {
    val r = TimeRange(0L + 1, 1000)
    intercept[IllegalArgumentException](BucketConfig(r, None, None))
    intercept[IllegalArgumentException](BucketConfig(r, Some(10), Some(GDuration.parse("1s"))))
    assert(BucketConfig(r, Some(10), None).buckets.count == 10)
    assert(BucketConfig(r, None, Some(GDuration.parse("100ms"))).buckets.step == 100)
  }

  // ---- Order default rule T3 (reference Order.java:68-71) ----

  test("default order is DESC unless (limit ∧ start ∧ no end)") {
    assert(Order.defaultValue(0, None, None) == Order.Desc)
    assert(Order.defaultValue(10, Some(1L), Some(2L)) == Order.Desc)
    assert(Order.defaultValue(10, None, None) == Order.Desc)
    assert(Order.defaultValue(10, Some(1L), None) == Order.Asc)
    assert(Order.defaultValue(0, Some(1L), None) == Order.Desc)
  }

  // ---- Tags grammar (reference Tags.java:31-48) ----

  test("tags name:value list parses and rejects junk") {
    assert(Tags.parse("a:1,b:2") == Map("a" -> "1", "b" -> "2"))
    assert(Tags.parse(" a : 1 ") == Map("a" -> "1"))
    intercept[IllegalArgumentException](Tags.parse(""))
    intercept[IllegalArgumentException](Tags.parse("novalue"))
    intercept[IllegalArgumentException](Tags.parse(":v"))
  }

  // ---- MetricType / AvailabilityType codecs ----

  test("metric type codes match the reference enumeration") {
    assert(MetricType.Gauge.code == 0 && MetricType.Availability.code == 1 &&
      MetricType.Counter.code == 2 && MetricType.CounterRate.code == 3 &&
      MetricType.Str.code == 4 && MetricType.GaugeRate.code == 5)
    assert(MetricType.userTypeCodes == Seq[Byte](0, 1, 2, 4))
    assert(MetricType.fromText("gauge") == MetricType.Gauge)
    intercept[IllegalArgumentException](MetricType.fromCode(9))
  }

  test("availability codecs") {
    assert(AvailabilityType.fromText("UP") == AvailabilityType.Up)
    assert(AvailabilityType.fromCode(3) == AvailabilityType.Admin)
    intercept[IllegalArgumentException](AvailabilityType.fromText("sideways"))
  }
}
