package graft.api

import graft.SparkTestBase

/**
 * Port of the per-type datapoint-validation and large-payload REST
 * tests over the real HTTP transport — the shouldNotAcceptDataWith*
 * family (RESTTest.groovy invalidPointCheck, applied per type in
 * GaugesITest.groovy:85-113, CountersITest.groovy:764-792 and the
 * availability/string twins) and shouldStoreLargePayload
 * (RESTTest.groovy:158-166; the reference sizes it just past its
 * storage batch constant — this port goes well past ours).
 *
 * invalidPointCheck drives BOTH ingest shapes: the multi-metric
 * `[{id, data}]` route and the single-metric `/{id}/raw` route; every
 * malformed point answers 400 and nothing is stored.
 */
class DataPointValidationHttpITest extends SparkTestBase with HttpSpecSupport {

  private val types = Seq(
    ("gauges", """5.5"""), ("counters", """5"""),
    ("availability", """"up""""), ("strings", """"s""""))

  private def invalid(pathBase: String, pointJson: String): Unit = {
    val t = Some(s"t-val-$pathBase")
    val (s1, b1) = call("POST", s"/$pathBase/raw", t,
      Some(s"""[{"id":"metric","data":[$pointJson]}]"""))
    assert(s1 == 400, s"multi $pathBase $pointJson: $s1 $b1")
    val (s2, b2) = call("POST", s"/$pathBase/metric/raw", t, Some(s"[$pointJson]"))
    assert(s2 == 400, s"single $pathBase $pointJson: $s2 $b2")
    // nothing stored under either id
    assert(call("GET", s"/$pathBase/metric/raw?start=0&end=${Long.MaxValue}", t)._1 == 204)
  }

  test("points without a timestamp answer 400 on both ingest shapes, all types") {
    for ((p, v) <- types) invalid(p, s"""{"value":$v}""")
  }

  test("points with a null timestamp answer 400") {
    for ((p, v) <- types) invalid(p, s"""{"timestamp":null,"value":$v}""")
  }

  test("points with a non-numeric timestamp answer 400") {
    for ((p, v) <- types) invalid(p, s"""{"timestamp":"aaa","value":$v}""")
  }

  test("points without a value answer 400") {
    for ((p, _) <- types) invalid(p, s"""{"timestamp":13}""")
  }

  test("points with a null value answer 400") {
    for ((p, _) <- types) invalid(p, s"""{"timestamp":13,"value":null}""")
  }

  test("points with a structurally wrong value answer 400") {
    for ((p, _) <- types) invalid(p, s"""{"timestamp":13,"value":["dsqdqs"]}""")
  }

  // the shouldNotAcceptInvalidTimeRange / shouldNotCreateMetricWith
  // EmptyPayload / shouldNotAdd*WithEmptyPayload family, per type
  // (GaugesITest.groovy:31-79 and its counter/availability/string twins)
  test("reversed time ranges and empty payloads answer 400, all types") {
    for ((p, _) <- types) {
      val t = Some(s"t-val-range-$p")
      assert(call("GET", s"/$p/test/raw?start=1000&end=500", t)._1 == 400, p)
      assert(call("POST", s"/$p", t, Some(""))._1 == 400, p)
      assert(call("POST", s"/$p/pimpo/raw", t, Some(""))._1 == 400, p)
      assert(call("POST", s"/$p/pimpo/raw", t, Some("[]"))._1 == 400, p)
      assert(call("POST", s"/$p/raw", t, Some(""))._1 == 400, p)
      assert(call("POST", s"/$p/raw", t, Some("[]"))._1 == 400, p)
    }
  }

  test("a payload far past the storage batch size stores whole " +
    "(shouldStoreLargePayload)") {
    val t = Some("t-val-large")
    val n = 5000
    val gauges = (0 until n).map(i => s"""{"timestamp":${i + 1},"value":$i.0}""")
      .mkString("[", ",", "]")
    assert(call("POST", "/gauges/test/raw", t, Some(gauges))._1 == 204)
    val counters = (0 until n).map(i => s"""{"timestamp":${i + 1},"value":$i}""")
      .mkString("[", ",", "]")
    assert(call("POST", "/counters/test/raw", t, Some(counters))._1 == 204)
    // everything readable back: ASC, unlimited, count preserved
    val (st, body) = call("GET",
      s"/gauges/test/raw?start=0&end=${n + 10}&order=asc&limit=-1", t)
    assert(st == 200, body)
    val arr = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    assert(arr.size() == n, s"expected $n points back, got ${arr.size()}")
    assert(arr.get(0).get("timestamp").asLong == 1 &&
      arr.get(n - 1).get("timestamp").asLong == n, body)
  }
}
