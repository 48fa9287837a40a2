package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.SparkTestBase
import scala.jdk.CollectionConverters._

/**
 * Port of the backend CRUD-breadth REST suite over the real HTTP
 * transport — rest-tests-jaxrs/.../CassandraBackendITest.groovy:
 *  - :40-88   no-data lookups answer 204 for listings and raw fetches
 *  - :89-118  data for one id never leaks into another id's fetch
 *  - :119-204 getPeriods — all six ops, the 400 for an unknown op, and
 *             the out-of-range 204
 *  - :205-309 multi-metric gauge/availability inserts read back per id
 *  - :310-432 findDistinctAvailabilities — distinct-contiguous collapse
 *             with order/limit interplay
 *  - :433-456 invalid / non-user `type` params 400 with the reference's
 *             errorMsg texts
 *  - :458-559 findMetrics — data-derived and explicit definitions merge
 *             per type; explicit defs without data carry no min/max
 *             timestamps even under timestamps=true
 *
 * Reference 201/200 write statuses collapse to this transport's 204
 * (HttpTransport scaladoc).
 */
class CassandraBackendHttpITest extends SparkTestBase with HttpSpecSupport {

  private val mapper = new ObjectMapper()

  private def dp(body: String): Seq[(Long, JsonNode)] =
    mapper.readTree(body).elements().asScala.toSeq
      .map(n => (n.get("timestamp").asLong, n.get("value")))

  test("no-data lookups answer 204: metric listing, gauge raw, availability raw") {
    val t = Some("t-cb-nodata")
    assert(call("GET", "/metrics?type=gauge", t)._1 == 204)
    assert(call("GET", "/gauges/missing/raw", t)._1 == 204)
    assert(call("GET", "/availability/missing/raw", t)._1 == 204)
  }

  test("data inserted for one id answers 204 on another id's fetch") {
    val t = Some("t-cb-leak")
    val now = System.currentTimeMillis()
    val start = now - now % 3600000L - 3600000L
    assert(call("POST", "/gauges/raw", t, Some(
      s"""[{"id":"test","data":[{"timestamp":$start,"value":12.22},
         |{"timestamp":${start + 10000},"value":12.37}]}]""".stripMargin))._1 == 204)
    assert(call("GET",
      s"/gauges/n1/raw?start=${start - 12 * 3600000L}&end=${start - 11 * 3600000L}",
      t)._1 == 204)
  }

  test("getPeriods: gt/lt/gte/lte/eq/neq thresholds, 400 for an unknown op, " +
    "204 out of range") {
    val t = Some("t-cb-periods")
    val start = System.currentTimeMillis() - 30 * 60000L
    def m(i: Int) = start + i * 60000L
    val vals = Seq(22.3, 17.4, 16.6, 22.7, 23.3, 19.9, 21.2, 24.2, 26.6, 18.8, 20.0)
    assert(call("POST", "/gauges/n1/raw", t, Some(
      vals.zipWithIndex.map { case (v, i) =>
        s"""{"timestamp":${m(i)},"value":$v}"""
      }.mkString("[", ",", "]")))._1 == 204)

    def periods(op: String): Seq[(Long, Long)] = {
      val (st, body) = call("GET", s"/gauges/n1/periods?threshold=20&op=$op", t)
      assert(st == 200, s"$op: $body")
      mapper.readTree(body).elements().asScala.toSeq
        .map(p => (p.get(0).asLong, p.get(1).asLong))
    }
    assert(periods("gt") == Seq((m(0), m(0)), (m(3), m(4)), (m(6), m(8))))
    assert(periods("lt") == Seq((m(1), m(2)), (m(5), m(5)), (m(9), m(9))))
    assert(periods("gte") == Seq((m(0), m(0)), (m(3), m(4)), (m(6), m(8)), (m(10), m(10))))
    assert(periods("lte") == Seq((m(1), m(2)), (m(5), m(5)), (m(9), m(10))))
    assert(periods("eq") == Seq((m(10), m(10))))
    assert(periods("neq") == Seq((m(0), m(9))))

    assert(call("GET", "/gauges/n1/periods?threshold=20&op=foo", t)._1 == 400)
    assert(call("GET", s"/gauges/n1/periods?threshold=20&op=gt" +
      s"&start=${start - 10 * 60000L}&end=${start - 5 * 60000L}", t)._1 == 204)
  }

  test("multi-metric inserts read back per id, for gauges and availability") {
    val t = Some("t-cb-multi")
    val start = System.currentTimeMillis() - 10 * 60000L
    assert(call("POST", "/gauges", t, Some(
      """{"id":"m2","tags":{"a":"1","b":"2"},"dataRetention":24}"""))._1 == 204)
    assert(call("POST", "/gauges/raw", t, Some(
      s"""[{"id":"m1","data":[{"timestamp":$start,"value":1.1},{"timestamp":${start + 60000},"value":1.2}]},
         |{"id":"m2","data":[{"timestamp":$start,"value":2.1},{"timestamp":${start + 60000},"value":2.2}]},
         |{"id":"m3","data":[{"timestamp":$start,"value":3.1},{"timestamp":${start + 60000},"value":3.2}]}]"""
        .stripMargin))._1 == 204)
    val (gs, gb) = call("GET", "/gauges/m2/raw", t)
    assert(gs == 200 && dp(gb).map(_._2.asDouble) == Seq(2.2, 2.1), gb)

    assert(call("POST", "/availability", t, Some(
      """{"id":"m2","tags":{"a":"1","b":"2"},"dataRetention":12}"""))._1 == 204)
    assert(call("POST", "/availability/raw", t, Some(
      s"""[{"id":"m1","data":[{"timestamp":$start,"value":"down"},{"timestamp":${start + 60000},"value":"up"}]},
         |{"id":"m2","data":[{"timestamp":$start,"value":"up"},{"timestamp":${start + 60000},"value":"up"}]},
         |{"id":"m3","data":[{"timestamp":$start,"value":"down"},{"timestamp":${start + 60000},"value":"down"}]}]"""
        .stripMargin))._1 == 204)
    val (as, ab) = call("GET", "/availability/m2/raw", t)
    assert(as == 200 && dp(ab).map(_._2.asText) == Seq("up", "up"), ab)
  }

  test("findDistinctAvailabilities: distinct-contiguous collapse composed " +
    "with order and limit") {
    val t = Some("t-cb-distinct")
    val start = System.currentTimeMillis() - 20 * 60000L
    def m(i: Int) = start + i * 60000L
    val states = Seq("up", "up", "down", "down", "up", "down", "down",
      "up", "up", "unknown", "unknown", "unknown", "up")
    assert(call("POST", "/availability/A1/raw", t, Some(
      states.zipWithIndex.map { case (s, i) =>
        s"""{"timestamp":${m(i)},"value":"$s"}"""
      }.mkString("[", ",", "]")))._1 == 204)

    def fetch(q: String): Seq[(Long, String)] = {
      val (st, body) = call("GET", s"/availability/A1/raw?$q", t)
      assert(st == 200, s"$q: $body")
      dp(body).map { case (ts, v) => (ts, v.asText) }
    }
    // DESC distinct: last point of each run, newest first
    assert(fetch("distinct=true") == Seq(
      m(12) -> "up", m(11) -> "unknown", m(8) -> "up", m(6) -> "down",
      m(4) -> "up", m(3) -> "down", m(1) -> "up"))
    // ASC distinct: first point of each run
    assert(fetch("distinct=true&order=asc") == Seq(
      m(0) -> "up", m(2) -> "down", m(4) -> "up", m(5) -> "down",
      m(7) -> "up", m(9) -> "unknown", m(12) -> "up"))
    // limit applies AFTER the collapse
    assert(fetch("distinct=true&limit=2") == Seq(m(12) -> "up", m(11) -> "unknown"))
    // plain limited fetches
    assert(fetch("limit=3").map(_._1) == Seq(m(12), m(11), m(10)))
    assert(fetch(s"limit=3&end=${m(14)}").map(_._1) == Seq(m(12), m(11), m(10)))
    assert(fetch(s"limit=3&start=${m(4)}&order=desc").map(_._1) == Seq(m(12), m(11), m(10)))
    assert(fetch("limit=4&order=asc").map(_._1) == Seq(m(0), m(1), m(2), m(3)))
    // limit ∧ start ∧ no end → ASC default (T3)
    assert(fetch(s"limit=4&start=${start - 1}").map(_._1) == Seq(m(0), m(1), m(2), m(3)))
  }

  test("invalid and non-user type params answer 400 with the reference's " +
    "errorMsg texts") {
    val t = Some("t-cb-badtype")
    val (s1, b1) = call("GET", "/metrics?type=gaugeavailabilitycounterstring", t)
    assert(s1 == 400, b1)
    assert(mapper.readTree(b1).get("errorMsg").asText() ==
      "gaugeavailabilitycounterstring is not a recognized metric type", b1)
    val (s2, b2) = call("GET", "/metrics?type=counter_rate", t)
    assert(s2 == 400, b2)
    assert(mapper.readTree(b2).get("errorMsg").asText() ==
      "Incorrect type param counter_rate", b2)
    assert(call("GET", "/metrics?type=gauge", t)._1 == 204)
  }

  test("findMetrics: data-derived and explicit definitions merge per type; " +
    "explicit defs without data carry no min/max under timestamps=true") {
    val t = Some("t-cb-find")
    val start = System.currentTimeMillis() - 20 * 60000L
    assert(call("POST", "/gauges/raw", t, Some(
      s"""[{"id":"m11","data":[{"timestamp":$start,"value":1.1},{"timestamp":${start + 60000},"value":1.2}]},
         |{"id":"m12","data":[{"timestamp":$start,"value":2.1},{"timestamp":${start + 60000},"value":2.2}]}]"""
        .stripMargin))._1 == 204)
    assert(call("POST", "/gauges", t, Some(
      """{"id":"m13","tags":{"a1":"A","B1":"B"},"dataRetention":32}"""))._1 == 204)

    val (gs, gb) = call("GET", "/metrics?type=gauge&timestamps=true", t)
    assert(gs == 200, gb)
    val gdefs = mapper.readTree(gb).elements().asScala.toSeq.sortBy(_.get("id").asText())
    assert(gdefs.map(_.get("id").asText()) == Seq("m11", "m12", "m13"), gb)
    for (d <- gdefs.take(2)) {
      assert(d.get("dataRetention").asInt() == 7 && d.get("type").asText() == "gauge", gb)
      assert(d.get("minTimestamp").asLong() == start, gb)
      assert(d.get("maxTimestamp").asLong() == start + 60000, gb)
      assert(!d.has("tags"), gb)
    }
    val m13 = gdefs(2)
    assert(m13.get("dataRetention").asInt() == 32, gb)
    assert(m13.get("tags").get("a1").asText() == "A" &&
      m13.get("tags").get("B1").asText() == "B", gb)
    assert(!m13.has("minTimestamp") && !m13.has("maxTimestamp"), gb)

    assert(call("POST", "/availability/raw", t, Some(
      s"""[{"id":"m14","data":[{"timestamp":$start,"value":"up"},{"timestamp":${start + 60000},"value":"up"}]},
         |{"id":"m15","data":[{"timestamp":$start,"value":"up"},{"timestamp":${start + 60000},"value":"down"}]}]"""
        .stripMargin))._1 == 204)
    assert(call("POST", "/availability", t, Some(
      """{"id":"m16","tags":{"a10":"10","a11":"11"},"dataRetention":7}"""))._1 == 204)
    val (as_, ab) = call("GET", "/metrics?type=availability&timestamps=true", t)
    assert(as_ == 200, ab)
    val adefs = mapper.readTree(ab).elements().asScala.toSeq.sortBy(_.get("id").asText())
    assert(adefs.map(_.get("id").asText()) == Seq("m14", "m15", "m16"), ab)
    assert(adefs.forall(_.get("type").asText() == "availability"), ab)

    // create through the untyped /metrics endpoint with a payload type,
    // fetch through the typed path
    assert(call("POST", "/metrics", t, Some(
      """{"id":"m17","tags":{"a10":"10","a11":"11"},"dataRetention":7,"type":"availability"}"""))._1 == 204)
    val (ms, mb) = call("GET", "/availability/m17", t)
    assert(ms == 200, mb)
    val m17 = mapper.readTree(mb)
    assert(m17.get("id").asText() == "m17" &&
      m17.get("type").asText() == "availability" &&
      m17.get("dataRetention").asInt() == 7 &&
      m17.get("tenantId").asText() == "t-cb-find", mb)
  }

  // CassandraBackendITest.groovy:560-580
  test("createEmptyMetric: an id-only definition reads back with the " +
    "default retention and no tags key") {
    val t = Some("t-cb-empty")
    assert(call("POST", "/gauges", t, Some("""{"id":"Empty1"}"""))._1 == 204)
    val (st, body) = call("GET", "/gauges/Empty1", t)
    assert(st == 200, body)
    val d = mapper.readTree(body)
    assert(d.get("id").asText() == "Empty1" && d.get("type").asText() == "gauge" &&
      d.get("dataRetention").asInt() == 7 && d.get("tenantId").asText() == "t-cb-empty", body)
    assert(!d.has("tags"), body)
  }

  // CassandraBackendITest.groovy:581-613
  test("testCreateTypeChecking: a body type contradicting the path 400s; " +
    "the untyped endpoint requires a type") {
    val t = Some("t-cb-typecheck")
    for ((path, wrong) <- Seq(("gauges", "availability"),
        ("availability", "gauge"), ("counters", "availability"))) {
      val (st, body) = call("POST", s"/$path", t,
        Some(s"""{"id":"N1","type":"$wrong"}"""))
      assert(st == 400, s"$path: $st $body")
      assert(mapper.readTree(body).hasNonNull("errorMsg"), body)
    }
    val (st, body) = call("POST", "/metrics", t, Some("""{"id":"N1"}"""))
    assert(st == 400, s"$st $body")
    assert(mapper.readTree(body).hasNonNull("errorMsg"), body)
  }

  // CassandraBackendITest.groovy:614-727 — both creation endpoints share
  // the conflict/overwrite lifecycle and the Location header shape
  test("create/overwrite lifecycle via the typed and untyped endpoints: " +
    "201-class create with Location, 409 on re-create, overwrite replaces " +
    "tags and retention") {
    val families = Seq("gauges" -> "gauge", "counters" -> "counter",
      "availability" -> "availability", "strings" -> "string")

    def assertDef(path: String, tags: Map[String, String], retention: Int,
                  tenant: Option[String]): Unit = {
      val (st, body) = call("GET", s"/$path/m2", tenant)
      assert(st == 200, s"$path: $body")
      val d = mapper.readTree(body)
      assert(d.get("dataRetention").asInt() == retention, body)
      val got = d.get("tags").properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap
      assert(got == tags, body)
    }

    for ((path, typeText) <- families) {
      // via the typed endpoint
      val t1 = Some(s"t-cb-ow-$path")
      val (cs, _, ch) = callH("POST", s"/$path", t1,
        Some("""{"id":"m2","tags":{"a":"1","b":"2"},"dataRetention":24}"""))
      assert(cs == 204, s"$path create")
      assert(ch.get("location").contains(s"http://127.0.0.1:${transport.boundPort}/$path/m2"), ch)
      assertDef(path, Map("a" -> "1", "b" -> "2"), 24, t1)
      assert(call("POST", s"/$path", t1,
        Some("""{"id":"m2","tags":{"a":"1","b":"2"},"dataRetention":24}"""))._1 == 409)
      assert(call("POST", s"/$path?overwrite=true", t1,
        Some("""{"id":"m2","tags":{"c":"3","d":"4"},"dataRetention":55}"""))._1 == 204)
      assertDef(path, Map("c" -> "3", "d" -> "4"), 55, t1)

      // via the untyped /metrics endpoint with a payload type
      val t2 = Some(s"t-cb-owm-$path")
      val (ms, _, mh) = callH("POST", "/metrics", t2,
        Some(s"""{"id":"m2","tags":{"a":"1","b":"2"},"dataRetention":24,"type":"$typeText"}"""))
      assert(ms == 204, s"metrics/$typeText create")
      assert(mh.get("location").contains(s"http://127.0.0.1:${transport.boundPort}/$path/m2"), mh)
      assertDef(path, Map("a" -> "1", "b" -> "2"), 24, t2)
      assert(call("POST", "/metrics", t2,
        Some(s"""{"id":"m2","type":"$typeText"}"""))._1 == 409)
      assert(call("POST", "/metrics?overwrite=true", t2,
        Some(s"""{"id":"m2","tags":{"c":"3","d":"4"},"dataRetention":55,"type":"$typeText"}"""))._1 == 204)
      assertDef(path, Map("c" -> "3", "d" -> "4"), 55, t2)
    }
  }
}
