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
}
