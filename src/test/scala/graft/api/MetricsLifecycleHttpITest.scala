package graft.api

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkTestBase
import scala.jdk.CollectionConverters._

/**
 * Port of the lifecycle + relative-range sections of the reference
 * metrics REST suite — rest-tests-jaxrs/.../MetricsITest.groovy:
 *  - :2659-2804 relativeTimeStamps — `start`/`end` as "-11mn"-style
 *    offsets from now, resolved per request, through the sectioned
 *    mixed stats query;
 *  - :2805-2903 createAndDeleteMetrics — for EVERY user type: create
 *    with tags, insert, read def + raw back, delete, and verify the
 *    deleted metric answers 204 on both def and raw GETs while its
 *    neighbors stay intact.
 * (fetchAllTenantMetrics is @Test-disabled in the reference —
 * HWKMETRICS-773 — and not ported.)
 *
 * Reference 201/200 write statuses collapse to this transport's 204
 * (HttpTransport scaladoc).
 */
class MetricsLifecycleHttpITest extends SparkTestBase with HttpSpecSupport {

  private val mapper = new ObjectMapper()

  test("relativeTimeStamps: -Nmn offsets resolve against request time in " +
    "the sectioned mixed stats query") {
    val t = Some("t-rel-ts")
    val start = System.currentTimeMillis() - 10 * 60000L
    assert(call("POST", "/metrics/raw", t, Some(
      s"""{"counters":[{"id":"RC","data":[{"timestamp":$start,"value":10},
         |  {"timestamp":${start + 5 * 60000},"value":20}]}],
         |"gauges":[{"id":"RG","data":[{"timestamp":$start,"value":25.4},
         |  {"timestamp":${start + 5 * 60000},"value":15.8}]}]}""".stripMargin))._1 == 204)

    def statsAt(startOff: String, endOff: String): com.fasterxml.jackson.databind.JsonNode = {
      val (st, body) = call("POST", "/metrics/stats/query", t, Some(
        s"""{"buckets":1,"start":"$startOff","end":"$endOff",
           |"metrics":{"gauge":["RG"],"counter":["RC"]}}""".stripMargin))
      assert(st == 200, s"$startOff..$endOff: $body")
      mapper.readTree(body)
    }

    // [-11mn, -9mn) captures only the FIRST points
    val early = statsAt("-11mn", "-9mn")
    assert(early.get("gauge").get("RG").size() == 1, early)
    assert(early.get("gauge").get("RG").get(0).get("avg").asDouble == 25.4, early)
    assert(early.get("gauge").get("RG").get(0).get("samples").asLong == 1, early)
    assert(early.get("counter").get("RC").get(0).get("avg").asDouble == 10.0, early)
    assert(early.get("counter").get("RC").get(0).get("samples").asLong == 1, early)

    // [-6mn, -4mn) captures only the SECOND points
    val late = statsAt("-6mn", "-4mn")
    assert(late.get("gauge").get("RG").get(0).get("avg").asDouble == 15.8, late)
    assert(late.get("gauge").get("RG").get(0).get("samples").asLong == 1, late)
    assert(late.get("counter").get("RC").get(0).get("avg").asDouble == 20.0, late)
    assert(late.get("counter").get("RC").get(0).get("samples").asLong == 1, late)
  }

  test("createAndDeleteMetrics: full per-type lifecycle; deleting one " +
    "metric leaves its neighbors' definitions and data intact") {
    val families = Seq(
      ("gauges", Seq("1.2", "2.3", "3.4", "4.5")),
      ("counters", Seq("12", "23", "34", "45")),
      ("availability", Seq("\"down\"", "\"up\"", "\"up\"", "\"down\"")),
      ("strings", Seq("\"1.2d\"", "\"2.3d\"", "\"3.4d\"", "\"4.5d\"")))

    for ((path, values) <- families) {
      val t = Some(s"t-lifecycle-$path")
      val stem = path.stripSuffix("s")
      val ids = (0 until 4).map(i => s"$stem-test-$i")
      def tagsOf(i: Int): Map[String, String] =
        (0 until 4).map(j => s"test$j" -> s"test$stem$j").toMap

      for ((id, i) <- ids.zipWithIndex) {
        val tagsJson = tagsOf(i).map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
        assert(call("POST", s"/$path", t,
          Some(s"""{"id":"$id","tags":{$tagsJson}}"""))._1 == 204, s"$path/$id create")
        val dps = values.zipWithIndex.map { case (v, j) =>
          s"""{"timestamp":${j + 1},"value":$v}"""
        }.mkString("[", ",", "]")
        assert(call("POST", s"/$path/$id/raw", t, Some(dps))._1 == 204, s"$path/$id raw")
      }

      def defTags(id: String): Option[Map[String, String]] = {
        val (st, body) = call("GET", s"/$path/$id", t)
        if (st == 204) None
        else {
          assert(st == 200, s"$path/$id: $body")
          val tags = mapper.readTree(body).get("tags")
          Some(tags.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
        }
      }
      def rawCount(id: String): Int = {
        val (st, body) = call("GET", s"/$path/$id/raw?order=asc&start=0&end=100", t)
        if (st == 204) -1
        else { assert(st == 200, s"$path/$id: $body"); mapper.readTree(body).size() }
      }

      var deleted = Set.empty[String]
      for ((id, i) <- ids.zipWithIndex) {
        assert(defTags(id).contains(tagsOf(i)), s"$path/$id def before delete")
        assert(rawCount(id) == 4, s"$path/$id raw before delete")
        assert(call("DELETE", s"/$path/$id", t)._1 == 204, s"$path/$id delete")
        deleted += id
        for ((cid, ci) <- ids.zipWithIndex) {
          if (deleted(cid)) {
            assert(defTags(cid).isEmpty, s"$path/$cid def after delete")
            assert(rawCount(cid) == -1, s"$path/$cid raw after delete")
          } else {
            assert(defTags(cid).contains(tagsOf(ci)), s"$path/$cid def intact")
            assert(rawCount(cid) == 4, s"$path/$cid raw intact")
          }
        }
      }
    }
  }
}
