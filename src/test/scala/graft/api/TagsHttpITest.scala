package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.SparkTestBase
import scala.jdk.CollectionConverters._

/**
 * Port of the reference tag-CRUD REST integration suite over the real
 * HTTP transport — the assertions of
 * rest-tests-jaxrs/.../TagsITest.groovy:32-53
 * (shouldNotAcceptMissingOrInvalidTags), :55-67
 * (findMetricTagsWhenThereIsNoData), :68-134
 * (createMetricsAndUpdateTags — create with whitespace-laden tag
 * names/values, 409 duplicates, PUT merge, DELETE by name or
 * name:value), :271-323 (findTagValues — the {name: [values]}
 * discovery shape with encoded ':' values, per-type and generic
 * endpoints), :324-381 (findTagNames — the names array with
 * filter/type params), looping over all four user metric types.
 *
 * One documented divergence rides throughout: the reference answers
 * 201/200 for writes; this transport collapses write successes to 204
 * (HttpTransport scaladoc), so the ports assert 204 where the groovy
 * asserts 200/201 on a write.
 */
class TagsHttpITest extends SparkTestBase with HttpSpecSupport {

  private val mapper = new ObjectMapper()
  private val MetricTypes = Seq(
    ("gauges", "gauge"), ("counters", "counter"),
    ("availability", "availability"), ("strings", "string"))

  private def json(body: String): JsonNode = mapper.readTree(body)

  private def fields(n: JsonNode): Map[String, String] =
    n.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap

  // TagsITest.groovy:32-53
  test("missing or invalid tag grammars answer 400 on every metric type") {
    MetricTypes.foreach { case (path, _) =>
      val t = Some(s"t-badtags-$path")
      assert(call("DELETE", s"/$path/id1/tags/,", t)._1 == 400, s"$path: empty token")
      assert(call("DELETE", s"/$path/id2/tags/:5", t)._1 == 400, s"$path: blank name")
      assert(call("PUT", s"/$path/id4/tags", t)._1 == 400, s"$path: missing body")
      assert(call("PUT", s"/$path/id5/tags", t,
        Some("""{"":"test"}"""))._1 == 400, s"$path: blank tag name")
    }
  }

  // TagsITest.groovy:55-67
  test("tags and definition of an unknown metric answer 204 on every type") {
    MetricTypes.foreach { case (path, _) =>
      val t = Some(s"t-notags-$path")
      assert(call("GET", s"/$path/missing/tags", t)._1 == 204, s"$path tags")
      assert(call("GET", s"/$path/missing", t)._1 == 204, s"$path definition")
    }
  }

  // TagsITest.groovy:68-134
  test("create metrics, fetch single definitions, 409 duplicates, merge and " +
    "delete tags (names or name:value pairs) on every type") {
    MetricTypes.foreach { case (path, typeText) =>
      val t = Some(s"t-crud-$path")
      // whitespace INSIDE tag names/values is preserved verbatim
      assert(call("POST", s"/$path", t, Some(
        """{"id":"N1","tags":{"  a  1   ":"   A","bsq   d1":"B   "}}"""))._1 == 204)

      val (ds, defBody) = call("GET", s"/$path/N1", t)
      assert(ds == 200, defBody)
      val d = json(defBody)
      assert(d.get("tenantId").asText == t.get && d.get("id").asText == "N1", defBody)
      assert(d.get("type").asText == typeText, defBody)
      assert(d.get("dataRetention").asInt == 7, defBody)
      assert(fields(d.get("tags")) ==
        Map("  a  1   " -> "   A", "bsq   d1" -> "B   "), defBody)

      val (dup, dupMsg) = call("POST", s"/$path", t, Some("""{"id":"N1"}"""))
      assert(dup == 409 && dupMsg.contains("errorMsg"), s"$dup $dupMsg")

      assert(call("POST", s"/$path", t, Some(
        """{"id":"N2","tags":{"a2":"2","b2":"B2"},"dataRetention":96}"""))._1 == 204)

      val (t1, tags1) = call("GET", s"/$path/N1/tags", t)
      assert(t1 == 200 &&
        fields(json(tags1)) == Map("  a  1   " -> "   A", "bsq   d1" -> "B   "), tags1)
      val (t2, tags2) = call("GET", s"/$path/N2/tags", t)
      assert(t2 == 200 && fields(json(tags2)) == Map("a2" -> "2", "b2" -> "B2"), tags2)
      assert(call("GET", s"/$path/N-doesNotExist/tags", t)._1 == 204)

      // PUT merges into the existing tag map
      assert(call("PUT", s"/$path/N1/tags", t,
        Some("""{"a1":"one","a2":"2","b1":"B"}"""))._1 == 204)
      val (t3, tags3) = call("GET", s"/$path/N1/tags", t)
      assert(t3 == 200 && fields(json(tags3)) == Map(
        "  a  1   " -> "   A", "a1" -> "one", "a2" -> "2",
        "b1" -> "B", "bsq   d1" -> "B   "), tags3)

      // DELETE accepts plain names or name:value pairs
      assert(call("DELETE", s"/$path/N1/tags/a2,b1:B", t)._1 == 204)
      val (t4, tags4) = call("GET", s"/$path/N1/tags", t)
      assert(t4 == 200 && fields(json(tags4)) == Map(
        "  a  1   " -> "   A", "a1" -> "one", "bsq   d1" -> "B   "), tags4)
    }
  }

  // TagsITest.groovy:271-323
  test("tag-value discovery answers {name: [values]} per type and via the " +
    "generic endpoint; no match answers 204") {
    MetricTypes.foreach { case (path, typeText) =>
      val t = Some(s"t-tagvals-$path")
      assert(call("POST", s"/$path", t, Some(
        """{"id":"N1","tags":{"a1":"A/B","d1":"B:A"}}"""))._1 == 204)
      assert(call("POST", s"/$path", t, Some(
        """{"id":"N2","tags":{"a1":"a","d1":"B:A"}}"""))._1 == 204)

      val (s1, b1) = call("GET", s"/$path/tags/d1:B%3AA", t)
      assert(s1 == 200, s"$path: $b1")
      val n1 = json(b1)
      assert(n1.size() == 1 &&
        n1.get("d1").elements().asScala.map(_.asText).toSet == Set("B:A"), b1)

      // the same discovery through the per-type, typed-generic and
      // untyped-generic endpoints (the groovy asserts all three equal)
      val bodies = Seq(
        call("GET", s"/$path/tags/a1:*,d1:B%3AA", t),
        call("GET", s"/metrics/tags/a1:*,d1:B%3AA?type=$typeText", t),
        call("GET", s"/metrics/tags/a1:*,d1:B%3AA", t))
      bodies.foreach { case (st, body) =>
        assert(st == 200, s"$path: $body")
        val n = json(body)
        assert(n.size() == 2, body)
        assert(n.get("a1").elements().asScala.map(_.asText).toSet == Set("a", "A/B"), body)
        assert(n.get("d1").elements().asScala.map(_.asText).toSet == Set("B:A"), body)
      }

      assert(call("GET", s"/$path/tags/g1:*", t)._1 == 204, s"$path: no match")
    }
  }

  // TagsITest.groovy:324-381
  test("tag-name discovery: names array across types, filter regex, 204 on " +
    "no match, type scoping after a per-type delete") {
    val t = Some("t-tagnames")
    MetricTypes.foreach { case (path, _) =>
      assert(call("POST", s"/$path", t, Some(
        """{"id":"N1","tags":{"a1":"A/B","d1":"B:A"}}"""))._1 == 204)
      assert(call("POST", s"/$path", t, Some(
        """{"id":"N2","tags":{"a1":"a","d3":"B:A"}}"""))._1 == 204)
    }

    val (s1, b1) = call("GET", "/metrics/tags", t)
    assert(s1 == 200, b1)
    val names = json(b1).elements().asScala.map(_.asText).toSet
    assert(names == Set("a1", "d1", "d3"), b1)

    val (s2, b2) = call("GET", "/metrics/tags?filter=d.*", t)
    assert(s2 == 200, b2)
    assert(json(b2).elements().asScala.map(_.asText).toSet == Set("d1", "d3"), b2)

    assert(call("GET", "/metrics/tags?filter=e*", t)._1 == 204)

    // delete d3 from the GAUGE N2 only — the type-scoped discovery must
    // stop seeing it while other types still carry it
    assert(call("DELETE", "/gauges/N2/tags/d3", t)._1 == 204)
    val (s3, b3) = call("GET", "/metrics/tags?filter=d.*&type=gauge", t)
    assert(s3 == 200, b3)
    assert(json(b3).elements().asScala.map(_.asText).toSet == Set("d1"), b3)
  }

  private def defList(body: String): Seq[JsonNode] =
    json(body).elements().asScala.toSeq

  private def defOf(body: String, id: String): JsonNode = {
    val d = defList(body).find(_.get("id").asText == id)
    assert(d.isDefined, s"no definition '$id' in $body"); d.get
  }

  // TagsITest.groovy:136-232 findDefinitionsWithTags — tag-filtered
  // catalog listing on both the generic and the type-scoped endpoints,
  // the bad-regexp 400, the id-pattern filter, and the empty 204
  test("findDefinitionsWithTags: tag filters drive the catalog listing " +
    "on /metrics and the type endpoints alike") {
    for ((path, typ) <- MetricTypes) {
      val t = Some(s"t-deftags-$typ")
      assert(call("POST", s"/$path", t, Some(
        """{"id":"N1","tags":{"a1":"A","d1":"B"},"dataRetention":7}"""))._1 == 204)
      assert(call("POST", s"/$path", t, Some(
        """{"id":"N2","tags":{"a1":"A2"},"dataRetention":7}"""))._1 == 204)

      for (url <- Seq(s"/metrics?tags=a1:*", s"/$path?tags=a1:*")) {
        val (st, body) = call("GET", url, t)
        assert(st == 200, s"$url: $st $body")
        assert(defList(body).size == 2, s"$url: $body")
        val n1 = defOf(body, "N1")
        assert(n1.get("tenantId").asText == t.get && n1.get("type").asText == typ, body)
        assert(n1.get("tags").get("a1").asText == "A" &&
          n1.get("tags").get("d1").asText == "B", body)
        assert(n1.get("dataRetention").asInt == 7, body)
        assert(defOf(body, "N2").get("tags").get("a1").asText == "A2", body)
      }

      // two-tag AND narrows to N1, generic (with type param) and scoped
      for (url <- Seq(s"/metrics?tags=a1:A,d1:B&type=$typ", s"/$path?tags=a1:A,d1:B")) {
        val (st, body) = call("GET", url, t)
        assert(st == 200 && defList(body).map(_.get("id").asText) == Seq("N1"),
          s"$url: $st $body")
      }

      // invalid regexp answers 400
      assert(call("GET", s"/metrics?tags=a1:**&type=$typ", t)._1 == 400)

      // tags + type + id PATTERN (idFilter is a regex when tags are set)
      val (is, ibody) = call("GET", s"/metrics?tags=a1:*&type=$typ&id=.2", t)
      assert(is == 200 && defList(ibody).map(_.get("id").asText) == Seq("N2"),
        s"$is $ibody")

      // no match → 204
      assert(call("GET", s"/metrics?tags=notvalid:*&type=$typ", t)._1 == 204)
    }
  }

  // TagsITest.groovy:234-270 findWithEncodedTagsValues — tag VALUES
  // carrying the grammar's own delimiters ride %-encoded. The reference
  // stack decodes TWICE (container once, TagsConverter.java:76-79 again
  // after the comma/colon split), so the groovy's query value "C%2CD"
  // leaves the client DOUBLE-encoded as C%252CD — these URLs are those
  // wire bytes verbatim.
  test("findWithEncodedTagsValues: %-encoded ':', '/', ',' inside tag " +
    "values match their stored definitions") {
    for ((path, typ) <- MetricTypes) {
      val t = Some(s"t-enctags-$typ")
      assert(call("POST", s"/$path", t, Some(
        """{"id":"N1","tags":{"a1":"A/B","d1":"B:A","c1":"C,D"}}"""))._1 == 204)
      for (url <- Seq(s"/metrics?tags=d1:B%253AA&type=$typ",
          s"/$path?tags=a1:A%252FB", s"/$path?tags=c1:C%252CD")) {
        val (st, body) = call("GET", url, t)
        assert(st == 200, s"$url: $st $body")
        val ds = defList(body)
        assert(ds.size == 1 && ds.head.get("id").asText == "N1", s"$url: $body")
        assert(ds.head.get("tags").get("c1").asText == "C,D", body)
      }
    }
  }

  // TagsITest.groovy:441-521 findDefinitionsWithIdFiltering — the exact
  // `|`-separated id list (NOT a regex: a uuid with dashes matches
  // itself only), and the missing-type 400
  test("findDefinitionsWithIdFiltering: exact |-separated id lists need " +
    "a type; uuids are not treated as regexps") {
    val uuid = "91c171ed-0294-44b3-bcdb-42253b58aa5a"
    for ((path, typ) <- MetricTypes) {
      val t = Some(s"t-idfilter-$typ")
      for ((id, tags) <- Seq("N1" -> """{"a1":"A","d1":"B"}""",
          "N2" -> """{"a1":"A2"}""", uuid -> """{"c1":"C"}"""))
        assert(call("POST", s"/$path", t,
          Some(s"""{"id":"$id","tags":$tags,"dataRetention":7}"""))._1 == 204)

      val (st, body) = call("GET", s"/metrics?id=N1%7CN2&type=$typ", t)
      assert(st == 200, s"$st $body")
      assert(defList(body).map(_.get("id").asText).toSet == Set("N1", "N2"), body)

      val (us, ubody) = call("GET", s"/metrics?id=$uuid&type=$typ", t)
      assert(us == 200 && defList(ubody).map(_.get("id").asText) == Seq(uuid),
        s"$us $ubody")
      assert(defOf(ubody, uuid).get("tags").get("c1").asText == "C", ubody)

      // id without type → 400 (HWKMETRICS-461)
      assert(call("GET", s"/metrics?id=$uuid", t)._1 == 400)
    }
  }
}
