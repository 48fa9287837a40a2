package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.SparkTestBase
import scala.jdk.CollectionConverters._

/**
 * Port of the reference tenant REST integration suite over the real
 * HTTP transport — the assertions of
 * rest-tests-jaxrs/.../TenantITest.groovy:36-83 (createAndReadTest:
 * listing carries per-type retention maps), :84-131
 * (duplicateTenantTest: 409 without overwrite, retention replacement
 * with ?overwrite=true), :132-165 (invalidPayloadTest: empty body →
 * 400), :295+ (deleteTenantHavingMetrics: a deleted tenant stops being
 * listed and its data stops being served; recreatable without
 * overwrite).
 *
 * Divergences documented at the transport: write successes answer 204
 * (not the reference's 201 + Location header), and there is no admin
 * token — the reference's 403 path has no analog here.
 */
class TenantHttpITest extends SparkTestBase with HttpSpecSupport {

  private val mapper = new ObjectMapper()

  private def tenantsById(body: String): Map[String, JsonNode] =
    mapper.readTree(body).elements().asScala.toSeq
      .map(n => n.get("id").asText -> n).toMap

  private def retentions(n: JsonNode): Map[String, Int] =
    Option(n.get("retentions")).filter(_.isObject).map(
      _.properties().asScala.map(e => e.getKey -> e.getValue.asInt).toMap)
      .getOrElse(Map.empty)

  // TenantITest.groovy:36-83
  test("created tenants list with their per-type retention maps") {
    assert(call("POST", "/tenants", body = Some(
      """{"id":"ten-a","retentions":{"gauge":45,"availability":30,"counter":13}}"""))._1 == 204)
    assert(call("POST", "/tenants", body = Some(
      """{"id":"ten-b","retentions":{"gauge":13,"availability":45,"counter":30}}"""))._1 == 204)

    val (st, body) = call("GET", "/tenants")
    assert(st == 200, body)
    val ts = tenantsById(body)
    assert(ts.contains("ten-a") && ts.contains("ten-b"), body)
    assert(retentions(ts("ten-a")) ==
      Map("gauge" -> 45, "availability" -> 30, "counter" -> 13), body)
    assert(retentions(ts("ten-b")) ==
      Map("gauge" -> 13, "availability" -> 45, "counter" -> 30), body)
  }

  // TenantITest.groovy:84-131
  test("duplicate create answers 409; overwrite=true replaces the retention " +
    "config") {
    assert(call("POST", "/tenants", body = Some("""{"id":"ten-dup"}"""))._1 == 204)
    val (dup, dupMsg) = call("POST", "/tenants", body = Some("""{"id":"ten-dup"}"""))
    assert(dup == 409 && dupMsg.contains("errorMsg"), s"$dup $dupMsg")

    assert(call("POST", "/tenants?overwrite=true", body = Some(
      """{"id":"ten-dup","retentions":{"gauge":145,"availability":130,"counter":113}}"""))._1 == 204)
    val (st, body) = call("GET", "/tenants")
    assert(st == 200, body)
    assert(retentions(tenantsById(body)("ten-dup")) ==
      Map("gauge" -> 145, "availability" -> 130, "counter" -> 113), body)
  }

  // TenantITest.groovy:132-147
  test("an empty tenant payload answers 400") {
    val (st, body) = call("POST", "/tenants", body = Some(""))
    assert(st == 400 && body.contains("errorMsg"), s"$st $body")
  }

  // TenantITest.groovy:295-425 (condensed: the non-scheduler assertions)
  test("deleting a tenant removes its listing, catalog and data; the id is " +
    "recreatable without overwrite") {
    val t = Some("ten-del")
    assert(call("POST", "/tenants", body = Some(
      """{"id":"ten-del","retentions":{"gauge":7}}"""))._1 == 204)
    assert(call("POST", "/gauges", t, Some("""{"id":"G1"}"""))._1 == 204)
    assert(call("POST", "/gauges/G1/raw", t,
      Some("""[{"timestamp":100,"value":1.1},{"timestamp":200,"value":2.2}]"""))._1 == 204)
    assert(call("GET", "/gauges/G1/raw?start=1&end=300", t)._1 == 200)

    assert(call("DELETE", "/tenants/ten-del")._1 == 204)

    val (ls, listing) = call("GET", "/tenants")
    assert(ls == 204 || !tenantsById(listing).contains("ten-del"),
      s"deleted tenant still listed: $listing")
    // data and catalog answer empty (204), not stale rows
    assert(call("GET", "/gauges/G1/raw?start=1&end=300", t)._1 == 204)
    assert(call("GET", "/gauges/G1", t)._1 == 204)

    // recreatable WITHOUT overwrite — the delete removed the tenant row
    assert(call("POST", "/tenants", body = Some("""{"id":"ten-del"}"""))._1 == 204)
  }
}
