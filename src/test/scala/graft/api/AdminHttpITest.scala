package graft.api

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkTestBase
import java.nio.file.Files

/**
 * Port of the admin-guard REST behaviors over the real HTTP transport,
 * against a transport configured WITH an admin token (the reference
 * test deployment sets `hawkular.metrics.admin-token`):
 *  - AdminITest.groovy:31-52 — GET /admin/status with tenant + valid
 *    token answers the status object;
 *  - AdminFilter.java — /tenants and /admin routes demand the tenant
 *    header (400, TENANT_MISSING), then the admin token header (400,
 *    ADMIN_TOKEN_MISSING), then its sha256 match (403,
 *    ADMIN_TOKEN_INCORRECT); every TenantITest call carries both
 *    headers. Non-admin data routes never see the token check.
 *
 * This suite builds its own transport — the shared HttpSpecSupport one
 * runs token-less, preserving the open-by-default mode the other ports
 * rely on.
 */
class AdminHttpITest extends SparkTestBase with org.scalatest.BeforeAndAfterAll {

  private val mapper = new ObjectMapper()
  private var transport: HttpTransport = _
  private def base = s"http://127.0.0.1:${transport.boundPort}"
  private val Token = "s3cr3t-admin"

  override def beforeAll(): Unit = {
    super.beforeAll()
    transport = new HttpTransport(spark,
      Files.createTempDirectory("graft-admin-http").toString,
      adminToken = Some(Token)).start()
  }

  override def afterAll(): Unit = {
    if (transport != null) transport.stop()
    super.afterAll()
  }

  private def call(method: String, path: String,
                   headers: Map[String, String] = Map.empty,
                   body: Option[String] = None): (Int, String) = {
    val conn = java.net.URI.create(base + path).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod(method)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      conn.getOutputStream.write(b.getBytes("UTF-8"))
    }
    val st = conn.getResponseCode
    val in = if (st >= 400) conn.getErrorStream else conn.getInputStream
    val text = if (in == null) "" else new String(in.readAllBytes(), "UTF-8")
    (st, text)
  }

  private val authed = Map("Hawkular-Tenant" -> "t-admin",
    HttpTransport.AdminTokenHeader -> Token)

  test("GET /admin/status with tenant + valid token answers the status object") {
    val (st, body) = call("GET", "/admin/status", authed)
    assert(st == 200, body)
    assert(mapper.readTree(body).get("MetricsService").asText() == "STARTED", body)
  }

  test("admin-guarded routes demand tenant, then token, then the sha256 " +
    "match — in the reference's order with its errorMsg texts") {
    // no tenant at all → TENANT_MISSING (tenant check precedes the token)
    val (s1, b1) = call("GET", "/tenants")
    assert(s1 == 400, b1)
    assert(mapper.readTree(b1).get("errorMsg").asText() ==
      "Tenant is not specified. Use 'Hawkular-Tenant' header.", b1)
    // tenant, no token → ADMIN_TOKEN_MISSING
    val (s2, b2) = call("GET", "/tenants", Map("Hawkular-Tenant" -> "t-admin"))
    assert(s2 == 400, b2)
    assert(mapper.readTree(b2).get("errorMsg").asText() ==
      "Admin token is not specified. Use 'Hawkular-Admin-Token' header", b2)
    // tenant + wrong token → 403 ADMIN_TOKEN_INCORRECT
    val (s3, b3) = call("GET", "/tenants", Map("Hawkular-Tenant" -> "t-admin",
      HttpTransport.AdminTokenHeader -> "wrong"))
    assert(s3 == 403, b3)
    assert(mapper.readTree(b3).get("errorMsg").asText() ==
      "Admin token is wrong or not specified.", b3)
    // same ladder on /admin/status
    assert(call("GET", "/admin/status")._1 == 400)
    assert(call("GET", "/admin/status", Map("Hawkular-Tenant" -> "t"))._1 == 400)
    assert(call("GET", "/admin/status", Map("Hawkular-Tenant" -> "t",
      HttpTransport.AdminTokenHeader -> "nope"))._1 == 403)
  }

  test("the tenant CRUD lifecycle works with both headers, like every " +
    "TenantITest call") {
    assert(call("POST", "/tenants", authed,
      Some("""{"id":"tadm1","retentions":{"gauge":45}}"""))._1 == 204)
    val (ls, lb) = call("GET", "/tenants", authed)
    assert(ls == 200, lb)
    assert(lb.contains("tadm1"), lb)
    assert(call("DELETE", "/tenants/tadm1", authed)._1 == 204)
  }

  // MetricsITest.groovy:2904-2954 fetchAllTenantMetrics (@Test-disabled
  // upstream, HWKMETRICS-773 — ported against the still-live servlet
  // contract, OpenshiftServlet.java): GET /openshift lists definitions
  // ACROSS tenants, restricted to those tagged descriptor_name, each
  // element carrying its tenantId. dataRetention serves the stored
  // value per Metric.java serialization (the disabled test's `null`
  // expectation contradicts the servlet's own serializer).
  test("GET /openshift scans descriptor_name-tagged definitions across " +
    "tenants, admin-guarded") {
    val t1 = Map("Hawkular-Tenant" -> "t-os-1",
      HttpTransport.AdminTokenHeader -> Token)
    val t2 = Map("Hawkular-Tenant" -> "t-os-2")
    assert(call("POST", "/gauges", t1,
      Some("""{"id":"N1","tags":{"descriptor_name":"cpu/usage"},"dataRetention":7}"""))._1 == 204)
    assert(call("POST", "/counters", t2,
      Some("""{"id":"N2","tags":{"descriptor_name":"cpu/usage"},"dataRetention":7}"""))._1 == 204)
    // no descriptor_name → excluded from the scan
    assert(call("POST", "/gauges", t1,
      Some("""{"id":"N2","tags":{"a1":"A2"},"dataRetention":7}"""))._1 == 204)

    // the admin guard applies (AdminFilter.java:74 covers /openshift)
    assert(call("GET", "/openshift", Map("Hawkular-Tenant" -> "t-os-1"))._1 == 400)
    assert(call("GET", "/openshift", Map("Hawkular-Tenant" -> "t-os-1",
      HttpTransport.AdminTokenHeader -> "wrong"))._1 == 403)

    val (st, body) = call("GET", "/openshift", t1)
    assert(st == 200, s"$st $body")
    val arr = mapper.readTree(body)
    assert(arr.isArray, body)
    val els = (0 until arr.size()).map(arr.get)
      .filter(e => Set("t-os-1", "t-os-2")(e.get("tenantId").asText()))
    assert(els.size == 2, s"exactly the two tagged definitions: $body")
    val byTenant = els.map(e => e.get("tenantId").asText() -> e).toMap
    val n1 = byTenant("t-os-1")
    assert(n1.get("id").asText() == "N1" && n1.get("type").asText() == "gauge", body)
    assert(n1.get("tags").get("descriptor_name").asText() == "cpu/usage", body)
    assert(n1.get("dataRetention").asInt() == 7, body)
    val n2 = byTenant("t-os-2")
    assert(n2.get("id").asText() == "N2" && n2.get("type").asText() == "counter", body)
  }

  test("non-admin data routes never see the token check") {
    val t = Map("Hawkular-Tenant" -> "t-admin-data")
    val now = System.currentTimeMillis()
    assert(call("POST", "/gauges/g1/raw", t,
      Some(s"""[{"timestamp":${now - 60000},"value":1.5}]"""))._1 == 204)
    assert(call("GET", "/gauges/g1/raw", t)._1 == 200)
    // meta routes stay tokenless too (status is NOT under /admin)
    assert(call("GET", "/status")._1 == 200)
    assert(call("GET", "/ping")._1 == 200)
  }
}
