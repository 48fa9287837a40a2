package graft.api

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkTestBase
import java.nio.file.Files

/**
 * Port of the service-state filter semantics
 * (api/metrics-api-jaxrs/.../filter/MetricsServiceStateFilter.java:55-85
 * + MetricsServiceLifecycle.java:133-134,284,395,400-403,678-695) over
 * the live transport: the HTTP container and the metrics service
 * start/stop independently, so there is a real window where requests
 * arrive against a STARTING / FAILED / STOPPED service —
 *
 *  - STARTING → 503 "Service unavailable while initializing."
 *  - FAILED   → 500 "Internal server error."
 *  - STOPPED  → 503 "The service is no longer running."
 *
 * "/" and /status are exempt in every state (the status page is how
 * operators watch the service come up), and /status reports the LIVE
 * lifecycle state (StatusHandler.java:63-67).
 *
 * Filter ordering is pinned too: the state filter has default USER
 * priority, so the tenant filter's 400 (priority 10, @PreMatching)
 * fires BEFORE it, while the matching-time 406 content negotiation
 * fires AFTER it.
 *
 * Tests run in declaration order and walk one transport through
 * STARTING → FAILED → STARTED → STOPPED.
 */
class ServiceStateHttpITest extends SparkTestBase with HttpSpecSupport {

  private val mapper = new ObjectMapper()

  // bind the socket but leave the service STARTING — the reference's
  // startup posture (web container up, backend initializing)
  override protected def makeTransport(): HttpTransport =
    new HttpTransport(spark, Files.createTempDirectory("graft-http").toString).bind()

  private def statusField(): String =
    mapper.readTree(call("GET", "/status")._2).get("MetricsService").asText()

  test("STARTING: data routes answer 503 while / and /status stay up " +
    "and report the live state") {
    assert(transport.serviceState == HttpTransport.ServiceState.Starting)
    val (st, body) = call("GET", "/gauges", tenant = Some("t-state"))
    assert(st == 503, s"$st $body")
    assert(mapper.readTree(body).get("errorMsg").asText() ==
      "Service unavailable while initializing.", body)
    // exempt routes (the reference exempts StatusHandler.PATH and
    // BaseHandler.PATH; /admin/status exists to report the state, so it
    // is exempt too): all 200, both status routes report STARTING
    assert(call("GET", "/")._1 == 200)
    assert(statusField() == "STARTING")
    val (stA, bodyA) = call("GET", "/admin/status")
    assert(stA == 200, s"$stA $bodyA")
    assert(mapper.readTree(bodyA).get("MetricsService").asText() == "STARTING", bodyA)
  }

  test("STARTING: the tenant filter (priority 10) fires before the " +
    "state filter, the 406 content negotiation after it") {
    // no tenant header → the tenant filter's 400, not the state 503
    val (st1, body1) = call("GET", "/gauges")
    assert(st1 == 400, s"$st1 $body1")
    assert(body1.contains("Tenant is not specified"), body1)
    // tenant ok but Accept admits no json: the state filter is
    // @PreMatching, content negotiation is matching-time → 503 wins
    val (st2, body2, _) = callH("GET", "/gauges", tenant = Some("t-state"),
      headers = Map("Accept" -> "application/xml"))
    assert(st2 == 503, s"$st2 $body2")
  }

  test("FAILED: data routes answer 500, /status reports FAILED") {
    transport.markFailed()
    val (st, body) = call("GET", "/gauges", tenant = Some("t-state"))
    assert(st == 500, s"$st $body")
    assert(mapper.readTree(body).get("errorMsg").asText() ==
      "Internal server error.", body)
    assert(statusField() == "FAILED")
  }

  test("STARTED: the same route serves normally once the service is ready") {
    transport.markReady()
    // full round-trip through the now-open gate: ingest then read back
    // (timestamp must sit inside the default now-8h fetch window)
    val ts = System.currentTimeMillis() - 1000
    val (stW, bodyW) = call("POST", "/gauges/g1/raw", tenant = Some("t-state"),
      body = Some(s"""[{"timestamp":$ts,"value":41.5}]"""))
    assert(stW == 204, s"$stW $bodyW")
    val (stR, bodyR) = call("GET", "/gauges/g1/raw", tenant = Some("t-state"))
    assert(stR == 200, s"$stR $bodyR")
    assert(mapper.readTree(bodyR).get(0).get("value").asDouble() == 41.5, bodyR)
    assert(statusField() == "STARTED")
  }

  test("STOPPED: the service drains but the container keeps serving — " +
    "data routes 503, /status reports STOPPED") {
    transport.stopService()
    // the programmatic state probe an embedding application would poll
    assert(transport.serviceState == HttpTransport.ServiceState.Stopped)
    val (st, body) = call("GET", "/gauges/g1/raw", tenant = Some("t-state"))
    assert(st == 503, s"$st $body")
    assert(mapper.readTree(body).get("errorMsg").asText() ==
      "The service is no longer running.", body)
    assert(statusField() == "STOPPED")
    assert(call("GET", "/")._1 == 200)
  }
}
