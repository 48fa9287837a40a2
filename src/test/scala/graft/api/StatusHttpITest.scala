package graft.api

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkTestBase

/**
 * Port of the service-meta REST suites over the real HTTP transport —
 * rest-tests-jaxrs/.../StatusITest.groovy:28-42 and RootITest.groovy:
 * 31-44: both assert a 200 JSON object carrying the service state /
 * name plus build metadata — `Implementation-Version` non-null and
 * `Built-From-Git-SHA1` present and != "Unknown".
 *
 * The reference reads both from the war manifest; this library's
 * analogs resolve from the jar manifest with dev fallbacks
 * (RestRoutes.ImplementationVersion / BuildSha). The service name is
 * "graft-metrics", the documented divergence from "Hawkular-Metrics".
 * Both routes are tenant-exempt (TenantFilter exemption set).
 */
class StatusHttpITest extends SparkTestBase with HttpSpecSupport {

  private val mapper = new ObjectMapper()

  // StatusITest.getStatus
  test("GET /status answers MetricsService STARTED plus build metadata, " +
    "without a tenant header") {
    val (st, body) = call("GET", "/status")
    assert(st == 200, s"$st $body")
    val n = mapper.readTree(body)
    assert(n.get("MetricsService").asText() == "STARTED", body)
    assert(n.hasNonNull("Implementation-Version") &&
      n.get("Implementation-Version").asText().nonEmpty, body)
    assert(n.hasNonNull("Built-From-Git-SHA1"), body)
    assert(n.get("Built-From-Git-SHA1").asText() != "Unknown", body)
  }

  // RootITest.getServiceInformation
  test("GET / answers the service name plus the same build metadata") {
    val (st, body) = call("GET", "/")
    assert(st == 200, s"$st $body")
    val n = mapper.readTree(body)
    assert(n.get("name").asText() == "graft-metrics", body)
    assert(n.hasNonNull("Implementation-Version") &&
      n.get("Implementation-Version").asText().nonEmpty, body)
    assert(n.get("Built-From-Git-SHA1").asText() != "Unknown", body)
    // the two routes agree on the build metadata
    val s = mapper.readTree(call("GET", "/status")._2)
    assert(s.get("Implementation-Version") == n.get("Implementation-Version"))
    assert(s.get("Built-From-Git-SHA1") == n.get("Built-From-Git-SHA1"))
  }
}
