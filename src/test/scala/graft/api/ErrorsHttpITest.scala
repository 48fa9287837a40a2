package graft.api

import graft.SparkTestBase

/**
 * Port of the reference error-status suite over the real HTTP transport
 * — rest-tests-jaxrs/.../ErrorsITest.groovy, one test per JAX-RS
 * exception family:
 *  - :37-41  NotAllowedException       → 405 (POST on a GET/PUT path)
 *  - :44-48  NotFoundException         → 404 (unknown type segment)
 *  - :51-56  NumberFormatException     → 400 (buckets overflows int)
 *  - :59-72  NotAcceptableException    → 406 (Accept admits no json)
 *  - :74-90  NotSupportedException     → 415 (body tagged text/plain)
 */
class ErrorsHttpITest extends SparkTestBase with HttpSpecSupport {

  private val t = Some("t-errors")

  test("405 Method Not Allowed: POST on the GET/PUT-only {id}/tags path") {
    val (st, _) = call("POST", "/gauges/test/tags", t, Some("""{"a":"1"}"""))
    assert(st == 405)
  }

  test("404 Not Found: unknown type segment") {
    assert(call("GET", "/gaugesssss/test/raw", t)._1 == 404)
  }

  test("400 Bad Request: buckets value overflowing an int is a client error") {
    val (st, body) = call("GET", "/gauges/test/stats?buckets=999999999999999999999999", t)
    assert(st == 400, body)
  }

  test("406 Not Acceptable: an Accept header admitting no json-compatible type") {
    val (st, _, _) = callH("GET", "/gauges/test/raw", t,
      headers = Map("Accept" -> "text/plain"))
    assert(st == 406)
    // …while json-compatible ranges all pass negotiation (the route
    // itself 204s — no data for this metric)
    for (accept <- Seq("application/json", "*/*", "application/*",
        "text/plain, application/json;q=0.5"))
      assert(callH("GET", "/gauges/test/raw", t,
        headers = Map("Accept" -> accept))._1 != 406, accept)
  }

  test("415 Unsupported Media Type: a body tagged text/plain is rejected " +
    "before parsing — even an empty one") {
    val (st, _, _) = callH("POST", "/gauges/test/raw", t, Some(""),
      headers = Map("Accept" -> "application/json"),
      contentType = Some("text/plain"))
    assert(st == 415)
  }
}
