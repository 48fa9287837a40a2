package graft.api

import graft.SparkTestBase

/**
 * The HTTP layer end-to-end over real sockets: the Groovy REST-ITest
 * shapes (tenant header, JSON bodies with the reference field names,
 * status codes, POST ≡ GET) driven with plain HttpURLConnection against
 * the JDK HttpServer transport.
 */
class HttpTransportSpec extends SparkTestBase with HttpSpecSupport {

  test("liveness routes answer without a tenant header; data routes 400 without it") {
    val (ping, _) = call("GET", "/ping")
    assert(ping == 200)
    val (noTenant, msg) = call("GET", "/gauges/g1/raw")
    assert(noTenant == 400 && msg.contains("Hawkular-Tenant"))
    // blank/whitespace header ≡ missing (reference TenantFilter trims)
    val (blank, blankMsg) = call("GET", "/gauges/g1/raw", Some("   "))
    assert(blank == 400 && blankMsg.contains("Hawkular-Tenant"))
  }

  test("full lifecycle over HTTP: create tenant + metric, 409 on duplicate, " +
    "ingest raw JSON, fetch raw, POST stats/query ≡ GET stats") {
    assert(call("POST", "/tenants",
      body = Some("""{"id":"t-http","retentions":{"gauge":30}}"""))._1 == 204)
    assert(call("POST", "/gauges", Some("t-http"),
      Some("""{"id":"g1","tags":{"type":"cpu"},"dataRetention":14}"""))._1 == 204)
    // non-overwrite duplicate create → 409 (MetricCreatedObserver mapping)
    val (dup, dupMsg) = call("POST", "/gauges", Some("t-http"),
      Some("""{"id":"g1"}"""))
    assert(dup == 409 && dupMsg.contains("errorMsg"))

    assert(call("POST", "/gauges/g1/raw", Some("t-http"),
      Some("""[{"timestamp":100,"value":37.45},{"timestamp":200,"value":44.07},
              |{"timestamp":250,"value":41.0}]""".stripMargin))._1 == 204)

    val (st, rows) = call("GET", "/gauges/g1/raw?start=100&end=300&order=ASC", Some("t-http"))
    assert(st == 200)
    // reference DataPoint wire shape: {timestamp, value}, ASC as requested
    assert(rows.startsWith("""[{"timestamp":100,"value":37.45}"""), rows)
    assert(rows.split("\\},\\{").length == 3)

    // POST ≡ GET over the real wire (GaugeMetricStatisticsITest:304-323)
    val (gs, getStats) = call("GET",
      "/gauges/stats?metrics=g1&start=100&end=300&buckets=1", Some("t-http"))
    val (ps, postStats) = call("POST", "/gauges/stats/query", Some("t-http"),
      Some("""{"metrics":["g1"],"start":"100","end":"300","buckets":1}"""))
    assert(gs == 200 && ps == 200)
    assert(getStats == postStats, "POST body and GET params must serialize identically")
    assert(getStats.contains("\"samples\":3"))
  }

  test("tenant isolation rides the header: the same path answers per-tenant data") {
    assert(call("POST", "/gauges/iso/raw", Some("tenant-a"),
      Some("""[{"timestamp":10,"value":1.0}]"""))._1 == 204)
    assert(call("POST", "/gauges/iso/raw", Some("tenant-b"),
      Some("""[{"timestamp":10,"value":2.0}]"""))._1 == 204)
    val (_, a) = call("GET", "/gauges/iso/raw?start=0&end=100", Some("tenant-a"))
    val (_, b) = call("GET", "/gauges/iso/raw?start=0&end=100", Some("tenant-b"))
    assert(a.contains("1.0") && !a.contains("2.0"))
    assert(b.contains("2.0") && !b.contains("1.0"))
  }

  test("error mapping over the wire: 404 unknown route, 405 wrong method, " +
    "400 bad param and bad body") {
    assert(call("GET", "/nonsense", Some("t-http"))._1 == 404)
    assert(call("DELETE", "/gauges/stats", Some("t-http"))._1 == 405)
    val (badParam, m1) = call("GET", "/gauges/g1/raw?start=not-a-time", Some("t-http"))
    assert(badParam == 400 && m1.contains("errorMsg"))
    val (badBody, m2) = call("POST", "/gauges/g1/raw", Some("t-http"),
      Some("""[{"timestamp":100}]""")) // value missing
    assert(badBody == 400 && m2.contains("value"))
    val (malformed, m3) = call("POST", "/gauges/g1/raw", Some("t-http"),
      Some("""[{"timestamp":100""")) // truncated JSON
    assert(malformed == 400 && m3.contains("malformed"))
    // STRICT coercion: a mistyped numeric field is 400, never a silent 0
    val (mistyped, m4) = call("POST", "/gauges/g1/raw", Some("t-http"),
      Some("""[{"timestamp":"not-a-time","value":1.0}]"""))
    assert(mistyped == 400 && m4.contains("integer"))
    val (badBuckets, m5) = call("POST", "/gauges/stats/query", Some("t-http"),
      Some("""{"metrics":["g1"],"start":"1","end":"300","buckets":"x"}"""))
    assert(badBuckets == 400 && m5.contains("integer"))
  }

  test("mixed-type stats query + stats batch over the wire: the EP2 body " +
    "shapes (types list with virtual rate types; per-request ids-or-tags) " +
    "parse and answer rows; bad batch bodies 400") {
    val t = Some("t-ep2")
    assert(call("POST", "/gauges", t, Some("""{"id":"g1","tags":{"type":"cpu"}}"""))._1 == 204)
    assert(call("POST", "/gauges/g1/raw", t,
      Some("""[{"timestamp":100,"value":10.0},{"timestamp":200,"value":30.0}]"""))._1 == 204)
    assert(call("POST", "/counters", t, Some("""{"id":"c1","tags":{"type":"cpu"}}"""))._1 == 204)
    assert(call("POST", "/counters/c1/raw", t,
      Some("""[{"timestamp":100,"value":5},{"timestamp":200,"value":9}]"""))._1 == 204)
    val (ms, mixed) = call("POST", "/metrics/stats/query", t,
      Some("""{"tags":"type = cpu","types":["gauge","counter"],
              |"start":"1","end":"300","buckets":1}""".stripMargin))
    assert(ms == 200, s"mixed stats failed: $mixed")
    assert(mixed.contains("\"gauge\"") && mixed.contains("\"counter\""))
    val (bs, batch) = call("POST", "/metrics/stats/batch/query", t,
      Some("""[{"type":"gauge","metrics":["g1"],"start":"1","end":"300","buckets":1,
              | "percentiles":[90.0]},
              |{"type":"counter","metrics":["c1"],"start":"1","end":"300","buckets":1}]""".stripMargin))
    assert(bs == 200, s"stats batch failed: $batch")
    assert(batch.contains("\"samples\":2"))
    // a batch request with BOTH ids and tags violates the XOR contract →
    // the model grammar's IllegalArgument maps to 400 at the parse layer
    val (badBatch, bm) = call("POST", "/metrics/stats/batch/query", t,
      Some("""[{"type":"gauge","metrics":["g1"],"tags":"type = cpu",
              | "start":"1","end":"300","buckets":1}]""".stripMargin))
    assert(badBatch == 400 && bm.contains("errorMsg"))
  }

  test("mixed-type ingest + counter rate fetch over HTTP") {
    assert(call("POST", "/metrics/raw", Some("t-mixed"),
      Some("""{"gauges":[{"id":"mg","data":[{"timestamp":100,"value":5.5}]}],
              |"counters":[{"id":"mc","data":[{"timestamp":100,"value":7},
              |                              {"timestamp":200,"value":9}]}]}""".stripMargin))._1 == 204)
    val (gs, g) = call("GET", "/gauges/mg/raw?start=0&end=300", Some("t-mixed"))
    assert(gs == 200 && g.contains("5.5"))
    val (cs, c) = call("GET", "/counters/mc/raw?start=0&end=300&order=ASC", Some("t-mixed"))
    // counter values stay integral on the wire (NamedDataPointObserver
    // writes Long for COUNTER) — "value":7, never 7.0
    assert(cs == 200 && c == """[{"timestamp":100,"value":7},{"timestamp":200,"value":9}]""", c)
  }

  test("repeated query params: list-typed keys merge JAX-RS style, " +
    "single-valued keys take the first occurrence") {
    val t = Some("t-repeat")
    assert(call("POST", "/metrics/raw", t,
      Some("""{"gauges":[{"id":"r1","data":[{"timestamp":100,"value":1.0}]},
              |          {"id":"r2","data":[{"timestamp":100,"value":3.0}]}]}""".stripMargin))._1 == 204)
    // metrics is List<String> in the reference handlers: repeats merge
    val (rs, repeated) = call("GET",
      "/gauges/stats?metrics=r1&metrics=r2&start=50&end=200&buckets=1", t)
    val (cs2, csv) = call("GET",
      "/gauges/stats?metrics=r1,r2&start=50&end=200&buckets=1", t)
    assert(rs == 200 && cs2 == 200)
    assert(repeated == csv, "repeated metrics= must equal the CSV encoding")
    assert(repeated.contains("\"samples\":2"))
    // start is single-valued @QueryParam: first occurrence wins, never "0,999"
    val (ss, single) = call("GET",
      "/gauges/r1/raw?start=0&start=999&end=200", t)
    assert(ss == 200 && single.contains("\"timestamp\":100"))
  }
}
