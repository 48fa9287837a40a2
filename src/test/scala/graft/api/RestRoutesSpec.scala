package graft.api

import graft.SparkTestBase
import graft.model._
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** REST facade spec — the reference's Groovy REST-ITest invariants over
  * the transport-free route table (GaugeMetricStatisticsITest,
  * MetricsITest shapes). */
class RestRoutesSpec extends SparkTestBase {
  import RestRoutes._

  private def newRoutes(): RestRoutes = {
    val svc = new MetricsService(spark, Files.createTempDirectory("graft-rest").toString)
    new RestRoutes(spark, svc, "t1")
  }

  private def frame(r: Result): DataFrame = r match {
    case Ok(df) => df
    case other  => fail(s"expected Ok, got $other")
  }

  test("POST /gauges/stats/query and GET /gauges/stats run the same plan " +
    "(GaugeMetricStatisticsITest.groovy:304-323)") {
    val rest = newRoutes()
    rest.route("POST", "/gauges", body = MetricDefinition("m1", Map("type" -> "cpu_usage", "host" -> "server1")))
    rest.route("POST", "/gauges", body = MetricDefinition("m2", Map("type" -> "cpu_usage", "host" -> "server2")))
    rest.route("POST", "/gauges", body = MetricDefinition("m3", Map("type" -> "mem", "host" -> "server1")))
    assert(rest.route("POST", "/gauges/m1/raw",
      body = Seq(PointValue(100L, 37.45), PointValue(200L, 44.07))) == NoContent)
    assert(rest.route("POST", "/gauges/m2/raw",
      body = Seq(PointValue(150L, 36.94), PointValue(250L, 41.18))) == NoContent)
    assert(rest.route("POST", "/gauges/m3/raw",
      body = Seq(PointValue(150L, 99.0))) == NoContent)

    val params = Map("start" -> "100", "end" -> "300", "buckets" -> "1",
      "tags" -> "type:cpu_usage,host:server1|server2")
    val get = frame(rest.route("GET", "/gauges/stats", params)).collect()
    val post = frame(rest.route("POST", "/gauges/stats/query",
      body = AggregatedStatsQuery(tags = Some("type:cpu_usage,host:server1|server2"),
        start = Some("100"), end = Some("300"), buckets = Some(1)))).collect()
    assert(get.length == 1 && post.length == 1)
    assert(get.head == post.head, "POST and GET must give the same results")
    // the mem metric stays out of the tag selection
    assert(get.head.getAs[Long]("samples") == 4)
    assert(get.head.getAs[Double]("min") == 36.94 && get.head.getAs[Double]("max") == 44.07)

    // metrics-list variant of the same invariant
    val getIds = frame(rest.route("GET", "/gauges/stats",
      Map("start" -> "100", "end" -> "300", "buckets" -> "1", "metrics" -> "m1,m3"))).collect()
    val postIds = frame(rest.route("POST", "/gauges/stats/query",
      body = AggregatedStatsQuery(metrics = Seq("m1", "m3"),
        start = Some("100"), end = Some("300"), buckets = Some(1)))).collect()
    assert(getIds.head == postIds.head)
    assert(getIds.head.getAs[Double]("max") == 99.0)
  }

  test("per-metric stats routes: percentile echo, fromEarliest, tagged variant") {
    val rest = newRoutes()
    rest.route("POST", "/gauges", body = MetricDefinition("cpu", dataRetention = Some(10)))
    val day = 86400000L
    val now = 100 * day
    rest.route("POST", "/gauges/cpu/raw",
      body = (0 until 20).map(i => PointValue(now - 3 * day + i, i.toDouble)))
    // percentile echo: original request string becomes the column name
    val stats = frame(rest.route("GET", "/gauges/cpu/stats",
      Map("start" -> (now - 4 * day).toString, "end" -> now.toString,
        "buckets" -> "4", "percentiles" -> "99.000,90.0"), now = now))
    assert(stats.columns.contains("p99_000") && stats.columns.contains("p90_0"))
    // fromEarliest: retention-derived window, leading empties skipped
    val fe = frame(rest.route("GET", "/gauges/cpu/stats",
      Map("fromEarliest" -> "true", "buckets" -> "10"), now = now)).collect()
    assert(fe.nonEmpty && fe.head.getAs[Any]("samples") != null)
    assert(fe.length == 3, fe.length.toString) // buckets 7,8,9 of the 10d window
    // explicit bounds conflict with fromEarliest → 400
    rest.route("GET", "/gauges/cpu/stats",
      Map("fromEarliest" -> "true", "buckets" -> "10", "start" -> "0"), now = now) match {
      case ApiError(400, _) =>
      case other => fail(s"expected 400, got $other")
    }
    // tagged per-point stats route (per-point tags empty here → no rows,
    // but the route must dispatch, not 404)
    assert(rest.route("GET", "/gauges/cpu/stats/tags/dc:east",
      Map.empty, now = now).isInstanceOf[Ok])
  }

  test("tagged stats route honors start/end params and the default window") {
    val rest = newRoutes()
    val now = 1000000L
    rest.route("POST", "/gauges/tg/raw", body = Seq(
      PointValue(now - 100, 10.0, Map("dc" -> "east")),
      PointValue(now - 50, 20.0, Map("dc" -> "east")),
      // outside an explicit [now-80, now) window but inside the default 8h one
      PointValue(now - 200, 99.0, Map("dc" -> "east"))))
    val bounded = frame(rest.route("GET", "/gauges/tg/stats/tags/dc:east",
      Map("start" -> (now - 80).toString, "end" -> now.toString), now = now)).collect()
    assert(bounded.length == 1 && bounded.head.getAs[Long]("samples") == 1L,
      s"explicit start/end must clip the tagged window: ${bounded.mkString}")
    val defaulted = frame(rest.route("GET", "/gauges/tg/stats/tags/dc:east",
      Map.empty, now = now)).collect()
    assert(defaulted.length == 1 && defaulted.head.getAs[Long]("samples") == 3L,
      s"absent start/end must default to [now-8h, now): ${defaulted.mkString}")
  }

  test("raw fetch routes: order defaulting, limit, availability distinct") {
    val rest = newRoutes()
    rest.route("POST", "/gauges/g/raw",
      body = Seq(PointValue(1L, 1.0), PointValue(2L, 2.0), PointValue(3L, 3.0)))
    // limit + start without end → ASC (T3); both bounds → DESC
    val asc = frame(rest.route("GET", "/gauges/g/raw",
      Map("start" -> "0", "limit" -> "2"), now = 10L))
      .select("time").collect().map(_.getLong(0)).toSeq
    assert(asc == Seq(1L, 2L))
    val desc = frame(rest.route("GET", "/gauges/g/raw",
      Map("start" -> "0", "end" -> "10", "limit" -> "2"), now = 10L))
      .select("time").collect().map(_.getLong(0)).toSeq
    assert(desc == Seq(3L, 2L))
    // availability: state texts in, distinct-contiguous collapse via param
    rest.route("POST", "/availability/web/raw",
      body = Seq(PointValue(1L, "up"), PointValue(2L, "up"), PointValue(3L, "down")))
    val av = frame(rest.route("GET", "/availability/web/raw",
      Map("start" -> "0", "end" -> "10", "distinct" -> "true", "order" -> "ASC"), now = 10L))
      .select("time", "avail").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(av == Seq((1L, 0), (3L, 1)))
    // fromEarliest widens EVERY per-type raw route to the retention
    // window (StringHandler :321-343, AvailabilityHandler :420-452,
    // GaugeHandler :503-533 — GaugesITest fromEarliestQueryGaugeData)
    val day = 86400000L
    rest.route("POST", "/strings/st/raw",
      body = Seq(PointValue(2 * day, "old"), PointValue(9 * day + 1, "fresh")))
    val st = frame(rest.route("GET", "/strings/st/raw",
      Map("fromEarliest" -> "true"), now = 10 * day))
      .select("s_value").collect().map(_.getString(0)).toSet
    assert(st == Set("fresh"), st.toString) // 7d default window ends at now
    rest.route("POST", "/gauges/g/raw", body = Seq(PointValue(9 * day, 42.0)))
    val ge = frame(rest.route("GET", "/gauges/g/raw",
      Map("fromEarliest" -> "true", "order" -> "ASC"), now = 10 * day))
      .select("n_value").collect().map(_.getDouble(0)).toSeq
    assert(ge == Seq(42.0), ge.toString) // ts 1..3 fall outside the 7d window
    // explicit bounds still conflict with the flag
    rest.route("GET", "/gauges/g/raw",
      Map("fromEarliest" -> "true", "start" -> "0"), now = 10 * day) match {
      case ApiError(400, msg) => assert(msg.contains("without start"))
      case other => fail(s"expected 400, got $other")
    }
    // counter rate route
    rest.route("POST", "/counters/c/raw",
      body = Seq(PointValue(0L, 100L), PointValue(60000L, 160L)))
    val rate = frame(rest.route("GET", "/counters/c/rate", Map.empty, now = 70000L))
      .select("rate").collect().map(_.getDouble(0)).toSeq
    assert(rate == Seq(60.0))
  }

  test("periods route maps op+threshold to the W2 predicate") {
    val rest = newRoutes()
    rest.route("POST", "/gauges/g/raw",
      body = Seq(PointValue(1L, 9.0), PointValue(2L, 9.0), PointValue(5L, 1.0), PointValue(7L, 9.0)))
    val runs = frame(rest.route("GET", "/gauges/g/periods",
      Map("start" -> "0", "end" -> "10", "op" -> "gt", "threshold" -> "5.0"), now = 10L))
      .orderBy("period_start").collect()
      .map(r => (r.getAs[Long]("period_start"), r.getAs[Long]("period_end"))).toSeq
    assert(runs == Seq((1L, 2L), (7L, 7L)))
    rest.route("GET", "/gauges/g/periods",
      Map("op" -> "between", "threshold" -> "5.0"), now = 10L) match {
      case ApiError(400, msg) => assert(msg.contains("Invalid op"))
      case other => fail(s"expected 400, got $other")
    }
  }

  test("mixed stats POST carries virtual rate types and percentiles (EP2)") {
    val rest = newRoutes()
    rest.route("POST", "/gauges", body = MetricDefinition("cpu", Map("env" -> "prod")))
    rest.route("POST", "/counters", body = MetricDefinition("reqs", Map("env" -> "prod")))
    rest.route("POST", "/gauges/cpu/raw", body = Seq(PointValue(100L, 10.0), PointValue(150L, 30.0)))
    rest.route("POST", "/counters/reqs/raw", body = Seq(PointValue(100L, 100L), PointValue(150L, 160L)))
    val out = frame(rest.route("POST", "/metrics/stats/query",
      body = MixedStatsQuery(tags = Some("env = prod"),
        types = Seq("gauge", "counter", "counter_rate", "gauge_rate"),
        start = Some("100"), end = Some("200"), buckets = Some(1),
        percentiles = Some("90.0")), now = 200L))
    val branches = out.collect().map(_.getAs[String]("branch")).toSet
    assert(branches == Set("gauge", "gauge_rate", "counter", "counter_rate"))
    assert(out.columns.contains("p90_0"))
    // a requested type with no stats branches is rejected, not dropped
    rest.route("POST", "/metrics/stats/query",
      body = MixedStatsQuery(tags = Some("env = prod"), types = Seq("gauge", "string"),
        start = Some("100"), end = Some("200"), buckets = Some(1)), now = 200L) match {
      case ApiError(400, msg) => assert(msg.contains("string"))
      case other => fail(s"expected 400, got $other")
    }
    // an empty batch list answers 400, not an empty.reduce crash
    rest.route("POST", "/metrics/stats/batch/query", body = Seq.empty) match {
      case ApiError(400, _) =>
      case other => fail(s"expected 400, got $other")
    }
  }

  test("multi-metric ingest, raw/query body, /data alias, cross-type tag route") {
    val rest = newRoutes()
    rest.route("POST", "/gauges", body = MetricDefinition("a", Map("env" -> "prod")))
    rest.route("POST", "/gauges", body = MetricDefinition("b", Map("env" -> "dev")))
    // multi-metric ingest body (GaugeHandler addGaugeData)
    assert(rest.route("POST", "/gauges/raw", body = Seq(
      MetricPoints("a", Seq(PointValue(1L, 1.0), PointValue(2L, 2.0))),
      MetricPoints("b", Seq(PointValue(1L, 9.0))))) == NoContent)
    // raw/query by ids and by tags give the same NamedDataPoint rows
    val byIds = frame(rest.route("POST", "/gauges/raw/query",
      body = RawQuery(ids = Seq("a"), start = Some("0"), end = Some("10"),
        order = Some("ASC")), now = 10L))
      .select("metric", "time").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(byIds == Seq(("a", 1L), ("a", 2L)))
    val byTags = frame(rest.route("POST", "/gauges/raw/query",
      body = RawQuery(tags = Some("env = prod"), start = Some("0"), end = Some("10"),
        order = Some("ASC")), now = 10L))
      .select("metric", "time").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(byTags == byIds)
    // ids AND tags together → 400; neither → 400
    rest.route("POST", "/gauges/raw/query",
      body = RawQuery(ids = Seq("a"), tags = Some("env = prod"))) match {
      case ApiError(400, _) =>
      case other => fail(s"expected 400, got $other")
    }
    rest.route("POST", "/gauges/raw/query", body = RawQuery()) match {
      case ApiError(400, _) =>
      case other => fail(s"expected 400, got $other")
    }
    // deprecated /data: no bucket params → raw; bucket params → stats;
    // bucketed + limit → 400 (GaugeHandler.java:420-424)
    val rawAlias = frame(rest.route("GET", "/gauges/a/data",
      Map("start" -> "0", "end" -> "10", "order" -> "ASC"), now = 10L))
      .select("time").collect().map(_.getLong(0)).toSeq
    assert(rawAlias == Seq(1L, 2L))
    val statsAlias = frame(rest.route("GET", "/gauges/a/data",
      Map("start" -> "1", "end" -> "11", "buckets" -> "1"), now = 11L)).collect()
    assert(statsAlias.length == 1 && statsAlias.head.getAs[Long]("samples") == 2)
    rest.route("GET", "/gauges/a/data",
      Map("buckets" -> "1", "limit" -> "5"), now = 10L) match {
      case ApiError(400, msg) => assert(msg.contains("Limit and order"))
      case other => fail(s"expected 400, got $other")
    }
    // cross-type tag-VALUE discovery (getTagValues): (name, value) pairs
    // of the metric set matching every filter — NOT identifier search
    val vals = frame(rest.route("GET", "/metrics/tags/env:*"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(vals == Set(("env", "prod"), ("env", "dev")))
    val scoped = frame(rest.route("GET", "/metrics/tags/env:prod"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(scoped == Set(("env", "prod")))
    // identifier search lives on the collection GET's tags param
    val ids = frame(rest.route("GET", "/metrics", Map("tags" -> "env = prod")))
      .select("metric").collect().map(_.getString(0)).toSeq
    assert(ids == Seq("a"))
  }

  test("multi-metric rate stats collection (GET /counters/rate/stats)") {
    val rest = newRoutes()
    rest.route("POST", "/counters", body = MetricDefinition("c1", Map("env" -> "prod")))
    rest.route("POST", "/counters", body = MetricDefinition("c2", Map("env" -> "prod")))
    rest.route("POST", "/counters/c1/raw",
      body = Seq(PointValue(60000L, 100L), PointValue(120000L, 160L)))
    rest.route("POST", "/counters/c2/raw",
      body = Seq(PointValue(60000L, 10L), PointValue(120000L, 40L)))
    // pooled by tags: c1's rate 60/min and c2's 30/min share one bucket
    val pooled = frame(rest.route("GET", "/counters/rate/stats",
      Map("start" -> "60000", "end" -> "180000", "buckets" -> "1",
        "tags" -> "env:prod"), now = 180000L)).collect()
    assert(pooled.length == 1 && pooled.head.getAs[Long]("samples") == 2)
    assert(pooled.head.getAs[Double]("min") == 30.0)
    assert(pooled.head.getAs[Double]("max") == 60.0)
    // stacked by ids: statistics SUM across metrics, samples counts
    // contributing metrics (A4 over rates)
    val stacked = frame(rest.route("GET", "/counters/rate/stats",
      Map("start" -> "60000", "end" -> "180000", "buckets" -> "1",
        "metrics" -> "c1,c2", "stacked" -> "true"), now = 180000L)).collect()
    assert(stacked.head.getAs[Double]("sum") == 90.0)
    assert(stacked.head.getAs[Long]("samples") == 2)
    // metrics-or-tags is required here too
    rest.route("GET", "/counters/rate/stats", Map("buckets" -> "1"), now = 180000L) match {
      case ApiError(400, _) =>
      case other => fail(s"expected 400, got $other")
    }
    // fromEarliest derives the window from the selected metrics'
    // longest retention (7d default here), ending now=8d so the bucket
    // spine stays positive. The window bounds the FETCH before pairing,
    // so the stale epoch-time points contribute no gap-pair rate — each
    // metric yields exactly its fresh in-window pair (c1 60/min, c2 30)
    val day = 86400000L
    rest.route("POST", "/counters/c1/raw",
      body = Seq(PointValue(8 * day - 120000, 200L), PointValue(8 * day - 60000, 260L)))
    rest.route("POST", "/counters/c2/raw",
      body = Seq(PointValue(8 * day - 120000, 50L), PointValue(8 * day - 60000, 80L)))
    val fe = frame(rest.route("GET", "/counters/rate/stats",
      Map("tags" -> "env:prod", "fromEarliest" -> "true", "buckets" -> "1"),
      now = 8 * day)).collect()
    assert(fe.length == 1 && fe.head.getAs[Long]("samples") == 2, fe.mkString(","))
    assert(fe.head.getAs[Double]("min") == 30.0 && fe.head.getAs[Double]("max") == 60.0)
    rest.route("GET", "/counters/rate/stats",
      Map("tags" -> "env:prod", "fromEarliest" -> "true", "buckets" -> "1",
        "start" -> "0"), now = 8 * day) match {
      case ApiError(400, msg) => assert(msg.contains("without start"))
      case other => fail(s"expected 400, got $other")
    }
  }

  test("tenants and tag CRUD routes; unknown routes answer 404") {
    val rest = newRoutes()
    assert(rest.route("POST", "/tenants",
      body = TenantDefinition("t1", Map("gauge" -> 14))) == NoContent)
    assert(frame(rest.route("GET", "/tenants")).collect().head.getString(0) == "t1")
    // tenant create-conflict: re-POST without overwrite → 409
    // (TenantsHandler.java:90-91); overwrite replaces the retention map
    rest.route("POST", "/tenants", body = TenantDefinition("t1")) match {
      case ApiError(409, msg) => assert(msg.contains("already exists"))
      case other => fail(s"expected 409, got $other")
    }
    assert(rest.route("POST", "/tenants", Map("overwrite" -> "true"),
      body = TenantDefinition("t1", Map("gauge" -> 21))) == NoContent)
    // tenant delete removes the tenant row: it disappears from GET
    // /tenants and the id is creatable again without overwrite
    assert(rest.route("POST", "/tenants", body = TenantDefinition("t2")) == NoContent)
    assert(rest.route("DELETE", "/tenants/t2") == NoContent)
    assert(!frame(rest.route("GET", "/tenants")).collect().map(_.getString(0)).contains("t2"))
    assert(rest.route("POST", "/tenants", body = TenantDefinition("t2")) == NoContent)
    rest.route("POST", "/gauges", body = MetricDefinition("m", Map("a" -> "1")))
    assert(rest.route("PUT", "/gauges/m/tags", body = Map("b" -> "2")) == NoContent)
    assert(rest.route("DELETE", "/gauges/m/tags/a") == NoContent)
    val tags = frame(rest.route("GET", "/gauges/m/tags")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(tags == Map("b" -> "2"))
    // per-type tag-value discovery (getTagValues semantics)
    val vals = frame(rest.route("GET", "/gauges/tags/b:2")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(vals == Set(("b", "2")))
    // tag-NAME discovery with a filter pattern (GET /metrics/tags)
    val names = frame(rest.route("GET", "/metrics/tags", Map("filter" -> "b")))
      .collect().map(_.getString(0)).toSet
    assert(names == Set("b"))
    rest.route("GET", "/nonsense") match {
      case ApiError(404, _) =>
      case other => fail(s"expected 404, got $other")
    }
    // create-conflict semantics: re-POST without overwrite → 409;
    // with ?overwrite=true → accepted (MetricHandler.java:126-149)
    rest.route("POST", "/gauges", body = MetricDefinition("m")) match {
      case ApiError(409, msg) => assert(msg.contains("already exists"))
      case other => fail(s"expected 409, got $other")
    }
    assert(rest.route("POST", "/gauges", Map("overwrite" -> "true"),
      body = MetricDefinition("m", Map("c" -> "3"))) == NoContent)
    // cross-type create carries the type in the body; non-user types 400
    assert(rest.route("POST", "/metrics",
      body = MetricDefinition("cm", mtype = Some("counter"))) == NoContent)
    rest.route("POST", "/metrics",
      body = MetricDefinition("x", mtype = Some("counter_rate"))) match {
      case ApiError(400, _) =>
      case other => fail(s"expected 400, got $other")
    }
    // collection GET: plain definitions by default, tags filter applies,
    // timestamps=true enriches with data min/max
    assert(frame(rest.route("GET", "/gauges", Map("tags" -> "c:3")))
      .select("metric").collect().map(_.getString(0)).toSeq == Seq("m"))
    val enriched = frame(rest.route("GET", "/gauges", Map("timestamps" -> "true")))
    assert(enriched.columns.contains("min_time") && enriched.columns.contains("max_time"))
    assert(!frame(rest.route("GET", "/gauges")).columns.contains("min_time"))
    // buckets and bucketDuration together → 400 (BucketConfig XOR rule)
    rest.route("GET", "/gauges/m/stats",
      Map("buckets" -> "4", "bucketDuration" -> "1d")) match {
      case ApiError(400, _) =>
      case other => fail(s"expected 400, got $other")
    }
    // metrics and tags together → 400 (metrics-or-tags union)
    rest.route("GET", "/gauges/stats",
      Map("buckets" -> "1", "metrics" -> "m", "tags" -> "a:1")) match {
      case ApiError(400, _) =>
      case other => fail(s"expected 400, got $other")
    }
  }

  test("rate/query, tags-raw, mixed ingest, id filter, ranged rate routes") {
    val rest = newRoutes()
    val day = 86400000L
    val now = 100 * day
    rest.route("POST", "/counters", body = MetricDefinition("c1", Map("env" -> "prod")))
    rest.route("POST", "/counters",
      body = MetricDefinition("c2", Map("env" -> "prod"), dataRetention = Some(14)))
    // mixed-type ingest: one POST /metrics/raw body carries every type
    assert(rest.route("POST", "/metrics/raw", body = MixedMetricsBody(
      gauges = Seq(MetricPoints("g1", Seq(PointValue(now - day, 5.0)))),
      counters = Seq(
        MetricPoints("c1", Seq(PointValue(now - 120000, 100L), PointValue(now - 60000, 160L))),
        MetricPoints("c2", Seq(PointValue(now - 120000, 10L), PointValue(now - 60000, 40L)))),
      strings = Seq(MetricPoints("s1", Seq(PointValue(now - day, "hello")))))) == NoContent)
    rest.route("POST", "/metrics/raw", body = MixedMetricsBody()) match {
      case ApiError(400, msg) => assert(msg.contains("empty"))
      case other => fail(s"expected 400, got $other")
    }
    // rate/query by tags (POST) ≡ by ids (GET with body) — 60/min + 30/min
    val byTags = frame(rest.route("POST", "/counters/rate/query",
      body = RawQuery(tags = Some("env:prod"), start = Some((now - 180000).toString),
        order = Some("ASC")), now = now))
      .select("metric", "rate").collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(byTags == Set(("c1", 60.0), ("c2", 30.0)))
    val byIds = frame(rest.route("GET", "/counters/rate/query",
      body = RawQuery(ids = Seq("c1", "c2"), start = Some((now - 180000).toString),
        order = Some("ASC")), now = now))
      .select("metric", "rate").collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(byIds == byTags)
    // cross-metric fromEarliest: the window spans the LONGEST retention
    // among the selected metrics (c2's 14d override > the 7d default)
    val fe = frame(rest.route("POST", "/counters/raw/query",
      body = RawQuery(tags = Some("env:prod"), fromEarliest = true), now = now))
    assert(fe.select("metric").distinct().count() == 2)
    rest.route("POST", "/counters/raw/query",
      body = RawQuery(ids = Seq("c1"), start = Some("0"), fromEarliest = true), now = now) match {
      case ApiError(400, msg) => assert(msg.contains("without start"))
      case other => fail(s"expected 400, got $other")
    }
    // tag-selected raw GET — ALL four types carry it (CounterHandler
    // .java:881-913 has the counter route too; CountersITest.groovy:2210)
    val tagRaw = frame(rest.route("GET", "/gauges/tags/env:*/raw",
      Map("start" -> "0", "order" -> "ASC"), now = now))
    assert(tagRaw.count() == 0) // g1 has no tags → not selected
    val ctrTagRaw = frame(rest.route("GET", "/counters/tags/env:prod/raw",
      Map.empty, now = now))
    // c1 + c2 both carry env:prod, two in-window points each
    assert(ctrTagRaw.count() == 4)
    // ranged per-metric rate: only the pair inside [now-90s, now] derives
    val ranged = frame(rest.route("GET", "/counters/c1/rate",
      Map("start" -> (now - 90000).toString), now = now))
    assert(ranged.count() == 0) // window holds ONE point → no pair
    val full = frame(rest.route("GET", "/counters/c1/rate",
      Map("start" -> (now - 180000).toString), now = now))
      .select("rate").collect().map(_.getDouble(0)).toSeq
    assert(full == Seq(60.0))
    // deprecated bucket params on /{id}/rate dispatch to rate stats;
    // combining them with limit/order answers 400
    val bucketed = frame(rest.route("GET", "/counters/c1/rate",
      Map("start" -> (now - 180000).toString, "end" -> now.toString,
        "buckets" -> "1"), now = now)).collect()
    assert(bucketed.length == 1 && bucketed.head.getAs[Double]("max") == 60.0)
    rest.route("GET", "/counters/c1/rate",
      Map("buckets" -> "1", "limit" -> "3"), now = now) match {
      case ApiError(400, msg) => assert(msg.contains("Limit and order"))
      case other => fail(s"expected 400, got $other")
    }
    // id param on the collection GET: exact |-list needs a type; with
    // tags filtering it is a filter pattern instead
    val exact = frame(rest.route("GET", "/metrics",
      Map("type" -> "counter", "id" -> "c1|c2")))
      .select("metric").collect().map(_.getString(0)).toSet
    assert(exact == Set("c1", "c2"))
    rest.route("GET", "/metrics", Map("id" -> "c1")) match {
      case ApiError(400, msg) => assert(msg.contains("type"))
      case other => fail(s"expected 400, got $other")
    }
    // a virtual rate type as the type param answers 400, not empty —
    // on definition listings AND the tag-discovery routes
    rest.route("GET", "/metrics", Map("type" -> "counter_rate")) match {
      case ApiError(400, msg) => assert(msg.contains("Incorrect type"))
      case other => fail(s"expected 400, got $other")
    }
    rest.route("GET", "/metrics/tags", Map("type" -> "gauge_rate")) match {
      case ApiError(400, msg) => assert(msg.contains("Incorrect type"))
      case other => fail(s"expected 400, got $other")
    }
    // a FALSE-valued unsupported flag is a no-op, not a divergence — OK
    assert(rest.route("GET", "/counters/c1/rate",
      Map("fromEarliest" -> "false", "start" -> (now - 180000).toString),
      now = now).isInstanceOf[Ok])
    val patterned = frame(rest.route("GET", "/metrics",
      Map("tags" -> "env:prod", "id" -> "c.*")))
      .select("metric").collect().map(_.getString(0)).toSet
    assert(patterned == Set("c1", "c2"))
    // collection /data aliases: GET ≡ stats, POST ≡ multi-metric raw
    val dataAlias = frame(rest.route("GET", "/counters/data",
      Map("start" -> (now - 180000).toString, "end" -> now.toString,
        "buckets" -> "1", "metrics" -> "c1,c2"), now = now)).collect()
    assert(dataAlias.length == 1 && dataAlias.head.getAs[Long]("samples") == 4)
    assert(rest.route("POST", "/counters/data", body = Seq(
      MetricPoints("c3", Seq(PointValue(now - 60000, 7L))))) == NoContent)
    assert(rest.route("POST", "/counters/c3/data",
      body = Seq(PointValue(now - 30000, 9L))) == NoContent)
    val c3 = frame(rest.route("GET", "/counters/c3/raw",
      Map("start" -> "0", "order" -> "ASC"), now = now))
      .select("l_value").collect().map(_.getLong(0)).toSeq
    assert(c3 == Seq(7L, 9L))
    // multi-metric fromEarliest stats: the window spans c2's 14d override
    val feStats = frame(rest.route("GET", "/counters/stats",
      Map("tags" -> "env:prod", "fromEarliest" -> "true", "buckets" -> "14"),
      now = now)).collect()
    assert(feStats.map(_.getAs[Long]("samples")).sum == 4)
    // unsupported params answer 400, never silently ignored
    rest.route("GET", "/counters/c1/rate",
      Map("fromEarliest" -> "true"), now = now) match {
      case ApiError(400, msg) => assert(msg.contains("not supported"))
      case other => fail(s"expected 400, got $other")
    }
    rest.route("GET", "/gauges/tags/env:*/raw",
      Map("distinct" -> "true"), now = now) match {
      case ApiError(400, msg) => assert(msg.contains("per-metric"))
      case other => fail(s"expected 400, got $other")
    }
    // delete removes the catalog row too — a deleted id is creatable
    // again WITHOUT overwrite (MetricsServiceImpl.java:1086-1101 deletes
    // from the metrics/tags/retention indexes alongside the data)
    assert(rest.route("POST", "/counters", body = MetricDefinition("c3")) == NoContent)
    assert(rest.route("DELETE", "/counters/c3") == NoContent)
    assert(rest.route("POST", "/counters", body = MetricDefinition("c3")) == NoContent)
  }

  test("allowedMethods covers every dispatchable route (405-table drift guard)") {
    val rest = newRoutes()
    // one probe per dispatch case — a route added to dispatch but not to
    // the shape table would flip its wrong-method answers from 405 to
    // 404 silently; this list must grow with the route table
    val routes = Seq(
      ("GET", "/"), ("GET", "/ping"), ("GET", "/status"), ("GET", "/admin/status"),
      ("GET", "/tenants"), ("POST", "/tenants"), ("DELETE", "/tenants/x"),
      ("GET", "/metrics"), ("GET", "/metrics/tags"), ("GET", "/metrics/tags/a:1"),
      ("POST", "/metrics"), ("POST", "/metrics/raw"), ("POST", "/metrics/data"),
      ("POST", "/metrics/stats/query"), ("POST", "/metrics/stats/batch/query"),
      ("GET", "/gauges"), ("POST", "/gauges"), ("GET", "/gauges/id"),
      ("DELETE", "/gauges/id"), ("GET", "/gauges/id/tags"), ("PUT", "/gauges/id/tags"),
      ("DELETE", "/gauges/id/tags/a"), ("POST", "/gauges/id/raw"), ("GET", "/gauges/id/raw"),
      ("GET", "/gauges/id/data"), ("POST", "/gauges/id/data"),
      ("POST", "/gauges/raw"), ("POST", "/gauges/data"), ("POST", "/gauges/raw/query"),
      ("GET", "/gauges/rate/query"), ("POST", "/gauges/rate/query"),
      ("GET", "/gauges/rate/stats"), ("GET", "/gauges/stats"),
      ("POST", "/gauges/stats/query"), ("GET", "/gauges/id/stats"),
      ("GET", "/gauges/id/stats/tags/a:1"), ("GET", "/gauges/id/periods"),
      ("GET", "/gauges/id/rate"), ("GET", "/gauges/id/rate/stats"),
      ("GET", "/gauges/tags/a:1"), ("GET", "/gauges/tags/a:1/raw"),
      ("GET", "/counters/id/rate"), ("GET", "/counters/rate/stats"),
      ("GET", "/availability/id/raw"), ("POST", "/availability/id/raw"),
      ("GET", "/availability/tags/a:1/raw"), ("GET", "/strings/id/raw"))
    routes.foreach { case (m, p) =>
      val segs = p.split("/").filter(_.nonEmpty).toList
      assert(rest.allowedMethods(segs).contains(m),
        s"$m $p dispatches but is missing from allowedMethods")
    }
  }

  test("errors + aliases: 405 vs 404, /m dual path, meta routes, " +
    "empty payload, per-point tags (ErrorsITest, MetricsITest dualPathTest)") {
    val rest = newRoutes()
    // known path + wrong method → 405 (ErrorsITest.groovy:37-42);
    // unknown path → 404 (:44-49)
    rest.route("POST", "/gauges/test/tags") match {
      case ApiError(405, msg) => assert(msg.contains("GET") && msg.contains("PUT"))
      case other => fail(s"expected 405, got $other")
    }
    rest.route("GET", "/gaugesssss/test/raw") match {
      case ApiError(404, _) =>
      case other => fail(s"expected 404, got $other")
    }
    rest.route("DELETE", "/gauges/stats/query") match {
      case ApiError(405, _) =>
      case other => fail(s"expected 405, got $other")
    }
    // literal-wins: a one-segment literal route word never falls back to
    // the {id} template — DELETE /gauges/stats must NOT delete a metric
    // named "stats" (it is 405 in the JAX-RS container), and GET on the
    // POST-only ingest literal is 405 too
    rest.route("DELETE", "/gauges/stats") match {
      case ApiError(405, msg) => assert(msg.contains("GET"))
      case other => fail(s"expected 405, got $other")
    }
    rest.route("GET", "/gauges/raw") match {
      case ApiError(405, msg) => assert(msg.contains("POST"))
      case other => fail(s"expected 405, got $other")
    }
    // /m ≡ /metrics on every MetricHandler route (dual-path alias)
    rest.route("POST", "/gauges", body = MetricDefinition("g1", Map("a" -> "1")))
    val viaMetrics = frame(rest.route("GET", "/metrics")).collect()
    val viaM = frame(rest.route("GET", "/m")).collect()
    assert(viaMetrics.length == 1 && viaM.length == 1)
    assert(viaMetrics.head == viaM.head)
    // meta routes: ping echoes injectable now; status/base answer rows
    val ping = frame(rest.route("GET", "/ping", now = 0L)).collect()
    assert(ping.length == 1 && ping.head.getString(1).nonEmpty)
    // Date(0) renders in the JVM default zone — assert only that the
    // injectable `now` drives the answer (same text for the same now)
    assert(frame(rest.route("GET", "/ping", now = 0L)).collect()
      .head.getString(1) == ping.head.getString(1))
    assert(frame(rest.route("GET", "/status")).collect().nonEmpty)
    assert(frame(rest.route("GET", "/")).collect().nonEmpty)
    assert(frame(rest.route("GET", "/admin/status")).collect().nonEmpty)
    // empty point list ≡ empty body → 400 (GaugesITest
    // shouldNotAddDataForMetricWithEmptyPayload)
    rest.route("POST", "/gauges/g1/raw", body = Seq.empty[PointValue]) match {
      case ApiError(400, msg) => assert(msg.contains("empty"))
      case other => fail(s"expected 400, got $other")
    }
    // tag-NAME grammar on DELETE (TagNamesConverter: empty tokens,
    // blank names, >1 colon → 400; ':value' parts are discarded)
    rest.route("PUT", "/gauges/g1/tags", body = Map("a" -> "1", "b" -> "2"))
    rest.route("DELETE", "/gauges/g1/tags/,") match {
      case ApiError(400, msg) => assert(msg.contains("Invalid tag list"))
      case other => fail(s"expected 400, got $other")
    }
    rest.route("DELETE", "/gauges/g1/tags/:5") match {
      case ApiError(400, _) =>
      case other => fail(s"expected 400, got $other")
    }
    assert(rest.route("DELETE", "/gauges/g1/tags/a:ignored") == NoContent)
    val remaining = frame(rest.route("GET", "/gauges/g1/tags")).collect()
    assert(remaining.length == 1 && remaining.head.getString(0) == "b")
    // blank tag names/values on PUT → 400 (TagsITest
    // shouldNotAcceptMissingOrInvalidTags)
    rest.route("PUT", "/gauges/g1/tags", body = Map("" -> "test")) match {
      case ApiError(400, msg) => assert(msg.contains("Invalid tags"))
      case other => fail(s"expected 400, got $other")
    }
    // gauge rate carries fromEarliest, counter rate does not; the
    // deprecated bucket params are counter-only (GaugeHandler.java:
    // 775-804 vs CounterHandler.java:569-638)
    val day2 = 86400000L
    rest.route("POST", "/gauges/g1/raw", body = Seq(
      PointValue(9 * day2, 10.0), PointValue(9 * day2 + 60000, 70.0)))
    val gr = frame(rest.route("GET", "/gauges/g1/rate",
      Map("fromEarliest" -> "true"), now = 10 * day2)).collect()
    assert(gr.length == 1 && gr.head.getAs[Double]("rate") == 60.0)
    rest.route("GET", "/gauges/g1/rate", Map("buckets" -> "2"), now = 10 * day2) match {
      case ApiError(400, msg) => assert(msg.contains("no bucket params"))
      case other => fail(s"expected 400, got $other")
    }
    // rate/stats carries fromEarliest on both numeric handlers, with
    // leading empty buckets dropped
    val grs = frame(rest.route("GET", "/gauges/g1/rate/stats",
      Map("fromEarliest" -> "true", "bucketDuration" -> s"${day2}ms"),
      now = 10 * day2)).collect()
    assert(grs.length == 1, grs.length.toString) // 6 leading empties skipped
    // deprecated /data: fromEarliest needs bucket params
    rest.route("GET", "/gauges/g1/data",
      Map("fromEarliest" -> "true"), now = 10 * day2) match {
      case ApiError(400, msg) => assert(msg.contains("bucketed results"))
      case other => fail(s"expected 400, got $other")
    }
    // body type conflicting with the path type → 400; matching is fine
    // (CassandraBackendITest testCreateTypeChecking)
    rest.route("POST", "/gauges",
      body = MetricDefinition("N1", mtype = Some("availability"))) match {
      case ApiError(400, msg) => assert(msg.contains("does not match"))
      case other => fail(s"expected 400, got $other")
    }
    assert(rest.route("POST", "/counters",
      body = MetricDefinition("N1", mtype = Some("counter"))) == NoContent)
    // per-point tags round-trip through ingest → raw fetch
    // (AvailabilityITest.groovy addTaggedDataPoints)
    rest.route("POST", "/availability/a1/raw", body = Seq(
      PointValue(100L, "up", Map("x" -> "1", "y" -> "2")),
      PointValue(200L, "down", Map("y" -> "3", "z" -> "5")),
      PointValue(300L, "up", Map("x" -> "4", "z" -> "6"))))
    val pts = frame(rest.route("GET", "/availability/a1/raw",
      Map("start" -> "0", "end" -> "1000"), now = 1000L))
      .select("time", "tags").collect()
      .map(r => r.getLong(0) -> r.getMap[String, String](1)).toMap
    assert(pts(100L) == Map("x" -> "1", "y" -> "2"))
    assert(pts(200L) == Map("y" -> "3", "z" -> "5"))
    assert(pts(300L) == Map("x" -> "4", "z" -> "6"))
  }
}
