package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.model._
import org.apache.spark.sql.SparkSession
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/**
 * A real HTTP transport over [[RestRoutes]] — the strap-on layer the
 * route table's scaladoc promises, with ZERO added dependencies: the
 * server is the JDK's `com.sun.net.httpserver` and the JSON codec is
 * the Jackson that Spark itself ships (`ObjectMapper` tree API for
 * request bodies, `DataFrame.toJSON` for responses).
 *
 * The reference's transport behaviors reproduced here (the parts the
 * transport-free table deliberately left out):
 *  - the `Hawkular-Tenant` header selects the tenant; requests to data
 *    routes without it answer 400 (TenantFilter semantics —
 *    api/metrics-api-jaxrs/.../filter/TenantFilter.java: tenant
 *    required except on /tenants and the status routes);
 *  - JSON bodies deserialize into the table's typed case classes with
 *    the reference's field names (`type`, `dataRetention`, `timestamp`/
 *    `value` datapoints, QueryRequest/StatsQuery shapes);
 *  - responses: 200 + JSON array for frames, 204 for writes, ApiError's
 *    `{"errorMsg": …}` shape for 4xx (ApiError.java), 500 on unexpected
 *    failure. (The reference distinguishes 201 Created; the table's
 *    Result ADT collapses write successes to NoContent → 204, though
 *    creation POSTs still carry the reference's Location header);
 *  - the CORS filter pair (Cors.scala) and, when an admin token is
 *    configured, the AdminFilter guard on /tenants + /admin routes;
 *  - JAX-RS content negotiation: 406 for non-json Accept, 415 for
 *    non-json request bodies (ErrorsITest).
 *
 * Result frames are collected ONLY here — the serialization boundary —
 * which is the same place the reference's Observable pipeline
 * materializes; everything upstream stays a lazy plan.
 *
 * One [[MetricsService]] is shared across tenants (tenant isolation is
 * the tenant_id column, exactly like the reference's single Cassandra
 * session); the per-tenant [[RestRoutes]] view is a throwaway wrapper
 * built per request.
 */
class HttpTransport(spark: SparkSession, storageRoot: String, port: Int = 0,
                    allowedCorsOrigins: String = "*",
                    extraCorsAllowHeaders: Option[String] = None,
                    adminToken: Option[String] = None,
                    cacheControl: Option[String] = None,
                    tierServing: Boolean = false) {
  import RestRoutes._
  import HttpTransport.AdminTokenHeader

  // `tierServing` answers hour-aligned, percentile-free stats requests
  // from the store's rollup tiers ([[MetricsService.TierLayout]] at the
  // conventional `<root>/tiers` layout — refreshed by maintenance via
  // [[MetricsService.refreshTiers]]); the per-request tenant scope is the
  // Hawkular-Tenant header's MetricId.tenantId, threaded into the tier
  // serve's partition-pruning tenant= param by the service dispatch
  private val svc = new MetricsService(spark, storageRoot,
    if (tierServing) Some(MetricsService.defaultTiers(storageRoot)) else None)
  // the reference stores the sha256 of the configured admin token and
  // compares hashes (AdminFilter.validAdminToken); None = the filter is
  // off entirely — a DOCUMENTED divergence from the reference, where an
  // unconfigured token locks every admin route behind a permanent 403
  private val adminTokenSha = adminToken.map(HttpTransport.sha256)
  private def adminGuarded(segs: List[String]): Boolean =
    adminTokenSha.isDefined && (segs match {
      case ("tenants" | "admin" | "openshift") :: _ => true
      case _ => false
    })
  // CORS filter pair (Cors.scala): predicate built once from config,
  // like the reference's @PostConstruct OriginValidation.init
  private val originAllowed = Cors.originPredicate(allowedCorsOrigins)
  private val corsAllowHeaders =
    (Cors.DefaultAllowHeaders +: extraCorsAllowHeaders.toSeq).mkString(",")
  // a RestRoutes view is a thin stateless wrapper — constructed per
  // request rather than cached per tenant, so a client sweeping random
  // Hawkular-Tenant header values cannot grow driver memory unboundedly
  private def routesFor(tenant: String): RestRoutes =
    new RestRoutes(spark, svc, tenant, () => state.get.wire)

  private val mapper = new ObjectMapper

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  // HttpServer does NOT own a caller-provided executor: stop() must shut
  // it down too, or every transport instance leaks 4 non-daemon threads
  // that keep the JVM alive after stop()
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
  server.setExecutor(pool)
  server.createContext("/", (exchange: HttpExchange) => handle(exchange))

  /** Bound port (useful when constructed with port = 0). */
  def boundPort: Int = server.getAddress.getPort

  // ---- service lifecycle (MetricsServiceLifecycle.java): the HTTP
  // container and the metrics service start/stop INDEPENDENTLY — the
  // reference binds the JAX-RS container first and initializes the
  // backend asynchronously, so there is a real window where requests
  // arrive against a not-yet-STARTED (or already-STOPPED) service and
  // the state filter answers 503/500 instead of routing.
  import HttpTransport.ServiceState
  private val state =
    new java.util.concurrent.atomic.AtomicReference[ServiceState](ServiceState.Starting)
  def serviceState: ServiceState = state.get

  /** Bind + serve while the service is still STARTING (the reference's
    * startup posture: web container up, backend initializing). */
  def bind(): HttpTransport = { server.start(); this }
  /** Backend initialization finished (startMetricsService's happy exit,
    * MetricsServiceLifecycle.java:395). */
  def markReady(): HttpTransport = { state.set(ServiceState.Started); this }
  /** Backend initialization failed (ibid:400-403) — the container keeps
    * serving, every data route answers 500 until restart. */
  def markFailed(): HttpTransport = { state.set(ServiceState.Failed); this }
  /** One-call form for callers without a separate init phase. */
  def start(): HttpTransport = bind().markReady()
  /** Stop the SERVICE but keep serving HTTP — the reference's
    * destroy path (ibid:678-695): data routes 503, /status keeps
    * answering with the STOPPED state. */
  def stopService(): Unit = state.set(ServiceState.Stopped)
  def stop(): Unit = { stopService(); server.stop(0); pool.shutdown() }

  // ------------------------------------------------------------------
  // request handling
  // ------------------------------------------------------------------

  private def handle(ex: HttpExchange): Unit =
    try {
      val method = ex.getRequestMethod.toUpperCase
      val path = ex.getRequestURI.getPath
      val params = queryParams(ex.getRequestURI.getRawQuery)
      // ---- CORS request filter: @PreMatching priority 0, so it runs
      // before routing, content negotiation AND the tenant filter
      // (CorsRequestFilter.java). Origin-less requests pass untouched.
      val origin = Option(ex.getRequestHeaders.getFirst(Cors.Origin)).filter(_.nonEmpty)
      origin match {
        case Some(o) if !originAllowed(o) =>
          // disallowed origin: 400 with an empty body — but the CORS
          // headers still ride along, echoing the REQUEST origin (the
          // reference's response filter adds them whenever Origin is
          // present, valid or not: CORSITest testBadOriginWithoutData
          // asserts the full header set on the 400 itself)
          corsHeaders(ex, o)
          ex.sendResponseHeaders(400, -1)
          return
        case Some(o) if method == "OPTIONS" =>
          // preflight: answered here, never reaches the router, needs
          // no tenant (CORSITest testOptionsWithoutTenantIDAndData)
          corsHeaders(ex, o)
          ex.sendResponseHeaders(200, -1)
          return
        case Some(o) => corsHeaders(ex, o) // actual request: headers ride along
        case None => ()
      }
      val segs = path.split("/").filter(_.nonEmpty).toList match {
        case "m" :: rest => "metrics" :: rest
        case s => s
      }
      // ---- tenant + admin filters: @PreMatching priorities 10 and 20
      // (TenantFilter.java, AdminFilter.java), so their 400/403s fire
      // BEFORE content negotiation's 406/415 — filters run pre-matching,
      // NotAcceptable/NotSupported are matching-time exceptions.
      // Blank/whitespace header values count as MISSING, matching the
      // reference's TenantFilter (tenant.trim().isEmpty() → 400).
      val tenantHeader = Option(ex.getRequestHeaders.getFirst("Hawkular-Tenant"))
        .filter(_.trim.nonEmpty)
      // exemptions = the reference TenantFilter set (root, /tenants,
      // /status) plus this table's extra tenant-less meta routes /ping
      // and /admin/status, which have no tenant axis by construction —
      // a DELIBERATE widening, not drift. With an admin token CONFIGURED,
      // the admin filter below re-imposes the reference's stricter rule
      // (tenant required on /tenants and /admin too, AdminFilter.java).
      val needsTenant = segs match {
        case Nil => false
        case "ping" :: _ | "status" :: _ | "admin" :: _ | "tenants" :: _ =>
          adminGuarded(segs)
        case _ => true
      }
      if (needsTenant && tenantHeader.isEmpty) {
        respond(ex, 400, errorJson("Tenant is not specified. Use 'Hawkular-Tenant' header."))
        return
      }
      if (adminGuarded(segs)) {
        val token = Option(ex.getRequestHeaders.getFirst(AdminTokenHeader))
          .filter(_.trim.nonEmpty)
        if (token.isEmpty) {
          respond(ex, 400, errorJson(
            s"Admin token is not specified. Use '$AdminTokenHeader' header"))
          return
        }
        if (!token.map(HttpTransport.sha256).equals(adminTokenSha)) {
          respond(ex, 403, errorJson("Admin token is wrong or not specified."))
          return
        }
      }
      // ---- service-state filter (MetricsServiceStateFilter.java:55-85):
      // no @Priority → default USER priority, so it runs AFTER the
      // CORS/tenant/admin pre-matching filters (0/10/20) and BEFORE the
      // matching-time 406/415s. "/" and /status stay reachable in every
      // state — the status page is how operators watch the service come
      // up (the reference exempts StatusHandler.PATH and
      // BaseHandler.PATH by prefix) — and so does this table's extra
      // /admin/status meta route, which exists to report that state
      // (still admin-token-guarded above when a token is configured).
      val stateExempt = segs.isEmpty || segs.head == "status" ||
        segs == List("admin", "status")
      if (!stateExempt) state.get match {
        case ServiceState.Started => ()
        case ServiceState.Starting =>
          respond(ex, 503, errorJson("Service unavailable while initializing."))
          return
        case ServiceState.Failed =>
          respond(ex, 500, errorJson("Internal server error."))
          return
        case ServiceState.Stopped =>
          respond(ex, 503, errorJson("The service is no longer running."))
          return
      }
      // ---- content negotiation (the JAX-RS container's, pinned by
      // ErrorsITest): every resource @Produces(APPLICATION_JSON) — an
      // Accept that admits no json-compatible type is 406 (:59-72);
      // every body-consuming resource @Consumes(APPLICATION_JSON) — a
      // body tagged with a different media type is 415 (:74-90).
      if (!acceptsJson(ex)) { respond(ex, 406, ""); return }
      if ((method == "POST" || method == "PUT") && !consumesJson(ex)) {
        respond(ex, 415, ""); return
      }
      {
        val raw = ex.getRequestBody.readAllBytes()
        val body: AnyRef =
          if (raw.isEmpty) null
          else parseBody(method, segs,
            try mapper.readTree(raw)
            catch { case e: com.fasterxml.jackson.core.JacksonException =>
              bad(s"malformed JSON body: ${e.getOriginalMessage}") })
        // tenant-less routes (meta + /tenants) dispatch through any view
        val result = routesFor(tenantHeader.getOrElse("_meta")).route(method, path, params, body)
        result match {
          case Ok(df) =>
            // the serialization boundary: WireCodec collects the
            // response-sized frame and reshapes it into the reference's
            // JSON surface. The reference maps EVERY empty collection/map
            // result to 204 No Content (ApiUtils.java:38-43) — an empty
            // 200 [] never leaves the server, hence the Option
            WireCodec.render(method, segs, df) match {
              case None => respond(ex, 204, "")
              case Some(body) => respond(ex, 200, body)
            }
          case NoContent =>
            // metric-creation POSTs carry a Location header pointing at
            // the created definition's TYPED path, like the reference's
            // 201 responses (CassandraBackendITest asserts
            // "http://base/{type-path}/{id}"); the success status stays
            // this transport's documented 204 collapse
            locationFor(method, segs, body).foreach(l =>
              ex.getResponseHeaders.set("Location", l))
            respond(ex, 204, "")
          case ApiError(status, message) => respond(ex, status, errorJson(message))
        }
      }
    } catch {
      case e: BadBodyException => respond(ex, 400, errorJson(e.getMessage))
      // body parsing runs the model grammars (MetricType/GDuration/
      // StatsRequest requires) BEFORE route() — map their bad-input
      // signal to 400 here exactly like the table does inside route()
      case e: IllegalArgumentException => respond(ex, 400, errorJson(String.valueOf(e.getMessage)))
      case e: Exception => respond(ex, 500, errorJson(String.valueOf(e.getMessage)))
    } finally ex.close()

  /** CORS response headers for an allowed origin (CorsResponseFilter):
    * echo the origin, allow credentials, advertise the method list, the
    * default + configured-extra request headers, and the 72 h preflight
    * cache (CORSITest.groovy:57-61). */
  private def corsHeaders(ex: HttpExchange, origin: String): Unit = {
    val h = ex.getResponseHeaders
    h.set(Cors.AllowOrigin, origin)
    h.set(Cors.AllowCredentials, "true")
    h.set(Cors.AllowMethods, Cors.DefaultAllowMethods)
    h.set(Cors.AllowHeaders, corsAllowHeaders)
    h.set(Cors.MaxAge, Cors.MaxAgeSeconds.toString)
  }

  /** An absent Accept header means "anything"; otherwise at least one
    * listed media range must admit application/json. */
  private def acceptsJson(ex: HttpExchange): Boolean =
    Option(ex.getRequestHeaders.getFirst("Accept")).forall { a =>
      a.split(",").map(_.split(";")(0).trim.toLowerCase).exists(t =>
        t == "*/*" || t == "application/*" || t == "application/json" || t.isEmpty)
    }

  /** An absent Content-Type defaults to json here (internal callers and
    * curl-style clients); a PRESENT one must be json — the reference's
    * @Consumes rejects a mistagged body with 415 regardless of content
    * (ErrorsITest posts an EMPTY text/plain body and still gets 415). */
  private def consumesJson(ex: HttpExchange): Boolean =
    Option(ex.getRequestHeaders.getFirst("Content-Type")).forall { ct =>
      val t = ct.split(";")(0).trim.toLowerCase
      t == "application/json" || t.isEmpty
    }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    // CacheControlFilter (BZ 1492011): when a cache-control value is
    // configured, EVERY response carries it plus the fixed Vary pair
    cacheControl.foreach { cc =>
      ex.getResponseHeaders.set("Cache-Control", cc)
      ex.getResponseHeaders.set("Vary", "Origin,Accept-Encoding")
    }
    // 204 must not carry a body; -1 means "no response body" to HttpServer
    ex.sendResponseHeaders(status, if (status == 204 || bytes.isEmpty) -1 else bytes.length)
    if (status != 204 && bytes.nonEmpty) {
      val os = ex.getResponseBody
      os.write(bytes); os.close()
    }
  }

  /** Location of a definition created by POST /{type-path} or the
    * untyped POST /metrics (which redirects to the TYPED path per the
    * body's `type`). Only creation shapes get one. */
  private def locationFor(method: String, segs: List[String],
                          body: AnyRef): Option[String] =
    if (method != "POST") None
    else (segs, body) match {
      case (t :: Nil, d: MetricDefinition) if TypeSeg.contains(t) =>
        Some(s"http://127.0.0.1:$boundPort/$t/${pathEnc(d.id)}")
      case ("metrics" :: Nil, d: MetricDefinition) =>
        d.mtype.flatMap(text => TypeSeg.collectFirst {
          case (seg, mt) if mt.text == text => seg
        }).map(seg => s"http://127.0.0.1:$boundPort/$seg/${pathEnc(d.id)}")
      case _ => None
    }

  private def pathEnc(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8).replace("+", "%20")

  private def errorJson(msg: String): String =
    "{\"errorMsg\":" + mapper.writeValueAsString(msg) + "}"

  private def queryParams(rawQuery: String): Map[String, String] =
    Option(rawQuery).filter(_.nonEmpty).map(_.split("&").toSeq).getOrElse(Seq.empty)
      .flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(dec(k) -> dec(v))
          case Array(k) => Some(dec(k) -> "")
          case _ => None
        }
      }
      // JAX-RS List<String> params repeat the key (metrics=G1&metrics=G2);
      // the route table splits on commas — merge repeats into one CSV so
      // both encodings work, like the reference container. Only the
      // genuinely list-typed params merge; for single-valued params a
      // repeated key takes the FIRST occurrence (JAX-RS @QueryParam rule —
      // ?start=1&start=2 must not become the unparseable "1,2").
      .groupBy(_._1).map { case (k, vs) =>
        k -> (if (ListParams(k)) vs.map(_._2).mkString(",") else vs.head._2)
      }
  /** Params the reference declares as JAX-RS List<String> (CSV-mergeable).
    * `percentiles` and `tags` are SINGLE-valued there (@QueryParam
    * Percentiles / String — only `metrics` is List<String>), so repeated
    * occurrences of those take the first value, not a CSV merge. */
  private val ListParams = Set("metrics")
  private def dec(s: String) = java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)

  // ------------------------------------------------------------------
  // JSON body → the route table's typed case classes
  // ------------------------------------------------------------------

  private final class BadBodyException(msg: String) extends RuntimeException(msg)
  private def bad(msg: String) = throw new BadBodyException(msg)

  private def opt(n: JsonNode, f: String): Option[JsonNode] =
    Option(n.get(f)).filterNot(_.isNull)
  private def optStr(n: JsonNode, f: String): Option[String] = opt(n, f).map(_.asText)
  // STRICT numeric/boolean reads — Jackson's asInt/asLong/asBoolean
  // coerce junk ("x" → 0) silently; the reference's databind path
  // answers 400 for a mistyped field, so these must too
  private def reqIntegral(n: JsonNode, what: String): Long =
    if (n.isIntegralNumber) n.asLong else bad(s"$what must be an integer, got $n")
  private def optInt(n: JsonNode, f: String): Option[Int] =
    opt(n, f).map(v => reqIntegral(v, f).toInt)
  private def boolF(n: JsonNode, f: String): Boolean = opt(n, f).exists { v =>
    if (v.isBoolean) v.asBoolean else bad(s"$f must be a boolean, got $v")
  }
  private def strMap(n: JsonNode): Map[String, String] =
    n.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap
  private def arr(n: JsonNode): Seq[JsonNode] =
    if (n.isArray) n.elements().asScala.toSeq else bad("expected a JSON array")

  /** JSON scalar → the Any the per-route value converters type-check
    * (integral → Long, decimal → Double, text → String, bool → Boolean). */
  private def scalar(n: JsonNode): Any =
    if (n.isIntegralNumber) n.asLong
    else if (n.isNumber) n.asDouble
    else if (n.isTextual) n.asText
    else if (n.isBoolean) n.asBoolean
    else bad(s"unsupported value $n")

  private def pointValue(n: JsonNode): PointValue =
    PointValue(
      opt(n, "timestamp").map(reqIntegral(_, "timestamp"))
        .getOrElse(bad("datapoint needs a timestamp")),
      scalar(opt(n, "value").getOrElse(bad("datapoint needs a value"))),
      opt(n, "tags").map(strMap).getOrElse(Map.empty))

  private def metricPoints(n: JsonNode): MetricPoints =
    MetricPoints(optStr(n, "id").getOrElse(bad("metric needs an id")),
      opt(n, "data").map(d => arr(d).map(pointValue)).getOrElse(Seq.empty))

  private def metricDefinition(n: JsonNode): MetricDefinition =
    MetricDefinition(
      optStr(n, "id").getOrElse(bad("metric definition needs an id")),
      opt(n, "tags").map(strMap).getOrElse(Map.empty),
      optInt(n, "dataRetention"),
      optStr(n, "type").orElse(optStr(n, "mtype")))

  private def rawQuery(n: JsonNode): RawQuery =
    RawQuery(
      opt(n, "ids").map(a => arr(a).map(_.asText)).getOrElse(Seq.empty),
      optStr(n, "tags"), optStr(n, "start"), optStr(n, "end"),
      optInt(n, "limit"), optStr(n, "order"), boolF(n, "fromEarliest"))

  private def aggStatsQuery(n: JsonNode): AggregatedStatsQuery =
    AggregatedStatsQuery(
      opt(n, "metrics").map(a => arr(a).map(_.asText)).getOrElse(Seq.empty),
      optStr(n, "tags"), optStr(n, "start"), optStr(n, "end"),
      optInt(n, "buckets"), optStr(n, "bucketDuration"),
      optStr(n, "percentiles"), boolF(n, "stacked"), boolF(n, "fromEarliest"),
      optStr(n, "percentileMode"))

  private def mixedStatsQuery(n: JsonNode): MixedStatsQuery =
    MixedStatsQuery(
      tags = optStr(n, "tags"),
      metrics = opt(n, "metrics").map(_.properties().asScala.map(e =>
        e.getKey -> arr(e.getValue).map(_.asText)).toMap).getOrElse(Map.empty),
      types = opt(n, "types").map(a => arr(a).map(_.asText)).getOrElse(Seq.empty),
      start = optStr(n, "start"), end = optStr(n, "end"),
      buckets = optInt(n, "buckets"),
      bucketDuration = optStr(n, "bucketDuration"),
      percentiles = optStr(n, "percentiles"))

  private def statsRequest(n: JsonNode, now: Long): svc.StatsRequest =
    svc.StatsRequest(
      MetricType.fromText(optStr(n, "type").getOrElse(bad("stats request needs a type"))),
      opt(n, "metrics").map(a => arr(a).map(_.asText)).getOrElse(Seq.empty),
      BucketConfig(TimeRange(optStr(n, "start"), optStr(n, "end"), now),
        optInt(n, "buckets"), optStr(n, "bucketDuration").map(GDuration.parse)),
      opt(n, "percentiles").map(a => arr(a).map(v =>
        if (v.isNumber) v.asDouble else bad(s"percentile must be a number, got $v")))
        .getOrElse(Seq.empty),
      boolF(n, "stacked"),
      optStr(n, "tags"))

  /** The (method, path-shape) → body-type table, mirroring the dispatch
    * cases in [[RestRoutes]]. Unknown shapes pass the parsed tree through
    * untouched — the route table answers its own 400/404 for those. */
  private def parseBody(method: String, segs: List[String], n: JsonNode): AnyRef = {
    val typed = Set("gauges", "counters", "availability", "strings")
    (method, segs) match {
      case ("POST", "tenants" :: Nil) =>
        TenantDefinition(optStr(n, "id").getOrElse(bad("tenant needs an id")),
          opt(n, "retentions").map(r =>
            r.properties().asScala
              .map(e => e.getKey -> reqIntegral(e.getValue, "retention").toInt).toMap)
            .getOrElse(Map.empty))
      case ("POST", t :: Nil) if typed(t) || t == "metrics" => metricDefinition(n)
      case ("PUT", t :: _ :: "tags" :: Nil) if typed(t) => strMap(n)
      case ("POST", t :: _ :: ("raw" | "data") :: Nil) if typed(t) =>
        arr(n).map(pointValue)
      case ("POST", t :: ("raw" | "data") :: Nil) if typed(t) =>
        arr(n).map(metricPoints)
      case ("POST", "metrics" :: ("raw" | "data") :: Nil) =>
        MixedMetricsBody(
          opt(n, "gauges").map(a => arr(a).map(metricPoints)).getOrElse(Seq.empty),
          opt(n, "counters").map(a => arr(a).map(metricPoints)).getOrElse(Seq.empty),
          opt(n, "availabilities").map(a => arr(a).map(metricPoints)).getOrElse(Seq.empty),
          opt(n, "strings").map(a => arr(a).map(metricPoints)).getOrElse(Seq.empty))
      case ("POST", t :: "raw" :: "query" :: Nil) if typed(t) => rawQuery(n)
      case ("POST", t :: "rate" :: "query" :: Nil) if typed(t) => rawQuery(n)
      case ("POST", t :: "stats" :: "query" :: Nil) if typed(t) => aggStatsQuery(n)
      case ("POST", "metrics" :: "stats" :: "query" :: Nil) =>
        mixedStatsQuery(n)
      case ("POST", "metrics" :: "stats" :: "batch" :: "query" :: Nil) =>
        // the reference body is an OBJECT keyed by caller-chosen names
        // (`Map<String, StatsQueryRequest>`, MetricHandler.java:321-338);
        // the ARRAY form stays as the index-keyed engine extension. ONE
        // `now` per request: defaulted ranges across the batch must
        // resolve against the same instant (the reference captures a
        // single now per request, not per element).
        val now = System.currentTimeMillis()
        if (n.isArray) arr(n).map(statsRequest(_, now))
        else if (n.isObject)
          n.properties().asScala.toSeq.map(e => e.getKey -> mixedStatsQuery(e.getValue))
        else bad("batch stats body must be an object of named stats queries")
      case _ => n
    }
  }
}

object HttpTransport {
  /** The reference's admin header (AdminFilter.ADMIN_TOKEN_HEADER_NAME). */
  val AdminTokenHeader = "Hawkular-Admin-Token"

  /** Service lifecycle states (MetricsServiceLifecycle.java:133-134).
    * The reference's transient STOPPING exists because its destroy is
    * asynchronous; this transport's service teardown is synchronous, so
    * stop lands on STOPPED directly — the state filter treats the two
    * identically anyway (same 503 + message,
    * MetricsServiceStateFilter.java:76-84). */
  sealed abstract class ServiceState(val wire: String)
  object ServiceState {
    case object Starting extends ServiceState("STARTING")
    case object Started extends ServiceState("STARTED")
    case object Stopped extends ServiceState("STOPPED")
    case object Failed extends ServiceState("FAILED")
  }

  private[api] def sha256(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
}
