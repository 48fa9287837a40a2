package graft.api

import java.net.URI

/**
 * The reference container's CORS filter pair, re-expressed for the JDK
 * HttpServer transport. The reference wires two JAX-RS providers —
 * `CorsRequestFilter` (@PreMatching, priority 0: runs before routing
 * AND before the tenant filter) and `CorsResponseFilter`
 * (api/metrics-api-jaxrs/.../filter/CorsRequestFilter.java,
 * CorsResponseFilter.java) — around an origin predicate built from the
 * `hawkular.metrics.allowed-cors-origins` config (default `*`,
 * ConfigurationKey.java:30) plus extra allow-list headers from
 * `allowed-cors-access-control-allow-headers` (default none, :31).
 *
 * Behavior pinned by CORSITest.groovy:
 *  - a request WITHOUT an Origin header is untouched;
 *  - any request with a DISALLOWED Origin answers 400 with an empty
 *    body (testOptionsWithBadOrigin — `*` as a request origin is never
 *    a valid origin value); the CORS headers still ride along echoing
 *    the request origin, because the reference's response filter adds
 *    them whenever Origin is present at all (testBadOriginWithoutData
 *    asserts the full header set on the 400);
 *  - an OPTIONS request with an allowed Origin is a PREFLIGHT: 200,
 *    empty body, CORS headers, and it never reaches the router — so
 *    it needs no tenant header even on data routes
 *    (testOptionsWithoutTenantIDAndData);
 *  - non-preflight responses to allowed origins carry the same CORS
 *    headers (testGetWithAllowedOrigin);
 *  - allowed-origin matching is exact OR any-subdomain: scheme, port
 *    and registered host must match, or the request host must end
 *    with "." + an allowed host (testOptionsWithSubdomainOrigin).
 *
 * The header names/values the reference inherits from its filter
 * library are declared here as this transport's own constants: allowed
 * methods list, default allowed request headers (the tenant header
 * must be in it or browsers would strip it), and the 72 h preflight
 * cache the test pins (`(72 * 60 * 60) + ""`, CORSITest.groovy:61).
 */
object Cors {
  val Origin = "Origin"
  val AllowOrigin = "Access-Control-Allow-Origin"
  val AllowMethods = "Access-Control-Allow-Methods"
  val AllowHeaders = "Access-Control-Allow-Headers"
  val AllowCredentials = "Access-Control-Allow-Credentials"
  val MaxAge = "Access-Control-Max-Age"

  val DefaultAllowMethods = "GET, POST, PUT, DELETE, OPTIONS, HEAD"
  val DefaultAllowHeaders = "origin,accept,content-type,hawkular-tenant"
  val MaxAgeSeconds: Long = 72L * 60 * 60

  /** `*`, or a comma-separated allow-list of origins ("scheme://host[:port]"). */
  def originPredicate(allowedCorsOrigins: String): String => Boolean = {
    val conf = allowedCorsOrigins.trim
    if (conf == "*") _ => true
    else {
      val allowed = conf.split(",").map(_.trim).filter(_.nonEmpty).flatMap { o =>
        try {
          val u = URI.create(o)
          if (u.getScheme == null || u.getHost == null) None
          else Some((u.getScheme, u.getHost, effectivePort(u)))
        } catch { case _: IllegalArgumentException => None }
      }.toSeq
      origin =>
        try {
          val u = URI.create(origin)
          u.getScheme != null && u.getHost != null && allowed.exists {
            case (scheme, host, port) =>
              scheme == u.getScheme && port == effectivePort(u) &&
                (host == u.getHost || u.getHost.endsWith("." + host))
          }
        } catch { case _: IllegalArgumentException => false }
    }
  }

  private def effectivePort(u: URI): Int =
    if (u.getPort != -1) u.getPort
    else if (u.getScheme == "https") 443
    else 80
}
