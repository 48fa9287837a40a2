package graft.api

import graft.SparkTestBase
import java.nio.file.Files

/**
 * Port of the reference's CacheControlFilter behavior (BZ 1492011,
 * api/metrics-api-jaxrs/.../filter/CacheControlFilter.java): when the
 * `hawkular.metrics.cache-control-header` value is CONFIGURED, every
 * response — data, meta, and error alike — carries
 * `Cache-Control: <value>` plus `Vary: Origin,Accept-Encoding`; when
 * unconfigured, neither header appears.
 */
class CacheControlHttpITest extends SparkTestBase
    with org.scalatest.BeforeAndAfterAll {

  private var withCc: HttpTransport = _
  private var withoutCc: HttpTransport = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    withCc = new HttpTransport(spark,
      Files.createTempDirectory("graft-cc-http").toString,
      cacheControl = Some("no-cache, no-store, must-revalidate")).start()
    withoutCc = new HttpTransport(spark,
      Files.createTempDirectory("graft-nocc-http").toString).start()
  }

  override def afterAll(): Unit = {
    if (withCc != null) withCc.stop()
    if (withoutCc != null) withoutCc.stop()
    super.afterAll()
  }

  private def headers(port: Int, path: String,
                      tenant: Option[String]): (Int, Map[String, String]) = {
    val conn = java.net.URI.create(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    tenant.foreach(t => conn.setRequestProperty("Hawkular-Tenant", t))
    val st = conn.getResponseCode
    import scala.jdk.CollectionConverters._
    // the JDK server normalizes header casing (Cache-control) — compare
    // case-insensitively, as HTTP requires
    val hs = conn.getHeaderFields.asScala.collect {
      case (k, vs) if k != null => k.toLowerCase -> vs.asScala.mkString(",")
    }.toMap
    (st, hs)
  }

  test("configured cache-control rides every response class") {
    for ((path, t, expSt) <- Seq(
        ("/status", None, 200),                       // meta 200
        ("/gauges/missing/raw", Some("t-cc"), 204),    // empty 204
        ("/gauges/missing/raw?start=5&end=1", Some("t-cc"), 400))) { // error
      val (st, hs) = headers(withCc.boundPort, path, t)
      assert(st == expSt, s"$path: $st")
      assert(hs.get("cache-control").contains("no-cache, no-store, must-revalidate"),
        s"$path headers: $hs")
      assert(hs.get("vary").contains("Origin,Accept-Encoding"), s"$path headers: $hs")
    }
  }

  test("unconfigured transport sends neither header") {
    val (st, hs) = headers(withoutCc.boundPort, "/status", None)
    assert(st == 200)
    assert(!hs.contains("cache-control") && !hs.contains("vary"), hs.toString)
  }
}
