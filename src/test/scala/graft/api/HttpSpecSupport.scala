package graft.api

import graft.SparkTestBase
import java.io.{ByteArrayOutputStream, InputStream}
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Shared harness for specs that drive the real [[HttpTransport]] over
  * sockets: one transport per suite, plus the plain-HttpURLConnection
  * `call` helper the Groovy REST-ITest ports use. */
trait HttpSpecSupport extends org.scalatest.BeforeAndAfterAll { this: SparkTestBase =>

  protected var transport: HttpTransport = _
  protected def base = s"http://127.0.0.1:${transport.boundPort}"

  /** Suites pin CORS behavior by overriding these — mirroring the
    * reference test deployment's javaOpts (rest-tests-jaxrs/pom.xml:
    * 216-217 sets allowed-cors-origins + extra allow headers). */
  protected def allowedCorsOrigins: String = "*"
  protected def extraCorsAllowHeaders: Option[String] = None

  /** Overridable so lifecycle suites can bind() without markReady(). */
  protected def makeTransport(): HttpTransport =
    new HttpTransport(spark,
      Files.createTempDirectory("graft-http").toString,
      allowedCorsOrigins = allowedCorsOrigins,
      extraCorsAllowHeaders = extraCorsAllowHeaders).start()

  override def beforeAll(): Unit = {
    super.beforeAll()
    transport = makeTransport()
  }

  override def afterAll(): Unit = {
    if (transport != null) transport.stop()
    super.afterAll()
  }

  protected def call(method: String, path: String, tenant: Option[String] = None,
                     body: Option[String] = None): (Int, String) = {
    val (status, text, _) = callH(method, path, tenant, body)
    (status, text)
  }

  /** Like `call`, but with arbitrary extra request headers and the
    * response headers returned — what the CORS / content-negotiation
    * ports assert on. Pass `contentType = None` to suppress the default
    * json tag on a body (the 415 tests need a mistagged body). */
  protected def callH(method: String, path: String, tenant: Option[String] = None,
                      body: Option[String] = None,
                      headers: Map[String, String] = Map.empty,
                      contentType: Option[String] = Some("application/json"))
  : (Int, String, Map[String, String]) = {
    val conn = URI.create(base + path).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    tenant.foreach(t => conn.setRequestProperty("Hawkular-Tenant", t))
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    body.foreach { b =>
      conn.setDoOutput(true)
      contentType.foreach(ct => conn.setRequestProperty("Content-Type", ct))
      conn.getOutputStream.write(b.getBytes(StandardCharsets.UTF_8))
    }
    val status = conn.getResponseCode
    def drain(in: InputStream): String =
      if (in == null) ""
      else {
        val bos = new ByteArrayOutputStream()
        in.transferTo(bos); in.close()
        new String(bos.toByteArray, StandardCharsets.UTF_8)
      }
    val text = drain(if (status >= 400) conn.getErrorStream else conn.getInputStream)
    // header names are case-insensitive on the wire (and the JDK server
    // title-cases them) — return them lower-cased for stable lookups
    val respHeaders = {
      import scala.jdk.CollectionConverters._
      conn.getHeaderFields.asScala.collect {
        case (k, vs) if k != null && !vs.isEmpty => k.toLowerCase -> vs.get(0)
      }.toMap
    }
    (status, text, respHeaders)
  }
}
