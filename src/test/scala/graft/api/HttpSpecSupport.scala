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

  override def beforeAll(): Unit = {
    super.beforeAll()
    transport = new HttpTransport(spark,
      Files.createTempDirectory("graft-http").toString).start()
  }

  override def afterAll(): Unit = {
    if (transport != null) transport.stop()
    super.afterAll()
  }

  protected def call(method: String, path: String, tenant: Option[String] = None,
                     body: Option[String] = None): (Int, String) = {
    val conn = URI.create(base + path).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    tenant.foreach(t => conn.setRequestProperty("Hawkular-Tenant", t))
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
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
    (status, text)
  }
}
