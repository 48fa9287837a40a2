package graft.api

import graft.SparkTestBase
import graft.model._
import graft.storage.GraftStorage
import org.apache.spark.sql.functions._
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import java.nio.file.Files

/**
 * Tier-serving over live HTTP: a transport started with `tierServing`
 * answers hour-aligned, percentile-free stats requests from the store's
 * rollup tiers — the reference's own GET /{type}s/{id}/stats surface
 * (GaugeHandler.java:533-569) accelerated by the engine's serving
 * tiers. Pins the two halves of the contract:
 *
 *  - EXACTNESS: every served field equals the raw-path transport's
 *    answer for the same request (same store, no layout); availability
 *    responses are byte-identical, numeric ones identical after
 *    removing `median` — the one field the sums tier cannot reproduce
 *    (documented omission, [[MetricsService.TierLayout]]).
 *  - DISPATCH: misaligned or percentile-carrying requests keep the
 *    full raw answer (median included) on the SAME tiered transport.
 *
 * The plan-level "raw never read" pin lives in MetricsServiceSpec
 * (explain output is not observable through HTTP).
 */
class TierServingHttpITest extends SparkTestBase with HttpSpecSupport {

  private var root: String = _

  override protected def makeTransport(): HttpTransport = {
    root = Files.createTempDirectory("graft-http-tier").toString
    new HttpTransport(spark, root, tierServing = true).start()
  }

  private val mapper = new ObjectMapper()
  private val H = GraftStorage.RollupMs

  private def ingestAndRefresh(): Unit = {
    val svc = new MetricsService(spark, root, Some(MetricsService.defaultTiers(root)))
    val s = spark
    import s.implicits._
    svc.addDataPoints(canonicalPoints(
      Seq((H + 100L, 1.0), (H + 200L, 3.0), (2 * H + 100L, 10.0))
        .toDF("time", "n_value").withColumn("metric", lit("g")),
      MetricType.Gauge))
    svc.addDataPoints(canonicalPoints(
      Seq((H + 100L, 10L), (H + 2000L, 40L), (2 * H + 500L, 130L))
        .toDF("time", "l_value").withColumn("metric", lit("c")),
      MetricType.Counter))
    svc.addDataPoints(canonicalPoints(
      Seq((H + 100L, 0), (H + 2000L, 1), (2 * H + 500L, 0))
        .toDF("time", "avail").withColumn("metric", lit("av")),
      MetricType.Availability))
    svc.refreshTiers()
  }

  /** The same request against a NO-layout transport on the same store —
    * the raw-path oracle. */
  private def rawAnswer(path: String): (Int, String) = {
    val plainT = new HttpTransport(spark, root).start()
    try {
      val conn = java.net.URI.create(
        s"http://127.0.0.1:${plainT.boundPort}$path").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestProperty("Hawkular-Tenant", "t1")
      val status = conn.getResponseCode
      val in = if (status >= 400) conn.getErrorStream else conn.getInputStream
      val text = if (in == null) "" else {
        val bos = new java.io.ByteArrayOutputStream()
        in.transferTo(bos); in.close()
        new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      }
      (status, text)
    } finally plainT.stop()
  }

  private def stripMedian(json: String): ArrayNode = {
    val a = mapper.readTree(json).asInstanceOf[ArrayNode]
    a.forEach {
      case o: ObjectNode => o.remove("median"); ()
      case _ => ()
    }
    a
  }

  test("aligned stats answer from the tiers, equal to the raw path " +
    "(modulo the documented median omission); misaligned and percentile " +
    "requests keep the full raw answer") {
    ingestAndRefresh()
    val aligned = s"start=$H&end=${4 * H}&buckets=3" // step = 1h
    // gauge: 5 served stats equal; tier response has NO median key
    val (gs, gBody) = call("GET", s"/gauges/g/stats?$aligned", Some("t1"))
    assert(gs == 200, gBody)
    val gPoints = mapper.readTree(gBody).asInstanceOf[ArrayNode]
    gPoints.forEach(p => assert(!p.has("median"),
      s"tier-served gauge point must omit median: $p"))
    assert(gPoints.toString.contains("\"min\""))
    val (grs, gRaw) = rawAnswer(s"/gauges/g/stats?$aligned")
    assert(grs == 200)
    assert(mapper.readTree(gRaw).asInstanceOf[ArrayNode].toString
      .contains("\"median\""), "raw path must still serve median")
    assert(gPoints == stripMedian(gRaw),
      s"tier-served gauge stats must equal the raw path minus median:\n$gBody\n$gRaw")
    // counter values: same posture
    val (cs, cBody) = call("GET", s"/counters/c/stats?$aligned", Some("t1"))
    assert(cs == 200, cBody)
    val (_, cRaw) = rawAnswer(s"/counters/c/stats?$aligned")
    assert(mapper.readTree(cBody) == stripMedian(cRaw))
    // availability: byte-identical (the tier shape is complete)
    val (as_, aBody) = call("GET", s"/availability/av/stats?$aligned", Some("t1"))
    assert(as_ == 200, aBody)
    val (_, aRaw) = rawAnswer(s"/availability/av/stats?$aligned")
    assert(mapper.readTree(aBody) == mapper.readTree(aRaw),
      s"tier-served availability stats must be identical:\n$aBody\n$aRaw")
    // counter rate stats: 5 served stats equal, median omitted
    val (rs, rBody) = call("GET", s"/counters/c/rate/stats?$aligned", Some("t1"))
    assert(rs == 200, rBody)
    val (_, rRaw) = rawAnswer(s"/counters/c/rate/stats?$aligned")
    assert(mapper.readTree(rBody) == stripMedian(rRaw))
    // misaligned grid on the SAME tiered transport: full raw answer
    val mis = s"start=$H&end=${4 * H}&buckets=5"
    val (ms, mBody) = call("GET", s"/gauges/g/stats?$mis", Some("t1"))
    assert(ms == 200 && mBody.contains("\"median\""),
      s"misaligned stats must carry the raw path's median: $mBody")
    val (_, mRaw) = rawAnswer(s"/gauges/g/stats?$mis")
    assert(mapper.readTree(mBody) == mapper.readTree(mRaw))
    // percentile request on the aligned grid: raw path, percentiles served
    val (ps, pBody) = call("GET",
      s"/gauges/g/stats?$aligned&percentiles=90.0", Some("t1"))
    assert(ps == 200 && pBody.contains("\"percentiles\"") &&
      pBody.contains("\"median\""), pBody)
  }

  test("engine-extension params over live HTTP: percentileMode=tier answers " +
    "aligned percentile requests median-free from the histogram tier pair " +
    "(estimate in band of the exact raw answer); tagSource=metric serves a " +
    "catalog-matching filter from the sums tier and answers 204 when " +
    "unmatched; both defaults unchanged") {
    val svc = new MetricsService(spark, root,
      Some(MetricsService.TierLayout(s"$root/tiers",
        histEdges = Some((0.0, 100.0, 20)))))
    svc.createMetric(MetricId("t1", MetricType.Gauge.code, "g2"),
      Map("dc" -> "east"))
    val s = spark
    import s.implicits._
    svc.addDataPoints(canonicalPoints(
      (1 to 40).map(i => (H + i * 60000L, i.toDouble))
        .toDF("time", "n_value").withColumn("metric", lit("g2")),
      MetricType.Gauge))
    svc.refreshTiers()
    val aligned = s"start=$H&end=${3 * H}&buckets=2"
    // percentileMode=tier: percentiles attached, median ABSENT (the tier
    // signature — a silent raw regression would carry median)
    val (ts, tBody) = call("GET",
      s"/gauges/g2/stats?$aligned&percentiles=90&percentileMode=tier", Some("t1"))
    assert(ts == 200 && tBody.contains("\"percentiles\"") &&
      !tBody.contains("\"median\""), tBody)
    // estimate within the accuracy band of the exact raw answer
    val (_, exBody) = call("GET",
      s"/gauges/g2/stats?$aligned&percentiles=90", Some("t1"))
    def p90s(json: String): Seq[Double] = {
      val a = mapper.readTree(json).asInstanceOf[ArrayNode]
      (0 until a.size).flatMap { i =>
        val p = a.get(i)
        if (p.has("percentiles")) Some(p.get("percentiles").get(0)
          .get("value").asDouble) else None
      }
    }
    val (est, exact) = (p90s(tBody), p90s(exBody))
    assert(est.size == exact.size && est.nonEmpty)
    est.zip(exact).foreach { case (e, x) =>
      assert(math.abs(e - x) <= 10.0, s"estimate $e out of band of exact $x")
    }
    // the five stats are bit-equal between the two modes
    def fives(json: String) = {
      val a = mapper.readTree(json).asInstanceOf[ArrayNode]
      (0 until a.size).map { i =>
        val o = a.get(i).asInstanceOf[ObjectNode].deepCopy()
        o.remove("median"); o.remove("percentiles"); o
      }
    }
    assert(fives(tBody) == fives(exBody))
    // tagSource=metric: catalog-matching filter → tier-served stats keyed
    // by the catalog value; median absent
    val (gs1, gB1) = call("GET",
      s"/gauges/g2/stats/tags/dc:east?start=$H&end=${3 * H}&tagSource=metric",
      Some("t1"))
    assert(gs1 == 200, gB1)
    val node = mapper.readTree(gB1).get("dc:east")
    assert(node != null && node.get("samples").asLong == 40L &&
      !node.has("median"), gB1)
    // unmatched filter → 204 (empty result)
    val (gs2, _) = call("GET",
      s"/gauges/g2/stats/tags/dc:west?start=$H&end=${3 * H}&tagSource=metric",
      Some("t1"))
    assert(gs2 == 204)
    // DEFAULT tagSource: per-point grouping — these points carry no
    // per-point dc tag, so the reference-shaped route answers 204
    val (gs3, _) = call("GET",
      s"/gauges/g2/stats/tags/dc:east?start=$H&end=${3 * H}", Some("t1"))
    assert(gs3 == 204)
    // bad param value → 400
    val (gs4, _) = call("GET",
      s"/gauges/g2/stats/tags/dc:east?tagSource=bogus", Some("t1"))
    assert(gs4 == 400)
  }
}
