package graft.api

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.model.{AvailabilityType, MetricType}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import scala.jdk.CollectionConverters._

/**
 * Reference wire-format codec — the transport-side reshaping that makes
 * HTTP responses byte-compatible with the reference's JSON surface, so
 * a client written against the reference container parses ours
 * unchanged. The route table keeps answering the engine's frames (the
 * oracle-facing shape); ONLY the serialization boundary reshapes, in
 * the same place the reference's Observable observers materialize:
 *
 *  - datapoints: `{timestamp, value, tags?}` with the value typed per
 *    metric family — double for gauges/rates, long for counters, the
 *    availability TEXT code, the raw string for string metrics
 *    (NamedDataPointObserver.java:66-81; DataPoint field names);
 *  - multi-metric fetches nest per metric: `[{id, data: [...]}]` in
 *    first-arrival order (NamedDataPointObserver.java:84-120);
 *  - definitions: `{tenantId, id, type, dataRetention, tags?}` with the
 *    reference's 7-day default when unset (Metric.java:49-70 JSON
 *    properties; single-def GETs answer ONE object, not an array —
 *    GaugeHandler.java:176-189);
 *  - metric tags / tag values answer JSON OBJECTS (maps), tag names a
 *    string array (MetricHandler.java:151-187, GaugeHandler getTags);
 *  - periods: `[[start, end], ...]` (long pairs);
 *  - meta routes (root/ping/status) answer flat objects;
 *  - bucketed stats: BucketPoint shape (start/end/empty, index-ordered,
 *    null stats omitted on empty buckets) — HttpTransport.wireShape.
 *
 * Dispatch is (method, path) driven with SCHEMA guards, so a path that
 * resolves to a different frame family (e.g. the deprecated /data alias
 * serving bucketed stats) falls through to the right shape. Unmatched
 * responses serialize as the engine frame — a deliberate escape hatch
 * for the engine-extension routes the reference has no analog for.
 */
private[api] object WireCodec {

  private val mapper = new ObjectMapper()
  private val TypeSegs = Set("gauges", "counters", "availability", "strings", "metrics")
  // the route table's literal one-segment words that can sit where an
  // {id} template would (RestRoutes.ReservedOneSeg — kept in sync by
  // RestRoutesSpec's 405-table drift guard)
  private val ReservedId = Set("raw", "data", "stats")
  private val DefaultRetentionDays = 7 // reference MetricsServiceImpl.java:193-194

  /** Render the response body for a 200, or None for 204 No Content. */
  def render(method: String, segs: List[String], df: DataFrame): Option[String] = {
    val cols = df.columns.toSet
    def isDp = cols.contains("time") &&
      Seq("n_value", "l_value", "avail", "s_value", "rate").exists(cols.contains)
    def isDef = cols.contains("metric") && cols.contains("tags") &&
      cols.contains("data_retention")

    (method, segs) match {
      case ("GET", t :: id :: ("raw" | "data" | "rate") :: Nil)
          if TypeSegs(t) && !ReservedId(id) && isDp =>
        rows(df).map(dpList(_, flat = true))
      case ("POST", t :: "raw" :: "query" :: Nil) if TypeSegs(t) && isDp =>
        rows(df).map(dpList(_, flat = false))
      case ("GET" | "POST", t :: "rate" :: "query" :: Nil) if TypeSegs(t) && isDp =>
        rows(df).map(dpList(_, flat = false))
      case ("GET", t :: "tags" :: _ :: "raw" :: Nil) if TypeSegs(t) && isDp =>
        rows(df).map(dpList(_, flat = false))
      case ("GET", t :: id :: Nil)
          if TypeSegs(t) && t != "metrics" &&
            !ReservedId(id) && isDef =>
        rows(df).map(rs => defNode(rs.head).toString) // single object
      case ("GET", t :: Nil) if TypeSegs(t) && isDef =>
        rows(df).map(rs => arr(rs.map(defNode)).toString)
      // cross-tenant scan: Metric JSON with tenantId present on every
      // element (OpenshiftServlet.serializeMetrics streams Metric.java
      // serialization, which includes the tenant when set)
      case ("GET", "openshift" :: Nil) if isDef =>
        rows(df).map(rs => arr(rs.map(defNode)).toString)
      case ("GET", t :: id :: "tags" :: Nil)
          // id != "tags": /{type}/tags/tags is tag-VALUE discovery for the
          // literal tag name "tags" (the route table's literal-wins rule,
          // RestRoutes one-segment precedence) — it must render the
          // {name: [values]} discovery shape below, not this per-metric map
          if TypeSegs(t) && t != "metrics" && id != "tags" &&
            cols == Set("tname", "tvalue") =>
        rows(df).map(rs => obj(rs.sortBy(_.get("tname").asText())
          .map(r => r.get("tname").asText() -> r.get("tvalue"))).toString)
      case ("GET", t :: "tags" :: _ :: Nil)
          if TypeSegs(t) && cols == Set("tname", "tvalue") =>
        // tag-value discovery: {name: [values...]}, values sorted
        rows(df).map { rs =>
          val out = mapper.createObjectNode()
          rs.groupBy(_.get("tname").asText()).toSeq.sortBy(_._1).foreach {
            case (name, vs) =>
              val a = out.putArray(name)
              vs.map(_.get("tvalue").asText()).sorted.foreach(a.add)
          }
          out.toString
        }
      case ("GET", "metrics" :: "tags" :: Nil) if cols == Set("tname") =>
        rows(df).map { rs =>
          val a = mapper.createArrayNode()
          rs.map(_.get("tname").asText()).sorted.foreach(a.add)
          a.toString
        }
      case ("GET", "gauges" :: _ :: "periods" :: Nil)
          if cols.contains("period_start") && cols.contains("period_end") =>
        rows(df).map { rs =>
          val a = mapper.createArrayNode()
          rs.sortBy(_.get("period_start").asLong()).foreach { r =>
            val pair = a.addArray()
            pair.add(r.get("period_start").asLong())
            pair.add(r.get("period_end").asLong())
          }
          a.toString
        }
      // ---- bucketed stats in reference BucketPoint JSON ----------------
      // single-metric and multi-metric (pooled/stacked) stats, rate stats,
      // and the POST ≡ GET aggregated query: a flat index-ordered list of
      // BucketPoints (NumericBucketPoint / AvailabilityBucketPoint fields,
      // percentiles as the reference's {quantile, value, originalQuantile}
      // array — omitted when none requested, WRITE_EMPTY_JSON_ARRAYS=false)
      case ("GET", t :: id :: "stats" :: Nil)
          if TypeSegs(t) && !ReservedId(id) && cols.contains("bucket_start") =>
        rows(df).map(rs => arr(rs.sortBy(_.get("bucket_start").asLong())
          .map(bucketPointNode(_, avail = t == "availability"))).toString)
      case ("GET" | "POST", t :: "stats" :: rest)
          if TypeSegs(t) && (rest == Nil || rest == List("query")) &&
            cols.contains("bucket_start") && !cols.contains("metric") =>
        rows(df).map(rs => arr(rs.sortBy(_.get("bucket_start").asLong())
          .map(bucketPointNode(_, avail = t == "availability"))).toString)
      // "counters" :: "rate" :: Nil is the deprecated collection alias
      // (CounterHandler.java:826-844) — same BucketPoint list shape
      case ("GET", t :: "rate" :: rest)
          if TypeSegs(t) && (rest == Nil || rest == List("stats")) &&
            cols.contains("bucket_start") && !cols.contains("metric") =>
        rows(df).map(rs => arr(rs.sortBy(_.get("bucket_start").asLong())
          .map(bucketPointNode(_, avail = false))).toString)
      case ("GET", t :: id :: "rate" :: "stats" :: Nil)
          if TypeSegs(t) && !ReservedId(id) && cols.contains("bucket_start") =>
        rows(df).map(rs => arr(rs.sortBy(_.get("bucket_start").asLong())
          .map(bucketPointNode(_, avail = false))).toString)
      // A6 tagged stats: an OBJECT keyed by the matched tag combination
      // ("x:2,y:2,z:2", names sorted — the engine's tag_<name> group
      // columns are emitted sorted), each value a TaggedBucketPoint
      // ({tags, min, max, avg, median, sum, samples, percentiles?} —
      // TaggedBucketPoint.java; CountersITest
      // findTaggedDataPointsWithMultipleTagFilters asserts the shape)
      case ("GET", t :: id :: "stats" :: "tags" :: _ :: Nil)
          if TypeSegs(t) && !ReservedId(id) &&
            cols.exists(_.startsWith("tag_")) =>
        val tagCols = cols.filter(_.startsWith("tag_")).toSeq.sorted
        rows(df).map { rs =>
          val out = mapper.createObjectNode()
          rs.map { r =>
            val names = tagCols.map(c => c.stripPrefix("tag_") ->
              Option(r.get(c)).map(_.asText()).getOrElse(""))
            val key = names.map { case (n, v) => s"$n:$v" }.mkString(",")
            val v = mapper.createObjectNode()
            val tags = v.putObject("tags")
            names.foreach { case (n, tv) => tags.put(n, tv) }
            NumStatNames.foreach(f =>
              if (r.hasNonNull(f)) v.set[ObjectNode](f, r.get(f)))
            if (r.hasNonNull("samples")) v.put("samples", r.get("samples").asLong())
            attachPercentiles(v, r)
            key -> v
          }.sortBy(_._1).foreach { case (k, v) => out.set[ObjectNode](k, v) }
          out.toString
        }
      // EP2 mixed stats: {type: {metricId: [BucketPoint...]}} — the map
      // shape MetricHandler.doStatsQuery zips up (java:455-466); empty
      // sections are dropped (the reference omits empty maps, and an
      // entirely empty result is the caller's 204 via rows() → None)
      case ("POST", "metrics" :: "stats" :: "query" :: Nil)
          if cols.contains("branch") && cols.contains("bucket_start") =>
        rows(df).map(statsSections(_).toString)
      // named batch: one more nesting level keyed by the caller's request
      // names (MetricHandler.findStatsBatched:321-338)
      case ("POST", "metrics" :: "stats" :: "batch" :: "query" :: Nil)
          if cols.contains("request_key") && cols.contains("branch") &&
            cols.contains("bucket_start") =>
        rows(df).map { rs =>
          val out = mapper.createObjectNode()
          rs.groupBy(_.get("request_key").asText()).toSeq.sortBy(_._1).foreach {
            case (key, krs) => out.set[ObjectNode](key, statsSections(krs))
          }
          out.toString
        }
      case ("GET", Nil | "ping" :: Nil | "status" :: Nil | "admin" :: "status" :: Nil)
          if cols == Set("name", "value") =>
        rows(df).map(rs =>
          obj(rs.map(r => r.get("name").asText() -> r.get("value"))).toString)
      case _ =>
        val collected = wireShape(df).toJSON.collect()
        if (collected.isEmpty) None else Some(collected.mkString("[", ",", "]"))
    }
  }

  /** Bucketed-stats frames serialize in the reference's BucketPoint JSON
    * shape (BucketPoint.java:31-53, NumericBucketPoint.java:48-49,83): the
    * wire fields are `start`/`end` plus a computed `empty` flag, the
    * internal bucket index never leaves the server, and empty buckets
    * carry only `{start, end, empty:true}` (their null stats are omitted
    * by toJSON exactly as the reference omits NaN/zero-sample fields). */
  private def wireShape(df: DataFrame): DataFrame = {
    val cols = df.columns
    if (!(cols.contains("bucket") && cols.contains("bucket_start"))) df
    else {
      val stats = cols.filterNot(Set("bucket", "bucket_start", "bucket_end"))
      // the no-samples fallback must test only the STATS columns — group
      // keys (type/metric/id) are never null, so including them would make
      // every bucket read non-empty
      val statsOnly = stats.filterNot(Set("type", "metric", "id"))
      val empty =
        if (cols.contains("samples")) col("samples").isNull || col("samples") === 0
        else if (statsOnly.isEmpty) lit(false)
        else statsOnly.map(c => col(c).isNull).reduce(_ && _)
      // the reference returns buckets index-ordered (BucketPoint.toList
      // iterates 0..count) — sort the response-sized frame; secondary keys
      // make multi-series frames (type/metric columns) deterministic too
      val sortKeys = Seq("type", "metric", "id").filter(stats.contains).map(col) :+ col("start")
      df.select(col("bucket_start").as("start") +: col("bucket_end").as("end") +:
        empty.as("empty") +: stats.map(col): _*)
        .orderBy(sortKeys: _*)
    }
  }

  /** EP2 section map: {type text: {metric id: [BucketPoint...]}} — rows
    * grouped by `branch` then `metric`, buckets index-ordered. Sections
    * and metric keys render sorted (the reference's HashMap order is
    * unspecified; sorted is a deterministic member of that family). */
  private def statsSections(rs: Seq[ObjectNode]): ObjectNode = {
    val out = mapper.createObjectNode()
    rs.groupBy(_.get("branch").asText()).toSeq.sortBy(_._1).foreach {
      case (branch, brs) =>
        val sec = out.putObject(branch)
        brs.groupBy(_.get("metric").asText()).toSeq.sortBy(_._1).foreach {
          case (m, mrs) =>
            val a = sec.putArray(m)
            mrs.sortBy(_.get("bucket_start").asLong())
              .foreach(r => a.add(bucketPointNode(r, avail = branch == "availability")))
        }
    }
    out
  }

  private val NumStatNames = Seq("min", "avg", "median", "max", "sum")
  // engine percentile columns: pctColName normalization (`p99_0`) or the
  // request's original text preserved (`p99_000`) — digits and one `_`
  private val PctCol = "^p(\\d+(?:_\\d+)?)$".r

  /** One bucketed-stats row → the reference's BucketPoint JSON
    * (NumericBucketPoint.java:30-78 / AvailabilityBucketPoint.java:31-125
    * getters + the NON_NULL mapper config): `start`/`end`/`empty` always;
    * stats only on non-empty buckets (empty getters answer null →
    * omitted); numeric percentiles as {quantile, value, originalQuantile}
    * objects, the array omitted when none were requested
    * (WRITE_EMPTY_JSON_ARRAYS=false). Availability buckets carry the
    * durationMap keyed by availability TEXT codes (the reference's
    * AvailabilityTypeKeySerializer; zero-duration states omitted like the
    * collector's observed-states map) plus the convenience duration/count
    * getters. */
  private def bucketPointNode(r: ObjectNode, avail: Boolean): ObjectNode = {
    val out = mapper.createObjectNode()
    out.put("start", r.get("bucket_start").asLong())
    out.put("end", r.get("bucket_end").asLong())
    val empty = !r.hasNonNull("samples") || r.get("samples").asLong() == 0
    if (!empty) {
      val samples = r.get("samples").asLong()
      if (avail) {
        def ms(f: String): Long = if (r.hasNonNull(f)) r.get(f).asLong() else 0L
        val dm = out.putObject("durationMap")
        Seq("up" -> "up_ms", "down" -> "down_ms",
          "unknown" -> "unknown_ms", "admin" -> "admin_ms").foreach {
          case (txt, c) => if (ms(c) != 0L) dm.put(txt, ms(c))
        }
        out.put("upDuration", ms("up_ms"))
        out.put("downDuration", ms("down_ms"))
        out.put("unknownDuration", ms("unknown_ms"))
        out.put("adminDuration", ms("admin_ms"))
        out.put("notUpDuration", ms("down_ms") + ms("unknown_ms") + ms("admin_ms"))
        out.put("lastNotUptime", ms("last_not_uptime"))
        if (r.hasNonNull("uptime_ratio"))
          out.set[ObjectNode]("uptimeRatio", r.get("uptime_ratio"))
        val notUp = ms("not_up_count")
        out.put("notUpCount", notUp)
        out.put("upCount", samples - notUp)
        out.put("samples", samples)
      } else {
        NumStatNames.foreach(f =>
          if (r.hasNonNull(f)) out.set[ObjectNode](f, r.get(f)))
        out.put("samples", samples)
        attachPercentiles(out, r)
      }
    }
    out.put("empty", empty)
    out
  }

  /** Percentile columns → the reference's {quantile, value,
    * originalQuantile} array, quantile-sorted; the array is OMITTED
    * when none were requested (WRITE_EMPTY_JSON_ARRAYS=false). Shared
    * by BucketPoint and TaggedBucketPoint serialization. */
  private def attachPercentiles(out: ObjectNode, r: ObjectNode): Unit = {
    val pcts = r.properties().asScala.toSeq.collect {
      case e if PctCol.matches(e.getKey) && !e.getValue.isNull =>
        val original = PctCol.findFirstMatchIn(e.getKey).get.group(1).replace('_', '.')
        val p = mapper.createObjectNode()
        p.put("quantile", original.toDouble)
        p.set[ObjectNode]("value", e.getValue)
        p.put("originalQuantile", original)
        p
    }
    if (pcts.nonEmpty) {
      val a = out.putArray("percentiles")
      pcts.sortBy(_.get("quantile").asDouble()).foreach(a.add)
    }
  }

  /** Collect + parse — the serialization boundary (response-sized). */
  private def rows(df: DataFrame): Option[Seq[ObjectNode]] = {
    val collected = df.toJSON.collect()
    if (collected.isEmpty) None
    else Some(collected.toSeq.map(mapper.readTree(_).asInstanceOf[ObjectNode]))
  }

  private def arr(nodes: Seq[ObjectNode]): ArrayNode = {
    val a = mapper.createArrayNode()
    nodes.foreach(a.add)
    a
  }

  private def obj(fields: Seq[(String, com.fasterxml.jackson.databind.JsonNode)]): ObjectNode = {
    val o = mapper.createObjectNode()
    fields.foreach { case (k, v) => o.set[ObjectNode](k, v) }
    o
  }

  /** One engine datapoint row → reference DataPoint JSON. */
  private def dpNode(row: ObjectNode): ObjectNode = {
    val out = mapper.createObjectNode()
    out.put("timestamp", row.get("time").asLong())
    // value typed per family (at most one value column is populated —
    // every fetch route is type-homogeneous)
    if (row.hasNonNull("s_value")) out.set[ObjectNode]("value", row.get("s_value"))
    else if (row.hasNonNull("avail"))
      out.put("value", AvailabilityType.fromCode(row.get("avail").asInt().toByte).text)
    else if (row.hasNonNull("l_value")) out.set[ObjectNode]("value", row.get("l_value"))
    else if (row.hasNonNull("n_value")) out.set[ObjectNode]("value", row.get("n_value"))
    // W1 virtual-rate fetches emit a double `rate` column; the wire value
    // is a plain double like any gauge point (CounterHandler findRate)
    else if (row.hasNonNull("rate")) out.set[ObjectNode]("value", row.get("rate"))
    val tags = row.get("tags")
    if (tags != null && tags.isObject && !tags.isEmpty)
      out.set[ObjectNode]("tags", tags)
    out
  }

  /** Flat `[{timestamp,...}]` or nested `[{id, data: [...]}]` in
    * first-arrival metric order. */
  private def dpList(rs: Seq[ObjectNode], flat: Boolean): String =
    if (flat) arr(rs.map(dpNode)).toString
    else {
      val out = mapper.createArrayNode()
      val groups = scala.collection.mutable.LinkedHashMap.empty[String, ArrayNode]
      rs.foreach { r =>
        val id = if (r.hasNonNull("metric")) r.get("metric").asText() else ""
        val data = groups.getOrElseUpdate(id, {
          val g = out.addObject()
          g.put("id", id)
          g.putArray("data")
        })
        data.add(dpNode(r))
      }
      out.toString
    }

  /** One catalog row → reference Metric JSON (Metric.java:49-70). */
  private def defNode(row: ObjectNode): ObjectNode = {
    val out = mapper.createObjectNode()
    if (row.hasNonNull("tenant_id")) out.set[ObjectNode]("tenantId", row.get("tenant_id"))
    out.set[ObjectNode]("id", row.get("metric"))
    out.put("type", MetricType.fromCode(row.get("mtype").asInt().toByte).text)
    val tags = row.get("tags")
    if (tags != null && tags.isObject && !tags.isEmpty)
      out.set[ObjectNode]("tags", tags)
    out.put("dataRetention",
      if (row.hasNonNull("data_retention")) row.get("data_retention").asInt()
      else DefaultRetentionDays)
    if (row.hasNonNull("min_time")) out.put("minTimestamp", row.get("min_time").asLong())
    if (row.hasNonNull("max_time")) out.put("maxTimestamp", row.get("max_time").asLong())
    out
  }
}
