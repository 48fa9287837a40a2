package graft.storage

import graft.SparkTestBase
import graft.tagquery.TagQueryParser
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Persisted tag index: semantics pinned EQUAL to the compiled-Column
  * catalog scan across the whole grammar; bucket-pruned serving plan;
  * incremental append with replay idempotency. */
class TagIndexSpec extends SparkTestBase {

  private def catalogDf = {
    val s = spark
    import s.implicits._
    Seq(
      ("t1", 0, "m1", Map("type" -> "cpu", "host" -> "a1", "zone" -> "eu")),
      ("t1", 0, "m2", Map("type" -> "cpu", "host" -> "a2")),
      ("t1", 0, "m3", Map("type" -> "mem", "host" -> "b1", "zone" -> "us")),
      ("t1", 0, "m4", Map("type" -> "mem")),
      ("t1", 2, "m1", Map("type" -> "cpu", "host" -> "a9")), // same name, other type
      ("t1", 0, "m5", Map("host" -> "c1")),                  // no 'type' tag
      ("t1", 0, "m6", Map.empty[String, String])             // genuinely tag-less
    ).toDF("tenant_id", "mtype", "metric", "tags")
  }

  private val Expressions = Seq(
    "type = cpu",
    "type != cpu",
    "NOT zone",
    "zone",
    "host ~ 'a.*'",
    "host !~ 'a.*'",
    "host IN [a1, b1]",
    "host NOT IN [a1, b1]",
    "seg ~ '!s[0-3]'",                       // absent key + negated pattern
    "type = cpu AND zone = eu",
    "type = mem OR host = c1",
    "(type = cpu AND host IN [a1, a2]) OR NOT host",
    "type = cpu AND NOT zone OR host = b1"   // left-assoc equal precedence
  )

  test("lookup equals the compiled-Column catalog scan across the grammar " +
    "(complements, patterns, IN lists, precedence)") {
    val cat = catalogDf
    val path = Files.createTempDirectory("graft-tagidx").toString
    TagIndex.write(cat, path)
    Expressions.foreach { e =>
      val expected = cat.filter(TagQueryParser.compile(e, col("tags")))
        .select("tenant_id", "mtype", "metric")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
      val got = TagIndex.lookup(spark, path, e)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
      assert(got == expected, s"expression: $e")
    }
  }

  test("serving reads only the referenced names' buckets — STATIC bucket " +
    "partition filter on the entries scan") {
    val path = Files.createTempDirectory("graft-tagidx-plan").toString
    TagIndex.write(catalogDf, path)
    val plan = TagIndex.lookup(spark, path, "type = cpu AND host ~ 'a.*'")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert("PartitionFilters: \\[bucket#\\d+ IN".r.findFirstIn(plan).isDefined,
      s"expected a static bucket IN (...) partition filter:\n$plan")
    // a tombstone-free store must serve WITHOUT the delete screens
    assert(!plan.contains("LeftAnti"),
      s"tombstone-free serving must not carry a delete anti-join:\n$plan")
  }

  test("a many-leaf expression serves from ONE entries scan (boolean pivot, " +
    "not per-leaf intersect/union)") {
    val path = Files.createTempDirectory("graft-tagidx-1scan").toString
    TagIndex.write(catalogDf, path)
    // 10 leaves over 3 names, with AND/OR/NOT and a complement (which
    // additionally pulls in the metrics universe — one extra scan, once)
    val expr = "(type = cpu OR type = mem OR type IN [disk, net]) AND " +
      "(host ~ 'a.*' OR host !~ 'b.*' OR host != c1) AND " +
      "(zone = eu OR NOT zone OR zone ~ 'u.*')"
    val plan = TagIndex.lookup(spark, path, expr)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // FormattedMode puts scan paths in the details section, one
    // `Location: InMemoryFileIndex [...]` line per scan node
    val entriesScans = "Location: [^\\n]*entries".r.findAllIn(plan).length
    val metricsScans = "Location: [^\\n]*metrics".r.findAllIn(plan).length
    assert(entriesScans == 1, s"expected ONE entries scan, got $entriesScans:\n$plan")
    assert(metricsScans == 1, s"expected ONE metrics (universe) scan, got $metricsScans:\n$plan")
    // and the pivot answers stay equal to the compiled-Column catalog path
    val viaIndex = TagIndex.lookup(spark, path, expr)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val viaCatalog = catalogDf
      .filter(graft.tagquery.TagQueryParser.compile(expr, col("tags")))
      .select(col("tenant_id"), col("mtype"), col("metric"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(viaIndex == viaCatalog)
  }

  test("append: equals a fresh rebuild over the union; replayed batch is a " +
    "no-op; complement leaves see appended metrics in the universe") {
    val s = spark
    val cat = catalogDf
    val waveA = cat.filter(col("metric") =!= "m3" && col("metric") =!= "m5")
    val waveB = cat.filter(col("metric") === "m3" || col("metric") === "m5")
    val path = Files.createTempDirectory("graft-tagidx-app").toString
    TagIndex.write(waveA, path)
    TagIndex.append(s, path, waveB)
    val rebuilt = Files.createTempDirectory("graft-tagidx-reb").toString
    TagIndex.write(cat, rebuilt)
    def answers(p: String, e: String) = TagIndex.lookup(s, p, e)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    Seq("type = mem", "NOT type", "host ~ '.*1'").foreach { e =>
      assert(answers(path, e) == answers(rebuilt, e), s"expression: $e")
    }
    // replay: already-indexed ids anti-join away — no duplicate entries
    TagIndex.append(s, path, waveB)
    assert(s.read.parquet(s"$path/entries")
      .groupBy("tenant_id", "mtype", "metric", "tag_name").count()
      .filter(col("count") > 1).isEmpty, "replay must not double-index tags")
    assert(answers(path, "NOT type") == answers(rebuilt, "NOT type"))
  }

  test("compact: merges wave files without moving answers; deregisters the " +
    "crash-orphan (screen row, no entries) but keeps the genuinely " +
    "tag-less metric; a re-append of the lost batch then lands") {
    val s = spark
    import s.implicits._
    val cat = catalogDf
    val path = Files.createTempDirectory("graft-tagidx-cmp").toString
    TagIndex.write(cat.filter(col("metric") =!= "m3"), path)
    TagIndex.append(s, path, cat.filter(col("metric") === "m3"))
    def answers(e: String) = TagIndex.lookup(s, path, e)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val before = Seq("type = mem", "NOT type", "host ~ '.*1'").map(e => e -> answers(e))
    // simulate the documented crash window: screen row landed, entries
    // did not (n_tags > 0 marks it as NOT tag-less)
    Seq(("t1", 0, "m9", 2L)).toDF("tenant_id", "mtype", "metric", "n_tags")
      .write.mode("append").parquet(s"$path/metrics")
    TagIndex.compact(s, path)
    before.foreach { case (e, a) => assert(answers(e) == a, s"expression: $e") }
    val ids = s.read.parquet(s"$path/metrics").select("metric")
      .collect().map(_.getString(0)).toSet
    assert(!ids.contains("m9"), "crash orphan must deregister")
    assert(ids.contains("m6"), "tag-less metric must survive compaction")
    // the lost batch lands on re-append (screen no longer blocks it)
    TagIndex.append(s, path,
      Seq(("t1", 0, "m9", Map("type" -> "cpu", "zone" -> "ap")))
        .toDF("tenant_id", "mtype", "metric", "tags"))
    assert(answers("zone = ap").map(_._3) == Set("m9"))
  }

  // ---- S9 tenant delete (reference jobs/DeleteTenant.java:34-62;
  // assertions ported from DeleteTenantITest.java:137-290 — data gone,
  // tag index entries gone, tenant double-delete safe) -----------------

  private def twoTenantCatalog = {
    val s = spark
    import s.implicits._
    catalogDf.unionByName(Seq(
      ("t2", 0, "m1", Map("type" -> "cpu", "host" -> "z1")),
      ("t2", 0, "m7", Map("type" -> "mem", "zone" -> "ap")),
      ("t2", 0, "m8", Map("host" -> "z2"))
    ).toDF("tenant_id", "mtype", "metric", "tags"))
  }

  private def ids(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet

  test("deleteTenant: O(1) tombstone hides the tenant from serving at once " +
    "(positive leaves AND the NOT-universe), other tenants keep answering; " +
    "idempotent; physical purge deferred (DeleteTenantITest analog)") {
    val s = spark
    val path = Files.createTempDirectory("graft-tagidx-del").toString
    TagIndex.write(twoTenantCatalog, path)
    assert(ids(TagIndex.lookup(s, path, "type = cpu")).exists(_._1 == "t2"))
    TagIndex.deleteTenant(s, path, "t2")
    val cpu = ids(TagIndex.lookup(s, path, "type = cpu"))
    assert(cpu.nonEmpty && !cpu.exists(_._1 == "t2"))
    assert(cpu == ids(catalogDf.filter(
      TagQueryParser.compile("type = cpu", col("tags")))
      .select("tenant_id", "mtype", "metric")))
    // complement leaves: the id universe must not resurrect the tenant
    val notZone = ids(TagIndex.lookup(s, path, "NOT zone"))
    assert(notZone.nonEmpty && !notZone.exists(_._1 == "t2"))
    // double delete is a no-op (deleteTenantTwiceConcurrently analog)
    TagIndex.deleteTenant(s, path, "t2")
    assert(ids(TagIndex.lookup(s, path, "type = cpu")) == cpu)
    // deferred purge: the delete is tombstone-append-ONLY (live-store
    // safe — no swap window), so entries AND metrics screen rows stay on
    // disk until a revival or compaction purges them
    assert(s.read.parquet(s"$path/entries")
      .filter(col("tenant_id") === "t2").count() > 0)
    assert(s.read.parquet(s"$path/metrics")
      .filter(col("tenant_id") === "t2").count() > 0)
  }

  test("a rebuild at a path with pending deletes must not inherit the " +
    "tombstones: the NEW store serves everything its catalog holds") {
    val s = spark
    val path = Files.createTempDirectory("graft-tagidx-reb2").toString
    TagIndex.write(twoTenantCatalog, path)
    TagIndex.deleteTenant(s, path, "t2")
    TagIndex.deleteMetric(s, path, "t1", 0, "m1")
    // overwrite-rebuild at the same path — prior deletes are history
    TagIndex.write(twoTenantCatalog, path)
    val cpu = ids(TagIndex.lookup(s, path, "type = cpu"))
    assert(cpu.exists(_._1 == "t2"), "rebuilt store must serve the new catalog's t2")
    assert(cpu.contains(("t1", 0, "m1")), "rebuilt store must serve the re-registered id")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/tombstones")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/deleted_ids")))
  }

  test("one batch reviving a deleted tenant AND a deleted metric purges in " +
    "ONE entries rewrite, and both tombstone kinds clear") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("graft-tagidx-rev2").toString
    TagIndex.write(twoTenantCatalog, path)
    TagIndex.deleteTenant(s, path, "t2")
    TagIndex.deleteMetric(s, path, "t1", 0, "m2")
    TagIndex.append(s, path, Seq(
      ("t2", 0, "m1", Map("type" -> "disk", "rack" -> "r9")),
      ("t1", 0, "m2", Map("type" -> "disk"))
    ).toDF("tenant_id", "mtype", "metric", "tags"))
    assert(ids(TagIndex.lookup(s, path, "type = disk")) ==
      Set(("t2", 0, "m1"), ("t1", 0, "m2")))
    // neither revival serves its pre-delete tags
    val cpu = ids(TagIndex.lookup(s, path, "type = cpu"))
    assert(!cpu.exists(_._1 == "t2") && !cpu.contains(("t1", 0, "m2")))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/tombstones")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/deleted_ids")))
  }

  test("compact is the delete job's physical half: tombstoned entries purge " +
    "inside the rewrite, the tombstone table clears, answers hold") {
    val s = spark
    val path = Files.createTempDirectory("graft-tagidx-delcmp").toString
    TagIndex.write(twoTenantCatalog, path)
    TagIndex.deleteTenant(s, path, "t2")
    val before = Seq("type = cpu", "NOT zone", "host ~ '.*1'")
      .map(e => e -> ids(TagIndex.lookup(s, path, e)))
    TagIndex.compact(s, path)
    before.foreach { case (e, a) =>
      assert(ids(TagIndex.lookup(s, path, e)) == a, s"expression: $e") }
    assert(s.read.parquet(s"$path/entries")
      .filter(col("tenant_id") === "t2").count() == 0, "entries must purge")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/tombstones")),
      "tombstones must clear once purged")
  }

  test("append revives a deleted tenant: stale pre-delete entries purge " +
    "first, the tombstone clears, and only the new registration serves") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("graft-tagidx-rev").toString
    TagIndex.write(twoTenantCatalog, path)
    TagIndex.deleteTenant(s, path, "t2")
    TagIndex.append(s, path, Seq(
      ("t2", 0, "m1", Map("type" -> "disk", "rack" -> "r9"))
    ).toDF("tenant_id", "mtype", "metric", "tags"))
    // new registration serves...
    assert(ids(TagIndex.lookup(s, path, "rack = r9")) == Set(("t2", 0, "m1")))
    // ...the pre-delete tags do NOT (t2/m1 was type=cpu before the delete)
    assert(!ids(TagIndex.lookup(s, path, "type = cpu")).exists(_._1 == "t2"))
    // and the other tenant never flinched
    assert(ids(TagIndex.lookup(s, path, "type = cpu")).nonEmpty)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/tombstones")))
  }

  // ---- S9 metric delete (reference MetricsServiceImpl.java:1085-1101
  // clears the metric's metrics_tags_idx rows synchronously) -----------

  test("deleteMetric: one id leaves serving at once (same-name other-type " +
    "survives, NOT-universe clean), idempotent; compact purges physically " +
    "and clears the id tombstone") {
    val s = spark
    val path = Files.createTempDirectory("graft-tagidx-delm").toString
    TagIndex.write(catalogDf, path)
    TagIndex.deleteMetric(s, path, "t1", 0, "m1")
    val cpu = ids(TagIndex.lookup(s, path, "type = cpu"))
    assert(!cpu.contains(("t1", 0, "m1")), "deleted id must not serve")
    assert(cpu.contains(("t1", 2, "m1")), "same name, other type survives")
    assert(cpu.contains(("t1", 0, "m2")))
    // catalogDf has no 'seg' tags: NOT seg = the whole universe — the
    // complement path must not resurrect the deleted id
    val notSeg = ids(TagIndex.lookup(s, path, "NOT seg"))
    assert(!notSeg.contains(("t1", 0, "m1")) && notSeg.contains(("t1", 0, "m2")))
    TagIndex.deleteMetric(s, path, "t1", 0, "m1") // double delete: no-op
    assert(ids(TagIndex.lookup(s, path, "type = cpu")) == cpu)
    // deferred purge until compact
    assert(s.read.parquet(s"$path/entries")
      .filter(col("tenant_id") === "t1" && col("mtype") === 0 &&
        col("metric") === "m1").count() > 0)
    TagIndex.compact(s, path)
    assert(ids(TagIndex.lookup(s, path, "type = cpu")) == cpu)
    assert(s.read.parquet(s"$path/entries")
      .filter(col("tenant_id") === "t1" && col("mtype") === 0 &&
        col("metric") === "m1").count() == 0, "entries must purge")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/deleted_ids")))
  }

  test("deleteMetric then re-append WITHOUT compact: the revival purges " +
    "stale pre-delete entries, clears the id tombstone, and only the new " +
    "registration serves") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("graft-tagidx-revm").toString
    TagIndex.write(catalogDf, path)
    TagIndex.deleteMetric(s, path, "t1", 0, "m2")
    TagIndex.append(s, path, Seq(
      ("t1", 0, "m2", Map("type" -> "disk"))
    ).toDF("tenant_id", "mtype", "metric", "tags"))
    assert(!ids(TagIndex.lookup(s, path, "type = cpu")).contains(("t1", 0, "m2")),
      "pre-delete tags must not serve after revival")
    assert(ids(TagIndex.lookup(s, path, "type = disk")) == Set(("t1", 0, "m2")))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/deleted_ids")))
  }
}
