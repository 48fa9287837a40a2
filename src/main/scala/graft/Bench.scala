package graft

import org.apache.spark.sql.SparkSession

/**
 * Per-round benchmark: runs every SparkEntry query on SPARK_GRAFT_SF_DIR
 * and prints ONE JSON line.
 *
 * Materialization is a `noop`-sink write: every row is fully computed and
 * serialized through the query's whole plan (Catalyst cannot prune columns
 * against a noop sink the way it can against `.count()`), with no disk cost
 * measured.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    // JIT/IO warm-up outside the timed region
    spark.read.parquet(s"$sfDir/events.parquet").write.format("noop").mode("overwrite").save()
    // two passes, min per query: the harness shares a host (CPU steal is
    // observable), and a single pass also conflates JIT warm-up with plan
    // cost. Caches are cleared between runs so each is cold-state.
    // a throwing query must not silently read as a (near-zero-time) success:
    // failures are tracked by name, reported in the JSON, and fail the exit.
    // A failed run's (fast) duration is also NOT a valid timing sample —
    // the per-query min only considers successful runs.
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            failed += name
            false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      if (ok) Some(dt) else None
    }
    // two FULL passes with the per-query min taken ACROSS passes (not two
    // back-to-back runs of each query): host CPU-steal bursts span several
    // consecutive seconds, so back-to-back runs let one burst corrupt both
    // samples. Pass 2 runs in REVERSE order: with identical orders, one
    // multi-minute burst per pass at the same wall-clock offset lands on
    // the same queries twice and survives the min (observed in the round-3
    // driver run — a contiguous alphabetical span inflated 10-30x);
    // mirrored orders make a query's two samples sit at opposite ends of
    // the schedule, so only a burst spanning most of the run can corrupt
    // both.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    def runPass(qs: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]) =
      qs.map { case (name, fn) => (name, once(name, fn)) }.toMap
    val (m1, m2) = (runPass(ordered), runPass(ordered.reverse))
    val (p1, p2) = (ordered.map(q => m1(q._1)), ordered.map(q => m2(q._1)))
    // a query with NO successful sample reports null (not a fake 0.000
    // that would read as a speedup) and contributes nothing to the total
    val results: Seq[(String, Option[Double])] = ordered.map(_._1).zip(p1.zip(p2).map {
      case (a, b) => Seq(a, b).flatten.minOption
    })
    val qs = results.map {
      case (k, Some(v)) => "\"" + k + "\":" + f"$v%.3f"
      case (k, None)    => "\"" + k + "\":null"
    }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
