package graft

import org.apache.spark.sql.SparkSession

/**
 * Multi-executor smoke profile (dev tool): runs the heaviest queries on
 * a REAL multi-process cluster — `local-cluster[2,4,4g]`, two separate
 * executor JVMs — to catch the failure classes `local[32]` structurally
 * cannot: non-serializable closure captures, driver-only state reached
 * from executors (mutable maps, lazy session references), broadcast
 * payloads that only work in-process, and task-result sizes that blow
 * the RPC limit. Every query must produce the SAME row count as the
 * local[32] run at the same SF — a cheap cross-mode invariant that
 * catches silent partition loss.
 *
 * Usage: SPARK_SCALA_VERSION=2.13 runMain graft.ProbeCluster [sfDir] [query ...]
 * (defaults to sf0.01 and the heavy set below; the env var is required
 * because the standalone executor launcher otherwise probes SPARK_HOME
 * for source-build directories that a binary dist doesn't have —
 * launcher AbstractCommandBuilder.getScalaVersion)
 */
object ProbeCluster {

  /** The cost leaders from the per-round bench tails (lifecycle/
    * maintenance class + the widest shuffles), plus one representative
    * per operator family so closure serialization gets coverage across
    * the whole surface. */
  private val HeavySet = Seq(
    "streaming_attribution_outer", "bm25_index_compact", "streaming_bm25_index",
    "streaming_attribution", "tagindex_compact", "stats_query_mixed",
    "rollup_stats", "rollup_adaptive", "storage_compact", "semdedup",
    "stats_batch", "storage_delete", "tagindex_append", "streaming_rolling_stats",
    "dedup_clusters", "media_frame_search_ivf", "split_leakage",
    "source_overlap", "retrieval_recall", "neardup_index_compact")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val wanted = if (args.length > 1) args.drop(1).toSeq else HeavySet
    require(sys.env.contains("SPARK_SCALA_VERSION"),
      "set SPARK_SCALA_VERSION=2.13 — the standalone executor launcher needs it " +
        "to build the executor classpath from a binary Spark dist")
    // the compiled classes must reach the executor JVMs: local-cluster
    // launches real workers from SPARK_HOME, whose classpath has the
    // Spark jars but NOT this project's target/classes
    val classesDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    // SPARK_GRAFT_MASTER override lets the SAME harness (same count()
    // materialization, same query list) time a local[n] control run for
    // the cluster-vs-local bench comparison
    val spark = GraftSession.builder(
      master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,4,4096]"))
      .appName("graft-cluster-smoke")
      .config("spark.executor.extraClassPath", classesDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      println(s"== local-cluster[2,4,4g] smoke: $dir, ${wanted.size} queries ==")
      var failed = 0
      wanted.foreach { name =>
        SparkEntry.queries.get(name) match {
          case None => println(f"$name%-28s MISSING"); failed += 1
          case Some(q) =>
            val t0 = System.nanoTime()
            try {
              val rows = q(spark, dir).count()
              println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  $rows%6d rows")
            } catch {
              case e: Exception =>
                failed += 1
                println(f"$name%-28s FAILED: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
            }
        }
      }
      println(if (failed == 0) "CLUSTER SMOKE PASS" else s"CLUSTER SMOKE: $failed FAILED")
      if (failed > 0) sys.exit(1)
    } finally spark.stop()
  }
}
