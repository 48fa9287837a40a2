package graft

import org.apache.spark.sql.functions._

/** Dev-only phase timer for the streaming index fixtures (r15 §1):
  * splits streaming_pcaivf_index / streaming_ivfpq_index into stage,
  * drain (per-batch progress printed), and serve, so optimization
  * effort lands on the phase that costs.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ProbeStreamIdx
  */
object ProbeStreamIdx {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity
    def phase[T](tag: String, name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sidx] $tag%-7s $name%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def embs(s: org.apache.spark.sql.SparkSession) = {
      val e = s.read.parquet(s"$d/embeddings.parquet")
      e.select(col("vec_id"), col("embedding"), col("label"))
    }
    def backdate(dir: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val t = System.currentTimeMillis() - 60000L
      val it = fs.listFiles(p, true)
      while (it.hasNext) { val f = it.next(); fs.setTimes(f.getPath, t, -1) }
    }
    for (rnd <- 1 to 2) {
      // ---- pcaivf ----
      locally {
        val base = s"target/tmp/probe_spcaivf$rnd"
        graft.storage.IndexStore.rmrf(spark, base)
        val e = embs(spark)
        phase(s"pca$rnd", "stage") {
          e.filter(col("vec_id") < 100 || col("vec_id") >= 110)
            .coalesce(1).write.parquet(s"$base/src")
          backdate(s"$base/src")
          e.filter(col("vec_id") >= 100 && col("vec_id") < 110)
            .coalesce(1).write.mode("append").parquet(s"$base/src")
        }
        val schema = spark.read.parquet(s"$base/src").schema
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
        phase(s"pca$rnd", "drain") {
          val q = graft.streaming.StreamingSimilarity.pcaIvfIngest(
            stream, s"$base/idx", s"$base/ckpt", dims = 16, kCells = 4, iters = 2)
          q.awaitTermination()
          q.recentProgress.foreach(p =>
            println(f"[sidx]   pca$rnd batch=${p.batchId} rows=${p.numInputRows}" +
              f" trigger=${p.batchDuration}ms add=${p.durationMs.get("addBatch")}"))
        }
        phase(s"pca$rnd", "serve") {
          Similarity.pcaIvfStoredTopK(spark, s"$base/idx",
            e.filter(col("vec_id") < 10), 10, nprobe = 4, shortlist = 1 << 20)
            .select(col("query_id"), col("neighbor_id"),
              round(col("cosine"), 6).as("cosine"))
            .write.format("noop").mode("overwrite").save()
        }
      }
      // ---- ivfpq ----
      locally {
        val base = s"target/tmp/probe_sivfpq$rnd"
        graft.storage.IndexStore.rmrf(spark, base)
        val e = embs(spark)
        phase(s"pq$rnd", "stage") {
          e.filter(col("vec_id") < 100 || col("vec_id") >= 110)
            .coalesce(1).write.parquet(s"$base/src")
          backdate(s"$base/src")
          e.filter(col("vec_id") >= 100 && col("vec_id") < 110)
            .coalesce(1).write.mode("append").parquet(s"$base/src")
        }
        val schema = spark.read.parquet(s"$base/src").schema
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
        phase(s"pq$rnd", "drain") {
          val q = graft.streaming.StreamingSimilarity.ivfPqIngest(
            stream, s"$base/idx", s"$base/ckpt", kCells = 4, iters = 2)
          q.awaitTermination()
          q.recentProgress.foreach(p =>
            println(f"[sidx]   pq$rnd batch=${p.batchId} rows=${p.numInputRows}" +
              f" trigger=${p.batchDuration}ms add=${p.durationMs.get("addBatch")}"))
        }
        phase(s"pq$rnd", "serve") {
          Similarity.ivfPqStoredTopK(spark, s"$base/idx",
            e.filter(col("vec_id") < 10), 10, nprobe = 4, shortlist = 1 << 20)
            .select(col("query_id"), col("neighbor_id"),
              round(col("cosine"), 6).as("cosine"))
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}
