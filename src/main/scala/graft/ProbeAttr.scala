package graft

import org.apache.spark.sql.functions._

/** Dev-only phase timer for the streaming_attribution_outer fixture
  * (r15 §1 measure-first): reproduces the query's steps — stage copy,
  * first drain, sentinel append, second drain, final read — with a
  * wall-clock per phase, so the optimization targets the phase that
  * actually costs (the bench only sees the total).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ProbeAttr
  */
object ProbeAttr {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ea = graft.sources.EventsAdapter
    val base = "target/tmp/probe_attro"
    graft.storage.IndexStore.rmrf(spark, base)
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[attr] $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val stage = s"$base/stage"
    phase("stage_copy") {
      spark.read.parquet(s"$d/events.parquet").write.mode("overwrite").parquet(stage)
    }
    def drain(tag: String): Unit = phase(tag) {
      val st = graft.streaming.StreamingAttribution.attributionPairs(
        ea.eventFrameStreamDir(spark, stage), leftOuter = true)
      val q = st.writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$base/ckpt")
        .format("parquet").option("path", s"$base/out")
        .start()
      q.awaitTermination()
      q.recentProgress.foreach { p =>
        println(f"[attr]   $tag batch=${p.batchId} rows=${p.numInputRows}" +
          f" trigger=${p.batchDuration} ms add=${p.durationMs.get("addBatch")}" +
          f" getBatch=${p.durationMs.get("getBatch")} latestOffset=${p.durationMs.get("latestOffset")}" +
          f" queryPlanning=${p.durationMs.get("queryPlanning")}" +
          f" commit=${p.durationMs.get("commitOffsets")} state=${
            Option(p.stateOperators).map(_.map(o =>
              s"commit:${o.commitTimeMs}ms mem:${o.memoryUsedBytes}").mkString("|")).getOrElse("")}")
      }
    }
    drain("drain_1")
    phase("sentinel") {
      val ev = spark.read.parquet(stage)
      val tsPlus = ev.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          col("ts") + lit(36000000000000L)
        case _ => col("ts") + expr("INTERVAL 10 HOURS")
      }
      val last = ev.orderBy(col("ts").desc).limit(1).withColumn("ts", tsPlus)
        .withColumn("user_id", lit(-1L)).withColumn("value", lit(0.0))
      last.withColumn("event_id", lit(-1L)).withColumn("event_type", lit("click"))
        .unionByName(last.withColumn("event_id", lit(-2L))
          .withColumn("event_type", lit("purchase")))
        .select(ev.columns.map(col): _*)
        .write.mode("append").parquet(stage)
    }
    drain("drain_2")
    phase("final_read") {
      spark.read.parquet(s"$base/out").filter(col("user_id") >= 0)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
