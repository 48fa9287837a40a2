package graft.streaming

import graft.SparkTestBase
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingNearDupSpec extends SparkTestBase {

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.select("doc_a", "doc_b", "hamming").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("streaming near-dup screen: cross-batch pairs surface from recovered state; " +
    "the distinct pair set equals the batch band self-join") {
    val s = spark
    import s.implicits._
    val src = Files.createTempDirectory("graft-nd-src").toString
    val tier = Files.createTempDirectory("graft-nd-tier").toString + "/pairs"
    val ckpt = Files.createTempDirectory("graft-nd-ckpt").toString
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 40) "CHANGED" else s"w$i").mkString(" ")
    val nearDup2 = (1 to 40).map(i => if (i == 1) "ALSO" else s"w$i").mkString(" ")
    val distinct = (100 to 140).map(i => s"z$i").mkString(" ")
    def land(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    // wave 1: the base doc, an in-batch near-dup, and an unrelated doc
    land(Seq((1L, base), (2L, nearDup), (3L, distinct)))
    val schema = s.read.parquet(src).schema
    def drain(): Unit = {
      val q = StreamingNearDup.screen(
        s.readStream.schema(schema).parquet(src), tier, ckpt, maxHamming = 3)
      q.awaitTermination()
    }
    drain()
    val wave1 = pairsOf(s.read.parquet(tier))
    assert(wave1.map(p => (p._1, p._2)) == Set((1L, 2L)), wave1.toString)
    // wave 2 under a FRESH query from the same checkpoint: a near-dup of
    // doc 1 arrives LATER — the pair must surface from recovered band
    // state, not from any same-batch comparison
    land(Seq((4L, nearDup2)))
    drain()
    val streamed = pairsOf(s.read.parquet(tier))
    val batch = pairsOf(Dedup.simHashPairs(
      Seq((1L, base), (2L, nearDup), (3L, distinct), (4L, nearDup2))
        .toDF("doc_id", "text"), maxHamming = 3))
    assert(batch.exists(p => p._1 == 1L && p._2 == 4L),
      s"fixture must actually plant a cross-wave near-dup, got $batch")
    assert(streamed == batch,
      s"streamed distinct pairs $streamed != batch pairs $batch")
  }
}
