package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/**
 * Streaming rate derivation (W1 as a continuous query): the reference
 * computes COUNTER_RATE/GAUGE_RATE at read time over stored points
 * (MetricsServiceImpl.java:858-883); here the same pairwise semantics run
 * incrementally over the ingest stream with
 * `flatMapGroupsWithState` — per-series state is just the last observed
 * (time, value), so a rate is emitted the moment its closing point
 * arrives, across micro-batch boundaries.
 *
 * Semantics parity with the batch operator:
 *  - rate = 60000 * Δvalue / Δtime, emitted at the LATER timestamp;
 *  - counter resets (next < prev) drop the PAIR, the point still anchors
 *    the following pair (F6);
 *  - out-of-order points older than the series' last seen time are
 *    dropped (a stream cannot retro-pair; the batch path re-derives
 *    exact rates from storage when needed).
 */
object StreamingRate {

  case class Key(tenant_id: String, mtype: Int, metric: String)
  case class Point(tenant_id: String, mtype: Int, metric: String, time: Long, value: Double)
  case class Last(time: Long, value: Double)
  case class Rate(tenant_id: String, mtype: Int, metric: String, time: Long, rate: Double)

  private def advance(isCounter: Boolean)(
      key: Key, points: Iterator[Point], state: GroupState[Last]): Iterator[Rate] = {
    val sorted = points.toSeq.sortBy(_.time)
    var last = state.getOption
    val out = Seq.newBuilder[Rate]
    sorted.foreach { p =>
      last match {
        case Some(l) if p.time > l.time =>
          if (!(isCounter && p.value < l.value)) // F6: reset pair dropped
            out += Rate(key.tenant_id, key.mtype, key.metric, p.time,
              60000.0 * (p.value - l.value) / (p.time - l.time))
          last = Some(Last(p.time, p.value))
        case Some(_) => // stale out-of-order point: drop
        case None =>
          last = Some(Last(p.time, p.value))
      }
    }
    last.foreach(state.update)
    out.result().iterator
  }

  /** `points` is a STREAMING canonical frame; `valueCol` picks n_value
    * (gauge) or l_value (counter). */
  def rates(points: DataFrame, isCounter: Boolean): Dataset[Rate] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .select(col("tenant_id"), col("mtype").cast("int").as("mtype"), col("metric"),
        col("time"),
        (if (isCounter) col("l_value") else col("n_value")).cast("double").as("value"))
      .as[Point]
      .groupByKey(p => Key(p.tenant_id, p.mtype, p.metric))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        advance(isCounter))
  }
}
