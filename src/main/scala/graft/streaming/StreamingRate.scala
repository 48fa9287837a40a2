package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

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
 *
 * State lifecycle: at 100 TB series churn is high (ephemeral pods →
 * ephemeral metric names), so per-series state must not live forever. A
 * series whose last point has fallen `idleMs` behind the watermark is
 * EVICTED via event-time timeout; if it later revives, the first new
 * point re-seeds the state and emits no rate — exactly the reference's
 * "a rate needs two points" semantics, so eviction costs one pair on
 * revival and nothing else.
 */
object StreamingRate {

  case class Key(tenant_id: String, mtype: Int, metric: String)
  // event_time rides along so the watermark attribute reaches the
  // stateful operator (same contract as StreamingAvail.Pt)
  case class Point(tenant_id: String, mtype: Int, metric: String, time: Long,
                   value: Double, event_time: java.sql.Timestamp)
  case class Last(time: Long, value: Double)
  case class Rate(tenant_id: String, mtype: Int, metric: String, time: Long, rate: Double)

  private def advance(isCounter: Boolean, idleMs: Long)(
      key: Key, points: Iterator[Point], state: GroupState[Last]): Iterator[Rate] = {
    if (state.hasTimedOut) {
      // series idle past the horizon: drop its Last — unbounded series
      // churn no longer grows the state store
      state.remove()
      Iterator.empty
    } else {
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
      last.foreach { l =>
        state.update(l)
        // evict once the watermark passes lastSeen + idleMs; the timestamp
        // must sit strictly ahead of the current watermark or Spark
        // rejects it, so a series that is ALREADY idle-by-watermark gets
        // one more batch of grace instead of a query-killing throw
        state.setTimeoutTimestamp(math.max(l.time + idleMs, state.getCurrentWatermarkMs() + 1))
      }
      out.result().iterator
    }
  }

  /** `points` is a STREAMING canonical frame; value column is n_value
    * (gauge) or l_value (counter). `lateness` bounds out-of-order
    * admission (the watermark), `idleMs` the per-series state lifetime
    * past that watermark. */
  def rates(points: DataFrame, isCounter: Boolean, lateness: String = "2 hours",
            idleMs: Long = 24L * 3600 * 1000): Dataset[Rate] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .withColumn("event_time", timestamp_millis(col("time")))
      .withWatermark("event_time", lateness)
      .select(col("tenant_id"), col("mtype").cast("int").as("mtype"), col("metric"),
        col("time"),
        (if (isCounter) col("l_value") else col("n_value")).cast("double").as("value"),
        col("event_time"))
      .as[Point]
      .groupByKey(p => Key(p.tenant_id, p.mtype, p.metric))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        advance(isCounter, idleMs))
  }
}
