package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/**
 * Streaming twin of [[graft.operators.EventOps.funnel]]: per-user
 * ordered-step tracking as a continuous query. Each user's state is the
 * number of steps completed plus the completion time of the last one;
 * an arriving event of the NEXT step type with a STRICTLY later
 * timestamp advances the chain and emits one completion row
 * immediately — the same first-touch strictly-after semantics as the
 * batch operator, evaluated greedily in event-time order (within each
 * micro-batch events sort by (time, event_id) first).
 *
 * Parity contract: over in-order delivery (or any single batch) the
 * emitted (user, step, time) set EQUALS the batch funnel's reached
 * frames — that is the oracled gate. A late event that would have
 * produced an EARLIER completion time cannot retract an already-emitted
 * row (streams don't retract; the batch path recomputes exact answers
 * from storage) — the same stale-point posture as StreamingRate.
 *
 * State lifecycle: completed users keep a TOMBSTONE state (the terminal
 * Progress) — dropping it eagerly would let a user's NEXT step-1 event
 * restart the chain and re-emit rows the batch oracle counts once.
 * Both tombstones and mid-funnel progress evict via event-time timeout
 * `idleMs` (the funnel TTL) past the watermark: state is bounded by
 * users ACTIVE within the TTL, and an eviction trades that bound for
 * possible re-emission if the user returns after the TTL — the
 * standard funnel-window contract, spec-pinned.
 */
object StreamingFunnel {

  case class Ev(user_id: Long, event_type: String, time: Long, event_id: Long,
                event_time: java.sql.Timestamp)
  case class Progress(completed: Int, lastTime: Long)
  case class Completion(user_id: Long, step_idx: Long, step: String, reached_at: Long)

  private def advance(steps: IndexedSeq[String], idleMs: Long)(
      userId: Long, events: Iterator[Ev], state: GroupState[Progress]): Iterator[Completion] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var p = state.getOption.getOrElse(Progress(0, Long.MinValue))
      val out = Seq.newBuilder[Completion]
      events.toSeq.sortBy(e => (e.time, e.event_id)).foreach { e =>
        if (p.completed < steps.length && e.event_type == steps(p.completed) &&
          (p.completed == 0 || e.time > p.lastTime)) {
          p = Progress(p.completed + 1, e.time)
          out += Completion(userId, p.completed.toLong, steps(p.completed - 1), e.time)
        }
      }
      if (p.completed > 0 || state.exists) {
        state.update(p) // incl. the completed tombstone (doc above)
        state.setTimeoutTimestamp(
          math.max(p.lastTime + idleMs, state.getCurrentWatermarkMs() + 1))
      }
      out.result().iterator
    }
  }

  /** `events` is a STREAMING eventFrame; completions emit in the batch
    * that delivers the qualifying event (no watermark holdback — the
    * watermark only drives idle-state eviction). */
  def completions(events: DataFrame, steps: Seq[String],
                  lateness: String = "2 hours",
                  idleMs: Long = 90L * 86400 * 1000): Dataset[Completion] = {
    require(steps.nonEmpty && steps.distinct == steps, s"bad funnel steps: $steps")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("event_time", timestamp_millis(col("time")))
      .withWatermark("event_time", lateness)
      .select(col("user_id"), col("event_type"), col("time"), col("event_id"),
        col("event_time"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        advance(steps.toIndexedSeq, idleMs))
  }
}
