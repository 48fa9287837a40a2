package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/**
 * Streaming twin of [[graft.operators.AsOfJoin]]: enrich one event type
 * with the most recent value of another type for the same key, as a
 * continuous query — the canonical "attach latest state to the stream"
 * pattern. One stateful operator over the SINGLE event stream (both
 * sides are type-filters of it, so nothing is read twice): per-user
 * state is the latest right (time, value); right arrivals advance it,
 * left arrivals emit immediately with whatever state precedes them.
 *
 * Within a micro-batch events process in (time, side, event_id) order
 * with right before left at equal timestamps — the batch operator's
 * inclusive at-or-before boundary; equal-time right duplicates resolve
 * to the highest event_id (the arg_max dedup contract). Over a single
 * batch (or in-order delivery) the output EQUALS the batch as-of join —
 * the oracled gate reuses asof_enrich's native-ASOF SQL verbatim. A
 * late right event older than the enriched left cannot retract an
 * emitted row (the StreamingRate posture). Symmetrically, a late LEFT
 * event never borrows a future right value: emission is guarded on
 * state.time <= event.time, so a left older than the retained latest
 * right enriches as null (state keeps only the latest right, so the
 * true predecessor is no longer available — documented degradation,
 * same single-value-state trade as the reference's live-feed path).
 *
 * State: one (time, value) pair per user with right-side activity,
 * evicted `idleMs` past the watermark.
 */
object StreamingAsOf {

  case class Ev(user_id: Long, event_type: String, time: Long, event_id: Long,
                value: Double, event_time: java.sql.Timestamp)
  case class LastR(time: Long, value: Double)
  case class Enriched(event_id: Long, user_id: Long, time: Long, value: Double,
                      asof_value: Option[Double], asof_time: Option[Long])

  private def advance(rightType: String, idleMs: Long)(
      userId: Long, events: Iterator[Ev], state: GroupState[LastR]): Iterator[Enriched] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      var last = state.getOption
      val out = Seq.newBuilder[Enriched]
      events.toSeq
        .sortBy(e => (e.time, if (e.event_type == rightType) 0 else 1, e.event_id))
        .foreach { e =>
          if (e.event_type == rightType) {
            if (last.forall(_.time <= e.time)) last = Some(LastR(e.time, e.value))
          } else {
            // A left event that arrives in a LATER micro-batch than a newer
            // right event must not see that future value: enrich only with
            // state at-or-before the left's own event time (null otherwise).
            val eff = last.filter(_.time <= e.time)
            out += Enriched(e.event_id, userId, e.time, e.value,
              eff.map(_.value), eff.map(_.time))
          }
        }
      last.foreach { l =>
        state.update(l)
        state.setTimeoutTimestamp(math.max(l.time + idleMs, state.getCurrentWatermarkMs() + 1))
      }
      out.result().iterator
    }
  }

  def enrich(events: DataFrame, leftType: String, rightType: String,
             lateness: String = "2 hours",
             idleMs: Long = 90L * 86400 * 1000): Dataset[Enriched] = {
    require(leftType != rightType, "left and right types must differ")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col("event_type") === leftType || col("event_type") === rightType)
      .withColumn("event_time", timestamp_millis(col("time")))
      .withWatermark("event_time", lateness)
      .select(col("user_id"), col("event_type"), col("time"), col("event_id"),
        col("value"), col("event_time"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        advance(rightType, idleMs))
  }
}
