package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Behavioral-event operators over the raw event stream (the fixture's
 * `events` table via [[graft.sources.EventsAdapter.eventFrame]]):
 * gap-based sessionization and ordered funnel analysis — the two
 * event-sequence shapes a telemetry/product pipeline runs next to the
 * metric queries.
 *
 * Scale notes (100 TB): both operators shuffle exactly once on
 * `user_id` and keep every later stage on that partitioning —
 * sessionize's window and its session aggregate share the exchange
 * (the group keys extend the partition key), and funnel's per-step
 * joins are all user-keyed so AQE coalesces them onto aligned
 * exchanges. No step is driver-bound; per-user state is the largest
 * single user's event list, never the corpus.
 */
object EventOps {

  private def userTimeWindow =
    Window.partitionBy(col("user_id")).orderBy(col("time"), col("event_id"))

  /**
   * Gap-based sessionization: events of one user belong to the same
   * session while consecutive gaps stay <= `gapMs`; a gap strictly
   * greater than `gapMs` starts a new session. Classic lag-boundary +
   * running-sum formulation — one window over `user_id`, then a
   * session aggregate on the SAME partitioning (no second exchange).
   *
   * Output: (user_id, session_idx, session_start, session_end,
   * duration_ms, n_events, value_sum) with `session_idx` numbering a
   * user's sessions from 1 in time order. `value_sum` goes through
   * DECIMAL(28,10) (exact, order-independent) and lands as DOUBLE —
   * the engine's standard determinism discipline.
   */
  def sessionize(events: DataFrame, gapMs: Long): DataFrame = {
    require(gapMs > 0, s"gapMs must be positive, got $gapMs")
    val w = userTimeWindow
    val boundary =
      when(col("time") - lag(col("time"), 1).over(w) > gapMs, 1L)
        .when(lag(col("time"), 1).over(w).isNull, 1L)
        .otherwise(0L)
    events
      .withColumn("new_session", boundary)
      .withColumn("session_idx",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("time")).as("session_start"),
        max(col("time")).as("session_end"),
        (max(col("time")) - min(col("time"))).as("duration_ms"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,10)")).cast("double").as("value_sum"))
  }

  /**
   * Ordered funnel: for `steps = [s1, s2, ...]`, a user reaches step i
   * when an event of type `steps(i)` occurs STRICTLY AFTER the time at
   * which the user reached step i-1 (first-touch semantics: the
   * reached-time of a step is the MINIMUM qualifying time). Emits one
   * row per step with the absolute user count and the conversion rate
   * relative to step 1.
   *
   * Shape: step count is a pipeline constant, so this is a bounded
   * chain of user-keyed min-aggregates and joins — each join's both
   * sides are hashed on `user_id` (aligned exchanges), and every
   * intermediate frame only shrinks (users still in the funnel). Each
   * step's count re-derives its prefix chain (steps² event scans total
   * — fine at the 3-5 steps funnels have); a caller with a DEEP chain
   * should persist the reached frames between steps.
   */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, s"funnel steps must be distinct: $steps")
    // reached(i): (user_id, t) = first time the user completed steps 0..i
    val first = events.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("time")).as("t"))
    val reached = steps.tail.scanLeft(first) { (prev, step) =>
      events.filter(col("event_type") === step)
        .join(prev.withColumnRenamed("t", "prev_t"), Seq("user_id"))
        .filter(col("time") > col("prev_t"))
        .groupBy(col("user_id")).agg(min(col("time")).as("t"))
    }
    val counts = reached.zipWithIndex.map { case (r, i) =>
      r.agg(count(lit(1)).cast("long").as("n_users"))
        .select(lit(i + 1L).as("step_idx"), lit(steps(i)).as("step"), col("n_users"))
    }.reduce(_ unionAll _)
    val base = counts.filter(col("step_idx") === 1L)
      .select(col("n_users").as("base_users"))
    counts.crossJoin(broadcast(base))
      .select(col("step_idx"), col("step"), col("n_users"),
        round(col("n_users").cast("double") / col("base_users"), 6).as("conversion"))
  }

  /**
   * Cohort retention matrix: a user's cohort is the period (e.g. week)
   * of their FIRST event on a grid anchored at `anchorMs`; the matrix
   * counts, for each (cohort, period offset), the distinct users of
   * that cohort active in that period, with `retention` relative to
   * the cohort's size (offset 0 is 1.0 by construction).
   *
   * Shape: first-event aggregate (user-keyed shuffle) → events joined
   * back on the SAME key (aligned exchanges) → one (cohort, offset)
   * distinct-count aggregate (two-phase partial distinct) → cohort
   * sizes broadcast back (|cohorts|-sized). Nothing user- or
   * event-sized crosses the driver.
   */
  def cohortRetention(events: DataFrame, anchorMs: Long, periodMs: Long,
                      maxOffset: Int): DataFrame = {
    require(periodMs > 0, s"periodMs must be positive, got $periodMs")
    require(maxOffset >= 0, s"maxOffset must be non-negative, got $maxOffset")
    val cohorts = events.groupBy(col("user_id"))
      .agg(min(col("time")).as("first_time"))
      .select(col("user_id"),
        floor((col("first_time") - lit(anchorMs)) / lit(periodMs)).as("cohort"))
    val activity = events
      .select(col("user_id"),
        floor((col("time") - lit(anchorMs)) / lit(periodMs)).as("period"))
      .join(cohorts, Seq("user_id"))
      .withColumn("offset", col("period") - col("cohort"))
      .filter(col("offset") <= maxOffset)
      .groupBy(col("cohort"), col("offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
    val sizes = cohorts.groupBy(col("cohort"))
      .agg(countDistinct(col("user_id")).as("cohort_users"))
    activity.join(broadcast(sizes), Seq("cohort"))
      .select(col("cohort"), col("offset"), col("active_users"), col("cohort_users"),
        round(col("active_users").cast("double") / col("cohort_users"), 6).as("retention"))
  }

  /**
   * Rolling active users — DAU plus trailing-`windowDays` WAU per day,
   * with the sliding distinct computed TWICE: exactly (the audit half —
   * a user-day fanout into each covered window, distinct-counted) and
   * via MERGEABLE per-day HLL sketches (Spark's DataSketches
   * `hll_sketch_agg`/`hll_union_agg`) whose union per window is the
   * 100 TB path — day sketches are KB-sized, so a trailing window
   * merges |window| sketches instead of re-scanning |window| days of
   * events. Output carries the exact counts and a hash-verified
   * `wau_in_band` boolean; the engine-specific estimate itself never
   * crosses the oracle boundary (the vocab_hll discipline).
   */
  def rollingActiveUsers(events: DataFrame, anchorMs: Long, windowDays: Int = 7,
                         band: Double = 0.05): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    // lazily materialized ONCE: three consumers (daily, exact fanout,
    // sketch fanout) would otherwise each re-scan events and re-run the
    // user-day distinct
    val byDay = events
      .select(floor((col("time") - lit(anchorMs)) / lit(86400000L)).as("day"),
        col("user_id"))
      .distinct()
      .localCheckpoint(eager = false)
    val maxDay = byDay.agg(max(col("day")).as("max_day"))
    def fanForward(df: DataFrame): DataFrame = df
      .select(col("*"), explode(sequence(lit(0), lit(windowDays - 1))).as("off"))
      .withColumn("wday", col("day") + col("off"))
      .crossJoin(broadcast(maxDay))
      .filter(col("wday") <= col("max_day"))
    val daily = byDay.groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("dau"),
        hll_sketch_agg(col("user_id")).as("sk"))
    val exact = fanForward(byDay)
      .groupBy(col("wday").as("day"))
      .agg(countDistinct(col("user_id")).as("wau_exact"))
    val est = fanForward(daily.select(col("day"), col("sk")))
      .groupBy(col("wday").as("day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("wau_est"))
    daily.select(col("day"), col("dau"))
      .join(exact, Seq("day"))
      .join(est, Seq("day"))
      .select(col("day"), col("dau"), col("wau_exact"),
        (abs(col("wau_est") - col("wau_exact")).cast("double") / col("wau_exact")
          <= lit(band)).as("wau_in_band"))
  }
}
