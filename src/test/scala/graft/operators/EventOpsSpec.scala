package graft.operators

import graft.SparkTestBase

/** Sessionization + funnel specs over hand-built event rows. */
class EventOpsSpec extends SparkTestBase {

  // (event_id, user_id, event_type, time, value)
  private def eventsDf(rows: (Long, Long, String, Long, Double)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("event_id", "user_id", "event_type", "time", "value")
  }

  test("sessionize: gap strictly greater than gapMs splits; boundary gap does not") {
    val got = EventOps.sessionize(eventsDf(
      (1L, 7L, "click", 0L, 1.0),
      (2L, 7L, "click", 100L, 2.0),   // gap 100 == gapMs → same session
      (3L, 7L, "click", 201L, 3.0),   // gap 101 > gapMs → new session
      (4L, 9L, "view", 50L, 5.0)),    // other user: own session numbering
      gapMs = 100L)
      .orderBy("user_id", "session_idx").collect()
    assert(got.length == 3)
    val s1 = got(0)
    assert(s1.getAs[Long]("user_id") == 7L && s1.getAs[Long]("session_idx") == 1L)
    assert(s1.getAs[Long]("session_start") == 0L && s1.getAs[Long]("session_end") == 100L)
    assert(s1.getAs[Long]("duration_ms") == 100L && s1.getAs[Long]("n_events") == 2L)
    assert(s1.getAs[Double]("value_sum") == 3.0)
    val s2 = got(1)
    assert(s2.getAs[Long]("session_idx") == 2L && s2.getAs[Long]("n_events") == 1L)
    assert(got(2).getAs[Long]("user_id") == 9L && got(2).getAs[Long]("session_idx") == 1L)
  }

  test("sessionize: time ties fall in one session; single event has zero duration") {
    val got = EventOps.sessionize(eventsDf(
      (1L, 1L, "a", 10L, 1.0), (2L, 1L, "b", 10L, 1.0)), gapMs = 5L).collect()
    assert(got.length == 1 && got(0).getAs[Long]("n_events") == 2L)
    assert(got(0).getAs[Long]("duration_ms") == 0L)
  }

  test("funnel: strictly-after first-touch semantics") {
    val ev = eventsDf(
      // user 1 completes the funnel in order
      (1L, 1L, "signup", 0L, 0.0), (2L, 1L, "view", 10L, 0.0), (3L, 1L, "buy", 20L, 0.0),
      // user 2: view BEFORE signup only → does not reach step 2
      (4L, 2L, "view", 0L, 0.0), (5L, 2L, "signup", 10L, 0.0),
      // user 3: view at the SAME ms as signup → strictly-after excludes it
      (6L, 3L, "signup", 5L, 0.0), (7L, 3L, "view", 5L, 0.0),
      // user 4 never signs up
      (8L, 4L, "view", 0L, 0.0), (9L, 4L, "buy", 1L, 0.0))
    val got = EventOps.funnel(ev, Seq("signup", "view", "buy"))
      .orderBy("step_idx").collect()
    assert(got.map(r => (r.getAs[Long]("step_idx"), r.getAs[String]("step"),
      r.getAs[Long]("n_users"))).toSeq ==
      Seq((1L, "signup", 3L), (2L, "view", 1L), (3L, "buy", 1L)))
    assert(got(0).getAs[Double]("conversion") == 1.0)
    assert(math.abs(got(1).getAs[Double]("conversion") - 0.333333) < 1e-9)
  }

  test("cohortRetention: cohort by first event; offsets count distinct users; offset 0 is 1.0") {
    val ev = eventsDf(
      // user 1: first in period 0, active again in periods 1 and 2 (twice)
      (1L, 1L, "a", 0L, 0.0), (2L, 1L, "a", 100L, 0.0), (3L, 1L, "a", 250L, 0.0),
      (4L, 1L, "a", 260L, 0.0),
      // user 2: first in period 0, never returns
      (5L, 2L, "a", 50L, 0.0),
      // user 3: first in period 1, active in period 2
      (6L, 3L, "a", 150L, 0.0), (7L, 3L, "a", 250L, 0.0))
    val got = EventOps.cohortRetention(ev, anchorMs = 0L, periodMs = 100L, maxOffset = 10)
      .orderBy("cohort", "offset").collect()
      .map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("offset"),
        r.getAs[Long]("active_users"), r.getAs[Long]("cohort_users"),
        r.getAs[Double]("retention"))).toSeq
    assert(got == Seq(
      (0L, 0L, 2L, 2L, 1.0),  // users 1,2
      (0L, 1L, 1L, 2L, 0.5),  // user 1 at t=100
      (0L, 2L, 1L, 2L, 0.5),  // user 1 at t=250/260 (distinct once)
      (1L, 0L, 1L, 1L, 1.0),  // user 3
      (1L, 1L, 1L, 1L, 1.0))) // user 3 at t=250
  }

  test("rollingActiveUsers: trailing window unions days; sketch band holds at tiny scale") {
    val D = 86400000L
    // day 0: users 1,2; day 1: user 2; day 2: user 3
    val ev = eventsDf(
      (1L, 1L, "a", 0L, 0.0), (2L, 2L, "a", 10L, 0.0), (3L, 2L, "a", 20L, 0.0),
      (4L, 2L, "a", D, 0.0), (5L, 3L, "a", 2 * D, 0.0))
    val got = EventOps.rollingActiveUsers(ev, anchorMs = 0L, windowDays = 2)
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    // wau(d) = distinct over days d-1..d: d0 {1,2}; d1 {1,2}; d2 {2,3}
    assert(got == Seq((0L, 2L, 2L, true), (1L, 1L, 2L, true), (2L, 1L, 2L, true)))
  }

  test("funnel: later occurrences can satisfy a step the first occurrence missed") {
    // view happens before signup AND again after → reaches step 2 via the later one
    val ev = eventsDf(
      (1L, 1L, "view", 0L, 0.0), (2L, 1L, "signup", 5L, 0.0), (3L, 1L, "view", 9L, 0.0))
    val got = EventOps.funnel(ev, Seq("signup", "view")).orderBy("step_idx").collect()
    assert(got.map(_.getAs[Long]("n_users")).toSeq == Seq(1L, 1L))
  }
}
