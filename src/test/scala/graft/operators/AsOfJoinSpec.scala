package graft.operators

import graft.SparkTestBase

/** As-of join composition specs: inclusive boundary, null for
  * no-predecessor, tolerance cutoff, left-payload preservation. */
class AsOfJoinSpec extends SparkTestBase {

  private def frames = {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 7L, 100L, "a"), (2L, 7L, 250L, "b"), (3L, 7L, 50L, "c"),
      (4L, 9L, 100L, "d")) // user 9 has no right rows at all
      .toDF("event_id", "user_id", "time", "payload")
    val right = Seq((7L, 100L, 1.5), (7L, 200L, 2.5))
      .toDF("user_id", "time", "v")
    (left, right)
  }

  test("at-or-before is INCLUSIVE; earlier left rows get null; payload survives") {
    val (left, right) = frames
    val got = AsOfJoin.asOf(left, right, "user_id", "time", "v")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Long]), r.getString(3))).toMap
    assert(got(1L) == (Some(1.5), Some(100L), "a")) // equal time matches
    assert(got(2L) == (Some(2.5), Some(200L), "b")) // latest predecessor
    assert(got(3L) == (None, None, "c"))            // before all right rows
    assert(got(4L) == (None, None, "d"))            // keyless user preserved
  }

  test("tolerance nulls out stale matches without dropping left rows") {
    val (left, right) = frames
    val got = AsOfJoin.asOf(left, right, "user_id", "time", "v",
      toleranceMs = Some(40L))
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    assert(got(1L).contains(1.5))  // gap 0 <= 40
    assert(got(2L).isEmpty)        // gap 50 > 40 → null, row kept
    assert(got.size == 4)
  }
}
