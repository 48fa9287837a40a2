package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join — for every left row, the most recent right value AT OR
 * BEFORE its timestamp with the same key (optionally within a
 * tolerance). The canonical time-series enrichment Spark has no native
 * operator for; per the engine's design order this is implemented as a
 * COMPOSITION of built-ins rather than a custom SparkPlan: tag the two
 * sides, union them, and take `last(value, ignoreNulls)` over a
 * per-key time-ordered running window — one shuffle on the key, no
 * range join, no per-row probe. The oracle cross-validates the
 * composition against DuckDB's NATIVE `ASOF LEFT JOIN`, so the
 * semantics (inclusive at-or-before, left rows preserved, null when no
 * predecessor) are pinned engine-independently.
 *
 * Right rows sort BEFORE left rows at equal timestamps (inclusive
 * `>=`). The right side must be unique per (key, time) — pre-aggregate
 * duplicates (e.g. `max_by`) or the match would be order-dependent;
 * callers get a loud error if uniqueness is violated at plan-build
 * time is impossible, so the contract is documented + spec-pinned
 * instead.
 *
 * Scale: both sides shuffle once on `keyCol` (aligned exchanges, the
 * union shares them); window state is one value. Skewed keys follow
 * the same escalation as every per-key window here (salt or split the
 * hot key's time range).
 */
object AsOfJoin {

  /**
   * `left` keeps ALL its columns; gains `asof_value` and `asof_time`
   * (nulls when no right row precedes). `right` is (keyCol, timeCol,
   * valueCol) — unique per (key, time).
   */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
           valueCol: String, toleranceMs: Option[Long] = None): DataFrame = {
    toleranceMs.foreach(t => require(t > 0, s"tolerance must be positive, got $t"))
    require(!left.columns.exists(c => c == "asof_value" || c == "asof_time"),
      "left already has an asof_value/asof_time column")
    // withColumn would silently clobber these and re-emit internal values
    val reserved = Set("__side", "__rv", "__rt", "__last_rv", "__last_rt")
    require(!left.columns.exists(reserved),
      s"left uses a reserved internal column name (${left.columns.filter(reserved).mkString(", ")})")
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast("double"))
      .withColumn("__rt", lit(null).cast("long"))
    val r = right.select(
      col(keyCol), col(timeCol),
      lit(0).as("__side"),
      col(valueCol).cast("double").as("__rv"),
      col(timeCol).cast("long").as("__rt"))
    // align schemas: right lacks the left's payload columns
    val rAligned = leftCols.filterNot(c => c == keyCol || c == timeCol)
      .foldLeft(r)((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select((leftCols ++ Seq("__side", "__rv", "__rt")).map(col): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.select((leftCols ++ Seq("__side", "__rv", "__rt")).map(col): _*)
      .unionByName(rAligned)
      .withColumn("__last_rv", last(col("__rv"), ignoreNulls = true).over(w))
      .withColumn("__last_rt", last(col("__rt"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val inTol = toleranceMs match {
      case Some(t) => col("__last_rt").isNotNull && col(timeCol) - col("__last_rt") <= t
      case None => col("__last_rt").isNotNull
    }
    joined.select(leftCols.map(col) ++ Seq(
      when(inTol, col("__last_rv")).as("asof_value"),
      when(inTol, col("__last_rt")).as("asof_time")): _*)
  }
}
