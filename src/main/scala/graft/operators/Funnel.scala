package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential-pattern (funnel) matching: per key, the earliest step-1
  * event, then the earliest step-2 event strictly after it within a
  * horizon, then step-3 likewise — computed as chained conditional-min
  * windows over ONE key partitioning, so Catalyst plans a single
  * exchange + sort with stacked Window nodes (no self-joins, no
  * per-step passes; PlanAuditSpec asserts the one-exchange shape on
  * q88). Each step's window min is a whole-partition frame, and each
  * step's condition references the previous step's (per-key-constant)
  * result, which is what makes the chain expressible without joins.
  */
object Funnel {

  /** Adds per-key step timestamps t1/t2/t3 for the event-type sequence
    * `steps` (exactly 3), where step i+1 must fall strictly after step i
    * and within `horizonHours` of it. Every row of a key carries the
    * same t1/t2/t3. */
  def stepTimes(events: DataFrame, keyCol: String, tsCol: String,
                typeCol: String, steps: Seq[String],
                horizonHours: Int): DataFrame = {
    require(steps.size == 3, s"expected 3 funnel steps, got ${steps.size}")
    val w = Window.partitionBy(keyCol)
    val horizon = expr(s"interval $horizonHours hours")
    events
      .withColumn("t1",
        min(when(col(typeCol) === steps(0), col(tsCol))).over(w))
      .withColumn("t2",
        min(when(col(typeCol) === steps(1) && col(tsCol) > col("t1") &&
          col(tsCol) <= col("t1") + horizon, col(tsCol))).over(w))
      .withColumn("t3",
        min(when(col(typeCol) === steps(2) && col(tsCol) > col("t2") &&
          col(tsCol) <= col("t2") + horizon, col(tsCol))).over(w))
  }

  /** One row per key with its step timestamps (nulls where the funnel
    * stalled). */
  def perKey(events: DataFrame, keyCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             horizonHours: Int): DataFrame =
    stepTimes(events, keyCol, tsCol, typeCol, steps, horizonHours)
      .groupBy(keyCol)
      .agg(min("t1").as("t1"), min("t2").as("t2"), min("t3").as("t3"))

  /** Two-step funnel with a NEGATIVE condition — "A then B within the
    * horizon, with no C strictly between them": per key, t1 = earliest
    * `stepA`, t2 = earliest `stepB` strictly after t1 within
    * `horizonHours`, and n_blockers = how many `blocker` events fall in
    * the OPEN interval (t1, t2). The exclusion is the part plain
    * funnels can't express (MATCH_RECOGNIZE's `A C* B` negation,
    * relationally): a clean conversion requires t2 non-null AND
    * n_blockers = 0, and the count — not just a flag — feeds triage.
    *
    * Same single-exchange shape as [[stepTimes]]: three whole-partition
    * window aggregates over ONE key partitioning (the blocker count is
    * a windowed conditional sum referencing the per-key-constant t1/t2
    * bounds), then the per-key reduction. A key with no t2 has a NULL
    * upper bound, so the blocker condition is NULL → counted 0 (no
    * blockers reported for stalled funnels; the t2 NULL already marks
    * them). */
  def perKeyWithExclusion(events: DataFrame, keyCol: String, tsCol: String,
                          typeCol: String, stepA: String, stepB: String,
                          blocker: String, horizonHours: Int): DataFrame = {
    val w = Window.partitionBy(keyCol)
    val horizon = expr(s"interval $horizonHours hours")
    events
      .withColumn("t1",
        min(when(col(typeCol) === stepA, col(tsCol))).over(w))
      .withColumn("t2",
        min(when(col(typeCol) === stepB && col(tsCol) > col("t1") &&
          col(tsCol) <= col("t1") + horizon, col(tsCol))).over(w))
      .withColumn("_blk",
        sum(when(col(typeCol) === blocker && col(tsCol) > col("t1") &&
          col(tsCol) < col("t2"), 1L).otherwise(0L)).over(w))
      .groupBy(keyCol)
      .agg(min("t1").as("t1"), min("t2").as("t2"),
        max("_blk").as("n_blockers"))
      .filter(col("t1").isNotNull)
  }
}
