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
}
