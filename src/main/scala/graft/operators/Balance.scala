package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Clamped-at-zero running balance — inventory semantics: stock can
  * never go negative, a withdrawal against an empty shelf is lost, and
  * the recurrence is s_i = max(0, s_{i−1} + x_i). That recurrence
  * looks inherently sequential (each row needs its predecessor's
  * CLAMPED value), but it has a closed window form:
  *
  *   s_i = P_i − min(0, min_{j≤i} P_j),   P = unclamped prefix sum
  *
  * (each clamp event "writes off" exactly the depth of the deepest
  * prefix valley so far; BalanceSpec proves the identity against the
  * sequential fold on random flows). So the whole computation is two
  * running windows over the SAME (key, order) — one exchange, one
  * sort, no iteration, no cross-row dependency chain — and it scales
  * like any partitioned window: per-key history length bounds the
  * sort, nothing global.
  *
  * All-integer (flows cast to long; sums exact).
  */
object Balance {

  /** Per-row clamped running balance of `flowCol` within `keyCol`,
    * ordered by `ordCols` (must be a total order within each key for
    * determinism). Output: input columns + `balance`. */
  def clampedRunning(df: DataFrame, keyCol: String, ordCols: Seq[String],
                     flowCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(ordCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("_p", sum(col(flowCol).cast("long")).over(w))
      .withColumn("balance",
        col("_p") - least(lit(0L), min(col("_p")).over(w)))
      .drop("_p")
  }

  /** Maximum drawdown of the running sum of `flowCol` per `keyCol`:
    * dd_i = max_{j≤i} P_j − P_i and the result is max_i dd_i — the
    * deepest fall from a running peak, the standard risk statistic
    * over a signed P&L series. Same window economics as
    * [[clampedRunning]]: running sum + running max share ONE
    * (key, order) exchange and sort, then a plain groupBy collapses
    * per key — nothing sequential, nothing global. All-integer.
    *
    * Output per key: `peak` (max prefix sum), `final` (last prefix
    * sum), `max_drawdown`. An all-ascending series reports 0.
    */
  def maxDrawdown(df: DataFrame, keyCol: String, ordCols: Seq[String],
                  flowCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(ordCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("_p", sum(col(flowCol).cast("long")).over(w))
      .withColumn("_dd", max(col("_p")).over(w) - col("_p"))
      .groupBy(keyCol)
      .agg(max(col("_p")).as("peak"),
        // final prefix sum == plain sum of flows (order-independent)
        sum(col(flowCol).cast("long")).as("final"),
        max(col("_dd")).as("max_drawdown"))
  }
}
