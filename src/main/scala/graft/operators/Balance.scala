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
}
