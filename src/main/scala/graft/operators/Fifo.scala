package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** FIFO inventory consumption — "which receipts are still on the shelf
  * after eating oldest-first": with receipts r_1..r_n in age order and
  * a total consumed quantity C per key, the remaining quantity of
  * receipt i is
  *
  *   rem_i = clamp(cumR_i − C, 0, qty_i)
  *
  * (cumR = running receipt total: everything before the consumption
  * frontier is gone, the receipt straddling it is partial, everything
  * after survives intact). The sequential matching collapses to ONE
  * key-partitioned running window plus a per-key consumption aggregate
  * joined back — no iteration, no receipt×consumption pairing join.
  * All-integer; FifoSpec proves the closed form ≡ a sequential
  * oldest-first eater.
  */
object Fifo {

  /** Per receipt row: input columns + `remaining` after FIFO-consuming
    * `consumed`'s total `qtyCol` per `keyCol`. `ordCols` must totally
    * order receipts within a key (age order). */
  def remainingByReceipt(receipts: DataFrame, consumed: DataFrame,
                         keyCol: String, ordCols: Seq[String],
                         qtyCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(ordCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val c = consumed.groupBy(keyCol)
      .agg(sum(col(qtyCol).cast("long")).as("_c"))
    receipts
      .withColumn("_cum", sum(col(qtyCol).cast("long")).over(w))
      .join(c, Seq(keyCol), "left")
      .na.fill(0L, Seq("_c"))
      .withColumn("remaining",
        greatest(lit(0L), least(col(qtyCol).cast("long"),
          col("_cum") - col("_c"))))
      .drop("_cum", "_c")
  }
}
