package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM-style single changepoint location over a per-group ordered
  * series: the point where the cumulative sum deviates most from the
  * uniform-growth line. The classic statistic max_i |S_i − (i/n)·S_n|
  * is carried CROSS-MULTIPLIED as |n·S_i − i·S_n| — all-integer, so
  * the argmax is exact on both engines where the float i/n form would
  * sit on rounding boundaries (the q193 above-mean trick applied to a
  * whole prefix curve).
  *
  * Products go through DECIMAL(19,0)×DECIMAL(19,0) → DECIMAL(38,0)
  * (the q185 pre-cast discipline: S_i is itself an aggregate, its
  * product with n exceeds BIGINT at scale and ANSI would throw); the
  * peak statistic EXITS as a digit string (q184 wide-accumulator
  * convention — no DecimalType in the output schema).
  *
  * Plan: the caller supplies the collapsed series (one row per
  * (grp, ord), ord unique within grp — e.g. daily totals); all four
  * window frames (row index, running sum, group count, group total)
  * and the peak filter share ONE grp-hash exchange + sort. No joins,
  * no global windows.
  */
object Changepoint {

  /** (grp, n_points, total, peak_ord, peak_stat) — peak_ord is the
    * FIRST order key attaining the maximum deviation (min-ord
    * tiebreak), peak_stat the max |n·S_i − i·S_n| as a digit string. */
  def cusumArgmax(series: DataFrame, grpCol: String, orderCol: String,
                  valueCol: String): DataFrame = {
    val byOrd = Window.partitionBy("grp").orderBy("ord")
    val whole = Window.partitionBy("grp")
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    series
      .select(col(grpCol).as("grp"), col(orderCol).as("ord"),
        col(valueCol).cast("long").as("v"))
      .withColumn("i", row_number().over(byOrd).cast("long"))
      .withColumn("s", sum("v").over(byOrd))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("tot", sum("v").over(whole))
      .withColumn("stat", abs(dec(col("n")) * dec(col("s"))
        - dec(col("i")) * dec(col("tot"))))
      .withColumn("mx", max("stat").over(whole))
      .filter(col("stat") === col("mx"))
      .groupBy("grp")
      .agg(max("n").as("n_points"), max("tot").as("total"),
        min("ord").as("peak_ord"),
        max("stat").cast("string").as("peak_stat"))
  }
}
