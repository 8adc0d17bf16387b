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

  /** One-sided CUSUM drift ALARMS — the sequential (live) detector next
    * to [[cusumArgmax]]'s retrospective locator: per group, walk the
    * series in (us, id) order, accumulate d = v − ref, and flag every
    * point where cum − min(cum so far) ≥ threshold — "the level has
    * drifted up by ≥ h since its best recent baseline", Page's CUSUM
    * with the reference drift folded into `ref`. All-integer (the
    * retrospective form needs S_n and can never stream; THIS form's
    * state is two longs, which is why AnomalyStreams can run it live —
    * the spec proves stream ≡ these rows). Row values are bounded by
    * n·max|v−ref| per group: fits BIGINT through ~10⁹ rows/group at
    * cent scale; beyond that, pre-aggregate the series (the q212
    * daily-totals shape) rather than widening to DECIMAL.
    *
    * Output: every alarm row (grp, us, id, cum, gap). Plan: two
    * stacked group-partitioned running windows over one exchange —
    * never global, no joins. */
  def cusumAlarms(series: DataFrame, grpCol: String, usCol: String,
                  idCol: String, valCol: String, ref: Long,
                  threshold: Long): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1: $threshold")
    val run = Window.partitionBy("grp").orderBy(col("us"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    series
      .select(col(grpCol).as("grp"), col(usCol).as("us"),
        col(idCol).as("id"), col(valCol).cast("long").as("v"))
      .withColumn("cum", sum(col("v") - lit(ref)).over(run))
      // Page's recursion gap_i = max(0, gap_{i−1} + d_i) ⟺ the baseline
      // min includes the EMPTY prefix S₀ = 0 — least(0, running min),
      // not the bare window min (which would alarm on a lone first
      // spike only because no baseline existed yet)
      .withColumn("runmin", least(lit(0L), min(col("cum")).over(run)))
      .withColumn("gap", col("cum") - col("runmin"))
      .filter(col("gap") >= threshold)
      .select(col("grp"), col("us"), col("id"), col("cum"), col("gap"))
  }

  /** First alarm per group + the alarm-row count — the q302 report
    * shape over [[cusumAlarms]]. */
  def firstAlarms(series: DataFrame, grpCol: String, usCol: String,
                  idCol: String, valCol: String, ref: Long,
                  threshold: Long): DataFrame =
    cusumAlarms(series, grpCol, usCol, idCol, valCol, ref, threshold)
      .groupBy("grp")
      .agg(min(struct(col("us"), col("id"), col("gap"))).as("_f"),
        count(lit(1)).as("n_alarm_rows"))
      .select(col("grp"), col("_f.us").as("first_us"),
        col("_f.id").as("first_id"), col("_f.gap").as("first_gap"),
        col("n_alarm_rows"))
}
