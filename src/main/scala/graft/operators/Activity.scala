package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rolling-window distinct actives — the DAU/WAU/MAU family: for every
  * day with any activity, the number of DISTINCT keys active in the
  * trailing `windowDays`-day window. The reference's analytics surface
  * stops at plain GROUP BY counts (optimade_database/Optimade_Server/
  * server.py:106-120 filters, no windowed distincts); this is the
  * standard engagement statistic layered on the same scan.
  *
  * A windowed COUNT(DISTINCT) cannot be expressed as a Spark window
  * function (distinct aggregates are unsupported over frames), and a
  * day×day range join is quadratic in the day span. Instead: forward
  * scatter. Each distinct (key, day) pair contributes to exactly
  * `windowDays` target days — explode that bounded fan-out, keep only
  * target days that actually occur in the data, and count distinct keys
  * per target day.
  *
  * Scale: the scatter is `windowDays` × the DISTINCT (key, day) frame —
  * a fixed small constant, never day-span² and never rows². Two
  * shuffles total: the (key, day) distinct and the per-day distinct
  * count (map-side partial distinct collapses duplicates before the
  * exchange). The observed-day filter is a broadcast semi join on a
  * day-grid-sized table. No windows anywhere, so no global sort and
  * nothing partitions by a skewed key: the count key is the DAY, and
  * per-day cardinality is bounded by the true active population.
  */
object Activity {

  /** (day, n_active_w, n_today) for every day present in `df`:
    * `n_active_w` = distinct `keyCol` values with activity in
    * [day − windowDays + 1, day], `n_today` = distinct keys active on
    * the day itself. Output ordered by the caller. */
  def rollingActive(df: DataFrame, keyCol: String, tsCol: String,
                    windowDays: Int): DataFrame = {
    require(windowDays >= 1 && windowDays <= 366, "windowDays: 1..366")
    val pairs = df
      .select(col(keyCol).cast("long").as("k"), to_date(col(tsCol)).as("day"))
      .distinct()
    val days = pairs.select("day").distinct()
    val scattered = pairs.select(col("k"), col("day").as("src_day"),
      explode(sequence(col("day"), date_add(col("day"), windowDays - 1)))
        .as("day"))
    scattered
      .join(broadcast(days), Seq("day"), "left_semi")
      .groupBy("day")
      .agg(countDistinct(col("k")).as("n_active_w"),
        countDistinct(when(col("src_day") === col("day"), col("k")))
          .as("n_today"))
  }
}
