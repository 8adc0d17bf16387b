package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands consecutive-run detection — "longest daily streak"
  * engagement analytics over an event log (reference analog: the
  * activity/recency questions in the reference's SQL scenario corpus;
  * the islands technique itself is classic SQL folklore).
  *
  * The trick: within a key, over DISTINCT integer day indexes in
  * ascending order, `day − row_number()` is constant exactly along a
  * run of consecutive days — so one partitioned window plus two
  * groupBys turn runs into rows with no iteration and no self-join.
  * Everything is keyed by the entity: the window and both aggregations
  * share the same hash partitioning, nothing global, all-integer.
  */
object Streaks {

  /** Per-key streak profile over integer "day" values.
    *
    * Input: (keyCol, dayCol) rows, duplicates allowed (deduped here).
    * Output per key: `n_days` (distinct active days), `n_streaks`
    * (maximal consecutive runs), `max_streak` (longest run length),
    * `last_day` (most recent active day).
    */
  def dailyStreaks(df: DataFrame, keyCol: String, dayCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(dayCol))
    df.select(col(keyCol), col(dayCol).cast("long").as(dayCol))
      .distinct()
      .withColumn("_island", col(dayCol) - row_number().over(w))
      .groupBy(col(keyCol), col("_island"))
      .agg(count(lit(1)).as("_len"), max(col(dayCol)).as("_end"))
      .groupBy(keyCol)
      .agg(sum(col("_len")).as("n_days"),
        count(lit(1)).as("n_streaks"),
        max(col("_len")).as("max_streak"),
        max(col("_end")).as("last_day"))
  }
}
