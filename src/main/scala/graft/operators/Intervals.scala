package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing (the "gaps and islands" operator): merge a
  * per-key multiset of possibly-overlapping half-open integer intervals
  * [start, end) into their maximal disjoint unions. The workhorse of
  * validity-interval compaction, coverage accounting and downtime
  * reports (reference analog: the per-provider availability windows of
  * `optimade_database/Optimade_Server/server.py` are reduced one list
  * at a time in Python; here the sweep is a relational plan).
  *
  * Algorithm (one window pass, no self-join): order each key's
  * intervals by the total order (start, end, id); an interval opens a
  * new island iff it starts strictly after the running max end of all
  * PRECEDING intervals (half-open semantics: touching intervals
  * [a,b),[b,c) chain into one island); the island index is the running
  * sum of those flags; a final groupBy (key, island) takes min(start),
  * max(end), count.
  *
  * Determinism: all columns integral; rows with identical
  * (start, end, id) cannot exist (id unique), so the order is total and
  * both engines compute identical flags. Scale: both windows and the
  * groupBy hash on the key — ONE exchange, per-key local sweep,
  * no interval²  term (the classic self-join formulation is quadratic
  * per key; this is n log n sort per key).
  */
object Intervals {

  /** Merge per-key intervals. Input cols: keyCol, idCol (unique
    * tie-break), startCol/endCol (integral, half-open). Returns
    * (key, island_idx, start, end, n_intervals) sorted semantics left
    * to the caller. */
  def mergeIntervals(df: DataFrame, keyCol: String, idCol: String,
                     startCol: String, endCol: String): DataFrame = {
    val in = df.select(col(keyCol).as("key"), col(idCol).as("id"),
      col(startCol).cast("long").as("start"), col(endCol).cast("long").as("end"))
    val byKey = Window.partitionBy("key").orderBy("start", "end", "id")
    val prevMax = max(col("end")).over(
      byKey.rowsBetween(Window.unboundedPreceding, -1))
    in.withColumn("new_island",
        when(prevMax.isNull || col("start") > prevMax, 1L).otherwise(0L))
      .withColumn("island_idx",
        sum(col("new_island")).over(
          byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("key", "island_idx")
      .agg(min(col("start")).as("start"), max(col("end")).as("end"),
        count(lit(1)).as("n_intervals"))
  }
}
