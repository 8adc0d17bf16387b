package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) interval construction: collapse a
  * keyed change log into validity intervals — one row per RUN of equal
  * consecutive values, with `valid_from` = the run's first timestamp
  * and `valid_to` = the next run's start (NULL for the current run).
  * This is the history-table build step downstream of
  * [[ChangeCapture.snapshotDiff]]: diffs say WHAT changed, SCD2 says
  * WHEN each value was in effect.
  *
  * Plan shape: everything happens inside ONE key partitioning — a
  * change-point flag (`lag` ≠ value, null-safe), a running sum to
  * number runs, a (key, run) aggregate, and a `lead` for valid_to.
  * One exchange on the key, window work bounded per key; the classic
  * gaps-and-islands shape that survives any corpus size because no
  * window is ever unpartitioned (cf. Curation's global-window ban).
  *
  * Ordering inside a key is (ts, tiebreak) — the caller supplies a
  * unique tiebreak column so equal-timestamp updates have a defined
  * order (and the q101 oracle mirrors the same pair ordering).
  */
object Scd {

  /** Collapse (key, ts, value) changes into SCD2 intervals. Output:
    * (key, value, valid_from, valid_to, n_obs) — n_obs = observations
    * in the run (audit column proving no row was lost). */
  def intervals(df: DataFrame, keyCol: String, tsCol: String,
                tieCol: String, valCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val flagged = df.withColumn("_chg",
      when(lag(col(valCol), 1).over(w) <=> col(valCol), 0L).otherwise(1L))
    val numbered = flagged.withColumn("_run",
      sum(col("_chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = numbered.groupBy(col(keyCol), col("_run"))
      .agg(first(col(valCol)).as("value"),
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_obs"))
    val w2 = Window.partitionBy(col(keyCol)).orderBy(col("_run"))
    runs.withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .select(col(keyCol), col("value"), col("valid_from"), col("valid_to"),
        col("n_obs"))
  }

  /** Point-in-time (PIT) enrichment of a fact table against an SCD2
    * dimension: each fact row picks the dimension version whose
    * [valid_from, valid_to) interval contains the fact timestamp —
    * implemented NOT as an interval-containment join (whose inequality
    * pair defeats equi-join planning) but as the as-of carry: union-tag
    * facts and version starts, ONE key-partitioned running window
    * carries the latest version value forward, facts read it
    * (AsofJoin's single-shuffle plan — because SCD2 intervals partition
    * time per key, "latest version started at-or-before ts" IS the
    * containing interval). Facts before the first version drop (inner
    * semantics). A fact AT a version boundary sees the NEW version
    * (valid_from inclusive — the dim side sorts before the fact side).
    *
    * Precondition: `dims` has at most one row per (key, valid_from) —
    * true for [[intervals]] output unless two same-key observations
    * share one timestamp (zero such collisions in the driver data; a
    * violation would make the carried value order-dependent).
    *
    * Output: (keyCol, fact_id, factTs, version).
    */
  def pitJoin(facts: DataFrame, dims: DataFrame, keyCol: String,
              factTs: String, factIdCol: String,
              validFrom: String, valCol: String): DataFrame = {
    val d = dims.select(col(keyCol).as("k"), col(validFrom).as("ts"),
      lit(0).as("side"), lit(null).cast("long").as("fact_id"),
      col(valCol).cast("string").as("v"))
    val f = facts.select(col(keyCol).as("k"), col(factTs).as("ts"),
      lit(1).as("side"), col(factIdCol).cast("long").as("fact_id"),
      lit(null).cast("string").as("v"))
    val w = Window.partitionBy("k").orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    d.unionByName(f)
      .withColumn("version", last(col("v"), ignoreNulls = true).over(w))
      .filter(col("side") === 1 && col("version").isNotNull)
      .select(col("k").as(keyCol), col("fact_id"),
        col("ts").as(factTs), col("version"))
  }
}
