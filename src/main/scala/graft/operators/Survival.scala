package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier life-table components — the integer-exact core of
  * survival analysis over right-censored durations (reference analog:
  * time-to-completion / time-to-failure questions the reference's SQL
  * scenario corpus asks of order lifecycles, e.g.
  * mofdbsql_database/mofdb_test/test.py lead-time aggregations; the KM
  * estimator itself is public-domain statistics).
  *
  * Input: one row per SUBJECT with an integer duration `durCol` and an
  * event indicator `eventCol` (1 = event observed at that duration,
  * 0 = right-censored there). Output: one row per (stratum, observed
  * duration t) carrying
  *   d        — events at exactly t,
  *   c        — censorings at exactly t,
  *   at_risk  — subjects with duration ≥ t (the KM risk set; by the
  *              usual convention subjects censored at t are still at
  *              risk at t).
  *
  * The survival curve Ŝ(t) = Π (1 − d/at_risk) is a float product left
  * to the consumer — emitting the integer components keeps the result
  * exactly hash-matchable across engines (the avg()-class float ground
  * rule in CLAUDE.md).
  *
  * Scale shape: one groupBy collapses subjects to ≤|distinct durations|
  * rows per stratum, then ONE stratum-partitioned window (ordered by
  * duration DESC) turns suffix counts into the risk set — no global
  * window, no join back to the subject table, no per-subject state.
  */
object Survival {

  /** KM components per (grpCol, durCol). `eventCol` must be 0/1. */
  def kmComponents(df: DataFrame, grpCol: String, durCol: String,
                   eventCol: String): DataFrame = {
    val byTime = df.groupBy(col(grpCol), col(durCol))
      .agg(sum(col(eventCol).cast("long")).as("d"),
        sum((lit(1L) - col(eventCol).cast("long"))).as("c"))
    // at_risk(t) = Σ_{t' ≥ t} (d + c): running sum over durations DESC
    val w = Window.partitionBy(grpCol).orderBy(col(durCol).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    byTime.withColumn("at_risk", sum(col("d") + col("c")).over(w))
  }
}
