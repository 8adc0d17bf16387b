package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint audit (the Deequ/great-
  * expectations shape, re-expressed as plain aggregations): a rule
  * suite evaluated into one report row per rule — (rule, n_rows,
  * violations, pass) — the gate a 100-TB ingest runs BEFORE publishing
  * a snapshot, where "count the violations" must not cost more than
  * one pass over the data.
  *
  * Three rule classes, each with the cheapest plan that answers it:
  *  - row rules ([[rowAudit]]): ALL predicates evaluated in ONE
  *    map-side-combined aggregation pass — adding a rule adds a
  *    column, not a scan;
  *  - key uniqueness ([[uniqueAudit]]): count vs count-distinct, one
  *    exchange on the key;
  *  - referential integrity ([[fkAudit]]): one LEFT join against the
  *    DISTINCT parent keys counting null matches — never an anti-join
  *    count + separate total (two passes), never a cross join.
  *
  * All-integer output; `pass` = violations == 0. Report frames are
  * rules-sized — union them freely.
  */
object Constraints {

  /** One report row per (name, violation-predicate) rule; every rule is
    * computed in the SAME single aggregation over `df`. */
  def rowAudit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = count(lit(1)).as("_n") +:
      rules.zipWithIndex.map { case ((_, p), i) =>
        sum(when(p, 1L).otherwise(0L)).as(s"_v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    rules.zipWithIndex.map { case ((n, _), i) =>
      one.select(lit(n).as("rule"), col("_n").as("n_rows"),
        coalesce(col(s"_v$i"), lit(0L)).as("violations"))
    }.reduce(_.unionByName(_))
      .withColumn("pass", col("violations") === 0L)
  }

  /** violations = n_rows − distinct key combinations. */
  def uniqueAudit(df: DataFrame, name: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one key column")
    df.agg(count(lit(1)).as("n_rows"),
        count_distinct(col(cols.head), cols.tail.map(col): _*).as("_d"))
      .select(lit(name).as("rule"), col("n_rows"),
        (col("n_rows") - col("_d")).as("violations"))
      .withColumn("pass", col("violations") === 0L)
  }

  /** Additive merge of ROW-rule reports: audit(S ∪ D) = audit(S) +
    * audit(D) rule by rule — the incremental-maintenance identity that
    * lets an append-only ingest keep the quality gate current without
    * rescanning the standing snapshot (q100's merge ≡ rescan, applied
    * to the audit). VALID FOR ROW RULES ONLY: uniqueness and
    * referential rules are not additive — use [[uniqueMerge]]. */
  def mergeReports(reports: DataFrame*): DataFrame = {
    require(reports.nonEmpty, "need at least one report")
    reports.reduce(_.unionByName(_))
      .groupBy("rule")
      .agg(sum("n_rows").as("n_rows"), sum("violations").as("violations"))
      .withColumn("pass", col("violations") === 0L)
  }

  /** Incremental uniqueness: violations(S ∪ D) = (nS + nD) − (dS +
    * |keys(D) \ keys(S)|). The standing side contributes only its
    * precomputed scalars (nS, dS) and its DISTINCT-key frame — the
    * same standing-index shape as the q252 admission gate, so an
    * append-only ingest never rescans or rewrites the snapshot; the
    * delta-side distinct + one key-shuffled anti join is all new work.
    * The two delta counts are driver scalars (bounded: one row each —
    * the q236 fill pattern). */
  def uniqueMerge(standingKeys: DataFrame, nS: Long, dS: Long,
                  delta: DataFrame, keyCol: String, name: String): DataFrame = {
    require(nS >= dS && dS >= 0, s"nS=$nS dS=$dS")
    val spark = delta.sparkSession
    val dk = delta.select(col(keyCol).as("_k")).distinct()
      .persist() // two consumers: nNew anti join is derived from it
    val nD = delta.count()
    val dNew = dk.join(
      standingKeys.select(col(standingKeys.columns.head).as("_k")),
      Seq("_k"), "left_anti").count()
    dk.unpersist(blocking = false)
    val viol = nS + nD - (dS + dNew)
    import spark.implicits._
    Seq((name, nS + nD, viol, viol == 0L))
      .toDF("rule", "n_rows", "violations", "pass")
  }

  /** violations = child rows whose `fkCol` has no match in the parent's
    * DISTINCT `pkCol` (NULL fks are orphans too — a null reference
    * still dangles). One left join, one agg. */
  def fkAudit(child: DataFrame, fkCol: String,
              parent: DataFrame, pkCol: String, name: String): DataFrame = {
    val p = parent.select(col(pkCol).as("_pk")).distinct()
      .withColumn("_hit", lit(1L))
    child.select(col(fkCol).as("_pk"))
      .join(p, Seq("_pk"), "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("_hit").isNull, 1L).otherwise(0L)).as("violations"))
      .select(lit(name).as("rule"), col("n_rows"),
        coalesce(col("violations"), lit(0L)).as("violations"))
      .withColumn("pass", col("violations") === 0L)
  }
}
