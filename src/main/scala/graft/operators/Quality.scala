package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint audit — the validation pass a training-data
  * pipeline runs before (and after) every ingest: declarative checks
  * evaluated at table scale, each reduced to a single violation count,
  * so the audit of a 100 TB table ships a handful of rows to the
  * driver. Reference behaviors audited piecemeal across the corpus
  * (`mofdbsql_database/mofdb_test/test.py` sanity-counts its star
  * tables; `optimade_database/Optimade_Server/utils.py` validates
  * fields per response) are composed here as one first-class operator.
  *
  * Scale design, per check family:
  *  - scalar checks (null / range / regex / cross-column): ONE shared
  *    scan, every predicate counted in the SAME map-side-combined
  *    global aggregation (conditional sums — adding a check adds a
  *    column, not a pass), then unpivoted to (check, violations) rows;
  *  - uniqueness: one shuffle keyed by the claimed key, excess =
  *    Σ (n−1) over duplicate groups — never a self-join;
  *  - foreign keys: a distinct-key anti-join (orphans) or its inverse
  *    (childless parents); co-partitioned hash join on the key, and the
  *    parent side reduces to DISTINCT keys before joining.
  *
  * Every count is BIGINT; no float discipline needed anywhere. Output
  * frames all share the schema (check STRING, violations BIGINT) so
  * audits compose by union (q122's oracle restates each family
  * independently in SQL).
  */
object Quality {

  /** Violation counts for scalar predicates over one scan of `df`.
    * Each element is (check name, VIOLATION predicate — true = bad
    * row). Returns one (check, violations) row per check. */
  def scalarAudit(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "Quality.scalarAudit: no checks given")
    val agg = df.agg(
      sum(when(checks.head._2, 1L).otherwise(0L)).as("c0"),
      checks.tail.zipWithIndex.map { case ((_, p), i) =>
        sum(when(p, 1L).otherwise(0L)).as(s"c${i + 1}")
      }: _*)
    // unpivot the 1-row aggregate to (check, violations) — stack is one
    // Expand over a single row, no extra pass over the data
    val pairs = checks.zipWithIndex
      .map { case ((n, _), i) => s"'${n.replace("'", "''")}', c$i" }
      .mkString(", ")
    agg.select(expr(
      s"stack(${checks.size}, $pairs) AS (check, violations)"))
      .select(col("check"), coalesce(col("violations"), lit(0L)).as("violations"))
  }

  /** Rows in excess of one per duplicate group of the claimed-unique
    * key `cols`: Σ (n−1) over groups with n > 1 (0 when the key truly
    * is unique). One shuffle on the key, no join. */
  def uniquenessExcess(df: DataFrame, cols: Seq[String],
                       name: String): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(col("n") - 1L), lit(0L)).as("violations"))
      .select(lit(name).as("check"), col("violations"))

  /** Child rows whose key has no match among the parent's keys
    * (FK orphans). The parent reduces to DISTINCT keys before the
    * anti-join, so a dimension parent broadcasts. */
  def orphanCount(child: DataFrame, childKey: String, parent: DataFrame,
                  parentKey: String, name: String): DataFrame =
    child.select(col(childKey).as("_k"))
      .join(parent.select(col(parentKey).as("_k")).distinct(),
        Seq("_k"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("check"), col("violations"))

  /** Parent rows with NO child referencing them (inverse-FK
    * completeness — e.g. orders that lost every lineitem). */
  def childlessCount(parent: DataFrame, parentKey: String, child: DataFrame,
                     childKey: String, name: String): DataFrame =
    orphanCount(parent, parentKey, child, childKey, name)

  /** Functional-dependency audit lhs → rhs: the violating-determinant
    * worklist — every lhs group carrying ≥ 2 distinct rhs combinations,
    * with its distinct-dependent count and total row count. The
    * profiling primitive behind FD discovery (test a candidate FD at
    * table scale) and denormalization checks ("is this column really
    * determined by that key?").
    *
    * Two chained aggregations: distinct (lhs, rhs) combos first (the
    * map-side combine collapses duplicate combos before the shuffle),
    * then a lhs-keyed re-agg — never a self-join, never DISTINCT inside
    * an agg over the raw rows. All counts BIGINT. */
  def fdViolations(df: DataFrame, lhs: Seq[String],
                   rhs: Seq[String]): DataFrame = {
    require(lhs.nonEmpty && rhs.nonEmpty,
      "Quality.fdViolations: lhs and rhs must be non-empty")
    val combos = df.groupBy((lhs ++ rhs).map(col): _*)
      .agg(count(lit(1)).as("n"))
    combos.groupBy(lhs.map(col): _*)
      .agg(count(lit(1)).as("n_rhs"), sum(col("n")).as("n_rows"))
      .filter(col("n_rhs") >= 2)
  }
}
