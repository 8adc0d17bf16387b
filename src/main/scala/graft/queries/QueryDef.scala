package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query with an optional DuckDB-oracle SQL equivalent.
  *
  * Conventions that keep the Spark result hash-identical to the oracle:
  *  - every computed column is aliased to the SAME name on both sides;
  *  - every query ends in a total ORDER BY (deterministic row order);
  *  - money-like double sums go through DECIMAL(18,2) so the aggregate is
  *    exact and order-independent, then cast back to DOUBLE (both engines
  *    produce the identical nearest-double);
  *  - averages are written sum/count (IEEE double division is deterministic)
  *    rather than avg() (whose internal accumulation differs per engine).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
