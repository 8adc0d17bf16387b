package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: entry() smoke, name uniqueness (a
  * duplicate QueryDef name would silently vanish in the Map), and
  * oracle keys ⊆ query keys.
  */
class SparkEntrySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("entry() returns rows on sf0.001 (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names are unique and oracle keys all resolve") {
    val names = SparkEntry.queries.keys.toSeq
    // Map construction dedupes silently — catch collisions at the source
    val defs = Seq(
      queries.RelationalQueries.defs, queries.FunctionQueries.defs,
      queries.OptimadeQueries.defs, queries.SqlSurfaceQueries.defs,
      queries.FederationQueries.defs, queries.PipelineQueries.defs,
      queries.EventQueries.defs, queries.MofScenarioQueries.defs).flatten
    assert(defs.map(_.name).distinct.size == defs.size,
      s"duplicate query names: ${defs.map(_.name).diff(defs.map(_.name).distinct)}")
    assert(names.size == defs.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // every oracle string is non-empty and references no backticks that
    // DuckDB can't parse
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, k)
      assert(!sql.contains("`"), s"$k oracle contains backticks")
    }
  }
}
