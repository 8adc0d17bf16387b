package graft.queries

import org.apache.spark.sql.functions._
import graft.query.Parametric
import graft.sql.SqlGuard
import graft.tables.Tables

/** The SQL pass-through surface (§3.1: guard + LIMIT injection) and the
  * parametric query layer (§3.3) exercised over driver tables with oracles.
  */
object SqlSurfaceQueries {

  val defs: Seq[QueryDef] = Seq(

    // T2: user SQL through the read-only guard; its LIMIT 99999 is
    // rewritten to the tool's n_results=50 (reference server.py:110-117)
    QueryDef.sql("q29_sql_guard_limit",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 100000
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin) { (s, d) =>
      Tables.registerAll(s, d)
      SqlGuard.fetchSql(s,
        """SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_totalprice > 100000
          |ORDER BY o_totalprice DESC, o_orderkey LIMIT 99999""".stripMargin,
        nResults = 50)
    },

    // parametric conjunctive query (ranges + equality + time window + sort
    // + limit) over orders — the openlam/mof/bohrium tool shape on driver data
    QueryDef.sql("q30_parametric",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_totalprice >= 50000 AND o_totalprice <= 200000
        |  AND o_orderpriority = '1-URGENT'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate <= TIMESTAMP '1999-01-01 00:00:00'
        |ORDER BY o_totalprice, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
      Parametric.Query(
        preds = Seq(
          Parametric.NumRange("o_totalprice", Some(50000), Some(200000)),
          Parametric.Equals("o_orderpriority", "1-URGENT"),
          Parametric.TimeRange("o_orderdate",
            Some("1997-01-01 00:00:00"), Some("1999-01-01 00:00:00"))),
        sort = Seq(Parametric.SortSpec("o_totalprice"), Parametric.SortSpec("o_orderkey")),
        limit = Some(100))
        .run(Tables.orders(s, d))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }
  )
}
