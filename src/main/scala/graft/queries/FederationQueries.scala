package graft.queries

import org.apache.spark.sql.functions._
import graft.federate.Federation.{federatedQuery, Source}
import graft.tables.Tables

/** The federation pipeline (§3.2: fan-out → stats → fair quota → ranked
  * application → ordered dedup → truncation) run over driver tables, with
  * SQL oracles valid because the chosen sources are not capacity-bound
  * (each segment holds ≥ quota rows at every sf), so the fair plan
  * degenerates to the equal split the SQL can express.
  */
object FederationQueries {

  private val segments =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  val defs: Seq[QueryDef] = Seq(

    // 5 "providers" = customer segments; n=100 → quota 20 each;
    // final truncation to 30 → 20×AUTOMOBILE + 10×BUILDING
    QueryDef.sql("q31_federation_quota",
      """WITH ranked AS (
        |  SELECT c_mktsegment AS provider, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) AS rn
        |  FROM customer)
        |SELECT provider, c_custkey, c_acctbal FROM ranked WHERE rn <= 20
        |ORDER BY provider, c_custkey LIMIT 30""".stripMargin) { (s, d) =>
      val sources = segments.map(seg => Source(seg, "customer", () =>
        Tables.customer(s, d).filter(col("c_mktsegment") === seg)))
      val fr = federatedQuery(s, sources, filter = None, nResults = 100,
        idCol = "c_custkey", orderCol = "c_custkey", maxReturned = 30)
      fr.data.select("provider", "c_custkey", "c_acctbal")
        .orderBy("provider", "c_custkey")
    },

    // 2 overlapping sources over orders; first-provider-wins dedup (D1)
    QueryDef.sql("q32_federation_dedup",
      """WITH a AS (
        |  SELECT o_orderkey, o_totalprice, 'urgent' AS provider, 0 AS pr
        |  FROM orders WHERE o_orderpriority = '1-URGENT'
        |  ORDER BY o_orderkey LIMIT 25),
        |b AS (
        |  SELECT o_orderkey, o_totalprice, 'pricey' AS provider, 1 AS pr
        |  FROM orders WHERE o_totalprice > 50000
        |  ORDER BY o_orderkey LIMIT 25),
        |u AS (SELECT * FROM a UNION ALL SELECT * FROM b),
        |d AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY pr) AS dd FROM u)
        |SELECT o_orderkey, o_totalprice, provider FROM d WHERE dd = 1
        |ORDER BY pr, o_orderkey LIMIT 30""".stripMargin) { (s, d) =>
      val sources = Seq(
        Source("urgent", "orders", () =>
          Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")),
        Source("pricey", "orders", () =>
          Tables.orders(s, d).filter(col("o_totalprice") > 50000)))
      val fr = federatedQuery(s, sources, filter = None, nResults = 50,
        idCol = "o_orderkey", orderCol = "o_orderkey", maxReturned = 30)
      fr.data.select("o_orderkey", "o_totalprice", "provider")
    },

    // S2/S3/S5 live-source parity: the nation dimension served through
    // the PagedJsonSource DataSourceV2 connector (paged "REST provider"
    // with server-side filter pushdown + response_fields pruning). The
    // jsonl provider DB is rebuilt from the driver's nation parquet (25
    // rows — a dimension, not data); the oracle queries the parquet
    // directly, so the whole connector path (count request, page
    // planning, pushdown evaluation, row decoding) is what's under test.
    QueryDef.sql("q61_v2_source",
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE n_regionkey >= 2
        |ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      val db = s"${graft.Aux.dir(d)}/q61_provider.jsonl"
      val rows = Tables.nation(s, d)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey").collect()
        .map(r => Map[String, Any](
          "n_nationkey" -> r.getInt(0), "n_name" -> r.getString(1),
          "n_regionkey" -> r.getInt(2)))
      graft.sources.PagedJsonClient.writeJsonl(
        rows.toIndexedSeq, Seq("n_nationkey", "n_name", "n_regionkey"), db)
      s.read.format("graft.sources.PagedJsonSource")
        .option("path", db)
        .option("schemaDDL", "n_nationkey INT, n_name STRING, n_regionkey INT")
        .option("pageLimit", "5").load()
        .filter(col("n_regionkey") >= 2)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    }
  )
}
