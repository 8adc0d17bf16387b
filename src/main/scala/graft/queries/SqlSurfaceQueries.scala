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
    },

    // S3 oracle-backed: the fetch_bohrium_crystals path itself
    // (Parametric.bohriumQuery — Bohriumpublic_Server/server.py:61-72)
    // over a crystals view of `part`: P5 fuzzy keyword (match_mode=0
    // substring), P3 range auto-completion BOTH ways (["","30"] →
    // [defaultMin, 30]; ["-50"] → [-50, defaultMax]), and the tool's
    // implicit formation-energy ascending sort. The energy column is a
    // mirrored-arithmetic double, distinct per row (1e-9·partkey tiebreak)
    // so the sort+limit is deterministic cross-engine.
    QueryDef.sql("q203_bohrium_parametric",
      """WITH v AS (
        |  SELECT p_partkey AS id, p_type AS formula, p_size AS atom_count,
        |    ((CAST(p_partkey % 200 AS DOUBLE) - 100.0) +
        |     CAST(p_partkey AS DOUBLE) * 1e-9) AS predicted_formation_energy
        |  FROM part)
        |SELECT id, formula, atom_count, predicted_formation_energy FROM v
        |WHERE formula LIKE '%AR%'
        |  AND atom_count >= 0.0 AND atom_count <= 30.0
        |  AND predicted_formation_energy >= -50.0
        |  AND predicted_formation_energy <= 100.0
        |ORDER BY predicted_formation_energy LIMIT 25""".stripMargin) { (s, d) =>
      val v = Tables.part(s, d).select(
        col("p_partkey").as("id"),
        col("p_type").as("formula"),
        col("p_size").as("atom_count"),
        (((col("p_partkey") % 200).cast("double") - lit(100.0)) +
          col("p_partkey").cast("double") * lit(1e-9))
          .as("predicted_formation_energy"))
      Parametric.bohriumQuery(
        formula = Some("AR"), matchMode = 0,
        atomCountRange = Seq("", "30"),
        formationEnergyRange = Seq("-50"),
        nResults = 25)
        .run(v)
        .select("id", "formula", "atom_count", "predicted_formation_energy")
    },

    // S5 oracle-backed: one openlam keyset page — the reference's
    // query_by_offset shape (openlam db.py:44-104: conjunctive filters +
    // startId cursor + id order + limit) over an id/formula/energy/
    // submission_time view of orders. Gates the cursor predicate, the
    // normalized-formula equality (P4), the energy range (P2) and the
    // ISO time window (P10) in one page fetch.
    QueryDef.sql("q204_openlam_keyset_page",
      """SELECT o_orderkey AS id, o_orderpriority AS formula,
        |  o_totalprice AS energy
        |FROM orders
        |WHERE o_orderpriority = '2-HIGH'
        |  AND o_totalprice >= 50000.0 AND o_totalprice <= 200000.0
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <= TIMESTAMP '1998-06-30 00:00:00'
        |  AND o_orderkey > 5000
        |ORDER BY id LIMIT 40""".stripMargin) { (s, d) =>
      val v = Tables.orders(s, d).select(
        col("o_orderkey").as("id"),
        col("o_orderpriority").as("formula"),
        col("o_totalprice").as("energy"),
        col("o_orderdate").as("submission_time"))
      Parametric.openlamQuery(
        formula = Some("2-HIGH"),
        minEnergy = Some(50000), maxEnergy = Some(200000),
        minSubmissionTime = Some("1996-01-01 00:00:00"),
        maxSubmissionTime = Some("1998-06-30 00:00:00"),
        startId = Some(5000L),
        nResults = 40)
        .run(v)
        .select("id", "formula", "energy")
    },

    // S5 oracle-backed: Mediation.pageAll keyset tiling — pages 1+2 of
    // size 700 union to EXACTLY the first 1400 rows by key (the oracle is
    // the unpaged top-1400), proving the cursor advance is lossless and
    // gap-free. Each page plans as TakeOrderedAndProject with the cursor
    // predicate pushed to the scan (no global window).
    QueryDef.sql("q205_keyset_tiling",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 1400""".stripMargin) { (s, d) =>
      val pages = graft.federate.Mediation.pageAll(
        Tables.orders(s, d).select("o_orderkey", "o_totalprice"),
        "o_orderkey", limit = 700)
      pages.take(2).reduce(_.unionByName(_)).orderBy("o_orderkey")
    },

    // O2/S5 negative path: a malformed ISO-8601 submission-time bound
    // reaches the openlam tool, ANSI to_timestamp raises at execution,
    // and the tool returns the reference's error envelope — code −1,
    // n_found 0, no structures (openlam Openlam_Server/server.py:133-141:
    // any query exception → {"code": -1, "n_found": 0,
    // "cleaned_structures": []}). The oracle is the envelope constant.
    QueryDef.sql("q240_openlam_bad_time",
      """SELECT CAST(-1 AS INT) AS code, CAST(0 AS BIGINT) AS n_found,
        |  CAST(0 AS BIGINT) AS n_structs""".stripMargin) { (s, d) =>
      val v = Tables.orders(s, d).select(
        col("o_orderkey").as("id"),
        col("o_orderpriority").as("formula"),
        col("o_totalprice").as("energy"),
        col("o_orderdate").as("submission_time"))
      val out = graft.api.Tools.fetchOpenlamStructures(s, v,
        minSubmissionTime = Some("not-a-timestamp"), nResults = 10)
      import s.implicits._
      Seq((out.result.code, out.result.nFound,
        out.result.cleanedStructures.size.toLong))
        .toDF("code", "n_found", "n_structs")
    },

    // P3/F4 negative path: an UNKNOWN space-group number is dropped
    // with a warning, not an error (bohriumpublic server.py:120-125:
    // `if sg_symbol: ... else: logging.warning`), and an unparseable
    // range string completes to the default end (the API-forwarding
    // analog of server.py:126-142's empty-string fill). The oracle
    // applies NO space-group predicate and the default-completed
    // bounds — identical rows proves both drop semantics.
    QueryDef.sql("q241_bohrium_unknown_spg",
      """WITH v AS (
        |  SELECT p_partkey AS id, p_type AS formula, p_size AS atom_count,
        |    ((CAST(p_partkey % 200 AS DOUBLE) - 100.0) +
        |     CAST(p_partkey AS DOUBLE) * 1e-9) AS predicted_formation_energy
        |  FROM part)
        |SELECT id, formula, atom_count, predicted_formation_energy FROM v
        |WHERE formula LIKE '%ECO%'
        |  AND atom_count >= 0.0 AND atom_count <= 30.0
        |ORDER BY predicted_formation_energy LIMIT 25""".stripMargin) { (s, d) =>
      val v = Tables.part(s, d).select(
        col("p_partkey").as("id"),
        col("p_type").as("formula"),
        col("p_size").as("atom_count"),
        (((col("p_partkey") % 200).cast("double") - lit(100.0)) +
          col("p_partkey").cast("double") * lit(1e-9))
          .as("predicted_formation_energy"))
      Parametric.bohriumQuery(
        formula = Some("ECO"), matchMode = 0,
        spacegroupNumber = Some(999), // unknown → dropped, not an error
        atomCountRange = Seq("junk", "30"), // unparseable → defaultMin 0
        nResults = 25)
        .run(v)
        .select("id", "formula", "atom_count", "predicted_formation_energy")
    },

    // Empty-result envelope code: every reference server returns
    // code −9999 (NOT 0) when a successful query matches nothing
    // (optimade server.py:196/352/510, bohriumpublic server.py:223,
    // openlam server.py:199, mofdbsql server.py:200) — gated here via
    // a bohrium fetch whose exact-match formula exists in no row.
    QueryDef.sql("q242_empty_result_code",
      """SELECT CAST(-9999 AS INT) AS code, CAST(0 AS BIGINT) AS n_found,
        |  CAST(0 AS BIGINT) AS n_structs""".stripMargin) { (s, d) =>
      val v = Tables.part(s, d).select(
        col("p_partkey").as("id"), col("p_type").as("formula"),
        col("p_size").as("atom_count"),
        col("p_retailprice").cast("double").as("predicted_formation_energy"))
      val out = graft.api.Tools.fetchBohriumCrystals(s, v,
        formula = Some("NO_SUCH_FORMULA"), matchMode = 1, nResults = 10)
      import s.implicits._
      Seq((out.result.code, out.result.nFound,
        out.result.cleanedStructures.size.toLong))
        .toDF("code", "n_found", "n_structs")
    },

    // S2/P8 negative path: the OPTIMADE filter guard. An empty/blank
    // filter short-circuits to the reference's exact envelope — code −1,
    // message "Empty filter string" (Optimade_Server/server.py:97-100) —
    // and a NON-empty malformed filter ("elements HAS ALL", an
    // incomplete value list) raises in the locally-owned grammar and
    // lands in the same −1 envelope with the parser's message (the
    // API-forwarding analog: the reference forwards the bad string to
    // remote providers, which each error — see CLAUDE.md ground rule).
    // Neither case may touch a source; the msg flags pin the message
    // shape (exact text for empty, nonempty-parse-error for malformed).
    QueryDef.sql("q256_filter_error_envelope",
      """SELECT * FROM (VALUES
        |  ('empty', CAST(-1 AS INT), CAST(0 AS BIGINT),
        |   CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('malformed', CAST(-1 AS INT), CAST(0 AS BIGINT),
        |   CAST(0 AS BIGINT), CAST(1 AS BIGINT)))
        |  AS t(kind, code, n_found, msg_empty_filter, msg_nonempty)
        |ORDER BY kind""".stripMargin) { (s, d) =>
      val src = Seq(graft.federate.Federation.Source("p1", "part", () =>
        Tables.part(s, d).select(col("p_partkey").as("id"),
          col("p_type").as("chemical_formula_descriptive"))))
      def row(kind: String, filter: String) = {
        val out = graft.api.Tools.fetchStructuresWithFilter(s, src, filter)
        (kind, out.result.code, out.result.nFound,
          if (out.result.message == "Empty filter string") 1L else 0L,
          if (out.result.message.nonEmpty) 1L else 0L)
      }
      import s.implicits._
      Seq(row("empty", "   "), row("malformed", "elements HAS ALL"))
        .toDF("kind", "code", "n_found", "msg_empty_filter", "msg_nonempty")
        .orderBy("kind")
    },

    // S1/T2 negative path: write statements through the read-only SQL
    // tool are REJECTED with the reference's security envelope — code
    // −1, message prefixed "SQL security check failed" (mofdbsql
    // server.py:93's validate_sql_security; our guard walks the parsed
    // plan and rejects Command/*Statement nodes, SqlGuard.scala:39, so
    // DML, DDL and multi-statement injection all land in the same
    // envelope). Previously spec-only (ToolsSpec); these rows make the
    // envelope driver-gated like q240/q242/q256.
    QueryDef.sql("q257_sql_write_rejected",
      """SELECT * FROM (VALUES
        |  ('delete', CAST(-1 AS INT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('drop',   CAST(-1 AS INT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('multi',  CAST(-1 AS INT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)))
        |  AS t(kind, code, n_found, msg_guard)
        |ORDER BY kind""".stripMargin) { (s, d) =>
      Tables.registerAll(s, d)
      def row(kind: String, sql: String) = {
        val out = graft.api.Tools.fetchMofsSql(s, sql)
        (kind, out.result.code, out.result.nFound,
          if (out.result.message.startsWith("SQL security check failed"))
            1L else 0L)
      }
      import s.implicits._
      Seq(row("delete", "DELETE FROM orders WHERE o_orderkey = 1"),
          row("drop", "DROP TABLE orders"),
          row("multi", "SELECT 1; DROP TABLE orders"))
        .toDF("kind", "code", "n_found", "msg_guard")
        .orderBy("kind")
    }
  )
}
