package graft.queries

import org.apache.spark.sql.functions._
import graft.filter.OptimadeCompiler
import graft.tables.Tables._

/** OPTIMADE filter strings compiled to Catalyst predicates and evaluated
  * over the driver's tables, oracle-checked against hand-translated SQL.
  * This is the §3.2 entry point (fetch_structures_with_filter) with Spark
  * as the evaluating "provider".
  */
object OptimadeQueries {

  val defs: Seq[QueryDef] = Seq(

    // range + CONTAINS + NOT over part (predicates reach the parquet scan)
    QueryDef.sql("q25_optimade_part",
      """SELECT p_partkey, p_name, p_size, p_type FROM part
        |WHERE p_size >= 10 AND p_size <= 20 AND NOT (p_type LIKE '%PROMO%')
        |  AND p_name LIKE 'l%'
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      OptimadeCompiler.where(part(s, d),
        """p_size >= 10 AND p_size <= 20 AND NOT (p_type CONTAINS "PROMO") AND p_name STARTS WITH "l"""")
        .select("p_partkey", "p_name", "p_size", "p_type")
        .orderBy("p_partkey")
    },

    // boolean algebra + ENDS WITH + constant-first
    QueryDef.sql("q26_optimade_bool",
      """SELECT p_partkey, p_brand, p_retailprice FROM part
        |WHERE (p_brand = 'Brand#13' OR p_brand = 'Brand#5')
        |  AND p_retailprice < 1500.0 AND NOT (p_name LIKE '%bolt')
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      OptimadeCompiler.where(part(s, d),
        """(p_brand = "Brand#13" OR p_brand = "Brand#5") AND 1500.0 > p_retailprice AND NOT p_name ENDS WITH "bolt"""")
        .select("p_partkey", "p_brand", "p_retailprice")
        .orderBy("p_partkey")
    },

    // HAS ALL / HAS ANY / LENGTH over a derived array column (documents
    // tokenized) — the P7 element-set predicates on real array data
    QueryDef.sql("q27_optimade_has",
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE list_has_all(string_split(text, ' '), ['data','key'])
        |  AND len(string_split(text, ' ')) >= 40
        |  AND NOT list_has_any(string_split(text, ' '), ['slow'])
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = documents(s, d)
      val ctx = OptimadeCompiler.Context(resolve = {
        case "words" => split(col("text"), " ")
        case other   => col(other)
      })
      docs.filter(OptimadeCompiler.compileOrThrow(
          """words HAS ALL "data","key" AND words LENGTH >= 40 AND NOT words HAS ANY "slow"""",
          ctx))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    },

    // HAS ONLY (subset semantics) + HAS <op> (existential comparison) —
    // the two set predicates q27 doesn't cover, over part-name tokens and
    // the float embedding arrays
    QueryDef.sql("q59_optimade_hasonly",
      """SELECT p_partkey, p_name FROM part
        |WHERE len(list_filter(string_split(p_name, ' '),
        |      w -> NOT list_contains(['cold','hot','new','old','widget','gizmo'], w))) = 0
        |ORDER BY p_partkey LIMIT 300""".stripMargin) { (s, d) =>
      val ctx = OptimadeCompiler.Context(resolve = {
        case "words" => split(col("p_name"), " ")
        case other   => col(other)
      })
      part(s, d)
        .filter(OptimadeCompiler.compileOrThrow(
          """words HAS ONLY "cold","hot","new","old","widget","gizmo"""", ctx))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey").limit(300)
    },

    QueryDef.sql("q60_optimade_hasop",
      """SELECT vec_id, label FROM embeddings
        |WHERE len(list_filter(embedding, x -> x > 0.3)) > 0
        |ORDER BY vec_id""".stripMargin) { (s, d) =>
      OptimadeCompiler.where(embeddings(s, d), """embedding HAS > 0.3""")
        .select("vec_id", "label")
        .orderBy("vec_id")
    },

    // correlated set-zip (OPTIMADE v1.0 "correlated values"): per-order
    // parallel arrays (partkeys:quantities, linenumber-sorted for
    // determinism) filtered with `parts:qtys HAS <=200:>=45` — both
    // component predicates must hit the SAME index. The oracle states the
    // equivalent relational EXISTS directly on lineitem.
    QueryDef.sql("q62_optimade_zip",
      """SELECT DISTINCT l_orderkey AS o_key FROM lineitem
        |WHERE l_partkey <= 200 AND l_quantity >= 45
        |ORDER BY o_key""".stripMargin) { (s, d) =>
      val perOrder = lineitem(s, d)
        .groupBy(col("l_orderkey").as("o_key"))
        .agg(sort_array(collect_list(struct(
          col("l_linenumber"), col("l_partkey"), col("l_quantity")))).as("ls"))
        .select(col("o_key"),
          transform(col("ls"), x => x.getField("l_partkey")).as("parts"),
          transform(col("ls"), x => x.getField("l_quantity")).as("qtys"))
      OptimadeCompiler.where(perOrder, "parts:qtys HAS <=200:>=45")
        .select("o_key").orderBy("o_key")
    },

    // IS KNOWN + HAS ONLY over an embeddings-derived frame: label buckets
    QueryDef.sql("q28_optimade_known",
      """SELECT vec_id, label FROM embeddings
        |WHERE label IS NOT NULL AND label >= 3 AND label <= 6
        |ORDER BY vec_id LIMIT 300""".stripMargin) { (s, d) =>
      OptimadeCompiler.where(embeddings(s, d),
        """label IS KNOWN AND label >= 3 AND label <= 6""")
        .select("vec_id", "label")
        .orderBy("vec_id").limit(300)
    }
  )
}
