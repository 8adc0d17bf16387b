package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis => TA}
import graft.tables.Tables

/** Training-data pipeline operators (dedup family, similarity search,
  * text analysis, multimodal) over the documents/embeddings tables.
  * SQL-expressible ones carry DuckDB oracles; LSH/ANN pipelines are
  * rows-only here and recall/correctness-tested in ScalaTest against
  * exact baselines.
  */
object PipelineQueries {

  /** Documents plus planted near-duplicates (3 docs re-appended with a
    * small suffix edit under ids ≥ 100000) so near-dup operators have
    * deterministic positives to find at every scale factor. */
  private def docsWithPlants(s: org.apache.spark.sql.SparkSession, d: String) = {
    val docs = Tables.documents(s, d)
    val plants = docs.orderBy("doc_id").limit(3)
      .withColumn("doc_id", col("doc_id") + 100000)
      .withColumn("text", concat(col("text"), lit(" appended tail token")))
    docs.unionByName(plants)
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef.sql("q33_text_stats",
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
        |    / len(string_split(text, ' ')) AS mean_token_len,
        |  CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
        |    / length(text) AS punct_ratio
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      // raw ratio, not round(...,6): int/int divisions are bit-identical
      // across engines while round() tie-breaking is not (see q52 note)
      Tables.documents(s, d).select(
        col("doc_id"),
        TA.tokenCount(col("text")).as("n_tokens"),
        TA.meanTokenLen(col("text")).as("mean_token_len"),
        TA.punctRatio(col("text")).as("punct_ratio"))
        .orderBy("doc_id")
    },

    QueryDef.sql("q34_text_langid", {
      def hits(set: Seq[String]) =
        set.map(w => s"'$w'").mkString("len(list_filter(string_split(text, ' '), t -> list_contains([", ", ", "], t)))")
      val en = hits(TA.Stopwords("en")); val de = hits(TA.Stopwords("de"))
      val es = hits(TA.Stopwords("es")); val fr = hits(TA.Stopwords("fr"))
      val zh = hits(TA.Stopwords("zh"))
      s"""WITH scored AS (
         |  SELECT doc_id, lang,
         |    $en AS s_en, $de AS s_de, $es AS s_es, $fr AS s_fr, $zh AS s_zh
         |  FROM documents)
         |SELECT doc_id, lang, s_en, s_de, s_es, s_fr, s_zh,
         |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |       WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |       WHEN s_fr >= s_zh THEN 'fr'
         |       ELSE 'zh' END AS predicted
         |FROM scored ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val scores = TA.langScores(col("text"))
      Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        scores("en").as("s_en"), scores("de").as("s_de"),
        scores("es").as("s_es"), scores("fr").as("s_fr"),
        scores("zh").as("s_zh"),
        TA.langId(col("text")).as("predicted"))
        .orderBy("doc_id")
    },

    QueryDef.sql("q35_fingerprint",
      """SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |                          ' +', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TA.fingerprintMd5(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    QueryDef.sql("q36_dedup_exact",
      """SELECT md5(text) AS text_md5, count(*) AS n_copies,
        |  min(doc_id) AS survivor_id
        |FROM documents GROUP BY md5(text) ORDER BY text_md5""".stripMargin) { (s, d) =>
      Dedup.exactGroups(Tables.documents(s, d), "text", "doc_id")
        .orderBy("text_md5")
    },

    // LSH near-dup over documents + planted dups: the planted pairs
    // (id, id+100000) must surface; verified exactly in DedupSpec
    QueryDef.rowsOnly("q37_dedup_minhash") { (s, d) =>
      Dedup.minhashNearDups(docsWithPlants(s, d), "doc_id", "text",
        threshold = 0.5)
        .orderBy("id_a", "id_b")
        .withColumn("jaccard", round(col("jaccard"), 6))
    },

    QueryDef.rowsOnly("q38_dedup_simhash") { (s, d) =>
      Dedup.simhashNearDups(docsWithPlants(s, d), "doc_id", "text",
        maxHamming = 3)
        .orderBy("id_a", "id_b")
    },

    // brute-force exact cosine top-5 for three query vectors — oracle
    // mirrors the fold arithmetic with DuckDB list functions
    QueryDef.sql("q39_embed_topk",
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
        |c AS (SELECT vec_id AS corpus_id, embedding AS cv FROM embeddings),
        |scored AS (
        |  SELECT query_id, corpus_id,
        |    round(
        |      list_sum(list_transform(list_zip(qv, cv),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(qv, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(cv, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))),
        |      6) AS sim
        |  FROM c CROSS JOIN q),
        |ranked AS (
        |  SELECT query_id, corpus_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, corpus_id) AS rank
        |  FROM scored)
        |SELECT query_id, corpus_id, sim, rank FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 3), emb,
        "vec_id", "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    },

    // ANN path over the same queries; recall vs exact asserted in spec
    QueryDef.rowsOnly("q40_embed_ann") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(
        emb.filter(col("vec_id") < 3), emb,
        "vec_id", "vec_id", "embedding", k = 5, bits = 8, dim = 64)
        .orderBy("query_id", "rank")
    },

    // IVF-partitioned ANN (k-means cells, nprobe=3 of 8): the second
    // scale path next to sign-LSH; recall asserted in IvfIndexSpec
    QueryDef.rowsOnly("q54_embed_ivf") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val index = graft.operators.IvfIndex.build(emb, "vec_id", "embedding", nlist = 8)
      graft.operators.IvfIndex.topK(index,
        emb.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5, nprobe = 3)
        .orderBy("query_id", "rank")
    },

    // embedding near-dup with planted exact copies (cosine 1.0)
    QueryDef.rowsOnly("q41_embed_neardup") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val plants = emb.orderBy("vec_id").limit(3)
        .withColumn("vec_id", col("vec_id") + 100000)
      Dedup.embeddingNearDups(emb.unionByName(plants), "vec_id", "embedding",
        threshold = 0.95, bits = 8, dim = 64)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("id_a", "id_b")
    },

    // kNN majority-label prediction over embeddings
    QueryDef.rowsOnly("q42_embed_knn") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.knnPredict(
        emb.filter(col("vec_id") < 10), emb.filter(col("vec_id") >= 10),
        "vec_id", "vec_id", "embedding", "label", k = 15)
        .orderBy("query_id")
    },

    // composite quality score — identical arithmetic order both engines
    QueryDef.sql("q52_text_quality", {
      val hits = TA.Stopwords("en").map(w => s"'$w'")
        .mkString("len(list_filter(string_split(text, ' '), t -> list_contains([", ", ", "], t)))")
      s"""SELECT doc_id,
         |  (CAST($hits AS DOUBLE) / len(string_split(text, ' '))) * 0.4
         |  + (1.0 - CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / length(text)) * 0.3
         |  + least((CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE) / len(string_split(text, ' '))) / 8.0, 1.0) * 0.3
         |  AS quality
         |FROM documents ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TA.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    },

    // scalar-function throughput micro-bench (BASELINE.md): 1M synthetic
    // formulas through the codegen'd hill_formula + normalize — the
    // count(distinct) forces full evaluation; timing lands in BENCH json
    QueryDef.rowsOnly("q53_hill_throughput_1m") { (s, _) =>
      s.range(1000000L)
        .select(concat(
          lit("C"), (col("id") % 20 + 1).cast("string"),
          lit("H"), (col("id") % 30 + 1).cast("string"),
          lit("Fe"), (col("id") % 5 + 1).cast("string"),
          lit("O"), (col("id") % 9 + 1).cast("string")).as("formula"))
        .select(graft.functions.GraftFunctions.hill_formula(col("formula")).as("hill"))
        .agg(countDistinct(col("hill")).as("n_distinct"))
    },

    // corpus-level source-overlap sketch: one MinHash-union signature per
    // source (custom TypedImperativeAggregate), pairwise estimated
    // Jaccard between sources — no pairwise document comparison anywhere
    QueryDef.rowsOnly("q57_source_overlap") { (s, d) =>
      import graft.operators.MinHashUnionAgg._
      val sigs = Tables.documents(s, d)
        .withColumn("sig", Dedup.minhashSigUdf(3, 64)(col("text")))
        .groupBy("source")
        .agg(minhash_union(col("sig"), 64).as("usig"))
      sigs.as("x").crossJoin(sigs.as("y"))
        .filter(col("x.source") < col("y.source"))
        .select(col("x.source").as("source_a"), col("y.source").as("source_b"),
          round(estimatedJaccard(col("x.usig"), col("y.usig")), 6).as("est_jaccard"))
        .orderBy("source_a", "source_b")
    },

    // multimodal plumbing: synthetic media → partition-parallel stub
    // decode → per-kind feature aggregates; plus frame sampling counts
    QueryDef.rowsOnly("q43_multimodal") { (s, d) =>
      val media = Multimodal.syntheticMedia(s, Tables.documents(s, d), "doc_id", "text")
      val feats = Multimodal.extractFeatures(media).toDF()
      val frames = Multimodal.sampleFrames(media, everyMs = 1000)
        .groupBy("media_id").agg(count(lit(1)).as("n_frames"))
      val frameStats = frames.agg(
        sum(col("n_frames")).as("total_frames"), count(lit(1)).as("n_videos"))
      feats.groupBy("kind").agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(element_at(col("feature"), 1)), 6).as("avg_f0"))
        .crossJoin(broadcast(frameStats))
        .orderBy("kind")
    }
  )
}
