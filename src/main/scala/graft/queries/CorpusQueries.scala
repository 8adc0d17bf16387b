package graft.queries

import graft.operators.Repetition
import graft.tables.Tables

/** Corpus-hygiene operators for pretraining pipelines: within-document
  * repetition signals and cross-document boilerplate coverage
  * (operators/Repetition). Oracles rebuild the n-grams with a DIFFERENT
  * construction (DuckDB lead() windows over zipped parallel unnests —
  * unnest(list) + unnest(generate_series) zip by position — vs the
  * engine's transform/slice over the token array) so the gram semantics
  * themselves are cross-checked, not just the counting.
  */
object CorpusQueries {

  val defs: Seq[QueryDef] = Seq(

    // Gopher-style per-doc repetition stats, integer-exact: token count,
    // top 2-gram occurrence count, and duplicated-5-gram position count.
    QueryDef.sql("q208_doc_repetition",
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS tok,
        |    unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
        |  FROM documents),
        |c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS tok_cnt FROM t GROUP BY 1),
        |g2 AS (
        |  SELECT doc_id,
        |    tok || ' ' || lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS gram
        |  FROM t),
        |t2 AS (
        |  SELECT doc_id, CAST(max(cnt) AS BIGINT) AS top2_cnt FROM (
        |    SELECT doc_id, gram, count(*) AS cnt FROM g2
        |    WHERE gram IS NOT NULL GROUP BY 1, 2) GROUP BY 1),
        |g5 AS (
        |  SELECT doc_id,
        |    tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w ||
        |    ' ' || lead(tok, 3) OVER w || ' ' || lead(tok, 4) OVER w AS gram
        |  FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |d5 AS (
        |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS dup5_pos FROM (
        |    SELECT doc_id, gram, count(*) AS cnt FROM g5
        |    WHERE gram IS NOT NULL GROUP BY 1, 2)
        |  WHERE cnt >= 2 GROUP BY 1)
        |SELECT c.doc_id, c.tok_cnt,
        |  coalesce(t2.top2_cnt, 0) AS top2_cnt,
        |  coalesce(d5.dup5_pos, 0) AS dup5_pos
        |FROM c LEFT JOIN t2 USING (doc_id) LEFT JOIN d5 USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Repetition.docRepetition(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Cross-document boilerplate: 3-grams present in ≥ ⌈nDocs/20⌉
    // distinct docs, and each doc's count of positions inside them.
    QueryDef.sql("q209_boilerplate_coverage",
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS tok,
        |    unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS gram
        |  FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |gg AS (SELECT doc_id, gram FROM g WHERE gram IS NOT NULL),
        |nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        |bp AS (
        |  SELECT gram FROM (
        |    SELECT gram, count(DISTINCT doc_id) AS df FROM gg GROUP BY 1), nd
        |  WHERE df >= (n + 19) // 20),
        |cov AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS bp_hits FROM gg
        |  WHERE gram IN (SELECT gram FROM bp) GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS tok_cnt,
        |  coalesce(cov.bp_hits, 0) AS bp_hits
        |FROM documents d LEFT JOIN cov USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Repetition.boilerplateCoverage(Tables.documents(s, d), "doc_id", "text",
        n = 3, denom = 20)
        .orderBy("doc_id")
    },

    // Sliding token-window chunking (operators/Chunker): window 40,
    // stride 30 — overlapping LLM training windows with integer
    // offsets. The oracle restates the chunk schedule (count, starts,
    // clamped lengths) and re-slices the text with DuckDB's own list
    // machinery, so the schedule arithmetic AND the span extraction are
    // both cross-checked.
    QueryDef.sql("q210_chunk_windows",
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, toks, n,
        |    unnest(generate_series(0, CASE WHEN n <= 40 THEN 0
        |      ELSE (n - 40 + 29) // 30 END)) AS chunk_id
        |  FROM d)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(chunk_id * 30 + 1 AS BIGINT) AS start_pos,
        |  CAST(least(40, n - chunk_id * 30) AS BIGINT) AS chunk_len,
        |  array_to_string(list_slice(toks, chunk_id * 30 + 1,
        |    chunk_id * 30 + least(40, n - chunk_id * 30)), ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
      graft.operators.Chunker.slidingChunks(
        Tables.documents(s, d), "doc_id", "text", window = 40, stride = 30)
        .orderBy("doc_id", "chunk_id")
    }
  )
}
