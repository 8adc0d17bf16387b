package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding token-window chunking — the standard LLM context-window prep
  * (BERT/long-doc "stride" chunking): each document's token stream is cut
  * into windows of `window` tokens advancing by `stride`, so consecutive
  * chunks overlap by `window − stride` tokens and every token is covered.
  * Complements [[Curation]]'s concat-and-chunk packing (q75), which packs
  * MANY docs into fixed budgets; this splits ONE doc into overlapping
  * training windows.
  *
  * Chunk schedule (all integer arithmetic, so the oracle can restate it
  * exactly): for a doc of n tokens, chunk ids run 0..m with
  * m = 0 when n ≤ window, else ⌈(n − window)/stride⌉ — the smallest id
  * whose window reaches the end of the doc. Chunk i starts at token
  * i·stride (0-based) with length min(window, n − i·stride); because
  * stride ≤ window, every chunk has ≥ 1 token and introduces new tokens
  * (no fully-redundant tail chunk).
  *
  * Scale design: pure row-local explode — no shuffle at all; output rows
  * ≈ n/stride per doc, each carrying its integer offsets so downstream
  * can reconstruct spans without re-tokenizing.
  */
object Chunker {

  /** (doc_id, chunk_id, start_pos [1-based], chunk_len, chunk_text). */
  def slidingChunks(docs: DataFrame, idCol: String, textCol: String,
                    window: Int, stride: Int): DataFrame = {
    require(window >= 1, "window >= 1")
    require(stride >= 1 && stride <= window, "1 <= stride <= window")
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("chunk_id", explode(expr(
        s"sequence(0L, CASE WHEN n <= $window THEN 0L " +
          s"ELSE (n - $window + $stride - 1) div $stride END)")))
      .withColumn("start0", col("chunk_id") * stride)
      .withColumn("chunk_len", least(lit(window.toLong), col("n") - col("start0")))
      .select(col("doc_id"), col("chunk_id"),
        (col("start0") + 1L).as("start_pos"),
        col("chunk_len"),
        array_join(slice(col("toks"), (col("start0") + 1L).cast("int"),
          col("chunk_len").cast("int")), " ").as("chunk_text"))
  }
}
