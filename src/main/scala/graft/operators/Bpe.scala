package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The counting core of byte-pair-encoding tokenizer training (Sennrich
  * et al., "Neural Machine Translation of Rare Words with Subword
  * Units", ACL 2016), lifted to word level over a document corpus: one
  * BPE round = count adjacent symbol pairs, pick the most frequent,
  * merge its occurrences, repeat. At 100 TB the count is the expensive
  * half — a full-corpus scan per round — and it is embarrassingly
  * parallel: explode each doc's adjacent pairs, map-side-combine, one
  * shuffle keyed by pair (q118's oracle recounts via positional
  * unnest + self-indexing, a different enumeration of the same pairs).
  *
  * The merge half ([[applyMerge]]) is row-local but inherently
  * sequential WITHIN a document (left-greedy, consumed tokens can't
  * start a new match: merging (a,a) in "a a a" yields [aa, a], not
  * [aa, aa]), so it's a per-row function rather than a relational
  * expression — fine at scale (no shuffle at all), spec'd against a
  * driver-side reference including the overlap cases.
  */
object Bpe {

  /** Adjacent-pair counts over space-tokenized `textCol`: (w1, w2,
    * cnt). Tokens are bound to an attribute before the transform runs —
    * the interpreted-HOF ground rule (see Dedup.minhashSigOf). */
  def adjacentPairCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w)-1), i -> struct(w[i-1] AS w1, w[i] AS w2))"))
        .as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))

  /** Left-greedy merge of adjacent (w1, w2) occurrences into `joined`
    * within each doc's token stream — one BPE merge application.
    * Returns `docs` with `textCol` rewritten. */
  def applyMerge(docs: DataFrame, textCol: String,
                 w1: String, w2: String, joined: String): DataFrame = {
    val mergeUdf = udf { (text: String) =>
      val ts = text.split(" ", -1)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < ts.length) {
        if (i + 1 < ts.length && ts(i) == w1 && ts(i + 1) == w2) {
          out += joined; i += 2
        } else { out += ts(i); i += 1 }
      }
      out.mkString(" ")
    }
    docs.withColumn(textCol, mergeUdf(col(textCol)))
  }
}
