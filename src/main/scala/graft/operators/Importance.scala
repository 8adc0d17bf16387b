package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR-style importance scoring for training-data selection (public
  * method: Xie et al., "Data Selection for Language Models via
  * Importance Resampling", NeurIPS 2023; reference repo has no
  * counterpart — net-new pipeline operator): rank each document of a
  * raw pool by how much its token distribution resembles a target
  * corpus, with a bag-of-words linear score.
  *
  * Exact-integer variant: instead of the paper's log-probability
  * ratio (a float accumulation that would flake cross-engine), the
  * per-token weight is the difference of SCALE-scaled occurrence
  * rates over the top-V vocabulary
  *
  *   w(t) = cnt_target(t)·SCALE div N_target
  *        − cnt_raw(t)·SCALE div N_raw
  *
  * where N_* are the vocabulary-token occurrence totals per side.
  * Same sign and ordering semantics as the rate ratio for ranking,
  * and every step is integral-exact: counts are BIGINT, the ·SCALE
  * products are carried as DECIMAL(38,0) (at 100 TB the corpus holds
  * ~10^13 token occurrences, so cnt·10^9 overflows BIGINT and ANSI
  * throws — the q184/q185 headroom rule), and `div` on decimals
  * returns the same integral quotient as the BIGINT form (asserted in
  * ImportanceSpec), so the DuckDB oracle mirrors it with HUGEINT `//`.
  *
  * Scale design: ONE token-explode scan with map-side combine builds
  * the V-row count table; the vocabulary cap is TakeOrdered (no
  * global window); N_* totals are an O(1) driver fold of that V-row
  * table; scoring is a broadcast join of the V-row weight table
  * against a second token scan plus one doc-keyed sum — no all-pairs
  * term anywhere, shuffles keyed on token then doc only.
  *
  * Cache ownership: persists internal frames the returned (lazy)
  * result depends on; the CALLER releases after materializing —
  * graft.Caches.releaseAll(spark) (docs/CACHE_POLICY.md rule 1).
  */
object Importance {

  val Scale = 1000000000L

  /** Per-token occurrence counts split by target membership:
    * (token, cnt_t, cnt_r), capped to the top-`vocabSize` tokens by
    * total occurrences (ties by token ascending). */
  def vocabCounts(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, vocabSize: Int): DataFrame = {
    val tok = docs
      .select(col(idCol).as("doc"),
        explode(split(col(textCol), " ")).as("token"), isTarget.as("tgt"))
      .filter(col("token") =!= "")
    tok.groupBy("token")
      .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("cnt_t"),
        sum(when(col("tgt"), 0L).otherwise(1L)).as("cnt_r"))
      .orderBy((col("cnt_t") + col("cnt_r")).desc, col("token"))
      .limit(vocabSize)
  }

  /** Scaled-rate-difference weight table (token, weight) from a
    * [[vocabCounts]] frame. The two totals are an O(V) driver fold —
    * the bounded-collect pattern (vocabSize rows, not data-scale). */
  def weights(spark: SparkSession, vocab: DataFrame): DataFrame = {
    // Two consumers (the totals fold below, then the weight
    // projection): without persist the full token-explode scan + agg
    // behind `vocab` recomputes once per consumer (ADVICE r8; same
    // multi-consumer rule as the AQE/ReuseExchange ground rule).
    val v = vocab.persist()
    val t = v.agg(sum("cnt_t"), sum("cnt_r")).head()
    val nT = math.max(1L, if (t.isNullAt(0)) 0L else t.getLong(0))
    val nR = math.max(1L, if (t.isNullAt(1)) 0L else t.getLong(1))
    v.select(col("token"),
      (expr(s"cast(cnt_t as decimal(38,0)) * $Scale div $nT") -
        expr(s"cast(cnt_r as decimal(38,0)) * $Scale div $nR")).as("weight"))
  }

  /** Per-document importance score: Σ over the doc's vocabulary-token
    * occurrences of the token weight, plus the hit count. The weight
    * table is vocabulary-sized and broadcast. */
  def scores(docs: DataFrame, idCol: String, textCol: String,
             weightTable: DataFrame): DataFrame = {
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
      .join(broadcast(weightTable), "token")
      .groupBy("doc_id")
      .agg(sum("weight").as("score"), count(lit(1)).as("n_hits"))
  }

  /** Discriminative-vocabulary extraction (feature selection): per
    * token, the DOC frequencies on the target and rest sides plus the
    * cross-multiplied rate-difference score |df_t·B − df_r·A| (A/B =
    * total target/rest docs) — the integer-exact core of a log-odds /
    * χ² keyword ranking (same numerator sign; no float ratios, so the
    * oracle matches bit-for-bit). Products pre-cast DECIMAL(38,0):
    * df·total ≈ 10^13·10^13 at corpus scale overflows BIGINT and ANSI
    * throws (the q184/q185 headroom rule); the score exits as a digit
    * string (no DecimalType in output schemas).
    *
    * Scale design: one explode + per-doc distinct (map-side combined,
    * keyed (doc, token)), one token-keyed agg, the 2-value totals row
    * cross-joined broadcast (the J4 shape), TakeOrdered top-k. */
  def discriminativeTokens(docs: DataFrame, idCol: String, textCol: String,
                           isTarget: Column, topK: Int): DataFrame = {
    val tok = docs.select(col(idCol).as("doc"),
        explode(split(col(textCol), " ")).as("token"), isTarget.as("tgt"))
      .filter(col("token") =!= "").distinct()
    val tot = docs.agg(
      countDistinct(when(isTarget, col(idCol))).as("big_a"),
      countDistinct(when(!isTarget, col(idCol))).as("big_b"))
    tok.groupBy("token")
      .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("df_t"),
        sum(when(col("tgt"), 0L).otherwise(1L)).as("df_r"))
      .crossJoin(broadcast(tot))
      .withColumn("score_dec",
        abs(col("df_t").cast("decimal(38,0)") * col("big_b") -
          col("df_r").cast("decimal(38,0)") * col("big_a")))
      .orderBy(col("score_dec").desc, col("token"))
      .limit(topK)
      .select(col("token"), col("df_t"), col("df_r"),
        col("score_dec").cast("string").as("score"))
  }
}
