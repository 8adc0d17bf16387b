package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch: per group, keep the k
  * smallest 32-bit hash values of the distinct keys; with h_k the k-th
  * smallest hash, D ≈ (k−1)·2³²/h_k. The mergeable alternative to HLL
  * when the consumer wants an EXACTLY reproducible sketch: two sketches
  * union by "merge the value lists, keep the k smallest" — an
  * associative, order-independent operation, so partial sketches from
  * 1000 executors (or 1000 days of partitions) combine without error
  * drift, and the same data always yields the same bits.
  *
  * Cross-engine determinism: the hash is [[CountMin]]'s masked
  * xorshift32 chain (XOR/shift/AND only — Spark ANSI long-multiply
  * overflow and DuckDB's shift guard both rule out multiply-shift
  * families; CLAUDE.md ground rule), so an oracle can rebuild the
  * IDENTICAL sketch in SQL and hash-match it bit-for-bit — no
  * tolerance band needed (contrast q55's HLL, which is checked against
  * a ±2% envelope because its internals are engine-private).
  *
  * Plan: one distinct over (grp, key) — the only input-sized shuffle,
  * map-side combined — then a group-partitioned rank window over the
  * (hash, key) total order keeps k rows per group, and one tiny agg
  * emits the summary. Keys, not raw rows, enter the window: its input
  * is the distinct frame, and the kept state is k longs per group.
  * (hash, key) ordering — not hash alone — makes the k-th value
  * deterministic even across hash collisions.
  */
object Kmv {

  /** Full 32-bit masked-xorshift hash, TWO rounds with a seed XOR
    * between them ([[CountMin.bucket]]'s chain run twice). CountMin
    * only needs determinism, but the KMV estimate depends on hash
    * UNIFORMITY, and one xorshift round leaves sequential keys
    * correlated enough to bias the k-th minimum ~2.8× (measured on
    * 1..5000: one-round est 1807 vs two-round 4898 at k=256).
    * Deterministic and identical in DuckDB SQL — XOR/shift/AND only. */
  def hash32(key: Column, seed: Long, seed2: Long = 2246822507L): Column = {
    val M32 = 4294967295L
    def round(in: Column): Column = {
      val x1 = in.bitwiseXOR(shiftleft(in, 13).bitwiseAND(lit(M32)))
      val x2 = x1.bitwiseXOR(shiftright(x1, 17))
      x2.bitwiseXOR(shiftleft(x2, 5).bitwiseAND(lit(M32)))
    }
    round(round(key.bitwiseAND(lit(M32)).bitwiseXOR(lit(seed)))
      .bitwiseXOR(lit(seed2)))
  }

  /** JVM twin of [[hash32]] for [[KmvAgg]]'s per-row update path —
    * KmvSpec asserts the two forms agree on random keys (all values
    * stay in [0, 2³²), so Spark's arithmetic shiftright matches `>>`
    * here). */
  def hash32Jvm(key: Long, seed: Long = 2654435769L,
                seed2: Long = 2246822507L): Long = {
    val M32 = 4294967295L
    def round(in: Long): Long = {
      val x1 = in ^ ((in << 13) & M32)
      val x2 = x1 ^ (x1 >> 17)
      x2 ^ ((x2 << 5) & M32)
    }
    round(round((key & M32) ^ seed) ^ seed2)
  }

  /** Per-group KMV summary of `keyCol`: (grp, k_used, kth_hash) where
    * k_used = min(k, |distinct keys|) and kth_hash is the k_used-th
    * smallest hash — the pair that determines the estimate
    * (k_used−1)·2³²/kth_hash (float left to the consumer; for groups
    * with fewer than k distinct keys the sketch IS the exact count). */
  def sketch(df: DataFrame, grpCol: String, keyCol: String, k: Int,
             seed: Long = 2654435769L): DataFrame = {
    require(k >= 2 && k <= 65536, "k: 2..65536")
    // NULL keys are excluded (COUNT DISTINCT convention) — also keeps
    // this form bit-identical to KmvAgg, whose per-row update skips
    // nulls, and avoids the engines' opposite NULL sort order (Spark
    // nulls-first vs DuckDB nulls-last) ever reaching the rank window
    val keys = df.select(col(grpCol), col(keyCol).cast("long").as("_k"))
      .filter(col("_k").isNotNull)
      .distinct()
      .withColumn("_h", hash32(col("_k"), seed))
    val w = Window.partitionBy(grpCol).orderBy(col("_h"), col("_k"))
    keys.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .groupBy(grpCol)
      .agg(count(lit(1)).cast("long").as("k_used"),
        max(col("_h")).as("kth_hash"))
  }
}
