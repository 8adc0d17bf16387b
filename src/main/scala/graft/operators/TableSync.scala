package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bucket-digest table synchronization — the anti-entropy / Merkle-tree
  * pattern (Cassandra repair, DynamoDB replica sync) as a Spark plan:
  * to reconcile two replicas of a huge keyed table, first compare tiny
  * per-bucket digests (one scan each, map-side-combined aggregation to
  * `buckets` rows — no join of the full tables), then run the exact
  * row-level diff ONLY over the buckets whose digests disagree. Two
  * daily 100 TB snapshots that differ in a handful of keys cost two
  * scans plus a join over the dirty buckets' rows — versus
  * [[ChangeCapture.snapshotDiff]] alone, which shuffles both full
  * tables into one giant key join every time.
  *
  * The digest must be order-independent (bucket contents arrive in any
  * partition order) and engine-independent (q114's DuckDB oracle
  * rebuilds it in SQL): each row folds its key/value longs through a
  * chained masked xorshift32 ([[CountMin]]'s hash discipline — XOR,
  * shifts and AND masks only, every intermediate < 2^32, so ANSI
  * long-multiply overflow and 63-bit shift limits are unreachable in
  * both engines), and a bucket's digest is (row count, SUM of row
  * hashes as DECIMAL(38,0)). Sums commute, so the digest is independent
  * of row order and partitioning; a single changed/inserted/deleted row
  * changes n or hsum with probability 1 − 2⁻³² per bucket.
  *
  * Rows are assigned to buckets by KEY hash only — a changed payload
  * must keep its row in the same bucket for the digest comparison to
  * localize it.
  *
  * Cache ownership: persists internal frames the returned (lazy)
  * result depends on; the CALLER releases after materializing —
  * graft.Caches.releaseAll(spark) (docs/CACHE_POLICY.md rule 1).
  */
object TableSync {

  private val M32 = 4294967295L

  private def xs32(x: Column): Column = {
    val x1 = x.bitwiseXOR(shiftleft(x, 13).bitwiseAND(lit(M32)))
    val x2 = x1.bitwiseXOR(shiftright(x1, 17))
    x2.bitwiseXOR(shiftleft(x2, 5).bitwiseAND(lit(M32)))
  }

  /** Order-independent 32-bit hash of a row's long columns: fold each
    * column's two 32-bit halves into the state, xorshifting between
    * columns. Mirrors 1:1 into any SQL engine (q114's oracle). */
  def rowHash(cols: Seq[Column], seed: Long = 2654435769L): Column =
    cols.foldLeft(lit(seed): Column)((h, c) =>
      xs32(h.bitwiseXOR(c.bitwiseAND(lit(M32)))
        .bitwiseXOR(shiftright(c, 32).bitwiseAND(lit(M32)))))

  /** Per-bucket digests of `df`: (bucket, n, hsum). `keyH`/`rowH` are
    * [[rowHash]] columns over the key columns / all compared columns.
    * One scan, map-side combine, ≤ `buckets` result rows. */
  def bucketDigest(df: DataFrame, keyH: Column, rowH: Column,
                   buckets: Int): DataFrame = {
    require(buckets > 0)
    df.select(pmod(keyH, lit(buckets.toLong)).as("bucket"), rowH.as("h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum(col("h").cast(DecimalType(38, 0))).as("hsum"))
  }

  /** Buckets whose digests disagree (either side missing counts as
    * disagreeing). Output: (bucket) — at most `buckets` rows. */
  def dirtyBuckets(oldDig: DataFrame, newDig: DataFrame): DataFrame = {
    val o = oldDig.select(col("bucket"), col("n").as("n_o"), col("hsum").as("h_o"))
    val n = newDig.select(col("bucket"), col("n").as("n_n"), col("hsum").as("h_n"))
    o.join(n, Seq("bucket"), "full_outer")
      .filter(!(col("n_o") <=> col("n_n")) || !(col("h_o") <=> col("h_n")))
      .select("bucket")
  }

  /** End-to-end reconciliation: digest both snapshots, find dirty
    * buckets, and run the exact [[ChangeCapture.snapshotDiff]] over
    * dirty-bucket rows only. `keyH` must reference only `keyCols`.
    * Output: keyCols ++ (change: I|U|D) — identical to a full
    * snapshotDiff, computed from a fraction of the data. */
  def syncDiff(oldDf: DataFrame, newDf: DataFrame, keyH: Column,
               rowH: Column, buckets: Int,
               keyCols: Seq[String], cmpCols: Seq[String]): DataFrame = {
    // persist: `dirty` (≤ buckets rows) is broadcast into BOTH scans'
    // semi-joins below; without caching, each broadcast re-runs both
    // digest scans+aggregations (AQE's broadcast rewrite defeats
    // ReuseExchange across the two consumers — same mechanism as
    // [[SetSimJoin.jaccardJoin]]'s persisted stages)
    val dirty = dirtyBuckets(
      bucketDigest(oldDf, keyH, rowH, buckets),
      bucketDigest(newDf, keyH, rowH, buckets)).persist()
    val b = pmod(keyH, lit(buckets.toLong))
    // dirty is ≤ buckets rows — broadcast the prune into both scans
    def prune(df: DataFrame): DataFrame = df
      .withColumn("_b", b)
      .join(broadcast(dirty), col("_b") === col("bucket"), "left_semi")
      .drop("_b")
    ChangeCapture.snapshotDiff(prune(oldDf), prune(newDf), keyCols, cmpCols)
  }
}
