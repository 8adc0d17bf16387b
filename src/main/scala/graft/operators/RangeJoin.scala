package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval range join: match each point (key, ts)
  * to every interval [start, end] of the same key that contains it —
  * without the quadratic per-key blowup of the naive equi-join +
  * residual-filter plan, which explodes when a key has many points AND
  * many intervals (every pair is a candidate).
  *
  * Chunked formulation: time is cut into fixed `chunkWidth` buckets; a
  * point lands in exactly one chunk, an interval is exploded to each
  * chunk it overlaps, and the join runs on (key, chunk) with the
  * BETWEEN residual applied only within a chunk. Candidate cost drops
  * from Σ_key |P|·|I| to Σ_(key,chunk) |P|·|I| — bounded by chunk
  * width, the knob that trades interval replication (≈ avg interval
  * length / chunkWidth extra rows) against candidate density. Both
  * sides shuffle once on (key, chunk); no window, no cartesian. Pick
  * chunkWidth at or above the typical interval length so the
  * replication factor stays ~2.
  *
  * A point inside a chunk meets every containing interval exactly once
  * (the interval covers that chunk), so the output needs no distinct.
  * Boundaries are inclusive on both ends.
  */
object RangeJoin {

  /** Join `points` (carrying `tsCol`, epoch ms) to containing
    * `intervals` (carrying `startCol`/`endCol`, epoch ms) per `keyCol`.
    * Returns point columns + interval columns (minus the helper chunk).
    * `tsCol`/`startCol`/`endCol` must be integral (ms) — `div`
    * arithmetic, not double division.
    *
    * `maxChunksPerInterval` guards the explosion: one data-quality
    * outlier (an open-ended sentinel end like Long.MaxValue) would
    * otherwise ask sequence() for a trillions-long array and kill the
    * job with an opaque error. Such a row fails fast with a message
    * naming the offending interval instead. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keyCol: String, tsCol: String,
                      startCol: String, endCol: String,
                      chunkWidth: Long,
                      maxChunksPerInterval: Int = 4096): DataFrame = {
    require(chunkWidth > 0, "chunkWidth must be positive")
    val p = points.withColumn("_chunk", expr(s"$tsCol div $chunkWidth"))
    val startChunk = expr(s"$startCol div $chunkWidth")
    val endChunk = expr(s"$endCol div $chunkWidth")
    val safeEnd = when(endChunk - startChunk < lit(maxChunksPerInterval.toLong),
        endChunk)
      .otherwise(raise_error(concat(
        lit(s"pointInInterval: interval spans ≥$maxChunksPerInterval chunks ("),
        col(startCol).cast("string"), lit(".."), col(endCol).cast("string"),
        lit(") — raise chunkWidth/maxChunksPerInterval or clean the interval"))))
    val i = intervals.withColumn("_chunk", explode(sequence(startChunk, safeEnd)))
    p.join(i, Seq(keyCol, "_chunk"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_chunk")
  }

  /** Interval×interval overlap join per key: every pair of intervals
    * (one from `a`, one from `b`, same key) with a non-empty
    * intersection, inclusive bounds — the temporal-alignment shape
    * (SCD2 segment intersection, booking-conflict detection) that
    * [[pointInInterval]]'s point probe can't express. Same chunked
    * plan: both sides explode to the chunks they cover and join on
    * (key, chunk), so candidate cost is per-chunk density, never the
    * per-key |A|·|B| quadratic.
    *
    * An overlapping pair shares every chunk of its intersection; the
    * join would emit it once per shared chunk, so the residual keeps
    * ONLY the intersection's FIRST chunk (chunk of max(aStart, bStart)
    * — a chunk both sides cover by construction): exactly-once output
    * with no distinct. Output: all a/b columns (minus helpers). */
  def intervalOverlap(a: DataFrame, b: DataFrame, keyCol: String,
                      aStart: String, aEnd: String,
                      bStart: String, bEnd: String,
                      chunkWidth: Long,
                      maxChunksPerInterval: Int = 4096): DataFrame = {
    require(chunkWidth > 0, "chunkWidth must be positive")
    def chunked(df: DataFrame, s: String, e: String): DataFrame = {
      val sc = expr(s"$s div $chunkWidth")
      val ec = expr(s"$e div $chunkWidth")
      val safeEnd = when(ec - sc < lit(maxChunksPerInterval.toLong), ec)
        .otherwise(raise_error(concat(
          lit(s"intervalOverlap: interval spans ≥$maxChunksPerInterval chunks ("),
          col(s).cast("string"), lit(".."), col(e).cast("string"),
          lit(") — raise chunkWidth/maxChunksPerInterval or clean the interval"))))
      df.withColumn("_chunk", explode(sequence(sc, safeEnd)))
    }
    chunked(a, aStart, aEnd)
      .join(chunked(b, bStart, bEnd), Seq(keyCol, "_chunk"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd) &&
        col("_chunk") === expr(s"greatest($aStart, $bStart) div $chunkWidth"))
      .drop("_chunk")
  }
}
