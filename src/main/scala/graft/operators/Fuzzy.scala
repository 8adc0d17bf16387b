package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) string matching at join scale.
  *
  * The naive form is a cross join with a `levenshtein() ≤ d` residual —
  * quadratic and unshardable. This operator makes it an EQUI-join via
  * length-band blocking: `|len(a) − len(b)| ≤ d` is a necessary
  * condition for edit distance ≤ d, so bucketing strings by
  * `len div (d+1)` guarantees every true match lands in the same or an
  * adjacent bucket. The left side fans out to its 3 candidate buckets
  * (a fixed 3× explode, independent of data size), the join is a plain
  * hash equi-join on the bucket id, and `levenshtein` verifies only
  * candidates whose lengths already agree to ±d.
  *
  * The blocking is LOSSLESS (candidate superset ⊇ true matches), which
  * q98's oracle proves: DuckDB computes the UNBLOCKED cross join and
  * the results must agree row-for-row. Costs: candidates ≈ pairs that
  * agree on length to ±(2d+1) — for name-like data with spread lengths
  * that is a small fraction of the cross product; skewed length
  * distributions degrade toward cross-join cost and want a second
  * blocking key (e.g. first-char class) at the price of losing
  * first-char edits.
  */
object Fuzzy {

  /** Pairs (left row, right row) with `levenshtein(l, r) ≤ maxDist`.
    * Output: left columns ++ right columns ++ `dist`. Column names must
    * not collide across the two inputs. */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
                lCol: String, rCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 8, "fuzzyJoin: 1..8 edits")
    val w = maxDist + 1
    val l = left
      .withColumn("_off", explode(array((-1 to 1).map(lit): _*)))
      .withColumn("_lb", col("_off") + expr(s"length($lCol) div $w"))
      .drop("_off")
    val r = right.withColumn("_rb", expr(s"length($rCol) div $w"))
    l.join(r, col("_lb") === col("_rb") &&
        abs(length(col(lCol)) - length(col(rCol))) <= maxDist)
      // threshold form: banded O(maxDist·n) DP with early exit instead
      // of the full O(n²) matrix per candidate — returns the exact
      // distance when ≤ maxDist and -1 otherwise, so the filter and the
      // emitted dist are unchanged for every surviving pair (q98's
      // unblocked oracle still proves losslessness end-to-end)
      .withColumn("dist", levenshtein(col(lCol), col(rCol), maxDist))
      .filter(col("dist") =!= -1)
      .drop("_lb", "_rb")
  }
}
