package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: for every left row, the right row with the
  * LARGEST timestamp ≤ the left row's timestamp within the same key —
  * the classic point-in-time lookup (latest quote before a trade,
  * latest view before a click) that Spark has no built-in operator for.
  *
  * Spark-first plan: NOT a join at all. Both sides are union-tagged and
  * sorted per key by (ts, side) — right rows before left rows at equal
  * ts, making the match inclusive — and one running `last(right_id,
  * ignoreNulls)` window carries the newest right id forward into each
  * left row. Cost is ONE shuffle of (|L|+|R|) rows on the key plus a
  * per-key sort: no candidate pair blowup, no range-join quadratic
  * corner, and the window is always key-partitioned (never global). At
  * 100 TB this is the layout-friendly formulation — both inputs shuffle
  * once on the same key, and a bucketed-by-key layout removes even
  * that.
  *
  * Determinism: rows with equal (key, ts) on the right would make the
  * match order-dependent, so the right side is pre-reduced to one row
  * per (key, ts) keeping max(rightId) — mirrored in the oracle SQL.
  * Equal-ts LEFT rows all see the same preceding-right prefix (left
  * rows carry null right ids which `ignoreNulls` skips), so their
  * matches are deterministic without any left-side tie rule.
  */
object AsofJoin {

  /** Inner as-of match of `left` to `right` on `keyCol` with
    * `leftTs`/`rightTs`: returns (keyCol, left_id, leftTs, right_id) —
    * one row per left row that has a match (inner semantics; unmatched
    * left rows are dropped). */
  def asofMatch(left: DataFrame, right: DataFrame,
                keyCol: String, leftTs: String, rightTs: String,
                leftIdCol: String, rightIdCol: String): DataFrame = {
    val r = right
      .groupBy(col(keyCol).as("k"), col(rightTs).as("ts"))
      .agg(max(col(rightIdCol)).as("rid"))
      .select(col("k"), col("ts"), lit(0).as("side"),
        lit(null).cast("long").as("left_id"), col("rid"))
    val l = left.select(col(keyCol).as("k"), col(leftTs).as("ts"),
      lit(1).as("side"), col(leftIdCol).cast("long").as("left_id"),
      lit(null).cast("long").as("rid"))
    val w = Window.partitionBy("k").orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    r.unionByName(l)
      .withColumn("right_id", last(col("rid"), ignoreNulls = true).over(w))
      .filter(col("side") === 1 && col("right_id").isNotNull)
      .select(col("k").as(keyCol), col("left_id"),
        col("ts").as(leftTs), col("right_id"))
  }

  /** Horizon-bounded LEFT OUTER as-of match — the attribution shape:
    * every left row (conversion) paired with the latest right row
    * (touchpoint) at-or-before it within `horizonMs`, or NULL when the
    * latest preceding touchpoint is older than the horizon (a stale
    * match is no match: since the carried row is the LATEST one, no
    * earlier row can be inside the horizon either, so the post-filter
    * is exact, not approximate). Same single-shuffle union-tag plan as
    * [[asofMatch]] — one extra running window carries the matched right
    * TIMESTAMP forward so the age is computable without a join back.
    *
    * Output: (keyCol, left_id, leftTs, right_id, age_ms) with right_id
    * and age_ms NULL for unattributed left rows; age_ms is the
    * difference of the two MILLISECOND floors (mirror `epoch_ms(l) -
    * epoch_ms(r)` in oracles — floor-of-difference differs). */
  def asofMatchBounded(left: DataFrame, right: DataFrame,
                       keyCol: String, leftTs: String, rightTs: String,
                       leftIdCol: String, rightIdCol: String,
                       horizonMs: Long): DataFrame = {
    require(horizonMs >= 0, "horizonMs must be >= 0")
    val r = right
      .groupBy(col(keyCol).as("k"), col(rightTs).as("ts"))
      .agg(max(col(rightIdCol)).as("rid"))
      .select(col("k"), col("ts"), lit(0).as("side"),
        lit(null).cast("long").as("left_id"), col("rid"))
    val l = left.select(col(keyCol).as("k"), col(leftTs).as("ts"),
      lit(1).as("side"), col(leftIdCol).cast("long").as("left_id"),
      lit(null).cast("long").as("rid"))
    val w = Window.partitionBy("k").orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // rid is non-null on every side-0 row, so both running `last`s pick
    // the SAME (latest preceding right) row — id and ts stay paired
    r.unionByName(l)
      .withColumn("m_rid", last(col("rid"), ignoreNulls = true).over(w))
      .withColumn("m_ts",
        last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .withColumn("age",
        unix_millis(col("ts")) - unix_millis(col("m_ts")))
      .withColumn("fresh", col("m_rid").isNotNull && col("age") <= horizonMs)
      .select(col("k").as(keyCol), col("left_id"), col("ts").as(leftTs),
        when(col("fresh"), col("m_rid")).as("right_id"),
        when(col("fresh"), col("age")).as("age_ms"))
  }

  /** Nearest-event join — sensor/log alignment: every left row paired
    * with the right row whose timestamp is CLOSEST in either direction
    * (ties at equal distance → the earlier right row; left outer: keys
    * with no right rows emit NULL). The as-of family's symmetric
    * sibling: backward-only as-of is wrong when the truth may have been
    * recorded just after the probe.
    *
    * Same single-shuffle union-tag plan, two running windows instead of
    * one: the PRECEDING frame carries the latest right at-or-before
    * (right rows sort before left at equal ts, so distance-0 matches
    * land here), the FOLLOWING frame carries the earliest right
    * strictly after; one comparison in exact MICROSECONDS picks the
    * winner. No join operator, no candidate blowup, windows always
    * key-partitioned. Right side pre-reduced to one row per (key, ts)
    * keeping max id (the [[asofMatch]] determinism rule).
    *
    * Output: (keyCol, left_id, leftTs, right_id, delta_us) with
    * delta_us = left µs − matched µs (negative when the match is
    * after the probe), both NULL for keys without rights. */
  def nearestMatch(left: DataFrame, right: DataFrame,
                   keyCol: String, leftTs: String, rightTs: String,
                   leftIdCol: String, rightIdCol: String): DataFrame = {
    val r = right
      .groupBy(col(keyCol).as("k"), col(rightTs).as("ts"))
      .agg(max(col(rightIdCol)).as("rid"))
      .select(col("k"), col("ts"), lit(0).as("side"),
        lit(null).cast("long").as("left_id"), col("rid"))
    val l = left.select(col(keyCol).as("k"), col(leftTs).as("ts"),
      lit(1).as("side"), col(leftIdCol).cast("long").as("left_id"),
      lit(null).cast("long").as("rid"))
    val ord = Window.partitionBy("k").orderBy(col("ts"), col("side"))
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = ord.rowsBetween(0, Window.unboundedFollowing)
    val us = (c: Column) => unix_micros(c)
    val tagged = r.unionByName(l)
      .withColumn("p_rid", last(col("rid"), ignoreNulls = true).over(wPrev))
      .withColumn("p_ts",
        last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(wPrev))
      .withColumn("n_rid", first(col("rid"), ignoreNulls = true).over(wNext))
      .withColumn("n_ts",
        first(when(col("side") === 0, col("ts")), ignoreNulls = true).over(wNext))
      .filter(col("side") === 1)
    val dPrev = us(col("ts")) - us(col("p_ts"))
    val dNext = us(col("n_ts")) - us(col("ts"))
    val usePrev = col("p_rid").isNotNull &&
      (col("n_rid").isNull || dPrev <= dNext)
    tagged.select(col("k").as(keyCol), col("left_id"), col("ts").as(leftTs),
      when(usePrev, col("p_rid")).otherwise(col("n_rid")).as("right_id"),
      when(usePrev, dPrev)
        .otherwise(when(col("n_rid").isNotNull, -dNext)).as("delta_us"))
  }
}
