package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch position-based ("U-shaped") marketing attribution: every
  * conversion distributes exactly 1000 permille of credit across the
  * touchpoint events that preceded it within a horizon — the multi-touch
  * counterpart of the last-touch as-of attribution (q156,
  * operators/AsofJoin.asofMatchBounded). The event-log analytics surface
  * generalizes the reference's fetch-log accounting
  * (optimade_database/Optimade_Server/server.py:148-170, per-request
  * provenance rows) to credit assignment over those rows.
  *
  * Credit rule (all integer permille, Σ per conversion ≡ 1000 exactly):
  *  - 1 touch  → 1000;
  *  - 2 touches → 500 each;
  *  - n ≥ 3    → first 400 + (200 mod (n−2)), last 400, each middle
  *    200 div (n−2). The mod remainder rides on the FIRST touch so the
  *    identity 400 + r + 400 + (n−2)·⌊200/(n−2)⌋ = 1000 holds for every
  *    n — no float shares, no rounding drift.
  *
  * Scale: candidate pairs come from [[RangeJoin.pointInInterval]] on
  * (user, time-chunk) — per-conversion intervals span ≤ 2 chunks at
  * chunkWidth = horizon, so the join never pays the per-user
  * touches × conversions quadratic of a plain user equi-join. The
  * position/count windows partition by conversion id (partitions bounded
  * by touches-per-horizon, never global). Two shuffles total:
  * (user, chunk) for the join, conv_id for the windows.
  */
object Attribution {

  /** Credit each qualifying touch. Input needs (event_id, ts, user_id,
    * event_type). A touch qualifies for a conversion when it is the same
    * user's event of a `touchTypes` type with
    * conv_ms − horizonMs ≤ touch_ms ≤ conv_ms − 1 (strictly before the
    * conversion — a same-millisecond touch is not a cause). Output:
    * (conv_id, touch_id, event_type, touch_ms, pos, n, credit). */
  def positionCredits(events: DataFrame, horizonMs: Long,
                      convType: String = "purchase",
                      touchTypes: Seq[String] = Seq("click", "view", "signup"))
      : DataFrame = {
    require(horizonMs > 0, s"horizonMs must be positive: $horizonMs")
    val ev = events.select(col("event_id"), unix_millis(col("ts")).as("ms"),
      col("user_id"), col("event_type"))
    val conv = ev.filter(col("event_type") === convType)
      .select(col("event_id").as("conv_id"), col("user_id"),
        (col("ms") - horizonMs).as("start_ms"), (col("ms") - 1L).as("end_ms"))
    val touch = ev.filter(col("event_type").isin(touchTypes: _*))
      .select(col("event_id").as("touch_id"), col("user_id"),
        col("ms").as("touch_ms"), col("event_type"))
    val cand = RangeJoin.pointInInterval(touch, conv,
      keyCol = "user_id", tsCol = "touch_ms",
      startCol = "start_ms", endCol = "end_ms",
      chunkWidth = horizonMs)
    val byTime = Window.partitionBy("conv_id")
      .orderBy(col("touch_ms"), col("touch_id"))
    val perConv = Window.partitionBy("conv_id")
    cand
      .withColumn("pos", row_number().over(byTime))
      .withColumn("n", count(lit(1)).over(perConv))
      .withColumn("credit",
        when(col("n") === 1, lit(1000L))
          .when(col("n") === 2, lit(500L))
          .when(col("pos") === 1, lit(400L) + lit(200L) % (col("n") - 2L))
          .when(col("pos") === col("n"), lit(400L))
          .otherwise(expr("200L div (n - 2L)")))
      .select(col("conv_id"), col("touch_id"), col("event_type"),
        col("touch_ms"), col("pos"), col("n"), col("credit"))
  }
}
