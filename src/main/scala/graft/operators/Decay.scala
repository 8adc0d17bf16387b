package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Half-life time-decayed event weighting: each event contributes
  * Scale div 2^age, age in whole buckets (default days) behind the
  * corpus's latest event — recency-weighted popularity/heavy-hitter
  * counts with EXACT integer arithmetic instead of the usual
  * exp(−λ·Δt) (libm exp differs in the last ulp across engines; a
  * power-of-two ladder is bit-identical everywhere and is the classic
  * "halve per epoch" decay of streaming count sketches).
  *
  * Scale: one row-local projection (age via `div`, weight via a long
  * shift — both codegen'd), one 1-row max-timestamp broadcast (J4 stat
  * pattern, plan-audited), one map-side-combined group aggregate.
  * `maxAgeBuckets` caps the shift (2^63 overflows a long; anything
  * older than the cap contributes the same floor weight) — at the
  * default Scale=10⁹ and cap 40 the floor is 10⁹/2⁴⁰ → 0, i.e. ancient
  * events decay to nothing without ever leaving integer range.
  */
object Decay {

  val Scale = 1000000000L

  /** Per-event half-life weights. Input needs (ts, weightable key
    * columns); output adds (us, age_b, wt) to `keep` columns. */
  def halfLifeWeights(events: DataFrame, keep: Seq[String],
                      bucketUs: Long = 86400000000L,
                      maxAgeBuckets: Int = 40): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive: $bucketUs")
    require(maxAgeBuckets >= 0 && maxAgeBuckets <= 62,
      s"maxAgeBuckets must be in [0, 62]: $maxAgeBuckets")
    val ev = events.select(col("ts") +: keep.map(col): _*)
      .withColumn("us", unix_micros(col("ts")))
    val mx = ev.agg(max("us").as("ref_us"))
    ev.crossJoin(broadcast(mx))
      .withColumn("age_b",
        least(expr(s"(ref_us - us) div ${bucketUs}L"),
          lit(maxAgeBuckets.toLong)))
      .withColumn("wt",
        expr(s"${Scale}L div shiftleft(1L, cast(age_b as int))"))
      .drop("ts", "ref_us")
  }
}
