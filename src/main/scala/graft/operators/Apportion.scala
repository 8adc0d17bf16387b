package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Largest-remainder (Hamilton) apportionment: split an integer budget
  * of `seats` per group across its members proportionally to an
  * integer weight, with the leftover seats after the floor allocation
  * going to the largest remainders — the exact-integer answer to
  * "give each segment its fair share of a fixed quota" (the same
  * problem class as the reference's fair provider-quota allocation,
  * optimade_database/Optimade_Server/utils.py:253-384, which
  * QuotaPlanner ports; this is the classic apportionment alternative).
  *
  * All-integer: base = ⌊seats·w / W⌋ via integer div, remainder via
  * `%`, ties on equal remainders broken by the member id — fully
  * deterministic and restatable in any SQL engine. Σ alloc = seats
  * per group EXACTLY (the defining property; spec-asserted).
  *
  * Plan: everything is windows over ONE group-keyed exchange (total,
  * floor-sum, remainder rank) — no global state, no iteration, no
  * driver round-trip; groups apportion independently and in parallel.
  */
object Apportion {

  /** Per (grpCol, idCol) member: `w` (the weight), `base` (floor
    * share) and `alloc` (final seats). `wCol` must be POSITIVE — a
    * group whose weights sum to zero fails fast with a division error
    * rather than allocating arbitrarily. The seats·weight product is
    * carried as DECIMAL(38,0), so huge weights (e.g. cents revenue at
    * large scale factors) cannot hit the ANSI long-multiply overflow;
    * `div`/`%` on decimals return the same integral values as the long
    * forms. */
  def largestRemainder(df: DataFrame, grpCol: String, idCol: String,
                       wCol: String, seats: Int): DataFrame = {
    require(seats >= 1 && seats <= 1000000, "seats: 1..1000000")
    val byGrp = Window.partitionBy(grpCol)
    val byRem = Window.partitionBy(grpCol)
      .orderBy(col("_rem").desc, col(idCol))
    df.select(col(grpCol), col(idCol), col(wCol).cast("long").as("w"))
      .withColumn("_tot", sum(col("w").cast("decimal(28,0)")).over(byGrp))
      .withColumn("_num", lit(seats).cast("decimal(8,0)") *
        col("w").cast("decimal(28,0)"))
      .withColumn("base", expr("_num div _tot"))
      .withColumn("_rem", (col("_num") % col("_tot")).cast("decimal(38,0)"))
      .withColumn("_rn", row_number().over(byRem))
      .withColumn("_fsum", sum(col("base")).over(byGrp))
      .withColumn("alloc",
        col("base") + when(col("_rn") <= lit(seats.toLong) - col("_fsum"), 1L)
          .otherwise(0L))
      .select(col(grpCol), col(idCol), col("w"), col("base"), col("alloc"))
  }
}
