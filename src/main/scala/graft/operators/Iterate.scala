package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage AND statistics hygiene for iterative DataFrame algorithms.
  *
  * `localCheckpoint` cuts the RDD lineage but PRESERVES the plan's
  * estimated `sizeInBytes` as the checkpointed relation's stats — and a
  * join's estimate is the PRODUCT of its children's. An iterative
  * SELF-join therefore squares the carried estimate every round: the
  * BigInt's bit-length doubles per round, and by round ~18 the stats
  * computation inside the next checkpoint is multiplying million-bit
  * integers (Karatsuba/Toom-Cook frames on the driver, observed as a
  * silent 18 s driver stall with all Spark jobs at milliseconds —
  * q112's connected components was 35 s/query before this fix, 2 s
  * after). Round-linear state (BFS's visited set) only ADDS bits per
  * round, which is why the non-self-join loops never showed it.
  *
  * [[materialize]] is the round boundary that prevents both failure
  * modes: localCheckpoint (cut lineage, cache partitions), then rebuild
  * the frame from the checkpointed RDD so the carried stats reset to
  * the session default. The rebuilt frame pays one row-codec pass per
  * consumer over the cached blocks — linear, partition-parallel, and
  * noise next to the joins it sits between; AQE re-plans joins from
  * REAL runtime sizes, so losing the (exploded) estimate costs nothing.
  */
object Iterate {

  /** Checkpoint one iteration's state and reset its carried statistics.
    * Use as the per-round boundary of every iterative join loop; for a
    * SELF-joining loop it is mandatory (see scaladoc). */
  def materialize(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }

}
