package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Skyline (Pareto frontier): rows not dominated by any other row,
  * where row b dominates row a iff b is at-least-as-good on EVERY
  * dimension and strictly better on at least one.
  *
  * The declarative form is a NOT EXISTS over a dominance theta-join —
  * quadratic and unshardable (that form is exactly what q104's DuckDB
  * oracle runs). The distributed form exploits that skyline is an
  * algebraic reduction: `skyline(A ∪ B) = skyline(skyline(A) ∪
  * skyline(B))`, so each partition prunes locally (mapPartitions,
  * O(n·|local skyline|)) and only the per-partition survivors — for
  * real data a vanishing fraction — meet in one final merge task
  * (`repartition(1)`, NOT coalesce(1), which would collapse the local
  * stage's parallelism too). The same local-prune-then-merge shape as
  * PrefixSum's chunk scan: the single-task step sees O(#partitions ×
  * |skyline|) rows, never the input. Worst case (anti-correlated dims,
  * everything on the frontier) degrades to shipping the input to one
  * task — the honest bound for exact skylines; a production variant
  * adds a grid pre-partition so merge work shards by cell.
  *
  * Dimensions must be NUMERIC columns (cast timestamps to epoch
  * numbers first); rows with a NULL dimension are excluded. Values are
  * compared as doubles — comparisons only, no arithmetic, so parquet
  * values survive bit-exactly and the result set is deterministic
  * (duplicate dimension vectors never dominate each other; both
  * survive).
  */
object Skyline {

  /** Pareto-optimal rows of `df` over `dims` (column, maximize?). */
  def pareto(df: DataFrame, dims: Seq[(String, Boolean)]): DataFrame = {
    require(dims.nonEmpty, "pareto: at least one dimension")
    val dimCols = dims.map { case (c, mx) =>
      val d = col(c).cast("double"); if (mx) d else -d
    }
    val aug = df.filter(dims.map(d => col(d._1).isNotNull).reduce(_ && _))
      .withColumn("_sk", array(dimCols: _*))
    val enc = Encoders.row(aug.schema)
    val nd = dims.size
    def dominates(a: Array[Double], b: Array[Double]): Boolean = {
      var ge = true; var gt = false; var i = 0
      while (i < nd && ge) {
        if (a(i) < b(i)) ge = false else if (a(i) > b(i)) gt = true
        i += 1
      }
      ge && gt
    }
    def localSkyline(it: Iterator[Row]): Iterator[Row] = {
      val keep = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Row)]
      it.foreach { r =>
        val v = r.getSeq[Double](r.length - 1).toArray
        var i = 0; var dominated = false
        while (i < keep.length && !dominated) {
          if (dominates(keep(i)._1, v)) dominated = true
          else if (dominates(v, keep(i)._1)) keep.remove(i)
          else i += 1
        }
        if (!dominated) keep += ((v, r))
      }
      keep.iterator.map(_._2)
    }
    aug.mapPartitions(localSkyline)(enc)
      .repartition(1).mapPartitions(localSkyline)(enc)
      .drop("_sk")
  }
}
