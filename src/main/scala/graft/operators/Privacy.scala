package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** t-closeness audit — the third leg of the privacy suite (q145
  * k-anonymity counts classes too small to hide in; q278 l-diversity
  * counts classes with too few sensitive values; THIS measures whether
  * a class's sensitive DISTRIBUTION leaks, as the Earth Mover's
  * Distance between the class's and the global banded distribution).
  *
  * For an ORDERED sensitive attribute, EMD is the mean absolute gap
  * between cumulative distributions — carried here CROSS-MULTIPLIED
  * (the q286 KS trick applied to EMD):
  *
  *   emd_num = Σ over bands |ccum·N − gcum·n_c|,
  *   emd_den = n_c·N·(#bands − 1),   t = emd_num / emd_den ∈ [0, 1]
  *
  * — all-integer, no float CDFs, so the per-class t values hash-match
  * an independent SQL derivation exactly. Products go through
  * DECIMAL(38,0) (cum·N overflows BIGINT at corpus scale — the q185
  * rule) and exit as digit strings.
  *
  * Scale shape: the caller BANDS the sensitive attribute (bounded
  * band count — the contract that keeps the class×band grid tiny);
  * the global cumulative comes from a triangle self-join of the
  * BAND-sized frame (≤ bands² rows — never a global window, which the
  * plan audit bans); class cumulatives are class-partitioned windows
  * over the grid. One bounded class×band cross join (whitelisted per
  * query), one broadcast of the band frame.
  */
object Privacy {

  /** Per equivalence class (the `classCols` tuple): `n_c`, `emd_num`,
    * `emd_den` as digit strings. `bandCol` must be an integral banded
    * sensitive value with a BOUNDED domain; rows with a NULL band are
    * excluded (the ksStat NULL rule). */
  def tClosenessEmd(df: DataFrame, classCols: Seq[String],
                    bandCol: String): DataFrame = {
    require(classCols.nonEmpty, "tClosenessEmd: at least one class column")
    val cCols: Seq[Column] = classCols.map(col)
    val c = df.filter(col(bandCol).isNotNull)
      .select(cCols :+ col(bandCol).cast("long").as("_band"): _*)
    // one bounded driver scalar (the q236 fill-size pattern)
    val nTot = c.count()
    val gb = c.groupBy("_band").agg(count(lit(1)).as("_gcnt"))
    // global cumulative WITHOUT a global window: triangle self-join of
    // the band-sized frame
    val gcum = gb.select(col("_band"), col("_gcnt")).as("b1")
      .join(gb.select(col("_band").as("_b2"), col("_gcnt").as("_g2")).as("b2"),
        col("_b2") <= col("_band"))
      .groupBy("_band")
      .agg(sum(col("_g2")).as("_gcum"))
    val cls = c.select(cCols: _*).distinct()
    val cb = c.groupBy(cCols :+ col("_band"): _*).agg(count(lit(1)).as("_cnt"))
    val grid = cls
      .crossJoin(broadcast(gb.select("_band")))
      .join(cb, classCols :+ "_band", "left")
      .na.fill(0L, Seq("_cnt"))
    val wRun = Window.partitionBy(cCols: _*).orderBy("_band")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCls = Window.partitionBy(cCols: _*)
    def dec(x: Column) = x.cast("decimal(38,0)")
    grid
      .withColumn("_ccum", sum(col("_cnt")).over(wRun))
      .withColumn("_nc", sum(col("_cnt")).over(wCls))
      .join(broadcast(gcum), "_band")
      .groupBy(cCols: _*)
      .agg(max(col("_nc")).as("n_c"),
        sum(abs(dec(col("_ccum")) * nTot - dec(col("_gcum")) * col("_nc")))
          .cast("string").as("emd_num"),
        (dec(max(col("_nc"))) * nTot * (count(lit(1)) - 1))
          .cast("string").as("emd_den"))
  }
}
