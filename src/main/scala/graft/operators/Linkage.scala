package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fellegi–Sunter-style record-linkage scoring (public method: Fellegi
  * & Sunter, "A Theory for Record Linkage", JASA 1969; no reference
  * counterpart — net-new entity-resolution surface next to the fuzzy
  * join and [[Curation.goldenRecords]] survivorship): candidate pairs
  * from an equi-join on cheap blocking keys, then an ADDITIVE integer
  * evidence score over the comparison fields —
  *
  *   score = Σ_f  (+agree_f  if l.f = r.f,
  *                 −disagree_f if both present and different,
  *                 0 if either side is missing)          (all longs)
  *
  * classified by two thresholds into link / possible / nonlink. The
  * integer weights are the log-likelihood-ratio weights of the original
  * method pre-scaled to integers by the caller — keeping the engine
  * float-free and the q263 oracle exact.
  *
  * Scale: candidates come only from the blocking equi-join (never a
  * cross join); with a high-cardinality block key (e.g. nation ×
  * phone-last-4) block sizes are O(1) and the pair count stays O(n).
  * Scoring is row-local over the joined row — one shuffle on the block
  * key end to end. Recall is the blocking's business: a perturbed
  * BLOCKING field drops the pair before scoring (the standard FS
  * trade; keep blocking keys to stable fields).
  */
object Linkage {

  /** @param fields (column, agreeWeight, disagreeWeight) per compared
    *   field — weights are positive longs, the disagree weight is
    *   SUBTRACTED.
    * @return (id_a, id_b, score, verdict) — verdict ∈
    *   {link, possible, nonlink} by score ≥ tUpper / ≤ tLower. */
  def scorePairs(left: DataFrame, right: DataFrame, blockCols: Seq[String],
                 idCol: String, fields: Seq[(String, Long, Long)],
                 tLower: Long, tUpper: Long): DataFrame = {
    require(blockCols.nonEmpty, "need at least one blocking column")
    require(fields.nonEmpty, "need at least one comparison field")
    require(tLower <= tUpper, s"tLower $tLower > tUpper $tUpper")
    require(fields.forall { case (_, a, d) => a >= 0 && d >= 0 },
      "weights must be non-negative (disagreement is subtracted)")
    val l = left.select((blockCols.map(col) :+ col(idCol).as("id_a")) ++
      fields.map { case (f, _, _) => col(f).as(s"_la_$f") }: _*)
    val r = right.select((blockCols.map(col) :+ col(idCol).as("id_b")) ++
      fields.map { case (f, _, _) => col(f).as(s"_rb_$f") }: _*)
    val scored = fields.map { case (f, wa, wd) =>
      when(col(s"_la_$f").isNull || col(s"_rb_$f").isNull, 0L)
        .when(col(s"_la_$f") === col(s"_rb_$f"), wa)
        .otherwise(-wd)
    }.reduce(_ + _)
    l.join(r, blockCols)
      .withColumn("score", scored)
      .withColumn("verdict",
        when(col("score") >= tUpper, "link")
          .when(col("score") <= tLower, "nonlink")
          .otherwise("possible"))
      .select(col("id_a"), col("id_b"), col("score"), col("verdict"))
  }
}
