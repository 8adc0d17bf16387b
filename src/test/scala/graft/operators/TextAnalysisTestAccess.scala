package graft.operators

import org.apache.spark.sql.Column

/** Test bridge: exposes the private[operators] HOF reference
  * implementation to VectorExprsSpec. */
object TextAnalysisTestAccess {
  def stopwordHitsHof(text: Column, set: Seq[String]): Column =
    TextAnalysis.stopwordHitsHof(text, set)
}
