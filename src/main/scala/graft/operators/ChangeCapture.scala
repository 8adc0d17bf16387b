package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing (change-data-capture): given two keyed
  * snapshots of the same table, emit one row per changed key labelled
  * `I` (inserted: key only in the new snapshot), `D` (deleted: key only
  * in the old one) or `U` (updated: key in both, at least one compared
  * column differs under null-safe equality). Unchanged keys are dropped
  * — at 100 TB the diff of two daily snapshots is orders of magnitude
  * smaller than either input, so the operator's output (not its input)
  * is what downstream incremental jobs consume.
  *
  * Plan shape: ONE full-outer sort-merge join on the key columns — the
  * minimal possible data movement (both sides shuffle once on the key;
  * with both snapshots bucketed by key on disk even that shuffle
  * disappears). Column comparison is a null-safe `<=>` conjunction
  * evaluated inside the join's projection — no second pass, no
  * row-level hashing that would have to be mirrored cross-engine.
  * (A production variant can pre-hash compared columns into a digest
  * column at write time to diff wide tables cheaply; the comparison
  * below is the digest-free exact form the oracle can mirror.)
  */
object ChangeCapture {

  /** Diff `newDf` against `oldDf` on `keyCols`, comparing `cmpCols`.
    * Output: keyCols ++ (change: I|U|D). Both inputs must be unique per
    * key (snapshot semantics). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keyCols: Seq[String], cmpCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff: at least one key column")
    val o = oldDf.select((keyCols ++ cmpCols).map(col): _*).alias("o")
    val n = newDf.select((keyCols ++ cmpCols).map(col): _*).alias("n")
    val joinCond = keyCols.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _)
    val allSame = cmpCols.map(c => col(s"o.$c") <=> col(s"n.$c")).reduce(_ && _)
    val oKey = col(s"o.${keyCols.head}")
    val nKey = col(s"n.${keyCols.head}")
    val change = when(oKey.isNull, lit("I"))
      .when(nKey.isNull, lit("D"))
      .when(!allSame, lit("U"))
    val keyOut = keyCols.map(k => coalesce(col(s"n.$k"), col(s"o.$k")).as(k))
    o.join(n, joinCond, "full_outer")
      .withColumn("change", change)
      .filter(col("change").isNotNull)
      .select(keyOut :+ col("change"): _*)
  }

  /** Point-in-time state reconstruction (time travel) from a CDC log of
    * upserts and deletes: last-writer-wins per key — each key's state
    * is its ordinally-latest log entry, dropped entirely when that
    * entry is a delete (`opCol` = "D"). The caller bounds the log to
    * the wanted instant (`log.filter(ts <= asOf)`) — replay itself is
    * time-agnostic, so the same operator serves snapshot-as-of, latest
    * state, and incremental compaction of an upsert stream.
    *
    * Scale shape: ONE shuffle — a groupBy(key).max_by(payload, ord)
    * whose partial aggregation collapses each map partition to one row
    * per key BEFORE the exchange, so a log with billions of entries for
    * millions of keys moves ~keys, not ~entries (a per-key window sort
    * formulation shuffles and sorts every entry; the oracle uses
    * exactly that formulation as the independent check).
    *
    * `ordCols` must be a deterministic total order per key (e.g.
    * (ts, seq)) — max_by ties are otherwise engine-dependent. */
  def replay(log: DataFrame, keyCols: Seq[String], ordCols: Seq[String],
             opCol: String, valCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && ordCols.nonEmpty)
    val ord = struct(ordCols.map(col): _*)
    val payload = struct((opCol +: valCols).map(col): _*)
    log.groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, ord).as("_last"))
      .filter(col(s"_last.$opCol") =!= lit("D"))
      .select(keyCols.map(col) ++ valCols.map(v => col(s"_last.$v").as(v)): _*)
  }
}
