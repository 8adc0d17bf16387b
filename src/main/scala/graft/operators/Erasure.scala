package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cascade-delete planning (right-to-be-forgotten / retention
  * enforcement): given a tombstone set of root entity keys, size the
  * purge across the FK chain BEFORE rewriting anything — per-table
  * purge/keep manifests are what an erasure job audits, schedules and
  * later proves completion against. The reference materializes
  * per-query result trees and deletes them wholesale
  * (`optimade_database/Optimade_Server/server.py:137-198` writes one
  * run dir per query id); this is the same bookkeeping done relationally
  * at table scale.
  *
  * Scale design: the tombstone set is entity-scale (users who invoked
  * erasure), orders of magnitude smaller than the fact tables — every
  * count is ONE broadcast join over one scan of each table (flag +
  * conditional count in the same aggregation; never two passes, never a
  * shuffle of the fact table). Derived tombstones (child keys of purged
  * parents, e.g. orderkeys of deleted customers) stay
  * tombstone-proportional, so the cascade broadcasts at every level;
  * for a tombstone set too large to broadcast, drop the `broadcast`
  * hint and the same plan runs as a co-partitioned semi join.
  *
  * All counts BIGINT; no float discipline needed.
  */
object Erasure {

  /** (table_name, purge_rows, keep_rows) for one table: rows whose
    * `keyCol` is / is not in `tombstones` (a 1-column frame named
    * "key", deduped here). One broadcast left join + one aggregation. */
  def purgeCounts(name: String, df: DataFrame, keyCol: String,
                  tombstones: DataFrame): DataFrame = {
    val t = tombstones.select(col("key")).distinct()
      .withColumn("_hit", lit(1))
    df.select(col(keyCol).as("key"))
      .join(broadcast(t), Seq("key"), "left")
      .agg(sum(when(col("_hit").isNotNull, 1L).otherwise(0L)).as("purge_rows"),
        sum(when(col("_hit").isNull, 1L).otherwise(0L)).as("keep_rows"))
      .select(lit(name).as("table_name"),
        coalesce(col("purge_rows"), lit(0L)).as("purge_rows"),
        coalesce(col("keep_rows"), lit(0L)).as("keep_rows"))
  }

  /** The next cascade level's tombstones: DISTINCT `childKey` values of
    * child rows referencing a purged parent (parent `tombstones` is a
    * 1-column "key" frame, broadcast). Output is again a 1-column "key"
    * frame, tombstone-proportional by the FK fan-out. */
  def derivedTombstones(child: DataFrame, parentKeyCol: String,
                        childKeyCol: String, tombstones: DataFrame): DataFrame =
    child.join(broadcast(tombstones.select(col("key")).distinct()),
        child(parentKeyCol) === col("key"), "left_semi")
      .select(col(childKeyCol).as("key"))
      .distinct()
}
