package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming materialization of a CDC upsert/delete log — the
  * continuous twin of [[graft.operators.ChangeCapture.replay]] (q115):
  * the batch operator reconstructs last-writer-wins state at a point in
  * time; this one maintains it incrementally as the log streams in.
  *
  * State design: one [[ChangeStreams.KeyState]] per key — the winning
  * (ts, seq, op, value) seen so far. That is exactly the materialized
  * table's own content, so state size is bounded by LIVE KEY
  * cardinality, never by stream length — the correct bound for a
  * "maintain this table" operator (contrast the dedup/join streams,
  * which bound state by TIME because their queries are windowed; a
  * table materialization's horizon is the table itself, so no watermark
  * TTL is appropriate — evicting a key would silently resurrect any
  * older late entry). Late and out-of-order entries are absorbed
  * exactly: the winner is max by (ts, seq), so a stale arrival after a
  * newer one changes nothing, across any micro-batch split.
  *
  * Emission: one row per key TOUCHED in each micro-batch, carrying the
  * current winner (including op = "D", so a downstream sink can apply
  * deletes). Emissions per key are monotone in (ts, seq); the final
  * state is the max-(ts, seq) emission — the property
  * ChangeStreamsSpec uses to prove batch ≡ streaming equivalence and
  * cross-batch monotonicity. */
object ChangeStreams {

  final case class LogEntry(k: Long, ts: java.sql.Timestamp, seq: Long,
                            op: String, v: String)
  final case class KeyState(tsMs: Long, seq: Long, op: String, v: String)
  final case class Latest(k: Long, ts_ms: Long, seq: Long, op: String,
                          v: String)

  /** Maintain last-writer-wins state per key over a stream of log
    * entries. Use OutputMode.Update. */
  def lwwStream(entries: Dataset[LogEntry]): Dataset[Latest] = {
    import entries.sparkSession.implicits._
    entries.groupByKey(_.k)
      .mapGroupsWithState[KeyState, Latest](GroupStateTimeout.NoTimeout) {
        (k, it, state) =>
          val best = (state.getOption.iterator ++
            it.map(e => KeyState(e.ts.getTime, e.seq, e.op, e.v)))
            .maxBy(s => (s.tsMs, s.seq))
          state.update(best)
          Latest(k, best.tsMs, best.seq, best.op, best.v)
      }
  }
}
