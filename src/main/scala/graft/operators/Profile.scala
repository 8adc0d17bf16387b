package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass column profiling — the data-quality summary a pipeline
  * runs over every ingested table: per column its null count, distinct
  * count and min/max (rendered as strings so heterogeneous columns fit
  * one tall schema).
  *
  * All metrics for all columns are computed in ONE aggregation over ONE
  * scan — never a per-column pass. The exact-distinct form compiles to
  * Spark's Expand-based multi-distinct plan (input replicated once per
  * distinct aggregate, then a single shuffle); that is the right
  * tradeoff up to a handful of columns, while wide-table profiling at
  * 100 TB flips `exact=false` to approx_count_distinct (HLL — one
  * sketch per column, no Expand, error ~2%) and keeps everything else
  * identical. The tall (col_name, metric…) shape comes from exploding
  * an array of per-column structs built from the single agg row — pure
  * projection, no extra pass.
  *
  * Determinism: counts are integers; min/max are exact values cast to
  * string (BIGINT/VARCHAR casts are engine-independent; profiling
  * float columns through this cast is NOT cross-engine-stable and the
  * q99 oracle only covers int/string columns).
  */
object Profile {

  /** Scale-adaptive scan widening (guide §2.5 "input skew → repartition
    * immediately after the read"): repartition to the session's default
    * parallelism ONLY when the planned scan yields fewer partitions —
    * the local/small-file artifact where one ~20 MB parquet file = 1–2
    * input splits feeding a 16× Expand starves the other cores (q303
    * measured 12.6 s of task time across 19 tasks for 2.8 s of wall at
    * 32 cores before this). On a real cluster the scan has ≥ cores
    * splits and this is a NO-OP — no exchange is added; the round-robin
    * exchange it adds locally carries the narrow projection once, far
    * less than the post-Expand shuffle it parallelizes. */
  private def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Tall profile of `cols`: (col_name, n_nulls, n_distinct, vmin,
    * vmax), one row per column, ordered by col_name. */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile: at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        (if (exact) count_distinct(col(c))
         else approx_count_distinct(col(c))).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("vmin"),
        col(s"${c}__max").as("vmax"))
    }: _*)
    one.select(explode(rows).as("p")).select("p.*").orderBy("col_name")
  }

  /** Level-1 functional-dependency DISCOVERY over `cols`: for every
    * ordered pair det → dep, (n_det_values, n_violating_dets, holds) —
    * a det "violates" when it maps to ≥ 2 distinct dep values, and the
    * FD holds iff no det does. The inference-side complement of the
    * DECLARED-constraint audits (q122/q266) and of q148's single-FD
    * violation worklist: this SEARCHES the lattice's first level, the
    * schema-inference pass a pipeline runs on an unfamiliar corpus.
    *
    * Plan: per determinant ONE multi-distinct aggregation
    * (groupBy(det) + count_distinct per dep — the q99 Expand shape,
    * map-side combined) followed by a det-count rollup; k scans total,
    * never DISTINCT-inside-agg over raw rows, never a self-join. NULL
    * dep values count as a DISTINCT dependent value (det → {NULL, 'x'}
    * IS a violation — count_distinct alone would silently ignore the
    * null and disagree with the oracle's DISTINCT-combo formulation,
    * where the (det, NULL) combo survives); a NULL det forms a group
    * that can violate but is excluded from n_det_values, both matching
    * SQL's GROUP BY-keeps-null / count-DISTINCT-skips-null split. */
  def fdDiscovery(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "fdDiscovery: at least two columns")
    // NOT widened ([[widen]]): measured at sf0.1/32 cores, widening the
    // k determinant subtrees ballooned total task time 7.4 → 41 s (the
    // per-partition partial count_distinct dedup loses almost all its
    // effectiveness when 150k rows spread over 32 partitions) and the
    // wall got WORSE (1.63 → 2.05 s) — the opposite trade of
    // keyDiscovery's single 16-way Expand, which has no groupBy to
    // pre-reduce and did win from widening (r12 optimization round).
    // Also NOT checkpoint-shared (r13): materializing the k-column
    // projection once for the k determinant subtrees measured FLAT
    // (1.64 → 1.60 s, inside the noise control) — the pruned parquet
    // re-scans are already cheap. Also NOT fused into a single-pass
    // masked-struct Expand over determinants (r13 session 2): one scan
    // and 6 stages instead of k scans and ~19, but the k×(k+1)-way row
    // blow-up through one exchange measured Σtask 7.4 → 17.1 s and
    // wall 1.6 → 4.9 s — hashing the (index, k-field struct) group key
    // per expanded row costs more than the k thin subtrees it saves
    // (oracle-verified before being REVERTED). Three shapes measured,
    // three declines: this operator sits in a genuine local optimum.
    cols.map { det =>
      val deps = cols.filterNot(_ == det)
      val cd = deps.map(dep =>
        (count_distinct(col(dep)) +
          max(when(col(dep).isNull, 1L).otherwise(0L))).as(s"${dep}__cd"))
      val perDet = df.groupBy(col(det)).agg(cd.head, cd.tail: _*)
      // count(det) skips a NULL det group — count(DISTINCT det)
      // semantics, matching the oracle; the violation sum INCLUDES a
      // null-det group (SQL GROUP BY keeps it), also matching
      val rollup = deps.flatMap { dep =>
        Seq(count(col(det)).as(s"${dep}__n"),
          sum(when(col(s"${dep}__cd") > 1, 1L).otherwise(0L))
            .as(s"${dep}__viol"))
      }
      val one = perDet.agg(rollup.head, rollup.tail: _*)
      val rows = array(deps.map { dep =>
        struct(lit(det).as("det"), lit(dep).as("dep"),
          col(s"${dep}__n").as("n_det_values"),
          col(s"${dep}__viol").as("n_violating_dets"))
      }: _*)
      one.select(explode(rows).as("p")).select("p.*")
    }.reduce(_.unionByName(_))
      .withColumn("holds",
        when(col("n_violating_dets") === 0, 1L).otherwise(0L))
      .orderBy("det", "dep")
  }

  /** Candidate-KEY discovery (uniqueness lattice, levels 1–2) — the
    * third leg of the schema-inference suite: [[fdDiscovery]] searches
    * determinacy, q122/q266 validate DECLARED constraints, this
    * searches UNIQUENESS. Level 1: every column's exact distinct count
    * vs the row count (a NULL anywhere already disqualifies a key —
    * count_distinct skips NULLs, so n_distinct < n_rows follows
    * automatically). Level 2: every column PAIR's distinct struct
    * count (structs with NULL fields are non-null values and count —
    * both engines agree). `is_minimal` marks pair keys neither of
    * whose members is already a key.
    *
    * Plan: ONE multi-distinct aggregate over singles + pairs (the q99
    * Expand shape — k + C(k,2) distinct ops share a single scan), one
    * driver-free explode to rows. The oracle re-derives every combo as
    * an independent scalar subquery. */
  def keyDiscovery(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "keyDiscovery: at least two columns")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = Seq(count(lit(1)).as("__n")) ++
      cols.map(c => count_distinct(col(c)).as(s"${c}__d")) ++
      pairs.map { case (a, b) =>
        count_distinct(struct(col(a), col(b))).as(s"${a}__${b}__d")
      }
    // widen BEFORE the (k + C(k,2))-way Expand so its per-row blow-up
    // runs at full parallelism (see [[widen]]); single consumer, so no
    // checkpoint needed
    val one = widen(df.select(cols.map(col): _*)).agg(aggs.head, aggs.tail: _*)
    def keyFlag(d: org.apache.spark.sql.Column) =
      when(d === col("__n"), 1L).otherwise(0L)
    val rows = array(
      (cols.map { c =>
        struct(lit(c).as("key_cols"), lit(1L).as("level"),
          col(s"${c}__d").as("n_distinct"), col("__n").as("n_rows"),
          keyFlag(col(s"${c}__d")).as("is_key"),
          keyFlag(col(s"${c}__d")).as("is_minimal"))
      } ++ pairs.map { case (a, b) =>
        val k = keyFlag(col(s"${a}__${b}__d"))
        struct(lit(s"$a+$b").as("key_cols"), lit(2L).as("level"),
          col(s"${a}__${b}__d").as("n_distinct"), col("__n").as("n_rows"),
          k.as("is_key"),
          (k * when(keyFlag(col(s"${a}__d")) + keyFlag(col(s"${b}__d")) === 0L,
            1L).otherwise(0L)).as("is_minimal"))
      }): _*)
    one.select(explode(rows).as("p")).select("p.*")
      .orderBy("level", "key_cols")
  }
}
