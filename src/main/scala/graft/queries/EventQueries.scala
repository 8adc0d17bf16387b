package graft.queries

import org.apache.spark.sql.functions._

import graft.streaming.EventStreams
import graft.tables.Tables

/** Batch twins of the streaming computations, oracle-checked. The same
  * windowedAgg code runs unchanged as a streaming query (EventStreamsSpec
  * proves batch ≡ streaming on identical input).
  */
object EventQueries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef.sql("q44_events_window",
      // DuckDB time_bucket origin (2000-01-01) is 5-minute aligned with
      // Spark's epoch-aligned window, so bucket starts agree
      """SELECT epoch_ms(time_bucket(INTERVAL '5 minutes', ts)) AS window_start_ms,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      EventStreams.windowedAgg(Tables.events(s, d))
        .orderBy("window_start_ms", "event_type")
    },

    QueryDef.sql("q45_events_sessions",
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |numbered AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM flagged)
        |SELECT user_id, session_idx,
        |  epoch_ms(min(ts)) AS session_start_ms,
        |  epoch_ms(max(ts)) AS session_end_ms,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM numbered GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin) { (s, d) =>
      EventStreams.sessionizeBatch(Tables.events(s, d), gapMinutes = 30)
        .orderBy("user_id", "session_idx")
    },

    // streaming-dedup twin: the stream is doubled (every 5th event
    // re-delivered — at-least-once ingest), deduped on event_id, then
    // aggregated; the oracle re-derives DISTINCT + aggregate in SQL.
    // EventStreamsSpec proves dedupStream (watermark-bounded state)
    // produces the same multiset on the same doubled input.
    QueryDef.sql("q64_events_dedup",
      """WITH doubled AS (
        |  SELECT event_id, event_type, value FROM events
        |  UNION ALL
        |  SELECT event_id, event_type, value FROM events WHERE event_id % 5 = 0),
        |d AS (SELECT DISTINCT event_id, event_type, value FROM doubled)
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val ev = Tables.events(s, d).select("event_id", "ts", "event_type", "value")
      val doubled = ev.unionByName(ev.filter(col("event_id") % 5 === 0))
      EventStreams.dedupBatch(doubled)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy("event_type")
    },

    // As-of join: each click matched to the user's latest view at-or-
    // before it. The engine runs the union-tag + running-window
    // formulation (one shuffle, no join — operators/AsofJoin); the
    // oracle uses DuckDB's native ASOF JOIN, so two entirely different
    // formulations must agree row-for-row. Right side pre-reduced to one
    // row per (user, ts) on both sides (determinism under ts ties).
    QueryDef.sql("q78_asof_join",
      """WITH e AS (
        |  -- truncate TIMESTAMP_NS to Spark's microseconds: the equal-ts
        |  -- pre-reduce and the >= match must see the engine's instants
        |  SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, user_id,
        |    event_type FROM events),
        |r AS (
        |  SELECT user_id, ts, max(event_id) AS rid FROM e
        |  WHERE event_type = 'view' GROUP BY user_id, ts),
        |l AS (SELECT user_id, ts, event_id FROM e WHERE event_type = 'click')
        |SELECT l.user_id, l.event_id AS left_id, epoch_ms(l.ts) AS ts_ms,
        |  r.rid AS right_id
        |FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY left_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val ev = Tables.events(s, d)
      graft.operators.AsofJoin.asofMatch(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "view"),
          "user_id", "ts", "ts", "event_id", "event_id")
        .select(col("user_id"), col("left_id"),
          unix_millis(col("ts")).as("ts_ms"), col("right_id"))
        .orderBy("left_id")
    },

    // Range join: every error event assigned to its containing session
    // interval (sessions partition a user's events with >30 min gaps, so
    // containment is unique). The engine runs the CHUNKED formulation
    // (operators/RangeJoin: equi-join on (user, 1 h time chunk) +
    // in-chunk residual — no per-key quadratic candidate set); the
    // oracle re-derives sessions à la q45 and uses a plain BETWEEN join.
    QueryDef.sql("q79_range_join",
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |numbered AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM flagged),
        |sessions AS (
        |  SELECT user_id, session_idx,
        |    epoch_ms(min(ts)) AS session_start_ms,
        |    epoch_ms(max(ts)) AS session_end_ms
        |  FROM numbered GROUP BY user_id, session_idx)
        |SELECT e.user_id, e.event_id, s.session_idx,
        |  s.session_start_ms, s.session_end_ms
        |FROM events e JOIN sessions s ON e.user_id = s.user_id
        |  AND epoch_ms(e.ts) BETWEEN s.session_start_ms AND s.session_end_ms
        |WHERE e.event_type = 'error'
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val ev = Tables.events(s, d)
      val sessions = EventStreams.sessionizeBatch(ev, gapMinutes = 30)
        .select("user_id", "session_idx", "session_start_ms", "session_end_ms")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"),
          unix_millis(col("ts")).as("ts_ms"))
      graft.operators.RangeJoin.pointInInterval(errors, sessions,
          "user_id", "ts_ms", "session_start_ms", "session_end_ms",
          chunkWidth = 3600000L)
        .select("user_id", "event_id", "session_idx",
          "session_start_ms", "session_end_ms")
        .orderBy("event_id")
    },

    // Windowed heavy-hitters sketch, batch twin of
    // streaming/SketchStreams.heavyHittersStream (same windowedSketch
    // code runs in both modes; SketchStreamsSpec proves batch ≡
    // streaming across micro-batch splits). k = 64 exceeds the
    // event_type cardinality, so every per-window sketch is provably
    // exact and merge-order-independent — the regime this hash oracle
    // pins; eviction-regime bounds are MisraGriesAggSpec's job.
    QueryDef.sql("q83_window_heavy_hitters",
      """SELECT epoch_ms(time_bucket(INTERVAL '5 minutes', ts)) AS window_start_ms,
        |  event_type AS token, count(*) AS est_cnt
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      graft.streaming.SketchStreams.windowedSketch(
          Tables.events(s, d), "ts", "event_type", k = 64, windowDur = "5 minutes")
        .select(unix_millis(col("window_start")).as("window_start_ms"),
          explode(col("sketch")).as(Seq("token", "est_cnt")))
        .orderBy("window_start_ms", "token")
    },

    // SLIDING window (width 10 min, slide 5 min): every event lands in
    // exactly width/slide = 2 windows — Spark's window() emits both
    // assignments in one pass (no self-union, no shuffle doubling
    // beyond the inherent 2× row fan-out). The oracle re-derives the
    // two assignments as a UNION ALL of shifted 5-min buckets. Same
    // code streams with a watermark (q44's pattern, wider frame).
    QueryDef.sql("q84_sliding_window",
      """WITH ex AS (
        |  SELECT epoch_ms(time_bucket(INTERVAL '5 minutes', ts)) AS w,
        |    event_type, value FROM events
        |  UNION ALL
        |  SELECT epoch_ms(time_bucket(INTERVAL '5 minutes', ts)) - 300000 AS w,
        |    event_type, value FROM events)
        |SELECT w AS window_start_ms, event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM ex GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("win"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(unix_millis(col("win.start")).as("window_start_ms"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("window_start_ms", "event_type")
    },

    // PIVOT: event_type × hour-of-day count matrix via the DataFrame
    // pivot API with EXPLICIT values (0..23) — the two-pass
    // collect-distinct-then-pivot variant is a driver round-trip this
    // avoids; with explicit values the pivot is one ordinary partial-
    // agg shuffle producing 24 counter columns. Oracle: FILTERed counts.
    QueryDef.sql("q85_pivot_hours", {
      val cols = (0 until 24)
        .map(h => f"  count(*) FILTER (WHERE hr = $h) AS h$h%02d")
        .mkString(",\n")
      s"""SELECT event_type,
         |$cols
         |FROM (SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS hr
         |      FROM events)
         |GROUP BY event_type ORDER BY event_type""".stripMargin
    }) { (s, d) =>
      val pivoted = Tables.events(s, d)
        .select(col("event_type"), hour(col("ts")).as("hr"))
        .groupBy("event_type")
        .pivot("hr", 0 until 24)
        .agg(count(lit(1)))
      pivoted.select(col("event_type") +:
          (0 until 24).map(h => coalesce(col(s"$h"), lit(0L)).as(f"h$h%02d")): _*)
        .orderBy("event_type")
    },

    // Gap-fill / resample: each user's value series re-sampled onto an
    // hourly grid with last-observation-carried-forward — composed
    // ENTIRELY from existing operators: per-user bounds → sequence()
    // grid explode (bounded by span/step per key, no global range), then
    // the as-of join (one shuffle, no join operator) fetches the
    // latest event at-or-before each grid point; the value lookup is a
    // single equi-join on the pre-reduced event id. The oracle runs
    // DuckDB's native generate_series + ASOF JOIN — a different
    // algorithm that must agree row-for-row, double values passed
    // through untouched.
    QueryDef.sql("q86_gapfill_resample",
      """WITH er AS (
        |  -- truncate TIMESTAMP_NS to Spark's microseconds BEFORE the
        |  -- per-(user, ts) dedup and the ASOF comparison: both must see
        |  -- the same instants as the engine
        |  SELECT user_id, make_timestamp(epoch_us(ts)) AS ts, value,
        |    row_number() OVER (PARTITION BY user_id, make_timestamp(epoch_us(ts))
        |                       ORDER BY event_id DESC) AS rn
        |  FROM events),
        |r AS (SELECT user_id, ts, value FROM er WHERE rn = 1),
        |bounds AS (SELECT user_id,
        |    time_bucket(INTERVAL '1 hour', min(ts)) + INTERVAL '1 hour' AS h0,
        |    time_bucket(INTERVAL '1 hour', max(ts)) AS h1
        |  FROM events GROUP BY user_id),
        |grid AS (SELECT user_id,
        |    unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS hts
        |  FROM bounds WHERE h0 <= h1)
        |SELECT g.user_id, epoch_ms(g.hts) AS hour_ms, r.value AS last_value
        |FROM grid g ASOF JOIN r
        |  ON g.user_id = r.user_id AND g.hts >= r.ts
        |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val evr = ev.select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val hourStep = expr("interval 1 hour")
      val bounds = ev.groupBy("user_id")
        .agg(min("ts").as("t0"), max("ts").as("t1"))
        .select(col("user_id"),
          (date_trunc("hour", col("t0")) + hourStep).as("h0"),
          date_trunc("hour", col("t1")).as("h1"))
        .filter(col("h0") <= col("h1"))
      val grid = bounds
        .select(col("user_id"), explode(sequence(col("h0"), col("h1"), hourStep)).as("hts"))
        .select(col("user_id"), col("hts"), unix_millis(col("hts")).as("hour_ms"))
      val matched = graft.operators.AsofJoin.asofMatch(
        grid, evr, "user_id", "hts", "ts", "hour_ms", "event_id")
      matched
        .join(evr.select(col("event_id").as("right_id"), col("value")), "right_id")
        .select(col("user_id"), col("left_id").as("hour_ms"),
          col("value").as("last_value"))
        .orderBy("user_id", "hour_ms")
    },

    // FUNNEL (sequential pattern with a conversion horizon): per user,
    // earliest 'view', then earliest 'click' strictly after it WITHIN
    // 6 HOURS, then earliest 'purchase' within 6 hours of that — the
    // Funnel operator's chained conditional-min windows (one user_id
    // exchange, three stacked Window nodes; PlanAuditSpec asserts the
    // shape). Output is the funnel depth histogram plus integer-ms
    // conversion bounds (no float discipline needed). The oracle
    // mirrors the chained windows in DuckDB; raw TIMESTAMP_NS is
    // truncated to Spark's microseconds FIRST (make_timestamp ∘
    // epoch_us) so the strict > / horizon ≤ comparisons see identical
    // instants in both engines.
    QueryDef.sql("q88_funnel",
      """WITH p1 AS (
        |  SELECT user_id, make_timestamp(epoch_us(ts)) AS ts, event_type,
        |    min(CASE WHEN event_type = 'view' THEN make_timestamp(epoch_us(ts)) END)
        |      OVER (PARTITION BY user_id) AS t1
        |  FROM events),
        |p2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1
        |      AND ts <= t1 + INTERVAL '6 hours' THEN ts END)
        |    OVER (PARTITION BY user_id) AS t2 FROM p1),
        |p3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2
        |      AND ts <= t2 + INTERVAL '6 hours' THEN ts END)
        |    OVER (PARTITION BY user_id) AS t3 FROM p2),
        |u AS (SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
        |  FROM p3 GROUP BY user_id),
        |d AS (SELECT user_id,
        |    CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |         WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS depth,
        |    CASE WHEN t3 IS NOT NULL THEN epoch_ms(t3) - epoch_ms(t1) END AS conv_ms
        |  FROM u)
        |SELECT depth, count(*) AS n_users,
        |  min(conv_ms) AS min_conv_ms, max(conv_ms) AS max_conv_ms
        |FROM d GROUP BY depth ORDER BY depth""".stripMargin) { (s, d) =>
      graft.operators.Funnel.perKey(
          Tables.events(s, d).select("user_id", "ts", "event_type"),
          "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), horizonHours = 6)
        .select(
          when(col("t3").isNotNull, lit(3)).when(col("t2").isNotNull, lit(2))
            .when(col("t1").isNotNull, lit(1)).otherwise(lit(0)).as("depth"),
          when(col("t3").isNotNull,
            unix_millis(col("t3")) - unix_millis(col("t1"))).as("conv_ms"))
        .groupBy("depth")
        .agg(count(lit(1)).as("n_users"),
          min("conv_ms").as("min_conv_ms"), max("conv_ms").as("max_conv_ms"))
        .orderBy("depth")
    },

    // Global running total — the distributed prefix-sum operator
    // (PrefixSum.scala: per-day-chunk parallel windows + an O(#days)
    // driver scan) vs DuckDB's single-threaded global window. DECIMAL
    // accumulation both sides makes every prefix exact, so 100k doubles
    // hash-match bit-for-bit regardless of partitioning. The window
    // ORDER BY truncates the raw TIMESTAMP_NS to Spark's microseconds:
    // the (ts, event_id) total order must be the SAME order in both
    // engines, and sub-microsecond digits Spark never sees could
    // otherwise swap two same-microsecond rows.
    QueryDef.sql("q89_prefix_sum",
      """SELECT event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2)))
        |    OVER (ORDER BY make_timestamp(epoch_us(ts)), event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS running_value
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      graft.operators.PrefixSum.runningTotal(
          Tables.events(s, d).select("event_id", "ts", "value"),
          orderCol = "ts", tieCol = "event_id", value = col("value"),
          chunk = unix_millis(date_trunc("day", col("ts"))),
          runningName = "running_value")
        .select("event_id", "running_value")
        .orderBy("event_id")
    },

    // Cohort retention: users grouped by first-seen week (cohort), and
    // for each later week the count of cohort members still active —
    // two shuffles on user_id (first-seen agg + activity join, both
    // co-partitioned so AQE can reuse the exchange) and one exact
    // distinct-count shuffle on (cohort, offset). Week buckets align
    // cross-engine: Spark date_trunc('week') is Monday-based and
    // DuckDB's 7-day time_bucket origin (2000-01-03) is a Monday.
    QueryDef.sql("q91_cohort_retention",
      """WITH wk AS (
        |  SELECT user_id,
        |    epoch_ms(time_bucket(INTERVAL '7 days', ts)) AS w
        |  FROM events),
        |c AS (SELECT user_id, min(w) AS cw FROM wk GROUP BY user_id)
        |SELECT c.cw AS cohort_week_ms, (wk.w - c.cw) // 604800000 AS week_offset,
        |  count(DISTINCT wk.user_id) AS n_users
        |FROM wk JOIN c ON wk.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val wk = Tables.events(s, d)
        .select(col("user_id"),
          unix_millis(date_trunc("week", col("ts"))).as("w"))
      val cohort = wk.groupBy("user_id").agg(min("w").as("cw"))
      wk.join(cohort, "user_id")
        .select(col("cw").as("cohort_week_ms"),
          expr("(w - cw) div 604800000").as("week_offset"), col("user_id"))
        .groupBy("cohort_week_ms", "week_offset")
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_week_ms", "week_offset")
    },

    // Interval join (batch twin of the STREAMING stream-stream join,
    // JoinStreams.clickViewJoin): every click matched to the same
    // user's views in the preceding 12 hours. Batch plans it as a
    // user_id equi-join with the time range as a residual;
    // JoinStreamsSpec proves the identical code joins two watermarked
    // STREAMS with bounded state and matches across micro-batches.
    QueryDef.sql("q92_interval_join",
      """WITH e AS (
        |  -- microsecond truncation first: the <= / >= interval bounds
        |  -- must compare the instants Spark sees, not raw nanoseconds
        |  SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, user_id,
        |    event_type FROM events)
        |SELECT c.user_id, c.event_id AS click_id, v.event_id AS view_id,
        |  epoch_ms(c.ts) AS click_ts_ms, epoch_ms(v.ts) AS view_ts_ms
        |FROM e c JOIN e v
        |  ON v.user_id = c.user_id
        | AND c.event_type = 'click' AND v.event_type = 'view'
        | AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL '12 hours'
        |ORDER BY click_id, view_id""".stripMargin) { (s, d) =>
      graft.streaming.JoinStreams
        .clickViewJoin(Tables.events(s, d), lookbackMinutes = 720)
        .orderBy("click_id", "view_id")
    },

    // Z-ORDER layout (operators/ZOrder): events re-clustered on the
    // Morton interleave of (user_id, value), box query = covering-cell
    // PARTITION pruning + exact residual. The oracle runs the same box
    // over the RAW table — a hash match proves the layout changes only
    // scan cost, never results; ZOrderSpec asserts the numFiles
    // pruning and randomized-box equivalence.
    QueryDef.sql("q93_zorder_box",
      """SELECT event_id, user_id, value FROM events
        |WHERE user_id >= 2 AND user_id <= 8
        |  AND value >= 100.0 AND value <= 300.0
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val path = graft.operators.ZOrder.store(
        Tables.events(s, d).select("event_id", "user_id", "value"),
        "user_id", "value", gridBits = 3,
        s"${graft.Aux.dir(d)}/q93_zstore")
      graft.operators.ZOrder.boxQuery(s, path, gridBits = 3,
          "user_id", 2, 8, "value", 100.0, 300.0)
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    },

    // Sweep-line max concurrency: each event opens a 10-minute
    // interval; the per-day peak of simultaneously-open intervals is
    // the classic +1/-1 boundary scan. The running count over ALL
    // boundaries is a GLOBAL running sum — banned as a single-task
    // window — so it runs on PrefixSum's two-level scan (parallel
    // within-day windows + an O(#days) driver offset scan), while the
    // DuckDB oracle states the naive global window. Half-open
    // [t, t+10min) semantics: at equal instants the close sorts before
    // the open (ord = t_us*2 for ends, t_us*2+1 for starts), so a
    // back-to-back pair never counts as overlapping. All-integer
    // (µs arithmetic, ±1 deltas exact in DECIMAL).
    QueryDef.sql("q107_max_concurrency",
      """WITH ev AS (SELECT event_id, epoch_us(ts) AS t_us FROM events),
        |bounds AS (
        |  SELECT event_id, t_us * 2 + 1 AS ord, 1 AS delta FROM ev
        |  UNION ALL
        |  SELECT event_id, (t_us + 600000000) * 2 AS ord, -1 AS delta FROM ev),
        |run AS (
        |  SELECT ord,
        |    CAST(sum(delta) OVER (ORDER BY ord, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS conc
        |  FROM bounds)
        |SELECT ord // 172800000000 AS day_idx,
        |  max(conc) AS max_conc, count(*) AS n_bounds
        |FROM run GROUP BY 1 ORDER BY day_idx""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), unix_micros(col("ts")).as("t_us"))
      val bounds = ev.select(col("event_id"),
          (col("t_us") * 2 + 1).as("ord"), lit(1).as("delta"))
        .unionByName(ev.select(col("event_id"),
          ((col("t_us") + 600000000L) * 2).as("ord"), lit(-1).as("delta")))
      graft.operators.PrefixSum.runningTotal(bounds, "ord", "event_id",
          col("delta"), expr("ord div 172800000000"), "conc")
        .withColumn("day_idx", expr("ord div 172800000000"))
        .groupBy("day_idx")
        .agg(max(col("conc")).cast("long").as("max_conc"),
          count(lit(1)).as("n_bounds"))
        .orderBy("day_idx")
    },

    // CDC log replay / snapshot time travel (ChangeCapture.replay):
    // events re-read as a per-user upsert log (errors are deletes),
    // reconstructed as of a mid-month instant. The engine runs the
    // ONE-shuffle groupBy + max_by(payload, (ts, event_id)) with
    // map-side combine; the oracle states the per-key window-sort
    // formulation (row_number DESC = 1) — two different mechanisms,
    // same last-writer-wins state. ts truncated to µs in the oracle
    // BEFORE the as-of filter (the ns-vs-µs ground rule: a boundary
    // event with sub-µs nanos would otherwise pass the cut in one
    // engine only).
    QueryDef.sql("q115_cdc_replay",
      """WITH e0 AS (
        |  SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, user_id,
        |    event_type FROM events),
        |e AS (SELECT * FROM e0 WHERE ts <= TIMESTAMP '2024-01-16 00:00:00'),
        |ranked AS (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM e)
        |SELECT user_id, event_id AS last_event, event_type AS last_type
        |FROM ranked WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val log = Tables.events(s, d)
        .filter(col("ts") <= expr("timestamp'2024-01-16 00:00:00'"))
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_id").as("last_event"), col("event_type").as("last_type"),
          when(col("event_type") === "error", lit("D")).otherwise(lit("U"))
            .as("op"))
      graft.operators.ChangeCapture.replay(log, Seq("user_id"),
          Seq("ts", "event_id"), "op", Seq("last_event", "last_type"))
        .orderBy("user_id")
    },

    // Semi-structured JSON extraction: the events `props` column is a
    // JSON string; from_json with an explicit DDL schema gives a TYPED
    // struct at the scan (JsonToStructs is codegen-friendly and the
    // parse runs once per row inside the same stage as the aggregation
    // — no UDF, no second pass). Schema-on-read is the 100 TB shape:
    // declaring only the needed field parses only that field. The
    // oracle extracts per-row with DuckDB's JSON path functions — an
    // entirely different parser, so agreement checks the extraction
    // semantics, not the implementation. All-BIGINT stats (sum cast per
    // the HUGEINT rule).
    QueryDef.sql("q120_json_extract",
      """WITH j AS (
        |  SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k,
        |  CAST(count(DISTINCT k) AS BIGINT) AS n_k
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          from_json(col("props"), "k BIGINT", Map.empty[String, String])
            .getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          count_distinct(col("k")).as("n_k"))
        .orderBy("event_type")
    },

    // Stream–static dimension enrichment (streaming/EnrichStreams):
    // the events fact stream joined to the customer→nation dimension
    // chain (broadcast, reduced to (user_id, n_name) before shipping —
    // the join is STATELESS, only the windowed agg carries state), then
    // 5-minute windows per nation. Batch twin of the streaming query
    // EnrichStreamsSpec proves equivalent; DuckDB restates it as plain
    // joins + time_bucket (epoch_ms ∘ time_bucket is floor ∘ floor, so
    // the ns/µs ground rule is satisfied without a truncation CTE).
    QueryDef.sql("q123_stream_enrich",
      """SELECT epoch_ms(time_bucket(INTERVAL '5 minutes', e.ts)) AS window_start_ms,
        |  n_name, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e
        |JOIN customer c ON c.c_custkey = e.user_id
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      graft.streaming.EnrichStreams.enrichedNationAgg(
          Tables.events(s, d), Tables.customer(s, d), Tables.nation(s, d))
        .orderBy("window_start_ms", "n_name")
    },

    // Event-transition matrix (Markov clickstream analysis): per-user
    // event sequences ordered by the (ts, event_id) TOTAL order (the
    // tie-break makes equal-timestamp neighbors deterministic in both
    // engines; ts truncated to µs in the oracle per the ns ground
    // rule), lag(1) per user, count per (prev, next) pair. First event
    // of each user transitions from the '(start)' sentinel — coalesced
    // BEFORE the ORDER BY so engine null-ordering defaults never
    // matter. One user_id window partitioning + one pair shuffle.
    QueryDef.sql("q125_transitions",
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    make_timestamp(epoch_us(ts)) AS ts
        |  FROM events),
        |ordered AS (
        |  SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM e)
        |SELECT coalesce(prev_type, '(start)') AS prev_type,
        |  event_type AS next_type, count(*) AS n
        |FROM ordered GROUP BY 1, 2 ORDER BY prev_type, next_type""".stripMargin) { (s, d) =>
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("event_type"),
          lag(col("event_type"), 1).over(byUser).as("prev_type"))
        .groupBy(coalesce(col("prev_type"), lit("(start)")).as("prev_type"),
          col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("prev_type", "next_type")
    },

    // Time-weighted aggregation (TWAP): each reading holds until the
    // user's next event, weighted by that duration in ms, capped at
    // one hour (the standard gap cap — an idle night must not dominate
    // the average). Exactness discipline: the ratio is NOT emitted
    // (float division flakes per the ground rules) — numerator
    // Σ cents·Δt_ms and denominator Σ Δt_ms ship as exact BIGINTs
    // (bounds: cents ≤ ~10^7, Δt_ms ≤ 3.6·10^6, ~600 events/user ⇒
    // num ≤ ~2·10^16, well inside long). Last event per user has no
    // successor and drops out in both engines. One user_id window
    // partitioning + one groupBy.
    QueryDef.sql("q127_twap",
      """WITH e AS (
        |  SELECT user_id, event_id, make_timestamp(epoch_us(ts)) AS ts,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |stepped AS (
        |  SELECT user_id, cents,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt,
        |    ts
        |  FROM e),
        |weighted AS (
        |  SELECT user_id, cents,
        |    LEAST((epoch_us(nxt) - epoch_us(ts)) // 1000, 3600000) AS dt_ms
        |  FROM stepped WHERE nxt IS NOT NULL)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents * dt_ms) AS BIGINT) AS sum_wv,
        |  CAST(sum(dt_ms) AS BIGINT) AS sum_w
        |FROM weighted GROUP BY 1 ORDER BY user_id""".stripMargin) { (s, d) =>
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        .withColumn("nxt", lead(col("ts"), 1).over(byUser))
        .filter(col("nxt").isNotNull)
        .withColumn("dt_ms",
          least(expr("(unix_micros(nxt) - unix_micros(ts)) div 1000"),
            lit(3600000L)))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(col("cents") * col("dt_ms")).as("sum_wv"),
          sum(col("dt_ms")).as("sum_w"))
        .orderBy("user_id")
    },

    // OHLC bar resampling (operators/Bars): ticks → hourly candlesticks
    // per event_type. Open/close are defined by the TOTAL order
    // (ts, event_id), never arrival order, so any partitioning agrees;
    // prices are exact integer cents. One exchange: both row_number
    // windows and the final agg hash on (series, bucket_ms). Oracle
    // restates the same rank-1 formulation; ts goes through the µs
    // truncation CTE per the ns ground rule, and the bucket is
    // epoch-ms floor (floor ∘ floor).
    QueryDef.sql("q131_ohlc_bars",
      """WITH e AS (
        |  SELECT event_type AS series,
        |    (epoch_us(ts) // 1000 // 3600000) * 3600000 AS bucket_ms,
        |    make_timestamp(epoch_us(ts)) AS ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |w AS (
        |  SELECT series, bucket_ms, cents,
        |    row_number() OVER (PARTITION BY series, bucket_ms
        |      ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY series, bucket_ms
        |      ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM e)
        |SELECT series, bucket_ms,
        |  max(CASE WHEN rn_a = 1 THEN cents END) AS open_cents,
        |  max(cents) AS high_cents, min(cents) AS low_cents,
        |  max(CASE WHEN rn_d = 1 THEN cents END) AS close_cents,
        |  count(*) AS n, CAST(sum(cents) AS BIGINT) AS vol_cents
        |FROM w GROUP BY 1, 2 ORDER BY series, bucket_ms""".stripMargin) { (s, d) =>
      graft.operators.Bars.ohlc(Tables.events(s, d), bucketMinutes = 60)
        .orderBy("series", "bucket_ms")
    },

    // Clickstream path analysis (ordered collect): each user-day's
    // first five event types in (ts, event_id) total order joined into
    // a path string, then path frequencies. The deterministic ordered-
    // array aggregation pattern: collect_list is order-free, so the
    // order lives in sort_array over (ts, event_id, type) structs —
    // engine-independent because the struct order is total. The sorted
    // array is materialized to an ATTRIBUTE before the transform
    // (interpreted-HOF ground rule). Oracle uses DuckDB's native
    // ORDER BY-inside-list aggregate — different machinery, same paths;
    // µs-truncation CTE per the ns ground rule.
    QueryDef.sql("q138_session_paths",
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    make_timestamp(epoch_us(ts)) AS ts
        |  FROM events),
        |p AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    array_to_string(
        |      list_slice(list(event_type ORDER BY ts, event_id), 1, 5),
        |      '>') AS path
        |  FROM e GROUP BY 1, 2)
        |SELECT path, count(*) AS n
        |FROM p GROUP BY 1 HAVING count(*) >= 5 ORDER BY path""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sort_array(collect_list(
          struct(col("ts"), col("event_id"), col("event_type")))).as("seq"))
        .withColumn("seq5", slice(col("seq"), 1, 5))
        .withColumn("path",
          array_join(transform(col("seq5"), x => x.getField("event_type")), ">"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 5)
        .orderBy("path")
    },

    // Rolling discrete median (Robust.rollingMedian): per-user trailing
    // 7-event median of cents — the robust smoother. Bounded ROWS
    // window (≤7 longs of state per row), never a global window; the
    // (ts, event_id) total order makes the frame engine-exact, and the
    // lower-median rank arithmetic is float-free. Oracle = DuckDB
    // windowed list() + list_sort + rank index (µs-truncation CTE per
    // the ns ground rule). user_id % 25 keeps the dump row count sane
    // AND exercises scan pushdown on the filter.
    QueryDef.sql("q141_rolling_median",
      """WITH e AS (
        |  SELECT user_id, event_id, make_timestamp(epoch_us(ts)) AS ts,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE user_id % 25 = 0),
        |w AS (
        |  SELECT user_id, event_id,
        |    list(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS l
        |  FROM e)
        |SELECT user_id, event_id, list_sort(l)[(len(l) + 1) // 2] AS med
        |FROM w ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      graft.operators.Robust.rollingMedian(
          Tables.events(s, d)
            .filter(col("user_id") % 25 === 0)
            .select(col("user_id"), col("event_id"), col("ts"),
              (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents")),
          "user_id", Seq("ts", "event_id"), "cents", lookback = 6)
        .select("user_id", "event_id", "med")
        .orderBy("user_id", "event_id")
    },

    // Winsorized per-user sums (Robust.winsorizedSums): values clamped
    // at the discrete 5th/95th percentile VALUES (ranks ⌈n/20⌉ and
    // ⌈19n/20⌉ of the (cents, event_id) total order) before summing —
    // outlier-resistant totals without dropping rows. Entirely integer
    // arithmetic (discrete bounds, long clamps); one rank+count window
    // pass partitioned by user, group-sized bounds join, one agg. No ts
    // anywhere, so no µs-truncation CTE needed.
    QueryDef.sql("q152_winsorized",
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE user_id % 25 = 0),
        |r AS (
        |  SELECT user_id, cents,
        |    row_number() OVER (PARTITION BY user_id ORDER BY cents, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM e),
        |rr AS (
        |  SELECT *, greatest((n + 19) // 20, 1) AS lo_rank,
        |    (n * 19 + 19) // 20 AS hi_rank
        |  FROM r),
        |b AS (
        |  SELECT user_id,
        |    max(CASE WHEN rn = lo_rank THEN cents END) AS lo,
        |    max(CASE WHEN rn = hi_rank THEN cents END) AS hi
        |  FROM rr GROUP BY 1)
        |SELECT rr.user_id, CAST(count(*) AS BIGINT) AS n,
        |  max(b.lo) AS lo, max(b.hi) AS hi,
        |  CAST(sum(greatest(least(rr.cents, b.hi), b.lo)) AS BIGINT) AS sum_w,
        |  CAST(sum(CASE WHEN rr.cents < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
        |  CAST(sum(CASE WHEN rr.cents > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi
        |FROM rr JOIN b USING (user_id)
        |GROUP BY 1 ORDER BY user_id""".stripMargin) { (s, d) =>
      graft.operators.Robust.winsorizedSums(
          Tables.events(s, d)
            .filter(col("user_id") % 25 === 0)
            .select(col("user_id"), col("event_id"),
              (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents")),
          "user_id", "cents", "event_id", pNum = 1L, pDen = 20L)
        .orderBy("user_id")
    },

    // Rolling 7-day distinct actives (operators/Activity): per observed
    // day, distinct users active in the trailing week plus the same-day
    // distinct count — the DAU/WAU engagement statistic. The engine
    // runs the forward-scatter formulation (each distinct (user, day)
    // pair explodes to its 7 target days — bounded fan-out, two
    // shuffles, NO window and NO day×day join); the oracle is a
    // day-grid range join with windowed-distinct semantics restated
    // directly. Day flooring is floor-of-floor over µs, so no
    // truncation CTE is needed (ground-rule epoch_ms/time_bucket case).
    QueryDef.sql("q154_rolling_active",
      """WITH pairs AS (
        |  SELECT DISTINCT user_id AS k,
        |    CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
        |days AS (SELECT DISTINCT day FROM pairs)
        |SELECT d.day, count(DISTINCT p.k) AS n_active_w,
        |  count(DISTINCT CASE WHEN p.day = d.day THEN p.k END) AS n_today
        |FROM days d JOIN pairs p ON p.day BETWEEN d.day - 6 AND d.day
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      graft.operators.Activity.rollingActive(
          Tables.events(s, d), "user_id", "ts", windowDays = 7)
        .orderBy("day")
    },

    // Horizon-bounded last-touch attribution (AsofJoin.asofMatchBounded):
    // every purchase paired with the user's latest click at most 1 hour
    // before it, or NULL — the marketing-attribution / stale-quote
    // guard the unbounded as-of (q78) cannot express. Engine: the
    // union-tag running-window formulation (one shuffle, no join);
    // oracle: DuckDB's native ASOF LEFT JOIN + horizon post-filter —
    // exact because the as-of match is the LATEST preceding click (no
    // earlier one can be fresher). Ages are differences of ms FLOORS on
    // both sides; µs-truncating CTE per the raw-ts ground rule.
    QueryDef.sql("q156_attribution",
      """WITH e AS (
        |  SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, user_id,
        |    event_type FROM events),
        |r AS (
        |  SELECT user_id, ts, max(event_id) AS rid FROM e
        |  WHERE event_type = 'click' GROUP BY user_id, ts),
        |l AS (SELECT user_id, ts, event_id FROM e WHERE event_type = 'purchase')
        |SELECT l.user_id, l.event_id AS conv_id, epoch_ms(l.ts) AS ts_ms,
        |  CASE WHEN r.rid IS NOT NULL
        |         AND epoch_ms(l.ts) - epoch_ms(r.ts) <= 3600000
        |       THEN r.rid END AS click_id,
        |  CASE WHEN r.rid IS NOT NULL
        |         AND epoch_ms(l.ts) - epoch_ms(r.ts) <= 3600000
        |       THEN epoch_ms(l.ts) - epoch_ms(r.ts) END AS age_ms
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY conv_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      graft.operators.AsofJoin.asofMatchBounded(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "click"),
          "user_id", "ts", "ts", "event_id", "event_id",
          horizonMs = 3600000L)
        .select(col("user_id"), col("left_id").as("conv_id"),
          unix_millis(col("ts")).as("ts_ms"),
          col("right_id").as("click_id"), col("age_ms"))
        .orderBy("conv_id")
    },

    // Sequence matching with a NEGATIVE condition
    // (Funnel.perKeyWithExclusion): first click → first purchase within
    // 24 h, counting 'error' events strictly between them — the
    // MATCH_RECOGNIZE `A C* B` negation plain funnels can't express; a
    // clean conversion is t2 non-null ∧ n_blockers = 0. Engine: three
    // conditional window aggregates over ONE user partitioning (no
    // joins); oracle: per-step aggregation joins + a correlated COUNT
    // subquery — entirely different machinery. µs-truncating CTE per
    // the raw-ts ground rule; stalled funnels report 0 blockers on
    // both sides (NULL upper bound annihilates the condition).
    QueryDef.sql("q166_sequence_exclusion",
      """WITH e AS (
        |  SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, user_id,
        |    event_type FROM events),
        |a AS (SELECT user_id, min(ts) AS t1 FROM e
        |      WHERE event_type = 'click' GROUP BY 1),
        |b AS (
        |  SELECT a.user_id, a.t1, min(e2.ts) AS t2
        |  FROM a LEFT JOIN e e2 ON e2.user_id = a.user_id
        |    AND e2.event_type = 'purchase'
        |    AND e2.ts > a.t1 AND e2.ts <= a.t1 + INTERVAL 24 HOURS
        |  GROUP BY 1, 2)
        |SELECT b.user_id, epoch_ms(b.t1) AS t1_ms, epoch_ms(b.t2) AS t2_ms,
        |  (SELECT count(*) FROM e c WHERE c.user_id = b.user_id
        |     AND c.event_type = 'error'
        |     AND c.ts > b.t1 AND c.ts < b.t2) AS n_blockers
        |FROM b ORDER BY user_id""".stripMargin) { (s, d) =>
      graft.operators.Funnel.perKeyWithExclusion(
          Tables.events(s, d), "user_id", "ts", "event_type",
          stepA = "click", stepB = "purchase", blocker = "error",
          horizonHours = 24)
        .select(col("user_id"), unix_millis(col("t1")).as("t1_ms"),
          unix_millis(col("t2")).as("t2_ms"), col("n_blockers"))
        .orderBy("user_id")
    },

    // Nearest-event join (AsofJoin.nearestMatch): every purchase paired
    // with the temporally CLOSEST view of the same user in EITHER
    // direction (tie → earlier view; no views → NULL) — the
    // sensor/log-alignment op backward-only as-of gets wrong. Engine:
    // union-tag + two running windows (preceding carries latest-before,
    // following carries earliest-after) and one exact-µs comparison —
    // no join operator; oracle: TWO native ASOF LEFT JOINs (>= and <)
    // + the same µs CASE. µs-truncating CTE per the raw-ts ground rule.
    QueryDef.sql("q167_nearest_join",
      """WITH e AS (
        |  SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, user_id,
        |    event_type FROM events),
        |r AS (SELECT user_id, ts, max(event_id) AS rid FROM e
        |      WHERE event_type = 'view' GROUP BY 1, 2),
        |l AS (SELECT user_id, ts, event_id FROM e WHERE event_type = 'purchase'),
        |p AS (
        |  SELECT l.user_id, l.event_id AS left_id, l.ts,
        |    r.rid AS p_rid, r.ts AS p_ts
        |  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts),
        |n AS (
        |  SELECT l.event_id AS left_id2, r.rid AS n_rid, r.ts AS n_ts
        |  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts < r.ts)
        |SELECT p.user_id, p.left_id, epoch_ms(p.ts) AS ts_ms,
        |  CASE WHEN p.p_rid IS NOT NULL AND (n.n_rid IS NULL OR
        |         epoch_us(p.ts) - epoch_us(p.p_ts) <=
        |         epoch_us(n.n_ts) - epoch_us(p.ts))
        |       THEN p.p_rid ELSE n.n_rid END AS right_id,
        |  CASE WHEN p.p_rid IS NOT NULL AND (n.n_rid IS NULL OR
        |         epoch_us(p.ts) - epoch_us(p.p_ts) <=
        |         epoch_us(n.n_ts) - epoch_us(p.ts))
        |       THEN epoch_us(p.ts) - epoch_us(p.p_ts)
        |       WHEN n.n_rid IS NOT NULL
        |       THEN -(epoch_us(n.n_ts) - epoch_us(p.ts)) END AS delta_us
        |FROM p JOIN n ON n.left_id2 = p.left_id
        |ORDER BY left_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      graft.operators.AsofJoin.nearestMatch(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "view"),
          "user_id", "ts", "ts", "event_id", "event_id")
        .select(col("user_id"), col("left_id"),
          unix_millis(col("ts")).as("ts_ms"),
          col("right_id"), col("delta_us"))
        .orderBy("left_id")
    },

    // Batch twin of the STREAMING left-outer interval join
    // (streaming/JoinStreams.clickViewJoinOuter): every click with its
    // same-user views in the trailing 30 min, or NULL view columns —
    // in streaming, exactly the semantics only a watermark makes
    // possible (a click is provably unmatched only once the view-side
    // watermark passes its window). JoinStreamsSpec proves the
    // streamed result — including the null rows — equals this batch
    // twin once the stream drains. µs-truncating CTE per the raw-ts
    // ground rule.
    QueryDef.sql("q168_outer_interval_join",
      """WITH e AS (
        |  SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, user_id,
        |    event_type FROM events),
        |c AS (SELECT event_id AS click_id, user_id, ts AS click_ts FROM e
        |      WHERE event_type = 'click'),
        |v AS (SELECT event_id AS view_id, user_id AS vuid, ts AS view_ts
        |      FROM e WHERE event_type = 'view')
        |SELECT c.user_id, c.click_id, v.view_id,
        |  epoch_ms(c.click_ts) AS click_ts_ms,
        |  epoch_ms(v.view_ts) AS view_ts_ms
        |FROM c LEFT JOIN v ON v.vuid = c.user_id
        |  AND v.view_ts <= c.click_ts
        |  AND v.view_ts >= c.click_ts - INTERVAL 30 MINUTES
        |ORDER BY click_id, view_id""".stripMargin) { (s, d) =>
      graft.streaming.JoinStreams.clickViewJoinOuter(
          Tables.events(s, d), lookbackMinutes = 30)
        .orderBy("click_id", "view_id")
    },

    // Daily activity streaks (operators/Streaks): per user, distinct
    // active days collapse to maximal consecutive runs via the
    // gaps-and-islands day−row_number constant — one user-partitioned
    // window + two same-key groupBys, no self-join, no iteration.
    // Day index is floor-of-floor over the µs timestamps (ground rule:
    // date flooring needs no ns/µs truncation CTE). All-integer.
    QueryDef.sql("q171_daily_streaks",
      """WITH dd AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day
        |  FROM events),
        |i AS (
        |  SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
        |  FROM dd),
        |runs AS (
        |  SELECT user_id, island, count(*) AS len, max(day) AS end_day
        |  FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_days,
        |  count(*) AS n_streaks, CAST(max(len) AS BIGINT) AS max_streak,
        |  max(end_day) AS last_day
        |FROM runs GROUP BY 1 ORDER BY user_id""".stripMargin) { (s, d) =>
      graft.operators.Streaks.dailyStreaks(
          Tables.events(s, d).select(col("user_id"),
            datediff(to_date(col("ts")), to_date(lit("1970-01-01"))).as("day")),
          "user_id", "day")
        .orderBy("user_id")
    },

    // Per-window KMV distinct sketch (operators/KmvAgg via
    // streaming/SketchStreams.windowedKmv): distinct users per 5-min
    // window as the mergeable (k_used, kth_hash) summary — the
    // aggregate-buffer form of q162's plan-level sketch, which is what
    // runs with BOUNDED state inside a streaming window (one ≤k-pair
    // buffer per open window vs one state row per distinct key).
    // Same masked-xorshift chain ⇒ the oracle rebuilds the identical
    // sketch in SQL, hash-matched bit-for-bit. Batch frame of the
    // streaming code (KmvAggSpec proves batch ≡ streaming ≡ Kmv.sketch).
    QueryDef.sql("q176_window_kmv",
      """WITH e AS (
        |  SELECT epoch_ms(time_bucket(INTERVAL '5 minutes', ts)) AS window_start_ms,
        |    user_id
        |  FROM events),
        |keys AS (SELECT DISTINCT window_start_ms, user_id AS k FROM e
        |         WHERE user_id IS NOT NULL),
        |h0 AS (SELECT window_start_ms, k, xor(k & 4294967295, 2654435769) AS x FROM keys),
        |h1 AS (SELECT window_start_ms, k, xor(x, (x << 13) & 4294967295) AS x FROM h0),
        |h2 AS (SELECT window_start_ms, k, xor(x, x >> 17) AS x FROM h1),
        |h3 AS (SELECT window_start_ms, k, xor(xor(x, (x << 5) & 4294967295), 2246822507) AS x FROM h2),
        |h4 AS (SELECT window_start_ms, k, xor(x, (x << 13) & 4294967295) AS x FROM h3),
        |h5 AS (SELECT window_start_ms, k, xor(x, x >> 17) AS x FROM h4),
        |h6 AS (SELECT window_start_ms, k, xor(x, (x << 5) & 4294967295) AS x FROM h5),
        |r AS (
        |  SELECT window_start_ms, x,
        |    row_number() OVER (PARTITION BY window_start_ms ORDER BY x, k) AS rn
        |  FROM h6)
        |SELECT window_start_ms, CAST(count(*) AS BIGINT) AS k_used, max(x) AS kth_hash
        |FROM r WHERE rn <= 64 GROUP BY 1
        |ORDER BY window_start_ms""".stripMargin) { (s, d) =>
      graft.streaming.SketchStreams.windowedKmv(
          Tables.events(s, d), "ts", "user_id", k = 64, windowDur = "5 minutes")
        .orderBy("window_start_ms")
    },

    // Point-in-time SCD2 enrichment (operators/Scd.pitJoin on
    // Scd.intervals): each purchase picks the dimension version (the
    // user's last non-purchase activity type) valid AT its timestamp —
    // not an interval-containment inequality join but the as-of carry
    // (union-tag + one key-partitioned running window), because SCD2
    // intervals partition time per key. The oracle uses the OTHER
    // machinery: rebuild intervals and join on explicit containment
    // f.ts ∈ [valid_from, valid_to). µs-truncating CTE per the raw-ts
    // ground rule.
    QueryDef.sql("q181_pit_enrich",
      """WITH e AS (
        |  SELECT user_id, make_timestamp(epoch_us(ts)) AS ts, event_id,
        |    event_type FROM events),
        |obs AS (SELECT * FROM e WHERE event_type <> 'purchase'),
        |fct AS (SELECT user_id, ts, event_id FROM e WHERE event_type = 'purchase'),
        |flagged AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      IS NOT DISTINCT FROM event_type THEN 0 ELSE 1 END AS chg
        |  FROM obs),
        |numbered AS (
        |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM flagged),
        |runs AS (
        |  SELECT user_id, min(event_type) AS version, min(ts) AS valid_from
        |  FROM numbered GROUP BY user_id, run),
        |iv AS (
        |  SELECT user_id, version, valid_from,
        |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to
        |  FROM runs)
        |SELECT f.user_id, f.event_id AS fact_id, epoch_us(f.ts) AS ts_us,
        |  r.version
        |FROM fct f JOIN iv r ON r.user_id = f.user_id
        |  AND f.ts >= r.valid_from
        |  AND (r.valid_to IS NULL OR f.ts < r.valid_to)
        |ORDER BY f.user_id, fact_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val dims = graft.operators.Scd.intervals(
        ev.filter(col("event_type") =!= "purchase")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type")),
        "user_id", "ts", "event_id", "event_type")
      graft.operators.Scd.pitJoin(
          ev.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("ts"), col("event_id")),
          dims, "user_id", "ts", "event_id", "valid_from", "value")
        .select(col("user_id"), col("fact_id"),
          unix_micros(col("ts")).as("ts_us"), col("version"))
        .orderBy("user_id", "fact_id")
    },

    // Dwell-time magnitude profile: per event type, the distribution
    // of time-to-next-event (per user) in power-of-2 µs bands — ONE
    // user-partitioned lead window, then q187's integer-exact
    // length(bin(x)) banding (no float log2 at band boundaries).
    // Raw-ts ordering → µs-truncating CTE per the ground rule.
    QueryDef.sql("q190_dwell_histogram",
      """WITH e AS (
        |  SELECT user_id, event_type, make_timestamp(epoch_us(ts)) AS ts,
        |    event_id FROM events),
        |nx AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS t_us,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_us
        |  FROM e),
        |d AS (
        |  SELECT event_type, next_us - t_us AS dwell_us
        |  FROM nx WHERE next_us IS NOT NULL)
        |SELECT event_type, CAST(length(bin(dwell_us)) AS BIGINT) AS band,
        |  count(*) AS n, min(dwell_us) AS min_us, max(dwell_us) AS max_us
        |FROM d GROUP BY 1, 2 ORDER BY event_type, band""".stripMargin) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("t_us", unix_micros(col("ts")))
        .withColumn("next_us", lead(col("t_us"), 1).over(w))
        .filter(col("next_us").isNotNull)
        .select(col("event_type"), (col("next_us") - col("t_us")).as("dwell_us"))
        .groupBy(col("event_type"),
          length(bin(col("dwell_us"))).cast("long").as("band"))
        .agg(count(lit(1)).as("n"), min("dwell_us").as("min_us"),
          max("dwell_us").as("max_us"))
        .orderBy("event_type", "band")
    },

    // Cumulative-distinct growth curve: per event type and day, new
    // users (first-seen that day) and the running total of distinct
    // users so far — computed the scalable way: min-day per (type,
    // user) collapses the stream FIRST (one agg), then a per-type
    // running sum over day counts; never an expanding-distinct window
    // over raw events, and the running window is type-partitioned (no
    // global window). All-integer; day = floor-of-floor.
    QueryDef.sql("q196_growth_curve",
      """WITH fs AS (
        |  SELECT event_type, user_id,
        |    min(CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT)) AS day
        |  FROM events GROUP BY 1, 2),
        |nd AS (
        |  SELECT event_type, day, count(*) AS new_users
        |  FROM fs GROUP BY 1, 2)
        |SELECT event_type, day, new_users,
        |  CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM nd ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Tables.events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(min(datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
          .cast("long")).as("day"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("new_users"))
        .withColumn("cum_users", sum(col("new_users")).over(w))
        .orderBy("event_type", "day")
    },

    // Per-window CountMin point estimates (operators/CountMinAgg via
    // streaming/SketchStreams.windowedCountMin): for four watched
    // users, the CMS frequency estimate per 5-min window — the
    // aggregate-buffer form of q109's plan-level sketch, which is what
    // runs with BOUNDED state inside a streaming window (one d·w-long
    // grid per open window vs one state row per distinct key). Merge is
    // cell-wise sum — NO truncation, so any partitioning/micro-batch
    // slicing yields identical cells. Same masked-xorshift chain as
    // q109 ⇒ the oracle rebuilds the per-window grid in SQL and
    // hash-matches estimates exactly. Batch frame of the streaming code
    // (CountMinAggSpec proves batch ≡ streaming ≡ CountMin.sketch).
    QueryDef.sql("q199_window_countmin",
      """WITH seeds(r, s) AS (VALUES (0, 2654435769), (1, 2246822507),
        |                            (2, 3266489917), (3, 668265263)),
        |e AS (
        |  SELECT epoch_ms(time_bucket(INTERVAL '5 minutes', ts)) AS w,
        |    user_id AS k
        |  FROM events WHERE user_id IS NOT NULL),
        |h0 AS (SELECT w, r, xor(k & 4294967295, s) AS x FROM e CROSS JOIN seeds),
        |h1 AS (SELECT w, r, xor(x, (x << 13) & 4294967295) AS x FROM h0),
        |h2 AS (SELECT w, r, xor(x, x >> 17) AS x FROM h1),
        |h3 AS (SELECT w, r, xor(x, (x << 5) & 4294967295) AS x FROM h2),
        |sketch AS (SELECT w, r, x & 255 AS bucket, count(*) AS cnt
        |           FROM h3 GROUP BY 1, 2, 3),
        |n AS (SELECT w, count(*) AS n FROM e GROUP BY 1),
        |probes(p, k) AS (VALUES (0, 1), (1, 2), (2, 3), (3, 5)),
        |p0 AS (SELECT p, r, xor(k & 4294967295, s) AS x FROM probes CROSS JOIN seeds),
        |p1 AS (SELECT p, r, xor(x, (x << 13) & 4294967295) AS x FROM p0),
        |p2 AS (SELECT p, r, xor(x, x >> 17) AS x FROM p1),
        |p3 AS (SELECT p, r, xor(x, (x << 5) & 4294967295) AS x FROM p2),
        |pb AS (SELECT p, r, x & 255 AS bucket FROM p3),
        |est AS (
        |  SELECT n.w, pb.p, min(coalesce(s.cnt, 0)) AS est
        |  FROM n CROSS JOIN pb
        |  LEFT JOIN sketch s ON s.w = n.w AND s.r = pb.r AND s.bucket = pb.bucket
        |  GROUP BY 1, 2)
        |SELECT est.w AS window_start_ms, n.n AS n,
        |  CAST(est.p AS BIGINT) AS p, est.est AS est
        |FROM est JOIN n ON n.w = est.w
        |ORDER BY window_start_ms, p""".stripMargin) { (s, d) =>
      graft.streaming.SketchStreams.windowedCountMin(
          Tables.events(s, d).filter(col("user_id").isNotNull),
          "ts", "user_id", w = 256, probes = Seq(1L, 2L, 3L, 5L),
          windowDur = "5 minutes")
        .select(col("window_start_ms"), col("n"),
          posexplode(col("est")).as(Seq("p", "est")))
        .select(col("window_start_ms"), col("n"), col("p").cast("long").as("p"),
          col("est"))
        .orderBy("window_start_ms", "p")
    },

    // Pairwise KMV set-overlap (Kmv.overlapComponents): audience
    // overlap between every pair of event types' distinct user sets,
    // from sketches alone — each side's (k_used, kth), the union
    // sketch, and the both-sides match count; |A∩B| follows without
    // joining the raw sets. The oracle rebuilds the identical sketches
    // in SQL (q162's hash chain), enumerates pairs by theta join, and
    // re-derives the union survivors + match counts independently.
    QueryDef.sql("q211_kmv_overlap",
      """WITH keys AS (
        |  SELECT DISTINCT event_type AS g, user_id AS k FROM events
        |  WHERE user_id IS NOT NULL),
        |h0 AS (SELECT g, k, xor(k & 4294967295, 2654435769) AS x FROM keys),
        |h1 AS (SELECT g, k, xor(x, (x << 13) & 4294967295) AS x FROM h0),
        |h2 AS (SELECT g, k, xor(x, x >> 17) AS x FROM h1),
        |h3 AS (SELECT g, k, xor(xor(x, (x << 5) & 4294967295), 2246822507) AS x FROM h2),
        |h4 AS (SELECT g, k, xor(x, (x << 13) & 4294967295) AS x FROM h3),
        |h5 AS (SELECT g, k, xor(x, x >> 17) AS x FROM h4),
        |h6 AS (SELECT g, k, xor(x, (x << 5) & 4294967295) AS x FROM h5),
        |kept AS (
        |  SELECT g, x, k FROM (
        |    SELECT g, x, k,
        |      row_number() OVER (PARTITION BY g ORDER BY x, k) AS rn
        |    FROM h6) WHERE rn <= 128),
        |side AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS k_used, max(x) AS kth
        |  FROM kept GROUP BY 1),
        |gs AS (SELECT DISTINCT g FROM kept),
        |pairs AS (SELECT a.g AS ga, b.g AS gb FROM gs a, gs b WHERE a.g < b.g),
        |tagged AS (
        |  SELECT p.ga, p.gb, t.x, t.k,
        |    max(CASE WHEN t.g = p.ga THEN 1 ELSE 0 END) AS in_a,
        |    max(CASE WHEN t.g = p.gb THEN 1 ELSE 0 END) AS in_b
        |  FROM kept t JOIN pairs p ON t.g = p.ga OR t.g = p.gb
        |  GROUP BY 1, 2, 3, 4),
        |surv AS (
        |  SELECT * FROM (
        |    SELECT ga, gb, x, in_a, in_b,
        |      row_number() OVER (PARTITION BY ga, gb ORDER BY x, k) AS rn
        |    FROM tagged) WHERE rn <= 128),
        |uagg AS (
        |  SELECT ga, gb, CAST(count(*) AS BIGINT) AS ku_used,
        |    max(x) AS kth_union,
        |    CAST(sum(in_a * in_b) AS BIGINT) AS match_cnt
        |  FROM surv GROUP BY 1, 2)
        |SELECT ga, gb, sa.k_used AS ka_used, sa.kth AS kth_a,
        |  sb.k_used AS kb_used, sb.kth AS kth_b,
        |  ku_used, kth_union, match_cnt
        |FROM uagg JOIN side sa ON sa.g = ga JOIN side sb ON sb.g = gb
        |ORDER BY ga, gb""".stripMargin) { (s, d) =>
      graft.operators.Kmv.overlapComponents(
        Tables.events(s, d).select(col("event_type"), col("user_id")),
        "event_type", "user_id", k = 128)
        .orderBy("ga", "gb")
    },

    // Lag-1 autocorrelation components of each event type's daily
    // value series: the exact Pearson moments (q184 discipline) over
    // CALENDAR-adjacent day pairs — the pairing is an equi self-join on
    // (type, day = prev_day + 1), q178's adjacency machinery, NOT a lag
    // window (which would pair across gaps). Daily cents are aggregates
    // → pre-cast DECIMAL(19,0) before squaring (q185 rule); wide
    // accumulators exit as digit strings.
    QueryDef.sql("q213_autocorr_lag1",
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day,
        |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.event_type, a.cents AS x, b.cents AS y
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND b.day = a.day + 1)
        |SELECT event_type, count(*) AS n_pairs,
        |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |  CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
        |    AS VARCHAR) AS sxx,
        |  CAST(sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
        |    AS VARCHAR) AS syy,
        |  CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
        |    AS VARCHAR) AS sxy
        |FROM pairs GROUP BY 1 ORDER BY event_type""".stripMargin) { (s, d) =>
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
            .cast("long").as("day"))
        .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .as("cents"))
      daily.as("a")
        .join(daily.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("b.day") === col("a.day") + 1L)
        .select(col("a.event_type").as("event_type"),
          col("a.cents").as("x"), col("b.cents").as("y"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_pairs"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(dec(col("x")) * dec(col("x"))).cast("string").as("sxx"),
          sum(dec(col("y")) * dec(col("y"))).cast("string").as("syy"),
          sum(dec(col("x")) * dec(col("y"))).cast("string").as("sxy"))
        .orderBy("event_type")
    },

    // Per-window HyperLogLog registers (operators/HllAgg via
    // streaming/SketchStreams.windowedHll): distinct users per 5-min
    // window from ONE 256-byte buffer per window — the industry-
    // standard distinct sketch with cross-engine-reproducible
    // registers: Kmv.hash32 chain, idx = low 8 bits, rank = 25 −
    // bit-length of the top 24 bits (q187's length(bin()) device — no
    // float log2). The oracle rebuilds every register in SQL and
    // hash-matches the nonzero ones exactly. Batch frame of the
    // streaming code (HllSpec proves streaming ≡ batch ≡ plan form).
    QueryDef.sql("q214_window_hll",
      """WITH e AS (
        |  SELECT epoch_ms(time_bucket(INTERVAL '5 minutes', ts)) AS w,
        |    user_id AS k
        |  FROM events WHERE user_id IS NOT NULL),
        |h0 AS (SELECT w, k, xor(k & 4294967295, 2654435769) AS x FROM e),
        |h1 AS (SELECT w, k, xor(x, (x << 13) & 4294967295) AS x FROM h0),
        |h2 AS (SELECT w, k, xor(x, x >> 17) AS x FROM h1),
        |h3 AS (SELECT w, k, xor(xor(x, (x << 5) & 4294967295), 2246822507) AS x FROM h2),
        |h4 AS (SELECT w, k, xor(x, (x << 13) & 4294967295) AS x FROM h3),
        |h5 AS (SELECT w, k, xor(x, x >> 17) AS x FROM h4),
        |h6 AS (SELECT w, k, xor(x, (x << 5) & 4294967295) AS x FROM h5),
        |ir AS (
        |  SELECT w, x & 255 AS idx,
        |    CASE WHEN (x >> 8) = 0 THEN 25
        |         ELSE 25 - length(bin(x >> 8)) END AS rank
        |  FROM h6)
        |SELECT w AS window_start_ms, CAST(idx AS BIGINT) AS idx,
        |  CAST(max(rank) AS BIGINT) AS reg
        |FROM ir GROUP BY 1, 2 ORDER BY window_start_ms, idx""".stripMargin) { (s, d) =>
      graft.streaming.SketchStreams.windowedHll(
        Tables.events(s, d).filter(col("user_id").isNotNull),
        "ts", "user_id", p = 8, windowDur = "5 minutes")
        .orderBy("window_start_ms", "idx")
    },

    // Seasonal-naive backtest (MASE components): per event type, the
    // absolute-error sums of the week-ago forecast (x̂_d = x_{d−7})
    // next to the naive-1 scaling denominator (|x_d − x_{d−1}|) — the
    // standard forecast-accuracy scaffold, all-integer. Both pairings
    // are CALENDAR equi self-joins on (type, day = prev + lag) — q178's
    // adjacency machinery, never a lag window (which would pair across
    // gaps). The float MASE ratio is determined by the four integers
    // and left to the consumer.
    QueryDef.sql("q217_seasonal_backtest",
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day,
        |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |e7 AS (
        |  SELECT a.event_type, count(*) AS n7,
        |    CAST(sum(abs(b.cents - a.cents)) AS BIGINT) AS abs_err7
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND b.day = a.day + 7
        |  GROUP BY 1),
        |e1 AS (
        |  SELECT a.event_type, count(*) AS n1,
        |    CAST(sum(abs(b.cents - a.cents)) AS BIGINT) AS abs_err1
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND b.day = a.day + 1
        |  GROUP BY 1)
        |SELECT event_type, n7, abs_err7, n1, abs_err1
        |FROM e7 JOIN e1 USING (event_type)
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
            .cast("long").as("day"))
        .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .as("cents"))
        .persist() // feeds both lag pairings
      def lagErr(lag: Int, nName: String, eName: String) =
        daily.as("a").join(daily.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("b.day") === col("a.day") + lag.toLong)
          .groupBy(col("a.event_type").as("event_type"))
          .agg(count(lit(1)).as(nName),
            sum(abs(col("b.cents") - col("a.cents"))).as(eName))
      lagErr(7, "n7", "abs_err7")
        .join(lagErr(1, "n1", "abs_err1"), "event_type")
        .orderBy("event_type")
    },

    // Per-user inter-arrival gap profile: consecutive-event gaps in µs
    // (lag over (ts, event_id) — equal-µs pairs gap 0 either way, the
    // q78 truncation rule), then n_gaps / min / max / discrete median
    // (Robust.groupMedian, ≡ percentile_disc) / bursts (< 1 hour) —
    // the traffic-shape readout behind session gap and rate-limit
    // choices. Windows and aggs all partition by user_id.
    QueryDef.sql("q265_interarrival_profile",
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_id FROM events),
        |g AS (SELECT user_id, event_id,
        |  tus - lag(tus) OVER (PARTITION BY user_id
        |    ORDER BY tus, event_id) AS gap
        |  FROM e),
        |g2 AS (SELECT user_id, gap, event_id FROM g WHERE gap IS NOT NULL)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |  CAST(min(gap) AS BIGINT) AS min_gap_us,
        |  CAST(max(gap) AS BIGINT) AS max_gap_us,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap) AS BIGINT)
        |    AS med_gap_us,
        |  CAST(sum(CASE WHEN gap < 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS bursts
        |FROM g2 GROUP BY 1 ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("tus"), col("event_id"))
      val gaps = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("tus"),
          col("event_id"))
        .withColumn("gap", col("tus") - lag(col("tus"), 1).over(w))
        .filter(col("gap").isNotNull)
        // two consumers (profile agg + median rank pass) — persist or
        // the lag window chain runs twice (the AQE-reuse rule)
        .persist()
      val prof = gaps.groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"), min("gap").as("min_gap_us"),
          max("gap").as("max_gap_us"),
          sum(when(col("gap") < 3600000000L, 1L).otherwise(0L)).as("bursts"))
      val med = graft.operators.Robust
        .groupMedian(gaps, "user_id", "gap", "event_id")
        .select(col("user_id"), col("med").as("med_gap_us"))
      prof.join(med, "user_id")
        .select(col("user_id"), col("n_gaps"), col("min_gap_us"),
          col("max_gap_us"), col("med_gap_us"), col("bursts"))
        .orderBy("user_id")
    },

    // Multi-touch position-based attribution (operators/Attribution):
    // every purchase distributes exactly 1000 permille across its
    // preceding 7-day touches (first 400+rem / last 400 / middles
    // 200 div (n−2)). The engine's candidates come from the CHUNKED
    // range join (user, time-chunk — RangeJoin.pointInInterval); the
    // oracle uses the plain user equi-join + BETWEEN residual —
    // different machinery, identical pairs. ms floors on both sides
    // (epoch_ms ∘ any-precision ts = floor∘floor, the safe class).
    QueryDef.sql("q270_multitouch_attribution",
      """WITH conv AS (
        |  SELECT event_id AS conv_id, user_id, epoch_ms(ts) AS conv_ms
        |  FROM events WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT event_id AS touch_id, user_id, epoch_ms(ts) AS touch_ms,
        |    event_type
        |  FROM events WHERE event_type IN ('click', 'view', 'signup')),
        |cand AS (
        |  SELECT c.conv_id, t.touch_id, t.event_type, t.touch_ms
        |  FROM conv c JOIN touch t ON c.user_id = t.user_id
        |  WHERE t.touch_ms >= c.conv_ms - 604800000
        |    AND t.touch_ms <= c.conv_ms - 1),
        |ranked AS (
        |  SELECT event_type,
        |    row_number() OVER (PARTITION BY conv_id
        |      ORDER BY touch_ms, touch_id) AS pos,
        |    count(*) OVER (PARTITION BY conv_id) AS n
        |  FROM cand),
        |credited AS (
        |  SELECT event_type,
        |    CASE WHEN n = 1 THEN 1000
        |         WHEN n = 2 THEN 500
        |         WHEN pos = 1 THEN 400 + 200 % (n - 2)
        |         WHEN pos = n THEN 400
        |         ELSE 200 // (n - 2) END AS credit
        |  FROM ranked)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(sum(credit) AS BIGINT) AS credit_total
        |FROM credited GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, d) =>
        graft.operators.Attribution
          .positionCredits(Tables.events(s, d), horizonMs = 604800000L)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_touches"),
            sum("credit").as("credit_total"))
          .orderBy("event_type")
    },

    // Half-life decayed popularity (operators/Decay): weight =
    // 10⁹ div 2^age_days behind the latest event, capped at 40
    // halvings — exact integer decay, no exp(). The oracle rebuilds
    // the identical shift ladder in SQL (`<<` on BIGINT ≡ shiftleft).
    QueryDef.sql("q271_decayed_counts",
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
        |mx AS (SELECT max(us) AS ref_us FROM e),
        |aged AS (
        |  SELECT event_type,
        |    least((ref_us - us) // 86400000000, 40) AS age_b
        |  FROM e CROSS JOIN mx)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(1000000000 // (CAST(1 AS BIGINT) << CAST(age_b AS INTEGER)))
        |    AS BIGINT) AS decayed_scaled,
        |  CAST(max(age_b) AS BIGINT) AS max_age_b
        |FROM aged GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, d) =>
        graft.operators.Decay
          .halfLifeWeights(Tables.events(s, d), keep = Seq("event_type"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum("wt").as("decayed_scaled"),
            max("age_b").as("max_age_b"))
          .orderBy("event_type")
    },

    // Daily-count dispersion (Fano/burstiness audit): per event type the
    // exact integer triple (n_days, Σc, Σc²) determines the index of
    // dispersion Var/Mean — the float is left to the consumer (the
    // q184/q185 rule: no avg over computed doubles). Σc² goes through
    // DECIMAL(38,0) BEFORE the square — at 100-TB daily counts the
    // square overflows BIGINT and ANSI throws — and is emitted as a
    // string (HUGEINT ≡ decimal string canon, the q185/SemDedup
    // pattern). Two map-side-combined aggs, nothing global.
    QueryDef.sql("q276_daily_dispersion",
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(c) AS BIGINT) AS sum_c,
        |  CAST(sum(CAST(c AS HUGEINT) * c) AS VARCHAR) AS sum_c2
        |FROM daily GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, d) =>
        Tables.events(s, d)
          .select(col("event_type"),
            expr("unix_micros(ts) div 86400000000L").as("day"))
          .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_days"), sum("c").as("sum_c"),
            // decimal cast BEFORE the square (q185): (19,0)×(19,0) →
            // DECIMAL(38,0) on both engines; emitted as digit string
            sum(col("c").cast("decimal(19,0)") *
              col("c").cast("decimal(19,0)"))
              .cast("string").as("sum_c2"))
          .orderBy("event_type")
    },

    // DAU/WAU rolling distinct actives: WAU(d) = distinct users in
    // [d−6, d]. Spark has no DISTINCT-over-range window; the engine
    // fans each (user, day) pair out to its ≤7 target days (BOUNDED
    // explode — never a per-day rescan or a range self-join) and
    // count-distincts per day; the oracle uses the BETWEEN join over
    // the same day grid — different machinery, same counts.
    QueryDef.sql("q277_active_users",
      """WITH ud AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
        |wau AS (
        |  SELECT d.day, count(DISTINCT u.user_id) AS wau
        |  FROM dau d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
        |  GROUP BY d.day)
        |SELECT d.day AS day, CAST(d.dau AS BIGINT) AS dau,
        |  CAST(w.wau AS BIGINT) AS wau
        |FROM dau d JOIN wau w ON d.day = w.day
        |ORDER BY day""".stripMargin) { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000L").as("day"))
        .distinct()
        .persist() // feeds the per-day count AND the 7-day fanout
      val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = ud
        .withColumn("tday", explode(sequence(col("day"), col("day") + 6)))
        .groupBy("tday").agg(count_distinct(col("user_id")).as("wau"))
      dau.join(wau, dau("day") === wau("tday"))
        .select(col("day"), col("dau"), col("wau"))
        .orderBy("day")
    },

    // Native session_window sessionization (streaming/SessionStreams —
    // the MERGING-window engine surface; q45 gates the lag-islands
    // formulation of the same sessions). The oracle re-derives the
    // identical sessions via the q45 island chain with end = last
    // event + gap, session_window's end convention. The same function
    // body runs as a streaming query (SessionStreamsSpec proves
    // streaming ≡ batch incl. cross-micro-batch session merges).
    // Gap test is in MICROSECONDS: session_window compares raw µs
    // instants, and an oracle on ms floors would merge a sub-ms-over-
    // the-gap pair the engine splits (q45/q79 mirror ms floors because
    // THEIR engine, sessionizeBatch, computes gaps on ms floors).
    QueryDef.sql("q279_session_window",
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |numbered AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS sidx
        |  FROM flagged)
        |SELECT user_id, epoch_ms(min(ts)) AS session_start_ms,
        |  epoch_ms(max(ts)) + 1800000 AS session_end_ms,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM numbered GROUP BY user_id, sidx
        |ORDER BY user_id, session_start_ms""".stripMargin) { (s, d) =>
      graft.streaming.SessionStreams
        .sessionAgg(Tables.events(s, d), gapMinutes = 30)
        .orderBy("user_id", "session_start_ms")
    },

    // Cohort LTV curve: q91's weekly cohorts (Monday-aligned both
    // engines) carrying MONEY — cumulative purchase revenue per
    // (cohort week, age) with cohort size. Cents through
    // DECIMAL(18,2)·100 → BIGINT (exact, order-independent); the
    // cumulative window partitions by cohort (ages per cohort are
    // calendar-bounded). One purchase scan + per-user min + two aggs.
    QueryDef.sql("q284_cohort_ltv",
      """WITH p AS (
        |  SELECT user_id, epoch_ms(time_bucket(INTERVAL '7 days', ts)) AS w,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, min(w) AS cw FROM p GROUP BY user_id),
        |sz AS (SELECT cw, count(*) AS n_users FROM c GROUP BY cw),
        |rev AS (
        |  SELECT c.cw, (p.w - c.cw) // 604800000 AS age_weeks,
        |    sum(p.cents) AS cents
        |  FROM p JOIN c ON p.user_id = c.user_id GROUP BY 1, 2),
        |cum AS (
        |  SELECT cw, age_weeks,
        |    CAST(sum(cents) OVER (PARTITION BY cw ORDER BY age_weeks
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
        |  FROM rev)
        |SELECT cum.cw AS cohort_week_ms, CAST(cum.age_weeks AS BIGINT)
        |    AS age_weeks,
        |  CAST(sz.n_users AS BIGINT) AS n_users, cum.cum_cents
        |FROM cum JOIN sz ON cum.cw = sz.cw
        |ORDER BY cohort_week_ms, age_weeks""".stripMargin) { (s, d) =>
      val p = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          unix_millis(date_trunc("week", col("ts"))).as("w"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        .persist() // feeds the cohort min AND the revenue join
      val c = p.groupBy("user_id").agg(min("w").as("cw"))
      val sz = c.groupBy("cw").agg(count(lit(1)).as("n_users"))
      val rev = p.join(c, "user_id")
        .groupBy(col("cw"), expr("(w - cw) div 604800000").as("age_weeks"))
        .agg(sum("cents").as("cents"))
      val byCohort = org.apache.spark.sql.expressions.Window
        .partitionBy("cw").orderBy("age_weeks")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      rev.withColumn("cum_cents", sum("cents").over(byCohort))
        .join(sz, "cw")
        .select(col("cw").as("cohort_week_ms"), col("age_weeks"),
          col("n_users"), col("cum_cents"))
        .orderBy("cohort_week_ms", "age_weeks")
    },

    // Conversion-latency percentile trend: per Monday-aligned week, the
    // discrete p50/p90/max of purchase-minus-latest-view age. The
    // engine composes AsofJoin.asofMatchBounded (union-tag single
    // shuffle, match on RAW event time, age from ms floors) with
    // explicit rank picks — p50 at rank (n+1) div 2 (the lower-median
    // convention), p90 at ⌈0.9n⌉ = (9n+9) div 10, both restated
    // identically in the oracle (no percentile_disc — its rank
    // definition stays out of the contract). Oracle matches via the
    // µs-truncating CTE + max-per-conversion (different machinery);
    // week = ((ms div 86400000) + 3) div 7, Monday-aligned integer.
    QueryDef.sql("q285_conversion_latency",
      """WITH ev AS (
        |  SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, user_id,
        |    event_type
        |  FROM events),
        |conv AS (SELECT event_id AS cid, user_id, ts AS cts FROM ev
        |  WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts AS vts FROM ev WHERE event_type = 'view'),
        |m AS (
        |  SELECT c.cid, c.cts, max(v.vts) AS mvts
        |  FROM conv c JOIN v ON c.user_id = v.user_id AND v.vts <= c.cts
        |  GROUP BY 1, 2),
        |aged AS (
        |  SELECT cid, epoch_ms(cts) AS cms,
        |    epoch_ms(cts) - epoch_ms(mvts) AS age_ms
        |  FROM m WHERE epoch_ms(cts) - epoch_ms(mvts) <= 604800000),
        |wk AS (SELECT cid, age_ms, ((cms // 86400000) + 3) // 7 AS week_idx
        |  FROM aged),
        |ranked AS (
        |  SELECT week_idx, age_ms,
        |    row_number() OVER (PARTITION BY week_idx
        |      ORDER BY age_ms, cid) AS rn,
        |    count(*) OVER (PARTITION BY week_idx) AS n
        |  FROM wk)
        |SELECT week_idx, CAST(max(n) AS BIGINT) AS n_conv,
        |  CAST(max(CASE WHEN rn = (n + 1) // 2 THEN age_ms END) AS BIGINT)
        |    AS p50_ms,
        |  CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN age_ms END)
        |    AS BIGINT) AS p90_ms,
        |  CAST(max(age_ms) AS BIGINT) AS max_ms
        |FROM ranked GROUP BY week_idx ORDER BY week_idx""".stripMargin) {
      (s, d) =>
        val ev = Tables.events(s, d)
        val conv = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("ts"), col("user_id"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("ts"), col("user_id"))
        val aged = graft.operators.AsofJoin
          .asofMatchBounded(conv, views, keyCol = "user_id",
            leftTs = "ts", rightTs = "ts", leftIdCol = "event_id",
            rightIdCol = "event_id", horizonMs = 604800000L)
          .filter(col("age_ms").isNotNull)
          .select(col("left_id").as("cid"),
            expr("((unix_millis(ts) div 86400000) + 3) div 7").as("week_idx"),
            col("age_ms"))
        val byWeek = org.apache.spark.sql.expressions.Window
          .partitionBy("week_idx").orderBy(col("age_ms"), col("cid"))
        val nWeek = org.apache.spark.sql.expressions.Window
          .partitionBy("week_idx")
        aged
          .withColumn("rn", row_number().over(byWeek).cast("long"))
          .withColumn("n", count(lit(1)).over(nWeek))
          .groupBy("week_idx")
          .agg(max("n").as("n_conv"),
            max(when(col("rn") === expr("(n + 1) div 2"), col("age_ms")))
              .as("p50_ms"),
            max(when(col("rn") === expr("(9 * n + 9) div 10"), col("age_ms")))
              .as("p90_ms"),
            max("age_ms").as("max_ms"))
          .orderBy("week_idx")
    },

    // One-sided CUSUM drift alarms (Changepoint.firstAlarms): per user,
    // Page's sequential detector over value cents — cum(v − 6000),
    // alarm where cum − min(0, running min) ≥ 30000; first alarm + the
    // alarm-row count per user (58 of 150 users at sf0.01, 594/1500 at
    // sf0.1 — the constants discriminate at every sf). The S₀ = 0
    // baseline is the Page recursion, spec-pinned; the state is two
    // longs, which is why AnomalyStreams can run the SAME rows live
    // (q212's retrospective argmax needs S_n and never streams).
    // Timestamps flow as epoch_us on both sides (events are µs).
    QueryDef.sql("q302_cusum_alarms",
      """WITH x AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) - 6000 AS d
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, us,
        |    CAST(sum(d) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM x),
        |m AS (
        |  SELECT user_id, event_id, us, cum,
        |    least(CAST(0 AS BIGINT),
        |      CAST(min(cum) OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT))
        |      AS runmin
        |  FROM s),
        |al AS (SELECT user_id, us, event_id, cum - runmin AS gap FROM m
        |  WHERE cum - runmin >= 30000),
        |r AS (
        |  SELECT user_id, us, event_id, gap,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM al)
        |SELECT user_id, CAST(us AS BIGINT) AS first_us,
        |  CAST(event_id AS BIGINT) AS first_id, CAST(gap AS BIGINT)
        |    AS first_gap, CAST(n AS BIGINT) AS n_alarm_rows
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, d) =>
      graft.operators.Changepoint.firstAlarms(
          Tables.events(s, d).select(col("user_id"),
            unix_micros(col("ts")).as("us"), col("event_id"),
            (col("value").cast("decimal(18,2)") * 100).cast("long")
              .as("cents")),
          "user_id", "us", "event_id", "cents",
          ref = 6000L, threshold = 30000L)
        .select(col("grp").as("user_id"), col("first_us"),
          col("first_id"), col("first_gap"), col("n_alarm_rows"))
        .orderBy("user_id")
    }
  )
}
