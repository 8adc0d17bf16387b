package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Timing methodology: a session-warmup action first (JVM/codegen/
  * parquet-footer costs land there, not in q1), then SPARK_GRAFT_BENCH_RUNS
  * (default 5) pass-interleaved executions of the whole query set with a
  * count() action; the reported per-query number is the MEDIAN across
  * passes (single-run numbers vary ±40% on this host, and host stall
  * windows pollute adjacent wall-clock — interleaving decorrelates a
  * query's samples from any one window) and "value" is the sum of
  * medians. AQE is on; shuffle partitions match the local core count.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // 5 runs (was 3): per-run timings show heavy-tailed multi-second
    // outliers — NOT GC (zero full collections, ≤15 ms pauses in the
    // -Xlog:gc trace), time-clustered across adjacent queries and able
    // to hit any run index, occasionally twice on the same query (q53
    // cold run: 1.9/15.6/5.5 s → median 5.5). A median of 5 tolerates
    // two polluted runs; a median of 3 tolerates one. This is the same
    // signature as the r05 gate's contiguous q57–q68 cluster.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    // Dev-only AQE toggle for measuring adaptive-execution overhead at
    // bench scale (the driver never sets it).
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.coalescePartitions.enabled", aqe)
      // 80 queries x several WSCG fragments each blows through the
      // default 100-entry generated-class cache, so pass-interleaved
      // runs would re-janino-compile (and re-JIT) every fragment every
      // pass. Static conf: must be set before the first codegen.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The per-query RDD sweep below WARNs once per localCheckpointed
    // RDD ("lineage has been truncated...cannot be recomputed") —
    // expected (nothing reuses a completed query's round states) and
    // noisy enough to crowd the tail window the driver JSON-parses.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)

    // warmup: session + codegen + footer reads for the big tables
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(1).collect()
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

    // PASS-INTERLEAVED runs: all queries once per pass, `runs` passes,
    // median per query ACROSS passes. With consecutive per-query runs
    // (rounds 1-6a) a single multi-second host stall window — kernel
    // page-fault storms, see build.sbt's AlwaysPreTouch note — could
    // cover every run of one query (observed: q07 medians 3.5s vs 0.9s
    // between back-to-back invocations), which no order statistic
    // repairs. Interleaving puts ~minutes between a query's samples, so
    // one stall window touches at most one sample of each affected
    // query and the median discards it.
    // Dev-only subset filter (comma-separated name prefixes), e.g.
    // SPARK_GRAFT_BENCH_ONLY=q97,q08 — the driver never sets it, so
    // gate runs always time the full set.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.split(",").exists(n.startsWith)) }
    // Per-pass peak of the block-manager storage pool, to separate
    // "host weather" from "cache pressure" in slow passes (VERDICT r8:
    // ~35 persist() sites with 2 unpersists meant every cached plan of
    // all 239 queries stayed resident for the whole bench JVM).
    // Sampling is once per query (post-count, pre-sweep), so caches an
    // operator releases INSIDE its own body (Aux.share's try/finally)
    // never register — the line UNDERSTATES transient pressure and is a
    // triage signal, not a bound; a timer-thread sampler is the upgrade
    // if precision ever matters (ADVICE r9).
    val passPeakStorage = scala.collection.mutable.ArrayBuffer[Long]()
    val samples: Seq[Seq[Double]] = (1 to runs).map { _ =>
      var peak = 0L
      val pass = named.map { case (_, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case _: Throwable => false }
        val sec = (System.nanoTime() - t0) / 1e9
        peak = math.max(peak, Caches.storageBytes(spark))
        // Cache hygiene: drop query-scoped persists so pass n+1 times
        // the same cold-cache work as pass 1 and the storage pool stays
        // flat across 239 queries (rule 3 of docs/CACHE_POLICY.md —
        // catalog cache AND the RDD-level localCheckpoints the catalog
        // never tracks, which accumulated ~90 MB/pass in round 9).
        // Aux.share/shareBuilt stages are parquet-backed (write-once
        // memo) and unaffected.
        Caches.releaseAll(spark)
        if (ok) sec else -1.0
      }
      passPeakStorage += peak
      pass
    }
    // Per-pass detail is buffered and printed BEFORE the final JSON
    // line: the driver tail-reads the last ~2000 chars of combined
    // output, so nothing may be emitted after the JSON.
    val detail = new StringBuilder
    val results = named.zipWithIndex.map { case ((name, _), i) =>
      val times = samples.map(_(i))
      detail.append(f"bench-detail $name%-28s ${times.map(t => f"$t%.3f").mkString(" ")}%n")
      name -> (if (times.exists(_ < 0)) -1.0 else median(times))
    }
    // r05 gate showed a q57-q68 late-run slowdown cluster with medians
    // only; per-run numbers distinguish "every run slow" (plan/state)
    // from "first run slow" (cache/compile) for the next investigation.
    detail.append("bench-detail storage-peak-mb " +
      passPeakStorage.map(b => f"${b / 1048576.0}%.1f").mkString(" ") +
      f"%n")
    print(detail.toString)
    // The driver records only the LAST ~2000 chars of this process's
    // output and JSON-parses what it finds there (BENCH_r0{1..4}.json all
    // have parsed:null because the full-name 9-decimal line was ~2500
    // chars and lost its opening brace to the window; at 159 queries even
    // short-key 3-decimal entries overflow it again). The final JSON line
    // therefore carries only the SLOWEST queries that fit a fixed char
    // budget — with queries_shown/queries_total making the truncation
    // explicit — so it stays tail-parseable at ANY future query count.
    // The full per-query map goes on the `bench-full`-prefixed line just
    // above (the prefix keeps it json.loads-unparseable, so the tail
    // window can never see two candidate JSON lines).
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val shortKeys = results.map(_._1.takeWhile(_ != '_'))
    require(shortKeys.distinct.size == results.size,
      s"short bench keys collide: ${shortKeys.diff(shortKeys.distinct).distinct.mkString(",")}")
    val entries = shortKeys.zip(results.map(_._2))
    val total = results.map(_._2).filter(_ >= 0).sum
    val fullQs = entries.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    println(s"""bench-full {"metric":"total","value":${f3(total)},"unit":"sec","runs":$runs,"queries":$fullQs,"sf":"$sfDir"}""")
    val mapBudget = 1200 // chars for the queries map; line ≈ budget + 120
    val bySlowest = entries.sortBy { case (_, v) => -v }
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }
    val shown = scala.collection.mutable.ArrayBuffer[String]()
    var used = 0
    bySlowest.foreach { e =>
      if (used + e.length + 1 <= mapBudget) { shown += e; used += e.length + 1 }
    }
    val qs = shown.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","runs":$runs,"queries":$qs,"queries_shown":${shown.size},"queries_total":${entries.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
