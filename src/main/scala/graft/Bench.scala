package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Bench-session tuning (engine defaults unchanged; Verify runs the
    // stock config). Two deliberate deviations, both measured at sf0.1
    // (see README "bench recipe" + SCALE.md):
    //  - AQE off: its per-exchange materialize-and-replan cycle buys
    //    nothing at this scale (fixed partitions, sub-second stages)
    //    and costs driver latency on every shuffle. Same static plans
    //    Verify proved correct, minus runtime re-planning.
    //    58.6 s -> 38.0 s on the full 147-query pass.
    //  - 8 shuffle partitions: the static equivalent of what AQE
    //    coalescing picks for a few-MB shuffle (32 tasks of <25k rows
    //    each pay more per-task launch than they win in parallelism;
    //    scans still split by file). 38.0 s -> 32.4 s. A production
    //    deployment sizes this to data volume — that sizing IS the
    //    knob, not a bench trick. r6 swept the neighborhood under one
    //    load window: 4 -> 30.5 s, 8 -> 31.1 s, 16 -> 32.5 s; the
    //    r12 re-sweep under noop forcing (full materialization)
    //    confirmed the shape: 8 -> 51.4 oracle-subset (min-of-3),
    //    single passes 16 -> 63.2, 32 -> 81.3. 8 stays.
    // Overridable for A/B runs: SPARK_GRAFT_AQE=true,
    //   SPARK_GRAFT_PARTS=32, SPARK_GRAFT_RUNS=1
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "false")
    // r22 re-audit of the static 8 at the sf1 rung (heavy-subset
    // min-of-pairs, 32 cores): parts=8 total 196.1 s, parts=32 144.0
    // (sim_knn_bucketed_full 1.76x BUT dedup_ngram/dedup_survivor
    // 0.44x — their surviving pair sets are small and 32-wide
    // shuffles are pure overhead), AQE+32 154.2 (re-planning latency
    // on every exchange). No session-wide constant wins both
    // regimes, so the width fix lives in the OPERATOR that needs it
    // (fewKeySaltedJoin sizes its salted exchange to
    // max(conf, cores)) and the session default stays 8 — best
    // observed on everything else at BOTH rungs, and the committed
    // numbers stay methodology-identical across rounds.
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "8")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    // Extra SQL confs for A/B profiling runs, semicolon-separated:
    //   SPARK_GRAFT_CONF="spark.sql.join.preferSortMergeJoin=false"
    val extraConf = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .map { kv => val i = kv.indexOf('=')
        (kv.take(i).trim, kv.drop(i + 1).trim) } // "k = v" spacing ok
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", aqe)
      // pin UTC like Verify does: events.ts loads as TIMESTAMP_NTZ on
      // the µs fixtures and the cast to TimestampType is
      // session-timezone-dependent — an unpinned bench on a non-UTC
      // host would time DIFFERENT row sets than Verify verifies
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extraConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // fail fast with one clear message on fixture schema drift
    // (r10: 51 queries failed individually on a regenerated events.ts)
    graft.ops.Sources.assertFixtureSchemas(spark, sfDir)
    // warmup: absorb executor init + first-job codegen + the one-time
    // listing/schema read of EVERY table (Sources.table caches the
    // relation per session) so none of it is charged to whichever
    // query happens to touch a table first. Never fatal.
    Seq("lineitem", "events", "documents", "embeddings", "orders",
      "customer", "nation", "region", "part", "supplier").foreach { t =>
      try { graft.ops.Sources.table(spark, sfDir, t).count(): Unit }
      catch { case _: Throwable => () }
    }
    // optional comma-separated subset for focused profiling runs
    // (SPARK_GRAFT_ONLY=dedup_ngram,doc_fingerprint); default = all
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // Every raw sample, in execution order, per query — the r7 driver
    // pass produced two outliers (map_funcs 1.93 s, text_repetition
    // 1.61 s) on unchanged-or-improved plans, and the min-only record
    // left no evidence to tell host load from a real regression. The
    // full sample log goes to BENCH_LOCAL.json.
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    var failed = Set.empty[String]
    // A query that throws on ANY sample is excluded from every
    // aggregate (total, oracle_subset, per-query map) and listed
    // under "failed" in both the stdout line and the JSON artifact:
    // folding a failure's near-zero elapsed time into the totals
    // would make a correctness regression read as a speedup (r7
    // ADVICE — the r6 fix only appended a count while still summing
    // the broken timing). r8 ADVICE tightened this further: a FLAKY
    // query (one sample throws, another succeeds) used to sneak its
    // successful min into the totals while also appearing in
    // "failed" — now membership in `failed` removes the query from
    // `results` outright, so the exclusion invariant is exact.
    // Force through the noop SINK, never count(): count() lets the
    // optimizer prune every column the count doesn't need, so a query
    // ending in an aggregation or projection was timed WITHOUT its
    // computed columns — measured at sf0.1 warm: agg_group 0.29 s
    // counted vs 1.07 s materialized (the decimal sums were never
    // computed), dedup_simhash 0.40 vs 1.32 (the signature aggregate
    // was dropped). The DuckDB baseline fetches full results, so
    // count() timing was systematically charitable to Spark (r12
    // fix — totals before/after are NOT comparable; BASELINE.md
    // re-paired both engines in one window on the new rule). noop
    // materializes every column executor-side with no sink cost.
    def once(name: String,
             fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        true
      } catch { case _: Throwable => failed += name; false }
      val sec = (System.nanoTime() - t0) / 1e9
      if (ok) { samples(name) = samples(name) :+ sec; Some(sec) } else None
    }
    // Per-query seconds: min over a BACK-TO-BACK pair of executions
    // (default runs=2), then a SECOND back-to-back pair, minutes
    // later, for any query whose first pair still reads > 0.35 s.
    // Nothing is cached between executions (the full plan re-runs);
    // the in-pair re-run sheds first-run Janino codegen compile
    // (cached by generated-source key) and first-run JIT — pairs must
    // stay adjacent, because by the time a full sweep returns to a
    // query its generated methods have fallen out of the JIT's hot
    // set (an r7 experiment that spread ALL samples across whole-
    // suite sweeps inflated every query ~25-50%: dedup_ngram 1.08 →
    // 1.70 s with identical plans). Adjacency is also the weakness:
    // a host-load window of a few seconds contaminates both samples
    // of whichever query it lands on (r6 driver pass: dedup_cluster
    // 4.08 s vs 1.78 s steady; join_anti 0.87 vs 0.34). Mitigations,
    // layered after the r7 pass showed a spike surviving four samples
    // across two windows:
    //  1. the second-pair queue runs in a SHUFFLED order (seeded from
    //     wall clock), so a load window during the re-pair phase
    //     cannot hit the same queries the sweep-phase window hit, nor
    //     the same ones it hit last round;
    //  2. any query still > 0.6 s after two pairs gets a THIRD pair
    //     in a later window (a handful of genuinely-slow queries
    //     confirm their reading; a doubly-contaminated one finally
    //     gets a clean window);
    //  3. every raw sample is written to BENCH_LOCAL.json, so an
    //     outlier in the report is attributable post hoc (flat
    //     samples = real; one clean sample = the min already took it;
    //     all spiked across three windows = host story untenable).
    // Steady-state latency is the scale-relevant quantity.
    val qlist = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    def pairMin(name: String,
                fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val ts = (1 to math.max(1, runs)).flatMap(_ => once(name, fn))
      if (ts.isEmpty) None else Some(ts.min)
    }
    val best = scala.collection.mutable.Map.empty[String, Double]
    for ((name, fn) <- qlist) pairMin(name, fn).foreach(best(name) = _)
    // Seed is logged (stdout + artifact) so a run's re-pair execution
    // order — exactly what the per-sample forensics attribute spikes
    // to — is reproducible post hoc (r8 ADVICE).
    val reorderSeed = System.nanoTime()
    println(s"bench: re-pair shuffle seed = $reorderSeed")
    val reorder = new scala.util.Random(reorderSeed)
    if (runs >= 2) {
      for ((name, fn) <- reorder.shuffle(qlist)
           if best.get(name).exists(_ > 0.35)) {
        pairMin(name, fn).foreach(t => best(name) = math.min(best(name), t))
      }
      // third window for anything still slow: cheap (few queries),
      // and it is exactly the evidence the r7 outliers lacked
      for ((name, fn) <- reorder.shuffle(qlist)
           if best.get(name).exists(_ > 0.6)) {
        pairMin(name, fn).foreach(t => best(name) = math.min(best(name), t))
      }
    }
    val results = qlist.flatMap { case (name, _) =>
      if (failed(name)) None else best.get(name).map(name -> _) }
    // The driver parses the JSON line out of a bounded tail of this
    // process's stdout (last ~2000 chars): r03/r04 went ungraded
    // because full-precision doubles for 85 queries pushed the line
    // past that window, and at 99 queries even minimal formatting
    // cannot fit every name (the names alone are ~1.2k chars). So the
    // stdout line carries the exact total plus the SLOWEST queries up
    // to a fixed character budget (the ones any perf comparison
    // cares about) and an "omitted" count for the fast remainder,
    // while the complete full-precision map goes to BENCH_LOCAL.json
    // in the working directory for offline reading.
    // Explicit Locale.ROOT everywhere a number reaches JSON: under a
    // comma-decimal default locale f"" would emit "0,275" and corrupt
    // the artifact (r8 ADVICE).
    def num(pat: String, v: Double): String =
      String.format(java.util.Locale.ROOT, pat, Double.box(v))
    def fmt(v: Double): String =
      if (v >= 10) num("%.1f", v) else if (v >= 1) num("%.2f", v) else num("%.3f", v)
    val total = results.map(_._2).sum
    // BASELINE.md's DuckDB totals cover only the oracle-matched
    // queries (rows-only ones have no SQL to time), so the line also
    // carries the matched-subset total — the number directly
    // comparable to the baseline at the same SF
    val oracleTotal = results
      .filter { case (k, _) => SparkEntry.oracleSql.contains(k) }
      .map(_._2).sum
    val failures = failed.toSeq.sorted
    val failJson = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Output-path split (r8 VERDICT #2): the committed steady-state
    // artifact BENCH_LOCAL.json backs BASELINE.md and must only be
    // written DELIBERATELY — the r8 driver pass overwrote it in place
    // and the overwrite got committed, unbacking the baseline table.
    // Default now goes to BENCH_RUN.json (gitignored); producing the
    // committed artifact requires SPARK_GRAFT_BENCH_OUT=BENCH_LOCAL
    // .json explicitly (README "bench recipe"). Subset profiling runs
    // (SPARK_GRAFT_ONLY) keep their own file so a filtered run can
    // never masquerade as a full one (r7 ADVICE).
    val outName = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isEmpty) "BENCH_RUN.json" else "BENCH_PROFILE.json")
    // "oracle" records the oracle-matched key set so tools/
    // bench_merge.py can recompute oracle_subset exactly when merging
    // passes into the committed steady-state artifact (r9 ADVICE:
    // BENCH_LOCAL.json's producer must be a checked-in script).
    val oracleJson = results.map(_._1)
      .filter(SparkEntry.oracleSql.contains)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outName),
      s"""{"total":$total,"oracle_subset":$oracleTotal,"sf":"$sfDir","seed":$reorderSeed,"failed":$failJson,"oracle":$oracleJson,""" +
        results.map { case (k, v) => "\"" + k + "\":" + v }
          .mkString("\"queries\":{", ",", "},") +
        qlist.map { case (k, _) =>
            "\"" + k + "\":" + samples(k).map(s => num("%.4f", s)).mkString("[", ",", "]") }
          .mkString("\"samples\":{", ",", "}}\n"))
    catch { case _: Throwable => () } // read-only cwd: stdout still carries the line
    val budget = 1600
    val bySlowest = results.sortBy { case (k, v) => (-v, k) }
    val kept = scala.collection.mutable.ListBuffer[(String, Double)]()
    var used = 0
    bySlowest.foreach { case (k, v) =>
      val len = k.length + 4 + fmt(v).length
      if (used + len <= budget) { kept += ((k, v)); used += len }
    }
    val qs = kept.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    spark.stop()
    val failField =
      if (failures.isEmpty) """"failures":0"""
      else s""""failures":${failures.size},"failed":$failJson"""
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","oracle_subset":${fmt(oracleTotal)},$failField,"queries":$qs,"omitted":${results.size - kept.size},"sf":"$sfDir"}""")
  }
}
