package graft

import org.apache.spark.sql.SparkSession

/** Regenerates EXPLAINS.md: the raw `explain("formatted")` plans for
  * the headline queries SCALE.md's audit table summarizes.
  *
  * r9: the file is GENERATED, not hand-maintained — stale plans
  * shipped two rounds running (r7 `join_fact`, r8 `text_repetition`
  * plus three missing re-plan entries), so `ExplainsSyncSpec` now
  * regenerates the document under the same canonical session config
  * and fails on any diff: a plan-affecting change cannot land without
  * `sbt "runMain graft.ExplainDump"` refreshing the committed file.
  * To make that diff meaningful across JVMs, every plan is
  * ID-normalized (expression ids and plan_ids are global counters
  * that depend on what ran earlier in the JVM; they are remapped to
  * per-plan sequential values in order of first appearance, which
  * keeps same-name columns distinguishable while making the text a
  * pure function of the plan shape).
  */
object ExplainDump {
  val DefaultSf = "/root/testdata/sf0.01"

  /** The canonical session the recorded plans come from: AQE off so
    * they are the static plans the bench executes (and the ones a
    * plan reviewer can reason about without runtime re-planning in
    * the way), 8 shuffle partitions (the bench session's sizing),
    * UTC so time expressions render identically everywhere.
    * Verify still runs stock config.
    *
    * Returns (session, owned). If a SparkSession is already active in
    * this JVM (the shared test session), the canonical confs are
    * applied to an isolated `newSession()` child — own SQLConf, shared
    * SparkContext — so the parent's confs are never mutated and
    * `owned = false` tells the caller it must NOT stop it. A fresh
    * JVM (`sbt runMain`) builds its own session and owns it.
    */
  def acquire(): (SparkSession, Boolean) =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .filterNot(_.sparkContext.isStopped) match {
      case Some(parent) =>
        val s = parent.newSession()
        canonicalConfs.foreach { case (k, v) => s.conf.set(k, v) }
        (s, false)
      case None =>
        val b = SparkSession.builder()
          .master("local[8]")
          .config("spark.ui.enabled", "false")
        canonicalConfs.foreach { case (k, v) => b.config(k, v) }
        (b.getOrCreate(), true)
    }

  private val canonicalConfs = Seq(
    "spark.sql.shuffle.partitions" -> "8",
    "spark.sql.adaptive.enabled" -> "false",
    "spark.sql.session.timeZone" -> "UTC")

  /** Remap every JVM-global counter that leaks into `explain` text to
    * per-plan sequential values in order of first appearance, so the
    * rendered plan is a pure function of the plan SHAPE, not of what
    * ran earlier in the JVM. The global counters Spark 4.1 embeds in
    * formatted-explain text are, exhaustively (re-audit on a Spark
    * version bump):
    *   1. expression ids      — `#NNN` (NamedExpression.newExprId)
    *   2. plan ids            — `plan_id=NNN` (TreeNode tags)
    *   3. lambda variable names — `x_NNN` etc. (DSL higher-order
    *      functions mint parameter names via
    *      UnresolvedNamedLambdaVariable.freshVarName, an AtomicInteger
    *      suffix; SQL-text lambdas keep the user's names and carry no
    *      counter). Lambda names always render with an `#id` suffix,
    *      which is what the lookahead anchors on — real columns in
    *      this repo never match `name_digits#`.
    */
  def normalize(plan: String): String = {
    def remap(s: String, pattern: scala.util.matching.Regex,
              render: Int => String): String = {
      val ids = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      pattern.replaceAllIn(s, m => {
        val id = ids.getOrElseUpdate(m.group(1), ids.size + 1)
        scala.util.matching.Regex.quoteReplacement(render(id))
      })
    }
    val a = remap(plan, "#(\\d+)".r, i => s"#$i")
    val b = remap(a, "plan_id=(\\d+)".r, i => s"plan_id=$i")
    // lambda names: per-base-name sequential (x_47 -> x_1, acc_12 -> acc_1)
    val counters = scala.collection.mutable.Map.empty[String, Int]
    val assigned = scala.collection.mutable.Map.empty[String, String]
    "\\b([A-Za-z]+)_(\\d+)(?=#)".r.replaceAllIn(b, m => {
      val renamed = assigned.getOrElseUpdate(m.matched, {
        val base = m.group(1)
        val n = counters.getOrElse(base, 0) + 1
        counters(base) = n
        s"${base}_$n"
      })
      scala.util.matching.Regex.quoteReplacement(renamed)
    })
  }

  def render(spark: SparkSession, sf: String): String = {
    val headline = Seq(
      "agg_group" -> "flagship: pushed filter -> partial/final hash agg",
      "join_dim" -> "broadcast dimension join",
      "join_fact" -> "fact-fact join, revenue aggregated BELOW the join (r7: fact side pre-reduced to one row per key before any join machinery; BHJ at this SF, keyed exchange of two already-reduced relations beyond the broadcast threshold)",
      "join_anti" -> "anti join: key-only pruned sides, BuildRight broadcast",
      "join_semi" -> "semi join: no right-side payload columns",
      "join_multiway" -> "multiway join: broadcast chain over pruned dims",
      "set_except" -> "set difference as LeftAnti over a distinct-ed build side (r7: build relation map-side-combines to unique keys before its exchange)",
      "sort_topk" -> "TakeOrderedAndProject top-k",
      "sim_search" -> "broadcast query vector + one scan + top-k",
      "asof_join" -> "as-of join: one exchange, window, no join operator",
      "dedup_text" -> "content-hash dedup: one keyed exchange",
      "text_entropy" -> "entropy folded into ONE per-doc aggregate (r6: totals join eliminated)",
      "text_bigram_lm" -> "bigram LM de-skewed (r15): corpus counts as map-side-combined aggregates over ONE reused doc-keyed exchange (ReuseExchange feeds count branch + probe from a single explode), per-bigram NLL broadcast back; replaces the r6 occurrence-level count windows whose Zipf-head word funneled ~5% of the corpus into one unsplittable window task",
      "text_tfidf" -> "tf-idf de-skewed (r15): document frequency as a map-side-combined aggregate over ONE reused doc-keyed exchange, broadcast back; replaces the r6 token-partitioned count window (corpus-sized group on the Zipf-head token); top-k keeps the WindowGroupLimit pushdown on the doc key",
      "text_repetition" -> "ZERO keyed exchanges, no explode, no aggregate (r8: the per-doc Gopher repetition stats fold over a sorted bigram run inside one projection — the statistic never leaves its row; only the presentation sort's range exchange remains. Supersedes the r7 explode + three-exchange form)",
      "cohort_retention" -> "two keyed exchanges, no join, no expand (r8: collect_set of active months per customer, cohort = array_min, explode to one row per (customer, month) so the triangle is a plain count — the r7 form paid a cohort join-back plus countDistinct's expand)",
      "snapshot_diff" -> "union of both snapshots over ONE keyed exchange (r8: each side pads the other's column with null, one map-side-combining max aggregate merges the pair per key, verdict compares in-row — the full-outer sort-merge join it replaces paid two exchanges and two sorts)",
      "dedup_time_window" -> "packed-decimal min HashAggregate, one exchange, truly no sort (r13: first event per (user, type, hour) = min over the packed decimal ts_micros*2^62 + event_id (Num.packAsc; preconditions raise_error-enforced) — the r8 min-STRUCT form silently planned as SortAggregate and sorted the fact table in both partials; the rank-window form before it shuffled every surviving row and ran full window machinery)",
      "window_anomaly" -> "trailing stats as cum-minus-lag, one shared sort (r6)",
      "gap_stats" -> "window + aggregate sharing one exchange",
      "encode_bucket" -> "fit-then-transform: sort-based exact deciles embedded as literals, big side a pure projection (r12: replaces the percentile-aggregate fit + cut-array broadcast + interpreted per-row fold)",
      "agg_salted" -> "salted two-phase skew aggregate (r12): phase-1 partials keyed on (key, salt) spread a hot key over 16 reducers, phase-2 combines |keys|x16 rows — both aggregates map-side combine, so the second exchange carries partials only",
      "scrub_spans" -> "corpus exact-substring scrub (r13): ShingleHash2 emits 128-bit gram fingerprints in one codegen'd pass (no gram strings anywhere), first occurrence = min over a packed (doc_id << 21 | p) long so the per-gram aggregate stays a map-side-combined HashAggregate, join-back keyed on the fingerprint, <= n-row sequence explode per scrubbed occurrence, and reassembly is an indexed filter over the in-row words array (no corpus-sized token explode) — every exchange keyed, nothing pairwise; 279 -> 42 s at 1M docs across the three plan generations")
    // Queries whose public entry point materializes through an eager
    // localCheckpoint (the returned lineage is just a checkpoint
    // scan): dump the un-materialized pipeline the checkpoint runs,
    // via the same private plan accessors the plan-shape specs audit.
    val checkpointed = Seq(
      ("dedup_containment",
        "posting-list candidates with RIDING denominators (r7: per-doc gram " +
          "counts travel inside the posting structs — one shingle pass, two " +
          "keyed exchanges, zero joins). Public API materializes this via " +
          "localCheckpoint",
        () => graft.ops.NearDup.containmentPairsPlan(spark,
          graft.ops.Sources.table(spark, sf, "documents"), 3,
          graft.ops.NearDup.DefaultMaxDf, graft.ops.NearDup.DefaultMinContain)),
      ("dedup_cluster",
        "candidate-EDGE pipeline feeding connected components (shared-rare-" +
          "shingle postings -> bounded pair expansion -> Jaccard filter). The " +
          "CC loop then runs per-round equi-join + hash-aggregate over the " +
          "symmetrized, checkpointed edges at graph-sized shuffle partitions; " +
          "plan depth stays constant via localCheckpoint, so the loop has no " +
          "single static plan to print — this is the one-shot pipeline it " +
          "iterates over",
        () => {
          val (pairs, posts) = graft.ops.NearDup.dedupNgramPlan(spark,
            graft.ops.Sources.table(spark, sf, "documents"), 3,
            graft.ops.NearDup.DefaultMaxDf, graft.ops.NearDup.DefaultMinJaccard)
          val df = pairs.select("doc_a", "doc_b")
          posts.unpersist(blocking = false) // plan-only dump, nothing ran
          df
        }))
    val sb = new StringBuilder
    sb.append("# EXPLAINS — formatted physical plans for the headline queries\n\n")
    sb.append(s"Generated by `graft.ExplainDump` at sf dir `$sf`; SCALE.md's\n")
    sb.append("audit table is the summary, this file is the raw evidence.\n")
    sb.append("Expression/plan ids are normalized to per-plan sequential values\n")
    sb.append("so the file is a deterministic function of the plan shapes;\n")
    sb.append("`ExplainsSyncSpec` regenerates it and fails on any drift.\n")
    // One more session-dependent token: several corpus operators
    // `repartition(sc.defaultParallelism)` to spread per-token work,
    // and that width renders as `RoundRobinPartitioning(N)` — N is a
    // function of the HOST/SESSION (core count), not the plan shape,
    // so it is rewritten to a symbolic name. Caveat (known, accepted):
    // the rewrite is textual, so a LITERAL repartition(N) whose N
    // happens to equal this session's defaultParallelism would also be
    // rewritten. No declared query uses a literal round-robin
    // repartition today; if one ever does, give it a count that can't
    // collide (e.g. a prime > 64) or extend normalize() to track which
    // plans used the session value.
    val dp = spark.sparkContext.defaultParallelism
    def dump(name: String, note: String,
             df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = normalize(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
        .replace(s"RoundRobinPartitioning($dp)",
          "RoundRobinPartitioning(defaultParallelism)")
      sb.append(s"\n## `$name` — $note\n\n```\n$plan```\n")
    }
    headline.foreach { case (name, note) =>
      dump(name, note, SparkEntry.queries(name)(spark, sf))
    }
    checkpointed.foreach { case (name, note, mk) => dump(name, note, mk()) }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("EXPLAINS.md")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", DefaultSf)
    val (spark, owned) = acquire()
    spark.sparkContext.setLogLevel("ERROR")
    val text = render(spark, sf)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), text)
    println(s"wrote $out")
    if (owned) spark.stop()
  }
}
