package graft

import graft.ops.{Aggregates, NearDup, Relational, Sources, TextSim}
import org.apache.spark.sql.functions._

/** Round-4 surface: reshaping (pivot/unpivot), distribution windows,
  * bivariate statistics, grouping sets, and the incremental/chunk
  * dedup operators — behavioral invariants plus the plan shapes that
  * matter at scale.
  */
class ReshapeStatsSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("pivot_wide conserves the row count and zero-fills empty cells") {
    val wide = Relational.pivotWide(spark, sf).collect()
    val total = wide.map(r =>
      r.getLong(r.fieldIndex("A")) + r.getLong(r.fieldIndex("N")) +
        r.getLong(r.fieldIndex("R"))).sum
    assert(total == Sources.table(spark, sf, "lineitem").count(),
      "pivoted counts must partition the input rows")
    wide.foreach(r => (1 to 3).foreach(i =>
      assert(!r.isNullAt(i), s"empty pivot cell must be 0, got null: $r")))
  }

  test("pivot_wide plans as one aggregation, no value-discovery job") {
    val p = plan(Relational.pivotWide(spark, sf))
    assert(p.contains("HashAggregate"))
    assert(!p.contains("Join"), "declared pivot values must not join")
  }

  test("unpivot_long emits rows × metrics through an Expand, values intact") {
    val li = Sources.table(spark, sf, "lineitem")
    val long = Relational.unpivotLong(spark, sf)
    assert(long.count() == 3 * li.count())
    assert(plan(long).contains("Expand"),
      "unpivot must plan as a per-row Expand, not a union of scans")
    // spot-check: per-metric sum survives the reshape exactly
    val bySum = long.groupBy("metric").agg(graft.ops.Num.dsum(col("value")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val direct = li.agg(graft.ops.Num.dsum(col("l_quantity")),
      graft.ops.Num.dsum(col("l_discount"))).collect()(0)
    assert(bySum("l_quantity") == direct.getDouble(0))
    assert(bySum("l_discount") == direct.getDouble(1))
  }

  test("window_dist ranks are in range over a single partition-sort") {
    val d = Relational.windowDist(spark, sf)
    val rows = d.collect()
    rows.foreach { r =>
      val q = r.getInt(r.fieldIndex("quartile"))
      val pr = r.getDouble(r.fieldIndex("pct_rank"))
      val cd = r.getDouble(r.fieldIndex("cum_dist"))
      assert(q >= 1 && q <= 4)
      assert(pr >= 0.0 && pr <= 1.0)
      assert(cd > 0.0 && cd <= 1.0)
    }
    // Spark plans two Window operators (percent_rank's rank frame vs
    // the size-based frame ntile/cume_dist need) but they SHARE one
    // hash exchange + one sort — the scale-relevant property. A
    // regression to per-function WindowSpecs would double both.
    // AQE plan strings repeat the tree under "== Initial Plan ==" —
    // count only the final plan
    val p = plan(d).split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"distribution windows must share one partition exchange:\n${p.take(1500)}")
    assert("Window \\[".r.findAllIn(p).size <= 2,
      s"distribution windows regressed to per-function passes:\n${p.take(1500)}")
  }

  test("agg_corr matches the built-in co-moment aggregates") {
    val ours = Aggregates.aggCorr(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val builtin = Sources.table(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"))
      .collect().map(r => r.getString(0) -> r).toMap
    builtin.foreach { case (flag, b) =>
      val o = ours(flag)
      assert(math.abs(o.getDouble(o.fieldIndex("qp_corr")) -
        b.getDouble(b.fieldIndex("c"))) < 1e-3,
        s"$flag: decimal-moment corr diverges from built-in")
      assert(math.abs(o.getDouble(o.fieldIndex("qp_covar")) -
        b.getDouble(b.fieldIndex("cv"))) <
          math.abs(b.getDouble(b.fieldIndex("cv"))) * 1e-3 + 1e-2,
        s"$flag: decimal-moment covariance diverges from built-in")
    }
  }

  test("profileDrift flags perturbed metrics and passes identical ones") {
    val base = Aggregates.aggProfile(spark, sf)
    val same = Aggregates.profileDrift(base, base).collect()
    assert(same.nonEmpty && same.forall(!_.getBoolean(4)),
      "identical snapshots must show zero drift")
    val shifted = base.withColumn("mean", col("mean") * 1.5)
    val drifted = Aggregates.profileDrift(base, shifted).collect()
    assert(drifted.forall(_.getBoolean(4)),
      "a 50% mean shift must flag every column")
    drifted.foreach(r =>
      assert(math.abs(r.getDouble(r.fieldIndex("mean_drift")) - 0.5) < 0.01))
  }

  test("agg_skew matches the built-in moment aggregates") {
    val ours = Aggregates.aggSkew(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val builtin = Sources.table(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(skewness(col("l_quantity")).as("sk"),
        kurtosis(col("l_quantity")).as("ku"))
      .collect().map(r => r.getString(0) -> r).toMap
    builtin.foreach { case (flag, b) =>
      val o = ours(flag)
      assert(math.abs(o.getDouble(o.fieldIndex("skew_pop")) -
        b.getDouble(b.fieldIndex("sk"))) < 1e-2,
        s"$flag: power-sum skewness diverges from built-in")
      assert(math.abs(o.getDouble(o.fieldIndex("kurt_excess")) -
        b.getDouble(b.fieldIndex("ku"))) < 1e-2,
        s"$flag: power-sum kurtosis diverges from built-in")
    }
  }

  test("agg_deciles is a monotone nondecreasing 9-point grid") {
    val rows = Aggregates.aggDeciles(spark, sf).collect()
    assert(rows.length == 9)
    val vals = rows.sortBy(_.getDouble(0)).map(_.getDouble(1))
    vals.sliding(2).foreach {
      case Array(a, b) => assert(a <= b, s"deciles must be monotone: $a > $b")
      case _ => ()
    }
  }

  test("agg_gsets = per-status rows + per-priority rows + grand total") {
    val orders = Sources.table(spark, sf, "orders")
    val nStatus = orders.select("o_orderstatus").distinct().count()
    val nPrio = orders.select("o_orderpriority").distinct().count()
    val rows = Aggregates.aggGsets(spark, sf).collect()
    assert(rows.length == nStatus + nPrio + 1)
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1 &&
      grand(0).getLong(grand(0).fieldIndex("n_orders")) == orders.count(),
      "exactly one grand-total row covering every order")
  }

  test("dedup_incremental verdicts match exact-hash membership") {
    val d = Sources.table(spark, sf, "documents")
      .select(col("doc_id"), sha2(trim(lower(col("text"))), 256).as("h"),
        (graft.ops.Sampling.hexNibble(col("doc_id")) >= "8").as("is_new"))
    val corpusHashes = d.filter(!col("is_new")).select("h")
      .collect().map(_.getString(0)).toSet
    val newDocs = d.filter(col("is_new"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val verdicts = NearDup.dedupIncremental(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(verdicts.keySet == newDocs.keySet,
      "every new-batch doc gets exactly one verdict")
    verdicts.foreach { case (id, dup) =>
      assert(dup == corpusHashes.contains(newDocs(id)),
        s"doc $id: verdict $dup disagrees with corpus membership")
    }
  }

  test("merge_upsert covers all three MERGE branches exactly") {
    val snapKeys = Sources.table(spark, sf, "orders")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val updateKeys = Sources.table(spark, sf, "orders")
      .filter(col("o_orderkey") % 2 === 1)
      .select((col("o_orderkey") + 1).as("k")).collect()
      .map(_.getLong(0)).toSet
    val rows = Relational.mergeUpsert(spark, sf).collect()
    val keys = rows.map(_.getLong(0))
    assert(keys.length == keys.distinct.length, "one merged row per key")
    assert(keys.toSet == snapKeys ++ updateKeys, "union of both key sets")
    rows.foreach { r =>
      val (k, action) = (r.getLong(0), r.getString(3))
      val expected =
        if (updateKeys(k) && snapKeys(k)) "update"
        else if (updateKeys(k)) "insert" else "passthrough"
      assert(action == expected, s"key $k: $action != $expected")
      if (action == "update" || action == "insert")
        assert(r.getString(1) == "U", "updated rows carry the batch status")
    }
    assert(rows.exists(_.getString(3) == "insert"),
      "shifted keys past the max must exercise the insert branch")
  }

  test("agg_hist buckets partition the non-null values") {
    val ev = Sources.table(spark, sf, "events")
    val hist = Aggregates.aggHist(spark, sf).collect()
    assert(hist.map(_.getLong(1)).sum ==
      ev.filter(col("value").isNotNull).count(),
      "bucket counts must sum to the non-null row count")
    val buckets = hist.map(_.getLong(0))
    assert(buckets.distinct.length == buckets.length, "buckets unique")
  }

  test("sim_knn agrees with sim_search and plans partial top-k heaps") {
    val knn = TextSim.simKnn(spark, sf, k = 5)
    val rows = knn.collect()
    rows.foreach(r => assert(r.getLong(0) != r.getLong(1), "no self-pairs"))
    assert(rows.groupBy(_.getLong(0)).values.forall(_.length <= 5))
    // for the query vector sim_search uses, top-5 must coincide
    val fromKnn = rows.filter(_.getLong(0) == 0L)
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val fromSearch = TextSim.simSearch(spark, sf, queryId = 0L, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromKnn == fromSearch,
      s"knn row for vec 0 diverges from sim_search:\n$fromKnn\n$fromSearch")
    val p = plan(knn)
    assert(p.contains("WindowGroupLimit"),
      "per-query top-k must partial-aggregate before the shuffle")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "candidate side must broadcast, not shuffle")
  }

  test("text_entropy is bounded by the uniform-distribution maximum") {
    val rows = TextSim.textEntropy(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getDouble(r.fieldIndex("entropy"))
      val nDistinct = r.getLong(r.fieldIndex("n_distinct"))
      assert(h >= -1e-9, s"entropy must be non-negative, got $h")
      assert(h <= math.log(nDistinct.toDouble) + 1e-3,
        s"entropy $h exceeds ln(n_distinct)=${math.log(nDistinct.toDouble)}")
      if (nDistinct == 1) assert(math.abs(h) < 1e-9)
    }
  }

  test("dedup_incremental joins on the content hash, never pairwise") {
    val p = plan(NearDup.dedupIncremental(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"incremental dedup must be a hash join on the content hash:\n${p.take(1500)}")
    assert(p.contains("sha2"), "membership key must be the content hash")
  }

  test("dedup_chunk finds the aligned spans of exact-duplicate docs") {
    val reported = NearDup.dedupChunk(spark, sf).collect()
    reported.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_docs")) >= 2)
      assert(r.getString(r.fieldIndex("chunk")).nonEmpty)
    }
    // exact whole-doc duplicates with >= 20 tokens must surface at
    // least their first 20-token chunk
    val dupText = TextSim.dedupText(spark, sf)
      .filter(col("n_docs") >= 2).count()
    if (dupText > 0) {
      assert(reported.nonEmpty,
        "corpus has exact duplicate docs but chunk dedup found nothing")
    }
  }

  test("dedup_chunk is case-insensitive like its span-dedup companions") {
    // r17 review: a case-variant shared boilerplate span was silently
    // missed while scrub_spans (trim+lower) caught it — the two
    // span-level ops must agree on the normalization
    import spark.implicits._
    val span = (1 to 20).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, span.toUpperCase + " unique tail one two three"),
      (2L, span + " different ending four five six"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-chunk").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val found = NearDup.dedupChunk(spark, tmp).collect()
    assert(found.exists(_.getLong(1) == 2L),
      s"case-variant shared span missed: ${found.toSeq}")
  }
}
