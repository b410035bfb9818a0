package graft

import graft.ops.{NearDup, TextSim}
import org.apache.spark.sql.functions._

/** dedup_cluster and text_tfidf invariants: clustering must be a sound
  * partition of the candidate graph (edge endpoints co-clustered,
  * canonical id = min member, fixpoint stable); tfidf must respect the
  * per-doc quota and score semantics.
  */
class ClusterTfidfSpec extends SparkSpec {

  private lazy val clusters = NearDup.dedupCluster(spark, sf)
  private lazy val pairs = NearDup.dedupNgram(spark, sf)

  test("every candidate pair's endpoints land in the same cluster") {
    val byDoc = clusters.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val es = pairs.select("doc_a", "doc_b").collect()
    assert(es.nonEmpty, "need candidate pairs for this test to bite")
    es.foreach { r =>
      assert(byDoc(r.getLong(0)) == byDoc(r.getLong(1)),
        s"pair ${r.getLong(0)},${r.getLong(1)} split across clusters")
    }
  }

  test("cluster_id is the minimum member of its cluster") {
    val rows = clusters.collect().map(r => (r.getLong(0), r.getLong(1)))
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid,
        s"cluster $cid canonical id is not its min member")
    }
    // every clustered doc appears exactly once
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("clustering a pair-free corpus returns empty without error") {
    import spark.implicits._
    // texts with zero shared shingles → no candidate pairs → no NPE
    // from the empty-label convergence check
    val dir = java.nio.file.Files.createTempDirectory("graft-nopairs").toString
    (0L until 10L).map(i =>
        (i, (0 until 20).map(j => s"tok${i}_$j").mkString(" "),
          "en", s"src$i", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(NearDup.dedupCluster(spark, dir).count() == 0)
  }

  test("connectedComponents resolves crafted graphs exactly") {
    import spark.implicits._
    // two components (a triangle and a 5-node chain) + edge order noise
    val edges = Seq(
      (10L, 11L), (11L, 12L), (12L, 10L),            // triangle, min 10
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L) // chain, min 20
    ).toDF("doc_a", "doc_b")
    val got = NearDup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L, 24L -> 20L))
    // reversed edge orientation must give the identical labeling
    val flipped = NearDup.connectedComponents(
      edges.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flipped == got)
  }

  test("chain deeper than maxIters falls back to star and still resolves") {
    import spark.implicits._
    // diameter 40 ≫ maxIters=3: label propagation alone would stop
    // with interior nodes still carrying non-minimal labels; the
    // large-star/small-star fallback must resolve the component
    // exactly regardless of diameter
    val longChain = (0L until 40L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = NearDup.connectedComponents(longChain, maxIters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 40L).map(_ -> 0L).toMap)
  }

  test("connectedComponentsStar matches label propagation on crafted graphs") {
    import spark.implicits._
    val edges = Seq(
      (10L, 11L), (11L, 12L), (12L, 10L),             // triangle
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L), // chain
      (5L, 30L)                                       // cross-magnitude pair
    ).toDF("doc_a", "doc_b")
    val star = NearDup.connectedComponentsStar(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = NearDup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop)
    assert(star(24L) == 20L && star(30L) == 5L && star(10L) == 10L)
    // determinism under reversed orientation
    val flipped = NearDup.connectedComponentsStar(
      edges.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flipped == star)
  }

  test("self-loop-only nodes keep identical coverage on both CC paths") {
    import spark.implicits._
    // node 99 appears ONLY as a self-pair; both algorithms must emit
    // it as its own root — before the fix the star path's self-loop
    // filter deleted it, so node coverage depended on which code path
    // ran (label propagation vs the deep-graph fallback)
    val edges = Seq((1L, 2L), (2L, 3L), (99L, 99L)).toDF("doc_a", "doc_b")
    val prop = NearDup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = NearDup.connectedComponentsStar(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prop == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 99L -> 99L))
    assert(star == prop)
    // a self-pair on a node that ALSO has proper edges must not
    // duplicate its row
    val mixed = Seq((1L, 2L), (1L, 1L)).toDF("doc_a", "doc_b")
    val rows = NearDup.connectedComponentsStar(mixed).collect()
    assert(rows.length == 2)
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L))
  }

  test("clustering is deterministic across runs") {
    // content-level: the query surface carries no final sort (the
    // correctness gate row-sorts before hashing), so shuffled row
    // order may differ run to run while the row SET must not
    val a = clusters.collect().map(_.toString).sorted
    val b = NearDup.dedupCluster(spark, sf).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("text_logprob: rarer vocabulary scores higher than common") {
    val df = TextSim.textLogprob(spark, sf)
    assert(df.count() > 0)
    assert(df.filter(col("avg_nll") <= 0).count() == 0,
      "negative log-prob is strictly positive for a finite corpus")
    // determinism: decimal-summed means are identical across runs
    // (row order canonicalized — no final sort on the query surface)
    assert(df.collect().map(_.toString).sorted.sameElements(
      TextSim.textLogprob(spark, sf).collect().map(_.toString).sorted))
  }

  test("text_tfidf: at most k terms per doc, positive scores, ordered") {
    val df = TextSim.textTfidf(spark, sf, k = 3)
    val perDoc = df.groupBy("doc_id").count().collect()
    assert(perDoc.forall(_.getLong(1) <= 3))
    assert(df.filter(col("tfidf") < 0).count() == 0,
      "tf-idf of in-corpus terms is never negative")
    // a term present in EVERY doc has idf = ln(1) = 0
    val n = graft.ops.Sources.table(spark, sf, "documents").count()
    val everywhere = df.filter(col("tfidf") === 0.0)
    // such terms may be selected only when a doc has < 3 distinctive terms
    assert(everywhere.count() < df.count(),
      "scores must not all collapse to zero")
    assert(n > 0)
  }
}
