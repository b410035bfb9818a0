package graft

import graft.ops.{Cluster, NearDup, TextSim}
import org.apache.spark.sql.functions._

/** dedup_semantic invariants: the cluster-blocked SemDeDup pass must
  * be EXACT within a cell (precision 1 vs the exact cosine pairs),
  * its recall loss must be exactly the cross-cell pairs (no silent
  * extra loss), its drop policy must match the keep-lowest-id greedy,
  * and the whole pass must be bit-deterministic (no RNG anywhere:
  * k-means init is the k lowest ids, means are decimal-exact).
  */
class SemanticDedupSpec extends SparkSpec {

  private val minSim = 0.4
  private lazy val result = NearDup.dedupSemantic(spark, sf).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
  // the exact all-pairs formulation this operator approximates
  private lazy val exactPairs = TextSim.dedupEmbed(spark, sf, minSim)
    .select("vec_a", "vec_b").collect()
    .map(r => (r.getLong(0), r.getLong(1))).toSet
  private lazy val cellOf = result.map(r => r._1 -> r._2).toMap

  test("covers every vector exactly once") {
    val n = ops.Sources.table(spark, sf, "embeddings").count()
    assert(result.length == n)
    assert(result.map(_._1).distinct.length == n)
  }

  test("precision 1: every dropped vector has an exact in-cell witness") {
    val droppedIds = result.filter(!_._3).map(_._1).toSet
    assert(droppedIds.nonEmpty,
      "fixture should produce drops at minSim=0.4 — dedup_embed does")
    droppedIds.foreach { id =>
      val witnesses = exactPairs.filter { case (a, b) =>
        b == id && cellOf(a) == cellOf(b) }
      assert(witnesses.nonEmpty,
        s"vector $id dropped without a smaller-id in-cell exact pair")
    }
  }

  test("recall loss is exactly the cross-cell pairs, nothing more") {
    // every exact pair whose endpoints share a cell MUST drop its
    // larger id; pairs split across cells are the (measured) loss
    val droppedIds = result.filter(!_._3).map(_._1).toSet
    val inCell = exactPairs.filter { case (a, b) => cellOf(a) == cellOf(b) }
    inCell.foreach { case (a, b) =>
      assert(droppedIds.contains(b),
        s"in-cell exact pair ($a,$b) not deduped — blocked pass lost it")
    }
    val recall =
      if (exactPairs.isEmpty) 1.0 else inCell.size.toDouble / exactPairs.size
    info(f"recall vs exact all-pairs on fixture: $recall%.3f " +
      s"(${inCell.size}/${exactPairs.size} pairs in-cell)")
    assert(recall > 0.0, "at least some exact pairs must be in-cell")
  }

  test("kept vectors have no smaller-id in-cell neighbor above threshold") {
    val keptIds = result.filter(_._3).map(_._1).toSet
    exactPairs.foreach { case (a, b) =>
      if (cellOf(a) == cellOf(b))
        assert(!keptIds.contains(b), s"($a,$b) in-cell but $b kept")
    }
  }

  test("deterministic: two independent runs agree bit for bit") {
    val again = NearDup.dedupSemantic(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(result.toSeq == again.toSeq)
  }

  test("planted exact duplicates are always caught (the paper's regime)") {
    // the fixture's 0.288 in-cell recall reflects near-uniform
    // synthetic vectors at a LOOSE threshold; SemDeDup's claim is for
    // near-identical vectors, which share an argmin cell by
    // construction — plant copies and require recall 1 on them
    val emb = ops.Sources.table(spark, sf, "embeddings")
      .select("vec_id", "embedding")
    val maxId = emb.agg(max("vec_id")).head().getLong(0)
    val planted = emb.orderBy("vec_id").limit(10)
      .select((col("vec_id") + lit(maxId + 1L)).as("vec_id"),
        col("embedding"))
    val out = NearDup.dedupSemantic(spark, emb.union(planted), 8, 3, minSim)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    (1 to 10).foreach { i =>
      val id = out.keys.filter(_ > maxId).toSeq.sorted.apply(i - 1)
      assert(!out(id), s"planted exact duplicate $id survived")
    }
  }

  test("cells agree with the trained assignment (blocking is honest)") {
    val emb = ops.Sources.table(spark, sf, "embeddings")
    val cents = Cluster.kmeansCentroids(spark, emb, 8, 3)
    val direct = Cluster.assignWith(spark, emb, cents)
      .select("vec_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(cellOf == direct)
  }
}
