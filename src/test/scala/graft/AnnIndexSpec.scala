package graft

import graft.ops.{Ann, Sources, TextSim}
import org.apache.spark.sql.functions._

/** Materialized IVF index: probe-all equals brute force, partial
  * probes prune partitions at planning time, and the probed subset is
  * internally exact.
  */
class AnnIndexSpec extends SparkSpec {

  private lazy val indexDir = {
    val d = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Ann.ivfIndexWrite(spark,
      Sources.table(spark, sf, "embeddings"), d, nLists = 8, iters = 2)
    d
  }

  private lazy val queryVec: Seq[Double] =
    Sources.table(spark, sf, "embeddings")
      .filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)

  test("index layout: one partition directory per list + centroids") {
    val dirs = new java.io.File(s"$indexDir/lists").listFiles()
      .filter(_.getName.startsWith("list_id=")).map(_.getName).sorted
    assert(dirs.nonEmpty && dirs.length <= 8, s"got ${dirs.toSeq}")
    assert(spark.read.parquet(s"$indexDir/centroids").count() == 8)
  }

  test("probe-all equals the brute-force top-k") {
    val probeAll = Ann.ivfIndexProbe(spark, indexDir, queryVec,
        k = 10, nProbe = 8)
      .filter(col("vec_id") =!= 0L) // simSearch excludes the query itself
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val brute = TextSim.simSearch(spark, sf, 0L, 20).limit(probeAll.length)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(probeAll.toSeq == brute.toSeq.take(probeAll.length),
      s"probe-all diverged from brute force:\n${probeAll.toSeq}\nvs\n${brute.toSeq}")
  }

  test("IVF recall@10 at corpus scale: 1M vectors, probe-fraction sweep") {
    // 200× the sf0.1 fixture — the scale where IVF exists at all.
    // Deterministic end to end (synthetic vectors are pure functions
    // of vec_id, k-means decimal-exact, ties break on vec_id), so
    // these recalls are the exact numbers recorded in SCALE.md by
    // AnnRecallDemo, independent of parallelism.
    val n = 1000000L
    val k = 10
    val queries = Seq(0L, 1L, 2L)
    val vecs = graft.sources.SyntheticVecs.vectors(spark, n).persist()
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-1m")
      .toString
    Ann.ivfIndexWrite(spark, vecs, dir, nLists = 16, iters = 2)
    val truth = queries.map { q =>
      q -> TextSim.simSearch(spark, vecs, q, k)
        .collect().map(_.getLong(0)).toSet
    }.toMap
    val qVecs = queries.map { q =>
      q -> vecs.filter(col("vec_id") === q)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
    }.toMap
    vecs.unpersist(blocking = false)
    def recall(nProbe: Int): Double = {
      val rs = queries.map { q =>
        val got = Ann.ivfIndexProbe(spark, dir, qVecs(q), k + 1, nProbe)
          .filter(col("vec_id") =!= q).limit(k)
          .collect().map(_.getLong(0)).toSet
        got.intersect(truth(q)).size.toDouble / truth(q).size
      }
      rs.sum / rs.length
    }
    val byProbe = Seq(2, 8, 16).map(p => p -> recall(p))
    info(byProbe.map { case (p, r) => f"nProbe=$p: $r%.2f" }
      .mkString("  "))
    val r = byProbe.toMap
    // probe-all is brute force — exact by construction
    assert(r(16) == 1.0, s"probe-all must be exact, got ${r(16)}")
    // recall is monotone in nProbe: candidates(p1) ⊆ candidates(p2)
    // for p1 < p2, and any true top-k member among the candidates
    // necessarily ranks in the candidate top-k
    assert(byProbe.map(_._2).sliding(2).forall(w => w(0) <= w(1) + 1e-9),
      s"recall not monotone in probe fraction: $byProbe")
    // floors below the AnnRecallDemo-measured values (SCALE.md: 1.00
    // at every probe fraction on this corpus — uniform high-dim
    // vectors concentrate a query's true neighbors into its own
    // Voronoi cell). The floors are regression guards: a broken
    // centroid ranking or partition filter collapses recall to ~p/16
    assert(r(8) >= 0.80, s"recall@10 at nProbe=8/16 fell: ${r(8)}")
    assert(r(2) >= 0.50, s"recall@10 at nProbe=2/16 fell: ${r(2)}")
  }

  test("a partial probe prunes the unprobed lists' partitions") {
    val df = Ann.ivfIndexProbe(spark, indexDir, queryVec, k = 5, nProbe = 2)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("list_id"),
      s"probe must prune partitions:\n${p.take(1500)}")
    val rows = df.collect()
    assert(rows.length == 5)
    val sims = rows.map(_.getDouble(1))
    assert(sims.sameElements(sims.sorted.reverse), "not sorted desc")
  }
}
