package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus-scale evidence for `dedup_semantic` (SemDeDup): generates
  * SPARK_GRAFT_VECS synthetic vectors (default 100k, 20× the sf0.1
  * fixture), plants an exact duplicate of every 100th vector, runs
  * the cluster-blocked pass, and reports
  *
  *   - wall time of the blocked pass,
  *   - planted-duplicate recall (exact copies share an argmin cell by
  *     construction, so this must be 1.0 — the paper's regime),
  *   - false drops among non-planted vectors at the tight threshold,
  *   - the measured cell-size distribution and the EXACT pair-work
  *     reduction it implies (Σ n_c·(n_c−1)/2 vs M·(M−1)/2 — counted
  *     from the real cells, not estimated),
  *   - optionally (SPARK_GRAFT_SEMDEDUP_EXACT=1) the wall time of the
  *     exact all-pairs formulation on the same corpus, for a measured
  *     rather than analytic speedup.
  *
  * Everything is deterministic (synthetic vectors are pure functions
  * of vec_id, k-means is decimal-exact), so these numbers reproduce
  * bit-identically at any parallelism. Results land in SCALE.md.
  */
object SemDedupDemo {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_VECS", "100000").toLong
    val k = sys.env.getOrElse("SPARK_GRAFT_SEMDEDUP_K", "128").toInt
    val minSim = 0.95 // tight threshold: the dedup regime, not ANN recall
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.sources.SyntheticVecs.vectors(spark, n,
      parts = cpus.toInt * 2)
    val planted = base.filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + lit(n)).as("vec_id"), col("embedding"))
    val corpus = base.union(planted).persist()
    val m = corpus.count() // materialize before timing the pass

    val t0 = System.nanoTime()
    val out = graft.ops.NearDup
      .dedupSemantic(spark, corpus, k, iters = 2, minSim).persist()
    val kept = out.filter(col("kept")).count()
    val blockedSec = (System.nanoTime() - t0) / 1e9
    println(f"blocked pass       $blockedSec%8.1f s   " +
      f"($m vectors, $k cells, kept $kept)")

    val plantedTotal = n / 100
    val plantedDropped = out
      .filter(col("vec_id") >= n && !col("kept")).count()
    val falseDrops = m - kept - plantedDropped
    println(f"planted recall     ${plantedDropped.toDouble / plantedTotal}%8.2f" +
      f"     ($plantedDropped/$plantedTotal exact copies caught; " +
      f"$falseDrops non-planted drops at cos >= $minSim)")

    // pair work counts DISTINCT vectors per cell — the exact-dup
    // pre-collapse means only group representatives reach the pair
    // join, so this is what the join actually scans
    val cells = out.join(corpus, "vec_id")
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("embedding")).as("reps"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val pairWork = cells.map { case (_, r) => r * (r - 1) / 2 }.sum
    val exactWork = m * (m - 1) / 2
    println(f"cell sizes         min ${cells.map(_._1).min}, " +
      f"max ${cells.map(_._1).max}, mean ${cells.map(_._1).sum / cells.length}" +
      f" (distinct reps: min ${cells.map(_._2).min}, max ${cells.map(_._2).max})")
    println(f"pair work          $pairWork%,d in-cell (reps only) vs " +
      f"$exactWork%,d all-pairs = ${exactWork.toDouble / pairWork}%.1fx reduction")
    out.unpersist(blocking = false)

    if (sys.env.get("SPARK_GRAFT_SEMDEDUP_EXACT").contains("1")) {
      val t1 = System.nanoTime()
      val exactPairs = graft.ops.TextSim
        .dedupEmbed(spark, corpus, minSim).count()
      val exactSec = (System.nanoTime() - t1) / 1e9
      println(f"exact all-pairs    $exactSec%8.1f s   " +
        f"($exactPairs pairs; ${exactSec / blockedSec}%.1fx the blocked pass)")
    }
    spark.stop()
  }
}
