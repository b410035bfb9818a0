package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe-fraction vs recall sweep for the materialized IVF index at
  * corpus scale: builds the index over SPARK_GRAFT_VECS synthetic
  * vectors (default 1M, 64-dim — 200× the sf0.1 fixture), computes
  * the exact brute-force top-k for a handful of query vectors, then
  * measures `ivfIndexProbe` recall@k at every probe fraction. The
  * numbers land in SCALE.md; AnnIndexSpec pins the floors. Everything
  * here is deterministic (synthetic vectors are pure functions of
  * vec_id, k-means is decimal-exact, ties break on vec_id), so the
  * recorded numbers reproduce bit-identically at any parallelism.
  */
object AnnRecallDemo {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_VECS", "1000000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = 10
    val nLists = sys.env.getOrElse("SPARK_GRAFT_NLISTS", "16").toInt
    val queries = Seq(0L, 1L, 2L, 3L, 4L)

    val vecs = graft.sources.SyntheticVecs.vectors(spark, n,
      parts = cpus.toInt * 2).persist()
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-1m")
      .toString
    val t0 = System.nanoTime()
    graft.ops.Ann.ivfIndexWrite(spark, vecs, idx, nLists, iters = 2)
    println(f"index_build        ${(System.nanoTime() - t0) / 1e9}%8.1f s" +
      f"   ($n vectors, $nLists lists)")

    val truth = queries.map { q =>
      q -> graft.ops.TextSim.simSearch(spark, vecs, q, k)
        .collect().map(_.getLong(0)).toSet
    }.toMap
    val qVecs = queries.map { q =>
      q -> vecs.filter(col("vec_id") === q)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
    }.toMap
    vecs.unpersist(blocking = false)

    for (nProbe <- Seq(1, 2, 4, 8, 16)) {
      val t1 = System.nanoTime()
      val recalls = queries.map { q =>
        val got = graft.ops.Ann.ivfIndexProbe(spark, idx, qVecs(q),
            k + 1, nProbe)
          .filter(col("vec_id") =!= q).limit(k)
          .collect().map(_.getLong(0)).toSet
        got.intersect(truth(q)).size.toDouble / truth(q).size
      }
      val mean = recalls.sum / recalls.length
      println(f"nProbe=$nProbe%2d (${nProbe * 100 / nLists}%3d%% scanned)" +
        f"  recall@$k = $mean%.2f  (per-query: " +
        recalls.map(r => f"$r%.1f").mkString(" ") +
        f")  ${(System.nanoTime() - t1) / 1e9}%6.1f s for ${queries.length} probes")
    }
    spark.stop()
  }
}
