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
