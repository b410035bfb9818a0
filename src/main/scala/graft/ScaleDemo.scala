package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus-scale demonstration over the graft-docs connector: runs the
  * near-dup / text surface on a generated corpus far beyond the test
  * fixtures and prints per-stage wall-clock. SPARK_GRAFT_DOCS sets the
  * corpus size (default 200k docs).
  */
object ScaleDemo {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_DOCS", "200000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = spark.read.format("graft-docs")
      .option("numDocs", n).option("numPartitions", cpus.toInt * 2)
      .option("seed", 42).load()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$name%-18s ${(System.nanoTime() - t0) / 1e9}%8.1f s   ($rows rows)")
    }
    time("corpus_stats") { graft.ops.TextSim.corpusStats(corpus).count() }
    time("dedup_text") {
      corpus.groupBy(sha2(trim(lower(col("text"))), 256).as("h"))
        .count().filter(col("count") > 1).count()
    }
    time("minhash_sigs") {
      graft.ops.NearDup.minhashSignatures(spark, corpus, 64).count()
    }
    time("dedup_minhash") {
      graft.ops.NearDup.dedupMinhash(spark, corpus, 64, 16, 0.4).count()
    }
    time("cluster_neardups") {
      graft.ops.NearDup.connectedComponents(
        graft.ops.NearDup.dedupNgram(spark, corpus, 3, 20, 0.5)
          .select("doc_a", "doc_b")).count()
    }
    time("scrub_spans") {
      graft.ops.NearDup.scrubSpans(spark, corpus, 8)
        .filter(col("n_removed") > 0).count()
    }
    time("doc_winnow_portable") {
      // aggregate OVER the kernel outputs: a bare count() would prune
      // the kernel column and time only the length filter (the r12
      // count-forcing lesson)
      graft.ops.TextSim.docWinnowPortable(corpus)
        .agg(sum(col("n_fingerprints"))).head().getLong(0)
    }
    // similarity surface over generated 64-dim vectors (pure function
    // of vec_id — same replay-determinism rule as the docs connector)
    val vecs = graft.sources.SyntheticVecs.vectors(spark, n,
      parts = cpus.toInt * 2)
    time("sim_search_brute") {
      graft.ops.TextSim.simSearch(spark, vecs, 0L, 10).count()
    }
    time("sim_ann_lsh") {
      graft.ops.Ann.simAnnLsh(spark, vecs, 0L, 10, 8, 64).count()
    }
    time("sim_ann_ivf") {
      graft.ops.Ann.simAnnIvf(spark, vecs, 0L, 10, 16, 4).count()
    }
    // the stored-codes path: pay indexing once, then probes read only
    // nProbe/nLists of the corpus (partition pruning on list_id)
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    time("ivf_index_build") {
      graft.ops.Ann.ivfIndexWrite(spark, vecs, idx, 16, 2); 1L
    }
    val qv = vecs.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    time("ivf_index_probe") {
      graft.ops.Ann.ivfIndexProbe(spark, idx, qv, 10, 4).count()
    }
    // the 2026 capstone, end to end: exact dedup -> near-dup cluster
    // survivors -> decontaminate -> quality gates -> split -> scrub ->
    // pack -> parquet
    val cur = java.nio.file.Files.createTempDirectory("graft-cur").toString
    time("curation_pipeline") {
      Pipelines.curationOver(spark, corpus, None, cur).trainDocs
    }
    spark.stop()
  }
}
