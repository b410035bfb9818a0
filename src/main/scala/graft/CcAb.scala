package graft

import org.apache.spark.sql.SparkSession

/** Focused CC bench at corpus scale — built for the r18 VERDICT ask #5
  * A/B (session-isolated child conf vs the legacy session-global
  * override) and kept as the standing connected-components scale
  * fixture. The candidate pair set is generated ONCE from the
  * graft-docs connector corpus and written to parquet so every run
  * times exactly [[graft.ops.NearDup.connectedComponents]] — not the
  * ngram candidate generation — over identical bytes.
  *
  * A/B record (1M docs, ~49k-node pair graph, interleaved min-of-3
  * per arm, 3 rounds): isolated 1.14/1.04/1.13 s vs legacy
  * conf-mutation 1.15/1.05/1.05 s — parity, so the legacy spelling
  * was deleted (see [[graft.ops.NearDup]] `ccOnEdges` scaladoc for
  * the three fixes that got the isolation to parity).
  *
  *   SPARK_GRAFT_DOCS=1000000 sbt "runMain graft.CcAb"
  */
object CcAb {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_DOCS", "1000000").toLong
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    // fixture path carries EVERY parameter that shapes the pair set
    // (ngram n/band/threshold, corpus seed) — a doc-count-only key let
    // a stale cache survive parameter changes and silently A/B over
    // different bytes than the code under test produces (r20 ADVICE)
    val (ngramN, ngramBands, ngramThresh, corpusSeed) = (3, 20, 0.5, 42)
    val pairsPath = sys.env.getOrElse("SPARK_GRAFT_CC_PAIRS",
      s"/tmp/graft_cc_pairs_${n}_n${ngramN}_b${ngramBands}" +
        s"_t${ngramThresh}_s$corpusSeed")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(pairsPath))) {
      val corpus = spark.read.format("graft-docs")
        .option("numDocs", n).option("numPartitions", cpus.toInt * 2)
        .option("seed", corpusSeed).load()
      graft.ops.NearDup.dedupNgram(spark, corpus, ngramN, ngramBands,
          ngramThresh)
        .select("doc_a", "doc_b")
        .write.mode("overwrite").parquet(pairsPath)
      println(s"pairs written to $pairsPath")
    }
    val pairs = spark.read.parquet(pairsPath)
    // r20 (r19 VERDICT ask #8): SPARK_GRAFT_CC_THREADS=T > 1 fires T
    // connectedComponents calls CONCURRENTLY on one parent session per
    // run — measuring what the cached-child monitor actually costs two
    // simultaneous CC consumers (the loop holds the child session's
    // monitor, so concurrent calls serialize their loop phases).
    val threads = sys.env.getOrElse("SPARK_GRAFT_CC_THREADS", "1").toInt
    val arm =
      if (threads == 1) "session_isolated" else s"concurrent_x$threads"
    val times = (1 to runs).map { i =>
      val t0 = System.nanoTime()
      val rows = if (threads == 1)
        graft.ops.NearDup.connectedComponents(pairs).count()
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
        // shutdown in finally: if Await.result throws, the non-daemon
        // pool would otherwise leak and keep the probe JVM alive
        try {
          implicit val ec: scala.concurrent.ExecutionContext =
            scala.concurrent.ExecutionContext.fromExecutor(pool)
          val fs = (1 to threads).map(_ => scala.concurrent.Future(
            graft.ops.NearDup.connectedComponents(pairs).count()))
          val total = fs.map(scala.concurrent.Await.result(_,
            scala.concurrent.duration.Duration.Inf)).sum
          total / threads
        } finally pool.shutdown()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"cc_ab arm=$arm run=$i sec=$sec%.2f rows=$rows")
      sec
    }
    println(f"cc_ab RESULT arm=$arm docs=$n min=${times.min}%.2f " +
      s"samples=${times.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
