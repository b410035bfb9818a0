package graft

import graft.ops.{Sinks, Sources, TimeOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's five pipeline generations, each as one composed
  * engine call — the drop-in replacements a user of
  * `ironey/ETL-Jobs` would switch to. Every era reuses the operator
  * modules; nothing here is new logic, only composition:
  *
  *  - 2016 (`src/etl_2016.py`): CSV → uppercase/cast → load
  *  - 2018 (`src/etl_2018.py:14-36,50-63`): + validate-and-split with
  *    reject reasons, processing timestamp
  *  - 2020 (`src/etl_2020.py:86-106,147-158`): + multi-file glob,
  *    union, run metrics (Spark's task model replaces the hand-rolled
  *    process pool)
  *  - 2022 (`src/etl_2022.py:46-144,176-188`): + dedup, imputation,
  *    quality report, threshold alerts, batch id
  *  - 2025 (`src/etl_2025.py:233-263`): the same transform as a
  *    Structured Streaming micro-batch loop with archive
  */
object Pipelines {

  /** The reference's `users` schema (name, age, email). */
  val usersSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("age", StringType),    // raw CSV: validated, then cast
    StructField("email", StringType)))

  /** 2016/2018-era validation predicate (etl_2018.py:14-36 +
    * etl_2020.py:47-49): required fields, non-blank name, parseable
    * age in [0, 150], email contains '@'.
    */
  /** ANSI-safe age parse: malformed strings become null, mirroring
    * the reference's try/except int() (etl_2018.py:26-31) — a plain
    * cast would THROW under Spark 4's ANSI mode.
    */
  private val ageInt: Column = expr("try_cast(age AS INT)")

  val validUser: Column =
    col("name").isNotNull && trim(col("name")) =!= "" &&
      col("age").isNotNull && ageInt.isNotNull &&
      ageInt.between(0, 150) &&
      col("email").isNotNull && col("email").contains("@")

  /** Reject reason, first failing check (etl_2018.py:34-36). */
  val userRejectReason: Column =
    when(col("name").isNull || trim(col("name")) === "", "invalid_name")
      .when(col("age").isNull || ageInt.isNull ||
        !ageInt.between(0, 150), "invalid_age")
      .otherwise("invalid_email")

  /** The per-row transform every era applies (etl_2016.py:12-18,
    * etl_2022.py:186-188): uppercase name, int age, processing
    * timestamp.
    */
  def transformUsers(df: DataFrame): DataFrame =
    df.select(
      upper(col("name")).as("name"),
      expr("try_cast(age AS INT)").as("age"),
      col("email"),
      current_timestamp().as("processed_at"))

  /** 2016: extract one CSV, transform, load. Returns rows loaded. */
  def basic2016(spark: SparkSession, inCsv: String, outDir: String): Long = {
    val out = transformUsers(Sources.csv(spark, inCsv, usersSchema))
    Sinks.parquet(out).save(outDir)
    spark.read.parquet(outDir).count()
  }

  case class ValidatedLoad(loaded: Long, rejected: Long)

  /** 2018: validate-and-split; valid rows load, rejects land in a
    * side output with reasons (one cached pass, both branches).
    */
  def validated2018(spark: SparkSession, inCsv: String, outDir: String,
                    rejectDir: String): ValidatedLoad = {
    val raw = Sources.csv(spark, inCsv, usersSchema).cache()
    val good = transformUsers(raw.filter(validUser))
    val bad = raw.filter(!validUser)
      .withColumn("reason", userRejectReason)
    Sinks.parquet(good).save(outDir)
    Sinks.parquet(bad).save(rejectDir)
    // both branches are materialized — release the shared scan cache
    raw.unpersist(blocking = false)
    ValidatedLoad(spark.read.parquet(outDir).count(),
      spark.read.parquet(rejectDir).count())
  }

  /** 2020: multi-file glob (keep `input_*`, skip prior output),
    * implicit union, validated transform, metrics via observe() —
    * the process-pool parallelism of the reference is Spark's own
    * task model.
    */
  def parallel2020(spark: SparkSession, inDir: String,
                   outDir: String): Map[String, Any] = {
    val raw = Sources.csvGlob(spark, inDir, "input_*.csv", usersSchema)
    val (observed, obs) = Quality.observed(raw, validUser,
      when(validUser, 1.0).otherwise(0.0))
    val good = transformUsers(observed.filter(validUser))
    Sinks.parquet(good).save(outDir)
    obs.get
  }

  case class QualityRun(loaded: Long, report: Quality.QualityReport,
                        alerts: Seq[String])

  /** 2022: dedup → impute → quality report → alerts → load with a
    * data-derived batch id (deterministic analog of
    * `strftime('%Y%m%d_%H%M%S')`, etl_2022.py:217).
    */
  def quality2022(spark: SparkSession, inCsv: String,
                  outDir: String): QualityRun = {
    val raw = Sources.csv(spark, inCsv, usersSchema).cache()
    // report over the PARSED age (percentile would ANSI-throw on a
    // malformed string); try_cast is idempotent on the int column
    val typed = raw.withColumn("age", ageInt)
    val report = Quality.report(typed, validUser,
      dupKeys = Seq("name", "email"), outlierCol = "age")
    val alerts = Quality.alerts(report)
    val meanAge = raw.filter(validUser)
      .agg(avg(expr("try_cast(age AS INT)"))).collect()(0)
    val fillAge = if (meanAge.isNullAt(0)) 0 else meanAge.getDouble(0).toInt
    val cleaned = transformUsers(
      raw.filter(validUser)
        .dropDuplicates("name", "email")
        .na.fill(Map("name" -> "UNKNOWN", "email" -> "unknown@example.com")))
      .na.fill(Map("age" -> fillAge))
      .withColumn("quality_score", lit(report.validRate))
      .withColumn("batch_id", date_format(current_timestamp(),
        "yyyyMMdd_HHmmss"))
    Sinks.parquet(cleaned).save(outDir)
    // report, alerts, and the load are all materialized by now
    raw.unpersist(blocking = false)
    QualityRun(spark.read.parquet(outDir).count(), report, alerts)
  }

  /** 2025: the same validated transform as a streaming micro-batch
    * loop — file source (archive on consume) → foreachBatch →
    * idempotent parquet per batch. Caller starts/stops the query.
    */
  def streaming2025(spark: SparkSession, inDir: String, outDir: String,
                    checkpoint: String, archiveDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    streaming2025(spark, inDir, outDir, checkpoint, archiveDir, None)

  /** [[streaming2025]] with a `maxFilesPerTrigger` cap — see the
    * measured sizing guidance on [[graft.ops.TimeOps.fileStream]]
    * (per-batch fixed cost ~1.3–1.7 s on a real drop directory, so
    * None/large caps amortize best; small caps are a latency choice).
    */
  def streaming2025(spark: SparkSession, inDir: String, outDir: String,
                    checkpoint: String, archiveDir: String,
                    maxFilesPerTrigger: Option[Int])
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val stream = TimeOps.fileStream(spark, inDir, usersSchema,
      archiveDir = Some(archiveDir),
      maxFilesPerTrigger = maxFilesPerTrigger)
    TimeOps.foreachBatchSink(stream, outDir, checkpoint)(batch =>
      transformUsers(batch.filter(validUser)))
  }

  case class CurationRun(input: Long, afterExactDedup: Long,
                         afterNearDedup: Long, afterDecontamination: Long,
                         afterQuality: Long, trainDocs: Long, bins: Long)

  /** 2026 — the era after the reference: an LLM-training-data curation
    * pipeline over a document corpus, composed entirely from the
    * engine's operators. Exact dedup (content hash, keep min doc) →
    * near-dup survivor selection (cluster canonicals from
    * [[graft.ops.NearDup.dedupCluster]]) → eval-set decontamination
    * ([[graft.ops.NearDup.decontaminate]]) → quality gate (rule
    * thresholds [[graft.ops.TextSim.textQuality]] + repetition rules +
    * token-entropy floor) → deterministic train split
    * (md5 nibble) → PII scrub → fixed-token-budget sequence packing →
    * parquet load. Every stage is a hash-keyed filter/join, so the
    * whole pipeline is one lazy plan per count plus the final write —
    * no driver-side materialization, same shapes at 100 TB.
    *
    * `clusterCap` optionally adds embedding-cluster balancing after
    * the quality gate: documents are k-means-clustered in embedding
    * space ([[graft.ops.Cluster.kmeansAssign]]) and each cluster keeps
    * at most `cap` docs (lowest ids — deterministic), flattening
    * topic-density skew the way curation recipes balance web-crawl
    * duplication at the semantic level. Docs without a vector pass
    * through uncapped.
    *
    * [[curationOver]] adds two more options: `survivorPolicy =
    * "quality"` keeps each near-dup cluster's LONGEST member instead
    * of the min-id canonical, and `spanScrub = Some(n)` runs the
    * corpus exact-substring scrub over the train split (duplicated
    * n-token windows keep their first occurrence only) before PII
    * scrub and packing.
    */
  def curation2026(spark: SparkSession, sfDir: String, outDir: String,
                   budget: Long = 256L,
                   clusterCap: Option[Int] = None): CurationRun =
    curationOver(spark, Sources.table(spark, sfDir, "documents"),
      clusterCap.map(_ => Sources.table(spark, sfDir, "embeddings")),
      outDir, budget, clusterCap)

  /** [[curation2026]] over ANY `(doc_id, text, source)` corpus — the
    * generalized capstone, so the same pipeline runs on the fixtures,
    * on the `graft-docs` connector at millions of documents, or on a
    * user's crawl. `embeddings` is required only when `clusterCap`
    * asks for semantic balancing.
    */
  def curationOver(spark: SparkSession, docs: DataFrame,
                   embeddings: Option[DataFrame], outDir: String,
                   budget: Long = 256L,
                   clusterCap: Option[Int] = None,
                   survivorPolicy: String = "min-id",
                   spanScrub: Option[Int] = None): CurationRun = {
    import graft.ops.{Cluster, NearDup, Sampling, TextSim}
    require(survivorPolicy == "min-id" || survivorPolicy == "quality",
      s"survivorPolicy must be 'min-id' or 'quality', got '$survivorPolicy'")
    // Each stage's decision is an id-only relation, PERSISTED before
    // use: the run both packs the survivors (one lineage) and reports
    // per-stage counts (five more lineages through the same stages),
    // and without the persist every count re-executes the expensive
    // upstream work — near-dup clustering and decontamination ran ~4×
    // each, tripling the 1M-doc wall-clock. Persisting only the
    // doc_id sets keeps the cached footprint at ~8 bytes/doc/stage
    // (the text never caches), which is the same per-stage checkpoint
    // discipline a 100 TB run needs anyway. Unpersisted on exit.
    import org.apache.spark.storage.StorageLevel
    // 1. exact dedup: canonical = min doc id per normalized content hash
    val exactKeep = docs
      .select(col("doc_id"), sha2(trim(lower(col("text"))), 256).as("h"))
      .groupBy("h").agg(min("doc_id").as("doc_id")).select("doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val d1 = docs.join(exactKeep, "doc_id")
    // 2. near-dup survivors: every cluster member except the survivor
    //    drops. Policies: "min-id" keeps the component canonical
    //    (cluster_id == min doc_id, free from the CC output);
    //    "quality" keeps the LONGEST member (text length, min-id
    //    tie-break) via the packed-decimal argmax — the
    //    NearDup.dedupSurvivor policy, running on any corpus (no
    //    n_chars column needed)
    val cc = NearDup.connectedComponents(
      NearDup.dedupNgram(spark, docs, 3, 20, 0.2).select("doc_a", "doc_b"))
    // branch-local persists that must live until the output is
    // materialized (released with the others in the finally)
    val branchPersists = scala.collection.mutable.ArrayBuffer
      .empty[DataFrame]
    val nearDrop = (survivorPolicy match {
      case "min-id" =>
        cc.filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
      case _ =>
        // withLen feeds BOTH sides of the survivor self-join (once
        // directly, once via surv): without a persist the full n-gram
        // pairing + iterative CC lineage would compute twice inside
        // the single nearDrop action — the exact recompute cost the
        // surrounding stages persist to avoid. (cluster_id, doc_id,
        // packed) is three longs/row, same ~bytes-per-doc budget.
        val withLen = cc
          .join(docs.select(col("doc_id"), length(col("text")).as("len")),
            "doc_id")
          .select(col("cluster_id"), col("doc_id"),
            graft.ops.Num.packDesc(
              col("len").cast(org.apache.spark.sql.types.DecimalType(18, 0)),
              col("doc_id"), "curation survivorPolicy=quality")
              .as("packed"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        branchPersists += withLen
        val surv = withLen.groupBy("cluster_id")
          .agg(max(col("packed")).as("pmx"))
        withLen.join(surv, "cluster_id")
          .filter(col("packed") =!= col("pmx")).select("doc_id")
    }).persist(StorageLevel.MEMORY_AND_DISK)
    val d2 = d1.join(nearDrop, Seq("doc_id"), "left_anti")
    // 3. decontamination: train docs sharing distinctive grams with the
    //    held-out split (same md5 rule as the declared query)
    val isEval = Sampling.hexNibble(col("doc_id")) >= "e"
    val contaminated = NearDup.decontaminateAgainst(spark,
        docs.filter(!isEval).select("doc_id", "text"),
        docs.filter(isEval).select("doc_id", "text"))
      .select("doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val d3 = d2.join(contaminated, Seq("doc_id"), "left_anti")
    // 4. quality gate: heuristic thresholds + Gopher repetition rules
    //    (looping/boilerplate text) + an information-density floor
    //    (near-zero token entropy = degenerate text both rule sets miss)
    val qualityOk = TextSim.textQuality(docs)
      .filter(col("quality_ok")).select("doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val notRepetitive = TextSim.textRepetition(docs)
      .filter(!col("repetitive")).select("doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val denseEnough = TextSim.textEntropy(docs)
      .filter(col("entropy") > 1.0).select("doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val d4 = d3.join(qualityOk, "doc_id").join(notRepetitive, "doc_id")
      .join(denseEnough, "doc_id")
    // 4b. optional semantic balance: cap each embedding cluster
    val d4b = clusterCap match {
      case None => d4
      case Some(cap) =>
        val emb = embeddings.getOrElse(throw new IllegalArgumentException(
          "clusterCap requires an embeddings relation"))
        val assign = Cluster.kmeansAssign(spark, emb, k = 8, iters = 3)
          .select(col("vec_id").as("doc_id"), col("cluster_id"))
        val byCluster = org.apache.spark.sql.expressions.Window
          .partitionBy("cluster_id").orderBy("doc_id")
        val overCap = d4.select("doc_id").join(assign, "doc_id")
          .withColumn("rn", row_number().over(byCluster))
          .filter(col("rn") > cap).select("doc_id")
        d4.join(overCap, Seq("doc_id"), "left_anti")
    }
    // 5. train split (eval nibbles are >= 'c'; see Sampling.sampleSplit)
    val train0 = d4b.filter(Sampling.hexNibble(col("doc_id")) < "c")
    // 5b. optional exact-substring scrub WITHIN the train split:
    //     duplicated spanScrub-token windows keep their first train
    //     occurrence only (NearDup.scrubSpansText). Text comes back
    //     whitespace/case-normalized; a doc whose every token sat
    //     under duplicate spans scrubs to empty and drops here
    val train = spanScrub match {
      case None => train0
      case Some(nSpan) =>
        train0.drop("text")
          .join(NearDup.scrubSpansText(spark,
              train0.select("doc_id", "text"), nSpan)
            .select(col("doc_id"), col("scrubbed_text").as("text")),
            "doc_id")
          .filter(length(trim(col("text"))) > 0)
    }
    // 6. PII scrub + 7. sequence packing within each source shard
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val packed = train
      .withColumn("text", regexp_replace(col("text"), "[0-9]{4,}", "<ID>"))
      .withColumn("n_tokens",
        size(split(trim(col("text")), "\\s+")).cast("long"))
      .withColumn("bin_id", floor(
        (sum(col("n_tokens")).over(w) - col("n_tokens")) / budget.toDouble))
    try {
      Sinks.parquet(packed).save(outDir)
      val out = spark.read.parquet(outDir)
      CurationRun(docs.count(), d1.count(), d2.count(), d3.count(),
        d4.count(), out.count(),
        out.select("source", "bin_id").distinct().count())
    } finally
      (Seq(exactKeep, nearDrop, contaminated, qualityOk, notRepetitive,
        denseEnough) ++ branchPersists)
        .foreach(_.unpersist(blocking = false))
  }
}
