package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sampling and dataset-split operators — the
  * training-data-pipeline primitives for building reproducible subsets
  * and train/val/test partitions of a 100 TB corpus.
  *
  * All of them key on `md5(CAST(id AS STRING))`, not `rand()`:
  *  - reproducible across runs, engines, and cluster layouts (no seed
  *    plumbing, no partition-order sensitivity — the properties
  *    `rand()`-based `df.sample` cannot give);
  *  - membership is a pure per-row projection, so every operator here
  *    is shuffle-free until the caller aggregates — a filter pushed
  *    right after the scan at any scale;
  *  - the same expression runs in DuckDB, so samples are
  *    oracle-verifiable (md5 hex is identical everywhere).
  *
  * The reference has no sampling surface; this extends its
  * validate/clean pipeline (SURVEY.md §2.11 tier) the way a curation
  * pipeline needs before training.
  */
object Sampling {

  /** First hex nibble of the row hash — a uniform 16-bucket assignment.
    * String comparison on hex chars is engine-portable (ASCII order).
    */
  def hexNibble(id: Column): Column = substring(md5(id.cast(StringType)), 1, 1)

  /** `sample_hash` — deterministic ~12.5% row sample of `events`
    * (hash buckets '0' and '1' of 16). The subset is stable under
    * re-runs and under corpus growth: a row's membership never changes
    * when other rows are added — the property that makes incremental
    * re-curation cheap.
    */
  def sampleHash(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "events")
      .filter(hexNibble(col("event_id")).isin("0", "1"))
      .select("event_id", "user_id", "event_type")

  /** `sample_split` — disjoint, exhaustive train/val/test assignment by
    * hash range (12/2/2 nibbles ≈ 75/12.5/12.5%). Every row lands in
    * exactly one split; assignment is a pure projection (no shuffle
    * until the count).
    */
  def sampleSplit(s: SparkSession, dir: String): DataFrame = {
    val h = hexNibble(col("event_id"))
    Sources.table(s, dir, "events")
      .select(when(h < "c", "train").when(h < "e", "val").otherwise("test")
        .as("split"))
      .groupBy("split")
      .agg(count(lit(1)).as("n"))
  }

  /** `sample_stratified` — deterministic stratified sample: at most `n`
    * rows per `event_type`, chosen by full md5 order (a reproducible
    * "random" order both engines agree on). One shuffle on the stratum
    * key; the per-group top-n is a rank window, never a global sort.
    * This is the bounded-quota shape (exact n per stratum); for
    * rate-based stratification see [[sampleWeighted]].
    */
  def sampleStratified(s: SparkSession, dir: String, n: Int = 50): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type")
      .orderBy(md5(col("event_id").cast(StringType)).asc_nulls_first,
        col("event_id").asc_nulls_first)
    Sources.table(s, dir, "events")
      .select(col("event_type"), col("event_id"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= n)
      .select("event_type", "event_id")
  }

  /** `pack_bins` — greedy sequence packing: assign each document to a
    * fixed-token-budget bin, filling sequentially within its source
    * shard (the LLM-pretraining packing step that turns ragged docs
    * into near-constant-length training sequences). A doc lands in the
    * bin where its shard's running token count starts, so bins are
    * contiguous doc ranges and the result is deterministic. One
    * running-sum window per shard — work scales with shard size, no
    * global sort; the budget overflow per bin is bounded by one doc.
    */
  def packBins(s: SparkSession, dir: String, budget: Long = 256L): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Sources.table(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast(LongType).as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / budget.toDouble).as("bin_id"))
  }

  /** `pack_concat` — materialized sequence packing: the documents of
    * each [[packBins]] bin concatenated (newline-separated, doc_id
    * order) into one training sequence, with its doc count and token
    * total — the step that turns bin ASSIGNMENTS into the packed
    * sequences a trainer actually ingests.
    *
    * The cumulative-sum window partitions by source, and the bin
    * aggregate groups by (source, bin_id) — a superset of the window's
    * partitioning — so the exchange is REUSED: one shuffle end to end.
    * Per-bin state is budget-bounded (a bin holds ~`budget` tokens by
    * construction), so the collected array can't blow up an executor
    * regardless of corpus size. The concat sorts the collected
    * `(doc_id, text)` structs AFTER aggregation, keeping the cell
    * independent of shuffle arrival order.
    */
  def packConcat(s: SparkSession, dir: String, budget: Long = 256L): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Sources.table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"),
        size(split(trim(col("text")), "\\s+")).cast(LongType).as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin_id",
        floor((col("cum") - col("n_tokens")) / budget.toDouble))
      .groupBy("source", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"),
        expr("array_join(transform(sort_array(collect_list(" +
          "struct(doc_id, text))), x -> x.text), '\n')").as("packed"))
  }

  /** `sample_quality` — quality-tiered deterministic sampling: docs
    * that pass the [[TextSim.textQuality]] gate keep 14/16 of their
    * hash buckets (~87.5%), failing docs keep 4/16 (25%) — the
    * classifier-bucket → per-bucket-keep-rate recipe quality-weighted
    * corpus construction uses (keep some low-quality text, just less
    * of it). Membership is `rank(hash nibble) <= tier cutoff`: a pure
    * projection+filter, stable under corpus growth like [[sampleHash]],
    * and engine-portable (md5 + instr run identically in the oracle).
    */
  def sampleQuality(s: SparkSession, dir: String): DataFrame = {
    val rank = expr("instr('0123456789abcdef', h)")
    TextSim.textQuality(s, dir)
      .select(col("doc_id"), col("quality_ok"),
        hexNibble(col("doc_id")).as("h"))
      .filter(rank <= when(col("quality_ok"), 14).otherwise(4))
      .select("doc_id", "quality_ok")
  }

  /** `mix_rates` — source-mixture balancing: given each source's token
    * volume and a global token budget split evenly across sources,
    * the per-source keep rate (capped at 1 — a source can't contribute
    * more than it has) and the projected post-sampling token count.
    * The planning aggregate a pretraining data team runs before
    * [[sampleWeighted]]-style execution; one map-side-combined
    * groupBy, then a 1-row broadcast of the source count — the big
    * table is scanned once.
    */
  def mixRates(s: SparkSession, dir: String,
               budget: Double = 20000.0): DataFrame = {
    val perSource = Sources.table(s, dir, "documents")
      .groupBy("source")
      .agg(sum(size(split(trim(col("text")), "\\s+")).cast(LongType))
        .as("n_tokens"))
    val rate = least(lit(1.0),
      (lit(budget) / col("n_src")) / col("n_tokens"))
    perSource
      .crossJoin(broadcast(perSource.agg(count(lit(1)).as("n_src"))))
      .select(col("source"), col("n_tokens"),
        round(rate, 6).as("keep_rate"),
        floor(rate * col("n_tokens")).cast(LongType)
          .as("projected_tokens"))
  }

  /** `sample_weighted` — per-source mixture construction over
    * `documents`: sources src0–src9 kept whole, the long tail kept at
    * ~25% (hash nibbles 0–3). The standard recipe for re-weighting a
    * training mixture (keep curated sources, downsample the crawl) as
    * one shuffle-free filter + count.
    */
  def sampleWeighted(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "documents")
      // try_cast: a source name without a numeric suffix is tail-tier
      // (NULL < 10 is NULL → false), not an ANSI cast error
      .filter(expr("try_cast(substring(source, 4) AS INT)") < 10 ||
        hexNibble(col("doc_id")) < "4")
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"))

  /** `mix_temperature` — temperature-scaled language mixing: sampling
    * share `p_i ∝ n_i^alpha` (alpha < 1 flattens the distribution —
    * the standard multilingual-pretraining re-balance that upsamples
    * low-resource languages relative to their raw share). Reports per
    * language the raw share, the temperature share, and the implied
    * up/down-weight `boost = temp_share / raw_share`.
    *
    * Determinism across engines: `pow` is transcendental, so each
    * per-language power is rounded to 6 dp and cast to DECIMAL before
    * the exact decimal sum — the same recipe
    * [[graft.ops.TextSim.zipfSlope]] uses for its logs. The final
    * ratios divide identical decimals-cast-to-double on both sides.
    * One groupBy on a bounded key + a broadcast of the 1-row totals —
    * shuffle-free after the count at any corpus size.
    */
  def mixTemperature(s: SparkSession, dir: String,
                     alpha: Double = 0.7): DataFrame = {
    // NULL lang is excluded on BOTH sides (here and in the oracle
    // SQL): a null group would sort engine-dependently (Spark nulls
    // first, DuckDB nulls last) and an unlabeled document has no
    // place in a language-mix budget anyway.
    val perLang = Sources.table(s, dir, "documents")
      .filter(col("lang").isNotNull)
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .select(col("lang"), col("n_docs"),
        round(pow(col("n_docs").cast(DoubleType), lit(alpha)), 6)
          .cast(DecimalType(18, 6)).as("pw"))
    val totals = perLang.agg(sum(col("pw")).as("tot_pw"),
      sum(col("n_docs")).as("tot_docs"))
    val rawShare = col("n_docs").cast(DoubleType) /
      col("tot_docs").cast(DoubleType)
    val tempShare = col("pw").cast(DoubleType) /
      col("tot_pw").cast(DoubleType)
    perLang.crossJoin(broadcast(totals))
      .select(col("lang"), col("n_docs"),
        round(rawShare, 6).as("raw_share"),
        round(tempShare, 6).as("temp_share"),
        round(tempShare / rawShare, 4).as("boost"))
  }
}
