package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.ops.Num.dsum

/** ML feature preparation — the column transforms a training-data
  * pipeline applies just before model ingest: numeric scaling,
  * categorical encoding. The reference's quality/clean stage
  * (/root/reference/src/etl_2022.py:176-188) normalizes and imputes;
  * these are the standard next steps that turn cleaned columns into
  * model features.
  *
  * Scale shape shared by all three: the "fit" statistics are one
  * global/grouped aggregate whose result is a handful of rows, and the
  * "transform" is a broadcast of those rows back across the data — one
  * full scan, no per-row shuffle, the exact plan a 100 TB feature
  * pipeline wants (the statistics tuple is bytes; the big side never
  * moves).
  */
object Features {

  /** `scale_features` — min-max and z-score scaling of `events.value`
    * in one pass. Fit = one global aggregate (min, max, exact-decimal
    * power sums for mean/std per [[Num]] — the built-in `stddev_samp`
    * accumulates co-moments in shuffle-arrival order and drifts in the
    * last bits, so std comes from Σx/Σx² instead). Transform =
    * broadcast-join the 1-row stats tuple and project both scaled
    * columns. Sample (n−1) std, matching the oracle's formulation.
    */
  def scaleFeatures(s: SparkSession, dir: String): DataFrame = {
    val ev = Sources.table(s, dir, "events")
      .filter(col("value").isNotNull)
    val n = col("n").cast(DoubleType)
    val stats = ev.agg(
      count(lit(1)).as("n"),
      min(col("value")).as("mn"), max(col("value")).as("mx"),
      dsum(col("value"), 6).as("sx"),
      dsum(col("value") * col("value"), 6).as("sxx"))
      .select(col("mn"), col("mx"), (col("sx") / n).as("mu"),
        sqrt((col("sxx") - col("sx") * col("sx") / n) / (n - 1)).as("sd"))
    ev.crossJoin(broadcast(stats))
      .select(col("event_id"),
        round((col("value") - col("mn")) / (col("mx") - col("mn")), 6)
          .as("value_minmax"),
        round((col("value") - col("mu")) / col("sd"), 6).as("value_z"))
      .orderBy("event_id")
  }

  /** `encode_onehot` — one-hot encoding of `o_orderstatus` over its
    * declared category set (O/F/P). Declared, not discovered: a
    * distinct-scan "fit" pass would make the output schema
    * data-dependent, which breaks both column pruning and the oracle
    * contract — the 100 TB shape is a fixed vocabulary applied as a
    * pure projection (zero shuffles, fully codegen'd).
    */
  def encodeOnehot(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "orders")
      .select(col("o_orderkey") +:
        Seq("O", "F", "P").map(c =>
          when(col("o_orderstatus") === c, 1L).otherwise(0L)
            .as(s"is_${c.toLowerCase}")): _*)
      .orderBy("o_orderkey")

  /** `encode_freq` — frequency encoding of `events.event_type`: each
    * row carries its category's corpus relative frequency, the
    * leakage-free stand-in for target encoding. Fit = one groupBy
    * (map-side combined, one row per category on the shuffle);
    * transform = broadcast-join the tiny frequency table back. Both
    * engines divide the same exact BIGINTs, so the double quotient is
    * bit-identical.
    */
  def encodeFreq(s: SparkSession, dir: String): DataFrame = {
    val ev = Sources.table(s, dir, "events")
      .filter(col("event_type").isNotNull)
    val freqs = ev.groupBy("event_type")
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(ev.agg(count(lit(1)).as("total"))))
      .select(col("event_type"),
        round(col("cnt").cast(DoubleType) / col("total").cast(DoubleType),
          6).as("et_freq"))
    ev.join(broadcast(freqs), "event_type")
      .select(col("event_id"), col("event_type"), col("et_freq"))
      .orderBy("event_id")
  }
}
