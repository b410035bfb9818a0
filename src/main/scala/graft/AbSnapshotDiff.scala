package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for `snapshot_diff` (r9 VERDICT #3: +0.153 marginal vs
  * the 0.15 threshold, carried from r8 — settle it the way
  * `json_extract` was settled: same session, min of 4, both SFs, all
  * plausible plan shapes). Variants, all producing identical rows:
  *
  *   - `union_agg`    — the shipped form: UNION of the two snapshots,
  *                      ONE keyed hash aggregate (`max` ignores the
  *                      other side's null), verdict in-row.
  *   - `tagged_union` — same exchange count, but the pre-aggregate
  *                      stream carries (key, price, is_new) instead of
  *                      two half-null price columns; the aggregate is
  *                      `max(when(...))` per side. Tests whether the
  *                      half-null packing costs anything (post
  *                      map-side combine the shuffled rows are
  *                      identical, so it should not).
  *   - `fo_smj`       — full-outer sort-merge join (the r7 original):
  *                      two exchanges + two sorts.
  *   - `fo_shj`       — full-outer shuffled-hash join: two exchanges,
  *                      no sorts (Spark 3.1+ supports full-outer SHJ).
  *   - `single_scan`  — NOT a candidate plan, a BOUND: exploits that
  *                      both bench snapshots are slices of one table,
  *                      so membership and both prices compute per-row
  *                      in one scan with ZERO keyed exchanges (only
  *                      the final sort). The general operator cannot
  *                      use this (its contract is two independent
  *                      relations); the gap to it measures what the
  *                      keyed merge itself costs.
  *
  * Prints one JSON line per SF with min-of-4 seconds per variant.
  */
object AbSnapshotDiff {

  private def snapshots(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val orders = ops.Sources.table(s, dir, "orders")
    val old = orders.filter(col("o_orderkey") % 10 =!= 9)
      .select(col("o_orderkey").as("key"), col("o_totalprice").as("price"))
    val nw = orders.filter(col("o_orderkey") % 10 =!= 0)
      .select(col("o_orderkey").as("key"),
        (when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 10.0)
          .otherwise(col("o_totalprice"))).as("price"))
    (old, nw)
  }

  private def verdictCols(df: DataFrame): DataFrame = df
    .withColumn("verdict",
      when(col("new_price").isNull, "removed")
        .when(col("old_price").isNull, "added")
        .when(col("old_price") =!= col("new_price"), "changed"))
    .filter(col("verdict").isNotNull)
    .select(col("key").as("o_orderkey"), col("verdict"),
      col("old_price"), col("new_price"))
    .orderBy("o_orderkey")

  def taggedUnion(s: SparkSession, dir: String): DataFrame = {
    val (old, nw) = snapshots(s, dir)
    verdictCols(old.withColumn("is_new", lit(false))
      .unionByName(nw.withColumn("is_new", lit(true)))
      .groupBy("key")
      .agg(max(when(!col("is_new"), col("price"))).as("old_price"),
        max(when(col("is_new"), col("price"))).as("new_price")))
  }

  private def fullOuter(s: SparkSession, dir: String, strategy: String): DataFrame = {
    val (old, nw) = snapshots(s, dir)
    verdictCols(old.select(col("key"), col("price").as("old_price"))
      .hint(strategy)
      .join(nw.select(col("key"), col("price").as("new_price")), Seq("key"), "full_outer"))
  }

  def foSmj(s: SparkSession, dir: String): DataFrame = fullOuter(s, dir, "MERGE")
  def foShj(s: SparkSession, dir: String): DataFrame = fullOuter(s, dir, "SHUFFLE_HASH")

  def singleScan(s: SparkSession, dir: String): DataFrame = {
    val orders = ops.Sources.table(s, dir, "orders")
    val priceT = orders.schema("o_totalprice").dataType
    verdictCols(orders.select(
      col("o_orderkey").as("key"),
      when(col("o_orderkey") % 10 =!= 9, col("o_totalprice"))
        .otherwise(lit(null).cast(priceT)).as("old_price"),
      when(col("o_orderkey") % 10 =!= 0,
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 10.0)
          .otherwise(col("o_totalprice")))
        .otherwise(lit(null).cast(priceT)).as("new_price")))
  }

  def variants: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "union_agg" -> ((s, d) => ops.Relational.snapshotDiff(s, d)),
    "tagged_union" -> (taggedUnion _),
    "fo_smj" -> (foSmj _),
    "fo_shj" -> (foShj _),
    "single_scan" -> (singleScan _))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDirs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    for (dir <- sfDirs) {
      // cross-variant correctness: every variant must produce the
      // shipped form's exact rows before its timing means anything
      val expect = ops.Relational.snapshotDiff(spark, dir).collect().toSeq
      variants.foreach { case (name, f) =>
        val got = f(spark, dir).collect().toSeq
        require(got == expect, s"$name differs from union_agg at $dir")
      }
      val times = variants.map { case (name, f) =>
        val samples = (1 to 4).map { _ =>
          val t0 = System.nanoTime()
          f(spark, dir).collect()
          (System.nanoTime() - t0) / 1e9
        }
        name -> samples.min
      }
      println(s"""{"sf":"$dir",""" + times.map { case (n, t) =>
        f""""$n":$t%.3f""" }.mkString(",") + "}")
    }
    spark.stop()
  }
}
