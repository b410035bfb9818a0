package graft

import graft.ops.{Sources, Transforms}
import org.apache.spark.sql.functions._

/** Invariants mirroring the reference's own runtime quality rules
  * (/root/reference/src/etl_2022.py:178-183, etl_2018.py:14-36):
  * valid ∪ invalid partitions the input, dedup output has no dups,
  * fillna output has no nulls, quality scores lie in [0, 1].
  */
class TransformsSpec extends SparkSpec {

  private lazy val events = Sources.table(spark, sf, "events")

  test("filter_valid ∪ filter_invalid partitions events") {
    val total = events.count()
    val valid = Transforms.filterValid(spark, sf).count()
    val invalid = Transforms.filterInvalid(spark, sf).count()
    assert(valid + invalid == total)
    assert(valid > 0 && invalid > 0,
      "test data should exercise both branches")
  }

  test("filter_invalid reasons are from the closed reason set") {
    val reasons = Transforms.filterInvalid(spark, sf)
      .select("reason").distinct().collect().map(_.getString(0)).toSet
    val allowed = Set("missing_user_id", "missing_ts", "blank_event_type",
      "missing_value", "value_out_of_range")
    assert(reasons.subsetOf(allowed), s"unexpected reasons: ${reasons -- allowed}")
  }

  test("quality_score ∈ [0,1] for every row") {
    val bad = Transforms.qualityScore(spark, sf)
      .filter(col("quality_score") < 0.0 || col("quality_score") > 1.0)
      .count()
    assert(bad == 0)
  }

  test("dedup_rows output has no duplicates (D2 = 0 after D1)") {
    val d = Transforms.dedupRows(spark, sf)
    assert(d.count() == d.dropDuplicates().count())
  }

  test("fillna_const output has no nulls in filled columns") {
    val f = Transforms.fillnaConst(spark, sf)
    assert(f.filter(col("event_type_filled").isNull ||
      col("props_filled").isNull).count() == 0)
  }

  test("fillna_mean output has no nulls and preserves non-null values") {
    val f = Transforms.fillnaMean(spark, sf)
    assert(f.filter(col("value_filled").isNull).count() == 0)
    // non-null inputs must pass through unchanged
    val joined = events.select(col("event_id"), col("value"))
      .filter(col("value").isNotNull)
      .join(f, "event_id")
    assert(joined.filter(col("value") =!= col("value_filled")).count() == 0)
  }

  test("outlier_iqr flags only rows outside the whisker bounds") {
    val out = Transforms.outlierIqr(spark, sf)
    val Array(q1, q3) = events.stat
      .approxQuantile("value", Array(0.25, 0.75), 0.0)
    val iqr = q3 - q1
    val bad = out.filter(col("value") >= q1 - 1.5 * iqr &&
      col("value") <= q3 + 1.5 * iqr).count()
    assert(bad == 0)
  }

  test("union_all equals direct aggregation (slices are a partition)") {
    val viaUnion = Transforms.unionAll(spark, sf)
    val direct = Sources.table(spark, sf, "orders")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")
    val a = viaUnion.select("o_orderstatus", "n_orders").collect().toSeq
    val b = direct.collect().toSeq
    assert(a == b)
  }

  test("csv reader round-trips an explicit schema with corrupt-row accounting") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toFile
    val f = new java.io.File(dir, "input_1.csv")
    val w = new java.io.PrintWriter(f)
    w.write("name,age\nalice,30\nbob,notanint\n")
    w.close()
    val schema = StructType(Seq(StructField("name", StringType),
      StructField("age", IntegerType)))
    // cache: Spark disallows querying only the corrupt column straight
    // off a raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val df = Sources.csv(spark, f.getPath, schema,
      corruptRecordCol = Some("_corrupt")).cache()
    val rows = df.collect()
    assert(rows.length == 2)
    assert(df.filter(col("_corrupt").isNotNull).count() == 1)
  }

  test("csvGlob keeps input_* files and skips excluded output files") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-glob").toFile
    def put(n: String, body: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(dir, n))
      w.write(body); w.close()
    }
    put("input_1.csv", "name,age\na,1\n")
    put("input_2.csv", "name,age\nb,2\n")
    put("output.csv", "name,age\nx,99\n")
    val schema = StructType(Seq(StructField("name", StringType),
      StructField("age", IntegerType)))
    val kept = Sources.csvGlob(spark, dir.getPath, "input_*.csv", schema)
    assert(kept.count() == 2)
    val excluded = Sources.csvGlob(spark, dir.getPath, "*.csv", schema,
      excludeFiles = "output\\.csv$")
    assert(excluded.count() == 2)
  }
}
