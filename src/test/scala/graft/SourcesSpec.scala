package graft

import graft.ops.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reader surface S1–S6 beyond the schema contract: inferred-schema
  * CSV (S2), JSON-lines messages (S5, the SQS-body analog), and the
  * processing-timestamp projection (P3 — excluded from the oracle for
  * nondeterminism, presence-tested here).
  */
class SourcesSpec extends SparkSpec {

  test("S2: inferred-schema CSV picks up int and string dtypes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-infer").toFile
    val w = new java.io.PrintWriter(new java.io.File(dir, "input_1.csv"))
    w.write("name,age\nalice,30\nbob,41\n"); w.close()
    val df = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(dir.getPath)
    assert(df.schema("age").dataType == IntegerType)
    assert(df.schema("name").dataType == StringType)
    assert(df.count() == 2)
  }

  test("S5: jsonLines parses SQS-style message bodies with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toFile
    val w = new java.io.PrintWriter(new java.io.File(dir, "messages.jsonl"))
    w.write("""{"bucket":"b1","key":"input_1.csv","size":123}""" + "\n")
    w.write("""{"bucket":"b1","key":"input_2.csv","size":456}""" + "\n")
    w.close()
    val schema = StructType(Seq(
      StructField("bucket", StringType), StructField("key", StringType),
      StructField("size", LongType)))
    val df = Sources.jsonLines(spark, dir.getPath, schema)
    assert(df.count() == 2)
    assert(df.select("key").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("input_1.csv", "input_2.csv"))
  }

  test("P3: processing timestamp is present and non-null (etl_2018.py:60)") {
    val df = Sources.table(spark, sf, "customer")
      .withColumn("processed_at", current_timestamp())
    assert(df.filter(col("processed_at").isNull).count() == 0)
    assert(df.schema("processed_at").dataType == TimestampType)
  }

  test("ORC reader round-trips Sinks.orc output and pushes filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_src").toString
    val src = Sources.table(spark, sf, "orders")
    graft.ops.Sinks.orc(src).save(s"$dir/orders_orc")
    val back = Sources.orc(spark, s"$dir/orders_orc")
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    // the columnar contract parquet scans are held to: a filtered,
    // projected read must report pushed filters and a pruned schema
    val q = back.filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderstatus")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("o_orderstatus"),
      s"ORC filter not pushed:\n${p.take(1200)}")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema"))
    assert(readSchema.exists(l => l.contains("o_orderkey") &&
      !l.contains("o_totalprice")), s"ORC scan not pruned: $readSchema")
    assert(q.count() == src.filter(col("o_orderstatus") === "F").count())
  }
}
