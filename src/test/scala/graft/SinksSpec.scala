package graft

import graft.ops.{Sinks, Sources}
import org.apache.spark.sql.functions._

/** Write-side round trips: hive partitioning prunes, CSV/JSON round-
  * trip, bucketed tables avoid the join shuffle, JDBC config builds.
  */
class SinksSpec extends SparkSpec {

  test("partitioned parquet write creates prunable directories") {
    val out = java.nio.file.Files.createTempDirectory("graft-psink").toString
    val ev = Sources.table(spark, sf, "events")
      .filter(col("event_type").isNotNull)
    Sinks.parquet(ev, partitionCols = Seq("event_type")).save(out)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("event_type="))
    assert(dirs.nonEmpty)
    // partition filter must prune to one directory's rows
    val one = dirs.head.stripPrefix("event_type=")
    val reread = spark.read.parquet(out).filter(col("event_type") === one)
    assert(reread.count() == ev.filter(col("event_type") === one).count())
    val scanned = reread.queryExecution.executedPlan.toString
    assert(scanned.contains("PartitionFilters"), "filter should hit partitioning")
  }

  test("csv and json-lines round-trip") {
    val out1 = java.nio.file.Files.createTempDirectory("graft-csink").toString
    val out2 = java.nio.file.Files.createTempDirectory("graft-jsink").toString
    val n = Sources.table(spark, sf, "nation")
    Sinks.csv(n).save(out1)
    Sinks.jsonLines(n).save(out2)
    assert(spark.read.option("header", "true").csv(out1).count() == n.count())
    assert(spark.read.json(out2).count() == n.count())
  }

  test("bucketed table join on the bucket key plans without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    // a crashed prior run can leave the managed location behind with
    // no catalog entry — saveAsTable refuses to reuse it
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("orders_b", "lineitem_b").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        d.listFiles().foreach(_.delete()); d.delete(): Unit
      }
    }
    Sinks.bucketed(Sources.table(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice"), "o_orderkey", 4,
      sortCols = Seq("o_orderkey")).saveAsTable("orders_b")
    Sinks.bucketed(Sources.table(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "o_orderkey", 4, sortCols = Seq("o_orderkey"))
      .saveAsTable("lineitem_b")
    val joined = spark.table("orders_b").join(spark.table("lineitem_b"),
      "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("range-sorted parquet files cover disjoint key ranges") {
    val out = java.nio.file.Files.createTempDirectory("graft-ssink").toString
    val ev = Sources.table(spark, sf, "events")
      .filter(col("value").isNotNull).select("event_id", "value")
    Sinks.sortedParquet(ev, Seq("value")).save(out)
    // per-file [min, max] of the sort key must not overlap across files
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("value").as("lo"), max("value").as("hi"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(ranges.nonEmpty)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file ranges overlap: $hi1 > $lo2")
      case _ => ()
    }
    // nothing lost in the re-layout
    assert(spark.read.parquet(out).count() == ev.count())
  }

  test("jdbc writer builds with batch + connection bounds") {
    val w = Sinks.jdbc(Sources.table(spark, sf, "nation"),
      "jdbc:mysql://localhost/etl", "users", "u", "p")
    // config-only: no database in this environment; constructing the
    // writer validates options don't throw
    assert(w != null)
  }

  test("committed write: manifest is the commit point, readers verify it") {
    val out = java.nio.file.Files.createTempDirectory("graft-txn")
      .resolve("t").toString
    val src = Sources.table(spark, sf, "nation")
    val n = Sinks.parquetCommitted(src, out)
    assert(n == src.count(), "observed count != source count")
    assert(Sinks.readCommitted(spark, out).count() == n)
    // simulate a write that died before its commit point
    val manifest = java.nio.file.Paths.get(out, "_graft_manifest.json")
    java.nio.file.Files.delete(manifest)
    val e = intercept[IllegalArgumentException] {
      Sinks.readCommitted(spark, out)
    }
    assert(e.getMessage.contains("uncommitted"))
    // simulate post-commit tampering (manifest/data divergence)
    java.nio.file.Files.writeString(manifest,
      s"""{"rows": ${n + 1}, "committed": true}""")
    val e2 = intercept[IllegalArgumentException] {
      Sinks.readCommitted(spark, out)
    }
    assert(e2.getMessage.contains("declares"))
  }
}
