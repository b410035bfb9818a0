package graft

import graft.ops.AsOf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** As-of join semantics: inclusive most-recent match, LEFT behavior for
  * unmatched probes, null key/time handling, deterministic ties — plus
  * equivalence against the naive range-join formulation and the
  * single-shuffle plan guarantee.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val quotes: DataFrame = Seq(
    ("A", ts("2024-01-01 10:00:00"), 100L),
    ("A", ts("2024-01-01 12:00:00"), 110L),
    ("A", ts("2024-01-01 14:00:00"), 120L),
    ("B", ts("2024-01-01 11:00:00"), 200L)
  ).toDF("sym", "qt", "px")

  private lazy val trades: DataFrame = Seq(
    (1L, "A", ts("2024-01-01 09:00:00")), // before any quote -> null
    (2L, "A", ts("2024-01-01 12:00:00")), // equal time -> inclusive match 110
    (3L, "A", ts("2024-01-01 13:59:59")), // between -> 110
    (4L, "A", ts("2024-01-01 23:00:00")), // after all -> 120
    (5L, "B", ts("2024-01-01 11:30:00")), // other key -> 200
    (6L, "C", ts("2024-01-01 12:00:00")), // key absent from build -> null
    (7L, "A", null.asInstanceOf[java.sql.Timestamp]), // null time -> null
    (8L, null.asInstanceOf[String], ts("2024-01-01 12:00:00")) // null key -> null
  ).toDF("trade_id", "sym", "tt")

  test("asofJoin: inclusive most-recent-match with LEFT semantics") {
    val got = AsOf.asofJoin(trades, "sym", "tt", quotes, "sym", "qt")
      .select("trade_id", "px").as[(Long, Option[Long])]
      .collect().toMap
    assert(got == Map(1L -> None, 2L -> Some(110L), 3L -> Some(110L),
      4L -> Some(120L), 5L -> Some(200L), 6L -> None, 7L -> None,
      8L -> None))
  }

  test("asofJoin: equal-time build ties resolve to the greatest payload") {
    val build = Seq(("A", ts("2024-01-01 10:00:00"), 7L),
      ("A", ts("2024-01-01 10:00:00"), 9L)).toDF("k", "t", "v")
    val probe = Seq((1L, "A", ts("2024-01-01 10:30:00"))).toDF("id", "k", "pt")
    val got = AsOf.asofJoin(probe, "k", "pt", build, "k", "t")
      .select("v").as[Long].collect()
    assert(got.toSeq == Seq(9L))
  }

  test("asofJoin tolerance discards stale matches, keeps fresh ones") {
    val got = AsOf.asofJoin(trades, "sym", "tt", quotes, "sym", "qt",
        tolerance = Some("30 MINUTES"))
      .select("trade_id", "px").as[(Long, Option[Long])]
      .collect().toMap
    // trade 2 matches the 12:00 quote exactly (age 0); trade 3's match
    // is 1h59m stale; trade 4's is 9h stale — both discarded
    assert(got(2L).contains(110L) && got(3L).isEmpty && got(4L).isEmpty)
    assert(got(5L).contains(200L)) // 30m-old quote at the boundary kept
  }

  test("asofJoin matches the naive range-join formulation") {
    // deterministic pseudo-random corpus: keys 0-9, times spread over a day
    val probe = spark.range(0, 300).select(col("id"),
      (col("id") % 10).cast("string").as("k"),
      timestamp_seconds(lit(1700000000L) + pmod(xxhash64(col("id")), lit(86400L)))
        .as("pt"))
    val build = spark.range(1000, 1200).select(
      (col("id") % 10).cast("string").as("k"),
      timestamp_seconds(lit(1700000000L) +
        pmod(xxhash64(col("id"), lit(7L)), lit(86400L))).as("bt"),
      col("id").as("payload"))
      // unique (k, bt) so both formulations make the same tie choice
      .groupBy("k", "bt").agg(max("payload").as("payload"))
    val fast = AsOf.asofJoin(probe, "k", "pt", build, "k", "bt")
      .select("id", "payload")
    val naive = probe.join(build,
        probe("k") === build("k") && col("bt") <= col("pt"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(col("bt").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("id"), col("payload"))
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("asofJoin plans one hash exchange and no join operator") {
    val p = AsOf.asofJoin(trades, "sym", "tt", quotes, "sym", "qt")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one shuffle:\n$p")
  }

  test("tolerance bound adds no shuffle and no join") {
    // both last() windows share one spec → a single Window operator
    val p = AsOf.asofJoin(trades, "sym", "tt", quotes, "sym", "qt",
        tolerance = Some("30 MINUTES"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one shuffle:\n$p")
    assert("Window".r.findAllIn(p).size == 1,
      s"expected a single Window operator:\n$p")
  }

  test("asofJoin rejects payload/probe column collisions") {
    val e = intercept[IllegalArgumentException] {
      AsOf.asofJoin(trades, "sym", "tt",
        quotes.withColumnRenamed("px", "trade_id"), "sym", "qt")
    }
    assert(e.getMessage.contains("collide"))
  }

  test("asof_join declared query: every event resolved, keys preserved") {
    val df = AsOf.asofEventsOrders(spark, sf)
    val n = graft.ops.Sources.table(spark, sf, "events").count()
    assert(df.count() == n)
    // orders all precede the 2024 events, so every non-null user matches
    assert(df.filter(col("user_id").isNotNull &&
      col("last_orderkey") === -1L).count() == 0)
  }
}
