package graft

import graft.ops.{Sources, TimeOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-equivalent time ops: sessionize's gaps-and-islands invariants. */
class TimeOpsSpec extends SparkSpec {

  test("sessionize ids start at 1 and are monotone per user") {
    val s = TimeOps.sessionize(spark, sf)
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val bad = s.withColumn("prev", lag(col("session_id"), 1, 1L).over(w))
      .filter(col("session_id") < col("prev") ||
        col("session_id") > col("prev") + 1)
      .count()
    assert(bad == 0, "session ids must be nondecreasing, stepping by ≤1")
    val mins = s.groupBy("user_id").agg(min("session_id").as("m"))
      .filter(col("m") =!= 1L).count()
    assert(mins == 0, "every user's first session is 1")
  }

  test("stateful sessionize agrees with the window-function formulation") {
    import spark.implicits._
    val typed = Sources.table(spark, sf, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("event_id"), col("ts"), col("user_id"))
      .as[TimeOps.SessionEvent]
    val stateful = TimeOps.statefulSessionize(typed)
      .collect().map(r => (r.user_id, r.event_id) -> r.session_id).toMap
    val windowed = TimeOps.sessionize(spark, sf)
      .filter(col("user_id").isNotNull)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(stateful.keySet == windowed.keySet)
    val disagree = stateful.count { case (k, v) => windowed(k) != v }
    assert(disagree == 0,
      s"$disagree of ${stateful.size} assignments differ between the two implementations")
  }

  test("time_resample spine is contiguous-hourly and conserves counts") {
    val rows = TimeOps.timeResample(spark, sf).collect()
    assert(rows.nonEmpty)
    val hours = rows.map(_.getTimestamp(0).getTime)
    hours.sliding(2).foreach {
      case Array(a, b) => assert(b - a == 3600 * 1000L,
        s"gap in hourly spine: $a -> $b")
      case _ => ()
    }
    val total = rows.map(_.getLong(1)).sum
    val expected = graft.ops.Sources.table(spark, sf, "events")
      .filter(org.apache.spark.sql.functions.col("ts").isNotNull).count()
    assert(total == expected, "zero-filled buckets must conserve event count")
  }

  test("window_lag gaps are null-first then non-negative per user") {
    val rows = TimeOps.windowLag(spark, sf).collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.values.foreach { evs =>
      val gaps = evs.map(r => if (r.isNullAt(2)) None else Some(r.getLong(2)))
      assert(gaps.count(_.isEmpty) == 1,
        "exactly one first-event row (null gap) per user")
      assert(gaps.flatten.forall(_ >= 0L),
        "time-ordered lag gaps must be non-negative")
    }
  }

  test("session_stats partitions every event into a session rollup") {
    val rows = TimeOps.sessionStats(spark, sf).collect()
    val totalEvents = graft.ops.Sources.table(spark, sf, "events").count()
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_events"))).sum ==
      totalEvents, "session event counts must cover every event once")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("duration_us")) >= 0L)
      assert(r.getLong(r.fieldIndex("n_events")) >= 1L)
    }
  }

  test("stream_tumbling buckets cover every event exactly once") {
    val n = TimeOps.streamTumbling(spark, sf)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(n == Sources.table(spark, sf, "events").count())
  }
}
