package graft

import graft.ops.{Sources, Transforms}
import org.apache.spark.sql.functions._

/** Quality surface: report counts mirror the reference's checker
  * (etl_2022.py:46-79), alerts fire on thresholds (:111-121), and
  * observe() counters match a direct count without an extra scan.
  */
class QualitySpec extends SparkSpec {

  private lazy val events = Sources.table(spark, sf, "events")

  test("report counts reconcile with direct aggregations") {
    val r = Quality.report(events, Transforms.validEvent,
      dupKeys = Seq("user_id", "event_type"), outlierCol = "value")
    assert(r.totalRows == events.count())
    assert(r.validRows == events.filter(Transforms.validEvent).count())
    assert(r.invalidRows == r.totalRows - r.validRows)
    assert(r.nullCounts("value") ==
      events.filter(col("value").isNull).count())
    assert(r.validRate > 0.0 && r.validRate <= 1.0)
  }

  test("alerts fire exactly on threshold violations") {
    val clean = Quality.QualityReport(100, Map("a" -> 0), 0, 0, 100)
    assert(Quality.alerts(clean).isEmpty)
    val dirty = Quality.QualityReport(100, Map("a" -> 500), 60, 20, 50)
    val a = Quality.alerts(dirty)
    assert(a.exists(_.startsWith("low_valid_rate")))
    assert(a.exists(_.startsWith("high_null_count")))
    assert(a.exists(_.startsWith("high_dup_count")))
    assert(a.exists(_.startsWith("high_outlier_count")))
  }

  test("observe() counters ride the action — no extra scan") {
    val score = lit(1.0) - when(col("value").isNull, 1.0).otherwise(0.0)
    val (df, obs) = Quality.observed(events, Transforms.validEvent, score)
    val total = df.count() // the ONE action; metrics piggyback on it
    val m = obs.get
    assert(m("n_rows") == total)
    assert(m("n_valid").asInstanceOf[Long] +
      m("n_invalid").asInstanceOf[Long] == total)
    assert(m("avg_quality").asInstanceOf[Double] >= 0.0)
  }
}
