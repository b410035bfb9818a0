package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._

/** The json_extract string fast path must be a pure specialization:
  * on every input — flat, nested, quoted, escaped, spaced, malformed,
  * null — the guarded spelling equals `get_json_object`.
  */
class JsonFastPathSpec extends SparkSpec {

  test("guarded fast path equals get_json_object on adversarial props") {
    import spark.implicits._
    val props = Seq(
      """{"k": 69}""",            // fast path
      """{"k": -42}""",           // fast path, negative
      """{"k": 0}""",             // fast path, zero
      """{"k": 007}""",           // leading zeros: INVALID JSON — falls
                                  // back (Jackson yields null; the r14
                                  // review caught the first guard
                                  // admitting this)
      """{"k": -007}""",          // ditto
      """{"k": -0}""",            // -0 re-serializes as 0: falls back
      """{"k": 99999999999999999999999}""", // > long: whatever the
                                  // parser does, equality must hold
      "{\"k\": 1}\n",             // trailing newline: \\z guard falls back
      """{"k":69}""",             // no space: falls back
      """{"k": 69 }""",           // trailing space: falls back
      """{"k": "69"}""",          // quoted value: falls back
      """{"k": 6.9}""",           // float: falls back
      """{"k": {"n": 1}}""",      // nested: falls back
      """{"j": 1, "k": 2}""",     // second key: falls back
      """{"k": 1e3}""",           // exponent: falls back
      """not json""",             // malformed: falls back (null)
      null.asInstanceOf[String])
    val df = props.toDF("props")
    // the PRODUCT expression, not a spec-local copy (r14 review)
    val rows = df.select(col("props"), Relational.jsonKValue.as("f"),
      get_json_object(col("props"), "$.k").as("g")).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("f") == r.getAs[String]("g"),
        s"fast path diverged on ${r.getAs[String]("props")}: " +
          s"${r.getAs[String]("f")} vs ${r.getAs[String]("g")}")
    }
  }

  test("json_extract fixture histogram is unchanged by the fast path") {
    val got = Relational.jsonExtract(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    val ref = graft.ops.Sources.table(spark, sf, "events")
      .select(get_json_object(col("props"), "$.k").as("k_value"))
      .groupBy("k_value").agg(count(lit(1)).as("n"))
      .collect().map(_.toString).sorted.toSeq
    assert(got == ref)
  }
}
