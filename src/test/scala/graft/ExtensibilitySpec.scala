package graft

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** The engine's extension surface (SURVEY §2.9 X6/X7, §2.6 J5):
  * scalar UDF registration, typed Aggregator UDAF, and non-equi
  * (theta/range) joins. Unit-level only — the declared queries never
  * need them (built-ins cover everything, SURVEY §7.3), but a user of
  * the engine can reach for each.
  */
class ExtensibilitySpec extends SparkSpec {

  test("X6: scalar UDF registers and runs (SQL + DSL)") {
    import spark.implicits._
    val slugify = udf((s: String) =>
      s.toLowerCase.replaceAll("[^a-z0-9]+", "-"))
    spark.udf.register("slugify", slugify)
    val df = Seq("Hello World", "Spark SQL!").toDF("s")
    assert(df.select(slugify(col("s"))).as[String].collect().toSeq ==
      Seq("hello-world", "spark-sql-"))
    df.createOrReplaceTempView("slug_in")
    assert(spark.sql("SELECT slugify(s) FROM slug_in").as[String]
      .collect().toSeq == Seq("hello-world", "spark-sql-"))
  }

  test("X7: typed Aggregator computes a custom geometric mean") {
    import spark.implicits._
    val geoMean = new Aggregator[Double, (Double, Long), Double] {
      def zero: (Double, Long) = (0.0, 0L)
      def reduce(b: (Double, Long), a: Double): (Double, Long) =
        (b._1 + math.log(a), b._2 + 1)
      def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
        (x._1 + y._1, x._2 + y._2)
      def finish(r: (Double, Long)): Double =
        if (r._2 == 0) 0.0 else math.exp(r._1 / r._2)
      def bufferEncoder: Encoder[(Double, Long)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
    val ds = Seq(2.0, 8.0).toDS()
    val out = ds.select(geoMean.toColumn).collect()(0)
    assert(math.abs(out - 4.0) < 1e-9)
  }

  test("J5: theta/range join via non-equi condition") {
    import spark.implicits._
    val ranges = Seq(("low", 0.0, 100.0), ("high", 100.0, 1e9))
      .toDF("bucket", "lo", "hi")
    val vals = Seq(50.0, 150.0, 99.9).toDF("v")
    val joined = vals.join(broadcast(ranges),
        col("v") >= col("lo") && col("v") < col("hi"))
      .select("v", "bucket")
      .collect().map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(joined == Map(50.0 -> "low", 150.0 -> "high", 99.9 -> "low"))
    // plan sanity: a non-equi broadcast join must NOT shuffle
    val plan = vals.join(broadcast(ranges),
      col("v") >= col("lo") && col("v") < col("hi"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"))
  }
}
