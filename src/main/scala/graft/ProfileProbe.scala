package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch A/B harness (r14): one-window comparisons for plan
  * rewrites under adjudication. Not part of the declared surface.
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{Sources, Num}

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 8).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min=${ts.drop(2).min}%.3f  ts=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val orders = Sources.table(spark, dir, "orders")
    // interleaved: old, new, old, new to share the load window
    for (round <- 1 to 2) {
      time(s"gsets OLD (round $round)") {
        noop(orders.groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            Num.dsum(col("o_totalprice")).as("total_price")))
      }
      time(s"gsets NEW (round $round)") {
        noop(graft.ops.Aggregates.aggGsets(spark, dir))
      }
    }
    spark.stop()
  }
}
