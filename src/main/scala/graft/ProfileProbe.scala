package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B harness (r14). Not part of the declared surface. */
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
    import graft.ops.Sources

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 8).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min=${ts.drop(2).min}%.3f  ts=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def orders = Sources.table(spark, dir, "orders").select("o_orderkey")
    def li = Sources.table(spark, dir, "lineitem").select(col("l_orderkey").as("o_orderkey"))

    def cur = orders.join(li.distinct(), Seq("o_orderkey"), "left_anti").distinct()
    def noInner = orders.join(li, Seq("o_orderkey"), "left_anti").distinct()
    def noOuter = orders.join(li.distinct(), Seq("o_orderkey"), "left_anti")
    def neither = orders.join(li, Seq("o_orderkey"), "left_anti")

    val a = cur.collect().map(_.toString).sorted
    println(s"rows=${a.length} eq_noInner=${noInner.collect().map(_.toString).sorted.sameElements(a)} eq_neither=${neither.collect().map(_.toString).sorted.sameElements(a)}")
    for (r <- 1 to 2) {
      time(s"current (r$r)") { noop(cur) }
      time(s"no inner distinct (r$r)") { noop(noInner) }
      time(s"no outer distinct (r$r)") { noop(noOuter) }
      time(s"neither (r$r)") { noop(neither) }
    }
    spark.stop()
  }
}
