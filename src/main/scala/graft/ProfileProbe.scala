package graft

import org.apache.spark.sql.{Column, SparkSession}
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

    val ev = Sources.table(spark, dir, "events")
    def agg(kv: Column): org.apache.spark.sql.DataFrame =
      ev.select(kv.as("k_value")).groupBy("k_value").agg(count(lit(1)).as("n"))

    val cur = get_json_object(col("props"), "$.k")
    val simple = col("props").rlike("^\\{\"k\": -?[0-9]+\\}$")
    val fastSub = when(simple,
      substring_index(substring_index(col("props"), ": ", -1), "}", 1))
      .otherwise(get_json_object(col("props"), "$.k"))
    val fastRe = {
      val g = regexp_extract(col("props"), "^\\{\"k\": (-?[0-9]+)\\}$", 1)
      when(g =!= "", g).otherwise(get_json_object(col("props"), "$.k"))
    }
    // equality
    val a = agg(cur).collect().map(_.toString).sorted
    val b = agg(fastSub).collect().map(_.toString).sorted
    val c = agg(fastRe).collect().map(_.toString).sorted
    println(s"EQ sub=${a.sameElements(b)} re=${a.sameElements(c)} groups=${a.length}")
    for (r <- 1 to 2) {
      time(s"get_json_object (r$r)") { noop(agg(cur)) }
      time(s"rlike+substring (r$r)") { noop(agg(fastSub)) }
      time(s"regexp_extract (r$r)") { noop(agg(fastRe)) }
    }
    spark.stop()
  }
}
