package graft

import org.apache.spark.sql.SparkSession

/** Scratch A/B harness for the profile-family marginal (r14 work item
  * 2): end-to-end times of the declared profile queries at a given SF,
  * noop-forced like the bench. Not part of the declared surface.
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 6).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-20s min=${ts.min}%.3f  ts=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    time("agg_profile") {
      SparkEntry.queries("agg_profile")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("profile_drift") {
      SparkEntry.queries("profile_drift")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
