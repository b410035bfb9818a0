package graft

import org.apache.spark.sql.{Column, SparkSession}
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
    import Num._

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 8).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min=${ts.drop(2).min}%.3f  ts=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = Sources.table(spark, dir, "lineitem")

    // unchecked units (the r13 spelling)
    def unitsRaw(c: Column, scale: Int): Column = {
      val p = lit(math.pow(10, scale))
      when(c < 0, -((-c * p + lit(0.5)).cast(LongType)))
        .otherwise((c * p + lit(0.5)).cast(LongType))
    }
    def corrWith(xu0: Column, yc0: Column, pre: Boolean): org.apache.spark.sql.DataFrame = {
      val base = if (pre) li.select(col("l_returnflag"), xu0.as("xu"), yc0.as("yc")) else li
      val xu = if (pre) col("xu") else xu0
      val yc = if (pre) col("yc") else yc0
      val yy = yc * yc
      val n = col("n").cast(DoubleType)
      base.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          fromUnits(sum(xu), 0).as("sx"), fromUnits(sum(yc), 2).as("sy"),
          fromUnits(sum(xu * yc), 2).as("sxy"),
          fromUnits(sum(xu * xu), 0).as("sxx"),
          fromUnitsHiLo(sum(unitsHi(yy)), sum(unitsLo(yy)), 4).as("syy"))
        .select(col("l_returnflag"), col("n"),
          round((col("sxy") - col("sx") * col("sy") / n) / (n - 1), 2).as("qp_covar"))
    }
    for (r <- 1 to 2) {
      time(s"corr RAW inline (r$r)") { noop(corrWith(unitsRaw(col("l_quantity"),0), unitsRaw(col("l_extendedprice"),2), pre=false)) }
      time(s"corr CHK inline (r$r)") { noop(corrWith(units(col("l_quantity"),0), units(col("l_extendedprice"),2), pre=false)) }
      time(s"corr CHK projected (r$r)") { noop(corrWith(units(col("l_quantity"),0), units(col("l_extendedprice"),2), pre=true)) }
      time(s"corr RAW projected (r$r)") { noop(corrWith(unitsRaw(col("l_quantity"),0), unitsRaw(col("l_extendedprice"),2), pre=true)) }
    }
    spark.stop()
  }
}
