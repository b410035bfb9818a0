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
    import graft.ops.{Sources, TextSim}

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 8).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min=${ts.drop(2).min}%.3f  ts=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Sources.table(spark, dir, "documents").select(col("doc_id"), col("text"))
    for (r <- 1 to 2) {
      time(s"scan text only (r$r)") { noop(docs) }
      time(s"tokenize+size (r$r)") {
        noop(docs.select(col("doc_id"), size(TextSim.tokens(col("text"))).as("n")))
      }
      time(s"tokenize+sort_array (r$r)") {
        noop(docs.select(col("doc_id"), size(sort_array(TextSim.tokens(col("text")))).as("n")))
      }
      time(s"entropy kernel (r$r)") {
        noop(docs.select(col("doc_id"),
          graft.functions.VectorFunctions.tokenEntropy(spark, TextSim.tokens(col("text"))).as("st")))
      }
      time(s"full text_entropy (r$r)") { noop(TextSim.textEntropy(docs)) }
    }
    spark.stop()
  }
}
