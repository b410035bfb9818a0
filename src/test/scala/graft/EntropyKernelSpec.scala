package graft

import graft.ops.{Sources, TextSim}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The per-doc entropy kernel must reproduce the explode+groupBy
  * spelling BIT-FOR-BIT (same 8-dp HALF_UP ln pinning, same exact
  * decimal term sum, same closing double casts), with the same row
  * set (tokenless docs absent).
  */
class EntropyKernelSpec extends SparkSpec {

  /** The pre-r14 declarative spelling, kept here as the reference. */
  private def oldEntropy(docs: DataFrame): DataFrame = {
    def lnd(c: org.apache.spark.sql.Column) = round(log(c), 8)
    docs
      .select(col("doc_id"), explode(TextSim.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(lnd(col("tf")).cast(DecimalType(18, 8)) * col("tf")).as("term_sum"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(lnd(col("n_tokens")) -
          col("term_sum").cast(DoubleType) /
            col("n_tokens").cast(DoubleType), 4).as("entropy"))
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("kernel equals the explode+groupBy spelling on the fixture corpus") {
    val docs = Sources.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    assert(rows(TextSim.textEntropy(docs)) == rows(oldEntropy(docs)))
  }

  test("kernel equals the old spelling on crafted edge docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a"),                    // one token, tf 4
      (2L, "the quick brown fox"),        // all distinct
      (3L, "  leading  and  trailing  "), // empty-string splits
      (4L, ""),                           // tokenless: absent from output
      (5L, null.asInstanceOf[String]),    // null text: absent
      (6L, "x " * 100000),                // long degenerate doc
      (7L, "A a B b"))                    // lowercasing folds pairs
      .toDF("doc_id", "text")
    val got = rows(TextSim.textEntropy(docs))
    val want = rows(oldEntropy(docs))
    assert(got == want, s"kernel diverged:\n$got\nvs\n$want")
    assert(!got.exists(_.startsWith("[4,")) && !got.exists(_.startsWith("[5,")),
      "tokenless docs must be absent")
  }

  test("the kernel plan has no exchange") {
    val docs = Sources.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val plan = TextSim.textEntropy(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"per-doc entropy must be shuffle-free:\n${plan.take(800)}")
  }
}
