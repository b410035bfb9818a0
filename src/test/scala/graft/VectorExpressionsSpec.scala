package graft

import graft.functions.VectorFunctions
import graft.ops.{Sources, TextSim}
import org.apache.spark.sql.functions._

/** The codegen'd DotProduct must be value-identical to the
  * higher-order-function formulation it replaces, across the real
  * embedding corpus and edge cases.
  */
class VectorExpressionsSpec extends SparkSpec {

  test("native dot == HOF dot on every embedding pair with vector 0") {
    val e = Sources.table(spark, sf, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = e.filter(col("vec_id") === 0L).select(col("v").as("qv"))
    val both = e.crossJoin(broadcast(q))
      .select(col("vec_id"),
        TextSim.dot(col("v"), col("qv")).as("hof"),
        VectorFunctions.dot(spark, col("v"), col("qv")).as("native"))
    val diff = both.filter(abs(col("hof") - col("native")) > 1e-12).count()
    assert(diff == 0)
  }

  test("native dot works from SQL after registration") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D))")
      .collect()(0).getDouble(0)
    assert(r == 32.0)
  }

  test("null array propagates to null result") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D))")
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("cosine of a vector with itself is 1") {
    val e = Sources.table(spark, sf, "embeddings")
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
    val bad = e.select(
      VectorFunctions.cosine(spark, col("v"), col("v")).as("c"))
      .filter(abs(col("c") - 1.0) > 1e-9).count()
    assert(bad == 0)
  }
}
