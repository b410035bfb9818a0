package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The spark.sql.extensions deployment path: GraftExtensions must
  * inject cleanly into a fresh SparkSessionExtensions (full behavior
  * of the injected builders is covered by VectorExpressionsSpec and
  * WinnowSpec through the session-registry path — the builders are
  * shared).
  */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects all functions without error") {
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e)
  }

  test("injected builders construct valid expressions") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val dot = graft.functions.DotProduct(Literal(null), Literal(null))
    assert(dot.prettyName == "graft_dot")
    val win = graft.functions.Winnow(Literal("abc"), 2, 2)
    assert(win.prettyName == "graft_winnow")
    assert(win.dataType.typeName == "array")
    val sh = graft.functions.ShingleHash(Literal(null), 3)
    assert(sh.prettyName == "graft_shingle")
    assert(sh.dataType.typeName == "array")
  }

  test("DotProductRewrite swaps the HOF dot idiom for the codegen'd one") {
    import org.apache.spark.sql.functions._
    // non-literal (no constant folding), containsNull=false arrays
    val df = spark.range(5).select(
      array(col("id").cast("double"), (col("id") + 1).cast("double"))
        .as("a"),
      array((col("id") + 2).cast("double"), (col("id") + 3).cast("double"))
        .as("b"))
    val hof = graft.ops.TextSim.dot(col("a"), col("b")).as("d")
    spark.experimental.extraOptimizations = Seq(
      graft.functions.DotProductRewrite)
    try {
      val q = df.select(hof)
      assert(q.queryExecution.optimizedPlan.toString.contains("graft_dot"),
        s"rewrite did not fire:\n${q.queryExecution.optimizedPlan}")
      // [id,id+1]·[id+2,id+3] = 2id²+6id+3
      val got = q.collect().map(_.getDouble(0)).toSeq
      assert(got == Seq(3.0, 11.0, 23.0, 39.0, 59.0))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("DotProductRewrite leaves nullable-element arrays alone") {
    import org.apache.spark.sql.functions._
    // when(...) makes the element nullable → containsNull=true: the
    // rewrite must NOT fire (HOF null-poisons, native reads 0.0)
    val df = spark.range(3).select(
      array(when(col("id") > 0, col("id").cast("double")))
        .as("a"),
      array(col("id").cast("double")).as("b"))
    val hof = graft.ops.TextSim.dot(col("a"), col("b")).as("d")
    spark.experimental.extraOptimizations = Seq(
      graft.functions.DotProductRewrite)
    try {
      val q = df.select(hof)
      assert(!q.queryExecution.optimizedPlan.toString.contains("graft_dot"),
        "rewrite must not fire on containsNull=true inputs")
      val got = q.collect()
      assert(got(0).isNullAt(0), "null element must null-poison the HOF sum")
    } finally spark.experimental.extraOptimizations = Nil
  }
}
