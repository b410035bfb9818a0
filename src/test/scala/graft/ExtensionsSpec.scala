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
}
