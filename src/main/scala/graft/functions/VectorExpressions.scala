package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native (whole-stage-codegen'd) dot product over two double arrays.
  *
  * The built-in way to write a dot product —
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` — is a higher-order
  * function, which Spark evaluates INTERPRETED (lambda dispatch +
  * boxing per element). Fine for one pass over N vectors; dominant
  * cost for pairwise work (`dedup_embed` does N²/2 dots). This is the
  * case SURVEY §7.3 reserved for a custom Catalyst Expression: same
  * semantics, but `doGenCode` emits a tight primitive loop that fuses
  * into the surrounding whole-stage codegen.
  *
  * Null semantics: null array → null result (standard binary-expression
  * null propagation); array ELEMENTS are assumed non-null (embedding
  * vectors are dense) — a null element reads as 0.0, matching the
  * zip_with formulation's behavior of null-poisoning only via the sum.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-level entry points for the native vector
  * expressions.
  */
object VectorFunctions {

  /** Idempotently register `graft_dot` in the session's function
    * registry (temp function — session-scoped, no catalog writes).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      { exprs: Seq[Expression] =>
        require(exprs.length == 2,
          s"graft_dot expects 2 arguments, got ${exprs.length}")
        DotProduct(exprs.head, exprs(1))
      },
      "built-in")

  /** Codegen'd dot product as a Column (registers on first use). */
  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_dot", a, b)
  }

  /** Codegen'd cosine similarity from one dot + two norms. */
  def cosine(spark: SparkSession, a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dot(spark, a, b) / (sqrt(dot(spark, a, a)) * sqrt(dot(spark, b, b)))
  }
}
