package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the declarative dot-product idiom
  *
  *   `aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)`
  *
  * into the codegen'd [[DotProduct]] expression. The higher-order
  * formulation is the natural way to write a dot product in plain
  * Spark SQL, but HOF lambdas evaluate interpreted (boxing + dispatch
  * per element); this rule lets user-authored plans get the fused
  * primitive loop without knowing `graft_dot` exists — the Catalyst
  * extension point (`injectOptimizerRule`) doing what it is for.
  *
  * Safety gate: fires only when BOTH arrays have `containsNull=false`.
  * On a null ELEMENT the two formulations diverge (the HOF
  * null-poisons the sum to NULL, the native loop reads the slot as
  * 0.0 — see [[DotProduct]]), so plans that cannot prove null-freedom
  * keep the interpreted-but-exact semantics. Null ARRAYS are fine
  * either way (both return NULL).
  *
  * Matches multiplication/addition with operands in either order, and
  * only the identity finish lambda (`aggregate`'s 3-arg form).
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def nonNullDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  /** Both operands are exactly the lambda's own two variables (in
    * either order).
    */
  private def usesBothVars(vars: Seq[NamedExpression], a: Expression,
                           b: Expression): Boolean = (a, b) match {
    case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
      val ids = vars.collect { case v: NamedLambdaVariable => v.exprId }
      ids.toSet == Set(x.exprId, y.exprId) && x.exprId != y.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(mx, my, _), zipVars, _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(ax, ay, _), mergeVars, _),
          LambdaFunction(fin: NamedLambdaVariable,
            Seq(finVar: NamedLambdaVariable), _))
        if nonNullDoubleArray(a) && nonNullDoubleArray(b) &&
          usesBothVars(zipVars, mx, my) &&
          usesBothVars(mergeVars, ax, ay) &&
          fin.exprId == finVar.exprId =>
        DotProduct(a, b)
    }
}
