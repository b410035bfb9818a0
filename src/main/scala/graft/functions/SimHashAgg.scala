package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference, BitwiseAnd, Cast, Expression, GreaterThan, If, IsNull, LambdaFunction, Literal, NamedLambdaVariable, Sequence, ShiftLeft, ShiftRight, XxHash64, ZipWith}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** 64-bit SimHash as ONE declarative aggregate. The buffer is the
  * 64-long vote vector; per token the update adds ±1 per bit of
  * `xxhash64(token)` via `zip_with(votes, signs(token), +)`, merges
  * add vote vectors, and the final value packs sign bits into one
  * long. Versus the explode-per-bit formulation (64 rows per token
  * before partial aggregation), the map side processes one row per
  * token and shuffles one 64-long vector per (doc, map task) — the
  * same shape MinHashSigAgg uses.
  */
case class SimHashSigAgg(child: Expression)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash requires a string column, got $t")
    }

  private lazy val votes: AttributeReference =
    AttributeReference("votes", ArrayType(LongType, containsNull = false),
      nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(votes)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(Array.fill(64)(0L),
      ArrayType(LongType, containsNull = false)))

  /** signs(token): [±1 by bit p of xxhash64(token)] for p in 0..63. */
  private def tokenSigns: Expression = {
    val p = NamedLambdaVariable("p", LongType, nullable = false)
    val hash = XxHash64(Seq(child), 42L)
    val bit = BitwiseAnd(ShiftRight(hash, Cast(p, IntegerType)), Literal(1L))
    new org.apache.spark.sql.catalyst.expressions.ArrayTransform(
      Sequence(Literal(0L), Literal(63L), None, None),
      LambdaFunction(If(GreaterThan(bit, Literal(0L)),
        Literal(1L), Literal(-1L)), Seq(p)))
  }

  private def vecAdd(a: Expression, b: Expression): Expression = {
    val x = NamedLambdaVariable("x", LongType, nullable = false)
    val y = NamedLambdaVariable("y", LongType, nullable = false)
    ZipWith(a, b, LambdaFunction(Add(x, y), Seq(x, y)))
  }

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), votes, vecAdd(votes, tokenSigns)))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    vecAdd(votes.left, votes.right))

  /** Pack positive-vote bits: Σ_p (votes[p] > 0 ? 1L << p : 0). */
  override lazy val evaluateExpression: Expression = {
    val v = NamedLambdaVariable("v", LongType, nullable = false)
    val p = NamedLambdaVariable("p2", LongType, nullable = false)
    val acc = NamedLambdaVariable("acc", LongType, nullable = false)
    val x = NamedLambdaVariable("x2", LongType, nullable = false)
    val fin = NamedLambdaVariable("fin", LongType, nullable = false)
    val bits = ZipWith(votes, Sequence(Literal(0L), Literal(63L), None, None),
      LambdaFunction(If(GreaterThan(v, Literal(0L)),
        ShiftLeft(Literal(1L), Cast(p, IntegerType)), Literal(0L)),
        Seq(v, p)))
    org.apache.spark.sql.catalyst.expressions.ArrayAggregate(
      bits, Literal(0L),
      LambdaFunction(Add(acc, x), Seq(acc, x)),
      LambdaFunction(fin, Seq(fin)))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashSigAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** Idempotently register `graft_simhash(token)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash",
      { exprs: Seq[Expression] =>
        require(exprs.length == 1,
          s"graft_simhash expects (token), got ${exprs.length} args")
        SimHashSigAgg(exprs.head)
      },
      "built-in")
}
