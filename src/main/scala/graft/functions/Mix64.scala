package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Wrapping 64-bit affine mix: `child * a + b` in raw Java long
  * arithmetic (overflow wraps = exact mod-2^64) — the universal-hashing
  * step deriving k hash variants from one base hash. A plain Column
  * `h * lit(a) + lit(b)` throws under ANSI mode (Spark 4 default) on the
  * intended overflow, so the wrap lives in a native expression; an
  * engine-neutral oracle reproduces it with 128-bit intermediates and an
  * explicit mod. */
case class Mix64(child: Expression, a: Long, b: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mix64 requires a bigint input, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "mix64"

  override def nullSafeEval(input: Any): Any =
    input.asInstanceOf[Long] * a + b

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"($c * ${a}L + ${b}L)")

  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)
}
