package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen'd bloom-filter membership probe over a BROADCAST
  * filter: `bloom.mightContainLong(key)` as a Catalyst expression.
  *
  * This sits on the probe side of [[graft.ops.Sketches.bloomPrunedJoin]]
  * — at 100 TB that is the hot path of the whole join, so it must stay
  * inside whole-stage codegen: a Scala UDF here would box every key,
  * break the codegen span around the scan, and serialize the lambda per
  * task. The filter itself rides an executor-shared `Broadcast` (one
  * deserialized copy per executor, not one per task or per plan copy —
  * a `Literal(bytes)` embeds the filter in every serialized task).
  *
  * No false negatives; false positives are whatever the filter's `fpp`
  * admits — callers that need exactness follow with the exact join, as
  * `bloomPrunedJoin` does.
  */
case class BloomMightContainLong(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain_long requires a bigint input, got ${t.sql}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  override def nullSafeEval(input: Any): Any =
    bloom.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloomBcast", bloom,
      classOf[Broadcast[_]].getName)
    defineCodeGen(ctx, ev, c =>
      s"((${classOf[BloomFilter].getName}) $bloomRef.value()).mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}
