package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer vector arithmetic over `array<long>` columns — the
  * deterministic-clustering counterpart of [[FloatVectorDot]]. Vectors are
  * snapped to integer micro-units first (see
  * [[graft.ops.Clustering.microVec]]), so every engine recomputing these
  * sums gets the identical integer: distance comparisons and thresholds
  * become exact, which is what makes distributed k-means / SemDeDup
  * bit-deterministic across engines.
  *
  * Same rationale as [[FloatVectorDot]] for being a native expression:
  * the HOF formulation (`aggregate(zip_with(...))`) evaluates interpreted;
  * these compile to a primitive loop inside whole-stage codegen.
  *
  * Overflow contract (unchecked 64-bit), per operator at d dims:
  *  - dot:    d·m² ≤ 2^63 → |element| m ≤ sqrt(9.2e18/d)  (~3.8e8 at d=64)
  *  - sqdist: d·(2m)² ≤ 2^63 → m ≤ sqrt(9.2e18/d)/2       (~1.9e8 at d=64)
  * (A packed argmin key multiplies the sqdist headroom by k on top —
  * [[LongVectorArgminKey]] documents AND checks that tighter bound.)
  * Micro-unit embeddings (|x| ≤ ~1e3 → ≤ 1e9 micro-units only if the
  * value range is that large; unit-norm embeddings are ≤ ~1e6 units)
  * must be scaled so m respects the d-dependent bound — at 1e6 units the
  * margin is >100x for d=64.
  */
abstract class LongVectorBinary extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got ${l.sql} and ${r.sql}")
  }
  override def dataType: DataType = LongType

  /** Java expression combining elements `ai` and `bi` into the summand. */
  protected def summand(ai: String, bi: String): String
  protected def combine(a: Long, b: Long): Long

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    require(b.numElements() == n,
      s"$prettyName: length mismatch ($n vs ${b.numElements()})")
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += combine(a.getLong(i), b.getLong(i))
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += ${summand(s"$a.getLong($i)", s"$b.getLong($i)")};
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
}

/** Exact dot product Σ aᵢ·bᵢ over `array<long>`. */
case class LongVectorDot(left: Expression, right: Expression) extends LongVectorBinary {
  override def prettyName: String = "long_vector_dot"
  override protected def summand(ai: String, bi: String): String = s"$ai * $bi"
  override protected def combine(a: Long, b: Long): Long = a * b
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVectorDot =
    copy(left = newLeft, right = newRight)
}

/** Exact squared L2 distance Σ (aᵢ-bᵢ)² over `array<long>`. */
case class LongVectorSqDist(left: Expression, right: Expression) extends LongVectorBinary {
  override def prettyName: String = "long_vector_sqdist"
  override protected def summand(ai: String, bi: String): String =
    s"($ai - $bi) * ($ai - $bi)"
  override protected def combine(a: Long, b: Long): Long = (a - b) * (a - b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVectorSqDist =
    copy(left = newLeft, right = newRight)
}
