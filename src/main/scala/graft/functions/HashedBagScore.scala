package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Row-local hashed-bag linear score: Σ over tokens of
  * `weights[md5_64(token) mod n]` — the whole fasttext-shape document
  * logit as ONE codegen'd expression. Replaces the explode →
  * element_at → groupBy(doc) formulation: same integers, but the score
  * never leaves its row, so the scoring operator needs ZERO shuffles
  * (the explode form's doc-partial aggregation was its only exchange).
  * `n = weights.length` must be a power of two (enforced at the
  * [[graft.ops.TextOps.hashedQualityScore]] API layer), so the bucket
  * `hash & (n-1)` equals both pmod on the signed hash and the unsigned
  * remainder an engine-neutral oracle computes. NULL-propagating like
  * the sibling kernels; null ELEMENTS contribute 0. */
case class HashedBagScore(tokens: Expression, weights: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = weights
  override def prettyName: String = "hashed_bag_score"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, weights.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (t, w) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<bigint>), got ${t.sql}, ${w.sql}")
    }

  override def nullSafeEval(ts: Any, ws: Any): Any =
    HashedBagScore.score(ts.asInstanceOf[ArrayData], ws.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) => s"graft.functions.HashedBagScore.score($t, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HashedBagScore =
    copy(tokens = newLeft, weights = newRight)
}

object HashedBagScore {
  /** Shared by eval and codegen. `n` must be a power of two; then
    * `hash & (n-1)` == pmod(hash, n) even for negative hashes. The guard
    * matters because the SQL-registered `hashed_bag_score` exposes this
    * expression without the Column-API validation in
    * [[graft.ops.TextOps.hashedQualityScore]]: n = 0 would make the mask
    * -1 (out-of-bounds reads), and a non-power-of-two n would silently
    * bucket by `h & (n-1)` instead of the documented pmod. */
  def score(tokens: ArrayData, weights: ArrayData): Long = {
    val n = weights.numElements()
    require(n >= 1 && (n & (n - 1)) == 0,
      s"hashed_bag_score weights length must be a power of two, got $n")
    val mask = n - 1
    var acc = 0L
    var i = 0
    val len = tokens.numElements()
    while (i < len) {
      if (!tokens.isNullAt(i)) {
        val h = Md5Hash64.hash(tokens.getUTF8String(i))
        acc += weights.getLong((h & mask).toInt)
      }
      i += 1
    }
    acc
  }
}
