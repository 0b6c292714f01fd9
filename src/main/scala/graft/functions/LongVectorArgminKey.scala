package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Row-local nearest-centroid argmin over a broadcast centroid matrix:
  * returns `min over i of (sqdist(vec, centroid_i) * k + cid_i)` — the
  * SAME packed scalar key [[graft.ops.Clustering]] previously produced
  * with a `crossJoin + groupBy(id, xm) + min(key)`, which shuffled the
  * entire vector corpus once per k-means iteration. As a per-row
  * expression the assignment needs ZERO exchanges of the corpus: the
  * centroids arrive as a one-row broadcast (flattened `cmat` of k·d longs
  * plus the parallel `cids`), and the argmin runs as a primitive loop
  * inside whole-stage codegen (an `aggregate(transform(...))` HOF chain
  * would evaluate interpreted — the boundary this repo measured at 10-40x
  * on [[FloatVectorDot]] and the shingle ops).
  *
  * Packing/overflow contract (checked, not silent): the packed key needs
  * `sqdist <= (Long.MaxValue - (k-1)) / k`, i.e. for d-dim vectors every
  * per-dimension |a - b| must stay <= sqrt(9.2e18 / (k·d)) micro-units
  * (~1.9e8/sqrt(k) at d=64). Unit-norm embeddings in 1e-6 micro-units
  * (|element| <= ~1e6, diffs <= ~2e6) satisfy this through k ~ 2e5. The
  * evaluator throws on a packed-key overflow rather than wrapping —
  * a silent wrap would corrupt assignments identically on every run and
  * pass partition-invariance tests. (Intermediate wrap of the sqdist
  * accumulator itself that lands back in-range needs per-dim diffs
  * >= ~3e9 — excluded by the same precondition with 15x margin.)
  */
case class LongVectorArgminKey(vec: Expression, cmat: Expression,
    cids: Expression, k: Int) extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = cmat
  override def third: Expression = cids

  override def prettyName: String = "long_vector_argmin_key"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(vec, cmat, cids).map(_.dataType) match {
      case Seq(ArrayType(LongType, _), ArrayType(LongType, _), ArrayType(LongType, _)) =>
        if (k >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 1, got $k")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires three array<bigint> inputs, got ${other.map(_.sql).mkString(", ")}")
    }

  /** Shared by eval and codegen: max sqdist the packing supports. */
  private def maxDist: Long = (Long.MaxValue - (k - 1)) / k

  override def nullSafeEval(v: Any, m: Any, c: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val mat = m.asInstanceOf[ArrayData]
    val ids = c.asInstanceOf[ArrayData]
    val d = x.numElements()
    val n = ids.numElements()
    require(n >= 1, s"$prettyName: empty centroid set")
    require(mat.numElements() == n * d,
      s"$prettyName: centroid matrix ${mat.numElements()} != $n centroids x $d dims")
    var best = Long.MaxValue
    var ci = 0
    while (ci < n) {
      val off = ci * d
      var s = 0L
      var j = 0
      while (j < d) {
        val diff = x.getLong(j) - mat.getLong(off + j)
        s += diff * diff
        j += 1
      }
      if (s < 0L || s > maxDist) throw new ArithmeticException(
        s"$prettyName: sqdist $s overflows packed key headroom (k=$k); " +
          "reduce the micro-unit scale or k (see scaladoc bound)")
      val key = s * k + ids.getLong(ci)
      if (key < best) best = key
      ci += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m, c) => {
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val ci = ctx.freshName("ci")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val diff = ctx.freshName("diff")
      val key = ctx.freshName("key")
      val best = ctx.freshName("best")
      s"""
         |final int $d = $v.numElements();
         |final int $n = $c.numElements();
         |if ($n < 1 || $m.numElements() != $n * $d) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: centroid matrix " + $m.numElements() +
         |    " != " + $n + " centroids x " + $d + " dims");
         |}
         |long $best = Long.MAX_VALUE;
         |for (int $ci = 0; $ci < $n; $ci++) {
         |  final int $off = $ci * $d;
         |  long $s = 0L;
         |  for (int $j = 0; $j < $d; $j++) {
         |    final long $diff = $v.getLong($j) - $m.getLong($off + $j);
         |    $s += $diff * $diff;
         |  }
         |  if ($s < 0L || $s > ${maxDist}L) {
         |    throw new ArithmeticException(
         |      "$prettyName: sqdist " + $s + " overflows packed key headroom (k=$k)");
         |  }
         |  final long $key = $s * ${k}L + $c.getLong($ci);
         |  if ($key < $best) $best = $key;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): LongVectorArgminKey =
    copy(vec = newFirst, cmat = newSecond, cids = newThird)
}
