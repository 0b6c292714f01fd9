package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the engine's native expressions for SQL use.
  *
  * Two entry points:
  *  - `withExtensions(new GraftExtensions)` at session build time
  *    (`SparkSessionExtensions.injectFunction`) — the standard extension
  *    wiring for clusters;
  *  - [[GraftExtensions.register]] on a live session, for notebooks/tests.
  *
  * After registration: `SELECT float_vector_dot(a.embedding, b.embedding)`
  * works in `spark.sql` with the same codegen'd implementation as the
  * `graft.functions.float_dot` Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.floatVectorDotDescriptor)
    ext.injectFunction(GraftExtensions.md5Hash64Descriptor)
    ext.injectFunction(GraftExtensions.topkPairsDescriptor)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinThreshold)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  private def build(children: Seq[Expression]): Expression = {
    require(children.length == 2, "float_vector_dot takes exactly 2 arguments")
    FloatVectorDot(children.head, children(1))
  }

  private def buildMd5(children: Seq[Expression]): Expression = {
    require(children.length == 1, "md5_hash64 takes exactly 1 argument")
    Md5Hash64(children.head)
  }

  private def buildTopK(children: Seq[Expression]): Expression = {
    require(children.length == 3, "topk_pairs takes (score, id, k)")
    val k = children(2) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"topk_pairs k must be an integer literal, got $other")
    }
    TopKPairs(children.head, children(1), k)
  }

  val floatVectorDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("float_vector_dot"),
    new ExpressionInfo(classOf[FloatVectorDot].getName, "float_vector_dot"),
    build)

  val md5Hash64Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("md5_hash64"),
    new ExpressionInfo(classOf[Md5Hash64].getName, "md5_hash64"),
    buildMd5)

  val topkPairsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("topk_pairs"),
    new ExpressionInfo(classOf[TopKPairs].getName, "topk_pairs"),
    buildTopK)

  /** Register on an already-built session (functions via the registry,
    * the optimizer rule via `experimental.extraOptimizations` — the
    * live-session hook for rules). Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_vector_dot", build, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_hash64", buildMd5, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_pairs", buildTopK, "built-in")
    if (!spark.experimental.extraOptimizations.contains(graft.plans.LevenshteinThreshold))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.LevenshteinThreshold
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
  }
}
