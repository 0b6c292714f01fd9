package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: bound Levenshtein computations by the comparison they
  * feed.
  *
  * `levenshtein(a, b) <= k` computes the full O(|a|*|b|) dynamic program
  * and then throws the distance away for every pair beyond k. Spark's
  * Levenshtein expression has a thresholded form that abandons the DP as
  * soon as the distance provably exceeds the threshold (returning -1) —
  * O(min(|a|,|b|) * k) per pair. This rule rewrites the unbounded
  * comparison into the bounded one:
  *
  *   levenshtein(a, b) <= k   ==>   levenshtein(a, b, k) >= 0
  *   levenshtein(a, b) <  k   ==>   levenshtein(a, b, k-1) >= 0
  * (and the mirrored `k >= levenshtein(a, b)` forms)
  *
  * For a blocked fuzzy-dedup join (where most candidate pairs are far
  * apart and the cap is small relative to the strings), the DP does ~k/len
  * of the unbounded work — exactly the asymmetry that matters at corpus
  * scale. Injected via [[graft.functions.GraftExtensions]]; callers that
  * build the bounded form explicitly (e.g. `Dedup.fuzzyBlockedPairs`) are
  * left untouched — the rule only fires on the unbounded pattern.
  */
object LevenshteinThreshold extends Rule[LogicalPlan] {

  private def intLit(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) => Some(v)
    case Literal(v: Long, LongType) if v.isValidInt => Some(v.toInt)
    case _ => None
  }

  private def bounded(lev: Levenshtein, k: Int): Expression =
    GreaterThanOrEqual(
      Levenshtein(lev.left, lev.right, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(lev @ Levenshtein(_, _, None), k)
        if intLit(k).exists(_ >= 0) =>
      bounded(lev, intLit(k).get)
    case LessThan(lev @ Levenshtein(_, _, None), k)
        if intLit(k).exists(_ >= 1) =>
      bounded(lev, intLit(k).get - 1)
    case GreaterThanOrEqual(k, lev @ Levenshtein(_, _, None))
        if intLit(k).exists(_ >= 0) =>
      bounded(lev, intLit(k).get)
    case GreaterThan(k, lev @ Levenshtein(_, _, None))
        if intLit(k).exists(_ >= 1) =>
      bounded(lev, intLit(k).get - 1)
  }
}
