package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, Distinct, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** DISTINCT ELIMINATION under declared (RELY) unique keys — the
  * companion rewrite to [[JoinElimination]]: a `DISTINCT` /
  * `dropDuplicates` whose key set CONTAINS a declared unique key of the
  * underlying table cannot remove any row (the rows are already
  * distinct on a subset of the dedup keys), so the dedup node is
  * dropped. BI generators and defensive pipeline code emit these
  * unconditionally; at 100 TB each one is a full-corpus hash shuffle
  * bought for nothing.
  *
  * Like the FK registry, uniqueness is DECLARED, not verified per query
  * (RELY semantics — the gate value-checks rewritten results against
  * the oracle's real DISTINCT, so a false declaration fails the gate).
  * The rewrite fires only on shapes it can prove: the dedup child must
  * be the declared table under column-pruning Projects and Filters
  * (both preserve uniqueness of surviving rows; anything else — joins,
  * unions, generators — can duplicate), every root path of the scan
  * must carry the declaration, and the declared key attributes must
  * survive into the dedup key set. */
object DistinctElimination extends Rule[LogicalPlan] {

  /** normalized table path -> declared unique keys (each one key SET). */
  private val registry = TrieMap.empty[String, Seq[Set[String]]]

  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Declare: `cols` is a unique key of the table at `path` (RELY). */
  def registerUnique(path: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "unique key needs at least one column")
    val k = cols.map(_.toLowerCase).toSet
    registry.updateWith(normalize(path)) {
      case Some(ks) => Some((ks :+ k).distinct)
      case None => Some(Seq(k))
    }
  }

  def deregister(path: String): Unit = registry.remove(normalize(path))
  def clear(): Unit = registry.clear()

  /** Unique keys declared for EVERY root path of the scan under
    * column-pruning Projects / Filters (both uniqueness-preserving).
    * Multi-path scans are never eliminable: a row may repeat across
    * files of different roots even when each root is unique. */
  private def declaredKeys(plan: LogicalPlan): Seq[Set[String]] = plan match {
    case Project(projectList, child)
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      declaredKeys(child)
    case Filter(_, child) => declaredKeys(child)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.map(p => normalize(p.toString)) match {
          case Seq(single) => registry.getOrElse(single, Nil)
          case _ => Nil
        }
      case _ => Nil
    }
    case _ => Nil
  }

  private def eliminable(keys: Seq[String], child: LogicalPlan): Boolean = {
    val keySet = keys.map(_.toLowerCase).toSet
    declaredKeys(child).exists(_.subsetOf(keySet))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty) return plan
    plan.transform {
      // Dataset.distinct()/dropDuplicates(cols)
      case d @ Deduplicate(keys, child)
          if keys.forall(_.isInstanceOf[AttributeReference]) &&
            eliminable(keys.map(_.name), child) =>
        child
      // SQL SELECT DISTINCT before ReplaceDistinctWithAggregate runs
      case d @ Distinct(child)
          if child.output.nonEmpty &&
            eliminable(child.output.map(_.name), child) =>
        child
      // ...and after: a grouping-only Aggregate (no aggregate functions,
      // output == grouping attributes) is DISTINCT in disguise
      case a @ Aggregate(groupingExprs, aggExprs, child, _)
          if groupingExprs.nonEmpty &&
            groupingExprs.forall(_.isInstanceOf[AttributeReference]) &&
            aggExprs.forall(_.isInstanceOf[AttributeReference]) &&
            aggExprs.map(_.exprId).toSet ==
              groupingExprs.map(_.asInstanceOf[AttributeReference].exprId).toSet &&
            eliminable(groupingExprs.map(_.asInstanceOf[AttributeReference].name), child) =>
        Project(aggExprs, child)
    }
  }
}
