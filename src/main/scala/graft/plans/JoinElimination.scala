package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, IsNotNull}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** PK-FK JOIN ELIMINATION under declared (RELY) constraints — the
  * optimizer rewrite every warehouse ships for star schemas: an INNER
  * join from a fact to a dimension on a DECLARED foreign key, where the
  * query uses NO dimension column, cannot change which fact rows
  * survive (the FK is declared contained in a unique PK), so the join
  * is replaced by `Filter(fk IS NOT NULL, fact)` — the only observable
  * effect an intact inner FK join has. At 100 TB this deletes a
  * fact-sized shuffle/broadcast probe a generated query (BI tools emit
  * these joins unconditionally) would otherwise pay.
  *
  * Constraints are DECLARED, not verified per query — exactly how
  * RELY constraints work in warehouses (the declaration is the
  * contract; the gate value-checks the rewritten result against the
  * ORACLE'S REAL JOIN, so a false declaration would fail the gate).
  * The rewrite only fires on the exact shape it can prove: bare
  * column-pruning Projects over file relations on both sides, a single
  * equi-join condition on the declared pair, and a parent projection
  * that references only fact-side attributes. */
object JoinElimination extends Rule[LogicalPlan] {

  /** (factPath, fkCol) -> (dimPath, pkCol), paths normalized. */
  private val registry = TrieMap.empty[(String, String), (String, String)]

  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Declare: every non-null `fkCol` in the table at `factPath` matches
    * exactly one row of `dimPath` by its unique `pkCol` (RELY). */
  def registerFk(factPath: String, fkCol: String,
      dimPath: String, pkCol: String): Unit =
    registry.put((normalize(factPath), fkCol), (normalize(dimPath), pkCol))

  def deregister(factPath: String, fkCol: String): Unit =
    registry.remove((normalize(factPath), fkCol))
  def clear(): Unit = registry.clear()

  /** Root paths of the FACT subtree: Projects and Filters pass through
    * freely — the whole subtree is preserved by the rewrite, so its own
    * predicates keep applying. */
  private def factPaths(plan: LogicalPlan): Seq[String] = plan match {
    case Project(projectList, child)
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      factPaths(child)
    case Filter(_, child) => factPaths(child)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.map(p => normalize(p.toString))
      case _ => Nil
    }
    case _ => Nil
  }

  /** Root paths of a DIM subtree that is SAFE to drop: column-pruning
    * Projects and the join-inferred `IsNotNull(pk)` filter only — any
    * other dim-side predicate would change which fact rows survive the
    * inner join, so the subtree is not eliminable. */
  private def dimPaths(plan: LogicalPlan, pk: AttributeReference): Seq[String] =
    plan match {
      case Project(projectList, child)
          if projectList.forall(_.isInstanceOf[AttributeReference]) =>
        dimPaths(child, pk)
      case Filter(IsNotNull(a: AttributeReference), child) if a.exprId == pk.exprId =>
        dimPaths(child, pk)
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(p => normalize(p.toString))
        case _ => Nil
      }
      case _ => Nil
    }

  /** The declaration must cover the WHOLE fact relation and the dim
    * relation must be EXACTLY the declared dim — `exists`/`contains`
    * here was a silent-wrong-results bug: a multi-path fact scan
    * (`spark.read.parquet(declared, undeclared)`) with only one root
    * declared would eliminate the join and keep undeclared-path rows
    * whose FKs are orphans. Every fact root path must carry the SAME
    * (dimPath, pkCol) declaration, and the dim subtree must read that
    * declared path and nothing else. */
  private def declared(factSide: LogicalPlan, fk: AttributeReference,
      dimSide: LogicalPlan, pk: AttributeReference): Boolean = {
    val fps = factPaths(factSide)
    if (fps.isEmpty) return false
    val decls = fps.map(fp => registry.get((fp, fk.name)))
    if (decls.exists(_.isEmpty)) return false
    val targets = decls.flatten.toSet
    if (targets.size != 1) return false
    val (dp, pkName) = targets.head
    if (pkName != pk.name) return false
    val dimPs = dimPaths(dimSide, pk)
    dimPs.nonEmpty && dimPs.toSet == Set(dp)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty) return plan
    plan.transform {
      case p @ Project(projList,
          Join(left, right, Inner, Some(EqualTo(a: AttributeReference,
            b: AttributeReference)), _)) =>
        val refs = projList.flatMap(_.references.iterator).toSet
        // (fact, dim) in either position; the equi-key in either order;
        // the fk/pk attributes must genuinely belong to their sides
        def tryRewrite(fact: LogicalPlan, dim: LogicalPlan): Option[LogicalPlan] = {
          if (!refs.forall(fact.outputSet.contains)) return None
          val pair =
            if (fact.outputSet.contains(a) && dim.outputSet.contains(b)) Some((a, b))
            else if (fact.outputSet.contains(b) && dim.outputSet.contains(a)) Some((b, a))
            else None
          pair.collect { case (fk, pk) if declared(fact, fk, dim, pk) =>
            Project(projList, Filter(IsNotNull(fk), fact))
          }
        }
        tryRewrite(left, right).orElse(tryRewrite(right, left)).getOrElse(p)
    }
  }
}
