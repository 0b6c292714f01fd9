package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** ROW-LEVEL SECURITY as an optimizer rule: a registered policy
  * predicate is attached to EVERY read of its table — `spark.read
  * .parquet(path)` by any code path, SQL or DataFrame, comes back
  * pre-filtered, the lake-side equivalent of a database's row policy
  * (reference analog: the sensitive-tier projection gates COLUMNS at
  * view-definition time, `core/transformations.py:727`; this gates
  * ROWS at plan time). Because the predicate lands directly above the
  * scan, Catalyst's normal pushdown carries it into the parquet reader
  * (PushedFilters — row-group pruning), so enforcement is not a
  * post-hoc filter over a 100 TB scan but part of the scan itself.
  *
  * The rewrite is convergent by construction: a relation already
  * guarded by a semantically-equal Filter is left alone, so the
  * optimizer's fixpoint batches terminate. Policies compose with any
  * user filter (both conjuncts push down independently). */
object RowPolicy extends Rule[LogicalPlan] {

  private val registry = TrieMap.empty[String, String] // path -> predicate SQL

  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Register `predicateSql` (a boolean SQL expression over the table's
    * columns) as the row policy for the table at `path`. */
  def register(path: String, predicateSql: String): Unit = {
    CatalystSqlParser.parseExpression(predicateSql) // fail fast on syntax
    registry.put(normalize(path), predicateSql)
  }

  def deregister(path: String): Unit = registry.remove(normalize(path))
  def clear(): Unit = registry.clear()

  /** Policy for one scan root: exact match OR any registered root the
    * path is a DESCENDANT of (longest registered prefix wins). Matching
    * only the exact root was a bypass: `spark.read.parquet(s"$base/
    * part-*.parquet")` (glob) or direct part-file paths resolve to
    * children of the registered root and came back unfiltered. Globs
    * are expanded to concrete paths before the relation is built, so
    * prefix matching covers them. Scope note: only V1 file scans
    * (LogicalRelation over HadoopFsRelation — everything this engine
    * produces) are governed; a scan that never surfaces rootPaths is
    * outside this rule's reach. */
  private def policyForPath(path: String): Option[String] = {
    var best: Option[(String, String)] = None
    registry.foreach { case (root, sql) =>
      if ((path == root || path.startsWith(root + "/")) &&
          best.forall(_._1.length < root.length)) best = Some((root, sql))
    }
    best.map(_._2)
  }

  private def policySqlFor(lr: LogicalRelation): Option[String] =
    lr.relation match {
      // a relation spanning governed and ungoverned roots gets the
      // governed policy applied to ALL its rows — fail-closed. A scan
      // spanning roots under DIFFERENT policies gets their CONJUNCTION
      // (every governing policy enforced on every row — also
      // fail-closed; picking one silently would apply the weaker
      // policy to the other root's rows). Sorted for a deterministic
      // conjunct order, so the convergence check above stays stable.
      case fs: HadoopFsRelation =>
        val sqls = fs.location.rootPaths
          .flatMap(p => policyForPath(normalize(p.toString)))
          .distinct.sorted
        if (sqls.isEmpty) None
        else if (sqls.size == 1) Some(sqls.head)
        else Some(sqls.mkString("(", ") AND (", ")"))
      case _ => None
    }

  /** The policy predicate resolved against the relation's own output
    * attributes (case-insensitive name match, Spark's default). The
    * rule runs AFTER analysis, so no implicit type coercion happens:
    * a predicate whose literals don't match the column types (e.g.
    * `bigint_col % 10` — an int literal) stays unresolved and would
    * invalidate the plan; fail loud with the fix named instead. */
  private def resolved(sql: String, lr: LogicalRelation): Expression = {
    val e = CatalystSqlParser.parseExpression(sql).transformUp {
      case u: UnresolvedAttribute =>
        lr.output.find(_.name.equalsIgnoreCase(u.name)).getOrElse(
          throw new IllegalArgumentException(
            s"row policy references unknown column ${u.name}; table has " +
              lr.output.map(_.name).mkString(", ")))
    }
    require(e.resolved,
      s"row policy '$sql' does not type-check against the table without " +
        "implicit coercion (the policy injects post-analysis) — write " +
        "type-exact literals, e.g. 10L against a BIGINT column")
    e
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty) return plan
    def rec(p: LogicalPlan): LogicalPlan = p match {
      // already enforced: leave it, so the fixpoint converges
      case f @ Filter(cond, lr: LogicalRelation)
          if policySqlFor(lr).exists(s => cond.semanticEquals(resolved(s, lr))) =>
        f
      case lr: LogicalRelation =>
        policySqlFor(lr) match {
          case Some(sql) => Filter(resolved(sql, lr), lr)
          case None => lr
        }
      case other => other.mapChildren(rec)
    }
    rec(plan)
  }
}
