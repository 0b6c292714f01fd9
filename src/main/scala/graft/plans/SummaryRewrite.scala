package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}

/** MATERIALIZED-SUMMARY REWRITE — the optimizer-level answer to "this
  * aggregate is asked hourly over a 100 TB fact table": a registered
  * summary table holds per-(G') partial aggregates (sums / counts /
  * mins / maxes), and this rule rewrites any matching
  * `Aggregate(G ⊆ G', re-aggregable aggs, scan(base))` to the same
  * aggregate over the summary — sums re-sum, counts re-sum, min/max
  * re-min/max (the classic aggregate-rollup algebra, Calcite's
  * materialized-view rewrite reduced to the grouping-set lattice).
  * Queries the summary cannot answer exactly — filters on non-group
  * columns, distinct aggregates, FILTER clauses, averages over floats,
  * any unregistered column — do NOT match and run against the base
  * unchanged; the rewrite is only ever applied where the algebra is an
  * identity.
  *
  * Mechanics: the rule fires in the optimizer (injected via
  * [[graft.functions.GraftExtensions]]), recognizes the base relation
  * by its resolved file-source root path, builds the replacement plan
  * through the DataFrame API (so it is analyzed + optimized like any
  * user plan), and re-aliases the new output to the ORIGINAL ExprIds so
  * every downstream operator keeps resolving. At 100 TB the rewrite
  * turns a full-fact scan+shuffle into a scan of a summary that is
  * |G'| rows — the same plan a human would hand-route, applied
  * mechanically and provably (the gate value-checks rewritten results
  * against DuckDB computing from the BASE data). */
object SummaryRewrite extends Rule[LogicalPlan] {

  /** A registered summary: `summaryPath` holds one row per distinct
    * `groupCols` value of the base data with columns
    * `groupCols ++ sumCols.map("sum_" + _) :+ "cnt" ++ mins/maxes`. */
  final case class SummarySpec(basePath: String, summaryPath: String,
      groupCols: Seq[String], sumCols: Seq[String],
      minCols: Seq[String], maxCols: Seq[String])

  /** Registry keyed by the NORMALIZED base path (scheme-stripped). */
  private val registry = TrieMap.empty[String, SummarySpec]

  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Build the summary parquet for `basePath` and register it for
    * rewriting. Returns the spec. One aggregation pass over the base —
    * refresh by calling again (overwrite + re-register). */
  def summarize(spark: SparkSession, basePath: String, summaryPath: String,
      groupCols: Seq[String], sumCols: Seq[String] = Nil,
      minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil): SummarySpec = {
    require(groupCols.nonEmpty, "summary needs at least one group column")
    // a REFRESH must re-read the base: drop any live registration so
    // the build aggregate below cannot be rewritten to the stale (or
    // already-deleted) summary it is about to replace
    registry.remove(normalize(basePath))
    val base = spark.read.parquet(basePath)
    val aggs = sumCols.map(c => sum(col(c)).as(s"sum_$c")) ++
      Seq(count(lit(1)).as("cnt")) ++
      minCols.map(c => min(col(c)).as(s"min_$c")) ++
      maxCols.map(c => max(col(c)).as(s"max_$c"))
    base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(summaryPath)
    val spec = SummarySpec(normalize(basePath), normalize(summaryPath),
      groupCols, sumCols, minCols, maxCols)
    registry.put(spec.basePath, spec)
    spec
  }

  def deregister(basePath: String): Unit = registry.remove(normalize(basePath))
  def clear(): Unit = registry.clear()

  /** The child under an Aggregate qualifies when it is the base
    * relation itself, optionally under pure column-pruning Projects
    * (bare attribute references only — a computed projection would
    * change the algebra). */
  private def baseSpecOf(plan: LogicalPlan): Option[SummarySpec] = plan match {
    case Project(projectList, child)
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      baseSpecOf(child)
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.iterator
          .map(p => registry.get(normalize(p.toString)))
          .collectFirst { case Some(s) => s }
        case _ => None
      }
    case _ => None
  }

  /** The derived aggregate over the summary for one original aggregate
    * expression, or None when it is not re-aggregable from this spec. */
  private def derive(spec: SummarySpec, ne: NamedExpression)
      : Option[org.apache.spark.sql.Column] = ne match {
    case a @ Alias(AggregateExpression(fn, Complete, false, None, _), _) =>
      fn match {
        case Sum(ar: AttributeReference, _) if spec.sumCols.contains(ar.name) =>
          Some(sum(col(s"sum_${ar.name}")).as(a.name))
        case Count(Seq(Literal(1, _))) =>
          // COUNT is non-null (0 on empty input) but SUM is NULL on
          // empty input — bare sum(cnt) would surface NULL to SQL-level
          // consumers for a grouping-less aggregate over an empty base.
          // coalesce restores count's algebra AND its non-nullable type.
          Some(org.apache.spark.sql.functions
            .coalesce(sum(col("cnt")), lit(0L)).as(a.name))
        case Min(ar: AttributeReference) if spec.minCols.contains(ar.name) =>
          Some(min(col(s"min_${ar.name}")).as(a.name))
        case Max(ar: AttributeReference) if spec.maxCols.contains(ar.name) =>
          Some(max(col(s"max_${ar.name}")).as(a.name))
        case _ => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty) return plan
    plan.transform {
      case agg @ Aggregate(groupingExprs, aggExprs, child, _) =>
        rewrite(agg, groupingExprs, aggExprs, child).getOrElse(agg)
    }
  }

  private def rewrite(agg: Aggregate, groupingExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression], child: LogicalPlan): Option[LogicalPlan] = {
    val spec = baseSpecOf(child).getOrElse(return None)
    // grouping must be bare summary group columns
    val groupNames = groupingExprs.map {
      case ar: AttributeReference if spec.groupCols.contains(ar.name) => ar.name
      case _ => return None
    }
    // every output: a grouping passthrough or a re-aggregable aggregate
    val derived: Seq[org.apache.spark.sql.Column] = aggExprs.map {
      case ar: AttributeReference if groupNames.contains(ar.name) =>
        col(ar.name)
      case ne => derive(spec, ne).getOrElse(return None)
    }
    val spark = SparkSession.active
    // fail OPEN: a rewrite is an optimization, so a vacuumed/moved
    // summary must fall back to the base scan, never kill the query
    // (contrast RowPolicy, which fails CLOSED — security vs speed)
    val summaryDf = try spark.read.parquet(spec.summaryPath)
    catch { case _: org.apache.spark.sql.AnalysisException => return None }
    val replacement: DataFrame = summaryDf
      .groupBy(groupNames.map(col): _*)
      .agg(derived.head, derived.tail: _*)
      .select(aggExprs.map(ne => col(ne.name)): _*)
    val newPlan = replacement.queryExecution.optimizedPlan
    // types AND nullability must be identical, else the algebra was not
    // an identity (a nullable column where the original was non-null
    // changes isNull predicates / sink schemas downstream)
    val oldOut = agg.output
    val newOut = newPlan.output
    if (oldOut.map(a => (a.dataType, a.nullable)) !=
        newOut.map(a => (a.dataType, a.nullable))) return None
    // restore the ORIGINAL ExprIds so parents keep resolving
    val restored = oldOut.zip(newOut).map { case (o: Attribute, n: Attribute) =>
      Alias(n, o.name)(exprId = o.exprId)
    }
    Some(Project(restored, newPlan))
  }
}
