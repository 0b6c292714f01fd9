package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** A whole-operator as-of join as a first-class plan node — extension
  * path (c) from the build guidelines: custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan`, injected via `SparkSessionExtensions`.
  *
  * Semantics (left as-of join): every left row picks the LATEST right
  * row of the same key with rightTs <= leftTs, carrying `carried`
  * columns (null when no such row) — DuckDB's `ASOF LEFT JOIN`, which is
  * exactly what the `q_asof_native` oracle checks.
  *
  * Why a physical operator: the composable formulations (union+window in
  * [[graft.ops.AsOf]], or a range join + per-left-row top-1) either
  * widen every left row through a window over the unioned stream or
  * generate candidate pairs to rank. This exec is the textbook
  * merge-scan: both sides hash-partitioned by key and sorted by
  * (key, ts) — ONE shuffle each, no pair blowup — then a single forward
  * pass per partition with O(1) carried state. At 100 TB that is the
  * same cost shape as a sort-merge join, with no join explosion on hot
  * keys and no window state.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    carried: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ carried.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] to [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, carried) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, carried) :: Nil
    case _ => Nil
  }
}

/** Merge-scan as-of join. EnsureRequirements satisfies the declared
  * distribution (hash by key) and ordering ((key, ts) ascending) with
  * one exchange + sort per side; `doExecute` then merges co-partitioned
  * sorted streams: advance the right cursor while it is at-or-before the
  * current left row, remembering the latest same-key right row. */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    carried: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ carried.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lkIdx = lOut.indexWhere(_.exprId == leftKey.exprId)
    val ltIdx = lOut.indexWhere(_.exprId == leftTs.exprId)
    val rkIdx = rOut.indexWhere(_.exprId == rightKey.exprId)
    val rtIdx = rOut.indexWhere(_.exprId == rightTs.exprId)
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
    val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
    val outAttrs = output
    val joinedSchema = lOut ++ rOut

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val project = UnsafeProjection.create(outAttrs, joinedSchema)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rRow: InternalRow = _
        private var rKey: Any = _
        private var rTs: Any = _
        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rRow = rIter.next()
            rKey = rRow.get(rkIdx, keyType)
            rTs = rRow.get(rtIdx, tsType)
          } else rRow = null
        advanceRight()

        // latest admitted right row for `memKey` (copied: UnsafeRow
        // iterators reuse their buffer)
        private var memKey: Any = _
        private var memRow: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lRow.get(lkIdx, keyType)
          val lTs = lRow.get(ltIdx, tsType)
          // NULL keys/timestamps never match (SQL equality/<= semantics)
          if (lKey == null || lTs == null) return project(joined(lRow, nullRight))
          // admit right rows at-or-before (lKey, lTs); NULLs sort first
          // under the required SortOrder, so skipping them here cannot
          // skip past a matchable row
          var continue = rRow != null
          while (continue) {
            if (rKey == null || rTs == null) advanceRight()
            else {
              val kc = keyOrd.compare(rKey, lKey)
              if (kc < 0) advanceRight()
              else if (kc == 0 && tsOrd.compare(rTs, lTs) <= 0) {
                memKey = rKey
                memRow = rRow.copy()
                advanceRight()
              } else continue = false
            }
            if (rRow == null) continue = false
          }
          val rightSide =
            if (memRow != null && keyOrd.compare(memKey, lKey) == 0) memRow
            else nullRight
          project(joined(lRow, rightSide))
        }
      }
    }
  }
}
