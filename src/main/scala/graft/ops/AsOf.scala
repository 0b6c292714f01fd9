package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join: for every left row, the single latest
  * right row with the same key and right.ts <= left.ts — the
  * training-data primitive for aligning events to the feature/label
  * snapshot that was current when the event happened (no lookahead).
  *
  * Spark-first composition (preference (a) of SURVEY §7 — no custom
  * plan node needed): union both sides, then one `last(..., ignoreNulls)`
  * running window per key ordered by (ts, side) carries the most recent
  * right-side values onto each left row. ONE shuffle on the key, no
  * join explosion, no per-row probing — at 100 TB this is a single
  * exchange + sort, the same cost profile DuckDB/kdb implement natively.
  * Right rows sort BEFORE left rows at equal timestamps, giving
  * inclusive (<=) semantics, matching DuckDB `ASOF JOIN ... ON l.ts >=
  * r.ts` which the oracle uses.
  */
object AsOf {

  /** @param rightValueCols right columns to carry (everything else from
    *                       the right side is dropped)
    * @return left rows + `rightValueCols` (null where no right row
    *         precedes the left row) */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightValueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!rightValueCols.contains(key), "key cannot be a carried value column")
    val side = "__side"
    val ts = "__ts"
    val l = left.select(
      (col(key) +: col(leftTs).as(ts) +: lit(1).as(side) +:
        leftCols.filterNot(_ == key).map(col)) ++
        rightValueCols.map(c => lit(null).as(s"__r_$c")): _*)
    val r = right.select(
      (col(key) +: col(rightTs).as(ts) +: lit(0).as(side) +:
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c))) ++
        rightValueCols.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(
        (col(key) +: col(ts) +: col(side) +: leftCols.filterNot(_ == key).map(col)) ++
          rightValueCols.map(c => last(col(s"__r_$c"), ignoreNulls = true).over(w).as(c)): _*)
    carried.filter(col(side) === 1)
      .select(leftCols.map(col) ++ rightValueCols.map(col): _*)
  }
}
