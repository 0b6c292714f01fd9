package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: left rows whose point timestamp
  * falls inside a right row's [start, end] interval, equi-matched on a
  * key.
  *
  * A naive formulation — equi-join on the key, then the range predicate
  * as a post-filter — materializes every (left, right) pair per key
  * before filtering; hot keys explode quadratically. This implementation
  * uses time binning: each interval is exploded to the bins it covers,
  * each point maps to exactly one bin, and the join key becomes
  * (key, bin) — candidates are only the pairs whose bin overlaps, then
  * the exact BETWEEN filter runs on that reduced set. Bin width trades
  * replication (intervals spanning many bins) against candidate
  * precision; pass roughly the typical interval length.
  */
object RangeJoin {

  /** @param binSeconds bin width; intervals are replicated into
    *                   ceil(len/bin)+1 bins, points into one */
  def pointInInterval(
      left: DataFrame, right: DataFrame, key: String,
      pointTs: String, startTs: String, endTs: String,
      binSeconds: Long): DataFrame = {
    val bin = lit(binSeconds)
    val lBin = (unix_timestamp(col(pointTs)) / bin).cast("long").as("__bin")
    val rBins = explode(sequence(
      (unix_timestamp(col(startTs)) / bin).cast("long"),
      (unix_timestamp(col(endTs)) / bin).cast("long"))).as("__bin")
    val l = left.select(col("*"), lBin)
    val r = right.select(col("*"), rBins)
    l.join(r, Seq(key, "__bin"))
      .filter(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .drop("__bin")
  }
}
