package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Slowly-changing-dimension (SCD type 2) maintenance — the incremental
  * "merge changes into a versioned dimension" primitive a 100 TB lakehouse
  * pipeline runs on every load.
  *
  * Input is a change log: one row per (key, version) carrying the
  * attribute values observed at that version (a union of the current
  * snapshot and any number of update batches). Output is the validity-
  * interval form: consecutive versions with identical attributes are
  * compressed into one row, each surviving row carries
  * [valid_from, valid_to] and an is_current flag.
  *
  * Scale design: one shuffle on the key (both the change-compression lag
  * and the intervalization lead share the same window sort — Catalyst
  * plans a single Exchange + Sort). No self-joins, no full-outer merge:
  * at 10^9 keys the cost is one key-partitioned window pass.
  */
object Scd {

  /** Compress a change log and emit SCD2 validity intervals.
    *
    * @param changes  change log rows: keyCols ++ (versionCol) ++ attrCols
    * @param keyCols  business key
    * @param versionCol  monotone version / load-batch number (numeric)
    * @param attrCols tracked attributes; a version whose attrs equal the
    *                 previous version's (null-safe) is dropped
    */
  def scd2(changes: DataFrame, keyCols: Seq[String], versionCol: String,
      attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol).asc)
    val attrs = struct(attrCols.map(col): _*)
    // collision-free helper name (callers may own a "prev"-like column)
    val prev = Iterator.from(0).map(i => s"__prev$i")
      .find(n => !changes.columns.contains(n)).get
    val kept = changes
      .withColumn(prev, lag(attrs, 1).over(w))
      .filter(col(prev).isNull || !(col(prev) <=> attrs))
      .drop(prev)
    kept
      .withColumn("valid_from", col(versionCol).cast(LongType))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w).cast(LongType) - 1)
      .withColumn("is_current", col("valid_to").isNull)
      .drop(versionCol)
  }
}
