package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams

/** One-off probe: which unmatched purchases does the left-outer
  * stream-stream join emit with a null click side after a full drain?
  * Prints the null-row purchase set + watermark ingredients so the
  * closed-form eviction predicate can be fixed against DuckDB. */
object OuterJoinProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.queries.Tables.events(spark, sf)
    val maxes = ev.groupBy(col("event_type"))
      .agg(max(unix_micros(col("ts"))).as("max_us"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"PROBE max_purchase_us=${maxes("purchase")} max_click_us=${maxes("click")}")
    val out = EventStreams.drainToMemory(
      EventStreams.purchasesWithClicksLeftOuter(EventStreams.readEvents(spark, sf)),
      OutputMode.Append, "probe_louter", statePartitions = Some(8))
    val nulls = out.filter(col("click_id").isNull)
      .select(col("purchase_id"), unix_micros(col("p_ts")).as("p_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    println(s"PROBE n_null_rows=${nulls.length}")
    println(s"PROBE max_null_p_us=${if (nulls.isEmpty) -1 else nulls.map(_._2).max}")
    val matched = out.filter(col("click_id").isNotNull).count()
    println(s"PROBE n_matched=$matched")
    // duplicates check: any purchase emitted both matched and null?
    val mp = out.filter(col("click_id").isNotNull).select("purchase_id")
      .distinct().collect().map(_.getLong(0)).toSet
    println(s"PROBE null_also_matched=${nulls.count(n => mp.contains(n._1))}")
    spark.stop()
  }
}
