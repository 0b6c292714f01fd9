package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scratch: dump the formatted plans of the SUBTREES round 15 changed —
  * they are invisible in the gate-level explain (the k-core rounds sit
  * behind reliable checkpoints; the segment-frequency pass runs at
  * build time, before the returned frame exists). Both the old and new
  * formulations are reconstructed verbatim from git history so the
  * before/after pair comes from ONE tree and one Spark version.
  * Usage: runMain graft.tools.RoundPlanDump <sfDir> */
object RoundPlanDump {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    // ---- k-core: one peel round over the (checkpoint-free) edge set ----
    val li = graft.queries.Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("lo"))
      .join(li.select(col("l_orderkey").as("ok2"), col("l_partkey").as("hi")),
        col("ok") === col("ok2") && col("lo") < col("hi"))
      .select(least(col("lo"), col("hi")).as("lo"),
        greatest(col("lo"), col("hi")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
    val deg = e.select(col("lo").as("node"))
      .unionAll(e.select(col("hi").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val keep = deg.filter(col("d") >= 70).select(col("node"))
    val semi = e.join(keep.select(col("node").as("lo")), Seq("lo"), "left_semi")
      .join(keep.select(col("node").as("hi")), Seq("hi"), "left_semi")
    val drop = deg.filter(col("d") < 70).select(col("node"))
    val anti = e.join(drop.select(col("node").as("lo")), Seq("lo"), "left_anti")
      .join(drop.select(col("node").as("hi")), Seq("hi"), "left_anti")
    println("===== q_kcore_round_before (semi-join vs keep) =====")
    println(semi.queryExecution.explainString(FormattedMode))
    println("===== q_kcore_round_after (anti-join vs drop) =====")
    println(anti.queryExecution.explainString(FormattedMode))

    // ---- dedup_segments: the frequency pass ----
    val docs = graft.queries.Tables.documents(spark, d)
    val freqBefore = docs.select(col("doc_id").as("__id"),
        explode(graft.ops.TextOps.wordSegments(col("text"), 3)).as("seg"))
      .distinct()
      .groupBy(col("seg")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2)
    val freqAfter = docs
      .select(col("doc_id").cast(LongType).as("__id"), col("text").as("__text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        if (text == null) Iterator.empty
        else {
          val norm = graft.ops.TextOps.normalizeAsciiString(text)
          val seen = new java.util.HashSet[String]()
          norm.split(" ", -1).grouped(3).map(_.mkString(" "))
            .filter(seen.add).map(s => (id, s))
        }
      }.toDF("__id", "seg")
      .groupBy(col("seg")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2)
    println("===== dedup_segments_freq_before (explode + distinct + agg) =====")
    println(freqBefore.queryExecution.explainString(FormattedMode))
    println("===== dedup_segments_freq_after (typed flatMap + agg) =====")
    println(freqAfter.queryExecution.explainString(FormattedMode))
    spark.stop()
  }
}
