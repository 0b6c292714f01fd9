package graft.tools

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Scratch: the round-16 mergeInto matched-files subtree before/after —
  * invisible in the gate-level explain (it runs inside
  * DeltaCompat.mergeInto before the returned frame exists). Both
  * formulations reconstructed verbatim from git history, one tree, one
  * Spark version (the r15 RoundPlanDump recipe).
  * Usage: runMain graft.tools.Round16SubtreeDump <sfDir> <outDir> */
object Round16SubtreeDump {
  def main(args: Array[String]): Unit = {
    val (d, outDir) = (args(0), args(1))
    val spark = graft.GraftSession.localBuilder("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val li = graft.queries.Tables.lineitem(spark, d)
      .groupBy(col("l_orderkey").as("k"))
      .agg(sum(expr("cast(round(l_quantity * 100) as bigint)")).as("q"))
    val source = li.filter(col("k") % 7 === 0)
    // stand-in for maskedWithProvenance's output: data cols + file path
    val base = li.withColumn("__gm_file",
      concat(lit("part-"), (col("k") % 2).cast("string")))
    val before = base
      .join(source.select(col("k")).distinct(), Seq("k"), "left_semi")
      .select(col("__gm_file")).distinct()
    val after = base
      .join(source.select(col("k")), Seq("k"), "left_semi")
      .select(col("__gm_file")).distinct()
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/$name.txt"),
        df.queryExecution.explainString(FormattedMode)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    dump("delta_merge_srckeys_before", before)
    dump("delta_merge_srckeys_after", after)
    println("dumped")
    spark.stop()
  }
}
