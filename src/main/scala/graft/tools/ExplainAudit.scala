package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump every query's formatted physical plan to an audit directory —
  * the scale review artifact: check pushed filters, ReadSchema pruning,
  * broadcast vs shuffle joins, WholeStageCodegen spans, exchange reuse. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft-plans"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.allQueries.foreach { q =>
      try {
        val df = q.build(spark, sfDir)
        val text = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        graft.audit.Audit.saveText(text, s"$outDir/${q.name}.plan.txt")
        println(s"[plan] ${q.name} -> $outDir/${q.name}.plan.txt")
      } catch {
        case e: Throwable => println(s"[plan] ${q.name} FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
