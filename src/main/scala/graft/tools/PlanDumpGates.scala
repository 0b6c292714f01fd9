package graft.tools

import org.apache.spark.sql.execution.FormattedMode

/** Dump the formatted physical plan of named gates' RETURNED frames to
  * <outDir>/<name>.txt. Gate builders run for real (fixtures and
  * REQUIREs execute), so use a small SF. Session mirrors the bench
  * (GraftSession) so per-gate conf tweaks inside builders apply exactly
  * as they do in the measured runs.
  * Usage: runMain graft.tools.PlanDumpGates <sfDir> <outDir> <name...> */
object PlanDumpGates {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val spark = graft.GraftSession.localBuilder("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val byName = graft.SparkEntry.allQueries.map(q => q.name -> q).toMap
    args.drop(2).foreach { n =>
      val txt =
        try byName(n).build(spark, sfDir).queryExecution.explainString(FormattedMode)
        catch { case e: Throwable => s"<failed to build: ${e.getMessage}>" }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$n.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plan] $n -> $outDir/$n.txt")
    }
    spark.stop()
  }
}
