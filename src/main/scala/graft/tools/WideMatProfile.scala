package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.transform.CleanRows

/** Scratch: compare materialization strategies for the clean_rows_wide
  * input (which CleanRows executes 3x: 2 batched profiling aggs + the
  * recode projection). Variants: none / persist(DISK_ONLY) /
  * localCheckpoint(eager). */
object WideMatProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.maxFields", "1500")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    def run(tag: String, rep: Int)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      mk.orderBy(col("Connect_ID").cast("long"))
        .write.format("noop").mode("overwrite").save()
      println(f"[mat] $tag rep$rep ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    for (rep <- 1 to 3) {
      run("plain", rep) { CleanRows(graft.queries.SurveyQueries.wideRows(spark, sf)) }
      run("disk-persist", rep) {
        val w = graft.queries.SurveyQueries.wideRows(spark, sf)
          .persist(StorageLevel.DISK_ONLY)
        try CleanRows(w)
        finally () // unpersisted below after the action
      }
      spark.sharedState.cacheManager.clearCache()
      run("local-checkpoint", rep) {
        CleanRows(graft.queries.SurveyQueries.wideRows(spark, sf).localCheckpoint(true))
      }
    }
    spark.stop()
  }
}
