package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.transform.CleanRows

/** Scratch: stage-by-stage timing of the clean_rows_wide pipeline. */
object WideRowsProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val wide = graft.queries.SurveyQueries.wideRows(spark, sf)
      t("derive-only noop") { wide.write.format("noop").mode("overwrite").save() }
      val cls = t("classify (2 batched aggs)") { CleanRows.classify(wide) }
      val cleaned = t("plan recode") { CleanRows(wide, cls) }
      t("recode+sort noop") {
        cleaned.orderBy(col("Connect_ID").cast("long"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
