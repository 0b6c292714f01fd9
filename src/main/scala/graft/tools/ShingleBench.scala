package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.TextOps
import graft.queries.Tables

/** Scratch driver: window-lead vs arrays_zip shingle construction. */
object ShingleBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text"))

    // A: current window-lead implementation
    for (rep <- 1 to 3)
      time(s"window rep$rep")(println(
        TextOps.wordShingleRows(docs, "doc_id", "text", 3).count()))

    // B: arrays_zip + slice (no window shuffle)
    def zipShingles = {
      val w = TextOps.words(col("text"))
      docs.select(col("doc_id").as("id"),
          explode(arrays_zip(w, slice(w, 2, 1000000), slice(w, 3, 1000000))).as("z"))
        .filter(col("z.1").isNotNull && col("z.2").isNotNull)
        .select(col("id"), concat_ws(" ", col("z.0"), col("z.1"), col("z.2")).as("sh"))
        .distinct()
    }
    for (rep <- 1 to 3) time(s"zip rep$rep")(println(zipShingles.count()))
    spark.stop()
  }
}
