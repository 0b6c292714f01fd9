package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: confirm the parquet `_metadata` hidden column carries
  * `row_index` / `file_path` on this Spark build (driver-side tooling). */
object MetaColsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("metaprobe").toString + "/t"
    (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .coalesce(2).write.parquet(dir)
    val df = spark.read.parquet(dir)
      .select(col("id"), col("_metadata.file_path").as("fp"),
        col("_metadata.row_index").as("ri"))
    df.show(12, false)
    println("schema: " + df.schema.simpleString)
    spark.stop()
  }
}
