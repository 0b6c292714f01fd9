package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch driver: repeat-time selected queries. Usage:
  * runMain graft.tools.QueryTime <sfDir> <reps> <name> [name...] */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSet
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SHUF", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.maxFields", sys.env.getOrElse("MAXF", "1500"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- graft.SparkEntry.allQueries if names.contains(q.name); r <- 1 to reps) {
      val t0 = System.nanoTime()
      q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[time] ${q.name} rep$r ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
