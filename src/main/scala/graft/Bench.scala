package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query is materialized through the `noop` sink — a plain
  * `count()` would let Catalyst prune the projection work (clean_columns
  * would be timed as a count over the scan), so noop is the honest cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: initializes codegen infra, parquet reader, shuffle
    // and noop-sink paths so the first timed query doesn't absorb one-off
    // JVM/session setup (worth ~5s on this box). Best-effort — a missing
    // warmup table must not kill the run.
    try {
      spark.range(1000).selectExpr("id % 7 AS k", "id AS v")
        .groupBy("k").count().write.format("noop").mode("overwrite").save()
      spark.read.parquet(s"$sfDir/region.parquet")
        .write.format("noop").mode("overwrite").save()
    } catch { case e: Throwable => System.err.println(s"[bench] warmup skipped: ${e.getMessage}") }
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.allQueries.map { q =>
      val t0 = System.nanoTime()
      val ok =
        try { q.build(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch {
          case e: Throwable =>
            failed += q.name
            System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
            false
        }
      (q.name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // A failed query's time-to-failure is reported as -1 and excluded from
    // "value": the headline number only reflects completed work.
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) f"$v%.3f" else "-1")
    }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
