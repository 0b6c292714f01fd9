package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: run selected queries through the noop sink and
  * report how many Spark JOBS each launched (plus wall seconds). The
  * lake-interop gates' cost is not one big plan but MANY tiny jobs
  * (scratch-fixture writes, metadata-plane reads), which a formatted
  * plan of the returned DataFrame cannot show — this scheduler-level
  * count is the before/after evidence for optimizations that remove
  * whole jobs (guide §1: measure what the change actually targets).
  * Usage: runMain graft.tools.JobCountProbe <sfDir> <name> [name...] */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.sql.codegen.maxFields", "1500")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val counter = new java.util.concurrent.atomic.AtomicInteger()
    val verbose = sys.env.get("JOBS_VERBOSE").contains("1")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val n = counter.incrementAndGet()
          if (verbose) {
            val p = Option(j.properties)
            def prop(k: String) = p.flatMap(x => Option(x.getProperty(k))).getOrElse("")
            val site = Seq("callSite.short", "spark.sql.execution.root.id")
              .map(prop).filter(_.nonEmpty).mkString(" | ")
            val stages = j.stageInfos.map(s => s.name.takeWhile(_ != '\n')).distinct
              .mkString("; ")
            System.err.println(s"[job $n] $site :: $stages")
          }
        }
      })
    args.drop(1).foreach { n =>
      val q = graft.SparkEntry.allQueries.find(_.name == n)
        .getOrElse(sys.error(s"unknown query $n"))
      // warm rep: JIT/codegen/readers, exactly like Bench's rep 0
      q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
      Thread.sleep(300) // drain async listener events from the warm rep
      counter.set(0)
      val t0 = System.nanoTime()
      q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // late events land before the count is read
      println(f"[jobs] $n jobs=${counter.get()} sec=$sec%.2f")
    }
    spark.stop()
  }
}
