package graft.tools

/** Scratch A/B: time selected queries under an optional session-level
  * filesystem/streaming config mode. `fs.file.impl` is pinned at
  * FileSystem-cache population, so each mode needs its own JVM — run one
  * mode per invocation and compare logs.
  *
  * Usage: runMain graft.tools.FsModeProbe <sfDir> <reps> <mode> <name...>
  * modes: base | rawfs | maint | rawfs+maint
  */
object FsModeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val mode = args(2)
    val names = args.drop(3)
    var b = graft.GraftSession.localBuilder("32")
    if (mode.contains("rawfs"))
      // local-FS client-side checksums double the small-file count of
      // every write (one .crc per file). HDFS/object stores do not use
      // ChecksumFileSystem, so production pays this nowhere — disabling
      // it locally moves the bench CLOSER to the production cost model.
      b = b.config("spark.hadoop.fs.file.impl",
        "org.apache.hadoop.fs.RawLocalFileSystem")
    if (mode.contains("maint"))
      b = b.config("spark.sql.streaming.stateStore.maintenanceInterval", "600s")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val byName = graft.SparkEntry.allQueries.map(q => q.name -> q).toMap
    names.foreach { n =>
      val q = byName(n)
      def run(): Double = {
        val t0 = System.nanoTime()
        q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm
      graft.streaming.EventStreams.resetDrainStats()
      val times = (1 to reps).map(_ => run())
      val ds = graft.streaming.EventStreams.drainStats
      val trig = if (ds.batches > 0) f" trig=${ds.triggerMs / 1000.0 / reps}%.2f b=${ds.batches / reps}" else ""
      println(f"[fsmode $mode] $n%-30s min=${times.min}%.2f (${times.map(t => f"$t%.2f").mkString(",")})$trig")
    }
    spark.stop()
    println(s"[fsmode $mode] done")
  }
}
