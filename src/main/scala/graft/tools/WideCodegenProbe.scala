package graft.tools

/** Scratch A/B: wide-gate codegen configs, alternated in ONE session so
  * box drift hits every arm equally. maxFields/methodSplitThreshold are
  * runtime SQLConfs read at physical planning, so per-run set/restore is
  * sound. Usage: runMain graft.tools.WideCodegenProbe <sfDir> <reps>
  */
object WideCodegenProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val byName = graft.SparkEntry.allQueries.map(q => q.name -> q).toMap
    val arms: Seq[(String, Map[String, String])] = Seq(
      "mf1500" -> Map("spark.sql.codegen.maxFields" -> "1500"),
      "mf550" -> Map("spark.sql.codegen.maxFields" -> "550"),
      "mf500" -> Map("spark.sql.codegen.maxFields" -> "500"),
      "mf100" -> Map("spark.sql.codegen.maxFields" -> "100"))
    val gates = Seq("clean_rows_wide", "profile_binary_wide",
      "clean_columns_wide", "merge_table_versions_wide", "profile_false_array_wide")
    gates.foreach { n =>
      val q = byName(n)
      def time(confs: Map[String, String]): Double = {
        val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        try {
          val t0 = System.nanoTime()
          q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } finally saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
      arms.foreach { case (_, c) => time(c) } // warm every arm
      val mins = arms.map { case (tag, c) =>
        tag -> (1 to reps).map(_ => time(c)).min
      }
      println(f"$n%-28s ${mins.map { case (t, v) => f"$t=$v%.2f" }.mkString("  ")}")
    }
    spark.stop()
  }
}
