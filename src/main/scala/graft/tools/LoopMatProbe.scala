package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch A/B: loop-carried materialization strategy
  * (`spark.graft.loop.materialize` = reliable eager checkpoint vs
  * localCheckpoint) on the iterative gates, alternated within ONE
  * session so box drift hits both arms equally. Usage:
  *   sbt "runMain graft.tools.LoopMatProbe [sfDir] [reps]"
  */
object LoopMatProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("q_kcore", "q_label_prop", "q_pagerank_dangling",
      "dedup_cluster", "q_shortest_paths", "sim_mmr", "text_bpe_train")
    val byName = graft.SparkEntry.allQueries.map(q => q.name -> q).toMap
    names.foreach { n =>
      val q = byName(n)
      def time(mode: String): Double = {
        spark.conf.set("spark.graft.loop.materialize", mode)
        val t0 = System.nanoTime()
        q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // warm both arms once, then alternate timed reps
      time("reliable"); time("local")
      val rel = scala.collection.mutable.ArrayBuffer.empty[Double]
      val loc = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { _ => rel += time("reliable"); loc += time("local") }
      println(f"$n%-22s reliable=${rel.min}%.2f (${rel.mkString(",")})  local=${loc.min}%.2f (${loc.mkString(",")})")
    }
    spark.stop()
  }
}
