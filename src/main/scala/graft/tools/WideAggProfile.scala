package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: where does profile_binary_wide spend time — analysis,
  * physical planning, or execution? */
object WideAggProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.maxFields", sys.env.getOrElse("MAXF", "100"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    val q = graft.SparkEntry.allQueries.find(_.name == "profile_binary_wide").get
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val df = t("build") { q.build(spark, sf) }
      t("analyze") { df.queryExecution.analyzed }
      t("optimize") { df.queryExecution.optimizedPlan }
      t("physical") { df.queryExecution.executedPlan }
      t("execute") { df.write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
