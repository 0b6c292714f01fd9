package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
/** Scratch: dump a query's formatted physical plan (driver-side debugging). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { n =>
      val q = graft.SparkEntry.allQueries.find(_.name == n).get
      println(s"===== $n =====")
      println(q.build(spark, args(0)).queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
