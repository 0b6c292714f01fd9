package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: does batch session_window MERGE two events exactly
  * gap seconds apart (adjacent ranges), or start a new session?
  * Also probes the 1µs-under and 1µs-over boundaries. */
object SessionWindowProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // base epoch micros; gap = 30 min = 1_800_000_000 µs
    val base = 1700000000000000L
    val cases = Seq(
      ("exact", Seq(base, base + 1800000000L)),
      ("under", Seq(base, base + 1799999999L)),
      ("over", Seq(base, base + 1800000001L)))
    cases.foreach { case (name, ts) =>
      val df = ts.toDF("us").select(timestamp_micros(col("us")).as("ts"))
      val n = df.groupBy(session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n")).count()
      println(s"PROBE $name: sessions=$n")
    }
    spark.stop()
  }
}
