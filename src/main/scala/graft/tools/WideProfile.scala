package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.transform.CleanRows

/** Scratch: wide-schema profiling cost vs batch size (driver-side
  * planning/codegen dominates; data is 50 rows). */
object WideProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nCols = args.headOption.map(_.toInt).getOrElse(1200)
    val cols = "Connect_ID" +: (0 until nCols).map(i => f"d_${100000000 + i}%09d")
    val schema = StructType(cols.map(c => StructField(c, StringType, nullable = true)))
    val rows = (0 until 50).map { r =>
      Row.fromSeq(r.toString +: (0 until nCols).map(i => if ((r + i) % 2 == 0) "1" else "0"))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    for (bs <- args.drop(1).map(_.toInt) match {
      case Array() => Seq(500, 100, 50)
      case a => a.toSeq
    }) {
      val t0 = System.nanoTime()
      val cls = CleanRows.classify(df, useReference = true, batchSize = bs)
      println(f"[wide] nCols=$nCols batch=$bs ${(System.nanoTime() - t0) / 1e9}%.1fs binary=${cls.binary.size}")
    }
    spark.stop()
  }
}
