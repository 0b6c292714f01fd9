package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Scratch: per-feature-column timing of text_quality at a given SF. */
object QualityProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def t[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    val feats = TextOps.qualityFeatures(col("text"))
    // warm the scan
    docs.select(col("doc_id")).write.format("noop").mode("overwrite").save()
    feats.foreach { case (n, c) =>
      t(n)(docs.select(col("doc_id"), c.as(n)).write.format("noop").mode("overwrite").save())
      t(n + " again")(docs.select(col("doc_id"), c.as(n)).write.format("noop").mode("overwrite").save())
    }
    t("ALL")(docs.select(col("doc_id") +: feats.map { case (n, c) => c.as(n) }: _*)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
