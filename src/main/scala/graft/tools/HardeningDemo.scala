package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Multimodal
import graft.sources.TableIO

/** Scratch driver (verify-recipe surface #1) for the round-5 hardening
  * APIs: permissive audio/video decode over a corpus with deterministic
  * corruption, schema-evolution reads, and small-files compaction. */
object HardeningDemo {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = graft.queries.Tables.documents(spark, sf).limit(50)
    val audio = Multimodal.audioCorpus(docs).withColumn("payload",
      when(col("media_id") % 5 === 0, expr("substring(payload, 1, 7)"))
        .otherwise(col("payload")))
    val a = Multimodal.decodeAudioSafe(audio)
      .agg(count(lit(1)), sum(when(col("decode_ok"), 0).otherwise(1))).head()
    println(s"[hardening] audio: ${a.getLong(0)} rows, ${a.getLong(1)} quarantined")

    val video = Multimodal.videoCorpus(docs).withColumn("payload",
      when(col("media_id") % 5 === 0, expr("substring(payload, 1, 11)"))
        .otherwise(col("payload")))
    val v = Multimodal.sampleVideoFramesSafe(video, everyNth = 2)
      .agg(count(lit(1)), sum(when(col("decode_ok"), 0).otherwise(1))).head()
    println(s"[hardening] video: ${v.getLong(0)} frame rows, ${v.getLong(1)} quarantined")

    val dir = java.nio.file.Files.createTempDirectory("hardening-demo").toString
    Seq((1L, "a")).toDF("id", "v_old").write.parquet(s"$dir/m/p1")
    Seq((2L, "b", 1.5)).toDF("id", "v_new", "score").write.parquet(s"$dir/m/p2")
    val merged = TableIO.readParquetMerged(spark, s"$dir/m/p1", s"$dir/m/p2")
    println(s"[hardening] merged schema: ${merged.columns.sorted.mkString(",")} rows=${merged.count()}")

    (1 to 400).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(16).write.parquet(s"$dir/c")
    TableIO.compact(spark, s"$dir/c", rowsPerFile = 200)
    val nFiles = new java.io.File(s"$dir/c").listFiles()
      .count(_.getName.endsWith(".parquet"))
    val total = spark.read.parquet(s"$dir/c").count()
    println(s"[hardening] compacted to $nFiles files, $total rows intact")
    spark.stop()
  }
}
