package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.Dedup
import graft.streaming.EventStreams

/** Scratch driver for the streaming LSH probe (verify-recipe surface #1):
  * writes the even-doc corpus band index bucketed, streams the odd docs
  * against it through [[EventStreams.lshDedupStream]], and prints the
  * flagged set alongside the batch probe's on the same files. */
object StreamLshDemo {
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

    val docs = graft.queries.Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 2 === 0).select(col("doc_id"), col("text"))
    Dedup.writeBandIndex(corpus, "doc_id", "text", "stream_lsh_demo_index",
      buckets = 4,
      path = Some(java.nio.file.Files.createTempDirectory("stream-lsh-demo").toString))
    val index = spark.read.table("stream_lsh_demo_index")

    val flagged = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
    val q = EventStreams.lshDedupStream(
        EventStreams.readDocuments(spark, sf).filter(col("doc_id") % 2 === 1),
        index,
        (out, _) => flagged.synchronized {
          flagged ++= out.collect().map(r => (r.getLong(0), r.getLong(1)))
        })
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("stream-lsh-demo-ckpt").toString)
      .start()
    q.processAllAvailable()
    q.stop()

    val batch = Dedup.incrementalLshDups(
        docs.filter(col("doc_id") % 2 === 1).select(col("doc_id"), col("text")),
        index, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[stream-lsh] streamed flags = ${flagged.size}, batch flags = ${batch.size}, " +
      s"equal = ${flagged.toSet == batch}")
    println(s"[stream-lsh] sample: ${flagged.sortBy(_._1).take(5).mkString(", ")}")
    spark.stop()
  }
}
