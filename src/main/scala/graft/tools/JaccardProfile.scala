package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextOps}
import graft.queries.Tables

/** Scratch driver: stage-by-stage timing of the ngram-jaccard plan. */
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }

    val docs = Tables.documents(spark, sfDir)
    val dups = docs.select(col("doc_id"), col("text"))
      .union(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))

    val sh = dups.select(col("doc_id").as("id"),
      TextOps.wordShingles(col("text"), 3).as("shingles"))
      .filter(size(col("shingles")) > 0)
    time("shingles count")(println(sh.count()))
    time("shingles again (recompute cost)")(println(sh.count()))

    val inv = sh.select(col("id"), size(col("shingles")).as("n_sh"), explode(col("shingles")).as("sh"))
    time("inverted index count")(println(inv.count()))

    val dfreq = inv.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    time("dfreq")(println(dfreq.count()))
    time("df stats")(dfreq.agg(max("df"), avg("df")).show())

    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id")).orderBy(col("df").asc, col("sh").asc)
    val prefix = inv.join(dfreq, "sh")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("n_sh") - ceil(lit(0.5) * col("n_sh")) + 1)
      .select(col("id"), col("sh"))
    time("prefix count")(println(prefix.count()))

    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    time("candidates")(println(cand.count()))

    val full = time("full pipeline")(
      Dedup.ngramJaccardPairs(dups, "doc_id", "text", 3, 0.5).count())
    println(s"pairs=$full")
    spark.stop()
  }
}
