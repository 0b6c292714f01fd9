package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ops.TextOps
import graft.queries.Tables

/** Stage timing for the current (row-shingle) jaccard pipeline. */
object JaccardProfile2 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
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
      .union(docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(col("text"), lit(" extratoken")).as("text")))

    val inv = TextOps.wordShingleRows(dups, "doc_id", "text", 3).persist()
    time("inv materialize")(println(inv.count()))
    val counts = inv.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    time("counts")(println(counts.count()))
    val dfreq = inv.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    time("dfreq")(println(dfreq.count()))
    val w = Window.partitionBy(col("id")).orderBy(col("df").asc, col("sh").asc)
    val prefix = inv.join(dfreq, "sh").join(counts, "id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("n_sh") - ceil(lit(0.5) * col("n_sh")) + 1)
      .select(col("id"), col("sh"), col("rn"), col("n_sh")).persist()
    time("prefix")(println(prefix.count()))
    val alpha = ceil(lit(0.5 / 1.5) * (col("a.n_sh") + col("b.n_sh")))
    val overlapUb = lit(1) + least(col("a.n_sh") - col("a.rn"), col("b.n_sh") - col("b.rn"))
    val candRaw = prefix.as("a").join(prefix.as("b"),
      col("a.sh") === col("b.sh") && col("a.id") < col("b.id") &&
      col("b.n_sh") >= ceil(lit(0.5) * col("a.n_sh")) &&
      col("b.n_sh") <= floor(col("a.n_sh") / lit(0.5)) &&
      overlapUb >= alpha)
    time("cand raw rows")(println(candRaw.count()))
    val cand = candRaw.select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct().persist()
    time("cand distinct")(println(cand.count()))
    val arrays = inv.groupBy(col("id")).agg(collect_list(col("sh")).as("shingles"))
    time("arrays")(println(arrays.count()))
    val joined = cand
      .join(arrays.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(arrays.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("n_shared", size(array_intersect(col("sh_a"), col("sh_b"))))
    time("verify join+intersect")(println(joined.filter(col("n_shared") > 25).count()))
    spark.stop()
  }
}
