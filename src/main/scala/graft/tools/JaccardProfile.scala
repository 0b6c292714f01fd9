package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ops.TextOps

/** Scratch: stage-by-stage timing of the jaccard pipeline at a given SF. */
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    val docs = {
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      val exact = d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"))
      val near = d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(col("text"), lit(" extratoken")).as("text"))
      d.select(col("doc_id"), col("text")).union(exact).union(near)
    }

    val threshold = 0.5
    val inv = TextOps.wordShingleRows(docs, "doc_id", "text", 3)
      .select(col("id"), graft.functions.md5_hash64(col("sh")).as("sh"))
      .persist()
    t("inv materialize")(inv.count())
    val counts = inv.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val dfreq = inv.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("id")).orderBy(col("df").asc, col("sh").asc)
    val prefix = inv.join(dfreq, "sh").join(counts, "id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("n_sh") - ceil(lit(threshold) * col("n_sh")) + 1)
      .select(col("id"), col("sh"), col("rn"), col("n_sh"))
      .persist()
    t("prefix materialize")(println("prefix rows " + prefix.count()))
    val alpha = ceil(lit(threshold / (1 + threshold)) * (col("a.n_sh") + col("b.n_sh")))
    val overlapUb = lit(1) + least(
      col("a.n_sh") - col("a.rn"), col("b.n_sh") - col("b.rn"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id") &&
        col("b.n_sh") >= ceil(lit(threshold) * col("a.n_sh")) &&
        col("b.n_sh") <= floor(col("a.n_sh") / lit(threshold)) &&
        overlapUb >= alpha)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
      .persist()
    t("candidates")(println("cand rows " + cand.count()))
    val shared = cand
      .join(inv.select(col("id").as("id_a"), col("sh")), "id_a")
      .join(inv.select(col("id").as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_shared"))
    t("overlap count")(println("shared rows " + shared.count()))
    spark.stop()
  }
}
