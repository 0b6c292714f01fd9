package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch: PQ precision vs exact-L2 top-20 across (m, ks, iters). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val emb = graft.queries.Tables.embeddings(spark, sf)
    val isQuery = col("vec_id") % 50 === 0
    val base = emb.select(col("vec_id").cast("long").as("id"),
      graft.ops.Clustering.microVec(col("embedding")).as("xm"))
    val q = base.filter(col("id") % 50 === 0)
      .select(col("id").as("query_id"), col("xm").as("qm"))
    val w = Window.partitionBy("query_id").orderBy(col("d").asc, col("cand_id").asc)
    val brute = base.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("cand_id"),
        graft.functions.long_sqdist(col("qm"), col("xm")).as("d"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 20)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((m, ks, iters) <- Seq((8, 16, 2), (8, 16, 4), (8, 32, 2), (8, 64, 2),
        (8, 64, 3), (4, 64, 2), (8, 128, 2), (8, 256, 2))) {
      val pq = graft.ops.Pq.pqTopK(emb, "vec_id", "embedding", isQuery,
          k = 5, dim = 64, m = m, ks = ks, iters = iters)
        .select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val good = pq.count(brute.contains)
      println(f"m=$m ks=$ks iters=$iters precision=${good.toDouble / pq.length}%.3f ($good/${pq.length})")
    }
    spark.stop()
  }
}
