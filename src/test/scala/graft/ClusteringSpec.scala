package graft

import org.apache.spark.sql.functions._

import graft.ops.Clustering

/** Pins for the deterministic k-means: bit-level partition invariance
  * (the property that makes the unrolled DuckDB oracle possible at all),
  * tie-breaking, and empty-cluster dropout. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("assignment is bit-identical under any input partitioning") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def run(parts: Int) =
      Clustering.kmeansMicroAssign(emb.repartition(parts), "vec_id", "embedding",
          k = 8, iters = 3)
        .select("id", "cid", "dist").orderBy("id")
        .as[(Long, Long, Long)].collect().toSeq
    assert(run(1) == run(16))
  }

  test("semantic dup pairs are partition-invariant too") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val perturbed = emb.select((col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.01f)).as("embedding"))
    val corpus = emb.select(col("vec_id"), col("embedding")).union(perturbed)
    def run(parts: Int) =
      Clustering.semanticDupPairs(corpus.repartition(parts), "vec_id", "embedding",
          k = 4, iters = 2, cosTimes1e3 = 950)
        .orderBy("keep_id", "drop_id")
        .select("keep_id", "drop_id").as[(Long, Long)].collect().toSeq
    val r = run(3)
    assert(r == run(11))
    // every original/perturbed twin that shares a cluster must be found
    assert(r.nonEmpty && r.forall { case (a, b) => b == a + 100000 })
  }

  test("distance ties break to the lowest cid; empty clusters drop out") {
    // two identical seeds: every vector ties -> all assigned to cid 0,
    // cid 1 goes empty and disappears from later rounds
    val df = Seq((1L, Seq(0f)), (2L, Seq(0f)), (3L, Seq(5f)))
      .toDF("vec_id", "embedding")
    val out = Clustering.kmeansMicroAssign(df, "vec_id", "embedding", k = 2, iters = 2)
      .select("id", "cid").orderBy("id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 0L), (2L, 0L), (3L, 0L)))
  }
}
