package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.long_dot

/** Deterministic distributed clustering over embedding columns: exact
  * integer k-means (Lloyd's) and SemDeDup-style within-cluster semantic
  * dedup.
  *
  * Cross-engine determinism recipe (the same ladder as the z-score /
  * moments queries): floats snap to integer micro-units once; every
  * distance is an EXACT integer ([[graft.functions.LongVectorSqDist]]);
  * argmin packs (dist, cid) into one scalar key so ties break on cluster
  * id identically everywhere; centroid updates recompute round(mean) from
  * exact integer sums with one IEEE division — so a DuckDB oracle
  * replaying the same unrolled iterations reproduces every assignment
  * bit-for-bit. Floating-point k-means is famously run-to-run
  * irreproducible on a cluster (reduction order); this one is not.
  *
  * Scale shape: each iteration's assignment is a broadcast of the K
  * centroid rows against the corpus — the corpus itself never shuffles
  * for assignment, and the centroid update shuffles only (cid, dim, v)
  * triples that combine map-side into K·dims groups. Driver holds no
  * data; iterations extend lineage only (for many iterations at 100 TB,
  * checkpoint between rounds like Dedup.connectedComponents does). */
object Clustering {

  /** Snap a float vector to exact integer micro-units (round half away
    * from zero — both engines' rule for double round()). */
  def microVec(c: Column, scale: Long = 1000000L): Column =
    transform(c, x => round(x.cast("double") * scale).cast("long"))

  /** Lloyd's k-means over micro-unit vectors; returns the final
    * assignment (id, xm, cid, dist). Seeds are the `k` lowest-id vectors
    * (deterministic); `iters` assignment rounds with `iters - 1`
    * interleaved centroid updates. Empty clusters drop out (their cid is
    * simply never assigned again) — mirrored by the oracle. */
  def kmeansMicroAssign(vecs0: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    require(k >= 2 && iters >= 1, "need k >= 2 and iters >= 1")
    val vecs = vecs0.select(col(idCol).cast("long").as("id"),
      microVec(col(vecCol)).as("xm"))
    var centroids = vecs.orderBy("id").limit(k)
      .withColumn("cid", (row_number().over(Window.orderBy("id")) - 1).cast("long"))
      .select(col("cid"), col("xm").as("cm"))
    var assign: DataFrame = assignStep(vecs, centroids, k)
    for (_ <- 2 to iters) {
      centroids = updateStep(assign)
      assign = assignStep(vecs, centroids, k)
    }
    assign
  }

  /** One assignment round: nearest centroid by exact integer distance,
    * ties to the lowest cid via the packed (dist·k + cid) scalar key.
    *
    * ZERO corpus shuffle: the surviving centroids fold into a ONE-ROW
    * frame (cid-sorted parallel arrays: flattened k·d matrix + cids) that
    * broadcasts to every task, and the argmin is computed row-locally by
    * the codegen'd [[graft.functions.LongVectorArgminKey]] kernel. The
    * previous formulation (crossJoin(broadcast(centroids)) then
    * `groupBy(id, xm).agg(min(key))`) carried every vector through a
    * corpus-wide shuffle per iteration — same integers, wrong plan at
    * 100 TB. Packed-key overflow throws (see the kernel's bound) instead
    * of silently wrapping. Pinned exchange-free in PlanAuditSpec. */
  private def assignStep(vecs: DataFrame, centroids: DataFrame, k: Int): DataFrame = {
    val packed = centroids
      .agg(sort_array(collect_list(struct(col("cid"), col("cm")))).as("cs"))
      .select(
        transform(col("cs"), s => s.getField("cid")).as("cids"),
        flatten(transform(col("cs"), s => s.getField("cm"))).as("cmat"))
    vecs.crossJoin(broadcast(packed))
      .withColumn("key",
        graft.functions.long_argmin_key(col("xm"), col("cmat"), col("cids"), k))
      .select(col("id"), col("xm"), (col("key") % k).as("cid"),
        expr(s"key div $k").as("dist"))
  }

  /** One centroid update: per-dimension exact integer sums, then
    * round(mean) back to micro-units (one IEEE division per dimension). */
  private def updateStep(assign: DataFrame): DataFrame =
    assign.select(col("cid"), posexplode(col("xm")).as(Seq("dim", "v")))
      .groupBy(col("cid"), col("dim"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("cm_j",
        round(col("s").cast("double") / col("n").cast("double")).cast("long"))
      .groupBy(col("cid"))
      .agg(transform(sort_array(collect_list(struct(col("dim"), col("cm_j")))),
        s => s.getField("cm_j")).as("cm"))

  /** SemDeDup: within each k-means cluster, every (lower-id, higher-id)
    * pair whose exact-arithmetic cosine exceeds `cosTimes1e3 / 1000`.
    * The cosine test is integer-exact: cos(a,b) > t  ⟺  dot > 0 and
    * dot²·10⁶ > t²·10⁶·‖a‖²·‖b‖², evaluated in DECIMAL(38) (fits: micro
    * dots ≤ ~1e14 → squares ≤ ~1e28·1e6 = 1e34). Clusters bound the pair
    * blowup to Σ|cluster|² — the same candidate-bounding argument as
    * blocked fuzzy dedup; the join key is the cluster id. */
  def semanticDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, cosTimes1e3: Int): DataFrame = {
    val dec = DecimalType(19, 0)
    val assign = kmeansMicroAssign(vecs, idCol, vecCol, k, iters)
      .withColumn("n2", long_dot(col("xm"), col("xm")))
    val a = assign.select(col("cid"), col("id").as("keep_id"),
      col("xm").as("a_xm"), col("n2").as("a_n2"))
    val b = assign.select(col("cid"), col("id").as("drop_id"),
      col("xm").as("b_xm"), col("n2").as("b_n2"))
    val t2 = lit(cosTimes1e3.toLong * cosTimes1e3)
    val dot = long_dot(col("a_xm"), col("b_xm"))
    a.join(b, Seq("cid"))
      .filter(col("keep_id") < col("drop_id"))
      .withColumn("dot", dot)
      .filter(col("dot") > 0 &&
        col("dot").cast(dec) * col("dot").cast(dec) * lit(1000000L) >
          t2 * col("a_n2").cast(dec) * col("b_n2").cast(dec))
      .select(col("cid"), col("keep_id"), col("drop_id"))
  }
}
