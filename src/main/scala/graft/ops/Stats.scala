package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact second-moment statistics over fixed-point columns — the
  * engine-deterministic alternative to `stddev`/`corr`/`covar_pop`.
  *
  * Why not the built-ins: float summation is non-associative, so a
  * double-based `corr` changes with partition count and row order — it
  * cannot sit behind a cross-engine (or even re-run) equality gate.
  * Spark's exact path (DECIMAL power sums) fixes determinism but runs
  * the aggregation on object-backed `Decimal` once the sum precision
  * exceeds 18 digits (21s for one hash agg at sf0.1 when this repo
  * measured it).
  *
  * This operator keeps BOTH properties: values become fixed-point
  * integers (`round(v * 10^scale)` as long), every power sum is exact
  * 64-bit integer arithmetic inside whole-stage codegen, and the two
  * large product sums are carried as hi/lo lanes split at 2^23 so each
  * lane's long sum stays exact to ~5e11 rows per group (≈100 TB of
  * rows at TPC-H widths). Both lanes use FLOOR semantics — `shiftright`
  * (arithmetic shift = floor division) for hi and `pmod` (non-negative
  * remainder) for lo — so `hi * 2^23 + lo == p` holds for negative
  * products too (x, y of opposite sign); a truncated `%` would break
  * the identity by exactly one lane per negative product.
  * The lanes recombine in DOUBLE as
  * `hi * 2^23 + lo`: both addends are exactly representable (lane sums
  * < 2^53; the 2^23 multiply only shifts the exponent), so the result
  * is the correctly-rounded double of the exact integer sum — any
  * engine recomputing the same lanes gets the same bits.
  *
  * Plan shape: one map-side-combinable hash aggregation (power sums are
  * associative), one shuffle of 8 longs per (group × map task).
  */
object Stats {

  private val Lane = 8388608L // 2^23
  val MomentColumns: Seq[String] = Seq("n", "sx", "sy", "sxx", "syy", "sxy")

  /** Per-group exact power sums (n, Σx, Σy, Σx², Σy², Σxy) as doubles
    * that are bit-identical across engines and partitionings.
    *
    * @param scale decimal digits preserved (values are rounded to
    *              10^-scale before summation — 2 for money). Keep
    *              `max(|v|) * 10^scale` below ~2^26 so per-row products
    *              fit a long with lane headroom. */
  def moments(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String, scale: Int = 2): DataFrame = {
    require(!groupCols.exists(MomentColumns.contains),
      s"group columns collide with moment output names: $MomentColumns")
    val f = math.pow(10, scale)
    val lx = round(col(xCol) * f).cast("long")
    val ly = round(col(yCol) * f).cast("long")
    val dbl = (c: String) => col(c).cast("double")
    def rec(hi: String, lo: String) = dbl(hi) * lit(Lane.toDouble) + dbl(lo)
    df.select(groupCols.map(col) ++ Seq(lx.as("__lx"), ly.as("__ly")): _*)
      .select(col("*"),
        (col("__ly") * col("__ly")).as("__pyy"),
        (col("__lx") * col("__ly")).as("__pxy"))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__lx")).as("__sxl"), sum(col("__ly")).as("__syl"),
        sum(col("__lx") * col("__lx")).as("__sxxl"),
        sum(shiftright(col("__pyy"), 23)).as("__syy_hi"),
        sum(pmod(col("__pyy"), lit(Lane))).as("__syy_lo"),
        sum(shiftright(col("__pxy"), 23)).as("__sxy_hi"),
        sum(pmod(col("__pxy"), lit(Lane))).as("__sxy_lo"))
      .select(groupCols.map(col) ++ Seq(
        col("n"),
        (dbl("__sxl") / f).as("sx"), (dbl("__syl") / f).as("sy"),
        (dbl("__sxxl") / (f * f)).as("sxx"),
        (rec("__syy_hi", "__syy_lo") / (f * f)).as("syy"),
        (rec("__sxy_hi", "__sxy_lo") / (f * f)).as("sxy")): _*)
  }

  /** Population standard deviation of x from a [[moments]] row. */
  def stddevFromMoments(n: Column, sx: Column, sxx: Column): Column =
    sqrt((sxx - sx * sx / n.cast("double")) / n.cast("double"))

  /** Pearson correlation of (x, y) from a [[moments]] row. */
  def corrFromMoments(n: Column, sx: Column, sy: Column,
      sxx: Column, syy: Column, sxy: Column): Column = {
    val nd = n.cast("double")
    (nd * sxy - sx * sy) /
      (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy))
  }

  /** EXACT AUC (Mann–Whitney U) of an integer score against a 0/1 label,
    * in pure integer algebra with the ½-credit midrank tie rule doubled
    * to stay integer: per score bucket s with p(s) positives, n(s)
    * negatives and negBelow(s) the cumulative negatives at lower scores,
    * U2 = Σ_s p(s)·(2·negBelow(s) + n(s)) and
    * auc_ppm = 10⁶·U2 div (2·P·N). The corpus reduces to ONE hash
    * aggregation keyed by score; the cumulative window runs over the
    * bucket relation (cardinality = distinct scores, not corpus rows),
    * so the single-partition window is bounded regardless of data size.
    * Returns one row (n_pos, n_neg, auc_ppm). */
  def aucExact(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val per = df.select(scoreCol.as("__score"), labelCol.cast("long").as("__y"))
      .groupBy(col("__score"))
      .agg(sum(col("__y")).as("p"), (count(lit(1)) - sum(col("__y"))).as("ng"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__score"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    per.withColumn("nb", coalesce(sum(col("ng")).over(w), lit(0L)))
      .agg(sum(col("p") * (lit(2L) * col("nb") + col("ng"))).as("u2"),
        sum(col("p")).as("n_pos"), sum(col("ng")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        expr("(1000000 * u2) div (2 * n_pos * n_neg)").as("auc_ppm"))
  }

  /** 2-D SKYLINE (Pareto frontier, Börzsönyi et al. 2001): the
    * non-dominated points under (minimize `xCol`, maximize `yCol`) —
    * p dominates q iff p.x ≤ q.x ∧ p.y ≥ q.y with one strict. In 2-D
    * the frontier is an ordered scan: a point survives iff its y tops
    * its x-group AND beats the strict-prefix maximum over smaller x.
    * A naive global window would be the SinglePartition shape this repo
    * bans on corpus data; instead the denseIndex recipe: range-partition
    * on x (same x never splits), local strict-prefix max via a RANGE
    * frame (peers excluded exactly), per-partition maxima collected
    * (bounded: one long per partition) and broadcast back as prefix
    * offsets — O(n log n) work, no quadratic dominance join, no global
    * sort on one executor. Both columns must be integral. */
  def skyline2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nPart = spark.sessionState.conf.numShufflePartitions
    val parts = Materialize.carried(
      df.repartitionByRange(nPart, col(xCol).asc)
        .withColumn("__pid", spark_partition_id()))
    val pmax = parts.groupBy(col("__pid"))
      .agg(max(col(yCol)).as("__pm"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val prefix = (0 until nPart).scanLeft(Long.MinValue) {
      (acc, p) => math.max(acc, pmax.getOrElse(p, Long.MinValue))
    }
    val prefixDf = broadcast(
      (0 until nPart).map(p => (p, prefix(p))).toDF("__pid", "__pref"))
    val strictLocal = max(col(yCol)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("__pid"))
        .orderBy(col(xCol).cast("long"))
        .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    val grpMax = max(col(yCol)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("__pid"), col(xCol)))
    parts.join(prefixDf, Seq("__pid"))
      .withColumn("__strict",
        greatest(coalesce(strictLocal, lit(Long.MinValue)), col("__pref")))
      .withColumn("__gmax", grpMax)
      .filter(col(yCol) === col("__gmax") && col(yCol) > col("__strict"))
      .drop("__pid", "__pref", "__strict", "__gmax")
  }

  /** Top principal component by INTEGER power iteration — PCA-head
    * fitting at corpus scale. ONE distributed narrow pass accumulates
    * the exact integer gram statistics (n, Σx, Σxxᵀ in micro-units via
    * [[graft.functions.LongGramMatrix]], map-side combined); the d×d
    * eigen-iteration then runs on the driver over BOUNDED state
    * (d(d+1)/2 + d + 1 longs — the probed-cell class of collect,
    * independent of corpus size). That split IS the 100 TB shape: the
    * corpus contributes one associative aggregation, the eigensolve is
    * O(d²·iters) driver arithmetic.
    *
    * Every step is exact integer algebra, so any engine replaying the
    * same rounds lands on identical integers whether or not the
    * iteration has converged (the k-means/PageRank determinism ladder):
    *  - covariance C = n·G − s·sᵀ in BigInt (the oracle's HUGEINT), so
    *    no row-count ceiling from the n· multiply;
    *  - a truncating downscale caps |Cs| at 1e10, bounding the matvec
    *    of a ~±1e6-unit vector far below 2^63;
    *  - per round w = Cs·v renormalizes by the truncating division
    *    v = w tdiv max(1, max|w| div 1e6).
    * All truncation is sign·(abs div k) in BOTH engines — floor-vs-
    * truncate divergence on negatives is exactly the cross-engine trap
    * this object's scaladoc documents for the moment lanes.
    * Returns (dim, v_ppm): the unit-free eigenvector in ~parts-per-
    * million of its largest component. */
  def pcaPowerTop(emb: DataFrame, vecCol: String, d: Int, iters: Int): DataFrame = {
    require(d >= 1 && iters >= 1, "need d >= 1 and iters >= 1")
    val spark = emb.sparkSession
    import spark.implicits._
    val g = emb
      .select(Clustering.microVec(slice(col(vecCol), 1, d)).as("__xm"))
      .agg(graft.functions.long_gram_matrix(col("__xm"), d).as("gm"))
      .select(col("gm.n"), col("gm.s"), col("gm.g"))
      .head()
    val n = BigInt(g.getLong(0))
    val s = g.getSeq[Long](1).toArray
    val ut = g.getSeq[Long](2).toArray
    // LongGramMatrix packs the upper triangle row-major: 0-based (a<=b)
    // lands at a*d - a*(a-1)/2 + (b-a) (the emb_covariance index algebra)
    def utIdx(i: Int, j: Int): Int = {
      val (a, b) = if (i <= j) (i, j) else (j, i)
      a * d - a * (a - 1) / 2 + (b - a)
    }
    val c = Array.tabulate(d, d)((i, j) =>
      n * BigInt(ut(utIdx(i, j))) - BigInt(s(i)) * BigInt(s(j)))
    def tdivB(x: BigInt, k: BigInt): BigInt = if (x < 0) -((-x) / k) else x / k
    def tdiv(x: Long, k: Long): Long = if (x < 0) -((-x) / k) else x / k
    val scaleC = c.flatten.map(_.abs).max / BigInt(10000000000L) max BigInt(1)
    val cs = c.map(_.map(x => tdivB(x, scaleC).toLong))
    var v = Array.fill(d)(1000000L)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => cs(i)(j) * v(j)).sum)
      val denom = math.max(1L, w.map(math.abs).max / 1000000L)
      v = w.map(tdiv(_, denom))
    }
    v.zipWithIndex.map { case (x, i) => ((i + 1).toLong, x) }.toSeq
      .toDF("dim", "v_ppm")
  }
}
