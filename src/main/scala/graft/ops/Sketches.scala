package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Approximate/sketch operators — the sub-linear-memory summaries a
  * 100 TB pipeline uses where exact answers would shuffle the world:
  *
  *  - HLL distinct counts: one pass, fixed memory per group, mergeable
  *    partials (vs an exact countDistinct whose state is the value set).
  *  - approximate quantiles: bounded-error rank sketch, partial-mergeable.
  *  - Bloom filter: membership summary built distributed (treeAggregate
  *    under the hood) — ship a few MB to pre-filter a 100 TB probe side
  *    before a join (no false negatives, bounded false positives).
  *  - Count-min sketch: per-key frequency estimates (never undercounts) —
  *    the heavy-hitter / hot-key detector that decides when [[Skew]]
  *    salting is worth applying.
  *
  * None of these are cross-engine hash-comparable (sketch layouts are
  * implementation-specific), so they are deliberately NOT in the oracle
  * registry; SketchesSpec pins their accuracy contracts against exact
  * answers instead.
  */
object Sketches {

  /** Approximate distinct count per group (HyperLogLog++). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Approximate quantiles of a numeric column (Greenwald-Khanna
    * variant); `relativeError` bounds the rank error. */
  def approxQuantiles(df: DataFrame, valueCol: String,
      probabilities: Array[Double], relativeError: Double = 0.01): Array[Double] =
    df.stat.approxQuantile(valueCol, probabilities, relativeError)

  /** Distributed Bloom filter over a column: no false negatives, ~`fpp`
    * false positives at `expectedItems`. */
  def bloomFilter(df: DataFrame, colName: String,
      expectedItems: Long, fpp: Double = 0.03): BloomFilter =
    df.stat.bloomFilter(colName, expectedItems, fpp)

  /** Bloom-pre-filtered join: build the filter on the (small) build side
    * key set, drop probe rows that cannot match BEFORE the shuffle, then
    * do the exact join. Result equals the plain inner join (the filter
    * admits false positives, never false negatives — the join removes
    * them); what changes is shuffle volume on the probe side. */
  def bloomPrunedJoin(probe: DataFrame, build: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bf = bloomFilter(build, key, expectedItems, fpp)
    val bcast = probe.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bcast.value.mightContainLong(k))
    probe.filter(mightContain(col(key))).join(build, key)
  }

  /** Count-min sketch over a column (frequency estimates; never
    * undercounts). */
  def countMinSketch(df: DataFrame, colName: String,
      eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 42): CountMinSketch =
    df.stat.countMinSketch(colName, eps, confidence, seed)

  /** Heavy hitters via count-min: keys whose estimated frequency exceeds
    * `minShare` of the total — the hot-key detector feeding [[Skew]]. */
  def heavyHitters(df: DataFrame, colName: String, candidates: Seq[Any],
      minShare: Double, eps: Double = 0.001): Seq[(Any, Long)] = {
    val total = df.count()
    val cms = countMinSketch(df, colName, eps = eps)
    candidates.map(k => k -> cms.estimateCount(k))
      .filter { case (_, est) => est >= (minShare * total).toLong }
  }
}
