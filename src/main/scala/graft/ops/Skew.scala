package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys.
  *
  * AQE's skew-join splitting handles joins, but a groupBy whose partial
  * aggregates are NOT combine-reducible per map task (e.g. collect_list,
  * exact distinct counting) still funnels every row of a hot key through
  * one reducer. Salted aggregation breaks that: aggregate on
  * (key, hash(row) % buckets) first — spreading a hot key over `buckets`
  * reducers — then combine the per-salt partials in a second, tiny
  * aggregation. Correct only for aggregates with an associative
  * partial/final decomposition, which the API makes explicit by taking
  * both stages. */
object Skew {

  /** Two-phase salted aggregation.
    *
    * @param saltSource  expression whose hash spreads rows of one key
    *                    (e.g. a high-cardinality column)
    * @param partial     per-(key, salt) aggregates
    * @param finalAgg    per-key combination of the partial columns
    * @param keyName     name the grouping key carries in the output
    */
  def saltedAggregate(
      df: DataFrame,
      key: Column,
      saltSource: Column,
      buckets: Int,
      partial: Seq[Column],
      finalAgg: Seq[Column],
      keyName: String = "key"): DataFrame = {
    // helper names chosen collision-free against the input so a caller's
    // own __salt/__key column is never silently clobbered
    val salt = Iterator.from(0).map(i => s"__salt$i")
      .find(n => !df.columns.contains(n)).get
    val k = Iterator.from(0).map(i => s"__key$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(salt, pmod(xxhash64(saltSource), lit(buckets)))
      .groupBy(key.as(k), col(salt))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(k))
      .agg(finalAgg.head, finalAgg.tail: _*)
      .withColumnRenamed(k, keyName)
  }

  /** Salted exact count + sum — the common shape: partial count/sum per
    * salt, then sum of partials. */
  def saltedCountSum(df: DataFrame, key: Column, saltSource: Column,
      valueCol: Column, buckets: Int = 16, keyName: String = "key"): DataFrame =
    saltedAggregate(df, key, saltSource, buckets,
      partial = Seq(count(lit(1)).as("__n"), sum(valueCol).as("__s")),
      finalAgg = Seq(sum(col("__n")).as("n"), sum(col("__s")).as("total")),
      keyName = keyName)

  /** ADAPTIVE salted count/sum: the distributed heavy-hitter detector
    * ([[Sketches.heavyHitters]]: sample-nominate, count-min-verify)
    * decides WHICH keys are hot, then only the hot subset pays the
    * two-phase salted aggregation while the cold majority aggregates
    * plain; the union is exact — identical to one plain groupBy, which
    * is the oracle. This wires detector → salting end-to-end: no
    * caller-supplied candidate list, no blanket salting of keys that
    * don't need it (the second tiny aggregation isn't free at 100 TB
    * group cardinalities).
    *
    * The detector costs one sampled count + one count-min pass — both
    * corpus-narrow — and yields a deterministic hot set (candidate
    * cutoff is tie-broken on the key). Null keys are never "hot"
    * (count-min can't represent them) and flow through the cold branch
    * like any plain groupBy. */
  def adaptiveCountSum(df: DataFrame, keyCol: String, saltSource: Column,
      valueCol: Column, minShare: Double = 0.05, buckets: Int = 16,
      eps: Double = 0.001, sampleFraction: Double = 0.1,
      maxCandidates: Int = 64): DataFrame = {
    val hot = Sketches.heavyHitters(df, keyCol, minShare, eps,
      sampleFraction, maxCandidates).map(_._1).filter(_ != null)
    def plain(part: DataFrame): DataFrame = part.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(valueCol).as("total"))
    if (hot.isEmpty) plain(df)
    else {
      val isHot = coalesce(col(keyCol).isin(hot: _*), lit(false))
      val salted = saltedCountSum(df.filter(isHot), col(keyCol), saltSource,
        valueCol, buckets, keyName = keyCol)
      salted.unionByName(plain(df.filter(!isHot)))
    }
  }

  /** The motivating NON-reducible case of the scaladoc above, wired
    * end-to-end: an exact per-key sorted distinct-value list.
    * `collect_set` has no shrinking map-side combine — every row of a
    * hot key funnels through one reducer, which is precisely where a
    * plain groupBy falls over at 100 TB. Hot keys (discovered by the
    * same detector as [[adaptiveCountSum]]) salt BY THE VALUE, so each
    * distinct value lands in exactly one salt bucket: per-(key, salt)
    * collect_set partials shrink to the bucket's distinct set, and the
    * per-key final merely flattens ≤ `buckets` pre-deduped arrays —
    * the hot reducer sees `buckets` rows, not every raw row. Cold keys
    * collect plain; null keys flow cold. The union equals one plain
    * `groupBy.agg(sort_array(collect_set(...)))`, which is the oracle. */
  def adaptiveDistinctList(df: DataFrame, keyCol: String, valueCol: Column,
      minShare: Double = 0.05, buckets: Int = 16,
      eps: Double = 0.001, sampleFraction: Double = 0.1,
      maxCandidates: Int = 64, outName: String = "values"): DataFrame = {
    val hot = Sketches.heavyHitters(df, keyCol, minShare, eps,
      sampleFraction, maxCandidates).map(_._1).filter(_ != null)
    def plain(part: DataFrame): DataFrame = part.groupBy(col(keyCol))
      .agg(sort_array(collect_set(valueCol)).as(outName))
    if (hot.isEmpty) plain(df)
    else {
      val isHot = coalesce(col(keyCol).isin(hot: _*), lit(false))
      val salted = saltedAggregate(df.filter(isHot), col(keyCol), valueCol,
        buckets,
        // value-salting makes the per-bucket sets disjoint, so the final
        // flatten needs no re-dedup — array_distinct stays only as a
        // guard against a caller salting by something else
        partial = Seq(collect_set(valueCol).as("__vals")),
        finalAgg = Seq(sort_array(array_distinct(
          flatten(collect_list(col("__vals"))))).as(outName)),
        keyName = keyCol)
      salted.unionByName(plain(df.filter(!isHot)))
    }
  }

  /** Salted exact distinct count: per-salt distinct (each distinct value
    * lands in exactly one salt bucket when salted BY THE VALUE), then sum
    * of bucket-distincts — exact, unlike approx_count_distinct. */
  def saltedDistinctCount(df: DataFrame, key: Column, valueCol: Column,
      buckets: Int = 16, keyName: String = "key"): DataFrame =
    saltedAggregate(df, key, valueCol, buckets,
      partial = Seq(countDistinct(valueCol).as("__d")),
      finalAgg = Seq(sum(col("__d")).as("n_distinct")),
      keyName = keyName)

  /** SALTED equi-join for a skewed LEFT side: the left row's shuffle
    * key becomes (key, hash % salts) — a hot key spreads over `salts`
    * reducers — and the right side is replicated into every salt bucket
    * (the classic replicate-the-small-side trade: right pays x`salts`
    * shuffle volume, the hot reducer shrinks by the same factor). The
    * result set EQUALS the plain inner join for any salt assignment —
    * salts only re-route rows — which is what makes the technique
    * oracle-gateable. AQE's skew-join splitting covers sort-merge
    * joins it can observe; explicit salting is the form that also
    * covers deliberately-planned shuffle-hash joins and pre-shuffle
    * bucketing decisions. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, saltSource: Column): DataFrame = {
    require(salts >= 2, "salting needs at least 2 buckets")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "__salt is reserved by saltedJoin")
    val l = left.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
