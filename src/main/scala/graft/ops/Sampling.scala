package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sampling operators for training-data pipelines.
  *
  * [[stratifiedExact]] draws an exact per-stratum fraction,
  * deterministically: rows are ranked inside each stratum by
  * md5(id) — a uniform, engine-independent pseudo-random order — and the
  * first ceil(fraction * |stratum|) are kept. Unlike Bernoulli
  * `df.sampleBy` (approximate counts, RNG tied to partitioning), the
  * result is reproducible across engines, partitionings and runs, so the
  * DuckDB oracle recomputes it exactly.
  *
  * Scale: one shuffle on the stratum key; rank + count are one window
  * pass. A stratum so hot it swamps a partition is the [[Skew]] salting
  * case — sample per (stratum, salt) and union, fractions compose.
  */
object Sampling {

  /** 60-bit md5(id) prefix as a long, with NULL ids hashing as the empty
    * string. Both hash-driven samplers share this rule, so a null-id row
    * gets the SAME deterministic draw everywhere (all null ids collide
    * onto one bucket — callers wanting per-row randomness must supply
    * non-null ids). Before this, a null id null-propagated differently
    * per operator: [[deterministicSplit]] fell through to the last
    * (eval/test) split while [[weightedBySource]] dropped the row. */
  private def nullSafeIdHash(id: Column): Column =
    conv(substring(md5(coalesce(id.cast("string"), lit(""))), 1, 15), 16, 10)
      .cast("long")

  /** Weighted dataset mixing: keep each row of source s with probability
    * `weights(s)` — the source-rebalancing step of a pretraining data
    * recipe (downsample web crawl, keep books, etc.).
    *
    * The draw is a deterministic per-row Bernoulli: the row's 60-bit
    * md5(id) prefix, scaled to [0,1), is compared against the source's
    * weight. Row-LOCAL — no window, no shuffle, fuses with the scan —
    * where [[stratifiedExact]] pays a stratum shuffle for exact counts;
    * at 100 TB this is the difference between a filter and a sort. The
    * same hash arithmetic is oracle-recomputable (KMV's convention: 15
    * hex chars = 60 bits, exact in BIGINT; /2^60 is an exponent shift),
    * so kept sets are byte-identical across engines, partitionings and
    * runs. Counts are binomial around weight*|source|, not exact — use
    * [[stratifiedExact]] when exact counts matter more than a
    * shuffle-free plan.
    *
    * Sources absent from `weights` keep `defaultWeight` of their rows.
    *
    * Null ids hash as the empty string (see [[nullSafeIdHash]]) — same
    * rule as [[deterministicSplit]], so the two samplers agree. */
  def weightedBySource(df: DataFrame, sourceCol: String, idCol: String,
      weights: Map[String, Double], defaultWeight: Double = 0.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0 && w <= 1),
      "weights must be in [0, 1]")
    val u = nullSafeIdHash(col(idCol)).cast("double") / lit(math.pow(2, 60))
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, wt)) =>
      when(col(sourceCol) === s, lit(wt)).otherwise(acc)
    }
    df.filter(u < w)
  }

  /** Deterministic uniform sample of EXACTLY `k` rows (or all rows when
    * the input is smaller): the bottom k by md5(id) — the distributed
    * equivalent of reservoir sampling, but reproducible and
    * accretion-stable (a row's membership changes only when a new row
    * hashes below the current kth, exactly as a true uniform-without-
    * replacement sample must). Plans as TakeOrdered: a k-element heap
    * per partition + a driver merge of k rows — no global sort, no
    * shuffle of the corpus, O(k) driver memory. The standard way to cut
    * a fixed-budget eval/calibration slice from a 100 TB corpus in one
    * pass. */
  def uniformK(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0, "sample size must be positive")
    df.orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc).limit(k)
  }

  def stratifiedExact(df: DataFrame, stratumCol: String, idCol: String,
      fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, "fraction must be in (0, 1]")
    val w = Window.partitionBy(col(stratumCol))
    val ordered = w.orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    // The cutoff is computed in DECIMAL, not DOUBLE: ceil(0.07 * 100) in
    // binary floating point is ceil(7.000000000000001) = 8, while a
    // decimal-literal oracle computes exactly 7. BigDecimal.valueOf uses
    // the shortest decimal representation of `fraction`, matching how the
    // same literal is written in oracle SQL.
    val fracDec = lit(BigDecimal.valueOf(fraction))
    df.withColumn("__rn", row_number().over(ordered))
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__rn") <= ceil(fracDec * col("__n")))
      .drop("__rn", "__n")
  }

  /** Deterministic train/val/test assignment: the row's 60-bit md5(id)
    * prefix mod 100 picks a percent bucket, and `cumShares` (ascending
    * cumulative upper bounds, last = 100) names the split — e.g.
    * `Seq("train" -> 90, "val" -> 95, "test" -> 100)`. Row-LOCAL (a
    * projection, no shuffle, fuses with the scan) and stable across
    * engines, partitionings, runs AND corpus growth: a document's split
    * never changes when other documents are added — the property that
    * keeps eval sets honest as a 100 TB corpus accretes, which no
    * count-based split has. Same 60-bit arithmetic as
    * [[weightedBySource]], so oracles recompute it exactly.
    *
    * Null ids hash as the empty string (see [[nullSafeIdHash]]): they all
    * land in ONE well-defined bucket instead of null-propagating through
    * every `bucket < upper` comparison and silently falling through to
    * the LAST split — eval-set contamination by default. */
  def deterministicSplit(df: DataFrame, idCol: String, splitCol: String,
      cumShares: Seq[(String, Int)]): DataFrame = {
    require(cumShares.nonEmpty && cumShares.last._2 == 100 &&
      cumShares.map(_._2) == cumShares.map(_._2).sorted,
      "cumShares must be ascending cumulative percents ending at 100")
    val bucket = nullSafeIdHash(col(idCol)) % 100
    val split = cumShares.init.foldRight(lit(cumShares.last._1)) {
      case ((name, upper), acc) => when(bucket < upper, lit(name)).otherwise(acc)
    }
    df.withColumn(splitCol, split)
  }

  /** Deterministic sharded EPOCH SHUFFLE — the global training-order
    * permutation a pretraining run materializes per epoch: the read
    * order must be (a) uniformly pseudo-random, (b) DIFFERENT each
    * epoch, and (c) exactly reproducible for checkpoint resume. Each
    * row's md5("epoch:id") digest places it in a shard (60-bit prefix
    * mod `shards`) and orders it within the shard (full digest, id
    * tie-break); (shard, pos) IS the training read order — shard-major,
    * position-minor.
    *
    * Scale shape: the hash is row-local; the only exchange is the ONE
    * shard-partitioned window ranking. A single global `row_number`
    * would serialize the whole corpus through one partition — the
    * sharded coordinates keep every shard's ranking parallel, which is
    * the honest minimum for a MATERIALIZED global order. Same 60-bit
    * md5 arithmetic as [[deterministicSplit]] (null ids hash as the
    * empty id), so a DuckDB oracle replays shard and position
    * exactly — across engines, partitionings and runs.
    *
    * Output column names are parameters (the [[deterministicSplit]]
    * `splitCol` convention) and must be ABSENT from the input — a corpus
    * already carrying a `shard`/`pos` column fails fast instead of being
    * silently overwritten (pass different names); the scratch hash
    * column picks a collision-free name automatically.
    *
    * Reproducibility contract: (shard, pos) is exactly replayable iff
    * `idCol` values are UNIQUE and NON-NULL. Null ids all hash as the
    * empty id and — like any duplicated id — tie on both sort keys, so
    * their relative order is engine/partitioning-dependent. Run an
    * id-assignment or dedup pass first if the corpus can violate this. */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int, shards: Int,
      shardCol: String = "shard", posCol: String = "pos"): DataFrame = {
    require(shards >= 1, "shards must be positive")
    require(!df.columns.contains(shardCol) && !df.columns.contains(posCol),
      s"output columns ($shardCol, $posCol) already exist in the input — " +
        "pass different shardCol/posCol instead of silently overwriting")
    val hc = Iterator.from(0).map(i => s"__epochhash$i")
      .filterNot(df.columns.contains).next()
    val hs = md5(concat(lit(s"$epoch:"),
      coalesce(col(idCol).cast("string"), lit(""))))
    val w = Window.partitionBy(col(shardCol)).orderBy(col(hc).asc, col(idCol).asc)
    df.withColumn(hc, hs)
      .withColumn(shardCol,
        pmod(conv(substring(col(hc), 1, 15), 16, 10).cast("long"),
          lit(shards.toLong)))
      .withColumn(posCol, row_number().over(w).cast("long"))
      .drop(hc)
  }

  /** Dense global rank 0..n-1 WITHOUT a single-partition window: the
    * standard scalable recipe for "give every row its position in a
    * global order". A bare `row_number() OVER (ORDER BY ...)` collapses
    * the corpus into ONE partition (the plan every 100 TB job dies on);
    * this instead (1) range-repartitions on the order columns, (2) ranks
    * WITHIN each partition in parallel, (3) counts rows per partition
    * (a tiny aggregate) and broadcasts the cumulative offsets back, so
    * `index = partition offset + local rank - 1`. Two passes over the
    * corpus, both parallel; the only global object is the numPartitions-
    * sized offset table.
    *
    * Ties across `orderCols` fall to engine-dependent order — pass a
    * tie-breaking unique column last (the [[epochShuffle]] contract) for
    * a reproducible index. Consumers: negative sampling
    * ([[graft.ops.Similarity.negativeSamples]]), equi-depth binning,
    * array-style lookups into an ordered corpus. */
  def denseIndex(df: DataFrame, orderCols: Seq[String], idxCol: String,
      numPartitions: Int = 0): DataFrame =
    denseIndexWithCount(df, orderCols, idxCol, numPartitions)._1

  /** [[denseIndex]] plus the total row count — the count falls out of
    * the offset table already on the driver, so consumers that need n
    * (modular draws in [[graft.ops.Similarity.negativeSamples]]) avoid
    * a separate full-corpus `count()` scan. */
  def denseIndexWithCount(df: DataFrame, orderCols: Seq[String], idxCol: String,
      numPartitions: Int = 0): (DataFrame, Long) = {
    require(orderCols.nonEmpty, "need at least one order column")
    require(!df.columns.contains(idxCol), s"output column $idxCol already exists")
    val nPart =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // The RDD zipWithIndex recipe on ONE physical plan. Range boundaries
    // are sampled at shuffle planning, so the counts pass and the rank
    // pass must consume the SAME partitioning — two separately-derived
    // Datasets would each instantiate their own RangePartitioner. Using
    // one RDD gives that consistency for free AND without materializing
    // anything: the counts job computes the shuffle map stage, and the
    // rank job re-reads the SAME shuffle files (Spark never recomputes a
    // computed ShuffleMapStage), so the corpus is written to local
    // shuffle storage exactly once — no persist entry to leak, no
    // reliable-checkpoint write+read (the round-11 fix for the former
    // cost 2x on every caller; this keeps the leak closed at shuffle
    // price). Cost ledger: shuffle write x1, shuffle read + in-partition
    // sort x2 (the count job pays the plan's sort too — partitions are
    // sized to sort in memory, cheaper than a checkpoint round-trip).
    val sorted = df
      .repartitionByRange(nPart, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col(_).asc): _*)
    val internal = sorted.queryExecution.toRdd
    val sizes = sorted.sparkSession.sparkContext.runJob(internal,
      (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
        var c = 0L; while (it.hasNext) { it.next(); c += 1 }; c
      })
    val offsets = sizes.scanLeft(0L)(_ + _)
    val total = offsets.last
    val zipped = internal.mapPartitionsWithIndex({ (pid, it) =>
      var i = offsets(pid)
      it.map { row =>
        // copy: shuffle readers reuse the UnsafeRow buffer per partition
        val out: org.apache.spark.sql.catalyst.InternalRow =
          new org.apache.spark.sql.catalyst.expressions.JoinedRow(
            row.copy(),
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              Array[Any](i)))
        i += 1
        out
      }
    }, preservesPartitioning = true)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(idxCol,
          org.apache.spark.sql.types.LongType, nullable = false))
    (org.apache.spark.sql.graftbridge.Bridge.ofInternalRows(
      df.sparkSession, zipped, schema), total)
  }

  /** Deterministic exactly-k-PER-GROUP uniform sample: within each group,
    * the bottom k rows by md5(id) — [[uniformK]]'s per-stratum twin, for
    * balanced eval slices ("200 docs from every source") where a global
    * budget would starve small groups.
    *
    * Scale shape: NOT a ranking window (which shuffles every row of the
    * corpus on the group key and sorts). The per-group bottom-k is the
    * bounded-heap [[graft.functions.TopKPairs]] aggregate — each map task
    * forwards at most k (hash, id) pairs per group to the shuffle, so
    * shuffle volume is O(groups x k) regardless of corpus size, and a hot
    * group costs its partial heaps, never a sort. The hash score is the
    * 52-bit md5 prefix (exactly representable in the aggregate's Double
    * score, so heap order == the oracle's hex-string order; ties fall to
    * the aggregate's id-ASC rule, the same order the oracle's
    * (hash, id) sort yields).
    *
    * Returns (group columns, rank 1..k by hash order, id). Ids must be
    * non-null for a reproducible draw (the [[nullSafeIdHash]] caveat). */
  def groupK(df: DataFrame, groupCols: Seq[String], idCol: String,
      k: Int): DataFrame = {
    require(k > 0, "sample size must be positive")
    val score = -conv(substring(md5(coalesce(col(idCol).cast("string"), lit(""))),
      1, 13), 16, 10).cast("long").cast("double")
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.topk_pairs(score, col(idCol), k).as("__tk"))
      .select(groupCols.map(col) :+ posexplode(col("__tk")).as(Seq("__pos", "__p")): _*)
      .select(groupCols.map(col) :+ (col("__pos") + 1).cast("long").as("rk") :+
        col("__p.id").as(idCol): _*)
  }

  /** Deterministic weighted sampling WITH REPLACEMENT by integer-exact
    * inverse-transform: each row owns the half-open interval
    * `[cumBefore, cumBefore + weight)` of the global integer weight
    * line (total W), and draw j selects the owner of
    * `u_j = md5(seed:j) mod W`. Everything is 64-bit integer
    * arithmetic — no transcendental keys (the A-ExpJ trick needs
    * `ln(u)/w`, whose last-ulp differences across engines would break a
    * hash-equality oracle) — so a SQL engine replays every draw
    * byte-identically.
    *
    * Scale shape: the global prefix sum is SHARDED (id mod `nShards`
    * windows in parallel + one nShards-row offset table collected to
    * the driver and broadcast back — bounded by design, the
    * mix_token_budget discipline); the draw table is nDraws rows,
    * broadcast into a range-containment join against the weighted rows
    * (one streaming pass over the corpus, no shuffle of the data side).
    * Weights must be positive integers after the cast; rows with
    * weight <= 0 or NULL never win a draw.
    *
    * Returns (draw_id 0..nDraws-1, id) — nDraws rows, duplicates
    * expected by construction (that is the "with replacement"). */
  def weightedWithReplacement(df: DataFrame, idCol: String,
      weightCol: String, nDraws: Int, seed: String,
      nShards: Int = 256): DataFrame = {
    require(nDraws > 0, "need at least one draw")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("__id"),
        col(weightCol).cast("long").as("__w"))
      .filter(col("__w") > 0)
      .withColumn("__shard", pmod(col("__id"), lit(nShards.toLong)))
    // per-shard totals: at most nShards rows to the driver — bounded by
    // design regardless of corpus size
    val shardTotals = base.groupBy(col("__shard"))
      .agg(sum(col("__w")).as("__t")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val totalW = shardTotals.map(_._2).sum
    require(totalW > 0, "total weight must be positive")
    val offsets = shardTotals.scanLeft((-1L, 0L)) {
      case ((_, acc), (sh, t)) => (sh, acc + t)
    }.tail.zip(shardTotals).map { case ((sh, cumIncl), (_, t)) =>
      (sh, cumIncl - t)
    }
    val offDf = broadcast(offsets.toSeq.toDF("__shard", "__off"))
    val w = Window.partitionBy(col("__shard")).orderBy(col("__id"))
    val intervals = base.join(offDf, Seq("__shard"))
      .withColumn("__lo",
        coalesce(sum(col("__w")).over(w) - col("__w"), lit(0L)) + col("__off"))
    val draws = spark.range(nDraws).select(col("id").as("draw_id"))
      .withColumn("__u", pmod(
        conv(substring(md5(concat(lit(seed), lit(":"),
          col("draw_id").cast("string"))), 1, 15), 16, 10).cast("long"),
        lit(totalW)))
    intervals.join(broadcast(draws),
        col("__u") >= col("__lo") && col("__u") < col("__lo") + col("__w"))
      .select(col("draw_id"), col("__id").as(idCol))
  }
}
