package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-preserving release operators for training-data pipelines.
  *
  * [[kAnonymize]] enforces k-anonymity (Samarati & Sweeney 1998) over a
  * quasi-identifier (QI) column set with a one-step generalization
  * hierarchy: rows whose full-QI group reaches `k` are released as-is
  * (level 0); rows in under-k groups are retried with the LAST QI column
  * generalized away (level 1, the column set to NULL); rows still in an
  * under-k group after generalization are suppressed (dropped). This is
  * the release gate a pipeline applies before survey-style records (the
  * reference's domain — Connect survey tables, see
  * `/root/reference/core/constants.py:77` for the QI-bearing column
  * shape) can feed a training corpus.
  *
  * 100 TB shape: the corpus is NEVER shuffled. Group sizes are one
  * map-side-combined aggregation whose output is bounded by QI
  * cardinality (tiny); the level-1 sizes derive from the level-0 counts
  * alone (`sum` of failing child groups per parent — no second corpus
  * pass); both failing-key sets broadcast, and the release decision is a
  * row-local two-flag CASE fused with the scan. A hot QI cell (the skew
  * case) only makes its COUNT hot, which the partial aggregation
  * absorbs; no per-row state ever concentrates.
  *
  * Null semantics: QI columns join null-safely (`<=>`), so rows with a
  * NULL QI value form their own group rather than silently escaping the
  * k test — NULL is itself identifying.
  */
object Privacy {

  /** Seeded DISCRETE noise for differentially-private count releases —
    * the geometric-mechanism shape (Ghosh, Roughgarden & Sundararajan
    * 2009: integer noise, the discrete analogue of Laplace) made
    * engine-exact: the magnitude is the LEADING-ONES RUN of the 60-bit
    * integer md5(seed||":mag") (P(run = k) = 2^-(k+1), capped), the sign
    * is the parity of the first hex digit of md5(seed||":sign"). With a
    * sign flip the noise G satisfies P(G=0) = 1/2 and P(G = ±k) =
    * 2^-(k+2), so the worst neighboring-ratio is P(0)/P(1) = 4 — an
    * ε = 2·ln 2 ≈ 1.386 pure-DP mechanism at sensitivity 1 (PrivacySpec
    * pins both the distribution and the ratio bound). Everything is
    * integer compares on md5 bits — no ln(), no floats — so the DuckDB
    * oracle replays every noisy release digit-for-digit, and a fixed
    * seed string makes the release REPRODUCIBLE (the property an
    * auditable privacy pipeline needs: re-running the job must not
    * re-randomize published statistics).
    *
    * Run cap 16 truncates tail mass 2^-16 per side — both engines apply
    * the same cap, so replay is unaffected. */
  def geometricNoise(seed: Column, cap: Int = 16): Column = {
    require(cap >= 1 && cap <= 59, "run cap must fit the 60-bit draw")
    val x = conv(substring(md5(concat(seed, lit(":mag"))), 1, 15), 16, 10)
      .cast("long")
    def th(k: Int): Long = ((1L << k) - 1L) << (60 - k)
    val mag = (1 to cap).foldLeft(lit(0)) { (acc, k) =>
      when(x >= th(k), lit(k)).otherwise(acc)
    }
    val sgn = when(
      conv(substring(md5(concat(seed, lit(":sign"))), 1, 1), 16, 10)
        .cast("long") % 2 === 1, lit(1)).otherwise(lit(-1))
    (mag * sgn).cast("long")
  }

  /** The identical noise as SQL over a seed expression — paste into the
    * oracle. Generated thresholds match [[geometricNoise]] bit-for-bit. */
  def geometricNoiseSql(seedExpr: String, cap: Int = 16): String = {
    def th(k: Int): Long = ((1L << k) - 1L) << (60 - k)
    val x = s"CAST(concat('0x', substr(md5($seedExpr || ':mag'), 1, 15)) AS BIGINT)"
    val magCases = (cap to 1 by -1)
      .map(k => s"WHEN $x >= ${th(k)} THEN $k").mkString(" ")
    s"""((CASE $magCases ELSE 0 END) *
       | (CASE WHEN CAST(concat('0x', substr(md5($seedExpr || ':sign'), 1, 1)) AS BIGINT) % 2 = 1
       |       THEN 1 ELSE -1 END))""".stripMargin
  }

  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Int,
      levelCol: String = "anon_level"): DataFrame = {
    require(qiCols.size >= 2, "need at least 2 QI columns to generalize one away")
    require(k >= 2, "k-anonymity needs k >= 2")
    // fail fast on name collisions (the epochShuffle/denseIndex contract):
    // a pre-existing levelCol or internal working name would resolve
    // ambiguously or silently misbehave instead of erroring
    require(!df.columns.contains(levelCol),
      s"output column $levelCol already exists in the input — pass a different levelCol")
    val reserved = df.columns.filter(c =>
      c.startsWith("__q0_") || c.startsWith("__q1_") || c == "__f0" || c == "__f1")
    require(reserved.isEmpty,
      s"input columns collide with kAnonymize internals: ${reserved.mkString(", ")}")
    val parent = qiCols.dropRight(1)
    val last = qiCols.last
    val lastType = df.schema(last).dataType

    // level-0 group sizes: bounded by QI-combination cardinality
    val counts0 = df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("__n0"))
    val fail0 = counts0.filter(col("__n0") < k)
    // level-1 sizes derived from the level-0 counts — only rows of
    // FAILING level-0 groups participate in a level-1 group, so the
    // parent size is the sum of its failing children
    val fail1 = fail0.groupBy(parent.map(col): _*)
      .agg(sum(col("__n0")).as("__n1"))
      .filter(col("__n1") < k)

    // the flag tables derive FROM df (self-join lineage) — rename their
    // QI columns so resolution is unambiguous by construction
    val f0 = broadcast(fail0.select(
      qiCols.map(c => col(c).as(s"__q0_$c")) :+ lit(1).as("__f0"): _*))
    val f1 = broadcast(fail1.select(
      parent.map(c => col(c).as(s"__q1_$c")) :+ lit(1).as("__f1"): _*))

    val released = df
      .join(f0, qiCols.map(c => col(c) <=> col(s"__q0_$c")).reduce(_ && _), "left")
      .join(f1, parent.map(c => col(c) <=> col(s"__q1_$c")).reduce(_ && _), "left")
      .withColumn(levelCol,
        when(col("__f0").isNull, lit(0))
          .when(col("__f1").isNull, lit(1)))
      .filter(col(levelCol).isNotNull)
    val outCols = df.columns.map {
      case c if c == last =>
        when(col(levelCol) === 1, lit(null).cast(lastType))
          .otherwise(df(c)).as(last)
      case c => df(c)
    } :+ col(levelCol)
    released.select(outCols.toIndexedSeq: _*)
  }

  /** Column-masking / row-filtering POLICY VIEW (the Unity-Catalog /
    * Ranger shape): apply per-column masking expressions and a row
    * predicate in ONE projection over `df`, so the governed surface is
    * a plain DataFrame every downstream operator (and `spark.sql`, via
    * createOrReplaceTempView) composes with — policies live in the
    * PLAN, not in copied data, and Catalyst pushes the row filter down
    * to the scan like any other predicate. `masks` maps column name →
    * masked expression (redaction literal, md5 pseudonym, bucketing —
    * caller's choice; unmapped columns pass through); `rowFilter`
    * drops rows the reader may not see at all. Fails loudly on a mask
    * for a nonexistent column — a silently-ignored policy is a leak. */
  def maskedView(df: DataFrame, masks: Map[String, Column],
      rowFilter: Column): DataFrame = {
    val missing = masks.keySet -- df.columns.toSet
    require(missing.isEmpty,
      s"masking policy names nonexistent columns: ${missing.toSeq.sorted.mkString(", ")}")
    df.filter(rowFilter)
      .select(df.columns.toIndexedSeq.map { c =>
        masks.get(c).map(_.as(c)).getOrElse(col(c))
      }: _*)
  }
}
