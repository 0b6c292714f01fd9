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
}
