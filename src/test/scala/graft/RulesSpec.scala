package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftExtensions

/** The LevenshteinThreshold optimizer rule: rewrites unbounded
  * levenshtein comparisons to the early-exit thresholded form without
  * changing results. */
class RulesSpec extends SparkSpec {

  private def pairs = {
    val s = spark
    import s.implicits._
    Seq(
      ("kitten", "sitting"),   // distance 3
      ("abcdefghij", "abcdefghij"), // 0
      ("aaaaaaaaaa", "bbbbbbbbbb")) // 10
      .toDF("l", "r")
  }

  test("rule rewrites lev <= k into thresholded form in the optimized plan") {
    GraftExtensions.register(spark)
    // a datasource-backed plan: a LocalRelation would be constant-folded
    // whole by ConvertToLocalRelation before the plan text is inspected
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = docs.filter(levenshtein(col("text"), lit("spark")) <= 3)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("levenshtein(text") && optimized.contains("Some(3)) >= 0"),
      s"expected thresholded levenshtein in:\n$optimized")
    assert(pairs.filter(levenshtein(col("l"), col("r")) <= 3).count() === 2)
  }

  test("rewritten strict < and mirrored forms keep the unbounded results") {
    GraftExtensions.register(spark)
    val strict = pairs.filter(levenshtein(col("l"), col("r")) < 3)
    assert(strict.count() === 1) // only the exact match
    val mirrored = pairs.filter(lit(9) >= levenshtein(col("l"), col("r")))
    assert(mirrored.count() === 2) // distance 10 excluded
  }

  test("levenshtein VALUES outside comparisons are not rewritten") {
    GraftExtensions.register(spark)
    val df = pairs.select(levenshtein(col("l"), col("r")).as("d"))
    assert(df.collect().map(_.getInt(0)).sorted.toSeq === Seq(0, 3, 10))
  }
}
