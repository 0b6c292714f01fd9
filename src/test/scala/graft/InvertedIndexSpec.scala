package graft

import org.apache.spark.sql.functions._

import graft.ops.InvertedIndex

/** The persisted inverted index: the load-bearing property is that a
  * term query reads posting lists, NOT the corpus — pinned here at the
  * physical-plan level (bucket pruning) alongside value correctness
  * against a brute-force text scan. */
class InvertedIndexSpec extends SparkSpec {

  private lazy val docs =
    graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")

  private def freshTable(suffix: String): (String, String) = {
    val tok = graft.sources.TableIO.sessionToken(spark)
    (s"graft_invidx_spec_${suffix}_$tok",
      java.nio.file.Files.createTempDirectory(s"graft-inv-$suffix").toString + "/t")
  }

  test("searchAll == brute-force AND over the raw text") {
    val (table, path) = freshTable("and")
    InvertedIndex.buildIndex(docs, "doc_id", "text", table, path, buckets = 8)
    val got = InvertedIndex.searchAll(spark, table, Seq("spark", "join"), k = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = docs
      .select(col("doc_id"),
        graft.ops.TextOps.words(col("text")).as("w"))
      .select(col("doc_id"), explode(col("w")).as("t"))
      .filter(col("t").isin("spark", "join"))
      .groupBy("doc_id")
      .agg(countDistinct(col("t")).as("nt"), count(lit(1)).as("score"))
      .filter(col("nt") === 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("term lookup is bucket-pruned: the scan reads only the query terms' buckets") {
    val (table, path) = freshTable("prune")
    InvertedIndex.buildIndex(docs, "doc_id", "text", table, path, buckets = 8)
    val plan = InvertedIndex.searchAll(spark, table, Seq("spark"), k = 5)
      .queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"expected a bucket-pruned scan, plan:\n$plan")
    assert(m.get.group(1).toInt < m.get.group(2).toInt,
      "a single-term query must not read every bucket")
    assert(m.get.group(1).toInt == 1, "one term hashes into exactly one bucket")
  }

  test("phrase search finds exactly the adjacent pairs; positions are 0-based sorted") {
    val s = spark
    import s.implicits._
    val (table, path) = freshTable("phrase")
    val tiny = Seq(
      (1L, "alpha beta gamma"),
      (2L, "beta alpha beta"),      // "alpha beta" at pos 1->2
      (3L, "alpha gamma beta"),     // not adjacent
      (4L, "alpha beta alpha beta") // twice
    ).toDF("doc_id", "text")
    InvertedIndex.buildIndex(tiny, "doc_id", "text", table, path,
      buckets = 4, positional = true)
    val got = InvertedIndex.searchPhrase(spark, table, "alpha", "beta")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 1), (2L, 1), (4L, 2)))
    val pos = spark.table(table)
      .filter(col("term") === "beta" && col("doc_id") === 4L)
      .select(col("positions")).head().getSeq[Int](0)
    assert(pos == Seq(1, 3))
  }
}
