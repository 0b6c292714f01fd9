package graft

import org.apache.spark.sql.functions._

import graft.ops.{Packing, Scd, Sketches, TextOps}

/** Behavioral pins for the curation/maintenance operators: sequence
  * packing, SCD2 merge, KMV cardinality, and decontamination. */
class CurationSpec extends SparkSpec {

  test("packing assigns chunks by cumulative token position and flags straddlers") {
    val s = spark
    import s.implicits._
    // one shard (nShards=1); token counts: 3, 4, 4, 2 with budget 5
    // cum_before: 0, 3, 7, 11 -> chunks 0, 0, 1, 2
    // doc 2 spans tokens [3,6] crossing the 5-boundary -> straddles
    // doc 3 spans [7,10] crossing 10 -> straddles
    val df = Seq(
      (1L, "a b c"), (2L, "d e f g"), (3L, "h i j k"), (4L, "l m"))
      .toDF("doc_id", "text")
    val got = Packing.assignChunks(df, "doc_id", "text", nShards = 1, budgetTokens = 5)
      .select("id", "chunk_id", "straddles")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(got.toSeq === Seq((1L, 0L, false), (2L, 0L, true), (3L, 1L, true), (4L, 2L, false)))
  }

  test("packing conserves documents and tokens across chunks") {
    val docs = queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val summary = Packing.chunkSummary(docs, "doc_id", "text", nShards = 4, budgetTokens = 500)
    val total = summary.agg(sum("n_docs"), sum("n_tokens")).head()
    val expectTokens = docs.select(TextOps.tokenCount(col("text")).cast("long").as("t"))
      .agg(sum("t")).head().getLong(0)
    assert(total.getLong(0) === docs.count())
    assert(total.getLong(1) === expectTokens)
  }

  test("scd2 compresses no-op changes and emits correct intervals") {
    val s = spark
    import s.implicits._
    val changes = Seq(
      (1L, 0L, "A"), (1L, 1L, "A"), (1L, 2L, "B"), // v1 is a no-op
      (2L, 0L, "X")) // single version
      .toDF("k", "version", "seg")
    val got = Scd.scd2(changes, Seq("k"), "version", Seq("seg"))
      .select("k", "seg", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
      .sortBy(t => (t._1, t._3))
    assert(got.toSeq === Seq(
      (1L, "A", 0L, 1L, false), // closed by v2 (the compressed v1 is gone)
      (1L, "B", 2L, -1L, true),
      (2L, "X", 0L, -1L, true)))
  }

  test("kmv distinct estimate is within 15% on known cardinality") {
    val df = spark.range(50000).select((col("id") % 10000).as("v"))
    val r = Sketches.kmvDistinct(df, "v", k = 256).head()
    val est = r.getDouble(2)
    assert(math.abs(est - 10000.0) / 10000.0 < 0.15, s"estimate $est")
  }

  test("kmv returns the exact count below k distinct values") {
    val df = spark.range(1000).select((col("id") % 100).as("v"))
    val r = Sketches.kmvDistinct(df, "v", k = 256).head()
    assert(r.getLong(0) === 100L && r.getDouble(2) === 100.0)
  }

  test("contamination finds the planted probe and its near copy only") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon different"), // shares one 5-gram
      (3L, "totally unrelated words in this document here"))
      .toDF("doc_id", "text")
    val probes = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val got = TextOps.contaminationCounts(corpus, "doc_id", "text",
        probes, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 1L)) // doc 3 clean
  }

  test("chunkSummaryBy packs in the SUPPLIED order, not id order") {
    val s = spark
    import s.implicits._
    // read order (pos) is the REVERSE of id order; budget 5
    // pos stream: doc4 "l m"(2) -> doc3 "h i j k"(4) -> doc2(4) -> doc1 "a b c"(3)
    // cum_before: 0, 2, 6, 10 -> chunks 0, 0, 1, 2; pos2 spans [2,5] -> straddles
    val df = Seq(
      (1L, "a b c", 0L, 4L), (2L, "d e f g", 0L, 3L),
      (3L, "h i j k", 0L, 2L), (4L, "l m", 0L, 1L))
      .toDF("doc_id", "text", "shard", "pos")
    val got = Packing.assignChunksBy(df, "shard", "pos", "text", budgetTokens = 5)
      .select("pos", "chunk_id", "straddles")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(got.toSeq === Seq((1L, 0L, false), (2L, 0L, true), (3L, 1L, false), (4L, 2L, false)))
    // id-order packing of the same docs differs -> the order genuinely drives the chunks
    val byId = Packing.assignChunks(df.select("doc_id", "text"), "doc_id", "text",
        nShards = 1, budgetTokens = 5)
      .select("id", "chunk_id", "straddles")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(byId.toSeq === Seq((1L, 0L, false), (2L, 0L, true), (3L, 1L, true), (4L, 2L, false)))
  }

  test("epoch-shuffle -> packing composition is invariant to input partitioning") {
    val docs = queries.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    def summary(df: org.apache.spark.sql.DataFrame) =
      Packing.chunkSummaryBy(
          graft.ops.Sampling.epochShuffle(df, "doc_id", epoch = 3, shards = 8),
          "shard", "pos", "text", budgetTokens = 1000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val a = summary(docs)
    val b = summary(docs.repartition(7))
    assert(a.nonEmpty && a === b,
      "epoch pack summary changed under a different input partitioning")
  }

  test("gopherQualityFlags: each rule passes and fails on closed-form docs") {
    import spark.implicits._
    val good = (("the and of to in is that for " * 7).trim + " " +
      (1 to 10).map(i => s"word$i").mkString(" ")) // 66 words, 2+ stopwords
    val docs = Seq(
      (1L, good),                                   // passes every rule
      (2L, "the and " + ("w " * 10).trim),          // 12 words: fails word count only
      (3L, ("the and " * 30).trim + " aa"),         // 61 words, mean len < 3
      (4L, good + " " + ("##########" * 2)),        // symbol ratio > 0.1
      (5L, good.replaceAll("word", "99")),          // digit words: alpha < 80%? no - only 10/66; keep alpha pass
      (6L, ("zz " * 60).trim))                      // 60 words, no stopwords
      .toDF("doc_id", "text")
    val got = graft.ops.TextOps.gopherQualityFlags(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    def flags(i: Int) = (got(i).getBoolean(2), got(i).getBoolean(3),
      got(i).getBoolean(4), got(i).getBoolean(5), got(i).getBoolean(6),
      got(i).getBoolean(7))
    assert(flags(0) === ((true, true, true, true, true, true)), "doc1 all-pass")
    assert(flags(1)._1 === false && flags(1)._6 === false, "doc2 word count")
    assert(flags(2)._2 === false, "doc3 mean word length")
    assert(flags(3)._3 === false, "doc4 symbol ratio")
    assert(flags(5)._5 === false && flags(5)._1 === true, "doc6 stopwords")
  }

  test("gopherQualityFlags: alpha-word rule fails a digit-dominated doc") {
    import spark.implicits._
    val text = "the and " + (1 to 60).map(_.toString).mkString(" ") // 62 words, 60 numeric
    val got = graft.ops.TextOps.gopherQualityFlags(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text").collect()(0)
    assert(got.getBoolean(5) === false, "alpha rule must fail")
    assert(got.getBoolean(2) === true, "word count passes at 62")
  }
}
