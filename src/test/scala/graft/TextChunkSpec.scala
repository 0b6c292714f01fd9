package graft

import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Behavioral pins for the chunking / duplicated-span operators
  * ([[TextOps.chunkRows]], [[TextOps.dupGramStats]]) — the value-level
  * gates live in the DuckDB oracles (`text_chunk_overlap`,
  * `text_dup_grams`); these specs pin the hand-checkable contract. */
class TextChunkSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("chunkRows: hand-checked 5-token doc, window 3 stride 2") {
    val out = TextOps.chunkRows(docs(1L -> "a b c d e"), "doc_id", "text", 3, 2)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq((0L, 3L, "a b c"), (1L, 3L, "c d e"), (2L, 1L, "e")))
  }

  test("chunkRows: every token covered, consecutive chunks overlap by window-stride") {
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val out = TextOps.chunkRows(docs(7L -> text), "doc_id", "text", 32, 24)
      .orderBy("chunk_idx").collect()
    // starts at 0,24,48,72,96 — last start < n; spans reach exactly n
    assert(out.length == 5)
    val covered = out.flatMap { r =>
      val st = r.getLong(1) * 24
      st until (st + r.getLong(2))
    }.toSet
    assert(covered == (0 until 100).toSet)
    // adjacent chunks share exactly window-stride=8 token positions
    val firstTok = out.map(_.getString(3).split(" ").head)
    assert(firstTok.toSeq == Seq("w1", "w25", "w49", "w73", "w97"))
    assert(out(0).getString(3).split(" ").takeRight(8).toSeq ==
      out(1).getString(3).split(" ").take(8).toSeq)
  }

  test("chunkRows: short doc yields one short chunk; normalization applied") {
    val out = TextOps.chunkRows(docs(3L -> "  Hello,   WORLD!  "), "doc_id", "text", 32, 24)
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(2) == 2L && out(0).getString(3) == "hello world")
  }

  test("dupGramStats: exact copy fully duplicated, disjoint doc untouched") {
    val base = (1 to 12).map(i => s"t$i").mkString(" ")
    val other = (1 to 12).map(i => s"u$i").mkString(" ")
    val out = TextOps.dupGramStats(
      docs(1L -> base, 2L -> base, 3L -> other), "doc_id", "text", k = 8)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // 12 tokens -> 5 distinct 8-grams each
    assert(out.toSeq == Seq((1L, 5L, 5L, 1.0), (2L, 5L, 5L, 1.0), (3L, 5L, 0L, 0.0)))
  }

  test("dupGramStats: one-token-appended near copy still shares every original gram") {
    val base = (1 to 10).map(i => s"t$i").mkString(" ")
    val out = TextOps.dupGramStats(
      docs(1L -> base, 2L -> (base + " extra")), "doc_id", "text", k = 8)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc1: 3 grams, all appearing in doc2; doc2 has one novel tail gram
    assert(out.toSeq == Seq((1L, 3L, 3L), (2L, 4L, 3L)))
  }

  test("dupGramStats: docs shorter than k drop out") {
    val out = TextOps.dupGramStats(docs(1L -> "a b c"), "doc_id", "text", k = 8)
    assert(out.count() == 0L)
  }

  test("removeRepeatedSpansKeepFirst: first occurrence survives, later copies struck") {
    val run = (1 to 9).map(i => s"t$i").mkString(" ") // 9-word repeated run
    val out = TextOps.removeRepeatedSpansKeepFirst(
        docs(1L -> s"$run unique one",
             2L -> s"other lead $run",
             3L -> "no repeats here at all"),
        "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // doc1 holds the canonical (smallest doc_id, pos) copy: untouched.
    // doc2 loses the whole 9-word run (maximal span, not just one gram)
    // but keeps its unique lead. doc3 untouched.
    assert(out(0) === ((1L, s"$run unique one", 0L, 0L)))
    assert(out(1) === ((2L, "other lead", 9L, 1L)))
    assert(out(2) === ((3L, "no repeats here at all", 0L, 0L)))
  }

  test("removeRepeatedSpansKeepFirst: within-document repeats keep only the first") {
    val run = (1 to 8).map(i => s"r$i").mkString(" ")
    val out = TextOps.removeRepeatedSpansKeepFirst(
        docs(5L -> s"$run mid $run"), "doc_id", "text", k = 8)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) === ((s"$run mid", 8L, 1L)))
  }
}
