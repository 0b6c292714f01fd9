package graft

import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** BPE tokenizer invariants beyond the oracle gate: hand-checked merges
  * on a closed-form corpus, the monotone compression property, and the
  * application-order equivalence the single-char-symbol design rests on. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("train: hand-checked first merges on a closed-form corpus") {
    // "abab" x3, "abc" x2: pair counts ab=3*2+2=8, ba=3, bc=2 -> merge 1 = "ab"->À
    // then ÀÀ (in ÀÀ x3) = 3, Àc = 2 -> merge 2 = "ÀÀ"
    val docs = corpus((1L, "abab abab abab abc abc"))
    val m = Bpe.train(docs, "text", numMerges = 2, maxTrainWords = 100)
    assert(m.map(x => (x.pair, x.cnt)) ===
      Seq(("ab", 8L), ("ÀÀ", 3L)))
    assert(m.map(_.merged) === Seq("À", "Á"))
  }

  test("train: tie on count breaks to the codepoint-ascending pair") {
    // "xy" and "yz" both occur twice (in xyq, xyr, syz, tyz)
    val docs = corpus((1L, "xyq xyr syz tyz"))
    val m = Bpe.train(docs, "text", numMerges = 1, maxTrainWords = 100)
    assert(m.head.pair === "xy" && m.head.cnt === 2L)
  }

  test("train counts use the non-overlap convention: 'aaa' holds one 'aa'") {
    val docs = corpus((1L, "aaa aaa"))
    val m = Bpe.train(docs, "text", numMerges = 1, maxTrainWords = 100)
    assert(m.head.pair === "aa" && m.head.cnt === 2L) // one per word, not two
  }

  test("segment: sequential exhaustive application, left-to-right greedy") {
    val merges = Seq(
      Bpe.Merge(1, "ab", "À", 0),
      Bpe.Merge(2, "Àc", "Á", 0))
    assert(Bpe.segment("ababc", merges) === "ÀÁ")
    assert(Bpe.segment("aab", merges) === "aÀ")
    assert(Bpe.segment("xyz", merges) === "xyz")
  }

  test("tokenCounts: bpe tokens <= chars, >= words; empty text yields (0, 0)") {
    val docs = corpus((1L, "the quick brown fox"), (2L, ""), (3L, "!!!"))
    val m = Bpe.train(corpus((1L, "the the quick quick brown fox")),
      "text", numMerges = 4, maxTrainWords = 100)
    val got = Bpe.tokenCounts(docs, "doc_id", "text", m)
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    val r1 = got(0)
    assert(r1.getLong(1) === 4L) // n_words
    assert(r1.getLong(2) >= 4L && r1.getLong(2) <= "thequickbrownfox".length)
    assert(got(1).getLong(1) === 0L && got(1).getLong(2) === 0L)
    assert(got(2).getLong(1) === 0L && got(2).getLong(2) === 0L)
  }

  test("more merges never increase a document's token count") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 50)
    val m8 = Bpe.train(docs, "text", numMerges = 8, maxTrainWords = 2000)
    val m16 = Bpe.train(docs, "text", numMerges = 16, maxTrainWords = 2000)
    assert(m16.take(8) === m8, "merge list must be prefix-stable")
    val t8 = Bpe.tokenCounts(docs, "doc_id", "text", m8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val t16 = Bpe.tokenCounts(docs, "doc_id", "text", m16)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    t8.foreach { case (id, t) => assert(t16(id) <= t) }
  }
}
