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

  test("segmentRanked equals the sequential exhaustive chain at vocabulary scale") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("train_text", concat_ws(" ", col("text"),
        md5(col("doc_id").cast("string"))))
    val merges = Bpe.train(docs, "train_text", numMerges = 512,
      maxTrainWords = 2000)
    assert(merges.size === 512)
    val ranks = Bpe.rankMap(merges)
    val words = docs.select(col("train_text")).collect()
      .flatMap(r => Bpe.normalizeString(r.getString(0)).split(" "))
      .filter(_.nonEmpty).distinct
    assert(words.length > 400)
    words.foreach { w =>
      assert(Bpe.segmentRanked(w, ranks) === Bpe.segment(w, merges),
        s"divergence on word '$w'")
    }
  }

  test("id-based apply equals the char path at vocabulary scale; works past the BMP ceiling") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("train_text", concat_ws(" ", col("text"),
        md5(col("doc_id").cast("string"))))
    val mergesI = Bpe.trainIds(docs, "train_text", numMerges = 1024,
      maxTrainWords = 400)
    val merges = Bpe.toCharMerges(mergesI)
    val ranksC = Bpe.rankMap(merges)
    val ranksI = Bpe.rankMapIds(mergesI)
    val words = docs.select(col("train_text")).collect()
      .flatMap(r => Bpe.normalizeString(r.getString(0)).split(" "))
      .filter(_.nonEmpty).distinct
    assert(words.length > 400)
    words.foreach { w =>
      val viaIds = Bpe.segmentRankedIds(w.toCharArray.map(_.toInt), ranksI)
      val viaChars = Bpe.segmentRanked(w, ranksC)
      assert(viaIds.toSeq === viaChars.toCharArray.map(_.toInt).toSeq,
        s"id/char segmentation divergence on word '$w'")
    }
    // frame-level: tokenCountsIds == tokenCounts (which now delegates)
    val a = Bpe.tokenCounts(docs, "doc_id", "train_text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val b = Bpe.tokenCountsIds(docs, "doc_id", "train_text", mergesI)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(a === b)
    // PAST THE CEILING: merge ranks whose output ids exceed the BMP —
    // unrepresentable as single chars (toCharMerges refuses), applied
    // fine by the id path. rk=60000 -> z=60191 > 0xD7FF.
    val r1 = 60000
    val z1 = 191 + r1
    val ms = Seq(Bpe.MergeI(r1, 'a'.toInt, 'b'.toInt, 9L),
      Bpe.MergeI(r1 + 1, z1, z1, 3L))
    val seg = Bpe.segmentRankedIds("ababab".toCharArray.map(_.toInt),
      Bpe.rankMapIds(ms))
    assert(seg.toSeq === Seq(191 + r1 + 1, z1))
    intercept[IllegalArgumentException] { Bpe.toCharMerges(ms) }
  }

  test("merge artifact round trip is exact; truncated/reordered artifacts refuse") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val trained = Bpe.trainIds(docs, "text", numMerges = 64, maxTrainWords = 500)
    val path = java.nio.file.Files.createTempDirectory("bpe-art").toString + "/m.tsv"
    Bpe.exportMerges(spark, trained, path)
    assert(Bpe.importMerges(spark, path) == trained)
    // deterministic bytes: re-export writes the identical artifact
    val path2 = path + ".2"
    Bpe.exportMerges(spark, trained, path2)
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path2))))
    // a dropped line breaks rank contiguity and refuses
    val lines = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8").linesIterator.toVector
    java.nio.file.Files.write(java.nio.file.Paths.get(path + ".bad"),
      (lines.take(10) ++ lines.drop(11)).mkString("", "\n", "\n").getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      Bpe.importMerges(spark, path + ".bad")
    }
    assert(e.getMessage.contains("contiguous"))
    // a foreign file refuses on the header
    java.nio.file.Files.write(java.nio.file.Paths.get(path + ".hdr"),
      "1\t2\t1\t5\n".getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException] {
      Bpe.importMerges(spark, path + ".hdr")
    }
    assert(e2.getMessage.contains("header"))
  }

  test("vocabulary-scale training: counts non-increasing, symbols fresh, prefix-stable") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("train_text", concat_ws(" ", col("text"),
        md5(col("doc_id").cast("string"))))
    val m = Bpe.train(docs, "train_text", numMerges = 1024, maxTrainWords = 2000)
    assert(m.size === 1024)
    // counts never increase round-over-round: a merge's output pairs can
    // only count at most the merged pair's count, and every surviving
    // pair's count is monotonically consumed
    m.sliding(2).foreach { case Seq(a, b) =>
      assert(b.cnt <= a.cnt, s"count rose ${a.rk}->${b.rk}: ${a.cnt}->${b.cnt}")
    }
    // merge 64+ crosses the old U+00FF ceiling into the wider BMP range
    assert(m(100).merged.codePointAt(0) > 0xFF)
    m.foreach(x => assert(x.merged.length === 1))
    // prefix-stability: the first 512 merges equal an independent 512 run
    val m512 = Bpe.train(docs, "train_text", numMerges = 512, maxTrainWords = 2000)
    assert(m.take(512) === m512)
  }

  /** The pre-r13 trainer verbatim: full pair recount every round over
    * STRING segmentations — the executable spec the incremental
    * Array[Int]-symbol trainer must match decision-for-decision. */
  private def trainReference(segs0: Seq[(String, Long)],
      numMerges: Int): Seq[Bpe.Merge] = {
    var segs = segs0.toArray
    val out = Seq.newBuilder[Bpe.Merge]
    for (i <- 1 to numMerges) {
      val counts = scala.collection.mutable.LongMap.empty[Long]
      segs.foreach { case (s, f) =>
        val n = s.length
        var j = 0
        while (j < n - 1) {
          if (s.charAt(j) == s.charAt(j + 1)) {
            val c = s.charAt(j)
            var k = j + 1
            while (k < n && s.charAt(k) == c) k += 1
            val key = (c.toLong << 16) | c.toLong
            counts(key) = counts.getOrElse(key, 0L) + ((k - j) / 2).toLong * f
            j = k - 1
          } else {
            val key = (s.charAt(j).toLong << 16) | s.charAt(j + 1).toLong
            counts(key) = counts.getOrElse(key, 0L) + f
            j += 1
          }
        }
      }
      var bestKey = -1L
      var bestCnt = -1L
      counts.foreachEntry { (k, c) =>
        if (c > bestCnt || (c == bestCnt && k < bestKey)) { bestKey = k; bestCnt = c }
      }
      val bestPair = "" + (bestKey >> 16).toChar + (bestKey & 0xffff).toChar
      val m = Bpe.mergedChar(i)
      out += Bpe.Merge(i.toLong, bestPair, m, bestCnt)
      segs = segs.map { case (s, f) => (s.replace(bestPair, m), f) }
    }
    out.result()
  }

  test("incremental trainer equals the full-recount reference at vocabulary scale") {
    // real corpus: sf0.001 docs enriched with two md5 words per doc (the
    // r13 large-family corpus), deep into the count-1 tail where stale
    // heap entries and delta bookkeeping are most stressed
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("train_text", concat_ws(" ", col("text"),
        md5(col("doc_id").cast("string")),
        md5(concat(col("doc_id").cast("string"), lit("x")))))
    val segs0 = docs.select(col("train_text")).collect()
      .flatMap(r => Bpe.normalizeString(r.getString(0)).split(" "))
      .filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
      .toSeq.sortBy { case (w, f) => (-f, w) }.take(2000)
    val want = trainReference(segs0, 2000)
    val got = Bpe.train(docs, "train_text", numMerges = 2000, maxTrainWords = 2000)
    assert(got.size === 2000)
    got.zip(want).foreach { case (g, w) =>
      assert(g === w, s"divergence at rank ${w.rk}: got $g want $w")
    }
  }

  test("incremental trainer equals the reference on adversarial run-heavy corpora") {
    // repeated-symbol runs are where the ⌊L/2⌋ convention and the delta
    // walk interact; exhaust nearly the whole supply
    val docs = corpus((1L, "aaaaaaa aaab abab bbbb abba baab aabb a b"),
      (2L, "aaaaaaa abab abab aaab xxyyxx yxxy xyxy"))
    val segs0 = docs.select(col("text")).collect()
      .flatMap(r => Bpe.normalizeString(r.getString(0)).split(" "))
      .filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
      .toSeq.sortBy { case (w, f) => (-f, w) }
    val n = 20
    val want = trainReference(segs0, n)
    val got = Bpe.train(docs, "text", numMerges = n, maxTrainWords = 2000)
    assert(got === want)
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

  test("wordpieceSegment is greedy longest-match-first; UNK when stuck") {
    val v = new java.util.HashSet[String]()
    Seq("a", "b", "ab", "abc", "bc").foreach(v.add)
    // longest-first: 'abc' wins over 'ab'+'c' (and 'c' isn't in vocab)
    assert(Bpe.wordpieceSegment("abcbc", v, 3) == List("abc", "bc"))
    // greedy is NOT globally optimal: 'abab' -> ab|ab (2), but 'abb'
    // takes 'ab' then lone 'b' (2) rather than a|bb
    assert(Bpe.wordpieceSegment("abab", v, 3) == List("ab", "ab"))
    assert(Bpe.wordpieceSegment("abb", v, 3) == List("ab", "b"))
    // stuck: 'z' has no piece at position 0 -> null (the UNK word)
    assert(Bpe.wordpieceSegment("zab", v, 3) == null)
    assert(Bpe.wordpieceSegment("abz", v, 3) == null)
  }

  test("viterbiCost backtracks where greedy commits; unreachable is -1") {
    val v = new java.util.HashSet[String]()
    Seq("a", "b", "ab", "bca").foreach(v.add)
    // greedy dies on 'abca' (commits to 'ab', stuck at 'ca'); Viterbi
    // finds a|bca at cost(1) + cost(3)
    assert(Bpe.wordpieceSegment("abca", v, 3) == null)
    assert(Bpe.viterbiCost("abca", v, 3) ==
      Bpe.pieceCost(1) + Bpe.pieceCost(3))
    // prefers one long piece over three short ones
    assert(Bpe.viterbiCost("bca", v, 3) == Bpe.pieceCost(3))
    // truly unreachable -> -1
    assert(Bpe.viterbiCost("zz", v, 3) == -1L)
    // min-cost <= any greedy segmentation's cost, corpus-wide
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 30)
    val merges = Bpe.train(docs, "text", numMerges = 8, maxTrainWords = 2000)
    val (vocab, maxLen) = Bpe.wordpieceVocab(merges)
    docs.select(col("text")).collect()
      .flatMap(r => Bpe.normalizeString(r.getString(0)).split(" "))
      .filter(w => w.nonEmpty && w.length <= 24)
      .foreach { w =>
        val greedy = Bpe.wordpieceSegment(w, vocab, maxLen)
        val greedyCost = greedy.map(p => Bpe.pieceCost(p.length)).sum
        val vit = Bpe.viterbiCost(w, vocab, maxLen)
        assert(vit >= 0 && vit <= greedyCost,
          s"viterbi must not exceed greedy: $w vit=$vit greedy=$greedyCost")
      }
  }

  test("wordpiece greedy apply can differ from BPE merge-order apply") {
    // merges learned: (a,b) then (b,c). BPE-apply on 'abc' merges the
    // rank-1 pair first: ab|c. Greedy longest-match under the induced
    // piece set {a..z, ab, bc} also yields ab|c — but on 'xbc' BPE
    // leaves x|bc via merge 2 while greedy ALSO finds x|bc; the real
    // divergence needs a piece that overlaps a better later match:
    // vocab {a, b, c, ab, bca}: greedy 'abca' -> ab|?? (stuck at 'ca')
    // while an optimal segmentation a|bca exists. Pin the stuck case.
    val v = new java.util.HashSet[String]()
    Seq("a", "b", "ab", "bca").foreach(v.add)
    assert(Bpe.wordpieceSegment("abca", v, 3) == null,
      "greedy must commit to 'ab' and get stuck — longest-match, no backtrack")
    // wordpieceVocab induces full char coverage, so corpus words never
    // go UNK under a trained merge list
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 30)
    val merges = Bpe.train(docs, "text", numMerges = 8, maxTrainWords = 2000)
    val (vocab, maxLen) = Bpe.wordpieceVocab(merges)
    assert(maxLen >= 2)
    docs.select(col("text")).collect()
      .flatMap(r => Bpe.normalizeString(r.getString(0)).split(" "))
      .filter(_.nonEmpty)
      .foreach { w =>
        val ps = Bpe.wordpieceSegment(w, vocab, maxLen)
        assert(ps != null && ps.mkString("") == w,
          s"pieces must concatenate back to the word: $w -> $ps")
      }
  }
}
