package graft

import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Behavioral pins for the ML-prep operators (segment dedup, unigram
  * rarity); the registered queries pin the same code against DuckDB at
  * corpus scale, these cover the edge semantics an oracle on real data
  * never hits. */
class MlPrepSpec extends SparkSpec {
  import spark.implicits._

  test("wordSegments: disjoint blocks, short trailing block, single-word text") {
    val df = Seq("a b c d e f g", "a", "").toDF("text")
      .select(TextOps.wordSegments(col("text"), 3).as("segs"))
    val got = df.collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b c", "d e f", "g"))
    assert(got(1) == Seq("a"))
    // normalize("") -> "" -> [""] -> one empty segment
    assert(got(2) == Seq(""))
  }

  test("removeFrequentSegments strikes cross-document boilerplate, keeps order and in-doc repeats") {
    val docs = Seq(
      (1L, "foo bar baz alpha beta gamma foo bar baz"), // boilerplate, unique, boilerplate
      (2L, "foo bar baz delta epsilon zeta"),
      (3L, "delta epsilon zeta")).toDF("doc_id", "text")
    // k=3: "foo bar baz" is in docs 1+2; "delta epsilon zeta" is a full
    // segment only in docs 2 (position 2) and 3 (position 1)
    val out = TextOps.removeFrequentSegments(docs, "doc_id", "text", k = 3, minDocs = 2)
      .orderBy("doc_id")
      .select("deduped_text", "n_removed_segments").as[(String, Long)].collect()
    assert(out(0) == (("alpha beta gamma", 2L))) // both copies struck
    assert(out(1) == (("", 2L)))                 // fully boilerplate -> empty
    assert(out(2) == (("", 1L)))
  }

  test("removeFrequentSegments typed rewrite mirrors the declarative segmentation exactly") {
    // messy text: punctuation, case, multi-space — the Scala normalize
    // mirror must agree with wordSegments on the declarative side
    val docs = Seq(
      (1L, "Foo,  BAR! baz  qux"), (2L, "foo bar baz zap"), (3L, "unrelated text here"))
      .toDF("doc_id", "text")
    val declarativeSegs = docs
      .select(col("doc_id"), TextOps.wordSegments(col("text"), 3).as("segs"))
      .orderBy("doc_id").collect().map(_.getSeq[String](1))
    assert(declarativeSegs(0) == Seq("foo bar baz", "qux"))
    val out = TextOps.removeFrequentSegments(docs, "doc_id", "text", k = 3, minDocs = 2)
      .orderBy("doc_id")
      .select("deduped_text", "n_removed_segments").as[(String, Long)].collect()
    assert(out(0) == (("qux", 1L))) // "foo bar baz" shared with doc 2
    assert(out(1) == (("zap", 1L)))
    assert(out(2) == (("unrelated text here", 0L)))
  }

  test("removeFrequentSegments: distributed fallback above the broadcast cap is byte-identical") {
    // 3 frequent segments; cap=2 forces the shuffle-join rewrite, cap=3
    // stays on the broadcast-set narrow pass — output must not change.
    val docs = Seq(
      (1L, "foo bar baz alpha beta gamma delta epsilon zeta one two three"),
      (2L, "foo bar baz delta epsilon zeta keep me here alpha beta gamma"),
      (3L, "alpha beta gamma unique stuff only foo bar baz")).toDF("doc_id", "text")
    def run(cap: Int) = TextOps.removeFrequentSegments(
        docs, "doc_id", "text", k = 3, minDocs = 2, maxBroadcastSegments = cap)
      .orderBy("doc_id")
      .select("doc_id", "deduped_text", "n_removed_segments")
      .as[(Long, String, Long)].collect().toSeq
    val broadcastPath = run(3)   // at the cap: still broadcast
    val joinPath = run(2)        // above the cap: distributed rewrite
    assert(broadcastPath == joinPath)
    assert(broadcastPath.map(_._3) == Seq(3L, 3L, 2L)) // the frequent 3 struck
    // schema parity between the two paths (driver gate hashes by name)
    assert(run(0).map(_._1) == Seq(1L, 2L, 3L)) // cap 0 -> always fallback
  }

  test("removeDuplicatedSpans: overlapping coverage union, unique flanks survive") {
    val docs = Seq(
      (1L, "a b c d a b c"),     // "a b c" at starts 0 and 4
      (2L, "x a b c y"),          // "a b c" at start 1
      (3L, "unique words only")).toDF("doc_id", "text")
    val out = TextOps.removeDuplicatedSpans(docs, "doc_id", "text", k = 3, minDocs = 2)
      .orderBy("doc_id")
      .select("cleaned_text", "n_removed_words").as[(String, Long)].collect()
    // doc 1: positions 0-2 and 4-6 covered -> only "d" survives
    assert(out(0) == (("d", 6L)))
    // doc 2: positions 1-3 covered -> flanks "x y" survive
    assert(out(1) == (("x y", 3L)))
    assert(out(2) == (("unique words only", 0L)))
  }

  test("removeDuplicatedSpans: distributed fallback above the broadcast cap is byte-identical") {
    val docs = Seq(
      (1L, "a b c d a b c e f g h i"),
      (2L, "x a b c y e f g h j"),
      (3L, "e f g h unique tail stuff")).toDF("doc_id", "text")
    def run(cap: Int) = TextOps.removeDuplicatedSpans(
        docs, "doc_id", "text", k = 3, minDocs = 2, maxBroadcastGrams = cap)
      .orderBy("doc_id")
      .select("doc_id", "cleaned_text", "n_removed_words")
      .as[(Long, String, Long)].collect().toSeq
    val broadcastPath = run(10)  // frequent set fits: narrow pass
    val joinPath = run(0)        // cap 0: always the distributed rewrite
    assert(broadcastPath == joinPath,
      s"paths diverge:\n  bc=$broadcastPath\n  dj=$joinPath")
    assert(broadcastPath.forall(_._3 > 0), "expected removals in every doc")
  }

  test("unigramRarityScores: maxVocab caps the broadcast; OOV under the cap scores as singleton") {
    // c(a)=3, c(b)=2, c(z)=1, n_total=6; maxVocab=2 keeps {a,b} (count
    // desc, token asc), z becomes OOV -> rarity n_total*scale
    val docs = Seq((1L, "a a a b"), (2L, "b z")).toDF("doc_id", "text")
    val got = TextOps.unigramRarityScores(docs, "doc_id", "text", scale = 100L,
        maxVocab = 2)
      .orderBy("id").as[(Long, Long, Long)].collect()
    // r(a) = 600 div 3 = 200; r(b) = 600 div 2 = 300; r(z OOV) = 600*100? no:
    // OOV default = n_total * scale = 600
    assert(got(0) == ((1L, 3 * 200L + 300L, 4L)))
    assert(got(1) == ((2L, 300L + 600L, 2L)))
    // tie-break under ties: c(x)=c(y)=1 -> cap 1 keeps x (token asc)
    val ties = Seq((1L, "x y")).toDF("doc_id", "text")
    val t = TextOps.unigramRarityScores(ties, "doc_id", "text", scale = 100L,
        maxVocab = 1).orderBy("id").as[(Long, Long, Long)].collect()
    // r(x) = 200 div 1 = 200; y OOV = 200
    assert(t(0) == ((1L, 400L, 2L)))
  }

  test("long_gram_matrix: partition-invariant and equal to the explode formulation") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(graft.ops.Clustering.microVec(col("embedding")).as("xm"))
    def gram(parts: Int) = emb.repartition(parts)
      .agg(graft.functions.long_gram_matrix(col("xm"), 64).as("gm"))
      .select("gm.n", "gm.s", "gm.g")
      .as[(Long, Seq[Long], Seq[Long])].head()
    val (n, s, g) = gram(1)
    assert(gram(13) == ((n, s, g)))
    // spot-check against independently computed sums: dims 1x1, 1x2, 2x2
    val ex = emb.select(posexplode(col("xm")).as(Seq("d", "x")))
    val x1 = ex.filter(col("d") === 0).agg(sum("x"), sum(col("x") * col("x")))
      .as[(Long, Long)].head()
    assert(s.head == x1._1 && g.head == x1._2)
    assert(n == emb.count())
    assert(g.size == 64 * 65 / 2 && s.size == 64)
  }

  test("unigramRarityScores: exact integer rarity sums; OOV takes the singleton default") {
    // corpus: "a a a b" -> n_total=4; c(a)=3, c(b)=1
    val docs = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val got = TextOps.unigramRarityScores(docs, "doc_id", "text", scale = 100L)
      .orderBy("id").as[(Long, Long, Long)].collect()
    // r(a) = 400 div 3 = 133; r(b) = 400 div 1 = 400
    assert(got(0) == ((1L, 3 * 133L, 3L)))
    assert(got(1) == ((2L, 400L, 1L)))

    // minCount=2 drops b from the vocabulary; OOV default = n_total*scale
    val oov = TextOps.unigramRarityScores(docs, "doc_id", "text", scale = 100L, minCount = 2L)
      .orderBy("id").as[(Long, Long, Long)].collect()
    assert(oov(1) == ((2L, 400L, 1L))) // 4*100 = singleton rarity here
    assert(oov(0) == ((1L, 3 * 133L, 3L)))
  }

  test("PQ top-k on an empty corpus returns an empty frame, not a crash") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val out = graft.ops.Pq.pqTopK(empty, "vec_id", "embedding",
      org.apache.spark.sql.functions.col("vec_id") % 2 === 0, k = 3, dim = 4, m = 2, ks = 2)
    assert(out.count() == 0)
  }

  test("PQ top-k on a tiny corpus ranks every other vector exactly once per query") {
    val s = spark
    import s.implicits._
    val vecs = (0L until 8L).map(i =>
      (i, Seq.tabulate(4)(d => (i * 4 + d).toFloat))).toDF("vec_id", "embedding")
    val out = graft.ops.Pq.pqTopK(vecs, "vec_id", "embedding",
        org.apache.spark.sql.functions.col("vec_id") === 0, k = 10, dim = 4, m = 2, ks = 4)
      .collect()
    // one query, 7 candidates, k capped by candidate count
    assert(out.length == 7)
    assert(out.map(_.getLong(3)).toSeq == out.map(_.getLong(3)).toSeq.sorted,
      "adist must rank ascending")
  }

  test("hashed quality score keeps token-less and null-text documents at the bias") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "spark merges tables"), (2L, "!!! ???"), (3L, null))
      .toDF("doc_id", "text")
    val out = graft.ops.TextOps.hashedQualityScore(docs, "doc_id", "text",
        graft.ops.TextOps.pseudoWeights(64), bias = 5L)
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(1).getLong(1) == 5L && out(2).getLong(1) == 5L,
      "empty/null docs must score exactly the bias")
    assert(out(1).getBoolean(2) && out(2).getBoolean(2)) // bias 5 > 0
  }

  test("hashed quality score is additive over token multiplicity") {
    val s = spark
    import s.implicits._
    val w = graft.ops.TextOps.pseudoWeights(64)
    val docs = Seq((1L, "spark"), (2L, "spark spark spark")).toDF("doc_id", "text")
    val sc = graft.ops.TextOps.hashedQualityScore(docs, "doc_id", "text", w)
      .orderBy("doc_id").collect().map(_.getLong(1))
    assert(sc(1) == 3 * sc(0), s"expected 3x single-token score, got ${sc.toSeq}")
  }

  test("isotonic PAV via minimax identity equals sequential pool merging and is monotone") {
    // direct PAV: merge adjacent pools while a violation exists
    def pav(bins: Seq[(Long, Long)]): Seq[Double] = {
      case class Pool(n: Long, p: Long, w: Int)
      var pools = bins.map { case (n, p) => Pool(n, p, 1) }.toList
      var changed = true
      while (changed) {
        changed = false
        pools = pools.foldLeft(List.empty[Pool]) { (acc, cur) =>
          acc match {
            case h :: t
                if h.p.toDouble * cur.n > cur.p.toDouble * h.n => // h rate > cur rate
              changed = true
              Pool(h.n + cur.n, h.p + cur.p, h.w + cur.w) :: t
            case _ => cur :: acc
          }
        }.reverse
      }
      pools.flatMap(pl => Seq.fill(pl.w)(pl.p.toDouble / pl.n))
    }
    // minimax identity computed directly
    def minimax(bins: Seq[(Long, Long)]): Seq[Double] =
      bins.indices.map { i =>
        (0 to i).map { j =>
          (i until bins.length).map { k =>
            val seg = bins.slice(j, k + 1)
            seg.map(_._2).sum.toDouble / seg.map(_._1).sum
          }.min
        }.max
      }
    val cases = Seq(
      Seq((10L, 1L), (10L, 5L), (10L, 3L), (10L, 9L)), // one violation
      Seq((5L, 5L), (5L, 0L), (5L, 5L), (5L, 0L)),     // saw-tooth
      Seq((7L, 1L), (9L, 3L), (4L, 2L), (6L, 5L)),     // already monotone
      Seq((3L, 3L), (3L, 2L), (3L, 1L)))               // fully reversed
    for (bs <- cases) {
      val a = pav(bs); val b = minimax(bs)
      assert(a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-12 },
        s"pav $a != minimax $b for $bs")
      assert(b.sliding(2).forall(w => w.length < 2 || w(0) <= w(1) + 1e-12),
        s"fit not monotone: $b")
    }
  }
}
