package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against the corpus, no shuffle of the corpus itself; per-row work
  * is a codegen'd higher-order-function dot product (no UDF).
  *
  * Scale path: sign-random-projection LSH — each vector is bucketed by the
  * sign pattern of `nPlanes` pseudo-random hyperplanes (±1 components
  * derived from md5, so executors agree without sharing state AND the
  * DuckDB oracle regenerates the planes). Neighbor search probes the
  * query's bucket plus Hamming-1 neighbors: candidate count drops
  * ~2^nPlanes/(nPlanes+1)-fold; recall is pinned in PipelineSpec.
  * The same structure distributes: bucket id is the shuffle key, buckets
  * are independent, and skewed buckets split under AQE.
  */
object Similarity {

  /** Dot product of two `array<float>` columns via the native codegen'd
    * [[graft.functions.FloatVectorDot]] expression. Same arithmetic
    * contract as the interpreted `aggregate(zip_with(...))` formulation
    * (widen to double, sequential index-order accumulation — what the
    * DuckDB oracle computes) but compiled to a primitive loop. */
  def dot(a: Column, b: Column): Column = graft.functions.float_dot(a, b)

  /** Generic dot for non-float arrays (used by the LSH projections where
    * one side is a derived double array): interpreted HOF — fine off the
    * per-pair hot path. */
  def dotAny(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Rank scored (query_id, cand_id, cos) rows to exact top-k per query
    * via the bounded-heap [[graft.functions.TopKPairs]] aggregate: one
    * hash aggregate with O(log k) heap admission per row, versus the
    * window formulation's sort + WindowGroupLimit + window + filter
    * stages (Spark 4's group-limit rewrite already bounds that route's
    * shuffle to k rows per group per partition; the sort is what this
    * removes). Order and tie-break (cos desc, cand_id asc) match the
    * window formulation exactly. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.functions.topk_pairs(col("cos"), col("cand_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "p")))
      .select(col("query_id"), (col("pos") + 1).cast(LongType).as("rk"),
        col("p.id").as("cand_id"), round(col("p.score"), 4).as("cos_r"))

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of two
    * retrieval rankings over the same corpus: ranker A = cosine, ranker
    * B = raw dot product (they disagree exactly when candidate norms
    * vary — the standard hybrid-retrieval shape; swap either for BM25 /
    * ANN lists in production, the fusion is ranking-agnostic).
    * TRUNCATED-list RRF: each ranker contributes its top `perList`
    * candidates; a candidate absent from one list contributes 0 from it.
    * RRF contribution 1/(rrfK + rank) is snapped to integer micro-units
    * per list and the fused score is their exact integer sum — rank ties
    * and fusion ties both break on candidate id, so the oracle replays
    * the fusion bit-for-bit.
    *
    * Scale shape: queries broadcast against the corpus (one narrow
    * scored pass, no corpus shuffle), each ranker's top-perList is the
    * bounded-heap [[graft.functions.TopKPairs]] aggregate (shuffle =
    * O(queries × perList), never a corpus sort), and the fusion join +
    * final heap run on list-sized relations only. */
  def rrfFusion(emb: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, perList: Int, k: Int, rrfK: Int = 60): DataFrame = {
    val queries = emb.filter(isQuery).select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), norm(col(vecCol)).as("qn"))
      .filter(col("qn") > 0)
    val corpus = emb.select(col(idCol).as("cand_id"),
      col(vecCol).as("cv"), norm(col(vecCol)).as("cn"))
      .filter(col("cn") > 0)
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"),
        dot(col("qv"), col("cv")).as("dp"))
    // BOTH ranker heaps in ONE corpus pass (two TopKPairs buffers in the
    // same hash aggregate); only the O(queries)-row tops table is
    // materialized for the two explode branches below — the corpus is
    // scored exactly once.
    val tops = Materialize.carried(scored.groupBy(col("query_id"))
      .agg(
        graft.functions.topk_pairs(col("cos"), col("cand_id"), perList)
          .as("tc"),
        graft.functions.topk_pairs(col("dp"), col("cand_id"), perList)
          .as("td")))
    def ranks(listCol: String, rkName: String) = tops
      .select(col("query_id"), posexplode(col(listCol)).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.id").as("cand_id"),
        (col("pos") + 1).cast(LongType).as(rkName))
    val contrib = (rk: Column) =>
      coalesce(round(lit(1000000.0) / (lit(rrfK) + rk)).cast(LongType), lit(0L))
    val fused = ranks("tc", "rk_cos")
      .join(ranks("td", "rk_dot"), Seq("query_id", "cand_id"), "full_outer")
      .select(col("query_id"), col("cand_id"),
        (contrib(col("rk_cos")) + contrib(col("rk_dot"))).as("rrf_micro"))
    fused.groupBy(col("query_id"))
      .agg(graft.functions.topk_pairs(
        col("rrf_micro").cast(DoubleType), col("cand_id"), k).as("t"))
      .select(col("query_id"), posexplode(col("t")).as(Seq("pos", "p")))
      .select(col("query_id"), (col("pos") + 1).cast(LongType).as("rk"),
        col("p.id").as("cand_id"), col("p.score").cast(LongType).as("rrf_micro"))
  }

  /** TRUE hybrid retrieval — the production RAG shape [[rrfFusion]]'s
    * doc anticipates: fuse a DENSE ranking (cosine over the embedding
    * column) with a LEXICAL ranking (count of DISTINCT shared tokens
    * between query and candidate text — the set-overlap core of BM25
    * with the length terms stripped, integer-exact by construction) via
    * truncated reciprocal-rank fusion. A candidate strong in either
    * modality surfaces; one absent from a list contributes 0 from it —
    * including the zero-overlap candidates the lexical join never even
    * materializes.
    *
    * Scale shape: dense lists score the corpus ONCE against broadcast
    * queries into the bounded-heap aggregate; lexical lists are an
    * inverted-index join (corpus tokens × broadcast query tokens —
    * shuffle rows bounded by shared-token pairs, never all pairs); the
    * fusion join and final heap run on O(queries × perList) rows. All
    * ranks tie-break on candidate id, so the oracle replays the whole
    * hybrid bit-for-bit. */
  def hybridRetrieval(corpus: DataFrame, idCol: String, textCol: String,
      vecCol: String, isQuery: Column, perList: Int, k: Int,
      rrfK: Int = 60): DataFrame = {
    val queries = corpus.filter(isQuery).select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), norm(col(vecCol)).as("qn"))
      .filter(col("qn") > 0)
    val cands = corpus.select(col(idCol).as("cand_id"),
      col(vecCol).as("cv"), norm(col(vecCol)).as("cn"))
      .filter(col("cn") > 0)
    val dense = cands.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .groupBy(col("query_id"))
      .agg(graft.functions.topk_pairs(col("cos"), col("cand_id"), perList)
        .as("tl"))
    def toks(df: DataFrame, outId: String) = df
      .select(col(idCol).as(outId),
        explode(array_distinct(TextOps.words(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)
    val lex = toks(corpus, "cand_id")
      .join(broadcast(toks(corpus.filter(isQuery), "query_id")), Seq("w"))
      .filter(col("query_id") =!= col("cand_id"))
      .groupBy(col("query_id"), col("cand_id"))
      .agg(count(lit(1)).as("n_shared"))
      .groupBy(col("query_id"))
      .agg(graft.functions.topk_pairs(
        col("n_shared").cast(DoubleType), col("cand_id"), perList).as("tl"))
    def ranks(lists: DataFrame, rkName: String) = lists
      .select(col("query_id"), posexplode(col("tl")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.id").as("cand_id"),
        (col("pos") + 1).cast(LongType).as(rkName))
    val contrib = (rk: Column) =>
      coalesce(round(lit(1000000.0) / (lit(rrfK) + rk)).cast(LongType), lit(0L))
    ranks(dense, "rk_dense")
      .join(ranks(lex, "rk_lex"), Seq("query_id", "cand_id"), "full_outer")
      .select(col("query_id"), col("cand_id"),
        (contrib(col("rk_dense")) + contrib(col("rk_lex"))).as("rrf_micro"))
      .groupBy(col("query_id"))
      .agg(graft.functions.topk_pairs(
        col("rrf_micro").cast(DoubleType), col("cand_id"), k).as("t"))
      .select(col("query_id"), posexplode(col("t")).as(Seq("pos", "p")))
      .select(col("query_id"), (col("pos") + 1).cast(LongType).as("rk"),
        col("p.id").as("cand_id"), col("p.score").cast(LongType).as("rrf_micro"))
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    * greedily select k results balancing relevance against redundancy —
    * round 1 takes the most relevant candidate, each later round takes
    * argmax of λ·rel − (1−λ)·max-sim-to-already-selected. The diversity
    * stage every RAG retrieval pipeline runs after ANN recall.
    *
    * Determinism recipe: the MMR score is snapped to integer micro-units
    * BEFORE each round's argmax, so selection ties break on (score_micro,
    * cand_id) identically cross-engine — the k-means unrolled-rounds
    * precedent. λ = 0.7 fixed (one shared IEEE expression).
    *
    * Scale shape: relevance recall is the one corpus pass (broadcast
    * queries + bounded TopKPairs heap); everything after — the candidate
    * pairwise-similarity matrix (O(queries·perList²)) and k greedy rounds
    * of join + max-aggregate — runs on CANDIDATE-sized relations that
    * never touch the corpus again (the materialized candidate table is
    * O(queries·perList) rows). Argmax per round is a struct-max
    * aggregate, not a ranking window. */
  def mmrTopK(emb: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, perList: Int, k: Int): DataFrame = {
    require(k >= 1 && perList >= k, "perList must cover k selections")
    val queries = emb.filter(isQuery).select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), norm(col(vecCol)).as("qn"))
      .filter(col("qn") > 0)
    val corpus = emb.select(col(idCol).as("cand_id"),
      col(vecCol).as("cv"), norm(col(vecCol)).as("cn"))
      .filter(col("cn") > 0)
    val rel = corpus.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val cand = rel.groupBy(col("query_id"))
      .agg(graft.functions.topk_pairs(col("cos"), col("cand_id"), perList)
        .as("t"))
      .select(col("query_id"), explode(col("t")).as("p"))
      .select(col("query_id"), col("p.id").as("cand_id"),
        col("p.score").as("rel"))
    // candidates + their vectors, materialized once: the k greedy rounds
    // below never re-touch the corpus
    val wv = Materialize.carried(
      cand.join(corpus, "cand_id")
        .select(col("query_id"), col("cand_id"), col("rel"),
          col("cv"), col("cn")))
    val x = wv.select(col("query_id"), col("cand_id").as("a"),
      col("cv").as("av"), col("cn").as("an"))
    val y = wv.select(col("query_id").as("qy"), col("cand_id").as("b"),
      col("cv").as("bv"), col("cn").as("bn"))
    val sims = Materialize.carried(
      x.join(y, col("query_id") === col("qy") && col("a") =!= col("b"))
        .select(col("query_id"), col("a"), col("b"),
          (dot(col("av"), col("bv")) / (col("an") * col("bn"))).as("sim")))
    def argmaxPick(scored: DataFrame, rk: Int): DataFrame =
      scored.groupBy(col("query_id"))
        .agg(max(struct(col("score_micro").as("s"),
          (-col("cand_id")).as("nc"))).as("m"))
        .select(col("query_id"), lit(rk.toLong).as("rk"),
          (-col("m.nc")).as("cand_id"), col("m.s").as("score_micro"))
    val firstScores = wv.select(col("query_id"), col("cand_id"),
      round(lit(1000000.0) * (lit(0.7) * col("rel"))).cast(LongType)
        .as("score_micro"))
    var sel = argmaxPick(firstScores, 1)
    for (t <- 2 to k) {
      val msim = sims
        .join(sel.select(col("query_id"), col("cand_id").as("b")),
          Seq("query_id", "b"))
        .groupBy(col("query_id"), col("a").as("cand_id"))
        .agg(max(col("sim")).as("msim"))
      val scoredT = wv.join(msim, Seq("query_id", "cand_id"))
        .join(sel.select("query_id", "cand_id"),
          Seq("query_id", "cand_id"), "left_anti")
        .select(col("query_id"), col("cand_id"),
          round(lit(1000000.0) *
            (lit(0.7) * col("rel") - lit(0.3) * col("msim")))
            .cast(LongType).as("score_micro"))
      // Materialize each round's selection: `sel` is referenced twice per
      // round (the msim join and the union), so the un-materialized plan
      // doubles every iteration — O(2^k) subtree copies with every earlier
      // round's argmax re-executed. Checkpointing flattens round t's input
      // to a t-row relation; greedy MMR is inherently sequential in k, so
      // k bounded-size materializations are the intended cost.
      sel = Materialize.carried(sel.union(argmaxPick(scoredT, t)))
    }
    sel
  }

  /** Margin-based candidate mining (the ratio margin of Artetxe &
    * Schwenk 2019, "Margin-based Parallel Corpus Mining with Multilingual
    * Sentence Embeddings"): for each query, the best corpus match scored
    * RELATIVE to the local cosine neighborhood — margin = cos(best) /
    * mean(top-k cos). A raw cosine threshold misfires in dense regions
    * (hubs score high against everything); the margin normalizes by the
    * hub's own neighborhood, the standard alignment-mining gate
    * (bitext mining, semantic near-dup triage, retrieval calibration).
    *
    * Determinism across engines: the top-k extraction is the exact
    * bounded-heap [[rankTopK]] path; the mean is a FIXED-ORDER
    * left-associated sum over the rank-ordered scores (element_at on the
    * best-first array), so the one IEEE sum+divide at the boundary is the
    * same expression tree the oracle writes. Scale: identical to
    * [[bruteForceTopK]] (broadcast queries, map-side heaps) — swap the
    * scorer for an ANN route ([[annTopK]], [[Pq]]) when the corpus side
    * outgrows brute force; the margin algebra is unchanged. */
  def marginTopK(emb: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, k: Int): DataFrame = {
    require(k >= 2, "margin needs at least 2 neighbors")
    val queries = emb.filter(isQuery).select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), norm(col(vecCol)).as("qn"))
      .filter(col("qn") > 0)
    val corpus = emb.select(col(idCol).as("cand_id"),
      col(vecCol).as("cv"), norm(col(vecCol)).as("cn"))
      .filter(col("cn") > 0)
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val tk = scored.groupBy(col("query_id"))
      .agg(graft.functions.topk_pairs(col("cos"), col("cand_id"), k).as("topk"))
    // left-associated fixed-order sum: ((s1 + s2) + ...) + sk
    val meanTopK = (2 to k).foldLeft(element_at(col("topk"), 1).getField("score")) {
      (acc, i) => acc + element_at(col("topk"), i).getField("score")
    } / lit(k.toDouble)
    tk.select(col("query_id"),
        element_at(col("topk"), 1).getField("id").as("best_id"),
        round(element_at(col("topk"), 1).getField("score"), 4).as("cos_r"),
        round(element_at(col("topk"), 1).getField("score") / meanTopK, 4)
          .as("margin_r"))
  }

  /** Deterministic contrastive NEGATIVE sampling: for each query, `m`
    * pseudo-random corpus rows drawn by hashing (query_id, draw index)
    * into a dense 0..n-1 corpus index — the uniform-negatives step of
    * contrastive / embedding training (in-batch negatives' offline twin).
    * Reproducible across engines, partitionings and runs: the draw is
    * 60-bit md5 arithmetic mod corpus size, and the index is
    * [[graft.ops.Sampling.denseIndex]] (range-partitioned global rank —
    * no single-partition window). Each drawn row carries the query–
    * negative cosine, the diagnostic hardness-filtering reads off
    * directly; self-collisions are flagged, not silently dropped, so
    * consumers choose their own policy (and the row count stays exactly
    * queries × m). Scale: draws (queries × m rows) BROADCAST into the
    * indexed corpus — the corpus side never shuffles for the lookup. */
  def negativeSamples(emb: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, m: Int): DataFrame = {
    require(m >= 1, "need at least one negative per query")
    // n falls out of the dense index's driver-side offset table — no
    // separate count() scan; fail fast on an empty corpus (pmod(x, 0)
    // is NULL, which would silently join to zero rows instead)
    val (corpus, n) = graft.ops.Sampling.denseIndexWithCount(
      emb.select(col(idCol), col(vecCol)), Seq(idCol), "idx")
    require(n > 0, "negativeSamples: empty corpus — nothing to draw from")
    // zero-norm query vectors are filtered for consistency with
    // marginTopK (they'd emit NULL cos_r rows, not a meaningful draw)
    val queries = emb.filter(isQuery).select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), norm(col(vecCol)).as("qn"))
      .filter(col("qn") > 0)
    val draws = queries
      .select(col("query_id"), col("qv"), col("qn"),
        explode(sequence(lit(0), lit(m - 1))).as("j"))
      .withColumn("nidx", pmod(
        conv(substring(md5(concat(col("query_id").cast("string"), lit(":"),
          col("j").cast("string"))), 1, 15), 16, 10).cast("long"), lit(n)))
    corpus.join(broadcast(draws), col("idx") === col("nidx"))
      .select(col("query_id"), col("j").cast("long").as("j"),
        col(idCol).as("neg_id"),
        round(dot(col("qv"), col(vecCol)) / (col("qn") * norm(col(vecCol))), 4)
          .as("cos_r"),
        (col(idCol) === col("query_id")).as("is_self"))
  }

  /** Brute-force cosine top-k: for each query vector (filtered by
    * `isQuery`), the k nearest corpus vectors by cosine. The query side is
    * broadcast; ranking is the map-side-bounded heap aggregate. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, k: Int): DataFrame = {
    // norms are computed ONCE per side, not per pair — at n queries x m
    // corpus that is n+m norm evaluations instead of 2nm. Zero-norm
    // vectors are excluded: their cosine is 0/0 = NaN, and Spark sorts
    // NaN above every real value, which would rank a zero vector #1 for
    // every query (and diverge from the oracle's division semantics).
    val queries = emb.filter(isQuery).select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), norm(col(vecCol)).as("qn"))
      .filter(col("qn") > 0)
    val corpus = emb.select(col(idCol).as("cand_id"),
      col(vecCol).as("cv"), norm(col(vecCol)).as("cn"))
      .filter(col("cn") > 0)
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    rankTopK(scored, k)
  }

  /** Deterministic ±1 hyperplane vector for plane `p` over `dim`
    * dimensions: component d (1-based) is +1 iff the low bit of the first
    * md5("p:d") byte is set. md5 is engine-shared, so the DuckDB oracle
    * regenerates the exact planes; every executor computes them from
    * nothing — no broadcast state. Multiplying by ±1 is exact in floating
    * point, so the projection below is a sequential sum of exactly-signed
    * components — bit-identical across engines. */
  private[graft] def planeVector(p: Int, dim: Int): Seq[Float] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    (1 to dim).map { d =>
      digest.reset()
      val b0 = digest.digest(s"$p:$d".getBytes("UTF-8"))(0)
      if ((b0 & 1) == 1) 1.0f else -1.0f
    }
  }

  /** Sign-LSH bucket id: bit b = sign of the projection onto plane b.
    * Projections run through the codegen'd [[dot]] against literal plane
    * vectors (no per-element interpreted HOF on the hot path). */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int): Column =
    (0 until nPlanes).map { p =>
      when(dot(vec, typedLit(planeVector(p, dim))) > 0,
        shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** ANN top-k via sign-LSH with Hamming-1 multi-probing: each query
    * probes its own bucket plus the `nPlanes` buckets one sign-flip away
    * (the standard multi-probe trick — near neighbors that land across a
    * single hyperplane are recovered without building more hash tables).
    * Candidate work grows (nPlanes+1)/2^nPlanes-fold over the corpus,
    * still bucket-local; measured precision vs brute-force top-20 goes
    * from ~0.46 single-probe to ~0.96+ on the test embeddings. Returns
    * the same shape as [[bruteForceTopK]]; recall < 1 by construction. */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, k: Int, nPlanes: Int = 6, dim: Int = 64): DataFrame = {
    val bucketed = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("vn"), lshBucket(col(vecCol), nPlanes, dim).as("bucket"))
      .filter(col("vn") > 0) // zero-norm -> NaN cosine, see bruteForceTopK
    // corpus vectors live in exactly one bucket; only the (small) query
    // side fans out over its probe set, so no candidate pair repeats
    val probes = array(col("bucket") +:
      (0 until nPlanes).map(p => col("bucket").bitwiseXOR(lit(1L << p))): _*)
    val queries = emb.filter(isQuery)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        norm(col(vecCol)).as("qn"), lshBucket(col(vecCol), nPlanes, dim).as("bucket"))
      .filter(col("qn") > 0)
      .withColumn("bucket", explode(probes))
    val scored = bucketed.join(broadcast(queries), Seq("bucket"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("cand_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("vn"))).as("cos"))
    rankTopK(scored, k)
  }

  /** Directed k-NN GRAPH over the whole corpus under sign-LSH blocking:
    * every vector gets its top-`k` cosine neighbors among the vectors
    * sharing its `nPlanes`-bit sign bucket. Unlike [[annTopK]] (small
    * query set broadcast against the corpus), here EVERY vector is a
    * query, so the candidate pairs come from a bucket-keyed EQUI
    * self-join — no broadcast of anything corpus-sized, no all-pairs:
    * candidate count is sum of squared bucket sizes, the standard LSH
    * blocking bound, and a hot bucket splits under AQE like any skewed
    * key. Per-node ranking is the bounded-heap [[rankTopK]] aggregate
    * (map-side combined, at most k pairs per node per task shuffle —
    * never a global sort, never a window over all candidate pairs).
    * Within-bucket edges are exact cosine, so recall vs brute force is
    * exactly LSH bucket recall; the whole construction (hash, pairs,
    * ranks, ties on neighbor id) is deterministic integer/float algebra
    * the oracle replays. The k-NN graph is the substrate for semantic
    * clustering / mutual-NN dedup (pair with the label-propagation and
    * connected-components ops); zero-norm vectors have no cosine and
    * are excluded, as everywhere in this module. */
  def knnGraphLsh(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, nPlanes: Int = 6, dim: Int = 64): DataFrame = {
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
        norm(col(vecCol)).as("vn"), lshBucket(col(vecCol), nPlanes, dim).as("bucket"))
      .filter(col("vn") > 0) // zero-norm -> NaN cosine, see bruteForceTopK
    val left = base.select(col("bucket"), col("id").as("query_id"),
      col("v").as("sv"), col("vn").as("sn"))
    val right = base.select(col("bucket"), col("id").as("cand_id"),
      col("v").as("dv"), col("vn").as("dn"))
    val scored = left.join(right, Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        (dot(col("sv"), col("dv")) / (col("sn") * col("dn"))).as("cos"))
    rankTopK(scored, k)
      .withColumnRenamed("query_id", "src_id")
      .withColumnRenamed("cand_id", "dst_id")
  }

  /** IVF (inverted-file) ANN: partition the corpus into Voronoi cells of
    * `nCells` deterministic seed centroids (every (corpus/nCells)-th
    * vector by id order — data points as centroids, a valid IVF seeding
    * that needs no iterative training job); each vector is assigned to
    * its nearest centroid once; a query probes only the `nProbe` cells
    * nearest to it. Search cost drops nCells/nProbe-fold; recall is
    * pinned against brute force in PipelineSpec.
    *
    * Scale shape: assignment is one broadcast(centroids) pass over the
    * corpus (no shuffle of vectors); the probe join is keyed by cell id,
    * so per-query work is bucket-local, and cells skewed by the data
    * distribution split under AQE like any hot key. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, k: Int, nCells: Int = 16, nProbe: Int = 2): DataFrame = {
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("v"), norm(col(vecCol)).as("vn"))
      .filter(col("vn") > 0) // zero-norm -> NaN cosine, see bruteForceTopK
    // deterministic centroid choice: an id-value stride (no global sort —
    // a rank-based pick would funnel the corpus through one partition).
    // The id < stride*nCells bound caps the set at exactly <= nCells
    // without a nondeterministic limit().
    // The .head() below is an INTENTIONAL O(1) driver action: one
    // map-side-combined max over ids returning a single row, run once at
    // plan-build time to seed the stride. It is not a per-row collect
    // and does not grow with the corpus.
    val maxIdRow = base.agg(max(col("id"))).head()
    if (maxIdRow.isNullAt(0))
      return emb.sparkSession.emptyDataFrame
        .select(lit(0L).as("query_id"), lit(0).as("rk"), lit(0L).as("cand_id"),
          lit(0.0).as("cos_r")).limit(0)
    val maxId = maxIdRow.getLong(0)
    val stride = math.max(1L, (maxId + 1) / nCells)
    val centroids = base
      .filter(col("id") % stride === 0 && col("id") < stride * nCells && col("vn") > 0)
      .select(col("id").as("cell_id"), col("v").as("cv"), col("vn").as("cn"))
    // assign every vector to its nearest centroid (1 broadcast pass).
    // argmax via max_by on a (sim, -cell_id) composite — a hash aggregate
    // with map-side combine, so at most one row per (vector, map task)
    // shuffles; the row_number window formulation re-shuffled all
    // m * nCells scored rows just to pick each vector's best cell.
    val simToCell = (dot(col("v"), col("cv")) / (col("vn") * col("cn"))).as("cell_sim")
    val assigned = base.join(broadcast(centroids), lit(true))
      .select(col("id"), col("v"), col("vn"), col("cell_id"), simToCell)
      .groupBy(col("id"))
      .agg(max_by(struct(col("v"), col("vn"), col("cell_id")),
        struct(col("cell_sim"), (-col("cell_id")).as("neg_cell"))).as("best"))
      .select(col("id"), col("best.v").as("v"), col("best.vn").as("vn"),
        col("best.cell_id").as("cell_id"))
    // queries probe their nProbe nearest cells
    val probes = emb.filter(isQuery)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), norm(col(vecCol)).as("qn"))
      .filter(col("qn") > 0)
      .join(broadcast(centroids), lit(true))
      .select(col("query_id"), col("qv"), col("qn"), col("cell_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cell_sim"))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cell_sim").desc, col("cell_id").asc)))
      .filter(col("crk") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cell_id"))
    val scored = assigned.join(broadcast(probes), Seq("cell_id"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("cand_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("vn"))).as("cos"))
    rankTopK(scored, k)
  }

  /** Symmetric per-vector int8 quantization: `q_i = round(v_i * 127 /
    * max|v|)` (round half away from zero, the SQL `round` rule), clamped
    * to [-127, 127] — the max-magnitude element maps to exactly ±127.
    *
    * The 100 TB lever: int8 codes are 4x smaller than float32 on every
    * wire and cache the search path touches (broadcast of the query
    * side, shuffle of bucketed candidates, executor memory), and the
    * codes dequantize exactly in float arithmetic (|q_i| <= 127, so
    * int8-dot sums stay exact integers well inside double precision —
    * a quantized cosine is bit-deterministic where a float cosine is
    * already). One NARROW typed pass, zero shuffles. Zero vectors get
    * scale 0 and an all-zero code, so downstream cosine paths exclude
    * them with the same zero-norm guard as [[bruteForceTopK]].
    *
    * Output: (id, scale — the multiplier 127/max|v| —, q array<tinyint>). */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col(idCol).cast(LongType).as("id"), col(vecCol).as("v"))
      .as[(Long, Seq[Float])]
      .map { case (id, v) =>
        val vec = Option(v).getOrElse(Seq.empty)
        var maxAbs = 0f
        vec.foreach { x => val a = math.abs(x); if (a > maxAbs) maxAbs = a }
        val scale = if (maxAbs == 0f) 0.0 else 127.0 / maxAbs.toDouble
        val q = vec.map { x =>
          val s = x.toDouble * scale
          // half away from zero == SQL round(); math.round would round
          // -2.5 toward positive infinity and diverge from the oracle
          val r = math.signum(s) * math.floor(math.abs(s) + 0.5)
          math.max(-127.0, math.min(127.0, r)).toByte
        }
        (id, scale, q)
      }.toDF("id", "scale", "q")
  }

  /** Embedding near-duplicate pairs: all (a<b) pairs with cosine >=
    * threshold, restricted to a sampled candidate id set for bounded
    * all-pairs cost; the LSH path above is the unbounded-scale variant. */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      sampleFilter: Column, threshold: Double): DataFrame = {
    val side = emb.filter(sampleFilter).select(col(idCol).as("id"),
      col(vecCol).as("v"), norm(col(vecCol)).as("vn"))
      .filter(col("vn") > 0) // zero-norm -> NaN cosine, see bruteForceTopK
    side.as("a").join(broadcast(side.as("b")), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (dot(col("a.v"), col("b.v")) / (col("a.vn") * col("b.vn"))).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos_r"))
  }

  /** BLOCKED near-duplicate pairs: candidates are generated within a
    * blocking key (e.g. decoded width×height for image features) instead
    * of [[cosineNearDupPairs]]' all-pairs broadcast — the equi-join on
    * the block columns is the candidate generator, so cost is
    * sum-of-squares per block, not corpus². The pair join shuffles only
    * (block, id, vector) rows; at 100 TB the block key is whatever
    * cheap invariant survives the duplication channel (dims for
    * re-encoded images here; an LSH band for free-form embeddings —
    * [[Dedup]]'s MinHash banding is the same pattern one ring earlier).
    * Zero-norm vectors are excluded (NaN cosine), matching
    * cosineNearDupPairs. */
  /** E2LSH-style quantized-projection block key (Datar et al. 2004,
    * "Locality-Sensitive Hashing Scheme Based on p-Stable
    * Distributions"): plane p contributes `floor(dot(v, ±1-plane_p) / w)`
    * and the key is the `:`-joined tuple. Identical vectors ALWAYS
    * collide (the key is a pure function of the vector), near vectors
    * collide unless a projection straddles a quantization boundary, and
    * the key's CARDINALITY GROWS WITH THE DATA — more distinct vectors
    * means more occupied cells, block sizes stay roughly constant.
    *
    * Why not the sign-LSH band ([[lshBucket]])? Sign bits see only the
    * ANGLE. Feature families that are magnitude-spread but angle-
    * concentrated (decoded image stats: every vector is positive with
    * similar shape, pairwise cosine ~0.999+) land almost entirely in ONE
    * sign cell — a constant-cardinality key in disguise. The quantized
    * projection splits by magnitude, which is exactly where such
    * features differ.
    *
    * Exactness contract: with integer-valued components and ±1 planes
    * the projection is an exact integer in double arithmetic, and for a
    * power-of-two `w` the division is exact — the oracle regenerates
    * planes (md5, the [[planeVector]] recipe) and keys bit-for-bit. */
  def e2lshKey(vec: Column, nPlanes: Int, dim: Int, w: Double): Column =
    concat_ws(":", (0 until nPlanes).map { p =>
      floor(dot(vec, typedLit(planeVector(p, dim))) / lit(w))
        .cast(LongType).cast(StringType)
    }: _*)

  /** Near-duplicate pairs blocked on the [[e2lshKey]] — the
    * data-scaling replacement for attribute blocking
    * ([[cosineNearDupPairsBlocked]] on width×height): attribute keys
    * with a handful of dominant values (image resolutions, MIME types)
    * fix the block count forever, making within-block cost
    * O(N²/constant); the LSH cell count grows with the corpus instead,
    * so candidate cost stays Σ|cell|² ∝ N. Exact-raster duplicates are
    * ALWAYS in-block (equal features ⇒ equal key — recall 1 for the
    * re-encode channel); near-but-unequal pairs have the standard LSH
    * boundary-miss probability, tuned by `bucketWidth`/`nPlanes`.
    * Zero-norm vectors are excluded (NaN cosine), matching
    * [[cosineNearDupPairs]]. */
  def cosineNearDupPairsLsh(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nPlanes: Int, dim: Int,
      bucketWidth: Double = 4.0): DataFrame = {
    require(nPlanes >= 1, "need at least one projection plane")
    val side = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("vn", norm(col("v")))
      .filter(col("vn") > 0)
      .withColumn("blk", e2lshKey(col("v"), nPlanes, dim, bucketWidth))
    side.as("a").join(side.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (dot(col("a.v"), col("b.v")) / (col("a.vn") * col("b.vn"))).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos_r"))
  }

  def cosineNearDupPairsBlocked(emb: DataFrame, idCol: String, vecCol: String,
      blockCols: Seq[String], threshold: Double): DataFrame = {
    require(blockCols.nonEmpty, "need at least one blocking column")
    val side = emb.select(
      (blockCols.map(col) :+ col(idCol).as("id") :+ col(vecCol).as("v")): _*)
      .withColumn("vn", norm(col("v")))
      .filter(col("vn") > 0)
    val on = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && col("a.id") < col("b.id")
    side.as("a").join(side.as("b"), on)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (dot(col("a.v"), col("b.v")) / (col("a.vn") * col("b.vn"))).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos_r"))
  }
}
