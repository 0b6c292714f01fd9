package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{long_argmin_key, long_sqdist, topk_pairs}

/** Product quantization (PQ) with asymmetric distance computation (ADC)
  * — the billion-scale ANN memory-compression path (Jégou, Douze,
  * Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI
  * 2011): split each d-dim vector into `m` subspaces of d/m dims, train
  * a `ks`-codeword codebook per subspace with Lloyd's, and store every
  * corpus vector as just its m codeword ids. A query then ranks the
  * whole corpus from an m·ks distance TABLE (query-subvector ↔ codeword
  * distances) instead of touching any corpus vector.
  *
  * The 100 TB lever: codes are m small ints per vector (m=8, ks=16 →
  * 8 nibbles) versus d floats (64·4 B) — a 32–64× compression of
  * everything the search path holds, shuffles, or caches; the scan that
  * ranks candidates reads ONLY the code column. Completes the similarity
  * family: brute → sign-LSH → IVF → int8 → PQ.
  *
  * Determinism recipe (the [[Clustering]] ladder, reused wholesale):
  * micro-unit integer vectors, exact integer sqdist, packed
  * (dist·ks + cid) argmin keys for id tie-breaks, round(mean) centroid
  * updates — so a DuckDB oracle replaying the same unrolled per-subspace
  * Lloyd rounds reproduces every code and every ADC distance
  * bit-for-bit.
  *
  * Scale shape per stage:
  *  - sub-vector explode: narrow (m rows per vector, same partition);
  *  - Lloyd assignment: broadcast of the packed per-subspace codebooks
  *    (m rows) + the row-local [[graft.functions.LongVectorArgminKey]]
  *    kernel — the corpus never shuffles for assignment;
  *  - codebook update: shuffles only (sub, cid, dim, partial-sum) —
  *    map-side combined into m·ks·(d/m) groups;
  *  - ADC: the distance table (nq·m·ks rows) broadcasts; the scored
  *    shuffle carries one 24-byte (query, cand, partial-dist) row per
  *    pair — map-side pre-summed because a vector's m code rows are
  *    co-partitioned by construction — and the final top-k is the
  *    bounded-heap aggregate (k rows per query per task).
  */
object Pq {

  /** Pack a (sub, cid, cm) codebook into one row per subspace (sorted
    * cid order) for the broadcast + row-local argmin kernel. */
  private def packCodebook(cb: DataFrame): DataFrame =
    cb.groupBy("sub")
      .agg(sort_array(collect_list(struct(col("cid"), col("cm")))).as("cs"))
      .select(col("sub"),
        transform(col("cs"), s => s.getField("cid")).as("cids"),
        flatten(transform(col("cs"), s => s.getField("cm"))).as("cmat"))

  /** One Lloyd assignment: per-subspace packed codebooks broadcast, the
    * argmin computed row-locally by the codegen kernel (zero corpus
    * shuffle — same plan shape as Clustering.assignStep, keyed by sub).
    * Extra columns on `subv` (e.g. the IVF cell) ride through. */
  private def assign(subv: DataFrame, cb: DataFrame, ks: Int): DataFrame =
    subv.join(broadcast(packCodebook(cb)), Seq("sub"))
      .withColumn("key", long_argmin_key(col("sv"), col("cmat"), col("cids"), ks))
      .withColumn("cid", col("key") % ks)
      .withColumn("dist", expr(s"key div $ks"))
      .drop("key", "cids", "cmat")

  /** Centroid update: exact integer per-dim sums, round(mean) — only
    * (sub, cid, dim, partial) rows shuffle, map-side combined. */
  private def update(a: DataFrame): DataFrame =
    a.select(col("sub"), col("cid"), posexplode(col("sv")).as(Seq("dim", "v")))
      .groupBy(col("sub"), col("cid"), col("dim"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("cm_j",
        round(col("s").cast("double") / col("n").cast("double")).cast("long"))
      .groupBy(col("sub"), col("cid"))
      .agg(transform(sort_array(collect_list(struct(col("dim"), col("cm_j")))),
        s => s.getField("cm_j")).as("cm"))

  /** Train `iters` Lloyd rounds from the id-stride seed codebook and
    * encode `subv`; returns (codes, final codebook). */
  private def trainAndEncode(subv: DataFrame, stride: Long, ks: Int,
      iters: Int): (DataFrame, DataFrame) = {
    var codebook = subv
      .filter(col("id") % stride === 0 && expr(s"id div $stride") < ks)
      .select(col("sub"), expr(s"id div $stride").cast("long").as("cid"),
        col("sv").as("cm"))
    for (_ <- 2 to iters) codebook = update(assign(subv, codebook, ks))
    // materialize the FINAL codebook (ks·m tiny rows): lazily, every
    // consumer (the encode pass AND each query distance table) re-ran
    // the whole Lloyd training chain — full-corpus aggregations per
    // round — to re-derive these 100-odd rows. The r15 negative result
    // (persisting the corpus-sized withCell) is the opposite shape: here
    // the cached bytes are O(ks·m·dim) and the saved work is O(iters ·
    // corpus) per consumer (guide §5: cache when recompute dwarfs the
    // pressure).
    val cbFinal = Materialize.carried(codebook)
    (assign(subv, cbFinal, ks), cbFinal)
  }

  /** Bounded-heap exact top-k over (query_id, id, adist); score = -adist
    * ranks ascending distance with ties to the lower cand_id (adist <
    * 2^53, exact in a double). */
  private def rankAdc(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(topk_pairs(negate(col("adist")).cast("double"), col("id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "p")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rk"),
        col("p.id").as("cand_id"), negate(col("p.score")).cast("long").as("adist"))

  private def emptyResult(emb: DataFrame): DataFrame =
    emb.sparkSession.emptyDataFrame
      .select(lit(0L).as("query_id"), lit(0L).as("rk"), lit(0L).as("cand_id"),
        lit(0L).as("adist")).limit(0)

  /** Train per-subspace codebooks (Lloyd's, `iters` assignment rounds),
    * encode the corpus, and return exact-integer ADC top-k for each
    * query vector: (query_id, rk, cand_id, adist) with adist the
    * micro-unit² approximate squared L2 distance, ranked ascending with
    * ties to the lower cand_id.
    *
    * Seeding matches IVF's: an id-value stride picks ks seed vectors per
    * subspace (the same ids for every subspace), deterministic with no
    * global sort. The one `.head()` is an INTENTIONAL O(1) driver action
    * (a map-side-combined max over ids) run once at plan-build time. */
  def pqTopK(emb: DataFrame, idCol: String, vecCol: String, isQuery: Column,
      k: Int, dim: Int, m: Int = 8, ks: Int = 16, iters: Int = 2): DataFrame = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(ks >= 2 && iters >= 1, "need ks >= 2 and iters >= 1")
    val dsub = dim / m
    val base = emb.select(col(idCol).cast("long").as("id"),
      Clustering.microVec(col(vecCol)).as("xm"), isQuery.as("is_q"))
    // m sub-vector rows per vector; narrow (posexplode keeps them in the
    // producing partition, so later per-id partial aggregation combines
    // map-side)
    val slices = array((0 until m).map(s => slice(col("xm"), s * dsub + 1, dsub)): _*)
    val subv = base
      .select(col("id"), col("is_q"), posexplode(slices).as(Seq("sub", "sv")))
      .select(col("id"), col("is_q"), col("sub").cast("long").as("sub"), col("sv"))

    val maxIdRow = base.agg(max(col("id"))).head()
    if (maxIdRow.isNullAt(0)) return emptyResult(emb)
    val stride = math.max(1L, (maxIdRow.getLong(0) + 1) / ks)
    val (codes, codebook) = trainAndEncode(subv, stride, ks, iters)

    // ADC: per-query distance table over the FINAL codebook (the one the
    // last assignment encoded against); nq·m·ks rows — broadcast side
    val qsub = subv.filter(col("is_q"))
      .select(col("id").as("query_id"), col("sub"), col("sv").as("qsv"))
    val dtab = qsub.join(broadcast(codebook), Seq("sub"))
      .select(col("query_id"), col("sub"), col("cid"),
        long_sqdist(col("qsv"), col("cm")).as("d"))
    // approximate distance = Σ over subspaces of the table entry for the
    // candidate's code; every candidate's m code rows sit in one task →
    // the partial sum collapses them before the (query, cand) shuffle.
    // adist stays exact in a long: m · dsub · (2·maxabs·1e6)² ≤ ~1e15.
    val scored = codes.join(broadcast(dtab), Seq("sub", "cid"))
      .filter(col("query_id") =!= col("id"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("d")).as("adist"))
    rankAdc(scored, k)
  }

  /** IVF-PQ (the FAISS IVFADC shape, minus residual encoding): a coarse
    * quantizer of `nCells` id-stride data-point centroids prunes each
    * query's search to its `nProbe` nearest cells, and PQ-ADC ranks ONLY
    * the candidates in probed cells — the flat scan's nq·N scored
    * shuffle becomes nq·Σ|probed cells| (nProbe/nCells of the corpus in
    * expectation). This is the actual billion-scale search design: PQ
    * compresses what the scan holds (32-64x), IVF bounds what it
    * touches.
    *
    * Scale shape beyond [[pqTopK]]'s: the coarse assignment is one more
    * row-local argmin over a one-row broadcast centroid matrix BEFORE
    * the subspace explode, so every code row carries its cell for free —
    * zero additional corpus exchanges; the probe set (nq·nProbe rows)
    * and distance table broadcast. Same integer determinism ladder, so
    * the DuckDB oracle replays coarse assignment, probing, Lloyd
    * training, and ADC bit-for-bit. */
  private def packCells(cents: DataFrame): DataFrame =
    cents.agg(sort_array(collect_list(struct(col("cell_id"), col("ccm")))).as("cs"))
      .select(transform(col("cs"), s => s.getField("cell_id")).as("cids"),
        flatten(transform(col("cs"), s => s.getField("ccm"))).as("cmat"))

  /** Shared IVF coarse stage: id-stride cell seeds, optionally
    * `coarseIters - 1` full-dim Lloyd update rounds (the residual path
    * NEEDS trained means — residuals to a raw data point have HIGHER
    * variance than the vectors themselves, see [[ivfPqResidualTopK]]),
    * then row-local cell assignment over the one-row broadcast matrix
    * (zero corpus exchanges) and the per-query nProbe probe set.
    * Each training round shuffles only (cell, dim, partial-sum) rows —
    * map-side combined into nCells·dim groups. Returns
    * (final centroids, rows + cell, probe set). */
  private def coarseStage(base: DataFrame, maxId: Long, nCells: Int,
      nProbe: Int, coarseIters: Int = 1): (DataFrame, DataFrame, DataFrame) = {
    // coarse seeds: data points at an id stride, cell ids 0..nCells-1
    val strideC = math.max(1L, (maxId + 1) / nCells)
    var coarse = base
      .filter(col("id") % strideC === 0 && expr(s"id div $strideC") < nCells)
      .select(expr(s"id div $strideC").cast("long").as("cell_id"),
        col("xm").as("ccm"))
    for (_ <- 2 to coarseIters) {
      val assigned = base.crossJoin(broadcast(packCells(coarse)))
        .withColumn("ckey", long_argmin_key(col("xm"), col("cmat"), col("cids"), nCells))
        .select((col("ckey") % nCells).as("cell"), col("xm"))
      coarse = assigned
        .select(col("cell"), posexplode(col("xm")).as(Seq("dim", "v")))
        .groupBy(col("cell"), col("dim"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .withColumn("cm_j",
          round(col("s").cast("double") / col("n").cast("double")).cast("long"))
        .groupBy(col("cell"))
        .agg(transform(sort_array(collect_list(struct(col("dim"), col("cm_j")))),
          s => s.getField("cm_j")).as("ccm"))
        .select(col("cell").as("cell_id"), col("ccm"))
    }
    // materialize the nCells centroid rows: every downstream leg
    // (withCell's packed matrix, the query probe ranking, the residual
    // paths' cell-mean joins) re-ran the coarse TRAINING rounds — full
    // corpus aggregations — to re-derive 16 rows (guide §5; same
    // reasoning as trainAndEncode's codebook, and the inverse of the
    // withCell negative below).
    coarse = Materialize.carried(coarse)
    // row-local coarse assignment over the one-row broadcast matrix —
    // the corpus does not shuffle to learn its cell. Deliberately NOT
    // persisted although 5+ downstream stages re-derive it (Lloyd seed
    // filter, per-round assigns, centroid update, query legs): the
    // relation carries the full micro-unit vectors, so caching it
    // materializes O(corpus·dim) bytes to buy back a scan + one fused
    // codegen argmin per consumer — measured at sf0.1 the cached variant
    // was consistently SLOWER (e.g. sim_ivf_pq_appended 4.03 s → 4.68 s,
    // sim_ivf_pq_indexed 3.21 s → 3.59 s, min-of-2 quiet box), the
    // guide-§5 "cache only when recompute beats the pressure" case.
    val withCell = base.crossJoin(broadcast(packCells(coarse)))
      .withColumn("ckey", long_argmin_key(col("xm"), col("cmat"), col("cids"), nCells))
      .select(col("id"), col("is_q"), col("xm"), (col("ckey") % nCells).as("cell"))

    // queries rank all nCells coarse distances and probe the nProbe
    // nearest (exact integer L2, ties to the lower cell id)
    val qcells = withCell.filter(col("is_q"))
      .select(col("id").as("query_id"), col("xm"))
      .join(broadcast(coarse), lit(true))
      .select(col("query_id"), col("cell_id"),
        long_sqdist(col("xm"), col("ccm")).as("cd"))
      .withColumn("crk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cd").asc, col("cell_id").asc)))
      .filter(col("crk") <= nProbe)
      .select(col("query_id"), col("cell_id").as("cell"))
    // the probe set is nq·nProbe tiny rows consumed by 1-3 broadcast
    // legs, each of which would otherwise re-scan the corpus (the
    // is_q filter sits above the full coarse argmin) — materialize
    (coarse, withCell, Materialize.carried(qcells))
  }

  /** Shared IVF-ADC scoring pipeline for [[ivfPqTopK]] and
    * [[ivfPqRerankTopK]]: coarse stage + subspace PQ + probe-bounded
    * ADC. Returns (base rows with id/is_q/xm, scored (query_id, id,
    * adist)); None on an empty corpus. */
  private def ivfAdcScored(emb: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, dim: Int, m: Int, ks: Int, iters: Int,
      nCells: Int, nProbe: Int): Option[(DataFrame, DataFrame)] = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(ks >= 2 && iters >= 1, "need ks >= 2 and iters >= 1")
    require(nCells >= 2 && nProbe >= 1 && nProbe <= nCells,
      s"need 2 <= nCells and 1 <= nProbe <= nCells, got $nCells/$nProbe")
    val dsub = dim / m
    val base = emb.select(col(idCol).cast("long").as("id"),
      Clustering.microVec(col(vecCol)).as("xm"), isQuery.as("is_q"))
    val maxIdRow = base.agg(max(col("id"))).head()
    if (maxIdRow.isNullAt(0)) return None
    val maxId = maxIdRow.getLong(0)
    val (_, withCell, qcells) = coarseStage(base, maxId, nCells, nProbe)

    // subspace explode CARRIES the cell: narrow, same-partition
    val slices = array((0 until m).map(s => slice(col("xm"), s * dsub + 1, dsub)): _*)
    val subv = withCell
      .select(col("id"), col("is_q"), col("cell"), posexplode(slices).as(Seq("sub", "sv")))
      .select(col("id"), col("is_q"), col("cell"),
        col("sub").cast("long").as("sub"), col("sv"))

    val stride = math.max(1L, (maxId + 1) / ks)
    val (codes, codebook) = trainAndEncode(subv, stride, ks, iters)

    val qsub = subv.filter(col("is_q"))
      .select(col("id").as("query_id"), col("sub"), col("sv").as("qsv"))
    val dtab = qsub.join(broadcast(codebook), Seq("sub"))
      .select(col("query_id"), col("sub"), col("cid"),
        long_sqdist(col("qsv"), col("cm")).as("d"))
    // candidate generation bounded by the probe set: a code row joins
    // only the queries probing its cell (broadcast, nq·nProbe rows),
    // then the ADC lookup keys on (query, sub, codeword)
    val scored = codes.join(broadcast(qcells), Seq("cell"))
      .filter(col("query_id") =!= col("id"))
      .join(broadcast(dtab), Seq("query_id", "sub", "cid"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("d")).as("adist"))
    Some((base, scored))
  }

  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String, isQuery: Column,
      k: Int, dim: Int, m: Int = 8, ks: Int = 16, iters: Int = 2,
      nCells: Int = 16, nProbe: Int = 4): DataFrame =
    ivfAdcScored(emb, idCol, vecCol, isQuery, dim, m, ks, iters, nCells, nProbe) match {
      case None => emptyResult(emb)
      case Some((_, scored)) => rankAdc(scored, k)
    }

  /** IVF-PQ with EXACT RE-RANK refinement — the standard FAISS refine
    * stage (IndexRefineFlat): ADC over compressed codes selects each
    * query's top-R candidates, then an exact full-dimension integer
    * squared-L2 pass over the ORIGINAL vectors re-ranks those R down to
    * the final top-k. R a small multiple of k recovers near-brute-force
    * precision while the exact pass touches only nq·R vectors — the
    * refinement never rescans the corpus.
    *
    * Scale shape: the (query_id, cand_id) candidate set (nq·R rows)
    * BROADCASTS and the corpus streams past it to surrender candidate
    * vectors — zero corpus shuffle; query vectors (nq rows) broadcast
    * into the pair set; the final top-k is the bounded-heap aggregate
    * over nq·R exact distances. `dist` is the exact micro-unit² squared
    * L2 (≤ dim·(2·max|x|·10⁶)² < 2⁵³, exact through the double heap
    * key), so the oracle's refine stage is a plain self-join on the
    * integer vectors — bit-for-bit reproducible. */
  def ivfPqRerankTopK(emb: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, k: Int, dim: Int, m: Int = 8, ks: Int = 16,
      iters: Int = 2, nCells: Int = 16, nProbe: Int = 4,
      rerankR: Int = 20): DataFrame = {
    require(rerankR >= k, s"rerankR=$rerankR must be >= k=$k")
    ivfAdcScored(emb, idCol, vecCol, isQuery, dim, m, ks, iters, nCells, nProbe) match {
      case None => emptyResult(emb)
      case Some((base, scored)) =>
        val cands = rankAdc(scored, rerankR).select(col("query_id"), col("cand_id"))
        val qvec = base.filter(col("is_q"))
          .select(col("id").as("query_id"), col("xm").as("qxm"))
        val exact = base.select(col("id").as("cand_id"), col("xm"))
          .join(broadcast(cands), Seq("cand_id"))
          .join(broadcast(qvec), Seq("query_id"))
          .select(col("query_id"), col("cand_id"),
            long_sqdist(col("qxm"), col("xm")).as("dist"))
        exact.groupBy(col("query_id"))
          .agg(topk_pairs(negate(col("dist")).cast("double"), col("cand_id"), k)
            .as("topk"))
          .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "p")))
          .select(col("query_id"), (col("pos") + 1).cast("long").as("rk"),
            col("p.id").as("cand_id"), negate(col("p.score")).cast("long").as("dist"))
    }
  }

  /** Build and PERSIST an IVF-PQ index — the production serving split
    * [[ivfPqTopK]] deliberately doesn't make: that method retrains
    * coarse centroids and codebooks inside every query, which is right
    * for a self-contained gate but wrong for serving, where the corpus
    * is indexed ONCE and every incremental batch probes it with zero
    * retraining (the [[graft.ops.Dedup.writeBandIndex]] /
    * `incrementalLshDups` shape, for ANN).
    *
    * Persisted layout:
    *  - `table`: one packed row per vector `(id, cell, code)` — the cell
    *    from the coarse quantizer and the m codeword ids as one small
    *    array (the PQ compression actually realized at rest: m bytes-ish
    *    per vector, not d floats) — BUCKETED + sorted by `cell`, so a
    *    probe's literal cell filter prunes whole buckets at the SCAN
    *    (`SelectedBucketsCount` in the plan) and the index never
    *    shuffles;
    *  - `sidecarPath/centroids`: the nCells coarse centroids;
    *  - `sidecarPath/codebook`: the m·ks PQ codebook — both a few KB,
    *    broadcast whole by every probe.
    *
    * Training is the same integer Lloyd recipe as [[ivfPqTopK]]
    * (id-stride seeds, `iters` assignment rounds), so a probe over the
    * persisted index returns bit-identical results to the inline
    * composition — the oracle is shared. The build pays one extra
    * (id, cell) shuffle to pack the m code rows per vector; each
    * vector's rows are co-partitioned by construction, so the pack
    * partial-aggregates map-side to one row per vector first. */
  def writeIvfPqIndex(emb: DataFrame, idCol: String, vecCol: String,
      table: String, buckets: Int, sidecarPath: String, dim: Int,
      path: Option[String] = None, m: Int = 8, ks: Int = 16,
      iters: Int = 2, nCells: Int = 16): Unit = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(ks >= 2 && iters >= 1, "need ks >= 2 and iters >= 1")
    require(nCells >= 2, s"need nCells >= 2, got $nCells")
    val dsub = dim / m
    val base = emb.select(col(idCol).cast("long").as("id"),
      Clustering.microVec(col(vecCol)).as("xm"), lit(false).as("is_q"))
    val maxIdRow = base.agg(max(col("id"))).head()
    require(!maxIdRow.isNullAt(0), "cannot index an empty corpus")
    val maxId = maxIdRow.getLong(0)
    // nProbe is a QUERY-time knob; the build only needs the centroids
    val (coarse, withCell, _) = coarseStage(base, maxId, nCells, nProbe = 1)

    val slices = array((0 until m).map(s => slice(col("xm"), s * dsub + 1, dsub)): _*)
    val subv = withCell
      .select(col("id"), col("cell"), posexplode(slices).as(Seq("sub", "sv")))
      .select(col("id"), col("cell"), col("sub").cast("long").as("sub"), col("sv"))
    val stride = math.max(1L, (maxId + 1) / ks)
    val (codes, codebook) = trainAndEncode(subv, stride, ks, iters)

    // pack m code rows -> one (id, cell, code) row; rows of a vector are
    // co-partitioned (narrow explode), so this combines map-side
    val packed = codes.groupBy(col("id"), col("cell"))
      .agg(transform(sort_array(collect_list(struct(col("sub"), col("cid")))),
        s => s.getField("cid")).as("code"))
    graft.sources.TableIO.replaceBucketed(packed, table, Seq("cell"), buckets, path)
    graft.sources.TableIO.replaceParquet(
      coarse.select(col("cell_id"), col("ccm")), s"$sidecarPath/centroids")
    graft.sources.TableIO.replaceParquet(
      codebook.select(col("sub"), col("cid"), col("cm")), s"$sidecarPath/codebook")
  }

  /** Absorb a NEW batch into a [[writeIvfPqIndex]]-persisted index with
    * ZERO retraining — the maintenance half of the index lifecycle
    * (write builds, this appends, [[ivfPqIndexedTopK]] probes): each new
    * vector is cell-assigned and PQ-encoded ROW-LOCALLY against the
    * broadcast sidecar centroids/codebook — the exact arithmetic the
    * build ran, so the appended codes are bit-identical to what a
    * rebuild WITH THE SAME frozen sidecars would store — packed to one
    * (id, cell, code) row, and appended to the codes table with the
    * SAME bucket spec. Existing index files are never rewritten; probes
    * keep bucket-pruning over old + new rows alike (each bucket gains
    * one file per append; `TableIO.compact` is the antidote when small
    * appended files accumulate). At 100 TB this is the continuous-crawl
    * maintenance pass: daily batches land in one narrow encode pass +
    * one (id, cell) pack shuffle; only codebook DRIFT (a distribution
    * shift that degrades ADC precision) forces a retrain + rebuild.
    * The two sidecar `head()`/`count()` actions are O(nCells)/O(m·ks)
    * reads of few-KB files, run once at plan-build time. */
  def appendIvfPqIndex(newBatch: DataFrame, idCol: String, vecCol: String,
      table: String, buckets: Int, sidecarPath: String, dim: Int,
      m: Int = 8): Unit = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val spark = newBatch.sparkSession
    val dsub = dim / m
    val coarse = graft.sources.TableIO.readParquet(spark, s"$sidecarPath/centroids")
    val codebook = graft.sources.TableIO.readParquet(spark, s"$sidecarPath/codebook")
    // ks/nCells are properties of the persisted sidecars — derived as
    // max(id)+1, NOT count(): a seed excluded at build time leaves a
    // hole in the id range, and a count-based packing base b <= max id
    // makes the argmin key dist*b + id AMBIGUOUS (id = b unpacks as 0 —
    // a wrong-cell assignment that surfaced as a missed candidate).
    // max+1 always exceeds every packed id, so (dist, id) argmin and
    // unpack stay exact whatever holes the sidecar carries.
    val ks = codebook.agg(max(col("cid"))).head().getLong(0).toInt + 1
    val nCells = coarse.agg(max(col("cell_id"))).head().getLong(0).toInt + 1
    val base = newBatch.select(col(idCol).cast("long").as("id"),
      Clustering.microVec(col(vecCol)).as("xm"))
    val withCell = base.crossJoin(broadcast(packCells(
        coarse.select(col("cell_id"), col("ccm")))))
      .withColumn("ckey", long_argmin_key(col("xm"), col("cmat"), col("cids"), nCells))
      .select(col("id"), col("xm"), (col("ckey") % nCells).as("cell"))
    val slices = array((0 until m).map(s => slice(col("xm"), s * dsub + 1, dsub)): _*)
    val subv = withCell
      .select(col("id"), col("cell"), posexplode(slices).as(Seq("sub", "sv")))
      .select(col("id"), col("cell"), col("sub").cast("long").as("sub"), col("sv"))
    val codes = assign(subv, codebook, ks)
    val packed = codes.groupBy(col("id"), col("cell"))
      .agg(transform(sort_array(collect_list(struct(col("sub"), col("cid")))),
        s => s.getField("cid")).as("code"))
    graft.sources.TableIO.appendBucketed(packed, table, Seq("cell"), buckets)
  }

  /** Probe a [[writeIvfPqIndex]]-persisted index with a NEW query batch —
    * zero retraining, zero index-side exchanges: the batch encodes
    * row-locally against the broadcast sidecar centroids/codebook, its
    * bounded probed-cell set (≤ min(nq·nProbe, nCells) values, collected
    * once at plan-build time like the seeding `.head()`s) becomes a
    * LITERAL filter on the bucketed codes scan — so bucket pruning skips
    * the index files no query probes (`SelectedBucketsCount`) — and the
    * ADC join against the (also broadcast) distance tables leaves only
    * the (query, cand, partial-dist) pairs to shuffle into the final
    * bounded-heap top-k. At 100 TB the ever-growing index never crosses
    * the network: each batch reads back a pruned slice of it in place.
    *
    * Returns (query_id, rk, cand_id, adist) exactly as [[ivfPqTopK]];
    * candidates sharing the query's id are excluded, so a corpus member
    * used as a query never matches itself. */
  def ivfPqIndexedTopK(queries: DataFrame, idCol: String, vecCol: String,
      table: String, sidecarPath: String, k: Int, dim: Int, m: Int = 8,
      nProbe: Int = 4): DataFrame = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(nProbe >= 1, s"need nProbe >= 1, got $nProbe")
    val spark = queries.sparkSession
    val dsub = dim / m
    val coarse = graft.sources.TableIO.readParquet(spark, s"$sidecarPath/centroids")
    val codebook = graft.sources.TableIO.readParquet(spark, s"$sidecarPath/codebook")

    val qbase = queries.select(col(idCol).cast("long").as("id"),
      Clustering.microVec(col(vecCol)).as("xm"))
    // nProbe nearest cells per query — same integer ranking as the
    // inline coarse stage; the window runs on the (small) batch side
    val qcells = qbase
      .select(col("id").as("query_id"), col("xm"))
      .join(broadcast(coarse), lit(true))
      .select(col("query_id"), col("cell_id"),
        long_sqdist(col("xm"), col("ccm")).as("cd"))
      .withColumn("crk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cd").asc, col("cell_id").asc)))
      .filter(col("crk") <= nProbe)
      .select(col("query_id"), col("cell_id").as("cell"))

    // the probed-cell set is bounded by nCells (a build-time constant,
    // thousands at most) — collect it ONCE so the codes scan carries a
    // literal predicate bucket pruning can act on
    val probed = qcells.select(col("cell")).distinct().collect().map(_.getLong(0))
    if (probed.isEmpty) return emptyResult(queries)
    val codes = graft.sources.TableIO.readTable(spark, table)
      .filter(col("cell").isin(probed.toIndexedSeq: _*))
      .select(col("id"), col("cell"), posexplode(col("code")).as(Seq("sub", "cid")))
      .select(col("id"), col("cell"), col("sub").cast("long").as("sub"), col("cid"))

    // per-query ADC tables over the persisted codebook — broadcast side
    val qslices = array((0 until m).map(s => slice(col("xm"), s * dsub + 1, dsub)): _*)
    val qsub = qbase
      .select(col("id").as("query_id"), posexplode(qslices).as(Seq("sub", "qsv")))
      .select(col("query_id"), col("sub").cast("long").as("sub"), col("qsv"))
    val dtab = qsub.join(broadcast(codebook), Seq("sub"))
      .select(col("query_id"), col("sub"), col("cid"),
        long_sqdist(col("qsv"), col("cm")).as("d"))
    val scored = codes.join(broadcast(qcells), Seq("cell"))
      .filter(col("query_id") =!= col("id"))
      .join(broadcast(dtab), Seq("query_id", "sub", "cid"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("d")).as("adist"))
    rankAdc(scored, k)
  }

  /** RESIDUAL IVF-PQ — the complete FAISS IVFADC design: PQ codebooks
    * are trained on the residuals `x − centroid(cell(x))` instead of the
    * raw vectors, so the ks codewords per subspace spend their capacity
    * on WITHIN-cell variation rather than re-describing the coarse
    * structure the cell id already captures — the quantization-error
    * reduction that makes the compressed scan accurate at billion scale.
    *
    * Three structural deltas from [[ivfPqTopK]]:
    *  - the coarse quantizer is TRAINED (`coarseIters - 1` full-dim
    *    Lloyd rounds): residuals only shrink when cell centroids are
    *    means — a residual to a raw data-point seed has HIGHER variance
    *    than the vector itself (measured: precision 20/50 vs 28/50 on
    *    the untrained seeds; trained means recover the design's gain);
    *  - the corpus residual is one `zip_with` against the row's own cell
    *    centroid (nCells-row broadcast join, row-local subtraction) —
    *    still zero corpus exchanges before the subspace explode;
    *  - the ADC table becomes per-(query, PROBED cell): a query's
    *    residual differs per probed cell, so the table is nq·nProbe·m·ks
    *    rows — still a broadcast (the nProbe factor is small by design).
    * Same integer determinism ladder (residual components are exact
    * differences of micro-unit integers), so the DuckDB oracle replays
    * coarse training, residuals, Lloyd training on residuals, and the
    * per-cell ADC bit-for-bit. */
  def ivfPqResidualTopK(emb: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, k: Int, dim: Int, m: Int = 8, ks: Int = 16,
      iters: Int = 2, nCells: Int = 16, nProbe: Int = 4,
      coarseIters: Int = 2): DataFrame = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(ks >= 2 && iters >= 1, "need ks >= 2 and iters >= 1")
    require(nCells >= 2 && nProbe >= 1 && nProbe <= nCells,
      s"need 2 <= nCells and 1 <= nProbe <= nCells, got $nCells/$nProbe")
    val dsub = dim / m
    val base = emb.select(col(idCol).cast("long").as("id"),
      Clustering.microVec(col(vecCol)).as("xm"), isQuery.as("is_q"))
    val maxIdRow = base.agg(max(col("id"))).head()
    if (maxIdRow.isNullAt(0)) return emptyResult(emb)
    val maxId = maxIdRow.getLong(0)
    val (coarse, withCell, qcells) =
      coarseStage(base, maxId, nCells, nProbe, coarseIters)

    // residual vs the row's OWN cell centroid: nCells-row broadcast
    // join + row-local element-wise difference — no corpus exchange
    val cellCm = coarse.select(col("cell_id").as("cell"), col("ccm"))
    val resid = withCell.join(broadcast(cellCm), Seq("cell"))
      .select(col("id"), col("is_q"), col("cell"),
        zip_with(col("xm"), col("ccm"), (a, b) => a - b).as("rm"))

    // subspace explode over the residual, carrying the cell
    val slices = array((0 until m).map(s => slice(col("rm"), s * dsub + 1, dsub)): _*)
    val subv = resid
      .select(col("id"), col("is_q"), col("cell"), posexplode(slices).as(Seq("sub", "sv")))
      .select(col("id"), col("is_q"), col("cell"),
        col("sub").cast("long").as("sub"), col("sv"))

    val stride = math.max(1L, (maxId + 1) / ks)
    val (codes, codebook) = trainAndEncode(subv, stride, ks, iters)

    // per-(query, probed cell) residual subvectors: the query re-centers
    // on EACH cell it probes (nq·nProbe rows before the explode)
    val qres = withCell.filter(col("is_q"))
      .select(col("id").as("query_id"), col("xm"))
      .join(broadcast(qcells), Seq("query_id"))
      .join(broadcast(cellCm), Seq("cell"))
      .select(col("query_id"), col("cell"),
        zip_with(col("xm"), col("ccm"), (a, b) => a - b).as("qrm"))
    val qslices = array((0 until m).map(s => slice(col("qrm"), s * dsub + 1, dsub)): _*)
    val qsub = qres
      .select(col("query_id"), col("cell"), posexplode(qslices).as(Seq("sub", "qsv")))
      .select(col("query_id"), col("cell"), col("sub").cast("long").as("sub"), col("qsv"))
    val dtab = qsub.join(broadcast(codebook), Seq("sub"))
      .select(col("query_id"), col("cell"), col("sub"), col("cid"),
        long_sqdist(col("qsv"), col("cm")).as("d"))

    // code rows join the probe set on their cell, then the ADC lookup
    // keys on (query, cell, sub, codeword) — both broadcast
    val scored = codes.join(broadcast(qcells), Seq("cell"))
      .filter(col("query_id") =!= col("id"))
      .join(broadcast(dtab), Seq("query_id", "cell", "sub", "cid"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("d")).as("adist"))
    rankAdc(scored, k)
  }
}
