package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deterministic PageRank over an edge table — the link-centrality score
  * web-scale curation pipelines use as a document/domain quality prior
  * (CommonCrawl-style URL ranking).
  *
  * Same cross-engine determinism ladder as [[Clustering]] and the CC in
  * [[Dedup]]: ranks live in integer units of `scale` (default 1e12 = the
  * whole probability mass), every per-edge contribution is an integer
  * floor division `rank div out_degree`, and the damping update is
  * `base + (85 · Σcontrib) div 100` — all order-free integer sums, so any
  * engine replaying the same unrolled iterations lands on identical
  * ranks, bit for bit. Dangling mass (nodes with no out-edges) has two
  * modes: dropped (default — the classic power-iteration-on-the-link-
  * matrix variant; document scores are used ordinally by quality gates,
  * where the uniform dangling term cancels) or redistributed uniformly
  * (`redistributeDangling = true` — textbook PageRank: per iteration the
  * danglers' total mass is a one-row broadcast aggregate and every node
  * receives `dm div n` before damping, so rank MAGNITUDES are
  * comparable to the standard formulation and total mass is conserved
  * up to floor-division truncation).
  *
  * Scale shape: one `distinct` for the node set, one degree aggregation,
  * then per iteration: edges ⋈ ranks on src (both hash-partitioned on the
  * same key — pre-partition + cache `edges` once to make every round's
  * join exchange-free, as `Dedup.connectedComponents` does), a map-side
  * combining sum by dst, and a left join back to the node set. Node count
  * rides along as a broadcast one-row aggregate — no driver action. */
object Graph {

  /** `materialize = true` persists the loop-invariant relations
    * (edges, node set, degrees) DISK_ONLY — the connectedComponents
    * pattern — so each iteration re-reads cached blocks instead of
    * re-deriving the edge list from its upstream plan
    * ([[Materialize.invariant]]: recoverable from lineage on block loss,
    * no executor-memory pinning — unlike the localCheckpoint this
    * replaced). Worth it when the iteration count is deep or the edge
    * list comes from an expensive join; at few iterations over a cheap
    * scan the materialization costs more than it saves (measured at
    * sf0.1: cold 4.4s lazy vs ~11s materialized, warm equal), so it
    * defaults off. The same guidance applies in `redistributeDangling`
    * mode, whose per-round eager checkpoint (below) bounds PLAN growth
    * but still re-derives the lazy invariants each round's action — deep
    * dangling runs want `materialize = true` for the same reason
    * [[pagerankMicroConverged]] materializes them unconditionally
    * (it, too, is one action per round). */
  def pagerankMicro(edges: DataFrame, iters: Int,
      scale: Long = 1000000000000L, materialize: Boolean = false,
      redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 1, "need iters >= 1")
    def mat(df: DataFrame): DataFrame = if (materialize) Materialize.invariant(df) else df
    val e = mat(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")))
    val nodes = mat(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())
    val nn = nodes.agg(count(lit(1)).as("n_nodes"))
    val deg = mat(e.groupBy(col("src")).agg(count(lit(1)).as("d")))
    val baseMass = scale * 15 / 100
    var ranks = nodes.crossJoin(broadcast(nn))
      .select(col("node"), expr(s"$scale div n_nodes").as("r"))
    for (_ <- 1 to iters) {
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .join(deg, "src")
        .select(col("dst"), expr("r div d").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      val joined = nodes.crossJoin(broadcast(nn))
        .join(contribs, nodes("node") === contribs("dst"), "left")
      ranks =
        if (!redistributeDangling)
          joined.select(col("node"),
            expr(s"($baseMass div n_nodes) + (85 * coalesce(s, 0L)) div 100").as("r"))
        else {
          // danglers' total mass: one-row aggregate, broadcast — no
          // driver action, same shape as the node count
          val dang = ranks.join(deg, ranks("node") === deg("src"), "left_anti")
            .agg(coalesce(sum(col("r")), lit(0L)).as("dm"))
          joined.crossJoin(broadcast(dang))
            .select(col("node"),
              expr(s"($baseMass div n_nodes) + " +
                "(85 * (coalesce(s, 0L) + (dm div n_nodes))) div 100").as("r"))
            // this mode reads `ranks` TWICE per round (contribs + dang),
            // so a lazy plan embeds the previous round's whole lineage
            // twice — 2^iters growth (measured: 366 plan exchanges at 5
            // rounds vs 94 for the drop-mass mode). The eager per-round
            // reliable checkpoint (the connectedComponents pattern: one
            // action per round) keeps the plan constant-size AND survives
            // executor loss (Materialize.carried); same integers.
            .transform(Materialize.carried)
        }
    }
    ranks
  }

  /** PERSONALIZED PageRank in exact integer micro-units: the teleport
    * mass lands only on `sources` (uniformly over |S|) instead of on
    * every node — rank becomes "importance AS SEEN FROM S", the
    * recommendation / local-relevance variant (seed users, seed
    * domains, a query's click set). Same integer recipe as
    * [[pagerankMicro]] (floor-div micro-units, drop-dangling-mass
    * mode), so the unrolled-round SQL oracle replays every division.
    * Non-source nodes start at 0 and receive only propagated mass;
    * source membership rides a broadcast-joined flag, never a
    * corpus-sized collect. */
  def pagerankPersonalizedMicro(edges: DataFrame, sources: DataFrame,
      iters: Int, scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "need iters >= 1")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val s = broadcast(sources.select(col(sources.columns.head)
      .cast("long").as("node")).distinct())
    val flagged = nodes.join(s.withColumn("__in_s", lit(1L)), Seq("node"), "left")
      .select(col("node"), coalesce(col("__in_s"), lit(0L)).as("in_s"))
    val sn = s.agg(count(lit(1)).as("sn"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val baseMass = scale * 15 / 100
    var ranks = flagged.crossJoin(broadcast(sn))
      .select(col("node"), expr(s"case when in_s = 1 then $scale div sn else 0L end").as("r"),
        col("in_s"))
    for (_ <- 1 to iters) {
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .join(deg, "src")
        .select(col("dst"), expr("r div d").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = flagged.crossJoin(broadcast(sn))
        .join(contribs, flagged("node") === contribs("dst"), "left")
        .select(flagged("node"),
          expr(s"(case when in_s = 1 then $baseMass div sn else 0L end) + " +
            "(85 * coalesce(s, 0L)) div 100").as("r"),
          col("in_s"))
    }
    ranks.select(col("node"), col("r"))
  }

  /** [[pagerankMicro]] with an early CONVERGENCE stop: runs at most
    * `maxIters` rounds but stops once Σ|r_t − r_{t−1}| ≤ `tolScaled`
    * — the deep-iteration mode, where a fixed count either wastes rounds
    * after stabilization or stops short of it. The convergence scalar
    * uses the observe-on-checkpoint pattern of [[Dedup.connectedComponents]]:
    * the delta sum rides the SAME action that materializes the round's
    * ranks (one job per round, no separate scalar pass, no driver
    * collect of the rank vector).
    *
    * With `tolScaled = 0` the stop fires only at an EXACT integer fixed
    * point, so the result is bit-identical to running all `maxIters`
    * rounds (a fixed point maps to itself under the deterministic
    * integer update) — early stopping is pure savings, never an
    * approximation; that is what lets the driver gate q_pagerank_converged
    * against the fixed-count unrolled oracle. Positive tolerances trade
    * exactness for rounds and leave the fixed-count equivalence behind.
    *
    * Loop-invariant relations (edges, node set, degrees) are persisted
    * DISK_ONLY once ([[Materialize.invariant]]): unlike
    * [[pagerankMicro]]'s lazy default, the convergence mode is already
    * one action per round, so each round re-reads cached blocks instead
    * of re-deriving the edge list.
    * Returns (ranks, roundsRun). */
  def pagerankMicroConverged(edges: DataFrame, maxIters: Int,
      scale: Long = 1000000000000L,
      redistributeDangling: Boolean = false,
      tolScaled: Long = 0L): (DataFrame, Int) = {
    require(maxIters >= 1, "need maxIters >= 1")
    require(tolScaled >= 0L, "need tolScaled >= 0")
    val e = Materialize.invariant(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")))
    val nodes = Materialize.invariant(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())
    val nn = nodes.agg(count(lit(1)).as("n_nodes"))
    val deg = Materialize.invariant(
      e.groupBy(col("src")).agg(count(lit(1)).as("d")))
    val baseMass = scale * 15 / 100
    var ranks = Materialize.carried(nodes.crossJoin(broadcast(nn))
      .select(col("node"), expr(s"$scale div n_nodes").as("r")))
    var rounds = 0
    var done = false
    while (!done && rounds < maxIters) {
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .join(deg, "src")
        .select(col("dst"), expr("r div d").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      // previous rank joins back on the node id purely to feed the
      // observed delta — same key as the contribution join, so it reuses
      // the round's partitioning rather than adding an exchange
      val joined = nodes.crossJoin(broadcast(nn))
        .join(contribs, nodes("node") === contribs("dst"), "left")
        .join(ranks.select(col("node").as("pnode"), col("r").as("r_prev")),
          nodes("node") === col("pnode"))
      val updated =
        if (!redistributeDangling)
          joined.select(col("node"),
            expr(s"($baseMass div n_nodes) + (85 * coalesce(s, 0L)) div 100").as("r"),
            col("r_prev"))
        else {
          val dang = ranks.join(deg, ranks("node") === deg("src"), "left_anti")
            .agg(coalesce(sum(col("r")), lit(0L)).as("dm"))
          joined.crossJoin(broadcast(dang))
            .select(col("node"),
              expr(s"($baseMass div n_nodes) + " +
                "(85 * (coalesce(s, 0L) + (dm div n_nodes))) div 100").as("r"),
              col("r_prev"))
        }
      // fresh single-shot Observation per round (see connectedComponents)
      val obs = org.apache.spark.sql.Observation(s"pr_round_$rounds")
      val next = Materialize.carried(updated
        .observe(obs, coalesce(sum(abs(col("r") - col("r_prev"))), lit(0L)).as("delta"))
        .select(col("node"), col("r")))
      val delta = obs.get("delta").asInstanceOf[Long]
      ranks = next
      rounds += 1
      done = delta <= tolScaled
    }
    (ranks, rounds)
  }

  /** EXACT triangle census via degree-ordered orientation — the
    * distributed-triangles recipe of Suri & Vassilvitskii 2011
    * ("Counting Triangles and the Curse of the Last Reducer"): orient
    * every undirected edge from its LOWER-(degree, id)-rank endpoint to
    * the higher, enumerate oriented 2-paths a→b→c, and close them
    * against the oriented edge a→c. The orientation is what makes this
    * scale: every vertex's out-degree is O(√m) on any graph (a node of
    * degree d only keeps out-edges to ≥-rank nodes, of which there are
    * ≤ 2m/d), so the wedge join — the cost center — is Σ out-deg² ≤
    * O(m^1.5) instead of the unoriented Σ deg² that dies on hub nodes
    * ("the curse of the last reducer" is exactly a hub's reducer).
    * Plain joins + one aggregate: three shuffles total, each on an edge
    * endpoint key; no iteration, no driver state.
    *
    * Input: an edge table, any direction, self-loops/duplicates
    * tolerated (normalized away). Output: one row
    * (n_nodes, n_edges, n_wedges, n_triangles). */
  def triangleCensus(edges: DataFrame, aCol: String, bCol: String,
      maxBroadcastEdges: Long = maxBroadcastAdjacencyEdges): DataFrame = {
    // normalized edge list and the oriented list are each consumed by
    // several downstream jobs — eager reliable checkpoints (the
    // ContextCleaner-released Materialize.carried, not a never-dropped
    // persist), so consumers re-read blocks instead of re-running the
    // distinct/orientation
    val und = Materialize.carried(edges
      .select(least(col(aCol), col(bCol)).as("lo"),
        greatest(col(aCol), col(bCol)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct())
    val deg = und.select(col("lo").as("node"))
      .unionAll(und.select(col("hi").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("node").as("lo"), col("d").as("dlo")), "lo")
      .join(deg.select(col("node").as("hi"), col("d").as("dhi")), "hi")
    // orient from lower (degree, id) rank to higher
    val oriented = withDeg.select(
      when(col("dlo") < col("dhi") ||
        (col("dlo") === col("dhi") && col("lo") < col("hi")), col("lo"))
        .otherwise(col("hi")).as("src"),
      when(col("dlo") < col("dhi") ||
        (col("dlo") === col("dhi") && col("lo") < col("hi")), col("hi"))
        .otherwise(col("lo")).as("dst"))
    val ed = Materialize.carried(oriented)
    val nEdges = ed.count()
    val triangles =
      if (nEdges <= maxBroadcastEdges) {
        // EDGE-ITERATOR fast path (the bounded-broadcast/distributed-
        // fallback house pattern): the oriented adjacency map totals
        // exactly m entries, so under the cap it BROADCASTS and each
        // edge (s, t) counts |N⁺(s) ∩ N⁺(t)| row-locally with a sorted-
        // array intersect — every triangle a→b→c, a→c is counted exactly
        // once, at its base edge (a, b) with apex c; ZERO shuffle beyond
        // the adjacency build. Above the cap: the wedge-join route below
        // (same answer — GraphSpec pins route equality).
        val adj = ed.groupBy(col("src"))
          .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
        val emptyArr = array().cast(adj.schema("nbrs").dataType.catalogString)
        ed
          .join(broadcast(adj.select(col("src"), col("nbrs").as("nbrs_s"))),
            Seq("src"), "left")
          .join(broadcast(adj.select(col("src").as("dst"), col("nbrs").as("nbrs_t"))),
            Seq("dst"), "left")
          .select(size(array_intersect(
            coalesce(col("nbrs_s"), emptyArr),
            coalesce(col("nbrs_t"), emptyArr)))
            .cast(org.apache.spark.sql.types.LongType).as("t"))
          .agg(sum(col("t")).as("n_triangles"))
      } else {
        // wedge-join route: the middle vertex is never consulted again —
        // dropping it slims the wedge shuffle (the cost center) to
        // 16-byte (a, c) pairs; the closure probe is a join against the
        // (unique) oriented edges
        val wedges = ed.as("e1").join(ed.as("e2"), col("e1.dst") === col("e2.src"))
          .select(col("e1.src").as("a"), col("e2.dst").as("c"))
        wedges.join(
            ed.select(col("src").as("a"), col("dst").as("c")), Seq("a", "c"))
          .agg(count(lit(1)).as("n_triangles"))
      }
    // wedge count from the oriented degree algebra — Σ_b in⁺(b)·out⁺(b)
    // equals the e1.dst = e2.src join cardinality, no wedge
    // materialization on either route
    val outDeg = ed.groupBy(col("src").as("node")).agg(count(lit(1)).as("od"))
    val inDeg = ed.groupBy(col("dst").as("node")).agg(count(lit(1)).as("id"))
    val nWedges = outDeg.join(inDeg, "node")
      .agg(coalesce(sum(col("od") * col("id")), lit(0L)).as("n_wedges"))
    val spark = edges.sparkSession
    import spark.implicits._
    deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(Seq(nEdges).toDF("n_edges"))
      .crossJoin(nWedges)
      .crossJoin(triangles
        .select(coalesce(col("n_triangles"), lit(0L)).as("n_triangles")))
  }

  /** Edge cap under which [[triangleCensus]] broadcasts the oriented
    * adjacency map (m entries total): 2M longs ≈ 30-40 MB serialized —
    * comfortably broadcastable; beyond it the wedge-join route runs. */
  val maxBroadcastAdjacencyEdges: Long = 2000000L

  /** Multi-source BFS hop distances via DELTA-FRONTIER propagation — the
    * Pregel recipe: per round only the nodes FIRST REACHED last round
    * join the edge list, so total join work across the whole run is
    * O(Σ frontier sizes) = O(V + E), not O(rounds · E) as the naive
    * full-relation "min over (prev ∪ neighbors+1)" relaxation would be.
    * With unit edge weights a node's first-reached round IS its
    * shortest-path distance, so the delta algebra lands on exactly the
    * relation the full relaxation (and the unrolled SQL oracle) computes.
    *
    * Per round: one hash join frontier⋈edges (both keyed on the node
    * id), a distinct, an anti-join against the settled set. Settled set
    * and frontier are eagerly checkpointed ([[Materialize.carried]]) so
    * the plan stays constant-size across rounds and the empty-frontier
    * early exit counts already-materialized blocks instead of
    * recomputing. `seeds` needs a `node` column; `edges` needs
    * `src`/`dst` (pass both directions for an undirected graph).
    * Returns (node, hops) for every node within `maxHops` of a seed —
    * unreached nodes are absent, the distance-k neighborhood contract. */
  /** k-CORE peeling, `rounds` synchronized iterations: repeatedly drop
    * nodes whose degree in the SURVIVING subgraph is < k (Matula &
    * Beck's algorithm, the bulk-synchronous variant) — the graph-quality
    * prior that separates a densely-linked core from stragglers (spam
    * rings and boilerplate sites peel off link graphs in early rounds).
    * Determinism contract (the pagerankMicroConverged shape): a fixed
    * round count, and a fixed point maps to itself under the peel — so
    * an engine replaying the same unrolled rounds matches whether or
    * not the peel has converged, and convergence-before-R is pure
    * savings. Per round: one degree aggregation + two semi-joins, all
    * keyed on edge endpoints; edges eagerly checkpointed
    * ([[Materialize.carried]]) so plans stay constant-size.
    * Input: undirected edge list as (lo, hi) normalized pairs.
    * Returns (node, degree) of the surviving subgraph. */
  def kCoreRounds(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, "need k >= 1 and rounds >= 1")
    var e = Materialize.carried(edges
      .select(least(col("lo"), col("hi")).as("lo"),
        greatest(col("lo"), col("hi")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct())
    for (_ <- 1 to rounds) {
      val deg = e.select(col("lo").as("node"))
        .unionAll(e.select(col("hi").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("d"))
      // Peel via ANTI-join against the DROPPED set, not semi-join against
      // the kept set: every endpoint has a degree row (deg is derived from
      // e itself), so lo∈keep ∧ hi∈keep ⟺ lo∉drop ∧ hi∉drop — identical
      // edge set. The dropped set is the small side of a converging peel
      // (here 326 of 20k nodes across all four rounds at sf0.1), so AQE's
      // runtime size check broadcasts it and the surviving edge relation
      // is never shuffled by the join — with the semi formulation the
      // broadcast side is the near-complete keep set, which GROWS with the
      // graph and forces a sort-merge join at scale (guide §2.4/§3.1).
      val drop = deg.filter(col("d") < k).select(col("node"))
      e = Materialize.carried(e
        .join(drop.select(col("node").as("lo")), Seq("lo"), "left_anti")
        .join(drop.select(col("node").as("hi")), Seq("hi"), "left_anti"))
    }
    e.select(col("lo").as("node"))
      .unionAll(e.select(col("hi").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
  }

  /** Deterministic LABEL PROPAGATION community detection (Raghavan et
    * al. 2007), synchronous with two determinism repairs that keep the
    * DuckDB oracle able to replay every round bit-for-bit:
    *
    *  - ties in the neighbor-label vote break (count desc, label asc) —
    *    the random tie-break of the original is the one thing that makes
    *    vanilla LPA non-reproducible;
    *  - each node also votes for its OWN current label (weight 1). This
    *    both damps the synchronous two-coloring oscillation LPA exhibits
    *    on bipartite structure and removes the "no neighbors" special
    *    case (isolated nodes keep their label).
    *
    * Fixed `rounds` (the kmeans/PageRank fixed-iteration precedent:
    * ROUNDS is part of the operator's contract, so both engines run the
    * same computation). Labels start as node ids; each round is one
    * shuffle-join (edges × labels, both on node keys) + one
    * (node, label) count + a struct-min argmax — no windows. Per-round
    * [[Materialize.carried]] truncates the loop lineage.
    *
    * `edges` needs (src, dst); the graph is symmetrized + de-duplicated
    * here. Returns (node, label) after `rounds` rounds. */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "need rounds >= 1")
    val base = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val e = Materialize.invariant(base
      .unionAll(base.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct())
    var labels = Materialize.carried(
      e.select(col("src").as("node")).distinct()
        .withColumn("lbl", col("node")))
    for (_ <- 1 to rounds) {
      val votes = e.join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), col("lbl"))
        .unionAll(labels)
      labels = Materialize.carried(
        votes.groupBy(col("node"), col("lbl"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("node"))
          .agg(min(struct((-col("c")).as("nc"), col("lbl"))).as("b"))
          .select(col("node"), col("b").getField("lbl").as("lbl")))
    }
    e.unpersist(false)
    labels
  }

  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, "need maxHops >= 0")
    val e = Materialize.invariant(edges
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct())
    var settled = Materialize.carried(
      seeds.select(col("node").cast("long").as("node")).distinct()
        .withColumn("hops", lit(0)))
    var frontier = settled.select(col("node"))
    var round = 0
    var hopCaches = List.empty[DataFrame]
    while (round < maxHops && frontier.count() > 0) {
      round += 1
      val nextPlan = frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(settled, Seq("node"), "left_anti")
        .withColumn("hops", lit(round))
      // Lineage policy (r14 re-profile — the r13 shape reliably
      // checkpointed BOTH next and the settled union every hop, 5 jobs/
      // hop, 2x the query's floor at 3 hops): a hop's frontier persists
      // cheaply (the loop-top count materializes it; recompute-on-loss
      // walks back through persisted hops only), with a RELIABLE
      // checkpoint every 8th hop to bound the recompute chain an
      // executor loss can trigger on deep traversals. settled itself is
      // a UNION of those persisted/checkpointed legs — one scan per
      // hop, never a recomputation chain — so it needs no truncation.
      val next =
        if (round % 8 == 0) Materialize.carried(nextPlan)
        else {
          val p = nextPlan.persist(StorageLevel.MEMORY_AND_DISK)
          hopCaches ::= p
          p
        }
      settled = settled.unionByName(next)
      frontier = next.select(col("node"))
    }
    e.unpersist(false)
    // the per-hop caches must not outlive the traversal (one lingering
    // block-manager entry per hop across a long session): materialize
    // the result union ONCE — each hop cache is read back, never
    // recomputed — then release them, returning the single cached
    // result in their place
    if (hopCaches.isEmpty) settled
    else {
      val out = settled.persist(StorageLevel.MEMORY_AND_DISK)
      out.count()
      hopCaches.foreach(_.unpersist(false))
      out
    }
  }
}
