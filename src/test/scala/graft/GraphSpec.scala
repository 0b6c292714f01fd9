package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

/** Pins for deterministic PageRank: partition invariance (the integer
  * recipe's whole point), hand-checked ranks on a tiny graph, and mass
  * conservation bounds. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank is bit-identical under any input partitioning") {
    val edges = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .join(spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), (col("l_suppkey") + 1000000).as("dst"))
    def run(parts: Int) =
      Graph.pagerankMicro(edges.repartition(parts), iters = 3)
        .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(run(1) == run(16))
  }

  test("hand-checked 3-node chain: a -> b -> c, c dangling") {
    // scale 1000 for hand math: r0 = 333 each; base = 150 div 3 = 50
    // r1(a) = 50; r1(b) = 50 + 85*333 div 100 = 50+283 = 333;
    // r1(c) likewise 333 (from b), dangling c contributes nothing
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r1 = Graph.pagerankMicro(e, iters = 1, scale = 1000L)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(r1 == Seq((1L, 50L), (2L, 333L), (3L, 333L)))
    // total mass never exceeds the scale (floor divisions only lose mass)
    val r3 = Graph.pagerankMicro(e, iters = 3, scale = 1000L)
      .agg(sum("r")).as[Long].head()
    assert(r3 > 0 && r3 <= 1000L)
  }

  test("dangling redistribution: hand-checked 2-node graph conserves total mass") {
    // 1 -> 2; node 2 dangling. scale 1e6: r0 = 500000 each, base = 150000.
    // dm = r0(2) = 500000; per-node dangling share = 250000.
    // r1(1) = 150000 div 2 + 85*(0      + 250000) div 100 = 75000 + 212500 = 287500
    // r1(2) = 75000       + 85*(500000 + 250000) div 100 = 75000 + 637500 = 712500
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val r1 = Graph.pagerankMicro(e, iters = 1, scale = 1000000L,
        redistributeDangling = true)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(r1 == Seq((1L, 287500L), (2L, 712500L)))
    // exact conservation here (all divisions land exactly); deeper rounds
    // stay within floor-div truncation of the full mass
    val total3 = Graph.pagerankMicro(e, iters = 3, scale = 1000000L,
        redistributeDangling = true)
      .agg(sum("r")).as[Long].head()
    assert(total3 > 999900L && total3 <= 1000000L)
    // and still partition-invariant
    def run(parts: Int) =
      Graph.pagerankMicro(e.repartition(parts), iters = 3, scale = 1000000L,
          redistributeDangling = true)
        .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(run(1) == run(8))
  }

  test("convergence stop: early-stopped ranks == fixed-iteration ranks, and it genuinely stops early") {
    // a -> b -> c: customers-of-the-chain stabilize in <= 3 rounds (a is
    // source-only, b one hop later, c two) — the integer fixed point is
    // reached long before maxIters = 15
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val (converged, rounds) = Graph.pagerankMicroConverged(e, maxIters = 15, scale = 1000000L)
    val fixed = Graph.pagerankMicro(e, iters = 15, scale = 1000000L)
    assert(rounds < 15, s"no early stop: ran all $rounds rounds")
    assert(converged.orderBy("node").as[(Long, Long)].collect().toSeq ==
      fixed.orderBy("node").as[(Long, Long)].collect().toSeq,
      "tol=0 early stop diverged from the fixed-iteration ranks")
  }

  test("convergence stop works in dangling-redistribution mode too") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val (converged, rounds) = Graph.pagerankMicroConverged(e, maxIters = 40,
      scale = 1000000L, redistributeDangling = true)
    val fixed = Graph.pagerankMicro(e, iters = 40, scale = 1000000L,
      redistributeDangling = true)
    assert(rounds < 40, s"no early stop: ran all $rounds rounds")
    assert(converged.orderBy("node").as[(Long, Long)].collect().toSeq ==
      fixed.orderBy("node").as[(Long, Long)].collect().toSeq)
  }

  test("triangle census: hand-checked counts; direction/duplicate/self-loop robust; both routes agree") {
    def census(edges: Seq[(Long, Long)], maxBc: Long = 2000000L): (Long, Long, Long, Long) = {
      val r = Graph.triangleCensus(edges.toDF("a", "b"), "a", "b", maxBc).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // K4: 4 nodes, 6 edges, C(4,3)=4 triangles
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    assert(census(k4) === ((4L, 6L, 4L, 4L)))
    // a 4-cycle has 4 edges, no triangles
    assert(census(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))._4 === 0L)
    // reversed duplicates and self-loops normalize away: same K4 census
    val noisy = k4 ++ k4.map(_.swap) ++ Seq((2L, 2L), (0L, 0L))
    assert(census(noisy) === ((4L, 6L, 4L, 4L)))
    // two triangles sharing edge (2,3): 4 nodes, 5 edges; the orientation
    // admits exactly one wedge per triangle (both through the hub edge)
    assert(census(Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L)))
      === ((4L, 5L, 2L, 2L)))
    // broadcast edge-iterator route (default) == wedge-join route
    // (maxBroadcastEdges = 0 forces the fallback) on a denser fixture
    val dense = (for (i <- 0L to 19L; j <- (i + 1) to 19L
      if (i * 31 + j * 17) % 3 != 0) yield (i, j)).toSeq
    assert(census(dense) === census(dense, maxBc = 0L))
  }

  test("bfsHops: hand-checked distances, unreachable nodes absent, early exit, partitioning-invariant") {
    // path 1-2-3-4 plus isolated pair 8-9; undirected = both directions
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (8L, 9L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    def run(parts: Int) =
      Graph.bfsHops(e.repartition(parts), seeds, maxHops = 5)
        .orderBy("node").as[(Long, Int)].collect().toSeq
    // dist: 1->0, 2->1, 3->2, 4->3; 8/9 unreachable and ABSENT
    assert(run(1) == Seq((1L, 0), (2L, 1), (3L, 2), (4L, 3)))
    assert(run(1) == run(16))
    // maxHops truncates: 1 hop reaches only nodes 1 and 2
    assert(Graph.bfsHops(e, seeds, maxHops = 1)
      .orderBy("node").as[(Long, Int)].collect().toSeq == Seq((1L, 0), (2L, 1)))
    // two seed components: distances are per-closest-seed
    val two = Graph.bfsHops(e, Seq(4L, 8L).toDF("node"), maxHops = 2)
      .orderBy("node").as[(Long, Int)].collect().toSeq
    assert(two == Seq((2L, 2), (3L, 1), (4L, 0), (8L, 0), (9L, 1)))
  }

  test("kCoreRounds: pendant chain peels off, the clique survives; fixed point is stable") {
    // K4 on {1,2,3,4} plus a pendant path 4-5-6: 3-core = exactly the K4
    val e = (Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),(4L,5L),(5L,6L)))
      .toDF("lo", "hi")
    val core = Graph.kCoreRounds(e, k = 3, rounds = 4)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(core == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)), core.toString)
    // a fixed point maps to itself: more rounds change nothing
    assert(Graph.kCoreRounds(e, k = 3, rounds = 7)
      .orderBy("node").as[(Long, Long)].collect().toSeq == core)
    // k above the max degree empties the graph
    assert(Graph.kCoreRounds(e, k = 5, rounds = 3).count() == 0L)
  }

  test("labelPropagation: hand-checked communities; self-vote damps the 2-node swap") {
    // triangle {1,2,3} + disjoint pair {4,5}: round 1 all-tie votes fall
    // to the ascending label, round 2 reaches the fixed point
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L)).toDF("src", "dst")
    val got = Graph.labelPropagation(e, rounds = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
    // bipartite pair: synchronous LPA without a self-vote swaps labels
    // forever (1<->2 each round); the self-vote reaches the fixed point
    val pair = Seq((1L, 2L)).toDF("src", "dst")
    val p = Graph.labelPropagation(pair, rounds = 4)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(p === Seq(1L -> 1L, 2L -> 1L))
  }

  test("labelPropagation is partition-invariant and direction/duplicate robust") {
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 3L), (4L, 5L))
      .toDF("src", "dst")
    def run(parts: Int) =
      Graph.labelPropagation(e.repartition(parts), rounds = 3)
        .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(run(1) === run(8))
    assert(run(1) === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
  }
}
