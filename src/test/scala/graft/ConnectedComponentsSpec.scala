package graft

import graft.ops.Dedup

/** Connected-components label propagation: exact component recovery on a
  * known graph, including chains longer than one hop. */
class ConnectedComponentsSpec extends SparkSpec {

  test("labels every vertex with its component's minimum id") {
    val s = spark
    import s.implicits._
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle+tail)
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (21L, 20L), (22L, 21L), (20L, 22L)
    ).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("a long chain converges (propagation crosses many hops)") {
    val s = spark
    import s.implicits._
    val n = 12 // diameter 12 chain: needs several propagation rounds
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges, "id_a", "id_b", maxIter = 30)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n && got.values.forall(_ == 1L))
  }

  test("large-star/small-star labels the known graph identically") {
    val s = spark
    import s.implicits._
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (21L, 20L), (22L, 21L), (20L, 22L)
    ).toDF("id_a", "id_b")
    val got = Dedup.connectedComponentsStar(edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("star alternation handles a diameter-200 chain in few rounds (min-label would need 200)") {
    val s = spark
    import s.implicits._
    val n = 200
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    // maxIter = 12 full rounds: far below the chain's diameter — only the
    // O(log^2) contraction can converge within it
    val got = Dedup.connectedComponentsStar(edges, "id_a", "id_b",
      maxIter = 12, smallGraphCap = 0L) // force the distributed path
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n && got.values.forall(_ == 1L),
      s"bad labels: ${got.filter(_._2 != 1L).take(5)}")
  }

  test("exhausted maxIter still emits exactly one label per vertex (normalized, warned)") {
    val s = spark
    import s.implicits._
    val n = 200
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    // maxIter=2 cannot converge a diameter-200 chain: the mid-contraction
    // edge list has multi-parent vertices — the one-label contract must
    // hold anyway (min-normalized), even if components remain split
    val got = Dedup.connectedComponentsStar(edges, "id_a", "id_b",
      maxIter = 2, smallGraphCap = 0L) // force the distributed path
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._1).distinct.length == got.length,
      "a vertex emitted more than one cluster_id")
    assert(got.length == n)
    // labels are still a valid refinement: every label <= its vertex id
    assert(got.forall { case (id, c) => c <= id })
  }

  test("star alternation equals min-label on a seeded random graph") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // 120 vertices, sparse random edges -> several nontrivial components
    val edges = (1 to 90).map { _ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)
    }.filter { case (a, b) => a != b }.toDF("id_a", "id_b")
    val minLabel = Dedup.connectedComponents(edges, "id_a", "id_b", maxIter = 40)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = Dedup.connectedComponentsStar(edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == minLabel)
    // the fast-path (driver union-find) and forced-distributed answers
    // agree with each other and with min-label
    val starDist = Dedup.connectedComponentsStar(edges, "id_a", "id_b",
        smallGraphCap = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(starDist == minLabel)
  }
}
