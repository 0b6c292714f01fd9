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
}
