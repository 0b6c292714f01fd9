package graft

import org.apache.spark.sql.functions._

import graft.ops.Stats

/** Exactness and determinism contracts of the integer-lane moments
  * operator — the properties that let q_stats_moments sit behind a
  * cross-engine hash gate. */
class StatsSpec extends SparkSpec {

  private def fixture(parts: Int) = {
    val s = spark
    import s.implicits._
    (1 to 5000).map { i =>
      val g = "g" + (i % 3)
      // money-shaped doubles with 2 decimal places, mixed magnitudes
      (g, (i % 97) + (i % 100) / 100.0, ((i * 37) % 9973) + (i % 10) / 10.0)
    }.toDF("g", "x", "y").repartition(parts)
  }

  test("moments equal exact BigDecimal power sums") {
    val df = fixture(4)
    val got = Stats.moments(df, Seq("g"), "x", "y", scale = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val rows = df.collect().map(r => (r.getString(0),
      BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP),
      BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    for (g <- rows.map(_._1).distinct) {
      val xs = rows.filter(_._1 == g)
      val n = xs.size.toLong
      val r = got(g)
      assert(r.getLong(1) == n)
      assert(r.getDouble(2) == xs.map(_._2).sum.toDouble, s"sx $g")
      assert(r.getDouble(3) == xs.map(_._3).sum.toDouble, s"sy $g")
      assert(r.getDouble(4) == xs.map(t => t._2 * t._2).sum.toDouble, s"sxx $g")
      assert(r.getDouble(5) == xs.map(t => t._3 * t._3).sum.toDouble, s"syy $g")
      assert(r.getDouble(6) == xs.map(t => t._2 * t._3).sum.toDouble, s"sxy $g")
    }
  }

  test("moments are bit-identical across partitionings (float sums are not)") {
    def bits(parts: Int): Seq[Seq[Long]] =
      Stats.moments(fixture(parts), Seq("g"), "x", "y", scale = 2)
        .orderBy("g").collect().toSeq.map(r =>
          (2 to 6).map(i => java.lang.Double.doubleToLongBits(r.getDouble(i))))
    assert(bits(1) == bits(7) && bits(7) == bits(32))
  }

  test("moments are exact for negative products (floor hi + pmod lo lanes)") {
    // x and y of opposite sign make every per-row product negative — the
    // case a truncated `%` lane would mis-decompose by one Lane per row.
    val s = spark
    import s.implicits._
    val df = (1 to 4000).map { i =>
      val sign = if (i % 2 == 0) 1 else -1
      ("g" + (i % 2),
        sign * ((i % 89) + (i % 100) / 100.0),
        -sign * (((i * 53) % 7919) + (i % 10) / 10.0))
    }.toDF("g", "x", "y").repartition(8)
    val got = Stats.moments(df, Seq("g"), "x", "y", scale = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val rows = df.collect().map(r => (r.getString(0),
      BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP),
      BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    for (g <- rows.map(_._1).distinct) {
      val xs = rows.filter(_._1 == g)
      val r = got(g)
      assert(r.getDouble(5) == xs.map(t => t._3 * t._3).sum.toDouble, s"syy $g")
      assert(r.getDouble(6) == xs.map(t => t._2 * t._3).sum.toDouble, s"sxy $g")
    }
    // and still partition-invariant with negatives in play
    def bits(parts: Int) = Stats.moments(df.repartition(parts), Seq("g"), "x", "y", 2)
      .orderBy("g").collect().toSeq.map(r =>
        (2 to 6).map(i => java.lang.Double.doubleToLongBits(r.getDouble(i))))
    assert(bits(1) == bits(13))
  }

  test("derived stddev/corr match the built-ins to float tolerance") {
    val df = fixture(4)
    val m = Stats.moments(df, Seq("g"), "x", "y", scale = 2)
      .select(col("g"),
        Stats.stddevFromMoments(col("n"), col("sx"), col("sxx")).as("sd"),
        Stats.corrFromMoments(col("n"), col("sx"), col("sy"),
          col("sxx"), col("syy"), col("sxy")).as("r"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val ref = df.groupBy("g")
      .agg(stddev_pop(col("x")).as("sd"), corr(col("x"), col("y")).as("r"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for ((g, (sd, r)) <- m) {
      assert(math.abs(sd - ref(g)._1) < 1e-9, s"stddev $g")
      assert(math.abs(r - ref(g)._2) < 1e-9, s"corr $g")
    }
  }

  test("pcaPowerTop: axis-aligned corpus recovers the axis exactly; partitioning/row-order invariant") {
    import spark.implicits._
    // variance lives ONLY in dim 1 (dims 2-4 constant) -> PC1 = e1:
    // C has a single nonzero entry, so every round keeps v = (big, 0, 0, 0)
    val rows = (1 to 40).map(i => Seq(i.toFloat, 2.0f, -1.0f, 0.5f))
    val df = rows.toDF("embedding")
    val r = Stats.pcaPowerTop(df, "embedding", d = 4, iters = 8)
      .orderBy("dim").as[(Long, Long)].collect().toSeq
    assert(r.map(_._1) == Seq(1L, 2L, 3L, 4L))
    // renorm is w tdiv (max|w| div 1e6), so the lead component sits at
    // ~1e6 (within the truncation slack) and the rest are exactly zero
    assert(r.head._2 >= 1000000L && r.head._2 <= 1001000L, r.toString)
    assert(r.tail.map(_._2) == Seq(0L, 0L, 0L), r.toString)
    val shuffled = scala.util.Random.shuffle(rows.toVector).toDF("embedding")
    assert(Stats.pcaPowerTop(shuffled.repartition(16), "embedding", 4, 8)
      .orderBy("dim").as[(Long, Long)].collect().toSeq == r)
  }

  test("aucExact: hand-checked midrank ties; invariant to partitioning; perfect/inverted/random anchors") {
    import spark.implicits._
    // scores [1,1,2,3], labels [0,1,0,1]: tie pair 1/2-credits, one
    // discordant, two concordant -> U = 2.5 of 4 -> 625000 ppm
    val df = Seq((1L, 0), (1L, 1), (2L, 0), (3L, 1)).toDF("s", "y")
    def auc(d: org.apache.spark.sql.DataFrame) =
      Stats.aucExact(d, col("s"), col("y") === 1)
        .as[(Long, Long, Long)].head()
    assert(auc(df) == ((2L, 2L, 625000L)))
    assert(auc(df.repartition(16)) == ((2L, 2L, 625000L)))
    // perfectly separated -> 1.0; inverted -> 0.0; all-tied -> 0.5
    val sep = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1)).toDF("s", "y")
    assert(auc(sep)._3 == 1000000L)
    val inv = Seq((4L, 0), (3L, 0), (2L, 1), (1L, 1)).toDF("s", "y")
    assert(auc(inv)._3 == 0L)
    val tied = Seq((7L, 0), (7L, 1), (7L, 0), (7L, 1)).toDF("s", "y")
    assert(auc(tied)._3 == 500000L)
  }

  test("CUSUM prefix identity equals the textbook recursion s_t = max(0, s_prev + dev)") {
    // the query algebra computes s_t = P_t - min(0, min_{i<=t} P_i);
    // verify it against Page's recursion on adversarial sequences
    // (all-negative, drift-up, oscillating, spike-recover)
    val seqs = Seq(
      Seq(-5L, -3L, -8L), Seq(1L, 2L, 3L, 4L), Seq(5L, -9L, 5L, -9L, 20L),
      Seq(0L, 0L, 7L, -20L, 7L, 7L), (1 to 50).map(i => ((i * 37) % 21) - 10L))
    for (devs <- seqs) {
      val rec = devs.scanLeft(0L)((s, d) => math.max(0L, s + d)).tail
      val prefixes = devs.scanLeft(0L)(_ + _).tail
      val viaIdentity = prefixes.zipWithIndex.map { case (p, i) =>
        p - math.min(0L, prefixes.take(i + 1).min)
      }
      assert(viaIdentity == rec, s"devs=$devs")
    }
  }

  test("skyline2d: hand-checked frontier with ties and duplicates; partitioning-invariant") {
    import spark.implicits._
    // minimize x, maximize y. frontier: (1,5), (3,7); (1,5)-dup survives
    // twice (neither dominates its twin — dominance needs one strict);
    // (2,5) is dominated by (1,5); (4,7) by (3,7); (5,1) by everything
    val pts = Seq((1L, 5L, "a"), (1L, 5L, "a2"), (2L, 5L, "b"),
      (3L, 7L, "c"), (4L, 7L, "d"), (5L, 1L, "e"))
      .toDF("x", "y", "tag")
    def run(parts: Int) =
      Stats.skyline2d(pts.repartition(parts), "x", "y")
        .orderBy("x", "tag").select("x", "y", "tag")
        .as[(Long, Long, String)].collect().toSeq
    val expect = Seq((1L, 5L, "a"), (1L, 5L, "a2"), (3L, 7L, "c"))
    assert(run(1) == expect, run(1).toString)
    assert(run(16) == expect)
    // a single all-dominating point leaves exactly itself
    val one = Seq((0L, 99L, "z"), (1L, 98L, "y"), (2L, 1L, "x")).toDF("x", "y", "tag")
    assert(Stats.skyline2d(one, "x", "y").count() == 1L)
  }
}
