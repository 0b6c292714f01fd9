package graft

import org.apache.spark.sql.functions._

import graft.ops.Privacy

/** Invariants of the k-anonymity release gate ([[graft.ops.Privacy]])
  * on adversarial synthetic QI distributions — the properties the
  * driver-gated `privacy_k_anon` query cannot isolate. */
class PrivacySpec extends SparkSpec {

  // 3 QI columns; engineered group sizes:
  //  (a, x, 0): 5 rows  -> level 0
  //  (a, x, 1): 2 rows  -> fails L0; parent (a, x) fail-sum = 2 + 1 = 3 -> level 1
  //  (a, x, 2): 1 row   -> fails L0; same parent                       -> level 1
  //  (b, y, 0): 2 rows  -> fails L0; parent (b, y) fail-sum = 2 < 3    -> suppressed
  //  (c, null, 0): 3 rows -> NULL QI value forms its own level-0 group
  private def qiRows = {
    val s = spark
    import s.implicits._
    (Seq.fill(5)(("a", "x", 0)) ++ Seq.fill(2)(("a", "x", 1)) ++
      Seq(("a", "x", 2)) ++ Seq.fill(2)(("b", "y", 0)) ++
      Seq.fill(3)(("c", null.asInstanceOf[String], 0)))
      .zipWithIndex.map { case ((g1, g2, band), i) => (i.toLong, g1, g2, band) }
      .toDF("id", "g1", "g2", "band")
  }

  test("k-anon: release levels, generalization, and suppression are exact") {
    val out = Privacy.kAnonymize(qiRows, Seq("g1", "g2", "band"), k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(4),
        if (r.isNullAt(3)) None else Some(r.getInt(3))))
      .sortBy(_._1)
    // ids 0-4: (a,x,0) level 0, band kept
    assert(out.filter(_._1 <= 4).forall { case (_, lvl, b) => lvl == 0 && b == Some(0) })
    // ids 5-7: (a,x,1)+(a,x,2) generalize to (a,x) at level 1, band nulled
    assert(out.filter(t => t._1 >= 5 && t._1 <= 7)
      .forall { case (_, lvl, b) => lvl == 1 && b.isEmpty })
    // ids 8-9: (b,y) fail-sum 2 < k -> suppressed entirely
    assert(!out.exists(t => t._1 == 8 || t._1 == 9), "under-k rows leaked")
    // ids 10-12: NULL g2 is its own group of 3 -> released at level 0
    assert(out.filter(_._1 >= 10).map(_._1).toSeq == Seq(10L, 11L, 12L))
    assert(out.count(_._2 == 0) == 8 && out.count(_._2 == 1) == 3)
  }

  test("k-anon: every released group satisfies k at its own level") {
    val released = Privacy.kAnonymize(qiRows, Seq("g1", "g2", "band"), k = 3)
    val l0 = released.filter(col("anon_level") === 0)
      .groupBy("g1", "g2", "band").count().collect().map(_.getLong(3))
    val l1 = released.filter(col("anon_level") === 1)
      .groupBy("g1", "g2").count().collect().map(_.getLong(2))
    assert(l0.forall(_ >= 3), s"level-0 group under k: ${l0.mkString(",")}")
    assert(l1.forall(_ >= 3), s"level-1 group under k: ${l1.mkString(",")}")
  }

  test("k-anon: equals the brute-force reference on 20 random QI distributions") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42) // deterministic seeds
    for (trial <- 1 to 20) {
      val k = 2 + rnd.nextInt(3) // 2..4
      val n = 20 + rnd.nextInt(60)
      val rows = (0 until n).map { i =>
        (i.toLong, s"g${rnd.nextInt(3)}",
          if (rnd.nextInt(10) == 0) null.asInstanceOf[String] else s"s${rnd.nextInt(3)}",
          rnd.nextInt(4))
      }
      val df = rows.toDF("id", "g1", "g2", "band")
      val got = Privacy.kAnonymize(df, Seq("g1", "g2", "band"), k)
        .collect()
        .map(r => (r.getLong(0), r.getInt(4),
          if (r.isNullAt(3)) None else Some(r.getInt(3))))
        .toSet
      // brute-force reference on the driver
      val sizes0 = rows.groupBy(r => (r._2, r._3, r._4)).view.mapValues(_.size).toMap
      val fail0 = rows.filter(r => sizes0((r._2, r._3, r._4)) < k)
      val sizes1 = fail0.groupBy(r => (r._2, r._3)).view.mapValues(_.size).toMap
      val want = (rows.filter(r => sizes0((r._2, r._3, r._4)) >= k)
          .map(r => (r._1, 0, Some(r._4))) ++
        fail0.filter(r => sizes1((r._2, r._3)) >= k)
          .map(r => (r._1, 1, None))).toSet
      assert(got == want,
        s"trial $trial (k=$k, n=$n): only-got=${got.diff(want).take(3)} " +
          s"only-want=${want.diff(got).take(3)}")
    }
  }

  test("k-anon: a passing level-0 group is never generalized by a failing sibling") {
    val s = spark
    import s.implicits._
    // (a, x, 0) passes alone; (a, x, 1) fails and its parent fail-sum (1)
    // also fails -> suppressed. The passing group must keep its band.
    val df = (Seq.fill(3)(("a", "x", 0)) ++ Seq(("a", "x", 1)))
      .zipWithIndex.map { case ((g1, g2, b), i) => (i.toLong, g1, g2, b) }
      .toDF("id", "g1", "g2", "band")
    val out = Privacy.kAnonymize(df, Seq("g1", "g2", "band"), k = 3).collect()
    assert(out.length == 3 && out.forall(r => r.getInt(4) == 0 && r.getInt(3) == 0))
  }

  test("geometric noise: deterministic per seed, symmetric, capped") {
    val s = spark
    import s.implicits._
    val seeds = (1 to 2000).map(i => s"seed:$i").toDF("seed")
    val g1 = seeds.select(col("seed"), Privacy.geometricNoise(col("seed")).as("g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val g2 = seeds.select(col("seed"), Privacy.geometricNoise(col("seed")).as("g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g1 === g2, "noise must be a pure function of the seed")
    assert(g1.values.forall(v => math.abs(v) <= 16), "run cap violated")
    val plus = g1.values.count(_ > 0); val minus = g1.values.count(_ < 0)
    assert(math.abs(plus - minus) < 200, s"sign asymmetry: +$plus vs -$minus")
  }

  test("geometric noise: distribution matches P(0)=1/2, P(+-k)=2^-(k+2); worst ratio e^eps with eps=2 ln 2") {
    val s = spark
    import s.implicits._
    val n = 40000
    val g = (1 to n).map(i => s"dist:$i").toDF("seed")
      .select(Privacy.geometricNoise(col("seed")).as("g"))
      .collect().map(_.getLong(0))
    val freq = g.groupBy(identity).view.mapValues(_.length.toDouble / n).toMap
    def expect(k: Long): Double =
      if (k == 0) 0.5 else math.pow(2.0, -(math.abs(k) + 2).toDouble)
    for (k <- Seq(0L, 1L, -1L, 2L, -2L, 3L, -3L)) {
      val p = freq.getOrElse(k, 0.0)
      assert(math.abs(p - expect(k)) < 0.015,
        s"P(G=$k) = $p, expected ${expect(k)}")
    }
    // epsilon accounting: the mechanism's privacy loss at sensitivity 1
    // is max_k P(G=k)/P(G=k+1) = P(0)/P(1) = 4 = e^(2 ln 2) — check the
    // empirical worst adjacent ratio stays near that bound
    val r01 = freq(0L) / freq(1L)
    assert(r01 > 3.0 && r01 < 5.3, s"P(0)/P(1) = $r01, expected ~4")
    val r12 = freq(1L) / freq(2L)
    assert(r12 > 1.5 && r12 < 2.7, s"P(1)/P(2) = $r12, expected ~2")
  }

  test("maskedView: masks apply, filtered rows gone, bad policy fails loudly") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "alice", "A", 123.0), (2L, "bob", "B", 456.0))
      .toDF("id", "name", "seg", "bal")
    val v = graft.ops.Privacy.maskedView(df,
      masks = Map("name" -> org.apache.spark.sql.functions.lit("***")),
      rowFilter = org.apache.spark.sql.functions.col("seg") =!= "B")
    val rows = v.collect()
    assert(rows.length == 1 && rows.head.getString(1) == "***" &&
      rows.head.getLong(0) == 1L && rows.head.getDouble(3) == 123.0)
    assert(v.columns.toSeq == df.columns.toSeq, "schema shape is preserved")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Privacy.maskedView(df,
        Map("nope" -> org.apache.spark.sql.functions.lit(0)),
        org.apache.spark.sql.functions.lit(true))
    }
    assert(e.getMessage.contains("nonexistent"))
  }
}
