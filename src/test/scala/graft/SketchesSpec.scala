package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketches

/** Accuracy contracts of the sketch operators against exact answers —
  * these are deliberately not oracle queries (sketch layouts are
  * engine-specific), so the pins live here. */
class SketchesSpec extends SparkSpec {

  private def skewed = {
    val s = spark
    import s.implicits._
    (1 to 20000).map { i =>
      val k = if (i % 10 == 0) i.toLong else (i % 100).toLong // 100 hot keys
      ("g" + (i % 3), k)
    }.toDF("g", "k")
  }

  test("HLL distinct is within rsd of exact per group") {
    val df = skewed
    val exact = df.groupBy("g").agg(countDistinct(col("k")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Sketches.approxDistinct(df, Seq("g"), "k", rsd = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(approx(g) - n).toDouble / n < 0.15, s"group $g: $n vs ${approx(g)}")
    }
  }

  test("approx quantiles bracket the exact median") {
    val s = spark
    import s.implicits._
    val df = (1 to 10001).map(_.toDouble).toDF("v")
    val Array(q50) = Sketches.approxQuantiles(df, "v", Array(0.5), relativeError = 0.01)
    assert(math.abs(q50 - 5001.0) <= 101.0) // 1% rank error on 10001 rows
  }

  test("bloom filter has no false negatives and bounded false positives") {
    val s = spark
    import s.implicits._
    val present = (1L to 5000L)
    val bf = Sketches.bloomFilter(present.toDF("k"), "k", expectedItems = 5000, fpp = 0.03)
    assert(present.forall(bf.mightContainLong)) // NEVER a false negative
    val fp = (100001L to 110000L).count(bf.mightContainLong)
    assert(fp < 10000 * 0.1, s"false positive rate too high: $fp/10000")
  }

  test("bloom-pruned join equals the plain join") {
    val s = spark
    import s.implicits._
    val probe = (1L to 20000L).map(i => (i, s"p$i")).toDF("k", "pv")
    val build = (1L to 20000L by 100).map(i => (i, s"b$i")).toDF("k", "bv")
    val plain = probe.join(build, "k").select("k").collect().map(_.getLong(0)).sorted
    val pruned = Sketches.bloomPrunedJoin(probe, build, "k", expectedItems = 200)
      .select("k").collect().map(_.getLong(0)).sorted
    assert(pruned.sameElements(plain))
  }

  test("count-min never undercounts; heavy hitters found") {
    val df = skewed
    val cms = Sketches.countMinSketch(df, "k")
    val exact = df.groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.take(50).foreach { case (k, n) =>
      assert(cms.estimateCount(k.asInstanceOf[Any]) >= n, s"undercount for $k")
    }
    // key 7 appears 200x (hot: every i with i%100==7); key 9999 never
    val hh = Sketches.heavyHitters(df, "k", Seq(7L, 9999L), minShare = 0.005)
    assert(hh.exists(_._1 == 7L) && !hh.exists(_._1 == 9999L))
  }

  test("count-min eps bound holds for top-10 suppkeys on shipped sf0.001 data") {
    // The within-eps audit that sketch_cm_topk used to assert cross-engine:
    // est <= exact + ceil(eps*n) is a 99%-confidence (not hard) guarantee,
    // so the driver oracle crosses only never_under; the eps pin lives here,
    // deterministic for the fixed seed + shipped corpus.
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val eps = 0.0005
    val n = li.count()
    val cms = Sketches.countMinSketch(li.select(col("l_suppkey")), "l_suppkey",
      eps = eps)
    val slack = math.ceil(eps * n).toLong
    val top = li.groupBy(col("l_suppkey")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("l_suppkey").asc).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    top.foreach { case (k, exact) =>
      val est = cms.estimateCount(Long.box(k))
      assert(est >= exact, s"undercount for $k")
      assert(est <= exact + slack, s"eps bound violated for $k: $est > $exact + $slack")
    }
  }

  test("heavy hitters with distributed candidate discovery find the hot keys") {
    val df = skewed
    // hot keys: k in 1..99 not divisible by 10 (200 rows each, 1% share);
    // multiples of 10 are all singletons (k=i on the i%10==0 branch).
    // Sample at 25% so each hot key keeps ~50 sampled rows.
    val hot = (1L until 100L).filterNot(_ % 10 == 0).toSet
    val hh = Sketches.heavyHitters(df, "k", minShare = 0.005, eps = 0.001,
      sampleFraction = 0.25, maxCandidates = 200)
    val keys = hh.map(_._1.asInstanceOf[Long]).toSet
    assert(hot.forall(keys.contains), s"missed hot keys: ${hot.filterNot(keys.contains)}")
    assert(keys.forall(hot.contains), s"non-hot keys leaked in: ${keys.filterNot(hot.contains).take(5)}")
  }

  test("bloomPrunedAntiJoin equals a plain anti join (false positives cost a probe, never a row)") {
    import spark.implicits._
    val probe = (1L to 2000L).map(i => (i, s"v$i")).toDF("user_id", "v")
    val build = (1L to 2000L).filter(_ % 53 == 0).map(Tuple1(_)).toDF("user_id")
    val got = graft.ops.Sketches.bloomPrunedAntiJoin(probe, build, "user_id",
        expectedItems = 64L, fpp = 0.5) // tiny + high fpp: false positives guaranteed
      .select("user_id").as[Long].collect().sorted
    val want = probe.join(build, Seq("user_id"), "left_anti")
      .select("user_id").as[Long].collect().sorted
    assert(got.toSeq === want.toSeq)
    assert(got.length === 2000 - build.count())
  }

  test("bloomPrunedAntiJoin keeps NULL-key probe rows, like the plain anti join") {
    import spark.implicits._
    // Two null-key probe rows: a null-propagating bloom filter would drop
    // them from BOTH branches; the plain left_anti keeps them.
    val probe = ((1L to 100L).map(i => (java.lang.Long.valueOf(i), s"v$i"))
      :+ ((null: java.lang.Long), "null_a") :+ ((null: java.lang.Long), "null_b"))
      .toDF("user_id", "v")
    val build = (1L to 100L).filter(_ % 7 == 0).map(Tuple1(_)).toDF("user_id")
    val got = graft.ops.Sketches.bloomPrunedAntiJoin(probe, build, "user_id",
        expectedItems = 32L, fpp = 0.5)
      .select("v").as[String].collect().sorted
    val want = probe.join(build, Seq("user_id"), "left_anti")
      .select("v").as[String].collect().sorted
    assert(got.toSeq === want.toSeq)
    assert(got.count(_.startsWith("null_")) === 2)
  }
}
