package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Salted aggregation must equal the straight groupBy on skewed data. */
class SkewSpec extends SparkSpec {

  test("saltedCountSum equals plain groupBy on a 90%-hot-key distribution") {
    val s = spark
    import s.implicits._
    val rows = (1 to 20000).map { i =>
      val key = if (i % 10 == 0) s"k${i % 7}" else "hot" // 90% on one key
      (key, i.toLong, i * 0.5)
    }
    val df = rows.toDF("k", "uid", "v")
    val salted = Skew.saltedCountSum(df, col("k"), col("uid"), col("v"), buckets = 8)
      .orderBy("key").collect()
    val plain = df.groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .orderBy("k").collect()
    assert(salted.length == plain.length)
    salted.zip(plain).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getLong(1) == b.getLong(1))
      assert(math.abs(a.getDouble(2) - b.getDouble(2)) < 1e-6)
    }
  }

  test("saltedDistinctCount is exact (salting by the counted value)") {
    val s = spark
    import s.implicits._
    val df = (1 to 5000).map(i => ("hot", (i % 321).toLong)).toDF("k", "v")
    val got = Skew.saltedDistinctCount(df, col("k"), col("v"), buckets = 8).head()
    assert(got.getLong(1) == 321L)
  }

  test("adaptiveCountSum: detector routes only the hot key through salting; result equals plain groupBy") {
    val s = spark
    import s.implicits._
    // ~90% of rows on "hot", the rest spread over 40 cold keys — at
    // minShare 0.2 the detector must find exactly the hot key, so the
    // plan is hot-salted ∪ cold-plain; the values must match the plain
    // aggregation either way
    val rows = (1 to 20000).map { i =>
      val key = if (i % 10 == 0) s"cold${i % 40}" else "hot"
      (key, i.toLong, i * 0.25)
    }
    val df = rows.toDF("k", "uid", "v")
    val adaptive = Skew.adaptiveCountSum(df, "k", col("uid"), col("v"),
        minShare = 0.2, buckets = 8)
      .orderBy("k").collect()
    val plain = df.groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .orderBy("k").collect()
    assert(adaptive.length == plain.length)
    adaptive.zip(plain).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getLong(1) == b.getLong(1))
      assert(math.abs(a.getDouble(2) - b.getDouble(2)) < 1e-6)
    }
    // no hitters above 60% share -> pure plain path, still exact
    val cold = Skew.adaptiveCountSum(df, "k", col("uid"), col("v"),
        minShare = 0.97, buckets = 8)
      .orderBy("k").collect()
    assert(cold.length == plain.length && cold.head.getLong(1) == plain.head.getLong(1))
  }

  test("adaptiveDistinctList: non-reducible collect equals plain groupBy; null keys flow cold") {
    val s = spark
    import s.implicits._
    // hot key carries 200 distinct values across 18000 rows; cold keys a
    // handful each; one null-key group must survive through the cold path
    val rows = (1 to 20000).map { i =>
      val key = if (i % 10 == 0) s"cold${i % 40}" else "hot"
      (if (i % 1000 == 0) null else key, s"v${i % 200}")
    }
    val df = rows.toDF("k", "v")
    val adaptive = Skew.adaptiveDistinctList(df, "k", col("v"),
        minShare = 0.2, buckets = 8, outName = "vals")
      .orderBy("k").collect()
    val plain = df.groupBy(col("k")).agg(sort_array(collect_set(col("v"))).as("vals"))
      .orderBy("k").collect()
    assert(adaptive.length == plain.length)
    adaptive.zip(plain).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getSeq[String](1) == b.getSeq[String](1))
    }
  }

  test("a caller's own __salt0 column is not clobbered and key keeps its name") {
    val s = spark
    import s.implicits._
    // if the helper salt reused __salt0, every row would collapse into one
    // salt bucket per key (the constant), which still aggregates correctly —
    // so assert on the name-collision path directly: result must be exact
    // and expose the key under the requested name
    val df = (1 to 1000).map(i => ("hot", i.toLong, i * 1.0, "preexisting"))
      .toDF("k", "uid", "v", "__salt0")
    val row = Skew.saltedCountSum(df, col("k"), col("uid"), col("v"),
      buckets = 8, keyName = "k").head()
    assert(row.getAs[String]("k") == "hot")
    assert(row.getAs[Long]("n") == 1000L)
    assert(math.abs(row.getAs[Double]("total") - (1 to 1000).map(_ * 1.0).sum) < 1e-6)
  }
}
