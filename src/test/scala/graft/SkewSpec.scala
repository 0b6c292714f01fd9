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
      .orderBy("__key").collect()
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
}
