package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Edge-semantics pins for the hash-driven samplers; the registered
  * queries (sample_hash_split, sample_weighted_mix, sample_stratified)
  * pin the same code against DuckDB on real data. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("null ids get one defined split bucket in BOTH samplers (no eval fallthrough, no drop)") {
    val df = Seq(
      (Some(1L), "web"), (Some(2L), "web"), (None, "web"), (None, "books"))
      .toDF("id", "source")
    // deterministicSplit: null ids must all land in the SAME bucket —
    // specifically md5('')'s bucket — not fall through to the last split
    val splits = Sampling.deterministicSplit(df, "id", "split",
        Seq("train" -> 90, "val" -> 95, "test" -> 100))
      .filter(col("id").isNull).select("split").as[String].collect()
    assert(splits.length == 2 && splits.distinct.length == 1)
    // md5('') prefix mod 100: compute the expected bucket directly
    val bucket = spark.sql(
      "SELECT CAST(conv(substring(md5(''), 1, 15), 16, 10) AS BIGINT) % 100").head().getLong(0)
    val expected = if (bucket < 90) "train" else if (bucket < 95) "val" else "test"
    assert(splits.head == expected)

    // weightedBySource at weight 1.0 must KEEP null-id rows (it dropped
    // them before the null-safe hash), and at weight 0.0 drop them
    val keepAll = Sampling.weightedBySource(df, "source", "id",
      Map("web" -> 1.0, "books" -> 1.0))
    assert(keepAll.count() == 4)
    val keepNone = Sampling.weightedBySource(df, "source", "id",
      Map("web" -> 0.0, "books" -> 0.0))
    assert(keepNone.count() == 0)
  }

  test("null and empty-string ids draw identically (the documented collision rule)") {
    val df = Seq((Some("a"), "s"), (None, "s"), (Some(""), "s")).toDF("id", "source")
    val out = Sampling.deterministicSplit(df, "id", "split",
        Seq("train" -> 50, "test" -> 100))
      .select("id", "split").collect()
      .map(r => Option(r.getString(0)) -> r.getString(1)).toMap
    assert(out(None) == out(Some("")))
  }

  test("epochShuffle is a complete permutation, varies by epoch, and ignores partitioning") {
    val df = (1L to 200L).toDF("id")
    def coords(d: org.apache.spark.sql.DataFrame, epoch: Int) =
      Sampling.epochShuffle(d, "id", epoch, shards = 4)
        .select("id", "shard", "pos").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    val e1 = coords(df, 1)
    // permutation: every id exactly once, positions dense 1..n per shard
    assert(e1.length == 200 && e1.map(_._1).distinct.length == 200)
    e1.groupBy(_._2._1).foreach { case (s, rows) =>
      assert(rows.map(_._2._2).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $s positions not dense")
    }
    // a different epoch is a genuinely different order
    val e2 = coords(df, 2).toMap
    assert(e1.count { case (id, c) => e2(id) != c } > 150,
      "epoch 2 barely differs from epoch 1")
    // reproducible: same epoch, adversarial partitioning, same coordinates
    val m1 = e1.toMap
    assert(coords(df.repartition(13), 1).forall { case (id, c) => m1(id) == c },
      "shuffle order depends on input partitioning")
  }

  test("groupK: exactly min(k, |group|) rows per group, equal to the window formulation") {
    val s = spark
    import s.implicits._
    // group sizes 3, 20, 200 — straddle k = 10 on both sides
    val df = ((1 to 3).map(i => ("small", i.toLong * 7)) ++
      (1 to 20).map(i => ("mid", 1000L + i)) ++
      (1 to 200).map(i => ("big", 5000L + i))).toDF("g", "id")
    val got = Sampling.groupK(df, Seq("g"), "id", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySize = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(bySize == Map("small" -> 3, "mid" -> 10, "big" -> 10), s"$bySize")
    // window-formulation ground truth: rank by 52-bit md5 prefix, id asc
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      .orderBy(substring(md5(col("id").cast("string")), 1, 13).asc, col("id").asc)
    val want = df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 10)
      .select("g", "rk", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == want.toSet, "heap draw differs from the ranking window")
    // reproducible under adversarial partitioning
    val again = Sampling.groupK(df.repartition(17), Seq("g"), "id", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(again.toSet == got.toSet)
  }

  test("denseIndex: dense 0..n-1 global rank equal to a ranking window, partitioning-stable") {
    val s = spark
    import s.implicits._
    val df = (1L to 5000L).map(i => (i * 13 % 4999, i)).toDF("k", "id")
    val got = Sampling.denseIndex(df, Seq("k", "id"), "gidx", numPartitions = 7)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.values.toSeq.sorted == (0L until 5000L).toSeq, "index not dense 0..n-1")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("k"), col("id"))
    val want = df.withColumn("gidx", row_number().over(w).cast("long") - 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == want, "range-partitioned rank differs from the global window")
    val again = Sampling.denseIndex(df.repartition(11), Seq("k", "id"), "gidx",
      numPartitions = 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(again == want, "index depends on input partitioning")
  }

  test("epochShuffle fails fast when an output column already exists") {
    val df = (1L to 10L).toDF("id").withColumn("shard", lit(0))
    val e = intercept[IllegalArgumentException] {
      Sampling.epochShuffle(df, "id", epoch = 1, shards = 2)
    }
    assert(e.getMessage.contains("already exist"))
    // and renaming the outputs sidesteps the collision
    val ok = Sampling.epochShuffle(df, "id", 1, 2, shardCol = "eshard", posCol = "epos")
    assert(ok.columns.count(_ == "shard") == 1 && ok.columns.contains("eshard"))
  }

  test("weightedWithReplacement: exact draw count, weight-proportional, deterministic") {
    val s = spark
    import s.implicits._
    // id 1 owns 990 of 1000 weight units; ids 2..11 own 1 each
    val df = ((1L, 990L) +: (2L to 11L).map(_ -> 1L)).toDF("id", "w")
    val got = Sampling.weightedWithReplacement(df, "id", "w", nDraws = 100,
      seed = "t", nShards = 4).collect()
    assert(got.length == 100, "with replacement: every draw lands exactly once")
    assert(got.map(_.getLong(0)).toSet.size == 100, "draw ids are distinct")
    val heavy = got.count(_.getLong(1) == 1L)
    assert(heavy > 90, s"99% of the weight should win ~99 draws, got $heavy")
    // deterministic across invocations and shard counts
    val again = Sampling.weightedWithReplacement(df, "id", "w", 100, "t", nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val gotSorted = got.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(again == gotSorted)
    // zero/negative/null weights never win
    val df2 = Seq((1L, 5L), (2L, 0L), (3L, -7L)).toDF("id", "w")
    val winners = Sampling.weightedWithReplacement(df2, "id", "w", 50, "t")
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    assert(winners == Set(1L))
  }
}
