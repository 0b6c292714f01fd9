package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Materialize

/** Scratch A/B: kCoreRounds peel via left_semi(keep) vs left_anti(drop),
  * alternated in ONE session so JIT/cache state is shared — the
  * measurement behind the round-15 anti-join decision in
  * [[graft.ops.Graph.kCoreRounds]]. Usage: runMain ... <sfDir> <reps> */
object KCoreAbProbe {
  private def edges(spark: SparkSession, d: String): DataFrame = {
    val li = graft.queries.Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("lo"))
    val b = li.select(col("l_orderkey").as("ok2"), col("l_partkey").as("hi"))
    a.join(b, col("ok") === col("ok2") && col("lo") < col("hi"))
      .select(col("lo"), col("hi"))
  }

  private def run(spark: SparkSession, d: String, k: Int, rounds: Int,
      anti: Boolean): Unit = {
    var e = Materialize.carried(edges(spark, d)
      .select(least(col("lo"), col("hi")).as("lo"),
        greatest(col("lo"), col("hi")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct())
    for (_ <- 1 to rounds) {
      val deg = e.select(col("lo").as("node"))
        .unionAll(e.select(col("hi").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("d"))
      e =
        if (anti) {
          val drop = deg.filter(col("d") < k).select(col("node"))
          Materialize.carried(e
            .join(drop.select(col("node").as("lo")), Seq("lo"), "left_anti")
            .join(drop.select(col("node").as("hi")), Seq("hi"), "left_anti"))
        } else {
          val keep = deg.filter(col("d") >= k).select(col("node"))
          Materialize.carried(e
            .join(keep.select(col("node").as("lo")), Seq("lo"), "left_semi")
            .join(keep.select(col("node").as("hi")), Seq("hi"), "left_semi"))
        }
    }
    e.select(col("lo").as("node"))
      .unionAll(e.select(col("hi").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      .orderBy("node")
      .write.format("noop").mode("overwrite").save()
  }

  def main(args: Array[String]): Unit = {
    val d = args(0)
    val reps = args(1).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, d, 70, 4, anti = true) // shared warmup
    run(spark, d, 70, 4, anti = false)
    for (r <- 1 to reps; anti <- Seq(false, true)) {
      val t0 = System.nanoTime()
      run(spark, d, 70, 4, anti)
      println(f"[kcore-ab] ${if (anti) "anti" else "semi"} rep$r ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
