package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q_shortest_paths phases (driver-side tooling,
  * not part of the library surface). */
object BfsProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e0 = graft.ops.Materialize.invariant(
      graft.queries.Tables.orders(spark, d)
      .join(graft.queries.Tables.lineitem(spark, d),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("a"), (col("l_suppkey") + 1000000L).as("b"))
      .distinct())
    val e = e0.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e0.select(col("b").as("src"), col("a").as("dst")))
    val seeds = e0.filter(col("a") % 100 === 0)
      .select(col("a").as("node")).distinct()
    t("whole bfsHops + collect (cold)") {
      val r = graft.ops.Graph.bfsHops(e, seeds, maxHops = 3).orderBy("node")
      println(s"[probe] rows: ${r.count()}")
    }
    t("whole bfsHops + collect (warm)") {
      val r = graft.ops.Graph.bfsHops(e, seeds, maxHops = 3).orderBy("node")
      println(s"[probe] rows: ${r.count()}")
    }
    t("whole bfsHops + collect (warm2)") {
      val r = graft.ops.Graph.bfsHops(e, seeds, maxHops = 3).orderBy("node")
      println(s"[probe] rows: ${r.count()}")
    }
    // phase decomposition
    val em = t("edge materialize") {
      val x = graft.ops.Materialize.invariant(
        e.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst")).distinct())
      println(s"[probe] edges: ${x.count()}")
      x
    }
    var settled = t("seed carried") {
      graft.ops.Materialize.carried(
        seeds.select(col("node").cast("long").as("node")).distinct()
          .withColumn("hops", lit(0)))
    }
    var frontier = settled.select(col("node"))
    for (round <- 1 to 3) {
      val next = t(s"round $round carried(next)") {
        graft.ops.Materialize.carried(
          frontier.join(em, frontier("node") === em("src"))
            .select(col("dst").as("node")).distinct()
            .join(settled, Seq("node"), "left_anti")
            .withColumn("hops", lit(round)))
      }
      settled = settled.unionByName(next)
      frontier = next.select(col("node"))
      t(s"round $round frontier count")(frontier.count())
    }
    t("final orderBy+count")(settled.orderBy("node").count())
    spark.stop()
  }
}
