package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bounded-heap TopKPairs aggregate: equality with the ranking-window
  * formulation, including tie-breaks and under-k groups. */
class TopKSpec extends SparkSpec {

  private def scored = {
    val s = spark
    import s.implicits._
    // deterministic scores with deliberate ties (score = i % 7)
    (1 to 2000).map { i =>
      val g = (i % 5).toLong
      (g, i.toLong, (i % 7).toDouble / 7.0)
    }.toDF("query_id", "cand_id", "cos")
      .union(Seq((99L, 1L, 0.5)).toDF("query_id", "cand_id", "cos")) // under-k group
  }

  test("topk_pairs equals the row_number window formulation exactly") {
    val k = 10
    val viaAgg = scored.groupBy(col("query_id"))
      .agg(functions.topk_pairs(col("cos"), col("cand_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "p")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rk"),
        col("p.id").as("cand_id"), col("p.score").as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id").asc)
    val viaWindow = scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("cand_id"), col("cos"))
    val a = viaAgg.orderBy("query_id", "rk").collect().toSeq
    val b = viaWindow.orderBy("query_id", "rk").collect().toSeq
    assert(a == b)
    assert(a.count(_.getLong(0) == 99L) === 1) // under-k group keeps its 1 row
  }

  test("topk_pairs is callable from SQL after registration") {
    graft.functions.GraftExtensions.register(spark)
    scored.createOrReplaceTempView("topk_scored")
    val rows = spark.sql(
      """SELECT query_id, topk_pairs(cos, cand_id, 2) AS t
        |FROM topk_scored WHERE query_id = 0 GROUP BY query_id""".stripMargin)
      .selectExpr("query_id", "t[0].id AS first_id", "t[0].score AS first_score")
      .head()
    // best for group 0: score 6/7, smallest cand_id with that score
    assert(rows.getLong(0) === 0L && rows.getDouble(2) === 6.0 / 7.0)
  }

  test("partial aggregation admits at most k rows per group per task") {
    // repartition to force many partials; result must still be the exact top-k
    val k = 3
    val r = scored.repartition(16)
      .groupBy(col("query_id"))
      .agg(functions.topk_pairs(col("cos"), col("cand_id"), k).as("topk"))
      .select(col("query_id"), size(col("topk")).as("n"))
      .collect().map(row => row.getLong(0) -> row.getInt(1)).toMap
    assert((0L to 4L).forall(g => r(g) == k) && r(99L) == 1)
  }
}
