package graft

import org.apache.spark.sql.functions._

import graft.sources.TableIO

/** The 100 TB merge story: bucketed-by-Connect_ID version tables join
  * with NO exchange (shuffle-free sort-merge over co-bucketed files). */
class TableIOSpec extends SparkSpec {

  test("bucketed CTAS removes the exchange from the merge join") {
    val s = spark
    import s.implicits._
    val v1 = (1 to 100).map(i => (i.toString, s"a$i")).toDF("Connect_ID", "d_111111111")
    val v2 = (50 to 150).map(i => (i.toString, s"b$i")).toDF("Connect_ID", "d_222222222")
    TableIO.replaceBucketed(v1, "bucketed_v1", "Connect_ID", 4)
    TableIO.replaceBucketed(v2, "bucketed_v2", "Connect_ID", 4)
    try {
      val joined = TableIO.readTable(spark, "bucketed_v1")
        .join(TableIO.readTable(spark, "bucketed_v2"), Seq("Connect_ID"), "full_outer")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 150)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bucketed_v1")
      spark.sql("DROP TABLE IF EXISTS bucketed_v2")
    }
  }

  test("csv and json sources round-trip") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-io").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    df.write.option("header", "true").csv(s"$dir/csv")
    df.write.json(s"$dir/json")
    val csv = TableIO.readCsv(spark, s"$dir/csv")
    assert(csv.count() == 2 && csv.columns.toSeq == Seq("id", "v"))
    val json = TableIO.readJson(spark, s"$dir/json")
    assert(json.count() == 2 && json.columns.sorted.toSeq == Seq("id", "v"))
  }

  test("replaceParquet is an atomic overwrite (CTAS semantics)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-io").toString + "/t"
    TableIO.replaceParquet(Seq((1, "x")).toDF("id", "v"), dir)
    TableIO.replaceParquet(Seq((2, "y"), (3, "z")).toDF("id", "v"), dir)
    val back = TableIO.readParquet(spark, dir)
    assert(back.count() == 2) // second write fully replaced the first
  }
}
