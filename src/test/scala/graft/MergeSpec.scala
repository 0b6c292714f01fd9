package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.transform.{MergeTableVersions, SensitiveTier}

/** FIXTURES.md §S4 (merge) and §S5 (sensitive tier). */
class MergeSpec extends SparkSpec {

  private def df(cols: Seq[String], rows: Seq[Seq[String]]) = {
    val schema = StructType(cols.map(c => StructField(c, StringType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.map(Row.fromSeq), 2), schema)
  }

  test("merge: case-insensitive common columns, earliest table wins, full outer") {
    val v1 = df(Seq("Connect_ID", "D_111111111", "only1"),
      Seq(Seq("a", "v1a", "u1"), Seq("b", "v1b", "u2")))
    val v2 = df(Seq("Connect_ID", "d_111111111", "only2"),
      Seq(Seq("b", "v2b", "w1"), Seq("c", "v2c", "w2")))
    val out = MergeTableVersions(Seq(v1, v2))
    // common sorted first (connect_id, d_111111111), then unique per table sorted
    assert(out.columns.toSeq == Seq("Connect_ID", "d_111111111", "only1", "only2"))
    val byId = out.collect().map(r => r.getString(0) -> r).toMap
    assert(byId.keySet == Set("a", "b", "c"))
    assert(byId("b").getString(1) == "v1b") // earliest table wins in coalesce
    assert(byId("a").getString(3) == null)  // a not in v2
    assert(byId("c").getString(2) == null)  // c not in v1
  }

  test("merge: forbidden and excluded-substring columns are dropped before merging") {
    val v1 = df(Seq("Connect_ID", "token", "d_1_provided", "d_222222222"),
      Seq(Seq("a", "t", "p", "x")))
    val v2 = df(Seq("Connect_ID", "d_222222222"), Seq(Seq("a", "y")))
    val out = MergeTableVersions(Seq(v1, v2))
    assert(out.columns.toSeq == Seq("Connect_ID", "d_222222222"))
    assert(out.head().getString(1) == "x")
  }

  test("merge: fold semantics — key in v1 and v2 but not base merges to one row (SURVEY 2.C-1)") {
    val v1 = df(Seq("Connect_ID", "a1"), Seq(Seq("k", "x")))
    val v2 = df(Seq("Connect_ID", "a2"), Seq(Seq("k", "y")))
    val v3 = df(Seq("Connect_ID", "a3"), Seq(Seq("other", "z")))
    val out = MergeTableVersions(Seq(v1, v2, v3))
    val rows = out.collect()
    assert(rows.length == 2) // fold merges k across v1+v2; reference SQL would emit 3
    val k = rows.find(_.getString(0) == "k").get
    assert(k.getAs[String]("a1") == "x" && k.getAs[String]("a2") == "y")
  }

  test("merge: strict mode pins the reference's base-anchored chain — fold ≠ strict on a base-absent key") {
    val v1 = df(Seq("Connect_ID", "a1"), Seq(Seq("k", "x")))
    val v2 = df(Seq("Connect_ID", "a2"), Seq(Seq("k", "y")))
    val v3 = df(Seq("Connect_ID", "a3"), Seq(Seq("other", "z")))
    val strict = MergeTableVersions(Seq(v1, v2, v3), strict = true).collect()
    // Reference SQL joins v1 and v2 each against v3's key: "k" is absent
    // from the base, so its v1 and v2 rows never meet — 3 rows total
    // where the fold produces 2.
    assert(strict.length == 3)
    val kRows = strict.filter(_.getString(0) == "k")
    assert(kRows.length == 2)
    // one row carries only v1's column, the other only v2's
    assert(kRows.map(r => (r.getAs[String]("a1"), r.getAs[String]("a2"))).toSet ==
      Set(("x", null), (null, "y")))
    // keys present in the base still merge normally in both modes
    assert(strict.count(_.getString(0) == "other") == 1)
  }

  test("sensitive tier: fixed 18-column projection, extras dropped") {
    val cols = graft.config.Constants.SensitiveTierColumns
    val stored = "Connect_ID" +: cols.tail :+ "extra_column"
    val d = df(stored, Seq(("cid" +: cols.tail.map(_ => "v")) :+ "x"))
    val out = SensitiveTier(d)
    assert(out.columns.toSeq == cols) // exactly the configured 18, in order
    assert(!out.columns.contains("extra_column"))
  }
}
