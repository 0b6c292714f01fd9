package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.transform.CleanColumns

/** Behavioral port of the reference's seven SQL-composition scenarios
  * (`test/test_query_composition.py:37-85`, FIXTURES.md §S1) — asserted on
  * real DataFrames (schema AND data), one level deeper than the
  * reference's regex-on-generated-SQL tests. */
class CleanColumnsSpec extends SparkSpec {

  private def surveyDf(cols: Seq[String], rows: Seq[Seq[String]]) = {
    val schema = StructType(cols.map(c => StructField(c, StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq), 1), schema)
  }

  test("S1.1 basic loop rename: d_123456789_1_1 -> d_123456789_1") {
    val df = surveyDf(Seq("Connect_ID", "d_123456789_1_1"), Seq(Seq("c1", "a")))
    val out = CleanColumns(df)
    assert(out.columns.toSeq == Seq("Connect_ID", "d_123456789_1"))
    assert(out.head().getString(1) == "a")
  }

  test("S1.2 multi-version coalesce within loop group") {
    val df = surveyDf(
      Seq("Connect_ID", "d_123456789_2_2", "d_123456789_2_2_2_2"),
      Seq(Seq("c1", null, "b"), Seq("c2", "a", "b")))
    val out = CleanColumns(df)
    assert(out.columns.toSeq == Seq("Connect_ID", "d_123456789_2"))
    val vals = out.orderBy("Connect_ID").collect().map(_.getString(1)).toSeq
    assert(vals == Seq("b", "a")) // COALESCE order: first-listed column wins
  }

  test("S1.3 version handling: _v2 kept, moved to end") {
    val df = surveyDf(
      Seq("Connect_ID", "d_123456789_1_1", "d_123456789_v2_1_1"),
      Seq(Seq("c1", "a", "b")))
    val out = CleanColumns(df)
    assert(out.columns.toSeq == Seq("Connect_ID", "d_123456789_1", "d_123456789_1_v2"))
    assert(out.head().toSeq == Seq("c1", "a", "b"))
  }

  test("S1.4 multi-CID loop variable") {
    val df = surveyDf(Seq("Connect_ID", "d_123456789_3_3_d_987654321_3_3"), Seq(Seq("c1", "x")))
    val out = CleanColumns(df)
    assert(out.columns.toSeq == Seq("Connect_ID", "d_123456789_d_987654321_3"))
  }

  test("S1.5 non-loop variables pass through unchanged") {
    val df = surveyDf(Seq("Connect_ID", "d_123456789", "d_987654321"), Seq(Seq("c1", "a", "b")))
    val out = CleanColumns(df)
    assert(out.columns.toSeq == Seq("Connect_ID", "d_123456789", "d_987654321"))
  }

  test("S1.6 mixed loop and non-loop") {
    val df = surveyDf(Seq("Connect_ID", "d_123456789_4_4", "d_987654321"), Seq(Seq("c1", "a", "b")))
    val out = CleanColumns(df)
    assert(out.columns.toSeq == Seq("Connect_ID", "d_123456789_4", "d_987654321"))
  }

  test("S1.7 complex multi-version coalescing") {
    val cols = Seq("Connect_ID",
      "d_123456789_5_5", "d_123456789_5_5_5_5",
      "d_123456789_v2_5_5", "d_123456789_v2_5_5_5_5",
      "d_123456789_v3_5_5", "d_123456789_v3_5_5_5_5",
      "d_987654321_5_5", "d_987654321_5_5_5_5")
    val df = surveyDf(cols, Seq(Seq("c1", "a", "b", "c", "d", "e", "f", "g", "h")))
    val out = CleanColumns(df)
    assert(out.columns.toSeq == Seq("Connect_ID",
      "d_123456789_5", "d_123456789_5_v2", "d_123456789_5_v3", "d_987654321_5"))
    assert(out.head().toSeq == Seq("c1", "a", "c", "e", "g"))
  }

  test("version-placement pin (test_query_composition.py:242-243)") {
    val df = surveyDf(Seq("Connect_ID", "d_899251483_v2_d_812107266_6_6"), Seq(Seq("c1", "x")))
    val out = CleanColumns(df)
    assert(out.columns.toSeq == Seq("Connect_ID", "d_899251483_d_812107266_6_v2"))
  }

  test("substring excision with collision coalesce: fewest-substrings wins") {
    val df = surveyDf(
      Seq("Connect_ID", "d_123456789", "state_d_123456789"),
      Seq(Seq("c1", null, "s"), Seq("c2", "p", "s")))
    val out = CleanColumns(df)
    assert(out.columns.toSeq == Seq("Connect_ID", "d_123456789"))
    val vals = out.orderBy("Connect_ID").collect().map(_.getString(1)).toSeq
    assert(vals == Seq("s", "p")) // plain column has priority over state_-prefixed
  }

  test("one-off renames with coalesce groups (module1_v1_JP)") {
    val df = surveyDf(
      Seq("Connect_ID", "D_122887481_TUBLIG_D_232595513", "D_122887481_D_206625031"),
      Seq(Seq("c1", "t", null), Seq("c2", null, "u")))
    val out = CleanColumns(df, "FlatConnect.module1_v1_JP")
    // both sources map to d_122887481_d_623218391 -> coalesce group
    assert(out.columns.toSeq == Seq("Connect_ID", "d_122887481_d_623218391"))
    val vals = out.orderBy("Connect_ID").collect().map(_.getString(1)).toSeq
    assert(vals == Seq("t", "u"))
  }

  test("custom transforms: age/year extraction keeps target case, source passes through") {
    val df = surveyDf(
      Seq("Connect_ID", "D_317093647"),
      Seq(Seq("c1", "55"), Seq("c2", "1987"), Seq("c3", "abc"), Seq("c4", "126"), Seq("c5", null)))
    val out = CleanColumns(df, "FlatConnect.module1_v2_JP")
    assert(out.columns.toSeq ==
      Seq("Connect_ID", "D_317093647_D_623218391", "D_317093647_D_802622485", "d_317093647"))
    val byId = out.collect().map(r => r.getString(0) -> r).toMap
    assert(byId("c1").get(1) == 55L && byId("c1").get(2) == null)   // 55 = valid age
    assert(byId("c2").get(1) == null && byId("c2").get(2) == 1987L) // 1987 = valid year
    assert(byId("c3").get(1) == null && byId("c3").get(2) == null)
    assert(byId("c4").get(1) == null)                               // 126 out of age range
    assert(byId("c5").get(1) == null && byId("c5").get(2) == null)
    assert(byId("c1").getString(3) == "55")                          // source passthrough
  }

  test("one-off rename coalesces INTO an existing target column (original first)") {
    // target d_122887481_d_623218391 already exists as a stored column;
    // the mapped source joins its coalesce group AFTER the original
    // (ref core/transformations.py:233-244)
    val df = surveyDf(
      Seq("Connect_ID", "d_122887481_d_623218391", "D_122887481_TUBLIG_D_232595513"),
      Seq(Seq("c1", "orig", "mapped"), Seq("c2", null, "mapped2")))
    val out = CleanColumns(df, "FlatConnect.module1_v1_JP")
    assert(out.columns.toSeq == Seq("Connect_ID", "d_122887481_d_623218391"))
    val vals = out.orderBy("Connect_ID").collect().map(_.getString(1)).toSeq
    assert(vals == Seq("orig", "mapped2")) // original wins where non-null
  }

  test("loop-group output colliding with a non-loop column keeps one (loop wins)") {
    // the loop group d_123456789_1_1 canonicalizes to d_123456789_1, the
    // same name as a stored non-loop column; loop groups emit first, the
    // non-loop passthrough is then skipped by the duplicate guard
    // (ref core/transformations.py:491-494, :521-524)
    val df = surveyDf(
      Seq("Connect_ID", "d_123456789_1_1", "d_123456789_1"),
      Seq(Seq("c1", "fromloop", "stored")))
    val out = CleanColumns(df)
    assert(out.columns.toSeq == Seq("Connect_ID", "d_123456789_1"))
    assert(out.head().getString(1) == "fromloop")
  }

  test("duplicate output names never occur across steps") {
    val df = surveyDf(
      Seq("Connect_ID", "D_317093647", "d_317093647_d_623218391"),
      Seq(Seq("c1", "55", "x")))
    // custom transform target D_317093647_D_623218391 lowercases to the
    // same name as the stored column d_317093647_d_623218391 — the
    // custom transform wins (step 3 runs first), stored column is dropped
    val out = CleanColumns(df, "FlatConnect.module1_v2_JP")
    assert(out.columns.map(_.toLowerCase).distinct.length == out.columns.length)
    assert(out.columns.count(_.equalsIgnoreCase("d_317093647_d_623218391")) == 1)
  }

  test("impure variables are dropped; forbidden names are dropped") {
    val df = surveyDf(
      Seq("Connect_ID", "D_907590067_4_4_SIBCANC3X_D_650332509_4", "token", "d_111111111"),
      Seq(Seq("c1", "x", "t", "ok")))
    val out = CleanColumns(df)
    assert(out.columns.toSeq == Seq("Connect_ID", "d_111111111"))
  }
}
