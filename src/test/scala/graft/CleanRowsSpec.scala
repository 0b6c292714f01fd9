package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.profiling.Profiler
import graft.transform.CleanRows

/** FIXTURES.md §S3: binary detection/recode and false-array unwrap. */
class CleanRowsSpec extends SparkSpec {

  private def df(cols: Seq[String], rows: Seq[Seq[String]]) = {
    val schema = StructType(cols.map(c => StructField(c, StringType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.map(Row.fromSeq), 2), schema)
  }

  test("binary detection: all-binary yes, mostly-binary no") {
    val d = df(
      Seq("Connect_ID", "allbin", "mostly", "withempty"),
      Seq(
        Seq("c1", "0", "0", "1"),
        Seq("c2", "1", "2", ""),
        Seq("c3", null, "1", null)))
    val bins = Profiler.binaryColumns(d)
    // Connect_ID values are not in {0,1} so it is not binary here
    assert(bins.toSet == Set("allbin", "withempty"))
  }

  test("false-array reference matching (FIXTURES S3)") {
    val cols = Seq("Connect_ID", "d_578895128_d_578895128",
      "d_578895128_d_578895128_19", "d_578895128_d_578895128_1_1",
      "d_578895128_d_578895128_x", "d_999999999_d_999999999")
    val got = Profiler.falseArrayColumnsFromReference(cols)
    assert(got == Seq("d_578895128_d_578895128",
      "d_578895128_d_578895128_19", "d_578895128_d_578895128_1_1"))
  }

  test("false-array computational detection") {
    val d = df(
      Seq("Connect_ID", "fa", "notfa", "allnull"),
      Seq(
        Seq("c1", "[]", "[]", null),
        Seq("c2", "[178420302]", "hello", null),
        Seq("c3", null, "[178420302]", null)))
    val got = Profiler.falseArrayColumnsComputational(d)
    assert(got == Seq("fa")) // notfa has a non-false-array value; allnull fails check 1
  }

  test("clean_rows end-to-end: recode + unwrap + passthrough, sorted groups") {
    val d = df(
      Seq("Connect_ID", "zbin", "d_578895128_d_578895128", "other"),
      Seq(
        Seq("c1", "1", "[]", "keep"),
        Seq("c2", "0", "[123456789]", "x"),
        Seq("c3", null, null, "y"),
        Seq("c4", "", "[999]", "z")))
    val out = CleanRows(d)
    // column order: binary sorted, false-array sorted, passthrough sorted
    assert(out.columns.toSeq == Seq("zbin", "d_578895128_d_578895128", "Connect_ID", "other"))
    val byId = out.collect().map(r => r.getString(2) -> r).toMap
    assert(byId("c1").getString(0) == "353358909") // 1 -> Yes CID
    assert(byId("c2").getString(0) == "104430631") // 0 -> No CID
    assert(byId("c3").getString(0) == null)
    assert(byId("c4").getString(0) == null)        // "" -> NULL
    assert(byId("c1").getString(1) == null)        // [] -> NULL
    assert(byId("c2").getString(1) == "123456789") // unwrapped
    assert(byId("c3").getString(1) == null)
    assert(byId("c4").getString(1) == null)        // non-matching -> default NULL
  }
}
