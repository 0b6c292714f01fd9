package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

/** Binned range join: exact point-in-interval semantics, robustness to
  * column-name collisions between the two sides. */
class RangeJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("point-in-interval matches exactly the BETWEEN pairs") {
    val s = spark
    import s.implicits._
    val points = Seq(
      (1L, 10L, ts("2024-01-01 10:30:00")),
      (1L, 11L, ts("2024-01-01 13:00:00")), // outside any interval
      (2L, 12L, ts("2024-01-01 10:30:00"))  // other key, same instant
    ).toDF("k", "pid", "pt")
    val intervals = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (2L, 200L, ts("2024-01-01 09:00:00"), ts("2024-01-01 10:29:00"))
    ).toDF("k", "iid", "st", "en")
    val got = RangeJoin.pointInInterval(points, intervals, "k", "pt", "st", "en", 600)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 100L))) // pid 11 out of range, pid 12 interval ended
  }

  test("right side sharing non-key column names with the left still resolves") {
    val s = spark
    import s.implicits._
    // both sides have a `ts` column AND a pre-existing __bin0 column —
    // the helper bin name must not clobber it and the filter must not hit
    // an ambiguous-reference error
    val points = Seq((1L, 5L, ts("2024-01-01 10:30:00"), "p-noise"))
      .toDF("k", "pid", "ts", "__bin0")
    val intervals = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "i-noise"))
      .toDF("k", "iid", "ts", "en", "__bin0")
    val out = RangeJoin.pointInInterval(points, intervals, "k", "ts", "ts", "en", 600)
    assert(out.count() == 1)
    // caller columns (including the colliding ones) pass through untouched
    assert(out.columns.count(_ == "__bin0") == 2)
    assert(out.select(col("pid")).head().getLong(0) == 5L)
  }
}
