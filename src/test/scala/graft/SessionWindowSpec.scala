package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.queries.Tables

/** Pins for the native `session_window` operator: the exact merge
  * boundary (what the `q_session_window_native` oracle's lag algebra
  * encodes) and value-level equality with the hand-rolled lag/flag
  * sessionization on real data. */
class SessionWindowSpec extends SparkSpec {

  private def sessionsOf(us: Seq[Long]): Long = {
    val s = spark
    import s.implicits._
    us.toDF("us").select(timestamp_micros(col("us")).as("ts"))
      .groupBy(session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1))).count()
  }

  test("session_window merge boundary: gap == 30min merges, 1µs over splits") {
    val base = 1700000000000000L
    val gapUs = 1800L * 1000000L
    // adjacent ranges merge: new session iff diff > gap — exactly the
    // lag formulation's `> 1800s` predicate at µs precision
    assert(sessionsOf(Seq(base, base + gapUs)) == 1, "exact-gap events must merge")
    assert(sessionsOf(Seq(base, base + gapUs - 1)) == 1, "under-gap events must merge")
    assert(sessionsOf(Seq(base, base + gapUs + 1)) == 2, "over-gap events must split")
  }

  test("native session_window == lag/flag sessionization on events (sf0.001)") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("user_id") % 10 === 0)
    val native = e
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).as("total_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("total_value"))
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val lagged = e
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_s",
        when(unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1).otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(
        byUser.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"),
        sum(col("value").cast(DecimalType(18, 4))).as("total_value"))
      .select(col("user_id"), col("session_start"), col("n_events"), col("total_value"))
    val a = native.collect().map(r => (r.getLong(0), r.getTimestamp(1),
      r.getLong(2), r.getDecimal(3))).toSet
    val b = lagged.collect().map(r => (r.getLong(0), r.getTimestamp(1),
      r.getLong(2), r.getDecimal(3))).toSet
    assert(a == b, s"native ${a.size} sessions != lag-based ${b.size}")
    assert(a.nonEmpty)
  }
}
