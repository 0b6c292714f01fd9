package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.AsOf

/** As-of join semantics pins: inclusive match at equal timestamps,
  * NULL when no right row precedes, strict key isolation, latest-wins. */
class AsOfSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of picks latest right row at-or-before each left row, per key") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"),
      (1L, ts("2024-01-01 12:00:00"), "l2"),
      (1L, ts("2024-01-01 08:00:00"), "l0"), // before any right row
      (2L, ts("2024-01-01 11:00:00"), "l3")  // other key
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), "r9"),
      (1L, ts("2024-01-01 10:00:00"), "r10"), // equal ts -> inclusive
      (1L, ts("2024-01-01 11:30:00"), "r1130"),
      (3L, ts("2024-01-01 00:00:00"), "other-key")
    ).toDF("k", "rt", "rv")
    val out = AsOf.asOfJoin(left, right, "k", "t", "rt", Seq("rv"))
      .collect().map(r => (r.getAs[String]("lv"), r.getAs[String]("rv"))).toMap
    assert(out("l0") == null)      // nothing at-or-before 08:00
    assert(out("l1") == "r10")     // equal timestamp matches (inclusive)
    assert(out("l2") == "r1130")   // latest preceding, not first
    assert(out("l3") == null)      // key 2 never sees key 1/3 rows
  }

  test("carried columns all come from the SAME latest right row (no null resurrection)") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "l")).toDF("k", "t", "lv")
    // latest right row has a NULL in `b`; that NULL must NOT be replaced
    // by the older row's b="old-b"
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), Option("old-a"), Option("old-b")),
      (1L, ts("2024-01-01 11:00:00"), Option("new-a"), Option.empty[String])
    ).toDF("k", "rt", "a", "b")
    val row = AsOf.asOfJoin(left, right, "k", "t", "rt", Seq("a", "b")).head()
    assert(row.getAs[String]("a") == "new-a")
    assert(row.getAs[String]("b") == null)
  }

  test("equal-(key,ts) right rows resolve by the tie-break, deterministically") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "l")).toDF("k", "t", "lv")
    val right = Seq(
      (1L, ts("2024-01-01 11:00:00"), 1L, "first"),
      (1L, ts("2024-01-01 11:00:00"), 2L, "second")
    ).toDF("k", "rt", "seq", "rv")
    val row = AsOf.asOfJoin(left, right, "k", "t", "rt", Seq("seq", "rv"),
      rightTieBreak = Seq("seq")).head()
    assert(row.getAs[Long]("seq") == 2L) // greatest tie-break wins
    assert(row.getAs[String]("rv") == "second")
  }

  test("native plan-node as-of equals the composed formulation on real data") {
    graft.functions.GraftExtensions.register(spark)
    val e = queries.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val snapshots = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts").as("snap_ts"))
      .agg(max(col("event_id")).as("snap_id"))
    val native = AsOf.asOfJoinNative(purchases, snapshots,
        "user_id", "ts", "snap_ts", Seq("snap_id"))
      .select("event_id", "snap_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).sorted
    val composed = AsOf.asOfJoin(purchases, snapshots,
        "user_id", "ts", "snap_ts", Seq("snap_id"))
      .select("event_id", "snap_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).sorted
    assert(native.nonEmpty && native.sameElements(composed))
  }

  test("native as-of plans through AsOfJoinExec with one exchange+sort per side") {
    graft.functions.GraftExtensions.register(spark)
    val s = spark
    import s.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "l")).toDF("k", "t", "lv")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), "r")).toDF("k", "rt", "rv")
    val df = AsOf.asOfJoinNative(left, right, "k", "t", "rt", Seq("rv"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(df.head().getAs[String]("rv") == "r")
  }

  test("tolerance as-of nulls stale matches but keeps fresh ones") {
    graft.functions.GraftExtensions.register(spark)
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, ts("2024-01-10 00:00:00"), "fresh"), // 1 day after snapshot
      (2L, ts("2024-01-10 00:00:00"), "stale")  // 8 days after snapshot
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, ts("2024-01-09 00:00:00"), 100L),
      (2L, ts("2024-01-02 00:00:00"), 200L)
    ).toDF("k", "rt", "rv")
    val out = AsOf.asOfJoinTolerance(left, right, "k", "t", "rt", Seq("rv"),
        toleranceSeconds = 3L * 86400)
      .collect().map(r => r.getAs[String]("lv") ->
        (if (r.isNullAt(r.fieldIndex("rv"))) -1L else r.getAs[Long]("rv"))).toMap
    assert(out("fresh") == 100L && out("stale") == -1L)
  }

  test("left columns and row count are preserved exactly") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 42.0)).toDF("k", "t", "payload")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), "x")).toDF("k", "rt", "rv")
    val out = AsOf.asOfJoin(left, right, "k", "t", "rt", Seq("rv"))
    assert(out.columns.toSeq == Seq("k", "t", "payload", "rv"))
    assert(out.count() == 1)
    assert(out.head().getDouble(2) == 42.0)
  }
}
