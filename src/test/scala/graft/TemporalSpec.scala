package graft

import org.apache.spark.sql.functions._

/** Independent-reimplementation pins for the temporal operators: each
  * query's sf0.001 result is recomputed driver-side from the raw events
  * with a straight-line sequential algorithm (no Spark, no SQL) — a
  * third implementation alongside the distributed plan and the DuckDB
  * oracle, catching any error the two relational forms might share. */
class TemporalSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def events(): Array[(Long, Long, Long)] = // (ts_us, event_id, v_cents)
    graft.queries.Tables.events(spark, sfDir)
      .select(expr("unix_micros(ts)"), col("event_id"),
        expr("cast(round(value * 100) as bigint)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("q_max_concurrency equals a sequential sweep-line on the raw events") {
    val winUs = 900000000L
    val dayUs = 86400000000L
    val pts = events().flatMap { case (ts, _, _) =>
      val eday = ts / dayUs // ts >= 0 in the corpus
      val end = math.min(ts + winUs, (eday + 1) * dayUs)
      Seq((eday, ts, 1), (eday, end, -1))
    }
    val expected = pts.groupBy(_._1).map { case (eday, ps) =>
      var open = 0; var peak = 0
      // ends sort before starts at the same instant (half-open policy)
      ps.sortBy(p => (p._2, p._3)).foreach { p => open += p._3; peak = math.max(peak, open) }
      (eday, ps.count(_._3 == 1).toLong, peak.toLong)
    }
    val got = graft.queries.TemporalQueries.qMaxConcurrency
      .build(spark, sfDir).collect()
      .map(r => (java.time.LocalDate.parse(r.getString(0)).toEpochDay,
        r.getLong(1), r.getLong(2))).toSeq
    assert(got.sortBy(_._1) == expected.toSeq.sortBy(_._1))
  }

  test("q_ewma equals a sequential dyadic EWMA per user") {
    val byUser = graft.queries.Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_id"),
        expr("cast(round(value * 100) as bigint)"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1)
    val expected = byUser.map { case (uid, rows) =>
      val ordered = rows.map(_._2).sortBy(t => (t._1, t._2)) // ts, event_id asc
      val last16 = ordered.takeRight(16).reverse // newest first
      val num = last16.zipWithIndex.map { case ((_, _, v), i) => v * (1L << (15 - i)) }.sum
      val den = last16.zipWithIndex.map { case (_, i) => 1L << (15 - i) }.sum
      (uid, (ordered.length.toLong, ordered.last._3, num, den, num * 100 / den))
    }
    val got = graft.queries.TemporalQueries.qEwma.build(spark, sfDir).collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got == expected, "distributed EWMA != sequential recompute")
    // and the streaming twin lands on the same table
    val gotStream = graft.queries.StreamingQueries.streamEwma
      .build(spark, sfDir).collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(gotStream == expected, "streaming EWMA != sequential recompute")
  }

  test("q_percentile_cont matches Spark's own percentile_cont built-in") {
    val got = graft.queries.RelationalQueries.qPercentileCont
      .build(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2).toDouble / 400.0))
      .toMap
    val builtin = graft.queries.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("g"),
        expr("cast(round(l_quantity * 100) as bigint) / 100.0").as("v"))
      .groupBy(col("g"))
      .agg(expr("percentile_cont(0.25) within group (order by v)").as("p1"),
        expr("percentile_cont(0.5) within group (order by v)").as("p2"),
        expr("percentile_cont(0.75) within group (order by v)").as("p3"))
      .collect()
      .flatMap(r => Seq(((r.getString(0), 1), r.getDouble(1)),
        ((r.getString(0), 2), r.getDouble(2)),
        ((r.getString(0), 3), r.getDouble(3)))).toMap
    assert(got.keySet == builtin.keySet)
    for ((k, v) <- got)
      assert(math.abs(v - builtin(k)) < 1e-9,
        s"$k: exact $v vs builtin ${builtin(k)}")
  }

  test("q_seasonal_decompose equals a sequential centered-MA decomposition") {
    val dayUs = 86400000000L
    val byTypeDay = graft.queries.Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts)"))
      .collect().map(r => (r.getString(0), r.getLong(1) / dayUs))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = byTypeDay.keys.map(_._1).toSeq.distinct.flatMap { et =>
      val series = byTypeDay.collect { case ((t, d), c) if t == et => (d, c) }
        .toSeq.sortBy(_._1)
      series.indices.flatMap { i =>
        if (i < 3 || i >= series.length - 3) None
        else {
          val frame = series.slice(i - 3, i + 4)
          if (frame.last._1 - frame.head._1 != 6) None
          else Some(((et, (series(i)._1 + 4) % 7),
            7L * series(i)._2 - frame.map(_._2).sum))
        }
      }
    }.groupBy(_._1).map { case (k, vs) => (k, (vs.length.toLong, vs.map(_._2).sum)) }
    val got = graft.queries.TemporalQueries.qSeasonalDecompose
      .build(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.get(1).toString.toLong),
        (r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected, "distributed decomposition != sequential recompute")
  }
}
