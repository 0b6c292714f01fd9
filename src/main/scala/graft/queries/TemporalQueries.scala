package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over the event stream: sweep-line peak
  * concurrency, exponentially-weighted moving averages, and classical
  * seasonal decomposition — the capacity-planning / forecasting-prep
  * family (reference behavior: windowed activity analytics over event
  * logs, cf. reference test queries over `events`-shaped tables).
  *
  * Cross-engine determinism: every gate is exact integer arithmetic
  * (micros, cents, dyadic weights), never a float accumulation — the
  * same discipline as [[AnalyticsQueries.qStatsMoments]].
  */
object TemporalQueries {

  /** Sweep-line PEAK CONCURRENCY: each event opens a 15-minute activity
    * window; the query reports, per calendar day, the maximum number of
    * windows simultaneously open (windows clipped at midnight so each
    * day is self-contained). This is the capacity-planning operator —
    * "how many concurrent sessions must the fleet hold" — and the
    * sweep-line form is the scalable one: the naive formulation is an
    * O(n²) range self-join; emitting +1/-1 boundary points and taking a
    * running sum is O(n log n), and the window partitions by DAY, so at
    * 100 TB each day's points sort locally and days fill the cluster in
    * parallel (no global sort).
    *
    * Tie policy: half-open intervals — an end at t sorts BEFORE a start
    * at t (delta ascending), so touching windows never count as
    * concurrent. The day-max is invariant to the remaining tie order
    * inside an equal (pt, delta) run: within a run of +1s the prefix max
    * lands after the last one, and a run of -1s only decreases the
    * prefix, so equal-key permutation cannot change the maximum. */
  val qMaxConcurrency: QueryDef = QueryDef(
    "q_max_concurrency",
    (s, d) => {
      val winUs = 900000000L // 15 min
      val dayUs = 86400000000L
      val e = Tables.events(s, d)
        .select(expr("unix_micros(ts)").as("ts_us"),
          expr("datediff(cast(ts as date), date'1970-01-01')").as("eday"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .withColumn("day_end_us", (col("eday") + 1).cast("long") * lit(dayUs))
        .withColumn("end_us", least(col("ts_us") + lit(winUs), col("day_end_us")))
      val pts = e.select(col("day"), explode(array(
          struct(col("ts_us").as("pt"), lit(1).as("delta")),
          struct(col("end_us").as("pt"), lit(-1).as("delta")))).as("p"))
        .select(col("day"), col("p.pt"), col("p.delta"))
      val w = Window.partitionBy(col("day"))
        .orderBy(col("pt").asc, col("delta").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      pts.withColumn("open_now", sum(col("delta")).over(w))
        .groupBy(col("day"))
        .agg(sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_windows"),
          max(col("open_now")).as("peak_concurrent"))
        .orderBy("day")
    },
    Some("""WITH e AS (
      |  SELECT epoch_us(ts) AS ts_us,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS eday,
      |    strftime(ts, '%Y-%m-%d') AS day
      |  FROM events),
      |iv AS (
      |  SELECT day, ts_us,
      |    least(ts_us + 900000000,
      |          (CAST(eday AS BIGINT) + 1) * 86400000000) AS end_us
      |  FROM e),
      |pts AS (
      |  SELECT day, ts_us AS pt, 1 AS delta FROM iv
      |  UNION ALL
      |  SELECT day, end_us AS pt, -1 AS delta FROM iv),
      |sw AS (
      |  SELECT day, delta,
      |    sum(delta) OVER (PARTITION BY day ORDER BY pt ASC, delta ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open_now
      |  FROM pts)
      |SELECT day,
      |  CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_windows,
      |  CAST(max(open_now) AS BIGINT) AS peak_concurrent
      |FROM sw GROUP BY day ORDER BY day""".stripMargin))

  /** Exact EWMA (alpha = 1/2, 16-term truncation): per user, the
    * exponentially-weighted moving average of event value at the LAST
    * event, computed with dyadic integer weights 2^15..2^0 over the 16
    * most recent events — so numerator and denominator are exact longs
    * and the gate needs no float accumulation (a textbook recursive
    * EWMA over doubles is partition-order-fragile and engine-divergent;
    * truncating at 16 terms bounds the weight tail below 2^-16 of the
    * total, i.e. under float noise anyway). Shape at scale: one
    * user-keyed sort feeds all 16 lag() columns AND the row_number that
    * picks the last event (same window spec → one exchange + one sort),
    * everything inside whole-stage codegen. */
  val qEwma: QueryDef = QueryDef(
    "q_ewma",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val v = col("v_cents")
      val terms = (0 until 16).map { j =>
        val wj = 1L << (15 - j)
        val lv = lag(v, j).over(w)
        (when(lv.isNotNull, lv * lit(wj)).otherwise(lit(0L)),
         when(lv.isNotNull, lit(wj)).otherwise(lit(0L)))
      }
      val num = terms.map(_._1).reduce(_ + _)
      val den = terms.map(_._2).reduce(_ + _)
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("cast(round(value * 100) as bigint)").as("v_cents"))
        .withColumn("n_events", count(lit(1)).over(
          Window.partitionBy(col("user_id"))))
        .withColumn("num", num).withColumn("den", den)
        .withColumn("rn_desc", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ts").desc, col("event_id").desc)))
        .filter(col("rn_desc") === 1)
        .select(col("user_id"), col("n_events"),
          col("v_cents").as("last_cents"), col("num").as("ewma_num"),
          col("den").as("ewma_den"),
          expr("(num * 100) div den").as("ewma_x100"))
        .orderBy("user_id")
    },
    Some {
      val lagTerms = (0 until 16).map { j =>
        val wj = 1L << (15 - j)
        s"""lag(v_cents, $j) OVER uw AS l$j, $wj AS w$j"""
      }
      val num = (0 until 16)
        .map(j => s"CASE WHEN l$j IS NOT NULL THEN l$j * w$j ELSE 0 END")
        .mkString(" + ")
      val den = (0 until 16)
        .map(j => s"CASE WHEN l$j IS NOT NULL THEN w$j ELSE 0 END")
        .mkString(" + ")
      s"""WITH e AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS v_cents
      |  FROM events),
      |lg AS (
      |  SELECT user_id, v_cents,
      |    count(*) OVER (PARTITION BY user_id) AS n_events,
      |    ${lagTerms.mkString(",\n    ")},
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn_desc
      |  FROM e
      |  WINDOW uw AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      |fin AS (
      |  SELECT user_id, n_events, v_cents AS last_cents,
      |    $num AS ewma_num,
      |    $den AS ewma_den
      |  FROM lg WHERE rn_desc = 1)
      |SELECT user_id, CAST(n_events AS BIGINT) AS n_events, last_cents,
      |  ewma_num, ewma_den,
      |  CAST((ewma_num * 100) // ewma_den AS BIGINT) AS ewma_x100
      |FROM fin ORDER BY user_id""".stripMargin
    })

  /** Classical SEASONAL DECOMPOSITION (trend + day-of-week index) over
    * the daily event-count series, kept exact: trend is the centered
    * 7-day moving SUM (so "7 x detrended" = 7*cnt - trend_sum is an
    * exact integer, no division), computed only where the +/-3-row
    * frame is calendar-complete (7 rows AND max_day - min_day = 6 —
    * a row frame over a gappy series silently mixes weeks; the span
    * check makes the frame calendar-honest). The seasonal index per
    * (event_type, day-of-week) is reported as the exact rational
    * (sum_detr7, n_days). Day-of-week is pure epoch-day arithmetic
    * ((eday + 4) % 7, Sunday=0) — engine date-function conventions
    * (Spark 1-7 vs DuckDB 0-6) never enter the gate. Shape at scale:
    * one map-combinable count aggregation collapses the corpus to
    * types x days rows; the window and second aggregation run on that
    * tiny series. */
  val qSeasonalDecompose: QueryDef = QueryDef(
    "q_seasonal_decompose",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("datediff(cast(ts as date), date'1970-01-01')").as("eday"))
        .agg(count(lit(1)).as("cnt"))
      val f = Window.partitionBy(col("event_type")).orderBy(col("eday").asc)
        .rowsBetween(-3, 3)
      daily
        .withColumn("trend7_sum", sum(col("cnt")).over(f))
        .withColumn("n7", count(lit(1)).over(f))
        .withColumn("span", max(col("eday")).over(f) - min(col("eday")).over(f))
        .filter(col("n7") === 7 && col("span") === 6)
        .withColumn("detr7", lit(7L) * col("cnt") - col("trend7_sum"))
        .withColumn("dow", (col("eday") + 4) % 7)
        .groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n_days"), sum(col("detr7")).as("sum_detr7"))
        .orderBy("event_type", "dow")
    },
    Some("""WITH daily AS (
      |  SELECT event_type,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS eday,
      |    count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |tr AS (
      |  SELECT event_type, eday, cnt,
      |    sum(cnt) OVER fw AS trend7_sum,
      |    count(*) OVER fw AS n7,
      |    max(eday) OVER fw - min(eday) OVER fw AS span
      |  FROM daily
      |  WINDOW fw AS (PARTITION BY event_type ORDER BY eday ASC
      |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |dt AS (
      |  SELECT event_type, (eday + 4) % 7 AS dow,
      |    7 * cnt - trend7_sum AS detr7
      |  FROM tr WHERE n7 = 7 AND span = 6)
      |SELECT event_type, CAST(dow AS BIGINT) AS dow,
      |  CAST(count(*) AS BIGINT) AS n_days,
      |  CAST(sum(detr7) AS BIGINT) AS sum_detr7
      |FROM dt GROUP BY 1, 2 ORDER BY event_type, dow""".stripMargin))

  /** AUTOCORRELATION of the daily event-count series at lags 1..3 per
    * event type — the seasonality detector that decides whether
    * [[qSeasonalDecompose]]'s weekly model applies. Exact interior: with
    * S = Σx and n days, the centered term n·x_t − S is an integer, so
    * numerator Σ(n·x_t − S)(n·x_{t+k} − S) over calendar-matched pairs
    * (eday self-join on eday + k — gaps never silently shift the lag)
    * and denominator Σ(n·x_t − S)² are exact longs with the n² scale
    * cancelling in the ratio; ONE correctly-rounded double division at
    * the boundary (negative numerators never meet integer division —
    * engine div conventions differ on negatives). Shape: the corpus
    * collapses to types × days once; lags explode on that tiny series;
    * stats broadcast. */
  val qAutocorrelation: QueryDef = QueryDef(
    "q_autocorrelation",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("datediff(cast(ts as date), date'1970-01-01')").as("eday"))
        .agg(count(lit(1)).as("x"))
      val stats = daily.groupBy(col("event_type"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      val centered = daily.join(broadcast(stats), "event_type")
        .select(col("event_type"), col("eday"),
          (col("n") * col("x") - col("sx")).as("c"), col("n"))
      val den = centered.groupBy(col("event_type"))
        .agg(sum(col("c") * col("c")).as("den"), max(col("n")).as("n"))
      val spark = s
      import spark.implicits._
      val lagged = centered.select(col("event_type"), col("eday"), col("c"))
        .crossJoin(broadcast(Seq(1, 2, 3).toDF("k")))
        .alias("a")
        .join(centered.select(col("event_type"), col("eday").as("eday2"),
          col("c").as("c2")).alias("b"),
          col("a.event_type") === col("b.event_type") &&
            col("eday2") === col("eday") + col("k"))
        .groupBy(col("a.event_type").as("event_type"), col("k"))
        .agg(sum(col("c") * col("c2")).as("num"),
          count(lit(1)).as("n_pairs"))
      lagged.join(den, "event_type")
        .select(col("event_type"), col("k"), col("n_pairs"),
          round(col("num").cast("double") / col("den").cast("double"), 6)
            .as("acf"))
        .orderBy("event_type", "k")
    },
    Some("""WITH daily AS (
      |  SELECT event_type,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS eday,
      |    count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, sum(x) AS sx, count(*) AS n
      |  FROM daily GROUP BY 1),
      |c AS (
      |  SELECT daily.event_type, eday, n * x - sx AS c
      |  FROM daily JOIN stats USING (event_type)),
      |den AS (SELECT event_type, sum(c * c) AS den FROM c GROUP BY 1),
      |num AS (
      |  SELECT a.event_type, k.k, sum(a.c * b.c) AS num,
      |    count(*) AS n_pairs
      |  FROM c a
      |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS k) k
      |  JOIN c b ON a.event_type = b.event_type AND b.eday = a.eday + k.k
      |  GROUP BY 1, 2)
      |SELECT event_type, CAST(k AS INT) AS k,
      |  CAST(n_pairs AS BIGINT) AS n_pairs,
      |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf
      |FROM num JOIN den USING (event_type)
      |ORDER BY event_type, k""".stripMargin))

  val all: Seq[QueryDef] = Seq(qMaxConcurrency, qEwma, qSeasonalDecompose,
    qAutocorrelation)
}
