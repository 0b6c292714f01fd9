package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.ops.{Similarity, TextOps}

/** Second-ring engine surface: semi-structured (JSON) access, lateral
  * row generation, grouping sets/cube, the full window-navigation
  * battery, array/vector column functions, and tf-idf term ranking.
  * Every query has a value-level DuckDB oracle; numeric outputs follow
  * the repo-wide parity rules (exact DECIMAL internally, DOUBLE at the
  * output boundary, BIGINT ranks).
  *
  * Scale notes: JSON extraction and array functions are row-local
  * (codegen'd, fuse with the scan); explode fans out before any shuffle
  * so downstream aggregation still map-side combines; grouping sets /
  * cube expand in the partial-aggregation stage (no extra scan per
  * grouping set); tf-idf is two hash aggregations + one broadcast of the
  * corpus-size scalar — document frequency is the only wide shuffle.
  */
object ExtendedQueries {

  private val money = DecimalType(18, 2)

  /** JSON field extraction from the events property bag (semi-structured
    * column access — stays inside whole-stage codegen, no UDF). */
  val qJsonFuncs: QueryDef = QueryDef(
    "q_json_funcs",
    (s, d) => Tables.events(s, d)
      .filter(col("event_id") % 100 === 0)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        (get_json_object(col("props"), "$.k").cast("long") / lit(10)).cast("long").as("k_decile"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_decile
      |FROM events WHERE event_id % 100 = 0 ORDER BY event_id""".stripMargin))

  /** Lateral row generation: densify each order into one row per month
    * of its first quarter (sequence + explode — the calendar-spine shape
    * of gap-filling pipelines). */
  val qExplodeMonths: QueryDef = QueryDef(
    "q_explode_months",
    (s, d) => Tables.orders(s, d)
      .filter(col("o_orderkey") % 500 === 0)
      .select(col("o_orderkey"), explode(expr(
        "sequence(date_trunc('month', o_orderdate), " +
          "date_trunc('month', o_orderdate) + interval 2 month, interval 1 month)")).as("m"))
      .select(col("o_orderkey"), date_format(col("m"), "yyyy-MM").as("month"))
      .orderBy("o_orderkey", "month"),
    Some("""SELECT o_orderkey,
      |  strftime(unnest(generate_series(date_trunc('month', o_orderdate),
      |    date_trunc('month', o_orderdate) + INTERVAL 2 MONTH, INTERVAL 1 MONTH)), '%Y-%m') AS month
      |FROM orders WHERE o_orderkey % 500 = 0 ORDER BY o_orderkey, month""".stripMargin))

  /** Explicit grouping sets — subtotal lattice chosen by the caller
    * (finer control than rollup/cube; one pass, expansion happens in the
    * partial aggregate). */
  val qGroupingSets: QueryDef = QueryDef(
    "q_grouping_sets",
    (s, d) => Tables.orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
          Seq(col("o_orderpriority")), Seq()),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(money)).cast("double").as("total"))
      .orderBy(col("o_orderpriority").asc_nulls_first, col("o_orderstatus").asc_nulls_first),
    Some("""SELECT o_orderpriority, o_orderstatus, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin))

  // q_cube moved to RelationalQueries (the richer count+total twin of
  // q_rollup); the count-only variant that used to live here shadowed
  // it in the registry map and is gone.

  /** Window navigation battery: lag/lead/first/last/ntile in one pass
    * over each customer's order history (one shuffle on the partition
    * key; all five functions share the sort). */
  val qWindowLeadLag: QueryDef = QueryDef(
    "q_window_lead_lag",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val price = col("o_totalprice").cast(money).cast("double")
      Tables.orders(s, d)
        .filter(col("o_custkey") % 200 === 0)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(price, 1).over(w).as("prev_price"),
          lead(price, 1).over(w).as("next_price"),
          first(price).over(wFull).as("first_price"),
          last(price).over(wFull).as("last_price"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
      |  lag(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 1) OVER w AS prev_price,
      |  lead(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 1) OVER w AS next_price,
      |  first_value(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)) OVER wf AS first_price,
      |  last_value(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)) OVER wf AS last_price,
      |  ntile(4) OVER w AS quartile
      |FROM orders WHERE o_custkey % 200 = 0
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
      |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin))

  /** Array/vector column functions over embeddings: length, element
    * access, min/max, and a full-vector sum via the codegen'd dot product
    * against a ones vector (sequential double accumulation — the same
    * order DuckDB's list_dot_product uses, so values are bit-identical). */
  val qArrayFuncs: QueryDef = QueryDef(
    "q_array_funcs",
    (s, d) => Tables.embeddings(s, d)
      .filter(col("vec_id") % 25 === 0)
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("n_dims"),
        element_at(col("embedding"), 1).cast("double").as("first_val"),
        array_max(col("embedding")).cast("double").as("max_val"),
        array_min(col("embedding")).cast("double").as("min_val"),
        round(Similarity.dot(col("embedding"), typedLit(Seq.fill(64)(1.0f))), 4).as("sum_val"))
      .orderBy("vec_id"),
    Some("""SELECT vec_id,
      |  CAST(len(embedding) AS BIGINT) AS n_dims,
      |  CAST(embedding[1] AS DOUBLE) AS first_val,
      |  CAST(list_max(embedding) AS DOUBLE) AS max_val,
      |  CAST(list_min(embedding) AS DOUBLE) AS min_val,
      |  round(list_dot_product(CAST(embedding AS DOUBLE[]), [1.0 for x in range(64)]), 4) AS sum_val
      |FROM embeddings WHERE vec_id % 25 = 0 ORDER BY vec_id""".stripMargin))

  /** tf-idf term ranking: top-3 terms per document by tf * (N / df),
    * computed in exact DECIMAL (a log-free idf variant — both engines
    * agree digit-for-digit, where ln() parity across engines is not
    * guaranteed to the last ulp). df is the only corpus-wide shuffle;
    * the corpus size N broadcasts as a one-row scalar. */
  val textTfidf: QueryDef = QueryDef(
    "text_tfidf",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val w = docs.select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
      val tf = w.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      val dfreq = w.select(col("doc_id"), col("w")).distinct()
        .groupBy(col("w")).agg(count(lit(1)).as("df"))
      val n = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
      val ratio = DecimalType(18, 6)
      val scored = tf.filter(col("doc_id") % 20 === 0)
        .join(dfreq, "w").crossJoin(broadcast(n))
        .withColumn("score",
          ((col("tf") * col("n_docs")).cast(ratio) / col("df").cast(ratio)).cast(ratio))
      val win = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("w").asc)
      scored.withColumn("rk", row_number().over(win).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("w").as("term"),
          col("score").cast("double").as("score"))
        .orderBy("doc_id", "rk")
    },
    Some {
      val normalizeSql =
        "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
      s"""WITH w AS (
        |  SELECT doc_id, unnest(string_split($normalizeSql, ' ')) AS w FROM documents),
        |ww AS (SELECT * FROM w WHERE length(w) > 0),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM ww GROUP BY 1, 2),
        |dfreq AS (SELECT w, count(DISTINCT doc_id) AS df FROM ww GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, tf.w,
        |    CAST(CAST(tf * n_docs AS DECIMAL(18,6)) / CAST(df AS DECIMAL(18,6)) AS DECIMAL(18,6)) AS score
        |  FROM tf JOIN dfreq USING (w), n WHERE doc_id % 20 = 0),
        |ranked AS (
        |  SELECT doc_id, w, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w ASC) AS rk
        |  FROM scored)
        |SELECT doc_id, rk, w AS term, CAST(score AS DOUBLE) AS score
        |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin
    })

  /** Unpivot / melt: wide numeric columns to (metric, value) rows — the
    * inverse of q_pivot; row-local, no shuffle beyond the output sort. */
  val qUnpivot: QueryDef = QueryDef(
    "q_unpivot",
    (s, d) => {
      val money2 = (c: String) => col(c).cast(money).cast("double").as(c)
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 500 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          money2("l_quantity"), money2("l_extendedprice"),
          money2("l_discount"), money2("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric")
    },
    Some("""SELECT l_orderkey, l_linenumber, metric, value FROM (
      |  SELECT l_orderkey, l_linenumber,
      |    CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS l_quantity,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS l_extendedprice,
      |    CAST(CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) AS l_discount,
      |    CAST(CAST(l_tax AS DECIMAL(18,2)) AS DOUBLE) AS l_tax
      |  FROM lineitem WHERE l_orderkey % 500 = 0)
      |UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount, l_tax))
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin))

  /** Multiset set operations (INTERSECT ALL / EXCEPT ALL — duplicate-
    * preserving, distinct from q_set_ops' set semantics). */
  val qSetOpsAll: QueryDef = QueryDef(
    "q_set_ops_all",
    (s, d) => {
      val o = Tables.orders(s, d)
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
      val big = o.filter(col("o_totalprice") > 300000.0).select(col("o_custkey"))
      val interAll = urgent.intersectAll(big).count()
      val exceptAll = urgent.exceptAll(big).count()
      s.createDataFrame(Seq((interAll, exceptAll)))
        .toDF("n_intersect_all", "n_except_all")
    },
    Some("""SELECT
      |  (SELECT count(*) FROM (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |    INTERSECT ALL SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0) a) AS n_intersect_all,
      |  (SELECT count(*) FROM (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |    EXCEPT ALL SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0) b) AS n_except_all""".stripMargin))

  /** PII redaction over documents: scrub synthetic emails/phone numbers
    * (regex patterns valid in both Java regex and RE2), emit the
    * redaction count and an md5 of the scrubbed text — the privacy-
    * filtering stage of a training-data pipeline, row-local and
    * codegen'd. The corpus has no natural PII, so deterministic PII is
    * first appended to every 5th document — same synthesis in the
    * oracle. */
  val textRedact: QueryDef = QueryDef(
    "text_redact",
    (s, d) => {
      val withPii = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or 555-"), col("doc_id")))
          .otherwise(col("text")).as("text"))
      val emailPat = "[a-z0-9.]+@[a-z0-9.]+[a-z]"
      val phonePat = "[0-9]{3}-[0-9]+"
      withPii.select(col("doc_id"),
        (regexp_count(col("text"), lit(emailPat)) +
          regexp_count(col("text"), lit(phonePat))).cast("long").as("n_redactions"),
        md5(regexp_replace(regexp_replace(col("text"), emailPat, "[EMAIL]"),
          phonePat, "[PHONE]")).as("redacted_fp"))
        .orderBy("doc_id")
    },
    Some("""WITH withpii AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0
      |      THEN text || ' contact user' || doc_id || '@example.com or 555-' || doc_id
      |      ELSE text END AS text
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+[a-z]'))
      |    + len(regexp_extract_all(text, '[0-9]{3}-[0-9]+')) AS BIGINT) AS n_redactions,
      |  md5(regexp_replace(regexp_replace(text, '[a-z0-9.]+@[a-z0-9.]+[a-z]', '[EMAIL]', 'g'),
      |    '[0-9]{3}-[0-9]+', '[PHONE]', 'g')) AS redacted_fp
      |FROM withpii ORDER BY doc_id""".stripMargin))

  /** Arg-min/arg-max aggregation: the order id attaining the extreme
    * total price per priority. Ties are broken deterministically by
    * encoding (price, orderkey) as one zero-padded composite sort key —
    * DuckDB's arg_max and Spark's max_by then agree on the same row. */
  val qArgMinmax: QueryDef = QueryDef(
    "q_arg_minmax",
    (s, d) => {
      val key = concat(
        lpad(col("o_totalprice").cast(money).cast("string"), 21, "0"),
        lit("#"), lpad(col("o_orderkey").cast("string"), 12, "0"))
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(max_by(col("o_orderkey"), key).as("best_order"),
          min_by(col("o_orderkey"), key).as("worst_order"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
      |  arg_max(o_orderkey, lpad(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 21, '0')
      |    || '#' || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')) AS best_order,
      |  arg_min(o_orderkey, lpad(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 21, '0')
      |    || '#' || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')) AS worst_order,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** Ordered list/string aggregation: per-customer order list — Spark
    * sorts the collected list explicitly (collect_list order is
    * partition-dependent), the oracle uses string_agg ORDER BY. */
  val qStringAgg: QueryDef = QueryDef(
    "q_string_agg",
    (s, d) => Tables.orders(s, d)
      .filter(col("o_custkey") % 500 === 0)
      .groupBy(col("o_custkey"))
      .agg(concat_ws(",",
          array_sort(collect_list(col("o_orderkey").cast("string")))).as("order_keys"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey"),
    Some("""SELECT o_custkey,
      |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY CAST(o_orderkey AS VARCHAR)) AS order_keys,
      |  count(*) AS n_orders
      |FROM orders WHERE o_custkey % 500 = 0
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin))

  /** ANSI-safe scalar functions: try_cast swallows malformed input,
    * try_divide yields NULL on zero denominators — the error-tolerant
    * layer a pipeline over dirty data needs (both engines agree NULL,
    * not exception). */
  val qTryFuncs: QueryDef = QueryDef(
    "q_try_funcs",
    (s, d) => Tables.orders(s, d)
      .filter(col("o_orderkey") % 500 === 0)
      .select(col("o_orderkey"),
        expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("prio_num"),
        expr("try_cast(o_orderpriority AS INT)").as("bad_num"),
        try_divide(col("o_totalprice"), col("o_custkey") % 3).as("ratio"),
        expr("try_cast('2024-02-30' AS DATE)").as("bad_date"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
      |  TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
      |  TRY_CAST(o_orderpriority AS INTEGER) AS bad_num,
      |  o_totalprice / nullif(o_custkey % 3, 0) AS ratio,
      |  TRY_CAST('2024-02-30' AS DATE) AS bad_date
      |FROM orders WHERE o_orderkey % 500 = 0 ORDER BY o_orderkey""".stripMargin))

  /** Rank-statistics window battery: rank / dense_rank / percent_rank /
    * cume_dist in one pass (complements q_window_lead_lag's navigation
    * functions; fully tie-broken ordering keeps every rank stable). */
  val qWindowRankStats: QueryDef = QueryDef(
    "q_window_rank_stats",
    (s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 200 === 0)
        .select(col("o_orderpriority"), col("o_orderkey"),
          rank().over(w).cast("long").as("rk"),
          dense_rank().over(w).cast("long").as("drk"),
          round(percent_rank().over(w), 6).as("prk"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy("o_orderpriority", "rk")
    },
    Some("""SELECT o_orderpriority, o_orderkey,
      |  rank() OVER w AS rk,
      |  dense_rank() OVER w AS drk,
      |  round(percent_rank() OVER w, 6) AS prk,
      |  round(cume_dist() OVER w, 6) AS cd
      |FROM orders WHERE o_orderkey % 200 = 0
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
      |ORDER BY o_orderpriority, rk""".stripMargin))

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    * match each other — still plans as a hash join on the null-safe key,
    * unlike an OR-of-IS-NULL predicate which would degrade to a loop
    * join. */
  val qNullSafeJoin: QueryDef = QueryDef(
    "q_null_safe_join",
    (s, d) => {
      val a = Tables.orders(s, d)
        .select(nullif(col("o_custkey") % 7, lit(3)).as("k"), col("o_orderkey"))
      val b = Tables.customer(s, d)
        .filter(col("c_custkey") % 100 === 0)
        .select(nullif(col("c_custkey") % 7, lit(3)).as("k"), col("c_custkey"))
      a.join(b, a("k") <=> b("k"))
        .groupBy(a("k").as("k"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("c_custkey")).as("n_cust"))
        .orderBy(col("k").asc_nulls_first)
    },
    Some("""WITH a AS (SELECT nullif(o_custkey % 7, 3) AS k, o_orderkey FROM orders),
      |b AS (SELECT nullif(c_custkey % 7, 3) AS k, c_custkey FROM customer
      |      WHERE c_custkey % 100 = 0)
      |SELECT a.k, count(*) AS n_pairs, count(DISTINCT c_custkey) AS n_cust
      |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
      |GROUP BY a.k ORDER BY a.k ASC NULLS FIRST""".stripMargin))

  /** Map-typed column functions: construction, scalar extraction, key
    * set, membership — output is derived scalars (map VALUES round-trip
    * differently through parquet across engines; the scalars don't). */
  val qMapFuncs: QueryDef = QueryDef(
    "q_map_funcs",
    (s, d) => Tables.events(s, d)
      .filter(col("event_id") % 200 === 0)
      .withColumn("m", map(lit("type"), col("event_type"),
        lit("uid"), col("user_id").cast("string")))
      .select(col("event_id"),
        element_at(col("m"), "type").as("tval"),
        size(col("m")).cast("long").as("m_size"),
        concat_ws(",", array_sort(map_keys(col("m")))).as("m_keys"),
        map_contains_key(col("m"), "uid").as("has_uid"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
      |  m['type'][1] AS tval,
      |  CAST(cardinality(m) AS BIGINT) AS m_size,
      |  array_to_string(list_sort(map_keys(m)), ',') AS m_keys,
      |  list_contains(map_keys(m), 'uid') AS has_uid
      |FROM (SELECT event_id,
      |        MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)} AS m
      |      FROM events WHERE event_id % 200 = 0) t
      |ORDER BY event_id""".stripMargin))

  /** explode_outer / outer lateral: empty arrays keep their parent row
    * (as a NULL element) instead of dropping it — the left-join flavor
    * of row generation. */
  val qExplodeOuter: QueryDef = QueryDef(
    "q_explode_outer",
    (s, d) => Tables.orders(s, d)
      .filter(col("o_orderkey") % 1000 === 0)
      .withColumn("parts",
        when(col("o_orderkey") % 3000 === 0, array().cast("array<string>"))
          .otherwise(split(col("o_orderpriority"), "-")))
      .select(col("o_orderkey"), explode_outer(col("parts")).as("part"))
      .orderBy(col("o_orderkey"), col("part").asc_nulls_last),
    Some("""SELECT o_orderkey,
      |  unnest(CASE WHEN len(parts) = 0 THEN [NULL] ELSE parts END) AS part
      |FROM (SELECT o_orderkey,
      |        CASE WHEN o_orderkey % 3000 = 0 THEN CAST([] AS VARCHAR[])
      |             ELSE string_split(o_orderpriority, '-') END AS parts
      |      FROM orders WHERE o_orderkey % 1000 = 0) t
      |ORDER BY o_orderkey, part ASC NULLS LAST""".stripMargin))

  /** Distribution-position window battery: ntile quartiles, percent_rank,
    * cume_dist over a unique (price desc, key asc) order — the ranks are
    * integer ratios recomputed with one IEEE division each, so the doubles
    * match across engines. */
  val qWindowNtile: QueryDef = QueryDef(
    "q_window_ntile",
    (s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("price").desc, col("o_orderkey").asc)
      Tables.orders(s, d).filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice").cast(money).cast("double").as("price"))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("pct_rank", round(percent_rank().over(w), 6))
        .withColumn("cume", round(cume_dist().over(w), 6))
        .orderBy("o_orderpriority", "o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderpriority,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume
      |FROM orders WHERE o_orderkey % 100 = 0
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) DESC,
      |                      o_orderkey ASC)
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin))

  /** LAST-TOUCH ATTRIBUTION: each purchase attributed to the user's most
    * recent preceding click's channel (derived from the click's JSON
    * props), revenue rolled up per channel — the marketing-analytics
    * sequence query. One user-keyed window carries the last non-null
    * channel forward (NO per-purchase as-of join: the carry is a single
    * exchange + sort, the sessionization shape); same-instant click/
    * purchase ties break click-first then event_id, spec'd identically
    * in both engines. Purchases with no preceding click attribute to
    * 'organic'. Revenue accumulates in exact DECIMAL(18,4) (the house
    * events recipe), one cast at the boundary. */
  val qAttributionLastTouch: QueryDef = QueryDef(
    "q_attribution_last_touch",
    (s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"),
          when(col("event_type") === "click",
            concat(lit("ch_"),
              (get_json_object(col("props"), "$.k").cast("long") % 4)
                .cast("string"))).as("ch"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc,
          when(col("event_type") === "click", 0).otherwise(1).asc,
          col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      ev.withColumn("attr_ch", last(col("ch"), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("attr_ch"), lit("organic")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("value").cast(DecimalType(18, 4))).cast("double")
            .as("revenue"))
        .orderBy("channel")
    },
    Some("""WITH ev AS (
      |  SELECT user_id, ts, event_id, event_type, value,
      |    CASE WHEN event_type = 'click'
      |         THEN 'ch_' || CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 4 AS VARCHAR)
      |    END AS ch
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |c AS (
      |  SELECT *,
      |    last_value(ch IGNORE NULLS) OVER (PARTITION BY user_id
      |      ORDER BY ts, CASE WHEN event_type = 'click' THEN 0 ELSE 1 END, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS attr_ch
      |  FROM ev)
      |SELECT coalesce(attr_ch, 'organic') AS channel,
      |  count(*) AS n_purchases,
      |  CAST(sum(CAST(value AS DECIMAL(18, 4))) AS DOUBLE) AS revenue
      |FROM c WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY channel""".stripMargin))

  val all: Seq[QueryDef] = Seq(qJsonFuncs, qExplodeMonths, qGroupingSets, qAttributionLastTouch,
    qWindowLeadLag, qArrayFuncs, textTfidf, qUnpivot, qSetOpsAll,
    textRedact, qArgMinmax, qStringAgg, qTryFuncs, qWindowRankStats,
    qNullSafeJoin, qMapFuncs, qExplodeOuter, qWindowNtile)
}
