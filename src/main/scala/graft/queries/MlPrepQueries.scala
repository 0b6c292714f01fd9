package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Bpe, Packing, Sampling, TextOps}

/** Training-data preparation operators beyond per-document gating:
  * segment-level (line/paragraph) dedup, unigram-LM rarity scoring,
  * per-source document caps, and embedding feature normalization. Each is
  * oracle-gated; the cross-engine determinism recipes follow the house
  * rules (exact integer/DECIMAL interior, one IEEE expression at the
  * boundary, identical on both engines). */
object MlPrepQueries {

  private val normalizeSql: String =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** Segment-level dedup (CCNet/RefinedWeb/Dolma line dedup re-expressed
    * over 3-word blocks — this corpus has no newlines): any segment
    * appearing in >= 2 distinct documents is boilerplate and is struck
    * from every document; documents are reassembled from the survivors.
    * The frequent-segment set broadcasts as a hash set; the corpus never
    * shuffles (one narrow typed rewrite pass fused with the scan — see
    * [[graft.ops.TextOps.removeFrequentSegments]] for the 100 TB shape). */
  val dedupSegments: QueryDef = QueryDef(
    "dedup_segments",
    (s, d) => TextOps.removeFrequentSegments(
        Tables.documents(s, d), "doc_id", "text", k = 3, minDocs = 2)
      .orderBy("doc_id"),
    Some(s"""WITH w AS (
      |  SELECT doc_id, string_split($normalizeSql, ' ') AS w FROM documents),
      |segs AS (
      |  SELECT doc_id,
      |    [array_to_string(w[(3*i+1):(3*i+3)], ' ')
      |     for i in range(0, CAST(ceil(len(w) / 3.0) AS INT))] AS segs
      |  FROM w),
      |e AS (SELECT DISTINCT doc_id, seg
      |      FROM (SELECT doc_id, unnest(segs) AS seg FROM segs)),
      |freq AS (SELECT seg FROM e GROUP BY seg HAVING count(*) >= 2),
      |bad AS (SELECT coalesce(list(seg ORDER BY seg), []) AS bad FROM freq),
      |kept AS (
      |  SELECT doc_id, segs,
      |    list_filter(segs, x -> NOT list_contains(bad, x)) AS kept
      |  FROM segs, bad)
      |-- array_to_string([]) is NULL in DuckDB but '' in Spark's
      |-- array_join; a fully-deduped document is empty, not null
      |SELECT doc_id, coalesce(array_to_string(kept, ' '), '') AS deduped_text,
      |  CAST(len(segs) - len(kept) AS BIGINT) AS n_removed_segments
      |FROM kept ORDER BY doc_id""".stripMargin))

  /** Unigram-LM rarity scoring (the CCNet perplexity-filter shape, log
    * free): per-token scaled inverse corpus frequency, summed exactly in
    * integers per document; the mean is the single boundary division.
    * Rare-token-dense documents score high — the gate a pretraining
    * pipeline uses to drop gibberish (too high) or boilerplate (too
    * low). The vocabulary broadcast is capped at the top-20 tokens by
    * (count desc, token asc) — smaller than this corpus's 31-word
    * vocabulary, so the out-of-vocabulary singleton-rarity path is
    * exercised by the gate, not just by specs. */
  val textUnigramLm: QueryDef = QueryDef(
    "text_unigram_lm",
    (s, d) => TextOps.unigramRarityScores(Tables.documents(s, d), "doc_id", "text",
        maxVocab = 20)
      .select(col("id").as("doc_id"), col("n_toks"),
        col("sum_rarity"),
        // mean in integer 1e-4 units + ONE boundary division: round(x, 4)
        // on a double is NOT cross-engine stable (Spark rounds the
        // shortest decimal repr, DuckDB the exact binary expansion — they
        // disagree when the shortest repr lands on a half boundary, hit
        // at sf0.01 row doc_id=451)
        (expr("(sum_rarity * 10000) div n_toks").cast("double") / lit(10000.0))
          .as("mean_rarity"))
      .orderBy("doc_id"),
    Some(s"""WITH toks AS (
      |  SELECT doc_id, w
      |  FROM (SELECT doc_id, unnest(string_split($normalizeSql, ' ')) AS w
      |        FROM documents)
      |  WHERE length(w) > 0),
      |counts AS (SELECT w, count(*) AS c FROM toks GROUP BY w
      |           ORDER BY c DESC, w ASC LIMIT 20),
      |total AS (SELECT count(*) AS n_total FROM toks),
      |vocab AS (
      |  SELECT w, CAST((n_total * 1000000) // c AS BIGINT) AS r
      |  FROM counts, total),
      |scored AS (
      |  SELECT doc_id,
      |    CAST(sum(coalesce(r, n_total * 1000000)) AS BIGINT) AS sum_rarity,
      |    count(*) AS n_toks
      |  FROM toks LEFT JOIN vocab USING (w) CROSS JOIN total GROUP BY doc_id)
      |SELECT doc_id, n_toks, sum_rarity,
      |  CAST((sum_rarity * 10000) // n_toks AS DOUBLE) / 10000.0 AS mean_rarity
      |FROM scored ORDER BY doc_id""".stripMargin))

  /** Deterministic source UPSAMPLING — the APPLY side of mix
    * re-weighting (`mix_temperature` computes weights; this materializes
    * a repeated-epoch mix from them): each source's docs repeat
    * `ceil(max_source_count / source_count)` times, capped at 4 — the
    * "small domains get more epochs" rule pretraining mixes use (e.g.
    * up-sampling low-resource languages). Every repeat carries its
    * epoch index so downstream shuffling/packing can keep copies apart.
    * Plan: the per-source counts are a tiny agg broadcast back; the
    * corpus expands row-locally via `explode(sequence(...))` — no
    * shuffle of the repeated rows at all before the output sort, and
    * the expansion factor is bounded by the cap. */
  val mixUpsample: QueryDef = QueryDef(
    "mix_upsample",
    (s, d) => {
      // the synthetic corpus has equal-sized sources, which would make
      // every repeat factor 1 and the gate vacuous — skew it
      // deterministically (source number mod 3 picks a 100%/50%/33%
      // keep rate) so factors 1, 2 and 3 all materialize and the
      // replication arithmetic is actually value-gated
      // (doc_id div 20) decorrelates the keep decision from the
      // round-robin source assignment (doc_id mod 20), so no source
      // empties and all three factors materialize
      val docs = Tables.documents(s, d)
        .withColumn("srcnum", substring(col("source"), 4, 10).cast("int"))
        .filter(expr("(doc_id div 20) % (srcnum % 3 + 1) = 0"))
        .drop("srcnum")
      val counts = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_src"))
      val withMax = counts.crossJoin(
        broadcast(counts.agg(max(col("n_src")).as("n_max"))))
        .select(col("source"),
          least(ceil(col("n_max").cast("double") / col("n_src")).cast("long"),
            lit(4L)).as("n_epochs"))
      docs.join(broadcast(withMax), "source")
        .select(col("source"), col("doc_id"), col("n_epochs"),
          explode(sequence(lit(0L), col("n_epochs") - 1)).as("epoch"))
        .groupBy(col("source"), col("n_epochs"))
        .agg(count(lit(1)).as("n_rows_out"),
          countDistinct(col("doc_id")).as("n_docs"),
          countDistinct(col("epoch")).as("n_epochs_seen"))
        .orderBy("source")
    },
    Some("""WITH docs AS (
      |  SELECT * FROM documents
      |  WHERE (doc_id // 20) % (CAST(substr(source, 4) AS INT) % 3 + 1) = 0),
      |c AS (SELECT source, count(*) AS n_src FROM docs GROUP BY source),
      |m AS (SELECT max(n_src) AS n_max FROM c),
      |w AS (SELECT source,
      |    least(CAST(ceil(CAST(n_max AS DOUBLE) / n_src) AS BIGINT), 4) AS n_epochs
      |  FROM c, m)
      |SELECT d.source, w.n_epochs,
      |  count(*) * w.n_epochs AS n_rows_out,
      |  count(DISTINCT d.doc_id) AS n_docs,
      |  w.n_epochs AS n_epochs_seen
      |FROM docs d JOIN w ON d.source = w.source
      |GROUP BY d.source, w.n_epochs ORDER BY d.source""".stripMargin))

  /** Per-source document cap (domain balancing): keep the 5 largest
    * documents per source, deterministic tie-break on doc_id. The
    * row_number window triggers Spark's WindowGroupLimit rewrite — each
    * partition keeps a 5-element heap before the shuffle, so the full
    * corpus never sorts (rank-limit pushdown; pinned in PlanAuditSpec). */
  val mixDomainCap: QueryDef = QueryDef(
    "mix_domain_cap",
    (s, d) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      Tables.documents(s, d)
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 5)
        .select(col("source"), col("rk"), col("doc_id"), col("n_chars"))
        .orderBy("source", "rk")
    },
    Some("""SELECT source, rk, doc_id, n_chars
      |FROM (SELECT source, doc_id, n_chars,
      |        row_number() OVER (PARTITION BY source
      |                           ORDER BY n_chars DESC, doc_id ASC) AS rk
      |      FROM documents)
      |WHERE rk <= 5 ORDER BY source, rk""".stripMargin))

  /** Temperature-based source re-weighting (the multilingual /
    * multi-domain sampling rule p_i ∝ c_i^α, here α = 1/2): up-weights
    * small sources relative to proportional sampling when assembling a
    * training mix. Determinism recipe (cross-engine bit-match): the only
    * irrational step is `sqrt(c_i / total)` — one IEEE-exact division of
    * exact counts and one correctly-rounded sqrt — which is immediately
    * snapped to integer micro-units (`round(1e6 * …)`); normalization
    * then happens over the EXACT integer micro-weights (integer sum, one
    * final IEEE division each), so no engine-dependent double summation
    * order ever exists. α values other than 1/2 need `pow`, which IEEE
    * does not require correctly rounded — they stay engine-local.
    *
    * Plan: ONE corpus scan into a map-side-combined count per source,
    * then whole-frame windows over the #sources-row counts frame for
    * both normalization sums. The crossJoin(broadcast(agg)) formulation
    * reads better but re-expands the counts subtree at every reference —
    * four corpus scans for a 20-row result (observed in the formatted
    * plan); the window form keeps the corpus at exactly one scan, and a
    * single-partition window over per-source rows is free at any corpus
    * size. */
  val mixTemperature: QueryDef = QueryDef(
    "mix_temperature",
    (s, d) => {
      val whole = Window.partitionBy()
      Tables.documents(s, d).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("total", sum(col("n_docs")).over(whole))
        .withColumn("w_micro",
          round(sqrt(col("n_docs").cast("double") / col("total").cast("double"))
            * 1000000).cast("long"))
        .withColumn("w_total", sum(col("w_micro")).over(whole))
        .select(col("source"), col("n_docs"), col("w_micro"),
          (col("w_micro").cast("double") / col("w_total").cast("double"))
            .as("share"),
          floor(col("w_micro").cast("double") / col("w_total").cast("double")
            * 10000).cast("long").as("budget_rows"))
        .orderBy("source")
    },
    Some("""WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM c),
      |m AS (SELECT source, n_docs,
      |        CAST(round(sqrt(CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE))
      |          * 1000000) AS BIGINT) AS w_micro
      |      FROM c CROSS JOIN t),
      |mt AS (SELECT CAST(sum(w_micro) AS BIGINT) AS w_total FROM m)
      |SELECT source, n_docs, w_micro,
      |  CAST(w_micro AS DOUBLE) / CAST(w_total AS DOUBLE) AS share,
      |  CAST(floor(CAST(w_micro AS DOUBLE) / CAST(w_total AS DOUBLE) * 10000)
      |    AS BIGINT) AS budget_rows
      |FROM m CROSS JOIN mt ORDER BY source""".stripMargin))

  /** Per-dimension z-score normalization of the embedding corpus (feature
    * scaling before ANN / clustering). Determinism recipe: each float is
    * snapped to exact integer micro-units (round half away from zero —
    * both engines' rule), all moments accumulate as exact integer sums
    * (map-side combine, 64 groups), and mean/sd/z are recomputed from
    * those integers with the IDENTICAL IEEE expression on both engines
    * (sqrt is correctly rounded per IEEE-754). The 64-row stats table
    * broadcasts back; the corpus side never shuffles for the normalize
    * pass. */
  val embZscore: QueryDef = QueryDef(
    "emb_zscore",
    (s, d) => {
      val ex = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
          round(col("x").cast("double") * 1000000).cast("long").as("xm"))
      val mean = col("s").cast("double") / col("n").cast("double")
      val stats = ex.groupBy(col("dim"))
        .agg(sum(col("xm")).as("s"), sum(col("xm") * col("xm")).as("q"),
          count(lit(1)).as("n"))
        .select(col("dim"), mean.as("mean_m"),
          sqrt(col("q").cast("double") / col("n").cast("double") - mean * mean)
            .as("sd_m"))
      ex.filter(col("vec_id") % 25 === 0)
        .join(broadcast(stats), "dim")
        .select(col("vec_id"), col("dim"),
          round((col("xm").cast("double") - col("mean_m")) / col("sd_m"), 4).as("z"))
        .orderBy("vec_id", "dim")
    },
    Some("""WITH ex AS (
      |  SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
      |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS xm
      |  FROM embeddings),
      |stats AS (
      |  SELECT dim, CAST(sum(xm) AS BIGINT) AS s,
      |    CAST(sum(xm * xm) AS BIGINT) AS q, count(*) AS n
      |  FROM ex GROUP BY dim),
      |st AS (
      |  SELECT dim, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_m,
      |    sqrt(CAST(q AS DOUBLE) / CAST(n AS DOUBLE)
      |         - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
      |           * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) AS sd_m
      |  FROM stats)
      |SELECT vec_id, dim,
      |  round((CAST(xm AS DOUBLE) - mean_m) / sd_m, 4) AS z
      |FROM ex JOIN st USING (dim) WHERE vec_id % 25 = 0
      |ORDER BY vec_id, dim""".stripMargin))

  /** BM25 retrieval scoring: top-5 documents per query term, k1=1.2,
    * b=0.75, with the log-free idf ratio (N - df + 0.5)/(df + 0.5) — the
    * same cross-engine decision as tf-idf/unigram-LM (ln() ulp parity is
    * not guaranteed; the ratio preserves BM25's ordering for a single
    * term). Every model input (tf, df, dl, N, total words) is an exact
    * integer; the score is one identical IEEE expression on both engines,
    * so ranking order matches bit-for-bit. Corpus-scale shape: doc-length
    * and tf aggregations combine map-side; df and the global stats are
    * tiny and broadcast; ranking is per-term top-5 (WindowGroupLimit). */
  val textBm25: QueryDef = QueryDef(
    "text_bm25",
    (s, d) => {
      val terms = Seq("spark", "merge", "window")
      val w = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
      val dl = w.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val stats = dl.agg(sum(col("dl")).as("total_w"), count(lit(1)).as("n_docs"))
      val tf = w.filter(col("w").isin(terms: _*))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      val dfreq = w.filter(col("w").isin(terms: _*))
        .select(col("doc_id"), col("w")).distinct()
        .groupBy(col("w")).agg(count(lit(1)).as("df"))
      val D = (c: Column) => c.cast("double")
      val idf = (D(col("n_docs")) - D(col("df")) + lit(0.5)) / (D(col("df")) + lit(0.5))
      val avgdl = D(col("total_w")) / D(col("n_docs"))
      val denom = D(col("tf")) +
        lit(1.2) * (lit(0.25) + lit(0.75) * D(col("dl")) / avgdl)
      val score = idf * (D(col("tf")) * lit(2.2)) / denom
      val win = Window.partitionBy(col("w"))
        .orderBy(col("score").desc, col("doc_id").asc)
      tf.join(dl, "doc_id").join(broadcast(dfreq), "w").crossJoin(broadcast(stats))
        .withColumn("score", score)
        .withColumn("rk", row_number().over(win).cast("long"))
        .filter(col("rk") <= 5)
        .select(col("w").as("term"), col("rk"), col("doc_id"),
          round(col("score"), 4).as("score"))
        .orderBy("term", "rk")
    },
    Some(s"""WITH w AS (
      |  SELECT doc_id, w
      |  FROM (SELECT doc_id, unnest(string_split($normalizeSql, ' ')) AS w
      |        FROM documents)
      |  WHERE length(w) > 0),
      |dl AS (SELECT doc_id, count(*) AS dl FROM w GROUP BY doc_id),
      |stats AS (SELECT CAST(sum(dl) AS BIGINT) AS total_w, count(*) AS n_docs FROM dl),
      |tf AS (SELECT doc_id, w, count(*) AS tf FROM w
      |       WHERE w IN ('spark', 'merge', 'window') GROUP BY doc_id, w),
      |dfreq AS (SELECT w, count(DISTINCT doc_id) AS df FROM w
      |          WHERE w IN ('spark', 'merge', 'window') GROUP BY w),
      |scored AS (
      |  SELECT tf.w, tf.doc_id,
      |    ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
      |      * (CAST(tf AS DOUBLE) * 2.2)
      |      / (CAST(tf AS DOUBLE)
      |         + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
      |                  / (CAST(total_w AS DOUBLE) / CAST(n_docs AS DOUBLE)))) AS score
      |  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (w), stats),
      |ranked AS (
      |  SELECT w, doc_id, score,
      |    row_number() OVER (PARTITION BY w ORDER BY score DESC, doc_id ASC) AS rk
      |  FROM scored)
      |SELECT w AS term, rk, doc_id, round(score, 4) AS score
      |FROM ranked WHERE rk <= 5 ORDER BY term, rk""".stripMargin))

  // ---------------------------------------------------------------------
  // Deterministic k-means + SemDeDup. The oracle replays the SAME unrolled
  // Lloyd iterations in DuckDB — possible only because every assignment is
  // exact integer arithmetic (see graft.ops.Clustering's recipe).
  private val K = 8
  private val Iters = 3

  /** Micro-unit vector table CTE + seed centroids (c1) + `Iters` unrolled
    * assign/update rounds; returns the WITH-clause body ending at the
    * final assignment CTE `a$Iters`. `extraCtes` are injected first so a
    * caller can cluster a derived corpus instead of the raw table. */
  private def kmeansSql(extraCtes: String = "", source: String = "embeddings"): String = {
    def assign(c: String): String =
      s"""SELECT id, xm,
         |    CAST(min(key) % $K AS BIGINT) AS cid,
         |    CAST(min(key) // $K AS BIGINT) AS dist
         |  FROM (
         |    SELECT v.id, v.xm,
         |      CAST(list_sum([(v.xm[i] - c.cm[i]) * (v.xm[i] - c.cm[i])
         |                     for i in range(1, len(v.xm) + 1)]) AS BIGINT)
         |        * $K + c.cid AS key
         |    FROM v, $c c)
         |  GROUP BY id, xm""".stripMargin
    def update(a: String): String =
      s"""SELECT cid, list(cm_j ORDER BY dim) AS cm
         |  FROM (
         |    SELECT cid, dim,
         |      CAST(round(CAST(sum(vv) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS cm_j
         |    FROM (SELECT cid, generate_subscripts(xm, 1) AS dim, unnest(xm) AS vv FROM $a)
         |    GROUP BY cid, dim)
         |  GROUP BY cid""".stripMargin
    val rounds = (2 to Iters).map(i =>
      s"c$i AS (${update(s"a${i - 1}")}),\na$i AS (${assign(s"c$i")})").mkString(",\n")
    s"""WITH ${extraCtes}v AS (
       |  SELECT CAST(vec_id AS BIGINT) AS id,
       |    list_transform(embedding,
       |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xm
       |  FROM $source),
       |c1 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS cid, xm AS cm
       |       FROM (SELECT id, xm FROM v ORDER BY id LIMIT $K)),
       |a1 AS (${assign("c1")}),
       |$rounds""".stripMargin
  }

  /** Distributed Lloyd's k-means (K=8, 3 rounds), bit-deterministic: the
    * full final assignment with its exact integer squared distance. */
  val clusterKmeans: QueryDef = QueryDef(
    "cluster_kmeans",
    (s, d) => graft.ops.Clustering.kmeansMicroAssign(
        Tables.embeddings(s, d), "vec_id", "embedding", K, Iters)
      .select(col("id").as("vec_id"), col("cid"), col("dist"))
      .orderBy("vec_id"),
    Some(s"""${kmeansSql()}
      |SELECT id AS vec_id, cid, dist FROM a$Iters ORDER BY vec_id""".stripMargin))

  /** SemDeDup: cluster the corpus, then within each cluster emit every
    * embedding pair above cosine 0.95 via the exact-integer test
    * (dot²·10⁶ > t²·‖a‖²·‖b‖² in 128-bit/DECIMAL(38)). Clusters bound
    * the candidate pairs to Σ|cluster|² — the semantic analogue of the
    * blocked fuzzy dedup's Σ|block|² argument. The corpus is embeddings ∪
    * slightly-perturbed copies (the same synthesized near-dup corpus as
    * dedup_embedding — the raw table has no high-cosine pairs). */
  val dedupSemantic: QueryDef = QueryDef(
    "dedup_semantic",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val perturbed = emb.filter(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.01f)).as("embedding"))
      graft.ops.Clustering.semanticDupPairs(
        emb.select(col("vec_id"), col("embedding")).union(perturbed),
        "vec_id", "embedding", K, Iters, cosTimes1e3 = 950)
      .orderBy("cid", "keep_id", "drop_id")
    },
    Some(s"""${kmeansSql(
      extraCtes = """corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000 AS vec_id,
        |    [x * CAST(1.01 AS FLOAT) for x in embedding] AS embedding
        |  FROM embeddings WHERE vec_id % 20 = 0),
        |""".stripMargin,
      source = "corpus")},
      |n AS (
      |  SELECT id, xm, cid,
      |    CAST(list_sum([xm[i] * xm[i] for i in range(1, len(xm) + 1)]) AS BIGINT) AS n2
      |  FROM a$Iters),
      |pairs AS (
      |  SELECT a.cid, a.id AS keep_id, b.id AS drop_id, a.n2 AS a_n2, b.n2 AS b_n2,
      |    CAST(list_sum([a.xm[i] * b.xm[i]
      |                   for i in range(1, len(a.xm) + 1)]) AS BIGINT) AS dot
      |  FROM n a JOIN n b ON a.cid = b.cid AND a.id < b.id)
      |SELECT cid, keep_id, drop_id FROM pairs
      |WHERE dot > 0
      |  AND CAST(dot AS HUGEINT) * CAST(dot AS HUGEINT) * 1000000 >
      |      902500 * CAST(a_n2 AS HUGEINT) * CAST(b_n2 AS HUGEINT)
      |ORDER BY cid, keep_id, drop_id""".stripMargin))

  /** Deterministic hash-based train/val/test split (90/5/5): per-source
    * split sizes. The assignment is row-local 60-bit md5 arithmetic —
    * stable across engines, partitionings AND corpus growth (a doc's
    * split never moves when the corpus accretes), the property count-based
    * splits lack. See [[graft.ops.Sampling.deterministicSplit]]. */
  /** Deterministic exactly-k uniform sample ([[graft.ops.Sampling.uniformK]]):
    * bottom-150 by md5(doc_id) — the reproducible reservoir-sample
    * equivalent, planned as TakeOrdered (per-partition k-heap + driver
    * merge, no global sort). The oracle replays the same hash order. */
  val sampleUniformK: QueryDef = QueryDef(
    "sample_uniform_k",
    (s, d) => graft.ops.Sampling.uniformK(
        Tables.documents(s, d).select(col("doc_id"), col("source")),
        "doc_id", k = 150)
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, source FROM (
      |  SELECT doc_id, source FROM documents
      |  ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC LIMIT 150)
      |ORDER BY doc_id""".stripMargin))

  /** Weighted sampling WITH REPLACEMENT
    * ([[graft.ops.Sampling.weightedWithReplacement]]): 200 draws over
    * the documents, each weighted by its word count — the epoch-
    * construction primitive for "sample documents ∝ length" (or ∝
    * quality score) mixtures. Integer-exact inverse transform on the
    * cumulative weight line with md5-seeded draws, so the oracle
    * replays every draw byte-identically: no float sampling keys, no
    * cross-engine ln() drift. The corpus-side prefix sum is sharded
    * (no single-partition window); the draw table broadcasts. */
  val sampleWeightedReplacement: QueryDef = QueryDef(
    "sample_weighted_replacement",
    (s, d) => graft.ops.Sampling.weightedWithReplacement(
        Tables.documents(s, d).select(col("doc_id"),
          size(graft.ops.TextOps.words(col("text"))).as("w")),
        "doc_id", "w", nDraws = 200, seed = "g13")
      .orderBy("draw_id"),
    Some(s"""WITH base AS (
      |  SELECT doc_id AS id,
      |    CAST(len(string_split($normalizeSql, ' ')) AS BIGINT) AS w,
      |    doc_id % 256 AS shard
      |  FROM documents),
      |pos AS (
      |  SELECT id, w,
      |    COALESCE(sum(w) OVER (ORDER BY shard, id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo
      |  FROM base WHERE w > 0),
      |tot AS (SELECT sum(w) AS tw FROM base WHERE w > 0),
      |draws AS (
      |  SELECT j AS draw_id,
      |    CAST(concat('0x', substr(md5('g13:' || CAST(j AS VARCHAR)), 1, 15))
      |      AS BIGINT) % (SELECT tw FROM tot) AS u
      |  FROM generate_series(0, 199) t(j))
      |SELECT d.draw_id, p.id AS doc_id
      |FROM draws d JOIN pos p ON d.u >= p.lo AND d.u < p.lo + p.w
      |ORDER BY d.draw_id""".stripMargin))

  val sampleHashSplit: QueryDef = QueryDef(
    "sample_hash_split",
    (s, d) => graft.ops.Sampling.deterministicSplit(
        Tables.documents(s, d).select(col("doc_id"), col("source")),
        "doc_id", "split", Seq("train" -> 90, "val" -> 95, "test" -> 100))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("source", "split"),
    Some("""SELECT source, split, count(*) AS n_docs FROM (
      |  SELECT source,
      |    CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
      |  FROM (SELECT source,
      |          CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      |            % 100 AS b
      |        FROM documents))
      |GROUP BY source, split ORDER BY source, split""".stripMargin))

  /** Deterministic sharded epoch shuffle
    * ([[graft.ops.Sampling.epochShuffle]]): epoch 3's global training
    * read order over the document corpus, materialized as (shard, pos)
    * coordinates — different every epoch, exactly reproducible for
    * checkpoint resume, one shard-partitioned window exchange (a single
    * global row_number would serialize through one partition). The
    * oracle replays the md5 shard assignment and within-shard rank
    * exactly. */
  val sampleEpochShuffle: QueryDef = QueryDef(
    "sample_epoch_shuffle",
    (s, d) => graft.ops.Sampling.epochShuffle(
        Tables.documents(s, d).select(col("doc_id")), "doc_id",
        epoch = 3, shards = 8)
      .orderBy("shard", "pos"),
    Some("""WITH h AS (
      |  SELECT doc_id, md5(concat('3:', CAST(doc_id AS VARCHAR))) AS hs
      |  FROM documents),
      |v AS (
      |  SELECT doc_id, hs,
      |    CAST(concat('0x', substr(hs, 1, 15)) AS BIGINT) % 8 AS shard
      |  FROM h)
      |SELECT doc_id, shard,
      |  CAST(row_number() OVER (PARTITION BY shard ORDER BY hs, doc_id) AS BIGINT) AS pos
      |FROM v ORDER BY shard, pos""".stripMargin))

  /** Sequence length bucketing for training batches: width-16 token
    * buckets, per-bucket document count, token mass, and the padding
    * fraction a pad-to-bucket-max batcher would waste. All-integer until
    * the single boundary division. Row-local bucketing + one map-side
    * combining aggregation — the 100 TB shape is a scan plus a 200-group
    * shuffle. */
  val packLengthBuckets: QueryDef = QueryDef(
    "pack_length_buckets",
    (s, d) => Tables.documents(s, d)
      .select(TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("bucket", expr("n_tokens div 16"))
      .withColumn("cap", (col("bucket") + 1) * 16)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
        sum(col("cap") - col("n_tokens")).as("sum_padding"))
      .withColumn("padding_frac",
        round(col("sum_padding").cast("double") /
          ((col("bucket") + 1) * 16 * col("n_docs")).cast("double"), 4))
      .orderBy("bucket"),
    Some("""WITH t AS (
      |  SELECT CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |b AS (
      |  SELECT CAST(n_tokens // 16 AS BIGINT) AS bucket, n_tokens,
      |    (CAST(n_tokens // 16 AS BIGINT) + 1) * 16 AS cap
      |  FROM t)
      |SELECT bucket, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
      |  CAST(sum(cap - n_tokens) AS BIGINT) AS sum_padding,
      |  round(CAST(CAST(sum(cap - n_tokens) AS BIGINT) AS DOUBLE) /
      |        CAST((bucket + 1) * 16 * count(*) AS DOUBLE), 4) AS padding_frac
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin))

  /** Full 64×64 covariance matrix of the embedding corpus (whitening /
    * PCA prep) in ONE narrow pass: the [[graft.functions.LongGramMatrix]]
    * aggregate accumulates n, Σxᵢ and upper-triangle Σxᵢxⱼ exactly in
    * integer micro-units with map-side combine — the corpus is neither
    * exploded nor self-joined (the oracle replays that d×-heavier
    * formulation and must land on identical integers, partitioning-proof).
    * Covariance is one identical IEEE expression at the boundary,
    * rescaled to input units. */
  val embCovariance: QueryDef = QueryDef(
    "emb_covariance",
    (s, d) => {
      val gm = Tables.embeddings(s, d)
        .select(graft.ops.Clustering.microVec(col("embedding")).as("xm"))
        .agg(graft.functions.long_gram_matrix(col("xm"), 64).as("gm"))
      val nD = col("gm.n").cast("double")
      gm.select(col("gm"), explode(sequence(lit(1), lit(64))).as("i"))
        .select(col("gm"), col("i"), explode(sequence(col("i"), lit(64))).as("j"))
        .withColumn("idx",
          expr("CAST((i-1)*64 - ((i-1)*(i-2)) div 2 + (j-i) + 1 AS INT)"))
        .select(col("i").cast("long").as("dim_i"), col("j").cast("long").as("dim_j"),
          round((element_at(col("gm.g"), col("idx")).cast("double") / nD
            - (element_at(col("gm.s"), col("i")).cast("double") / nD)
              * (element_at(col("gm.s"), col("j")).cast("double") / nD))
            / lit(1.0e12), 6)
            // + 0.0 canonicalizes IEEE -0.0 (DuckDB round keeps it,
            // Spark's BigDecimal round does not)
            .plus(lit(0.0)).as("cov"))
        .orderBy("dim_i", "dim_j")
    },
    Some("""WITH v AS (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xm
      |  FROM embeddings),
      |ex AS (SELECT vec_id, generate_subscripts(xm, 1) AS dim, unnest(xm) AS x FROM v),
      |nv AS (SELECT count(*) AS n FROM v),
      |g AS (SELECT a.dim AS i, b.dim AS j, CAST(sum(a.x * b.x) AS BIGINT) AS gij
      |      FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.dim <= b.dim
      |      GROUP BY 1, 2),
      |s AS (SELECT dim, CAST(sum(x) AS BIGINT) AS sd FROM ex GROUP BY dim)
      |SELECT CAST(i AS BIGINT) AS dim_i, CAST(j AS BIGINT) AS dim_j,
      |  round((CAST(gij AS DOUBLE) / CAST(n AS DOUBLE)
      |    - (CAST(sa.sd AS DOUBLE) / CAST(n AS DOUBLE))
      |      * (CAST(sb.sd AS DOUBLE) / CAST(n AS DOUBLE)))
      |    / 1000000000000.0, 6) + 0.0 AS cov
      |FROM g JOIN s sa ON g.i = sa.dim JOIN s sb ON g.j = sb.dim, nv
      |ORDER BY dim_i, dim_j""".stripMargin))

  /** Johnson–Lindenstrauss random projection of the embedding corpus to
    * `K` dimensions via md5-derived ±1 hyperplanes (the
    * [[graft.ops.Similarity]] plane family — executors regenerate them
    * from nothing, the oracle regenerates them in SQL). Multiplying
    * micro-unit integers by ±1 is exact, so every projected coordinate
    * is an exact integer (the 1/√K JL scale stays symbolic). One narrow
    * pass: K codegen'd [[graft.functions.LongVectorDot]]s against
    * literal plane arrays, zero shuffles before the output sort —
    * completes the embedding-ops family (z-score, covariance, int8, PQ,
    * projection). */
  val embProject: QueryDef = {
    val K = 16
    QueryDef(
      "emb_project",
      (s, d) => {
        val dots = (0 until K).map { p =>
          graft.functions.long_dot(col("xm"),
            typedLit(graft.ops.Similarity.planeVector(p, 64).map(_.toLong)))
        }
        Tables.embeddings(s, d)
          .select(col("vec_id"), graft.ops.Clustering.microVec(col("embedding")).as("xm"))
          .select(col("vec_id"), posexplode(array(dots: _*)).as(Seq("p", "proj")))
          .select(col("vec_id"), col("p").cast("long").as("p"), col("proj"))
          .orderBy("vec_id", "p")
      },
      Some(s"""WITH planes AS (
        |  SELECT p, list(CASE WHEN strpos('13579bdf', substr(md5(p || ':' || d), 2, 1)) > 0
        |                 THEN 1 ELSE -1 END ORDER BY d) AS pv
        |  FROM range(0, $K) rp(p), range(1, 65) rd(d)
        |  GROUP BY p),
        |v AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xm
        |  FROM embeddings)
        |SELECT vec_id, p,
        |  CAST(list_sum([xm[i] * pv[i] for i in range(1, len(xm) + 1)]) AS BIGINT) AS proj
        |FROM v, planes ORDER BY vec_id, p""".stripMargin))
  }

  /** BPE merge-seed statistics: corpus-wide counts of adjacent CHARACTER
    * pairs inside normalized words — the candidate table a byte-pair-
    * encoding tokenizer's first merge is chosen from (Sennrich et al.
    * 2016); each training iteration is this same aggregation over the
    * re-tokenized stream. Top-20 by (count desc, pair asc) via
    * TakeOrdered. The pair walk is a typed per-word flatMap — the same
    * narrow-pass decision as [[graft.ops.TextOps.wordShingleRows]]: no
    * per-doc array materialization, pipelines into the map-side count. */
  val textBpePairs: QueryDef = QueryDef(
    "text_bpe_pairs",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("text")).as[String]
        .flatMap { text =>
          val norm = graft.ops.TextOps.normalizeAsciiString(text)
          norm.split(" ", -1).iterator.filter(_.length >= 2).flatMap { w =>
            (0 until w.length - 1).iterator.map(i => w.substring(i, i + 2))
          }
        }
        .toDF("pair")
        .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc).limit(20)
    },
    Some(s"""WITH w AS (
      |  SELECT unnest(string_split($normalizeSql, ' ')) AS w FROM documents),
      |p AS (SELECT substr(w, i, 2) AS pair
      |      FROM (SELECT w, unnest(range(1, len(w), 1)) AS i FROM w
      |            WHERE len(w) >= 2))
      |SELECT pair, count(*) AS cnt FROM p GROUP BY pair
      |ORDER BY cnt DESC, pair ASC LIMIT 20""".stripMargin))

  /** Shared BPE configuration for the train/apply/pack family: 16
    * merges (output symbols U+00C0..U+00CF), word table capped at the
    * 2000 most frequent words. */
  private val bpeMerges = 16
  private val bpeCap = 2000
  private def bpeTrainWith: String =
    Bpe.trainCtesSql(normalizeSql, bpeMerges, bpeCap)

  /** Full BPE TRAINING ([[graft.ops.Bpe.train]] — Sennrich et al. 2016):
    * the ordered merge table itself, gated. One distributed map-combined
    * word-frequency aggregation (capped to the `bpeCap` most frequent
    * words — the bounded collect that makes training safe at 100 TB),
    * then the merge loop runs driver-side over that tiny table: each
    * round counts candidate pairs (non-overlap replace formula), picks
    * the (count desc, pair asc) argmax and rewrites segmentations. The
    * oracle REPLAYS TRAINING UNROLLED — 16 rounds of count/argmax/
    * rewrite CTEs (the k-means/PageRank fixed-rounds precedent) — so
    * every merge decision, not just the result, is cross-engine gated. */
  val textBpeTrain: QueryDef = QueryDef(
    "text_bpe_train",
    (s, d) => Bpe.mergesDf(s,
      Bpe.train(Tables.documents(s, d), "text", bpeMerges, bpeCap))
      .orderBy("rk"),
    Some {
      val rows = (1 to bpeMerges).map { i =>
        s"""SELECT CAST($i AS BIGINT) AS rk, (SELECT pair FROM best$i) AS pair,
           |  chr(${191 + i}) AS merged, (SELECT cnt FROM best$i) AS cnt""".stripMargin
      }.mkString("\n", "\nUNION ALL\n", "\n")
      s"WITH $bpeTrainWith$rows ORDER BY rk"
    })

  /** The learned BPE VOCABULARY, human-readable: each merge's rank,
    * weighted count and the character string its symbol expands to
    * ([[graft.ops.Bpe.expansions]]). The oracle retrains unrolled and
    * rebuilds the decode table round-by-round (exp$i CTEs), so the
    * inspectable vocabulary — the artifact a tokenizer release ships —
    * is itself cross-engine gated. */
  val textBpeVocab: QueryDef = QueryDef(
    "text_bpe_vocab",
    (s, d) => {
      import s.implicits._
      Bpe.expansions(Bpe.train(Tables.documents(s, d), "text", bpeMerges, bpeCap))
        .map { case (m, e) => (m.rk, e, m.cnt) }
        .toDF("rk", "token_str", "cnt")
        .orderBy("rk")
    },
    Some {
      val rows = (1 to bpeMerges).map { i =>
        s"""SELECT CAST($i AS BIGINT) AS rk,
           |  (SELECT ex FROM exp$bpeMerges WHERE sym = chr(${191 + i})) AS token_str,
           |  (SELECT cnt FROM best$i) AS cnt""".stripMargin
      }.mkString("\n", "\nUNION ALL\n", "\n")
      s"WITH $bpeTrainWith,\n${Bpe.expansionCtesSql(bpeMerges)}$rows ORDER BY rk"
    })

  /** WordPiece APPLICATION: greedy longest-match-first segmentation
    * (BERT's tokenizer shape) under the BPE-induced piece inventory —
    * the learner is BPE, the applier matches the longest vocab piece at
    * each position in ONE left-to-right pass, O(len × maxPiece)
    * independent of vocabulary size ([[graft.ops.Bpe.wordpieceCounts]]).
    * Note greedy matching is NOT the merge-order replay: it can
    * segment differently than BPE apply, which is exactly why it needs
    * its own gate. The oracle retrains (unrolled CTEs), expands the
    * symbol inventory to the piece set, and replays greedy matching as
    * a recursive CTE whose position strictly advances by the longest
    * matching piece — every matching decision cross-engine gated. */
  val textWordpieceApply: QueryDef = QueryDef(
    "text_wordpiece_apply",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val merges = Bpe.train(docs, "text", bpeMerges, bpeCap)
      Bpe.wordpieceCounts(docs, "doc_id", "text", merges).orderBy("doc_id")
    },
    Some {
      s"""WITH RECURSIVE $bpeTrainWith,
         |${Bpe.expansionCtesSql(bpeMerges)},
         |vocab AS MATERIALIZED (
         |  SELECT DISTINCT ex AS piece FROM exp$bpeMerges),
         |wx AS (
         |  SELECT row_number() OVER () AS uid, doc_id, w FROM (
         |    SELECT doc_id, unnest(string_split($normalizeSql, ' ')) AS w
         |    FROM documents) WHERE len(w) >= 1),
         |-- greedy step as JOIN + GROUP BY (not a correlated max-subquery,
         |-- which DuckDB 1.0 mis-decorrelates inside a recursive term);
         |-- uid keeps repeated words distinct under the aggregation
         |wp(uid, doc_id, w, i, n) AS (
         |  SELECT uid, doc_id, w, CAST(1 AS BIGINT), CAST(0 AS BIGINT) FROM wx
         |  UNION ALL
         |  SELECT uid, doc_id, w, i + max(len(v.piece)), n + 1
         |  FROM wp JOIN vocab v
         |    ON v.piece = substr(w, CAST(i AS INTEGER), len(v.piece))
         |  WHERE i <= len(w)
         |  GROUP BY uid, doc_id, w, i, n),
         |fin AS (SELECT doc_id, n FROM wp WHERE i > len(w)),
         |agg AS (
         |  SELECT doc_id, count(*) AS nw, sum(n) AS nt FROM fin GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(a.nw, 0) AS BIGINT) AS n_words,
         |  CAST(coalesce(a.nt, 0) AS BIGINT) AS n_tokens_wp
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin
    })

  /** WordPiece piece-usage profile: the top pieces by corpus occurrence
    * under greedy longest-match — the artifact a tokenizer audit reads
    * (which learned units actually carry the corpus). Spark side is a
    * flatMap → map-side-combined count → top-k
    * ([[graft.ops.Bpe.wordpiecePieceCounts]]); the oracle's recursive
    * matcher carries the matched piece per step and aggregates the
    * emitted rows. */
  val textWordpiecePieces: QueryDef = QueryDef(
    "text_wordpiece_pieces",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val merges = Bpe.train(docs, "text", bpeMerges, bpeCap)
      Bpe.wordpiecePieceCounts(docs, "text", merges)
        .orderBy(col("cnt").desc, col("piece"))
        .limit(15)
    },
    Some {
      s"""WITH RECURSIVE $bpeTrainWith,
         |${Bpe.expansionCtesSql(bpeMerges)},
         |vocab AS MATERIALIZED (
         |  SELECT DISTINCT ex AS piece FROM exp$bpeMerges),
         |wx AS (
         |  SELECT row_number() OVER () AS uid, w FROM (
         |    SELECT unnest(string_split($normalizeSql, ' ')) AS w
         |    FROM documents) WHERE len(w) >= 1),
         |-- greedy step as JOIN + GROUP BY (see text_wordpiece_apply);
         |-- the emitted p is the longest matching piece at position i
         |wp(uid, w, i, p) AS (
         |  SELECT uid, w, CAST(1 AS BIGINT), CAST(NULL AS VARCHAR) FROM wx
         |  UNION ALL
         |  SELECT uid, w, i + max(len(v.piece)),
         |    substr(w, CAST(i AS INTEGER), CAST(max(len(v.piece)) AS INTEGER))
         |  FROM wp JOIN vocab v
         |    ON v.piece = substr(w, CAST(i AS INTEGER), len(v.piece))
         |  WHERE i <= len(w)
         |  GROUP BY uid, w, i)
         |SELECT p AS piece, count(*) AS cnt FROM wp WHERE p IS NOT NULL
         |GROUP BY p ORDER BY cnt DESC, piece LIMIT 15""".stripMargin
    })

  /** Unigram-style VITERBI segmentation (the SentencePiece applier
    * shape, [[graft.ops.Bpe.viterbiCosts]]): per word, the MINIMUM
    * total piece cost over all segmentations — full DP, which
    * backtracks where WordPiece's greedy longest-match commits, so the
    * tokenizer triad (BPE merge-order / greedy longest-match / min-cost
    * DP) is complete and each applier is separately gated. Costs are
    * exact integers (1000003 // len² per piece), so the oracle replays
    * the DP as an unrolled per-position CTE chain over the same
    * BPE-induced piece inventory, byte-identically. Words over 24 chars
    * are skipped identically in both engines (the DP unrolls one SQL
    * level per position — the bound is the oracle's). */
  val textUnigramViterbi: QueryDef = QueryDef(
    "text_unigram_viterbi",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val merges = Bpe.train(docs, "text", bpeMerges, bpeCap)
      Bpe.viterbiCosts(docs, "doc_id", "text", merges).orderBy("doc_id")
    },
    Some {
      s"""WITH $bpeTrainWith,
         |${Bpe.expansionCtesSql(bpeMerges)},
         |vit_vocab AS MATERIALIZED (
         |  SELECT DISTINCT ex AS piece FROM exp$bpeMerges),
         |wx AS MATERIALIZED (
         |  SELECT doc_id, w FROM (
         |    SELECT doc_id, unnest(string_split($normalizeSql, ' ')) AS w
         |    FROM documents) WHERE len(w) BETWEEN 1 AND 24),
         |vit_words AS MATERIALIZED (SELECT DISTINCT w FROM wx),
         |${Bpe.viterbiDpCtesSql(24, 17)},
         |fin AS (
         |  SELECT w, min(c) AS c FROM vit_dp24 WHERE i = len(w) GROUP BY w),
         |agg AS (
         |  SELECT wx.doc_id, count(*) AS nw, sum(f.c) AS sc
         |  FROM wx JOIN fin f ON wx.w = f.w GROUP BY wx.doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(a.nw, 0) AS BIGINT) AS n_words,
         |  CAST(coalesce(a.sc, 0) AS BIGINT) AS sum_min_cost
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin
    })

  /** BPE APPLICATION: per-document token accounting under the trained
    * merges ([[graft.ops.Bpe.tokenCounts]] — row-local replace chain,
    * merge list in the task closure, nothing shuffles). The oracle
    * retrains (unrolled CTEs) and re-segments every word with the same
    * nested replace chain, so the gate covers train→apply end-to-end;
    * docs with no normalized words keep a (0, 0) row in both engines. */
  val textBpeApply: QueryDef = QueryDef(
    "text_bpe_apply",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val merges = Bpe.train(docs, "text", bpeMerges, bpeCap)
      Bpe.tokenCounts(docs, "doc_id", "text", merges).orderBy("doc_id")
    },
    Some {
      val chain = Bpe.segmentExprSql("w", bpeMerges)
      s"""WITH $bpeTrainWith,
         |wx AS (
         |  SELECT doc_id, unnest(string_split($normalizeSql, ' ')) AS w
         |  FROM documents),
         |tok AS (
         |  SELECT doc_id, len($chain) AS t FROM wx WHERE len(w) >= 1),
         |agg AS (
         |  SELECT doc_id, count(*) AS nw, sum(t) AS nt FROM tok GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(a.nw, 0) AS BIGINT) AS n_words,
         |  CAST(coalesce(a.nt, 0) AS BIGINT) AS n_tokens_bpe
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin
    })

  /** Tokenizer ARTIFACT round trip ([[graft.ops.Bpe.exportMerges]] /
    * `importMerges`): train → serialize the id-encoded tiktoken-style
    * merge file → reload → apply with the IMPORTED model. The oracle is
    * `text_bpe_apply`'s replay of direct train→apply, so the gate
    * proves the artifact carries the model EXACTLY — the ship-the-
    * tokenizer step between training the vocabulary and running it in
    * a separate inference/curation job. */
  val textBpeRoundtrip: QueryDef = QueryDef(
    "text_bpe_roundtrip",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val trained = Bpe.trainIds(docs, "text", bpeMerges, bpeCap)
      val art = graft.sources.TableIO.scratchDir(s, "bpe_artifact") + "/merges.tsv"
      Bpe.exportMerges(s, trained, art)
      val loaded = Bpe.importMerges(s, art)
      require(loaded == trained, "artifact round trip must be exact")
      Bpe.tokenCountsIds(docs, "doc_id", "text", loaded).orderBy("doc_id")
    },
    Some {
      val chain = Bpe.segmentExprSql("w", bpeMerges)
      s"""WITH $bpeTrainWith,
         |wx AS (
         |  SELECT doc_id, unnest(string_split($normalizeSql, ' ')) AS w
         |  FROM documents),
         |tok AS (
         |  SELECT doc_id, len($chain) AS t FROM wx WHERE len(w) >= 1),
         |agg AS (
         |  SELECT doc_id, count(*) AS nw, sum(t) AS nt FROM tok GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(a.nw, 0) AS BIGINT) AS n_words,
         |  CAST(coalesce(a.nt, 0) AS BIGINT) AS n_tokens_bpe
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin
    })

  /** Sequence packing over REAL tokenizer counts: `pack_chunks`' shard/
    * prefix-sum shape ([[graft.ops.Packing.chunkSummaryCounts]]) driven
    * by the trained BPE token counts instead of the regex word proxy —
    * chunk budgets now mean model tokens. Composition gate: training,
    * application and packing all replayed by one oracle. */
  val packChunksBpe: QueryDef = QueryDef(
    "pack_chunks_bpe",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val merges = Bpe.train(docs, "text", bpeMerges, bpeCap)
      Packing.chunkSummaryCounts(
          Bpe.tokenCounts(docs, "doc_id", "text", merges),
          "doc_id", "n_tokens_bpe", nShards = 8, budgetTokens = 512)
        .orderBy("shard", "chunk_id")
    },
    Some {
      val chain = Bpe.segmentExprSql("w", bpeMerges)
      s"""WITH $bpeTrainWith,
         |wx AS (
         |  SELECT doc_id, unnest(string_split($normalizeSql, ' ')) AS w
         |  FROM documents),
         |tok AS (
         |  SELECT doc_id, len($chain) AS t FROM wx WHERE len(w) >= 1),
         |agg AS (SELECT doc_id, sum(t) AS nt FROM tok GROUP BY doc_id),
         |base AS (
         |  SELECT d.doc_id % 8 AS shard, d.doc_id AS id,
         |    CAST(coalesce(a.nt, 0) AS BIGINT) AS n_tokens
         |  FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id),
         |c AS (
         |  SELECT shard, id, n_tokens,
         |    COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         |  FROM base),
         |a2 AS (
         |  SELECT shard, n_tokens, CAST(cum_before // 512 AS BIGINT) AS chunk_id,
         |    CASE WHEN n_tokens > 0 AND (cum_before + n_tokens - 1) // 512 > cum_before // 512
         |         THEN 1 ELSE 0 END AS straddles
         |  FROM c)
         |SELECT shard, chunk_id, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(sum(straddles) AS BIGINT) AS n_straddling
         |FROM a2 GROUP BY shard, chunk_id ORDER BY shard, chunk_id""".stripMargin
    })

  /** Bigram-LM surprise scoring
    * ([[graft.ops.TextOps.bigramSurpriseScores]] — the unigram scorer's
    * conditional twin): per-doc exact integer sum of scaled inverse
    * transition frequencies, caps exercised by the gate (unigram cap 20
    * of ~31, bigram cap 200 — OOV falls to count 1, maximum surprise). */
  val textBigramLm: QueryDef = QueryDef(
    "text_bigram_lm",
    (s, d) => TextOps.bigramSurpriseScores(Tables.documents(s, d), "doc_id",
        "text", maxUnigrams = 20, maxBigrams = 200)
      .select(col("id").as("doc_id"), col("n_bigrams"), col("sum_surprise"))
      .orderBy("doc_id"),
    Some(s"""WITH w AS (
      |  SELECT doc_id, string_split($normalizeSql, ' ') AS ws FROM documents),
      |bg AS (
      |  SELECT doc_id, ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i AS INTEGER) + 1] AS bg,
      |    ws[CAST(i AS INTEGER)] AS w1
      |  FROM w, unnest(range(1, len(ws), 1)) r(i)
      |  WHERE len(ws) >= 2),
      |uni AS (
      |  SELECT w, count(*) AS c1
      |  FROM (SELECT unnest(string_split($normalizeSql, ' ')) AS w FROM documents) t
      |  WHERE len(w) > 0 GROUP BY w ORDER BY c1 DESC, w ASC LIMIT 20),
      |bc AS (
      |  SELECT bg, count(*) AS cb FROM bg GROUP BY bg
      |  ORDER BY cb DESC, bg ASC LIMIT 200),
      |scored AS (
      |  SELECT doc_id, (coalesce(uni.c1, 1) * 1000000) // coalesce(bc.cb, 1) AS r
      |  FROM bg LEFT JOIN uni ON bg.w1 = uni.w LEFT JOIN bc ON bg.bg = bc.bg)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(sum(r) AS BIGINT) AS sum_surprise
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** CCNet-style LM-perplexity filtering (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    * documents are scored by the in-corpus bigram LM
    * ([[graft.ops.TextOps.bigramSurpriseScores]] — exact integer scaled
    * inverse transition frequencies, the log-free surrogate for
    * perplexity) and KEPT when their per-bigram average surprise is at
    * or below the corpus mean — the relative-threshold form that stays
    * meaningful at any scale factor, unlike a hard-coded cutoff. The
    * threshold is a one-row aggregate broadcast back into the plan (no
    * driver round-trip, no global sort); result is the kept-docs
    * rollup per source, which pins the filter's selection exactly. At
    * 100 TB: three narrow corpus scans for the LM (the text_bigram_lm
    * posture), one scalar broadcast, one semi-join-shaped filter. */
  val curatePerplexityFilter: QueryDef = QueryDef(
    "curate_perplexity_filter",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val scored = TextOps.bigramSurpriseScores(docs, "doc_id", "text",
          maxUnigrams = 20, maxBigrams = 200)
        .withColumn("avg_surprise", expr("sum_surprise div n_bigrams"))
      val thr = scored.agg(
        expr("sum(avg_surprise) div count(1)").as("thr"))
      scored.crossJoin(broadcast(thr))
        .filter(col("avg_surprise") <= col("thr"))
        .select(col("id").as("doc_id"), col("avg_surprise"))
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("avg_surprise")).as("sum_avg_surprise"))
        .orderBy("source")
    },
    Some(s"""WITH w AS (
      |  SELECT doc_id, string_split($normalizeSql, ' ') AS ws FROM documents),
      |bg AS (
      |  SELECT doc_id, ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i AS INTEGER) + 1] AS bg,
      |    ws[CAST(i AS INTEGER)] AS w1
      |  FROM w, unnest(range(1, len(ws), 1)) r(i)
      |  WHERE len(ws) >= 2),
      |uni AS (
      |  SELECT w, count(*) AS c1
      |  FROM (SELECT unnest(string_split($normalizeSql, ' ')) AS w FROM documents) t
      |  WHERE len(w) > 0 GROUP BY w ORDER BY c1 DESC, w ASC LIMIT 20),
      |bc AS (
      |  SELECT bg, count(*) AS cb FROM bg GROUP BY bg
      |  ORDER BY cb DESC, bg ASC LIMIT 200),
      |perdoc AS (
      |  SELECT doc_id,
      |    sum((coalesce(uni.c1, 1) * 1000000) // coalesce(bc.cb, 1))
      |      // count(*) AS a
      |  FROM bg LEFT JOIN uni ON bg.w1 = uni.w LEFT JOIN bc ON bg.bg = bc.bg
      |  GROUP BY doc_id),
      |thr AS (SELECT sum(a) // count(*) AS t FROM perdoc)
      |SELECT d.source, count(*) AS n_kept,
      |  CAST(sum(p.a) AS BIGINT) AS sum_avg_surprise
      |FROM perdoc p JOIN documents d USING (doc_id), thr
      |WHERE p.a <= thr.t
      |GROUP BY d.source ORDER BY d.source""".stripMargin))

  /** DSIR-style importance weighting ([[graft.ops.TextOps.dsirScores]]
    * — Xie et al. 2023): documents scored by the Laplace-smoothed
    * target-vs-raw ratio of their hashed-unigram features, the
    * data-selection signal that upweights target-domain-like documents
    * corpus-wide with NO trained model (two narrow scans + a
    * dim-bounded broadcast). Target slice = `src0`; the per-source
    * rollup pins every document's integer score — src0 itself scoring
    * highest is the expected (and oracle-verified) shape. */
  val curateDsir: QueryDef = QueryDef(
    "curate_dsir",
    (s, d) => {
      val docs = Tables.documents(s, d)
      TextOps.dsirScores(docs, "doc_id", "text",
          col("source") === "src0", dim = 64)
        .withColumnRenamed("id", "doc_id")
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("dsir_score")).as("sum_score"))
        .orderBy("source")
    },
    Some(s"""WITH toks AS (
      |  SELECT doc_id, tgt,
      |    CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) % 64 AS h
      |  FROM (SELECT doc_id, source = 'src0' AS tgt,
      |          unnest(string_split($normalizeSql, ' ')) AS w
      |        FROM documents)
      |  WHERE len(w) > 0),
      |counts AS (
      |  SELECT h, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS t_h,
      |    count(*) AS r_h
      |  FROM toks GROUP BY h),
      |scored AS (
      |  SELECT t.doc_id, ((c.t_h + 1) * 1000000) // (c.r_h + 1) AS r
      |  FROM toks t JOIN counts c USING (h)),
      |perdoc AS (
      |  SELECT doc_id, sum(r) AS sc FROM scored GROUP BY doc_id)
      |SELECT d.source, count(*) AS n_docs, CAST(sum(p.sc) AS BIGINT) AS sum_score
      |FROM perdoc p JOIN documents d USING (doc_id)
      |GROUP BY d.source ORDER BY d.source""".stripMargin))

  /** Feature-hashing document embeddings
    * ([[graft.ops.TextOps.hashEmbedRows]] — the vocabulary-free
    * fixed-width bag-of-words vector, Weinberger et al. 2009), emitted
    * sparse and fully value-gated: the oracle replays the md5
    * index/sign arithmetic and the signed integer sums per (doc,
    * component). */
  val textHashEmbed: QueryDef = QueryDef(
    "text_hash_embed",
    (s, d) => TextOps.hashEmbedRows(Tables.documents(s, d), "doc_id", "text",
        dim = 16)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id", "dim"),
    Some(s"""WITH toks AS (
      |  SELECT doc_id, w
      |  FROM (SELECT doc_id, unnest(string_split($normalizeSql, ' ')) AS w
      |        FROM documents)
      |  WHERE len(w) > 0)
      |SELECT doc_id,
      |  CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) % 16 AS dim,
      |  CAST(sum(CASE WHEN CAST(concat('0x', substr(md5(w || ':s'), 1, 1)) AS BIGINT) % 2 = 1
      |       THEN 1 ELSE -1 END) AS BIGINT) AS v
      |FROM toks GROUP BY doc_id, dim ORDER BY doc_id, dim""".stripMargin))

  /** Tokenizer FERTILITY monitoring per source (tokens-per-word in
    * integer basis points) — the drift metric a tokenizer owner tracks
    * per domain/language slice: a source whose fertility climbs is
    * drifting away from the trained vocabulary (new jargon, new
    * language) and inflating its effective training cost. Composes
    * train → apply → per-source rollup; the oracle replays all three. */
  val textBpeFertility: QueryDef = QueryDef(
    "text_bpe_fertility",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val merges = Bpe.train(docs, "text", bpeMerges, bpeCap)
      Bpe.tokenCounts(docs, "doc_id", "text", merges)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"))
        .agg(sum(col("n_words")).as("n_words"),
          sum(col("n_tokens_bpe")).as("n_tokens_bpe"))
        .withColumn("fertility_bp",
          expr("(n_tokens_bpe * 10000) div nullif(n_words, 0)"))
        .orderBy("source")
    },
    Some {
      val chain = Bpe.segmentExprSql("w", bpeMerges)
      s"""WITH $bpeTrainWith,
         |wx AS (
         |  SELECT doc_id, source, unnest(string_split($normalizeSql, ' ')) AS w
         |  FROM documents),
         |tok AS (
         |  SELECT source, len($chain) AS t FROM wx WHERE len(w) >= 1)
         |SELECT source, count(*) AS n_words,
         |  CAST(sum(t) AS BIGINT) AS n_tokens_bpe,
         |  (CAST(sum(t) AS BIGINT) * 10000) // nullif(count(*), 0) AS fertility_bp
         |FROM tok GROUP BY source ORDER BY source""".stripMargin
    })

  /** Shared configuration for the VOCABULARY-SCALE BPE family —
    * 1024 merges over a 400-word training table (r14 retune — r13's
    * 8192×650 configuration was value-correct but its five recursive
    * DuckDB replays cost 740 s, 71% of the whole gate, and blew the
    * driver's budget: the round's correctness artifact came back empty.
    * Measured at sf0.01: 1024×400 trains in ~12 s per oracle — the
    * family stays vocabulary-scale, well past both the 512-merge
    * unrolled family and the ~90-merge natural-word supply, while the
    * gate fits comfortably). The trainer itself remains capless: the
    * Array[Int] incremental trainer is proven at 8192+ merges in
    * BpeSpec (Spark-side, where 8k rounds cost well under a second) —
    * the SQL replay bound is the ORACLE's cost wall, not the engine's.
    * Corpus text is ENRICHED with TWO md5 hex fingerprint words per
    * document: the synthetic corpus has only ~31 distinct natural words
    * (pair supply exhausts near 90 merges), while the hex words give
    * the trainer a deep character-level vocabulary — the "characters →
    * subwords" dynamics a real corpus exhibits — deterministically and
    * identically in both engines. The 400-word cap sustains all 1024
    * rounds at every SF (merge table complete, verified; tail rounds
    * reach cnt=1, where the (cnt desc, pair asc) tie-break is pinned
    * cross-engine — the r13 8192-merge run gated hundreds of cnt=1
    * rounds green). The oracle replays every round with ONE recursive
    * CTE, [[graft.ops.Bpe.trainRecursiveCtesSql]]: constant query
    * size, no expression-depth wall. */
  private val bpeMergesLarge = 1024
  private val bpeCapLarge = 400
  private val bpeLargeText =
    "concat(coalesce(text, ''), ' ', md5(CAST(doc_id AS VARCHAR)), " +
      "' ', md5(concat(CAST(doc_id AS VARCHAR), 'x')))"
  private val normalizeLargeSql =
    s"trim(regexp_replace(regexp_replace(lower($bpeLargeText), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
  private def bpeLargeDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).withColumn("train_text",
      concat(coalesce(col("text"), lit("")), lit(" "),
        md5(col("doc_id").cast("string")), lit(" "),
        md5(concat(col("doc_id").cast("string"), lit("x")))))
  private def bpeLargeTrain(s: SparkSession, d: String): Seq[graft.ops.Bpe.Merge] =
    Bpe.train(bpeLargeDocs(s, d), "train_text", bpeMergesLarge, bpeCapLarge)
  /** The APPLY-side large family runs the Array[Int] id path end-to-end
    * (train ids → [[graft.ops.Bpe.tokenCountsIds]]) — no char-symbol
    * encoding anywhere between training and token counts, so the same
    * code applies a 32k+ vocabulary past the BMP ceiling; the char form
    * survives only where the OUTPUT is the symbol table itself
    * (train/vocab gates) and in the SQL oracle replay. */
  private def bpeLargeTrainIds(s: SparkSession, d: String): Seq[graft.ops.Bpe.MergeI] =
    Bpe.trainIds(bpeLargeDocs(s, d), "train_text", bpeMergesLarge, bpeCapLarge)

  /** Vocabulary-scale BPE TRAINING: the full merge table at vocabulary scale, every
    * round's (pair, count) decision cross-engine gated — the oracle
    * replays training with a single recursive CTE instead of thousands of
    * unrolled rounds. */
  val textBpeTrainLarge: QueryDef = QueryDef(
    "text_bpe_train_large",
    (s, d) => Bpe.mergesDf(s, bpeLargeTrain(s, d)).orderBy("rk"),
    Some(s"""WITH RECURSIVE ${Bpe.trainRecursiveCtesSql(normalizeLargeSql,
             bpeMergesLarge, bpeCapLarge)}
      |SELECT rk, pair, merged, cnt FROM bpe_merges ORDER BY rk""".stripMargin))

  /** Vocabulary-scale BPE VOCABULARY: each merge decoded to
    * the character string its symbol expands to — the shippable
    * tokenizer artifact. The oracle rebuilds the decode map with a
    * second recursive CTE over the replayed merge table. */
  val textBpeVocabLarge: QueryDef = QueryDef(
    "text_bpe_vocab_large",
    (s, d) => {
      import s.implicits._
      Bpe.expansions(bpeLargeTrain(s, d))
        .map { case (m, e) => (m.rk, e, m.cnt) }
        .toDF("rk", "token_str", "cnt")
        .orderBy("rk")
    },
    Some(s"""WITH RECURSIVE ${Bpe.trainRecursiveCtesSql(normalizeLargeSql,
             bpeMergesLarge, bpeCapLarge)},
      |${Bpe.vocabRecursiveCteSql(bpeMergesLarge)}
      |SELECT m.rk, d.ex AS token_str, m.cnt
      |FROM bpe_merges m
      |JOIN bpe_expd_fin d
      |  ON d.sym = m.merged
      |ORDER BY m.rk""".stripMargin))

  /** Vocabulary-scale BPE APPLICATION: per-document token accounting
    * under the vocabulary-scale merge table. Spark applies row-locally with the
    * rank-priority segmenter ([[graft.ops.Bpe.segmentRanked]] — cost
    * independent of vocabulary size) plus a per-task distinct-word memo;
    * the oracle segments the distinct word set with a recursive replace
    * chain and joins the counts back. Train → apply end-to-end at
    * vocabulary scale in one gate. */
  val textBpeApplyLarge: QueryDef = QueryDef(
    "text_bpe_apply_large",
    (s, d) => Bpe.tokenCountsIds(bpeLargeDocs(s, d), "doc_id", "train_text",
        bpeLargeTrainIds(s, d))
      .orderBy("doc_id"),
    Some(s"""WITH RECURSIVE ${Bpe.trainRecursiveCtesSql(normalizeLargeSql,
             bpeMergesLarge, bpeCapLarge)},
      |bpe_wx AS MATERIALIZED (
      |  SELECT doc_id, unnest(string_split($normalizeLargeSql, ' ')) AS w
      |  FROM documents),
      |${Bpe.applyRecursiveCtesSql("bpe_wx", bpeMergesLarge)},
      |agg AS (
      |  SELECT doc_id, count(*) AS nw, sum(t) AS nt
      |  FROM bpe_wx JOIN bpe_seg ON bpe_wx.w = bpe_seg.w GROUP BY doc_id)
      |SELECT d.doc_id, CAST(coalesce(a.nw, 0) AS BIGINT) AS n_words,
      |  CAST(coalesce(a.nt, 0) AS BIGINT) AS n_tokens_bpe
      |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
      |ORDER BY d.doc_id""".stripMargin))

  /** Sequence packing driven by the VOCABULARY-SCALE tokenizer:
    * `pack_chunks_bpe`'s shard/prefix-sum shape with token counts from
    * the vocabulary-scale tokenizer — the composition a real pipeline runs
    * (train tokenizer → tokenize → pack), end-to-end under one oracle
    * that replays training recursively, re-segments the distinct word
    * set, and re-runs the shard prefix sums. */
  val packChunksBpeLarge: QueryDef = QueryDef(
    "pack_chunks_bpe_large",
    (s, d) => {
      val docs = bpeLargeDocs(s, d)
      Packing.chunkSummaryCounts(
          Bpe.tokenCountsIds(docs, "doc_id", "train_text", bpeLargeTrainIds(s, d)),
          "doc_id", "n_tokens_bpe", nShards = 8, budgetTokens = 512)
        .orderBy("shard", "chunk_id")
    },
    Some(s"""WITH RECURSIVE ${Bpe.trainRecursiveCtesSql(normalizeLargeSql,
             bpeMergesLarge, bpeCapLarge)},
      |bpe_wx AS MATERIALIZED (
      |  SELECT doc_id, unnest(string_split($normalizeLargeSql, ' ')) AS w
      |  FROM documents),
      |${Bpe.applyRecursiveCtesSql("bpe_wx", bpeMergesLarge)},
      |agg AS (
      |  SELECT doc_id, sum(t) AS nt
      |  FROM bpe_wx JOIN bpe_seg ON bpe_wx.w = bpe_seg.w GROUP BY doc_id),
      |base AS (
      |  SELECT d.doc_id % 8 AS shard, d.doc_id AS id,
      |    CAST(coalesce(a.nt, 0) AS BIGINT) AS n_tokens
      |  FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id),
      |c AS (
      |  SELECT shard, id, n_tokens,
      |    COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      |  FROM base),
      |a2 AS (
      |  SELECT shard, n_tokens, CAST(cum_before // 512 AS BIGINT) AS chunk_id,
      |    CASE WHEN n_tokens > 0 AND (cum_before + n_tokens - 1) // 512 > cum_before // 512
      |         THEN 1 ELSE 0 END AS straddles
      |  FROM c)
      |SELECT shard, chunk_id, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |  CAST(sum(straddles) AS BIGINT) AS n_straddling
      |FROM a2 GROUP BY shard, chunk_id ORDER BY shard, chunk_id""".stripMargin))

  /** Per-source tokenizer FERTILITY under the vocabulary-scale merges —
    * `text_bpe_fertility`'s vocabulary-scale twin, completing the large
    * family's parity (train / vocab / apply / pack / fertility). The
    * fertility denominator counts the enriched stream's words (text +
    * the md5 fingerprint word), same basis as `text_bpe_apply_large`. */
  val textBpeFertilityLarge: QueryDef = QueryDef(
    "text_bpe_fertility_large",
    (s, d) => {
      val docs = bpeLargeDocs(s, d)
      Bpe.tokenCountsIds(docs, "doc_id", "train_text", bpeLargeTrainIds(s, d))
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"))
        .agg(sum(col("n_words")).as("n_words"),
          sum(col("n_tokens_bpe")).as("n_tokens_bpe"))
        .withColumn("fertility_bp",
          expr("(n_tokens_bpe * 10000) div nullif(n_words, 0)"))
        .orderBy("source")
    },
    Some(s"""WITH RECURSIVE ${Bpe.trainRecursiveCtesSql(normalizeLargeSql,
             bpeMergesLarge, bpeCapLarge)},
      |bpe_wx AS MATERIALIZED (
      |  SELECT doc_id, unnest(string_split($normalizeLargeSql, ' ')) AS w
      |  FROM documents),
      |${Bpe.applyRecursiveCtesSql("bpe_wx", bpeMergesLarge)},
      |tok AS (
      |  SELECT d.source, bpe_seg.t
      |  FROM bpe_wx JOIN bpe_seg ON bpe_wx.w = bpe_seg.w
      |  JOIN documents d ON bpe_wx.doc_id = d.doc_id)
      |SELECT source, count(*) AS n_words,
      |  CAST(sum(t) AS BIGINT) AS n_tokens_bpe,
      |  (CAST(sum(t) AS BIGINT) * 10000) // nullif(count(*), 0) AS fertility_bp
      |FROM tok GROUP BY source ORDER BY source""".stripMargin))

  /** T5-style SPAN CORRUPTION accounting (Raffel et al. 2020): the
    * masking step between packing and pretraining, made deterministic so
    * both engines replay every decision. Position p of document d is
    * masked iff the first two hex digits of md5(d || ':' || p) read as
    * an integer < 38 (38/256 ≈ the 15% corruption rate); adjacent
    * masked positions merge into one span, each span becoming one
    * sentinel in the encoder input while its tokens move to the target.
    * Emits per document: n_tokens, n_masked, n_spans, and the derived
    * encoder/target lengths (input = kept + sentinels, target = masked
    * + sentinels + 1 closing sentinel; zero-token docs emit 0/0) — the
    * length accounting a packing budget needs BEFORE materializing the
    * corrupted text. Row-local narrow pass; the oracle replays the md5
    * draw per position and rebuilds spans with a lag window. */
  val mlSpanCorruption: QueryDef = QueryDef(
    "ml_span_corruption",
    (s, d) => {
      val spark = s
      import spark.implicits._
      Tables.documents(s, d)
        .select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val norm = graft.ops.TextOps.normalizeAsciiString(text)
          val ws = if (norm.isEmpty) Array.empty[String] else norm.split(" ")
          val md = java.security.MessageDigest.getInstance("MD5")
          var masked = 0L
          var spans = 0L
          var prevMasked = false
          var p = 0
          while (p < ws.length) {
            md.reset()
            val h = md.digest(s"$id:$p".getBytes("UTF-8"))
            val v = ((h(0) & 0xff).toInt)
            val m = v < 38
            if (m) {
              masked += 1
              if (!prevMasked) spans += 1
            }
            prevMasked = m
            p += 1
          }
          val n = ws.length.toLong
          val input = n - masked + spans
          val target = if (n == 0) 0L else masked + spans + 1
          (id, n, masked, spans, input, target)
        }
        .toDF("doc_id", "n_tokens", "n_masked", "n_spans",
          "n_input_tokens", "n_target_tokens")
        .orderBy("doc_id")
    },
    Some(s"""WITH w AS (
      |  SELECT doc_id, string_split($normalizeSql, ' ') AS ws,
      |    length($normalizeSql) AS nlen
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, CAST(i AS BIGINT) - 1 AS pos,
      |    CAST(concat('0x', substr(md5(doc_id || ':' || (CAST(i AS BIGINT) - 1)), 1, 2)) AS BIGINT) < 38 AS m
      |  FROM w, unnest(range(1, len(ws) + 1, 1)) r(i)
      |  WHERE nlen > 0),
      |sp AS (
      |  SELECT doc_id, m,
      |    CASE WHEN m AND NOT coalesce(lag(m) OVER (PARTITION BY doc_id ORDER BY pos), false)
      |         THEN 1 ELSE 0 END AS span_start
      |  FROM tok),
      |ag AS (
      |  SELECT doc_id, count(*) AS n,
      |    CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS masked,
      |    CAST(sum(span_start) AS BIGINT) AS spans
      |  FROM sp GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(coalesce(ag.n, 0) AS BIGINT) AS n_tokens,
      |  CAST(coalesce(ag.masked, 0) AS BIGINT) AS n_masked,
      |  CAST(coalesce(ag.spans, 0) AS BIGINT) AS n_spans,
      |  CAST(coalesce(ag.n - ag.masked + ag.spans, 0) AS BIGINT) AS n_input_tokens,
      |  CAST(CASE WHEN ag.n IS NULL OR ag.n = 0 THEN 0
      |       ELSE ag.masked + ag.spans + 1 END AS BIGINT) AS n_target_tokens
      |FROM documents d LEFT JOIN ag ON d.doc_id = ag.doc_id
      |ORDER BY d.doc_id""".stripMargin))

  /** END-TO-END LLM DATA PIPELINE in one oracle-gated call — the
    * composition a pretraining data team actually runs, each stage an
    * operator this engine already gates individually:
    *
    *   1. QUALITY: the Gopher document rules
    *      ([[graft.ops.TextOps.gopherQualityFlags]]) minus the stop-word
    *      rule (the synthetic corpus holds a single stop word, so that
    *      rule would zero the corpus — the other four discriminate);
    *   2. DEDUP: exact fingerprint dedup, keep-first (min doc_id per
    *      md5 of normalized text);
    *   3. TOKENIZE: a BPE vocabulary TRAINED ON THE SURVIVING corpus
    *      (64 merges — the tokenizer a pipeline trains after cleaning,
    *      not before) and applied row-locally;
    *   4. PACK: 512-token concatenated chunks per source
    *      (ceil(Σtokens/512) — contiguous packing within a source).
    *
    * Output per source: docs in → after quality → after dedup, BPE
    * token mass, and packed chunk count. The oracle replays all four
    * stages — rule census, keep-first dedup, RECURSIVE-CTE tokenizer
    * training over the filtered relation, application, packing — as one
    * SQL statement, so a divergence anywhere in the chain breaks the
    * gate. Scale: stages 1–2 are one narrow pass + one fingerprint
    * aggregate; training is the capped collect; application is narrow;
    * the rollup is map-combined. */
  val pipelineLlmData: QueryDef = QueryDef(
    "pipeline_llm_data",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val flags = TextOps.gopherQualityFlags(docs, "doc_id", "text")
        .select(col("doc_id"),
          (col("pass_word_count") && col("pass_mean_word_len") &&
            col("pass_symbol_ratio") && col("pass_alpha_words")).as("q"))
      val withQ = docs.join(flags, "doc_id")
      val quality = withQ.filter(col("q"))
      val fp = quality.withColumn("fp", TextOps.fingerprint(col("text")))
      val keepIds = fp.groupBy(col("fp"))
        .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
      val deduped = fp.join(keepIds, Seq("doc_id"), "left_semi")
      val merges = Bpe.train(deduped, "text", numMerges = 64, maxTrainWords = bpeCap)
      val counts = Bpe.tokenCounts(deduped, "doc_id", "text", merges)
        .join(deduped.select(col("doc_id"), col("source")), "doc_id")
      val perSource = counts.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs_dedup"),
          sum(col("n_tokens_bpe")).as("n_tokens_bpe"))
        .withColumn("n_chunks",
          expr("(n_tokens_bpe + 511) div 512"))
      val census = withQ.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs_in"),
          sum(when(col("q"), 1L).otherwise(0L)).as("n_docs_quality"))
      census.join(perSource, Seq("source"), "left")
        .select(col("source"), col("n_docs_in"), col("n_docs_quality"),
          coalesce(col("n_docs_dedup"), lit(0L)).as("n_docs_dedup"),
          coalesce(col("n_tokens_bpe"), lit(0L)).as("n_tokens_bpe"),
          coalesce(col("n_chunks"), lit(0L)).as("n_chunks"))
        .orderBy("source")
    },
    Some(s"""WITH RECURSIVE qf AS (
      |  SELECT doc_id, source, text,
      |    (CASE WHEN len($normalizeSql) = 0 THEN 0
      |          ELSE len(string_split($normalizeSql, ' ')) END) AS nw,
      |    (CASE WHEN len($normalizeSql) = 0 THEN 0
      |          ELSE len($normalizeSql) - len(string_split($normalizeSql, ' ')) + 1 END) AS chars,
      |    (length(coalesce(text, '')) - length(replace(coalesce(text, ''), '...', ''))) // 3
      |      + (length(coalesce(text, '')) - length(replace(coalesce(text, ''), '#', ''))) AS sym,
      |    len(list_filter(string_split($normalizeSql, ' '),
      |        x -> regexp_matches(x, '[a-z]'))) AS alpha
      |  FROM documents),
      |q AS (
      |  SELECT doc_id, source, text,
      |    (nw >= 50 AND nw <= 100000 AND nw > 0
      |     AND 3 * nw <= chars AND chars <= 10 * nw
      |     AND 10 * sym <= nw AND 5 * alpha >= 4 * nw) AS ok
      |  FROM qf),
      |quality AS (SELECT doc_id, source, text FROM q WHERE ok),
      |fpt AS (SELECT doc_id, source, text, md5($normalizeSql) AS fp FROM quality),
      |keep AS (SELECT min(doc_id) AS doc_id FROM fpt GROUP BY fp),
      |ded AS (SELECT fpt.doc_id, fpt.source, fpt.text
      |        FROM fpt JOIN keep ON fpt.doc_id = keep.doc_id),
      |${Bpe.trainRecursiveCtesSql(normalizeSql, 64, bpeCap, fromRel = "ded")},
      |bpe_wx AS MATERIALIZED (
      |  SELECT doc_id, unnest(string_split($normalizeSql, ' ')) AS w FROM ded),
      |${Bpe.applyRecursiveCtesSql("bpe_wx", 64)},
      |tok AS (
      |  SELECT d.source, d.doc_id, coalesce(a.nt, 0) AS nt
      |  FROM ded d LEFT JOIN (
      |    SELECT doc_id, sum(t) AS nt
      |    FROM bpe_wx JOIN bpe_seg ON bpe_wx.w = bpe_seg.w GROUP BY doc_id) a
      |    ON d.doc_id = a.doc_id),
      |per_source AS (
      |  SELECT source, count(*) AS n_docs_dedup,
      |    CAST(sum(nt) AS BIGINT) AS n_tokens_bpe,
      |    CAST((sum(nt) + 511) // 512 AS BIGINT) AS n_chunks
      |  FROM tok GROUP BY source),
      |census AS (
      |  SELECT source, count(*) AS n_docs_in,
      |    CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_quality
      |  FROM q GROUP BY source)
      |SELECT c.source, c.n_docs_in, c.n_docs_quality,
      |  CAST(coalesce(p.n_docs_dedup, 0) AS BIGINT) AS n_docs_dedup,
      |  CAST(coalesce(p.n_tokens_bpe, 0) AS BIGINT) AS n_tokens_bpe,
      |  CAST(coalesce(p.n_chunks, 0) AS BIGINT) AS n_chunks
      |FROM census c LEFT JOIN per_source p ON c.source = p.source
      |ORDER BY c.source""".stripMargin))

  /** Deterministic CURRICULUM ordering (easy→hard training schedule with
    * intra-bin shuffle): documents ranked into length deciles
    * ([[graft.ops.Sampling.denseIndex]] — the range-partitioned rank, no
    * single-partition window), then given a global training position
    * ordered by (decile asc, md5(doc_id)) — bins are consumed in
    * difficulty order, documents within a bin in deterministic
    * pseudo-random order (the [[sampleEpochShuffle]] hash discipline).
    * The gate pins the schedule's structural contract: per decile, the
    * position range is CONTIGUOUS (max_pos − min_pos + 1 == n_docs) and
    * bins are mutually ordered — the property a resumable curriculum
    * loader depends on. */
  val mixCurriculum: QueryDef = QueryDef(
    "mix_curriculum",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      val n = docs.count()
      val binned = graft.ops.Sampling.denseIndex(docs,
          Seq("n_chars", "doc_id"), "lenrank")
        .withColumn("decile", expr(s"(lenrank * 10) div ${n}L"))
        .withColumn("h", md5(col("doc_id").cast("string")))
      graft.ops.Sampling.denseIndex(binned.select(col("doc_id"), col("decile"),
          col("h")), Seq("decile", "h", "doc_id"), "pos")
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("pos")).as("min_pos"), max(col("pos")).as("max_pos"))
        .withColumn("contiguous",
          col("max_pos") - col("min_pos") + 1 === col("n_docs"))
        .orderBy("decile")
    },
    Some("""WITH r AS (
      |  SELECT doc_id,
      |    row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS lenrank
      |  FROM documents),
      |n AS (SELECT count(*) AS cnt FROM documents),
      |b AS (SELECT doc_id, (lenrank * 10) // cnt AS decile,
      |    md5(CAST(doc_id AS VARCHAR)) AS h
      |  FROM r, n),
      |p AS (SELECT decile,
      |    row_number() OVER (ORDER BY decile, h, doc_id) - 1 AS pos
      |  FROM b)
      |SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n_docs,
      |  min(pos) AS min_pos, max(pos) AS max_pos,
      |  max(pos) - min(pos) + 1 = count(*) AS contiguous
      |FROM p GROUP BY decile ORDER BY decile""".stripMargin))

  /** [[graft.ops.Stats.pcaPowerTop]]'s unrolled replay: gram statistics
    * from the exploded self-join (the emb_covariance oracle shape, d×
    * heavier than the engine's one-pass kernel — that asymmetry is the
    * point), covariance in HUGEINT, the truncating downscale, then
    * `iters` matvec+renorm rounds as CTEs. Every value BIGINT-exact.
    * Every chained CTE is MATERIALIZED: DuckDB inlines plain CTEs, and
    * each round references the previous one twice (via w$t and m$t), so
    * un-hinted the replay re-evaluates the whole upstream chain 2^iters
    * times — measured 294 s at sf0.01 vs 0.16 s materialized, identical
    * values (the r13 gate's 250 s hot spot). */
  private def pcaOracleSql(d: Int, iters: Int): String = {
    val rounds = (1 to iters).map { t =>
      s"""w$t AS MATERIALIZED (SELECT cs.i AS dim, CAST(sum(cs.cs * r${t - 1}.v) AS BIGINT) AS w
         |  FROM cs JOIN r${t - 1} ON cs.j = r${t - 1}.dim GROUP BY cs.i),
         |m$t AS MATERIALIZED (SELECT greatest(CAST(1 AS BIGINT),
         |  CAST(max(abs(w)) AS BIGINT) // 1000000) AS dnm FROM w$t),
         |r$t AS MATERIALIZED (SELECT dim,
         |  CASE WHEN w < 0 THEN -((-w) // dnm) ELSE w // dnm END AS v
         |  FROM w$t CROSS JOIN m$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH v AS MATERIALIZED (
      |  SELECT vec_id, list_transform(embedding[1:$d],
      |    x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xm
      |  FROM embeddings),
      |ex AS MATERIALIZED (SELECT vec_id, generate_subscripts(xm, 1) AS dim, unnest(xm) AS x FROM v),
      |nv AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
      |s AS MATERIALIZED (SELECT dim, CAST(sum(x) AS BIGINT) AS sd FROM ex GROUP BY dim),
      |g AS MATERIALIZED (SELECT a.dim AS i, b.dim AS j, CAST(sum(a.x * b.x) AS BIGINT) AS gij
      |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id GROUP BY 1, 2),
      |c AS MATERIALIZED (SELECT i, j,
      |    CAST(n AS HUGEINT) * gij - CAST(sa.sd AS HUGEINT) * sb.sd AS cij
      |  FROM g JOIN s sa ON g.i = sa.dim JOIN s sb ON g.j = sb.dim CROSS JOIN nv),
      |sc AS MATERIALIZED (SELECT greatest(CAST(1 AS HUGEINT),
      |  max(abs(cij)) // 10000000000) AS s FROM c),
      |cs AS MATERIALIZED (SELECT i, j,
      |  CAST(CASE WHEN cij < 0 THEN -((-cij) // sc.s) ELSE cij // sc.s END
      |    AS BIGINT) AS cs
      |  FROM c CROSS JOIN sc),
      |r0 AS MATERIALIZED (SELECT DISTINCT dim, CAST(1000000 AS BIGINT) AS v FROM ex),
      |$rounds
      |SELECT CAST(dim AS BIGINT) AS dim, v AS v_ppm FROM r$iters ORDER BY dim""".stripMargin
  }

  /** Top principal component of the embedding corpus by integer power
    * iteration ([[graft.ops.Stats.pcaPowerTop]]): one distributed gram
    * pass, driver-side d×d eigensolve over bounded state — the PCA-head
    * recipe that stays one narrow corpus aggregation at 100 TB. First 8
    * dims, 8 rounds; unconverged-or-not, both engines replay identical
    * integers (the k-means/PageRank ladder). */
  val embPcaPower: QueryDef = QueryDef(
    "emb_pca_power",
    (s, d) => graft.ops.Stats.pcaPowerTop(
      Tables.embeddings(s, d), "embedding", d = 8, iters = 8).orderBy("dim"),
    Some(pcaOracleSql(8, 8)))

  /** EXACT AUC of a classifier gate — the quality-filter calibration
    * number every curation pipeline reports before trusting a model
    * threshold. Computed as the Mann–Whitney U statistic in pure integer
    * algebra: scores bucket (ties are real and handled by the ½-credit
    * midrank rule, doubled to stay integer — U2 = Σ_s p(s)·(2·negBelow(s)
    * + neg(s))), then auc_ppm = 10⁶·U2 div (2·P·N). Scale shape: the
    * corpus reduces to one hash aggregation per score bucket; the
    * cumulative window runs over the BUCKET relation (cardinality =
    * distinct scores, not corpus rows), so the single-partition window
    * the repo bans on corpus data is bounded and cheap here. */
  val mlAuc: QueryDef = QueryDef(
    "ml_auc",
    (s, d) => graft.ops.Stats.aucExact(Tables.documents(s, d),
      expr("n_chars div 50"), col("lang") === "en"),
    Some("""WITH per AS (
      |  SELECT n_chars // 50 AS score,
      |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS p,
      |    CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS ng
      |  FROM documents GROUP BY 1),
      |c AS (
      |  SELECT p, ng, CAST(COALESCE(sum(ng) OVER (ORDER BY score
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS nb
      |  FROM per),
      |u AS (SELECT CAST(sum(p * (2 * nb + ng)) AS BIGINT) AS u2,
      |  CAST(sum(p) AS BIGINT) AS n_pos, CAST(sum(ng) AS BIGINT) AS n_neg FROM c)
      |SELECT n_pos, n_neg,
      |  CAST((1000000 * u2) // (2 * n_pos * n_neg) AS BIGINT) AS auc_ppm
      |FROM u""".stripMargin))

  /** Classifier-gate CALIBRATION curve: per score bin, the observed
    * positive rate in exact basis points — the reliability-diagram table
    * that decides whether a model score can be thresholded as a
    * probability. One hash aggregation; bin cardinality bounded. */
  val mlCalibrationBins: QueryDef = QueryDef(
    "ml_calibration_bins",
    (s, d) => Tables.documents(s, d)
      .select(expr("n_chars div 50").as("bin"),
        (col("lang") === "en").cast("long").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("(10000 * n_pos) div n").as("pos_rate_bp"))
      .orderBy("bin"),
    Some("""SELECT n_chars // 50 AS bin, count(*) AS n,
      |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      |  CAST((10000 * sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)) // count(*)
      |    AS BIGINT) AS pos_rate_bp
      |FROM documents GROUP BY 1 ORDER BY bin""".stripMargin))

  /** Two-sample Kolmogorov–Smirnov DRIFT statistic, exact — the
    * distribution-shift gate between corpus slices (here: 4-char vs
    * 5-char source families over document length). D = max|ECDF_a −
    * ECDF_b| evaluated WITHOUT floats: at every observed value,
    * |ca·n_b − cb·n_a| is an exact integer, the max picks the earliest
    * threshold on ties, and d_ppm = 10⁶·max div (n_a·n_b). Same scale
    * shape as [[mlAuc]]: corpus → one hash aggregation per distinct
    * value, cumulative window over the bounded value relation, TakeOrdered
    * head. */
  val mlKsDrift: QueryDef = QueryDef(
    "ml_ks_drift",
    (s, d) => {
      val per = Tables.documents(s, d)
        .select(col("n_chars").as("score"),
          (length(col("source")) === 4).cast("long").as("ya"))
        .groupBy(col("score"))
        .agg(sum(col("ya")).as("pa"), (count(lit(1)) - sum(col("ya"))).as("pb"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("score"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      per
        .select(col("score"),
          sum(col("pa")).over(w).as("ca"), sum(col("pb")).over(w).as("cb"))
        .crossJoin(broadcast(per.agg(sum(col("pa")).as("n_a"),
          sum(col("pb")).as("n_b"))))
        .withColumn("dnum", abs(col("ca") * col("n_b") - col("cb") * col("n_a")))
        .orderBy(col("dnum").desc, col("score").asc)
        .limit(1)
        .select(col("n_a"), col("n_b"),
          expr("(1000000 * dnum) div (n_a * n_b)").as("d_ppm"),
          col("score").as("ks_at"))
    },
    Some("""WITH per AS (
      |  SELECT n_chars AS score,
      |    CAST(sum(CASE WHEN length(source) = 4 THEN 1 ELSE 0 END) AS BIGINT) AS pa,
      |    CAST(sum(CASE WHEN length(source) = 4 THEN 0 ELSE 1 END) AS BIGINT) AS pb
      |  FROM documents GROUP BY 1),
      |t AS (SELECT CAST(sum(pa) AS BIGINT) AS n_a, CAST(sum(pb) AS BIGINT) AS n_b FROM per),
      |c AS (
      |  SELECT score,
      |    CAST(sum(pa) OVER (ORDER BY score
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
      |    CAST(sum(pb) OVER (ORDER BY score
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
      |  FROM per),
      |d AS (SELECT score, abs(ca * n_b - cb * n_a) AS dnum, n_a, n_b
      |  FROM c CROSS JOIN t)
      |SELECT n_a, n_b,
      |  CAST((1000000 * dnum) // (n_a * n_b) AS BIGINT) AS d_ppm,
      |  score AS ks_at
      |FROM d ORDER BY dnum DESC, score ASC LIMIT 1""".stripMargin))

  /** Token-budget domain mixing: training jobs budget in TOKENS, not
    * documents — each source contributes documents in deterministic
    * md5 order until its token quota fills (the last document may
    * overshoot; greedy prefix fill, the standard mixture-assembly rule).
    * Reports what each source actually contributed plus the overshoot.
    *
    * Scale shape — SHARDED PREFIX SUM (the [[graft.ops.Packing]] recipe),
    * not one running-sum window per source: realistic pretraining mixes
    * have 10–50 sources, so a per-source window is 10–50 serial tasks
    * each sorting its source's ENTIRE document set. Instead the md5 sort
    * key's 2-hex-char prefix partitions each source's order into 256
    * contiguous shards: (1) one map-combined pass reduces the corpus to
    * the sources×256 shard-token table; (2) a window over that BOUNDED
    * table yields each shard's cumulative offset; (3) shards whose offset
    * already meets the quota are pruned — cum_before ≥ offset, so no doc
    * in them can be kept; (4) the pruned offsets broadcast back and an
    * inner join drops almost the whole corpus before (5) the in-shard
    * prefix window runs per (source, shard) — parallel, and only over
    * boundary-shard rows (~quota tokens per source, not ~N/#sources).
    * cum_before = offset + in-shard prefix is EXACTLY the per-source
    * running sum, so the oracle is unchanged. */
  val mixTokenBudget: QueryDef = QueryDef(
    "mix_token_budget",
    (s, d) => {
      val quota = 500L
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
          md5(col("doc_id").cast("string")).as("hs"))
        .withColumn("shard", substring(col("hs"), 1, 2))
      val shardSums = docs.groupBy(col("source"), col("shard"))
        .agg(sum(col("n_tokens")).as("shard_tokens"))
      val offW = Window.partitionBy(col("source")).orderBy(col("shard").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = shardSums
        .withColumn("offset",
          coalesce(sum(col("shard_tokens")).over(offW), lit(0L)))
        .filter(col("offset") < quota)
        .select(col("source"), col("shard"), col("offset"))
      val inShard = Window.partitionBy(col("source"), col("shard"))
        .orderBy(col("hs").asc, col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      docs.join(broadcast(offsets), Seq("source", "shard"))
        .withColumn("cum_before",
          col("offset") + coalesce(sum(col("n_tokens")).over(inShard), lit(0L)))
        .filter(col("cum_before") < quota)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs_kept"),
          sum(col("n_tokens")).as("tokens_kept"))
        .withColumn("overshoot",
          greatest(col("tokens_kept") - quota, lit(0L)))
        .orderBy("source")
    },
    Some("""WITH t AS (
      |  SELECT source, doc_id,
      |    CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_tokens,
      |    md5(CAST(doc_id AS VARCHAR)) AS hs
      |  FROM documents),
      |c AS (
      |  SELECT source, n_tokens,
      |    coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY hs, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      |  FROM t)
      |SELECT source, count(*) AS n_docs_kept,
      |  CAST(sum(n_tokens) AS BIGINT) AS tokens_kept,
      |  greatest(CAST(sum(n_tokens) AS BIGINT) - 500, 0) AS overshoot
      |FROM c WHERE cum_before < 500
      |GROUP BY source ORDER BY source""".stripMargin))

  /** TEMPERATURE-WEIGHTED token budgets — [[mixTemperature]]'s α=1/2
    * re-weighting COMPOSED with [[mixTokenBudget]]'s greedy fill: the
    * global 10k-token budget splits across sources ∝ the micro-snapped
    * temperature weights (exact integer division), then each source fills
    * its quota in deterministic md5 order. This is the actual mixture-
    * assembly step of a multilingual/multi-domain training run: small
    * sources get super-proportional budgets, and the budget unit is
    * tokens. Two corpus scans (one map-combined counts pass that yields
    * the broadcast quota table, one fill pass); the fill is the same
    * SHARDED prefix sum as [[mixTokenBudget]] — per-shard sums over a
    * bounded sources×256 table, offsets broadcast back, shards past their
    * source's quota pruned before the per-(source, shard) window — so no
    * task ever sorts a whole source. */
  val mixTokenBudgetTemperature: QueryDef = QueryDef(
    "mix_token_budget_temperature",
    (s, d) => {
      val whole = Window.partitionBy()
      val quotas = Tables.documents(s, d).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("total", sum(col("n_docs")).over(whole))
        .withColumn("w_micro",
          round(sqrt(col("n_docs").cast("double") / col("total").cast("double"))
            * 1000000).cast("long"))
        .withColumn("w_total", sum(col("w_micro")).over(whole))
        .select(col("source"),
          expr("(10000 * w_micro) div w_total").as("quota_tokens"))
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
          md5(col("doc_id").cast("string")).as("hs"))
        .withColumn("shard", substring(col("hs"), 1, 2))
      val shardSums = docs.groupBy(col("source"), col("shard"))
        .agg(sum(col("n_tokens")).as("shard_tokens"))
      val offW = Window.partitionBy(col("source")).orderBy(col("shard").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = shardSums
        .join(quotas, "source")
        .withColumn("offset",
          coalesce(sum(col("shard_tokens")).over(offW), lit(0L)))
        .filter(col("offset") < col("quota_tokens"))
        .select(col("source"), col("shard"), col("offset"), col("quota_tokens"))
      val inShard = Window.partitionBy(col("source"), col("shard"))
        .orderBy(col("hs").asc, col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      docs.join(broadcast(offsets), Seq("source", "shard"))
        .withColumn("cum_before",
          col("offset") + coalesce(sum(col("n_tokens")).over(inShard), lit(0L)))
        .filter(col("cum_before") < col("quota_tokens"))
        .groupBy(col("source"))
        .agg(first(col("quota_tokens")).as("quota_tokens"),
          count(lit(1)).as("n_docs_kept"),
          sum(col("n_tokens")).as("tokens_kept"))
        .withColumn("overshoot",
          greatest(col("tokens_kept") - col("quota_tokens"), lit(0L)))
        .orderBy("source")
    },
    Some("""WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM c),
      |m AS (SELECT source, n_docs,
      |        CAST(round(sqrt(CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE))
      |          * 1000000) AS BIGINT) AS w_micro
      |      FROM c CROSS JOIN t),
      |mt AS (SELECT CAST(sum(w_micro) AS BIGINT) AS w_total FROM m),
      |q AS (SELECT source, (10000 * w_micro) // w_total AS quota_tokens
      |      FROM m CROSS JOIN mt),
      |d AS (
      |  SELECT source, doc_id,
      |    CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_tokens,
      |    md5(CAST(doc_id AS VARCHAR)) AS hs
      |  FROM documents),
      |f AS (
      |  SELECT d.source, n_tokens, quota_tokens,
      |    coalesce(sum(n_tokens) OVER (PARTITION BY d.source ORDER BY hs, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      |  FROM d JOIN q ON d.source = q.source)
      |SELECT source, any_value(quota_tokens) AS quota_tokens,
      |  count(*) AS n_docs_kept,
      |  CAST(sum(n_tokens) AS BIGINT) AS tokens_kept,
      |  greatest(CAST(sum(n_tokens) AS BIGINT) - any_value(quota_tokens), 0) AS overshoot
      |FROM f WHERE cum_before < quota_tokens
      |GROUP BY source ORDER BY source""".stripMargin))

  /** Leave-one-out target encoding (the leakage-safe categorical encoder:
    * each row's category is replaced by the mean target of all OTHER rows
    * in that category — including the row itself would leak the label).
    * Target = order total price by customer market segment. Determinism
    * recipe: prices snap to exact integer cents, per-segment sums are
    * exact integer aggregation (map-side combined, 5 groups), the
    * encoded value is ONE identical IEEE division at the boundary.
    * Degenerate single-row categories nullif out identically on both
    * engines (data-independent gate). Scale shape: the segment stats
    * table is tiny and broadcasts back — the fact table never shuffles. */
  val mlTargetEncodeLoo: QueryDef = QueryDef(
    "ml_target_encode_loo",
    (s, d) => {
      val o = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment").as("segment"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("segment"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val seg = o.groupBy(col("segment"))
        .agg(sum(col("cents")).as("seg_cents"), count(lit(1)).as("seg_n"))
      o.join(broadcast(seg), "segment")
        .select(col("o_orderkey"), col("segment"),
          round((col("seg_cents") - col("cents")).cast("double") /
            nullif((col("seg_n") - 1) * 100, lit(0)).cast("double"), 4)
            .as("te_loo"))
        .orderBy("o_orderkey")
    },
    Some("""WITH o AS (
      |  SELECT o_orderkey, c_mktsegment AS segment,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |seg AS (
      |  SELECT segment, CAST(sum(cents) AS BIGINT) AS seg_cents,
      |    count(*) AS seg_n
      |  FROM o GROUP BY segment)
      |SELECT o_orderkey, o.segment,
      |  round(CAST(seg_cents - cents AS DOUBLE) /
      |        CAST(nullif((seg_n - 1) * 100, 0) AS DOUBLE), 4) AS te_loo
      |FROM o JOIN seg ON o.segment = seg.segment
      |ORDER BY o_orderkey""".stripMargin))

  /** Chi-square feature selection: association strength between token
    * presence and document source for a fixed probe vocabulary — the
    * classic supervised feature-selection statistic, computed over the
    * full 2×K presence/source contingency through the closed form
    * χ² = Σ_s (N·O_s − n_w·n_s)² / (N·n_s·n_w·(N−n_w)): the deviation
    * N·O_s − n_w·n_s is an EXACT DECIMAL(38,0)/HUGEINT integer (it is ~N²
    * and wraps Int64 near 1e5 docs; the (absent, s) cells fold in
    * algebraically — they share the same squared deviation), while its
    * square and the N⁴-magnitude denominator run as an order-pinned IEEE
    * double chain written identically in both engines. Each per-source
    * term is snapped to integer micro-units, then summed exactly, so
    * per-word totals are order-independent across engines (the
    * mix_temperature recipe).
    * Scale shape: one scan → distinct (doc, word) presence pairs for the
    * probe set only (filter pushed before the distinct), map-combined
    * counts; the dense word×source grid is probe-sized and broadcast. */
  val mlChi2Tokens: QueryDef = QueryDef(
    "ml_chi2_tokens",
    (s, d) => {
      val probe = Seq("spark", "merge", "window", "table", "query", "scan")
      val docs = Tables.documents(s, d)
      val present = docs
        .select(col("doc_id"), col("source"),
          explode(TextOps.words(col("text"))).as("w"))
        .filter(col("w").isin(probe: _*))
        .select("doc_id", "source", "w").distinct()
      val nTotal = docs.agg(count(lit(1)).as("n_total"))
      val bySrc = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
      val byWord = present.groupBy(col("w"))
        .agg(countDistinct(col("doc_id")).as("n_w"))
      val obs = present.groupBy(col("w"), col("source"))
        .agg(count(lit(1)).as("o_ws"))
      // dev is an EXACT integer in DECIMAL(38,0)/HUGEINT — n_total·o_ws
      // is ~N² and wraps Int64 near 1e5 docs; its square and the
      // N⁴-magnitude denominator move to an order-pinned double chain
      // (counts < 2⁵³ convert exactly; each IEEE product rounds
      // identically in both engines), keeping the statistic exact-interior
      // to N ≲ 1e19 docs with zero overflow beyond that.
      val dev = (col("n_total").cast("decimal(19,0)") * col("o_ws")
        - col("n_w").cast("decimal(19,0)") * col("n_s")).cast("double")
      val denom = nullif(
        col("n_total").cast("double") * col("n_s").cast("double")
          * col("n_w").cast("double")
          * (col("n_total").cast("double") - col("n_w").cast("double")),
        lit(0.0))
      byWord.crossJoin(broadcast(bySrc))
        .join(obs, Seq("w", "source"), "left")
        .na.fill(0L, Seq("o_ws"))
        .crossJoin(broadcast(nTotal))
        .withColumn("term_micro",
          round(dev * dev / denom * 1000000).cast("long"))
        .groupBy(col("w"))
        .agg(first(col("n_w")).as("n_docs_with"),
          sum(col("term_micro")).as("chi2_micro"))
        .select(col("w").as("word"), col("n_docs_with"), col("chi2_micro"),
          (col("chi2_micro").cast("double") / lit(1000000.0)).as("chi2"))
        .orderBy("word")
    },
    Some(s"""WITH present AS (
      |  SELECT DISTINCT doc_id, source, w
      |  FROM (SELECT doc_id, source,
      |          unnest(string_split($normalizeSql, ' ')) AS w
      |        FROM documents)
      |  WHERE w IN ('spark', 'merge', 'window', 'table', 'query', 'scan')),
      |t AS (SELECT count(*) AS n_total FROM documents),
      |src AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source),
      |wrd AS (SELECT w, count(DISTINCT doc_id) AS n_w FROM present GROUP BY w),
      |obs AS (SELECT w, source, count(*) AS o_ws FROM present GROUP BY w, source),
      |grid AS (
      |  SELECT wrd.w, wrd.n_w, src.source, src.n_s,
      |    coalesce(obs.o_ws, 0) AS o_ws, t.n_total
      |  FROM wrd CROSS JOIN src
      |  LEFT JOIN obs ON wrd.w = obs.w AND src.source = obs.source
      |  CROSS JOIN t),
      |terms AS (
      |  SELECT w, n_w,
      |    CAST(round(
      |      CAST(CAST(n_total AS HUGEINT) * o_ws - CAST(n_w AS HUGEINT) * n_s AS DOUBLE)
      |      * CAST(CAST(n_total AS HUGEINT) * o_ws - CAST(n_w AS HUGEINT) * n_s AS DOUBLE)
      |      / nullif(CAST(n_total AS DOUBLE) * CAST(n_s AS DOUBLE)
      |               * CAST(n_w AS DOUBLE)
      |               * (CAST(n_total AS DOUBLE) - CAST(n_w AS DOUBLE)), 0)
      |      * 1000000) AS BIGINT) AS term_micro
      |  FROM grid)
      |SELECT w AS word, n_w AS n_docs_with,
      |  CAST(sum(term_micro) AS BIGINT) AS chi2_micro,
      |  CAST(CAST(sum(term_micro) AS BIGINT) AS DOUBLE) / 1000000.0 AS chi2
      |FROM terms GROUP BY w, n_w ORDER BY word""".stripMargin))

  // the text_quality_model scoring CTEs, reused by the classifier-gate
  // audits below (same md5-bucket linear model, same integer weights)
  private def modelScoreSql(extraCols: String): String = {
    val u64 = "18446744073709551616::HUGEINT"
    val i63 = "9223372036854775808::HUGEINT"
    def md5u(e: String) =
      s"""(CAST(concat('0x', substr(md5($e), 1, 8)) AS BIGINT)::HUGEINT * 4294967296::HUGEINT
         | + CAST(concat('0x', substr(md5($e), 9, 8)) AS BIGINT)::HUGEINT)""".stripMargin
    s"""w AS (
      |  SELECT doc_id, unnest(string_split($normalizeSql, ' ')) AS w FROM documents),
      |wn AS (SELECT doc_id, w FROM w WHERE length(w) > 0),
      |bkt AS (SELECT doc_id, CAST(${md5u("w")} % 4096 AS BIGINT) AS b FROM wn),
      |wt AS (SELECT doc_id,
      |  (CASE WHEN uw >= $i63 THEN uw - $u64 ELSE uw END % 7 + 7) % 7 - 3 AS wt
      |  FROM (SELECT doc_id, ${md5u("'w:' || b")} AS uw FROM bkt)),
      |ms AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS score FROM wt GROUP BY doc_id),
      |scored AS (
      |  SELECT d.doc_id, coalesce(ms.score, 0) AS score$extraCols
      |  FROM documents d LEFT JOIN ms USING (doc_id))""".stripMargin
  }

  /** Spark-side twin of [[modelScoreSql]]: the row-local
    * [[graft.functions.HashedBagScore]] kernel plus any carried columns —
    * zero shuffles, fused with the scan. */
  private def modelScored(docs: org.apache.spark.sql.DataFrame) = {
    val toks = filter(TextOps.words(col("text")), w => length(w) > 0)
    docs.select(col("doc_id"),
      coalesce(graft.functions.hashed_bag_score(toks,
        typedLit(TextOps.pseudoWeights(4096))), lit(0L)).as("score"),
      (col("lang") === "en").as("label"))
  }

  /** Classifier-gate confusion audit: the hashed linear quality model's
    * keep decision (score > 0) against the corpus language label, with
    * precision / recall / F1 — the acceptance sheet for any learned
    * filter before it gates a training mix. All four confusion cells are
    * exact integer sums off ONE row-local scoring scan (no shuffle before
    * the single-row aggregate); each metric is one IEEE division (F1 in
    * its integer 2tp/(2tp+fp+fn) form), nullif-guarded. */
  val mlConfusionThreshold: QueryDef = QueryDef(
    "ml_confusion_threshold",
    (s, d) => {
      val D = (c: Column) => c.cast("double")
      modelScored(Tables.documents(s, d))
        .select(col("label"), (col("score") > 0).as("pred"))
        .agg(
          sum(when(col("label") && col("pred"), 1L).otherwise(0L)).as("tp"),
          sum(when(!col("label") && col("pred"), 1L).otherwise(0L)).as("fp"),
          sum(when(col("label") && !col("pred"), 1L).otherwise(0L)).as("fn"),
          sum(when(!col("label") && !col("pred"), 1L).otherwise(0L)).as("tn"))
        .select(col("tp"), col("fp"), col("fn"), col("tn"),
          round(D(col("tp")) / D(nullif(col("tp") + col("fp"), lit(0L))), 4)
            .as("precision"),
          round(D(col("tp")) / D(nullif(col("tp") + col("fn"), lit(0L))), 4)
            .as("recall"),
          round(D(lit(2L) * col("tp")) /
            D(nullif(lit(2L) * col("tp") + col("fp") + col("fn"), lit(0L))), 4)
            .as("f1"))
    },
    Some(s"""WITH ${modelScoreSql(", d.lang = 'en' AS label")},
      |cells AS (
      |  SELECT
      |    CAST(sum(CASE WHEN label AND score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |    CAST(sum(CASE WHEN NOT label AND score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      |    CAST(sum(CASE WHEN label AND score <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
      |    CAST(sum(CASE WHEN NOT label AND score <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
      |  FROM scored)
      |SELECT tp, fp, fn, tn,
      |  round(CAST(tp AS DOUBLE) / CAST(nullif(tp + fp, 0) AS DOUBLE), 4) AS precision,
      |  round(CAST(tp AS DOUBLE) / CAST(nullif(tp + fn, 0) AS DOUBLE), 4) AS recall,
      |  round(CAST(2 * tp AS DOUBLE) /
      |        CAST(nullif(2 * tp + fp + fn, 0) AS DOUBLE), 4) AS f1
      |FROM cells""".stripMargin))

  /** Decile gains/lift table for the quality model: corpus ranked by
    * model score, cut into 10 equal-population bins, cumulative positive
    * rate vs the base rate — the curve a curation team reads before
    * picking a keep threshold. The global ranking uses the
    * range-partitioned [[graft.ops.Sampling.denseIndex]] (NO
    * single-partition window over the corpus); lift is the exact integer
    * ratio (cum_pos·total_docs)/(cum_docs·total_pos), one IEEE division
    * at the boundary. */
  val mlLiftCurve: QueryDef = QueryDef(
    "ml_lift_curve",
    (s, d) => {
      val scored = modelScored(Tables.documents(s, d))
        .withColumn("negscore", -col("score"))
      val (idx, n) = Sampling.denseIndexWithCount(
        scored, Seq("negscore", "doc_id"), "idx")
      val whole = Window.partitionBy()
        .orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
      val all = Window.partitionBy()
      idx.withColumn("decile", expr(s"(idx * 10) div ${n}L"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"))
        .withColumn("cum_docs", sum(col("n_docs")).over(whole))
        .withColumn("cum_pos", sum(col("n_pos")).over(whole))
        .withColumn("tot_docs", sum(col("n_docs")).over(all))
        .withColumn("tot_pos", sum(col("n_pos")).over(all))
        .select(col("decile"), col("n_docs"), col("n_pos"), col("cum_pos"),
          round((col("cum_pos") * col("tot_docs")).cast("double") /
            nullif(col("cum_docs") * col("tot_pos"), lit(0L)).cast("double"), 4)
            .as("lift"))
        .orderBy("decile")
    },
    Some(s"""WITH ${modelScoreSql(", d.lang = 'en' AS label")},
      |n AS (SELECT count(*) AS n FROM scored),
      |r AS (
      |  SELECT label,
      |    (row_number() OVER (ORDER BY score DESC, doc_id ASC) - 1) * 10 // n AS decile
      |  FROM scored CROSS JOIN n),
      |b AS (
      |  SELECT decile, count(*) AS n_docs,
      |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
      |  FROM r GROUP BY decile),
      |c AS (
      |  SELECT decile, n_docs, n_pos,
      |    CAST(sum(n_docs) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_docs,
      |    CAST(sum(n_pos) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
      |    CAST(sum(n_docs) OVER () AS BIGINT) AS tot_docs,
      |    CAST(sum(n_pos) OVER () AS BIGINT) AS tot_pos
      |  FROM b)
      |SELECT decile, n_docs, n_pos, cum_pos,
      |  round(CAST(cum_pos * tot_docs AS DOUBLE) /
      |        CAST(nullif(cum_docs * tot_pos, 0) AS DOUBLE), 4) AS lift
      |FROM c ORDER BY decile""".stripMargin))

  /** Scalar int8 quantization error audit (the SQ8 codec every ANN
    * deployment runs): per dimension, min/max-scaled 8-bit codes,
    * reconstruction, and the exact sum of squared errors. Works entirely
    * on the micro-unit integer lattice (the emb_zscore recipe: snap each
    * float once, then EVERYTHING — codes, reconstructions, errors — is
    * integer arithmetic with two spec'd roundings), so the error
    * accounting is order-independent and cross-engine exact. One explode
    * scan → 64-group stats → broadcast back (the corpus never
    * shuffles). */
  val embSq8Error: QueryDef = QueryDef(
    "emb_sq8_error",
    (s, d) => {
      val ex = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
          round(col("x").cast("double") * 1000000).cast("long").as("xm"))
      val stats = ex.groupBy(col("dim"))
        .agg(min(col("xm")).as("mn"), max(col("xm")).as("mx"),
          count(lit(1)).as("n"))
      ex.join(broadcast(stats), "dim")
        .withColumn("q",
          round(((col("xm") - col("mn")) * 255).cast("double") /
            nullif(col("mx") - col("mn"), lit(0L)).cast("double")).cast("long"))
        .withColumn("recon",
          col("mn") + round((col("q") * (col("mx") - col("mn"))).cast("double")
            / lit(255.0)).cast("long"))
        .withColumn("err", (col("xm") - col("recon")) * (col("xm") - col("recon")))
        .groupBy(col("dim"))
        .agg(first(col("mn")).as("x_min_micro"), first(col("mx")).as("x_max_micro"),
          count(lit(1)).as("n"), sum(col("err")).as("sse_micro2"))
        .withColumn("mse_micro2", expr("sse_micro2 div n"))
        .orderBy("dim")
    },
    Some("""WITH ex AS (
      |  SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
      |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS xm
      |  FROM embeddings),
      |stats AS (
      |  SELECT dim, CAST(min(xm) AS BIGINT) AS mn, CAST(max(xm) AS BIGINT) AS mx,
      |    count(*) AS n
      |  FROM ex GROUP BY dim),
      |qz AS (
      |  SELECT ex.dim, mn, mx, n,
      |    CAST(round(CAST((xm - mn) * 255 AS DOUBLE) /
      |      CAST(nullif(mx - mn, 0) AS DOUBLE)) AS BIGINT) AS q, xm
      |  FROM ex JOIN stats ON ex.dim = stats.dim),
      |rc AS (
      |  SELECT dim, mn, mx, n, xm,
      |    mn + CAST(round(CAST(q * (mx - mn) AS DOUBLE) / 255.0) AS BIGINT) AS recon
      |  FROM qz)
      |SELECT dim, mn AS x_min_micro, mx AS x_max_micro, count(*) AS n,
      |  CAST(sum((xm - recon) * (xm - recon)) AS BIGINT) AS sse_micro2,
      |  CAST(sum((xm - recon) * (xm - recon)) AS BIGINT) // CAST(count(*) AS BIGINT) AS mse_micro2
      |FROM rc GROUP BY dim, mn, mx ORDER BY dim""".stripMargin))

  /** Per-source DATASHEET (the "datasets for datasets" card a curated
    * corpus ships with): volume (docs/tokens/mean length), exact-dup
    * exposure, and the quality-model keep rate — every gate's headline
    * number in ONE table. Composes the existing fingerprint, token-count
    * and hashed-model expressions in a single corpus scan; the duplicated-
    * fingerprint set is output-bounded and broadcasts back; the final
    * aggregate is one map-combined 20-group pass. */
  val pipelineDatasheet: QueryDef = QueryDef(
    "pipeline_datasheet",
    (s, d) => {
      val toks = filter(TextOps.words(col("text")), w => length(w) > 0)
      val base = Tables.documents(s, d).select(col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextOps.fingerprint(col("text")).as("fp"),
        coalesce(graft.functions.hashed_bag_score(toks,
          typedLit(TextOps.pseudoWeights(4096))), lit(0L)).as("score"))
      val dups = base.groupBy(col("fp")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).select(col("fp"), lit(true).as("is_dup"))
      base.join(broadcast(dups), Seq("fp"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_exact_dup"),
          sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_keep"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("n_tokens").cast("double") /
            nullif(col("n_docs"), lit(0L)).cast("double"), 2).as("mean_tokens"),
          col("n_exact_dup"), col("n_keep"),
          round(col("n_keep").cast("double") /
            nullif(col("n_docs"), lit(0L)).cast("double"), 4).as("keep_rate"))
        .orderBy("source")
    },
    Some(s"""WITH ${modelScoreSql(
        s""", d.source AS source, md5($normalizeSql) AS fp,
           |    CAST(len(regexp_extract_all(d.text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_tokens""".stripMargin)},
      |dups AS (
      |  SELECT fp FROM (SELECT fp, count(*) AS c FROM scored GROUP BY fp)
      |  WHERE c > 1),
      |j AS (
      |  SELECT s.source, s.n_tokens, s.score,
      |    (dups.fp IS NOT NULL) AS is_dup
      |  FROM scored s LEFT JOIN dups ON s.fp = dups.fp)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |  round(CAST(CAST(sum(n_tokens) AS BIGINT) AS DOUBLE) /
      |        CAST(nullif(count(*), 0) AS DOUBLE), 2) AS mean_tokens,
      |  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
      |  CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
      |  round(CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS DOUBLE) /
      |        CAST(nullif(count(*), 0) AS DOUBLE), 4) AS keep_rate
      |FROM j GROUP BY source ORDER BY source""".stripMargin))

  /** ISOTONIC CALIBRATION (pool-adjacent-violators) via the minimax
    * identity: the monotone fit of positive-rate on score bin is
    * fit(i) = max_{j<=i} min_{k>=i} rate(j..k) — an identity for the
    * PAV solution that turns the inherently-sequential pool-merging
    * algorithm into three relational passes, which is exactly what a
    * distributed engine wants. The corpus collapses to B score bins in
    * one map-combinable aggregation (B is bounded by construction, so
    * the O(B^3) triple enumeration is constant work no matter the
    * corpus size); segment rates come from exact integer prefix sums
    * (one long->double correctly-rounded division per segment — the
    * same IEEE bits on both engines); the nested min-then-max runs over
    * doubles, so the fit is order-independent and engine-identical.
    * The two theta-joins (j<=k, j<=i<=k) are BroadcastNestedLoopJoins
    * over the TINY bin relation — designed, same rationale as
    * sample_weighted_replacement's draw-table BNLJ.
    *
    * Output is the reliability table with its monotone repair: raw
    * rate in exact basis points, isotonic rate rounded at 6dp. */
  val mlIsotonicPav: QueryDef = QueryDef(
    "ml_isotonic_pav",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val c = Tables.documents(s, d)
        .select(expr("n_chars div 25").as("bin"),
          (col("lang") === "en").cast("long").as("y"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("p"))
        .select(col("bin"), col("n"), col("p"),
          sum(col("n")).over(w).as("cn"), sum(col("p")).over(w).as("cp"))
      val jSide = c.select(col("bin").as("jb"), col("n").as("jn"),
        col("p").as("jp"), col("cn").as("jcn"), col("cp").as("jcp"))
      val kSide = c.select(col("bin").as("kb"), col("cn").as("kcn"),
        col("cp").as("kcp"))
      val seg = jSide.join(kSide, col("jb") <= col("kb"))
        .select(col("jb"), col("kb"),
          ((col("kcp") - col("jcp") + col("jp")).cast("double") /
           (col("kcn") - col("jcn") + col("jn")).cast("double")).as("rate"))
      c.select(col("bin").as("ib"), col("n"), col("p"))
        .join(seg, col("jb") <= col("ib") && col("kb") >= col("ib"))
        .groupBy(col("ib"), col("n"), col("p"), col("jb"))
        .agg(min(col("rate")).as("mrate"))
        .groupBy(col("ib"), col("n"), col("p"))
        .agg(max(col("mrate")).as("iso"))
        .select(col("ib").as("bin"), col("n"), col("p").as("n_pos"),
          expr("(10000 * p) div n").as("raw_bp"),
          round(col("iso"), 6).as("iso_rate"))
        .orderBy("bin")
    },
    Some("""WITH b AS (
      |  SELECT n_chars // 25 AS bin, count(*) AS n,
      |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS p
      |  FROM documents GROUP BY 1),
      |c AS (
      |  SELECT bin, n, p,
      |    sum(n) OVER cw AS cn, sum(p) OVER cw AS cp
      |  FROM b
      |  WINDOW cw AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND CURRENT ROW)),
      |seg AS (
      |  SELECT j.bin AS jb, k.bin AS kb,
      |    CAST(k.cp - j.cp + j.p AS DOUBLE) /
      |    CAST(k.cn - j.cn + j.n AS DOUBLE) AS rate
      |  FROM c j JOIN c k ON j.bin <= k.bin),
      |mn AS (
      |  SELECT i.bin AS ib, i.n, i.p, seg.jb, min(seg.rate) AS mrate
      |  FROM c i JOIN seg ON seg.jb <= i.bin AND seg.kb >= i.bin
      |  GROUP BY 1, 2, 3, 4),
      |f AS (SELECT ib, n, p, max(mrate) AS iso FROM mn GROUP BY 1, 2, 3)
      |SELECT ib AS bin, CAST(n AS BIGINT) AS n, CAST(p AS BIGINT) AS n_pos,
      |  CAST((10000 * p) // n AS BIGINT) AS raw_bp,
      |  round(iso, 6) AS iso_rate
      |FROM f ORDER BY bin""".stripMargin))

  /** BOOTSTRAP CONFIDENCE INTERVAL for the corpus mean, exactly
    * reproducible: B=200 resample replicates with per-(row, replicate)
    * TRUNCATED-POISSON(1) weights drawn from shared md5 arithmetic —
    * w in {0..4} by fixed integer thresholds over the 60-bit hash
    * space (the Poisson bootstrap, the form that streams: no replicate
    * ever materializes a resampled corpus, each row just carries 200
    * small weights). The thresholds are hardcoded integer literals
    * (floor(cdf * 2^60)), so BOTH engines draw bit-identical weights —
    * no float RNG in the gate; truncation at 4 moves 1.9% of mass to
    * w=4, a fixed documented bias of the scheme, not noise. Replicate
    * means are exact integer rationals; the 5th/95th percentile picks
    * are rank 10 / rank 190 of 200 (ties broken by replicate id). At
    * 100 TB the explode is map-side (rows x B never shuffles wide:
    * the aggregation is 200 groups with map-side partials). */
  val mlBootstrapCi: QueryDef = QueryDef(
    "ml_bootstrap_ci",
    (s, d) => {
      val B = 200
      // floor(cdf(Poisson(1)) * 2^60) for w <= 0,1,2,3
      val t = Seq(424136118829305344L, 848272237658610688L,
        1060340297073263360L, 1131029650211480960L)
      val d0 = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      val u = conv(substring(md5(
        concat(col("doc_id").cast("string"), lit(":"),
          col("b").cast("string"))), 1, 15), 16, 10).cast("long")
      val w = when(u < t(0), 0L).when(u < t(1), 1L).when(u < t(2), 2L)
        .when(u < t(3), 3L).otherwise(4L)
      val means = d0
        .select(col("doc_id"), col("n_chars"),
          explode(expr(s"sequence(1, $B)")).as("b"))
        .withColumn("w", w)
        .groupBy(col("b"))
        .agg(sum(col("w") * col("n_chars")).as("num"), sum(col("w")).as("den"))
      val ranked = means
        .withColumn("m", col("num").cast("double") / col("den").cast("double"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("m").asc, col("b").asc)))
      val lo = ranked.filter(col("rn") === B / 20)
        .select(expr("(100 * num) div den").as("ci_lo_x100"))
      val hi = ranked.filter(col("rn") === B - B / 20)
        .select(expr("(100 * num) div den").as("ci_hi_x100"))
      Tables.documents(s, d)
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
        .select(col("n_docs"),
          expr("(100 * sum_chars) div n_docs").as("mean_x100"),
          col("ci_lo_x100"), col("ci_hi_x100"))
    },
    Some("""WITH reps AS (
      |  SELECT d.doc_id, d.n_chars, b.b
      |  FROM documents d, (SELECT unnest(range(1, 201)) AS b) b),
      |h AS (
      |  SELECT b, n_chars,
      |    CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':',
      |      CAST(b AS VARCHAR))), 1, 15)) AS BIGINT) AS u
      |  FROM reps),
      |wts AS (
      |  SELECT b, n_chars,
      |    CASE WHEN u < 424136118829305344 THEN 0
      |         WHEN u < 848272237658610688 THEN 1
      |         WHEN u < 1060340297073263360 THEN 2
      |         WHEN u < 1131029650211480960 THEN 3
      |         ELSE 4 END AS w
      |  FROM h),
      |means AS (
      |  SELECT b, CAST(sum(w * n_chars) AS BIGINT) AS num,
      |    CAST(sum(w) AS BIGINT) AS den
      |  FROM wts GROUP BY b),
      |ranked AS (
      |  SELECT num, den,
      |    row_number() OVER (ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
      |      ASC, b ASC) AS rn
      |  FROM means),
      |base AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |  FROM documents)
      |SELECT n_docs, CAST((100 * sum_chars) // n_docs AS BIGINT) AS mean_x100,
      |  (SELECT CAST((100 * num) // den AS BIGINT) FROM ranked WHERE rn = 10)
      |    AS ci_lo_x100,
      |  (SELECT CAST((100 * num) // den AS BIGINT) FROM ranked WHERE rn = 190)
      |    AS ci_hi_x100
      |FROM base""".stripMargin))

  val all: Seq[QueryDef] = Seq(dedupSegments, textUnigramLm, mixDomainCap,
    mixTokenBudget, mixTokenBudgetTemperature, mlTargetEncodeLoo, mlChi2Tokens,
    mlConfusionThreshold, mlLiftCurve, embSq8Error, pipelineDatasheet,
    textBpePairs, textBpeTrain, textBpeVocab, textBpeApply, textBpeRoundtrip,
    packChunksBpe, textBpeFertility,
    textWordpieceApply, textWordpiecePieces, textUnigramViterbi,
    textBpeTrainLarge, textBpeVocabLarge, textBpeApplyLarge,
    packChunksBpeLarge, textBpeFertilityLarge, mlSpanCorruption, pipelineLlmData,
    textHashEmbed, textBigramLm, curatePerplexityFilter, curateDsir, mixCurriculum,
    mixUpsample,
    mixTemperature, embZscore, textBm25, clusterKmeans, dedupSemantic,
    sampleUniformK, sampleHashSplit, sampleEpochShuffle, sampleWeightedReplacement,
    packLengthBuckets, embCovariance,
    embProject, embPcaPower, mlAuc, mlCalibrationBins, mlKsDrift,
    mlIsotonicPav, mlBootstrapCi)
}
