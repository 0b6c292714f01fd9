package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TextOps

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
    * The frequent-segment set broadcasts as a one-row sorted array; the
    * corpus never shuffles (per-row `filter` fused into the scan — see
    * [[graft.ops.TextOps.removeFrequentSegments]] for the 100 TB shape). */
  val dedupSegments: QueryDef = QueryDef(
    "dedup_segments",
    (s, d) => TextOps.removeFrequentSegments(
        Tables.documents(s, d), "doc_id", "text", k = 3, minDocs = 2)
      .select(col("doc_id"), col("text").as("deduped_text"),
        col("n_removed_segments"))
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
    * low). */
  val textUnigramLm: QueryDef = QueryDef(
    "text_unigram_lm",
    (s, d) => TextOps.unigramRarityScores(Tables.documents(s, d), "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_toks"),
        col("sum_rarity"),
        round(col("sum_rarity").cast("double") / col("n_toks").cast("double"), 4)
          .as("mean_rarity"))
      .orderBy("doc_id"),
    Some(s"""WITH toks AS (
      |  SELECT doc_id, w
      |  FROM (SELECT doc_id, unnest(string_split($normalizeSql, ' ')) AS w
      |        FROM documents)
      |  WHERE length(w) > 0),
      |counts AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
      |total AS (SELECT count(*) AS n_total FROM toks),
      |vocab AS (
      |  SELECT w, CAST((n_total * 1000000) // c AS BIGINT) AS r
      |  FROM counts, total),
      |scored AS (
      |  SELECT doc_id, CAST(sum(r) AS BIGINT) AS sum_rarity,
      |    count(*) AS n_toks
      |  FROM toks JOIN vocab USING (w) GROUP BY doc_id)
      |SELECT doc_id, n_toks, sum_rarity,
      |  round(CAST(sum_rarity AS DOUBLE) / CAST(n_toks AS DOUBLE), 4) AS mean_rarity
      |FROM scored ORDER BY doc_id""".stripMargin))

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

  val all: Seq[QueryDef] = Seq(dedupSegments, textUnigramLm, mixDomainCap, embZscore)
}
