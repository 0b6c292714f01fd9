package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import org.apache.spark.sql.expressions.Window
import graft.ops.{Dedup, Multimodal, Similarity, TextOps}

/** Training-data pipeline operators exercised on the `documents` and
  * `embeddings` tables. The testdata has no natural duplicates, so dedup
  * queries first synthesize them deterministically (UNION ALL of mutated
  * copies) — the same synthesis is in the oracle SQL, so both engines see
  * identical inputs.
  *
  * Oracles: exact dedup, n-gram jaccard, minhash (via md5, which both
  * engines share), langid/quality/tokens/fingerprint are DuckDB-checked.
  * SimHash/sign-LSH use xxhash64 (Spark-native) — no SQL oracle; their
  * correctness is pinned by PipelineSpec against brute-force ground truth.
  */
object PipelineQueries {

  /** documents ∪ exact copies (doc_id+100000 for doc_id%10==0) ∪ near
    * copies with one appended token (doc_id+200000 for doc_id%7==0). */
  private def docsWithDups(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val exactCopies = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val nearCopies = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), lit(" extratoken")).as("text"))
    docs.select(col("doc_id"), col("text")).union(exactCopies).union(nearCopies)
  }

  private val docsWithDupsSql: String =
    """SELECT doc_id, text FROM documents
      |UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
      |UNION ALL SELECT doc_id + 200000 AS doc_id, text || ' extratoken' AS text FROM documents WHERE doc_id % 7 = 0""".stripMargin

  private[queries] val normalizeSql: String =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** Exact dedup via content fingerprint: one groupBy on md5(normalized). */
  val dedupExact: QueryDef = QueryDef(
    "dedup_exact",
    (s, d) => Dedup.exact(docsWithDups(s, d), "doc_id", "text")
      .filter(col("n_copies") > 1)
      .orderBy("keep_id"),
    Some(s"""WITH t AS ($docsWithDupsSql)
      |SELECT md5($normalizeSql) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM t GROUP BY 1 HAVING count(*) > 1 ORDER BY keep_id""".stripMargin))

  /** MinHash+LSH candidate pairs (md5-based, oracle-recomputable):
    * word 3-gram shingles, k=8 hashes, 4 bands x 2 rows. */
  /** The minhash pair list as reusable oracle CTE body (no ORDER BY) —
    * consumed by both dedup_minhash_lsh and dedup_cluster.
    *
    * Mirrors [[Dedup.minhashSignatures]]'s universal-hash scheme: base =
    * signed 64-bit md5 prefix; variant i = base * A_i + B_i mod 2^64,
    * reported as a signed BIGINT. Spark gets the mod for free from Java
    * long wrapping; here the arithmetic runs in HUGEINT (A_i is 32-bit,
    * so A_i * u < 2^96 never overflows 128-bit) with an explicit
    * wrap-to-signed at the end. */
  private val minhashPairsSql: String = {
    val shingles =
      s"""list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, greatest(len(w) - 1, 1))])"""
    val mins = (0 until 8).map { i =>
      val a = java.lang.Long.toUnsignedString(graft.ops.Dedup.minhashA(i))
      val b = java.lang.Long.toUnsignedString(graft.ops.Dedup.minhashB(i))
      s"""min(CAST((CASE WHEN (($a::HUGEINT * u + $b::HUGEINT) % 18446744073709551616::HUGEINT) >= 9223372036854775808::HUGEINT
         | THEN (($a::HUGEINT * u + $b::HUGEINT) % 18446744073709551616::HUGEINT) - 18446744073709551616::HUGEINT
         | ELSE (($a::HUGEINT * u + $b::HUGEINT) % 18446744073709551616::HUGEINT) END) AS BIGINT)) AS h$i""".stripMargin
    }.mkString(",\n")
    val sigList = (0 until 8).map(i => s"CAST(h$i AS VARCHAR)").mkString("[", ", ", "]")
    s"""words AS (SELECT doc_id, string_split($normalizeSql, ' ') AS w FROM t),
      |sh AS (SELECT doc_id, $shingles AS shingles FROM words),
      |inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
      |hu AS (SELECT doc_id,
      |  (CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT)::HUGEINT * 4294967296::HUGEINT
      |   + CAST(concat('0x', substr(md5(s), 9, 8)) AS BIGINT)::HUGEINT) AS u FROM inv),
      |sigcols AS (SELECT doc_id,
      |$mins
      |FROM hu GROUP BY doc_id),
      |sig AS (SELECT doc_id, $sigList AS sig FROM sigcols),
      |bands AS (
      |  SELECT doc_id, b AS band_id, sig[2*b+1] || '|' || sig[2*b+2] AS band_key
      |  FROM sig, (SELECT unnest(range(4)) AS b)),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b
      |    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id)""".stripMargin
  }

  val dedupMinhashLsh: QueryDef = QueryDef(
    "dedup_minhash_lsh",
    (s, d) => Dedup.minhashLshPairs(docsWithDups(s, d), "doc_id", "text",
        shingleN = 3, k = 8, rowsPerBand = 2)
      .orderBy("id_a", "id_b"),
    Some(s"""WITH t AS ($docsWithDupsSql),
      |$minhashPairsSql
      |SELECT id_a, id_b FROM pairs ORDER BY id_a, id_b""".stripMargin))

  /** MinHash ESTIMATOR AUDIT: for every LSH candidate pair, the
    * signature-agreement estimate (n_match/8) against the exact shingle
    * Jaccard — the calibration sheet that justifies an LSH threshold
    * before a dedup run acts on it (the sketch-vs-exact audit shape of
    * sketch_hll_distinct, applied to the dedup estimator). All integer:
    * match counts, shingle intersections (distinct inverted-index join
    * restricted to the candidate pairs — never all-pairs), sizes; the
    * Jaccard is one micro-snapped division. */
  val dedupMinhashAudit: QueryDef = QueryDef(
    "dedup_minhash_audit",
    (s, d) => {
      val docs = docsWithDups(s, d)
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 3, k = 8, rowsPerBand = 2)
      val sig = Dedup.minhashSignatures(docs, "doc_id", "text",
        shingleN = 3, k = 8)
      val matchCount = (0 until 8).map(i =>
        when(col(s"a.h$i") === col(s"b.h$i"), 1L).otherwise(0L))
        .reduce(_ + _)
      val withEst = pairs
        .join(sig.as("a"), col("id_a") === col("a.id"))
        .join(sig.as("b"), col("id_b") === col("b.id"))
        .select(col("id_a"), col("id_b"), matchCount.as("n_match_hashes"))
      val sh = graft.ops.TextOps.wordShingleRows(docs, "doc_id", "text", 3)
      val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
      val common = pairs
        .join(sh.select(col("id").as("id_a"), col("sh")), "id_a")
        .join(sh.select(col("id").as("id_b"), col("sh")), Seq("id_b", "sh"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_common"))
      val denom = nullif(col("n_a") + col("n_b") - col("n_common"), lit(0L))
      withEst
        .join(common, Seq("id_a", "id_b"), "left").na.fill(0L, Seq("n_common"))
        .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), "id_a")
        .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), "id_b")
        .select(col("id_a"), col("id_b"), col("n_match_hashes"),
          (col("n_match_hashes") * 125000).as("est_micro"),
          col("n_common"),
          round(lit(1000000.0) * col("n_common").cast("double") /
            denom.cast("double")).cast("long").as("jacc_micro"))
        .withColumn("err_micro", abs(col("est_micro") - col("jacc_micro")))
        .orderBy("id_a", "id_b")
    },
    Some(s"""WITH t AS ($docsWithDupsSql),
      |$minhashPairsSql,
      |sizes AS (SELECT doc_id, count(*) AS n_sh FROM inv GROUP BY doc_id),
      |common AS (
      |  SELECT p.id_a, p.id_b, count(*) AS n_common
      |  FROM pairs p
      |  JOIN inv a ON a.doc_id = p.id_a
      |  JOIN inv b ON b.doc_id = p.id_b AND b.s = a.s
      |  GROUP BY p.id_a, p.id_b),
      |est AS (
      |  SELECT p.id_a, p.id_b,
      |    (${(0 until 8).map(i =>
             s"CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END").mkString(" + ")}) AS n_match_hashes
      |  FROM pairs p
      |  JOIN sigcols sa ON sa.doc_id = p.id_a
      |  JOIN sigcols sb ON sb.doc_id = p.id_b)
      |SELECT e.id_a, e.id_b,
      |  CAST(n_match_hashes AS BIGINT) AS n_match_hashes,
      |  CAST(n_match_hashes * 125000 AS BIGINT) AS est_micro,
      |  CAST(coalesce(n_common, 0) AS BIGINT) AS n_common,
      |  CAST(round(1000000.0 * CAST(coalesce(n_common, 0) AS DOUBLE) /
      |    CAST(nullif(za.n_sh + zb.n_sh - coalesce(n_common, 0), 0) AS DOUBLE)) AS BIGINT) AS jacc_micro,
      |  abs(CAST(n_match_hashes * 125000 AS BIGINT)
      |    - CAST(round(1000000.0 * CAST(coalesce(n_common, 0) AS DOUBLE) /
      |        CAST(nullif(za.n_sh + zb.n_sh - coalesce(n_common, 0), 0) AS DOUBLE)) AS BIGINT)) AS err_micro
      |FROM est e
      |LEFT JOIN common c ON e.id_a = c.id_a AND e.id_b = c.id_b
      |JOIN sizes za ON za.doc_id = e.id_a
      |JOIN sizes zb ON zb.doc_id = e.id_b
      |ORDER BY e.id_a, e.id_b""".stripMargin))

  /** Duplicate-cluster resolution: connected components over the minhash
    * pair list — every near-dup doc labeled with the smallest doc_id in
    * its cluster (iterative min-label propagation in Spark; the oracle
    * recomputes components with a recursive CTE). */
  val dedupCluster: QueryDef = QueryDef(
    "dedup_cluster",
    (s, d) => Dedup.connectedComponents(
        Dedup.minhashLshPairs(docsWithDups(s, d), "doc_id", "text",
          shingleN = 3, k = 8, rowsPerBand = 2),
        "id_a", "id_b")
      .orderBy("id"),
    Some(s"""WITH RECURSIVE t AS ($docsWithDupsSql),
      |$minhashPairsSql,
      |sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION SELECT id_b AS src, id_a AS dst FROM pairs),
      |reach(id, r) AS (
      |  SELECT src, src FROM (SELECT DISTINCT src FROM sym)
      |  UNION
      |  SELECT s.src, r.r FROM sym s JOIN reach r ON s.dst = r.id)
      |SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
      |ORDER BY id""".stripMargin))

  /** Same clustering task through the large-star/small-star alternation
    * — the O(log²)-round high-diameter path; the oracle (and therefore
    * the label semantics) is identical to dedup_cluster's min-label
    * formulation. */
  val dedupClusterStar: QueryDef = QueryDef(
    "dedup_cluster_star",
    (s, d) => Dedup.connectedComponentsStar(
        Dedup.minhashLshPairs(docsWithDups(s, d), "doc_id", "text",
          shingleN = 3, k = 8, rowsPerBand = 2),
        "id_a", "id_b")
      .orderBy("id"),
    Some(s"""WITH RECURSIVE t AS ($docsWithDupsSql),
      |$minhashPairsSql,
      |sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION SELECT id_b AS src, id_a AS dst FROM pairs),
      |reach(id, r) AS (
      |  SELECT src, src FROM (SELECT DISTINCT src FROM sym)
      |  UNION
      |  SELECT s.src, r.r FROM sym s JOIN reach r ON s.dst = r.id)
      |SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
      |ORDER BY id""".stripMargin))

  /** Exact n-gram Jaccard pairs >= 0.5 via inverted shingle index. */
  val dedupNgramJaccard: QueryDef = QueryDef(
    "dedup_ngram_jaccard",
    (s, d) => Dedup.ngramJaccardPairs(docsWithDups(s, d), "doc_id", "text",
        shingleN = 3, threshold = 0.5)
      // jaccard is DECIMAL(18,6) internally (exact threshold compare in
      // both engines); the output value is cast to DOUBLE for a
      // representation-stable hash compare across engines.
      .withColumn("jaccard", col("jaccard").cast("double"))
      .orderBy("id_a", "id_b"),
    Some {
      val shingles =
        s"""list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, greatest(len(w) - 1, 1))])"""
      s"""WITH t AS ($docsWithDupsSql),
        |words AS (SELECT doc_id, string_split($normalizeSql, ' ') AS w FROM t),
        |sh AS (SELECT doc_id, $shingles AS shingles FROM words),
        |counts AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
        |inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |shared AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  CAST(CAST(CAST(n_shared AS DECIMAL(18,6)) / CAST(ca.n_sh + cb.n_sh - n_shared AS DECIMAL(18,6)) AS DECIMAL(18,6)) AS DOUBLE) AS jaccard
        |FROM shared
        |JOIN counts ca ON ca.doc_id = id_a
        |JOIN counts cb ON cb.doc_id = id_b
        |WHERE CAST(CAST(n_shared AS DECIMAL(18,6)) / CAST(ca.n_sh + cb.n_sh - n_shared AS DECIMAL(18,6)) AS DECIMAL(18,6)) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin
    })

  /** Directed n-gram containment pairs >= 0.9 — the doc-in-doc /
    * quote-leakage detector Jaccard resemblance cannot express (the
    * planted near-copies are SUPERSETS of their originals: the original
    * is ~fully contained in its copy while the reverse direction and
    * the Jaccard score both fall below a tight threshold). Exact
    * prefix-pruned inverted-index plan in
    * [[Dedup.ngramContainmentPairs]]; the asymmetric score means the
    * output is DIRECTED (id_a contained-in id_b). */
  val dedupContainment: QueryDef = QueryDef(
    "dedup_containment",
    (s, d) => Dedup.ngramContainmentPairs(docsWithDups(s, d), "doc_id", "text",
        shingleN = 3, threshold = 0.9)
      .withColumn("containment", col("containment").cast("double"))
      .orderBy("id_a", "id_b"),
    Some {
      val shingles =
        s"""list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, greatest(len(w) - 1, 1))])"""
      s"""WITH t AS ($docsWithDupsSql),
        |words AS (SELECT doc_id, string_split($normalizeSql, ' ') AS w FROM t),
        |sh AS (SELECT doc_id, $shingles AS shingles FROM words),
        |counts AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
        |inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |shared AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  CAST(CAST(CAST(n_shared AS DECIMAL(18,6)) / CAST(ca.n_sh AS DECIMAL(18,6)) AS DECIMAL(18,6)) AS DOUBLE) AS containment
        |FROM shared
        |JOIN counts ca ON ca.doc_id = id_a
        |WHERE CAST(CAST(n_shared AS DECIMAL(18,6)) / CAST(ca.n_sh AS DECIMAL(18,6)) AS DECIMAL(18,6)) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin
    })

  /** Incremental dedup: a new batch (odd doc ids + re-ingested copies of
    * every 9th doc) against the existing corpus (even doc ids) — batch
    * self-dedup then fingerprint anti-join. */
  val dedupIncremental: QueryDef = QueryDef(
    "dedup_incremental",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.filter(col("doc_id") % 2 === 0)
      val batch = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("text"))
        .union(docs.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 300000).as("doc_id"), col("text")))
      Dedup.incrementalNew(batch, corpus, "doc_id", "text").orderBy("doc_id")
    },
    Some(s"""WITH corpus AS (
      |  SELECT DISTINCT md5($normalizeSql) AS fp FROM documents WHERE doc_id % 2 = 0),
      |batch AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
      |  UNION ALL
      |  SELECT doc_id + 300000 AS doc_id, text FROM documents WHERE doc_id % 9 = 0),
      |bfp AS (
      |  SELECT md5($normalizeSql) AS fp, min(doc_id) AS keep_id FROM batch GROUP BY 1)
      |SELECT keep_id AS doc_id FROM bfp
      |WHERE NOT EXISTS (SELECT 1 FROM corpus WHERE corpus.fp = bfp.fp)
      |ORDER BY doc_id""".stripMargin))

  /** Parameterized LSH band CTE chain (source CTE `src`, name prefix
    * `p`): (doc_id, band_id, band_key) rows — the same universal-hash
    * replay as [[minhashPairsSql]], reusable for each side of a
    * two-corpus probe. */
  private def minhashBandsSql(src: String, p: String): String = {
    val shingles =
      s"""list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, greatest(len(w) - 1, 1))])"""
    val mins = (0 until 8).map { i =>
      val a = java.lang.Long.toUnsignedString(graft.ops.Dedup.minhashA(i))
      val b = java.lang.Long.toUnsignedString(graft.ops.Dedup.minhashB(i))
      s"""min(CAST((CASE WHEN (($a::HUGEINT * u + $b::HUGEINT) % 18446744073709551616::HUGEINT) >= 9223372036854775808::HUGEINT
         | THEN (($a::HUGEINT * u + $b::HUGEINT) % 18446744073709551616::HUGEINT) - 18446744073709551616::HUGEINT
         | ELSE (($a::HUGEINT * u + $b::HUGEINT) % 18446744073709551616::HUGEINT) END) AS BIGINT)) AS h$i""".stripMargin
    }.mkString(",\n")
    val sigList = (0 until 8).map(i => s"CAST(h$i AS VARCHAR)").mkString("[", ", ", "]")
    s"""${p}words AS (SELECT doc_id, string_split($normalizeSql, ' ') AS w FROM $src),
      |${p}sh AS (SELECT doc_id, $shingles AS shingles FROM ${p}words),
      |${p}inv AS (SELECT doc_id, unnest(shingles) AS s FROM ${p}sh),
      |${p}hu AS (SELECT doc_id,
      |  (CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT)::HUGEINT * 4294967296::HUGEINT
      |   + CAST(concat('0x', substr(md5(s), 9, 8)) AS BIGINT)::HUGEINT) AS u FROM ${p}inv),
      |${p}sigcols AS (SELECT doc_id,
      |$mins
      |FROM ${p}hu GROUP BY doc_id),
      |${p}sig AS (SELECT doc_id, $sigList AS sig FROM ${p}sigcols),
      |${p}bands AS (
      |  SELECT doc_id, b AS band_id, sig[2*b+1] || '|' || sig[2*b+2] AS band_key
      |  FROM ${p}sig, (SELECT unnest(range(4)) AS b))""".stripMargin
  }

  /** Incremental NEAR-dup: new-batch docs that LSH-collide with the
    * persisted corpus band index ([[Dedup.incrementalLshDups]]) — the
    * continuous-crawl shape: corpus text is never re-shingled and never
    * re-pairs with itself; only the new batch computes signatures and
    * probes matching buckets. */
  val dedupIncrementalLsh: QueryDef = QueryDef(
    "dedup_incremental_lsh",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.filter(col("doc_id") % 2 === 0).select(col("doc_id"), col("text"))
      val batch = docs.filter(col("doc_id") % 2 === 1).select(col("doc_id"), col("text"))
        .union(docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 300000).as("doc_id"),
            concat(col("text"), lit(" extratoken")).as("text")))
      val index = Dedup.minhashBandIndex(corpus, "doc_id", "text",
        shingleN = 3, k = 8, rowsPerBand = 2)
      Dedup.incrementalLshDups(batch, index, "doc_id", "text",
          shingleN = 3, k = 8, rowsPerBand = 2)
        .orderBy("doc_id")
    },
    Some(s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
      |batch AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
      |  UNION ALL
      |  SELECT doc_id + 300000 AS doc_id, text || ' extratoken' AS text
      |  FROM documents WHERE doc_id % 10 = 0),
      |${minhashBandsSql("corpus", "c_")},
      |${minhashBandsSql("batch", "b_")}
      |SELECT b.doc_id AS doc_id, min(c.doc_id) AS dup_of
      |FROM b_bands b JOIN c_bands c
      |  ON b.band_id = c.band_id AND b.band_key = c.band_key
      |GROUP BY b.doc_id ORDER BY doc_id""".stripMargin))

  /** The same incremental probe against the index PERSISTED bucketed by
    * its probe key ([[Dedup.writeBandIndex]]) — the full continuous-crawl
    * story, driver-gated: the corpus band index is written once, bucketed
    * + sorted by (band_id, band_key), and the batch's probe join reads
    * co-bucketed files with ZERO exchanges on the index side (PlanAudit
    * pin) — at production scale the ever-growing index never crosses the
    * network; only each (small) batch shuffles into its buckets. Values
    * are identical to [[dedupIncrementalLsh]], so the oracle is shared. */
  val dedupIncrementalLshBucketed: QueryDef = dedupIncrementalLsh.copy(
    name = "dedup_incremental_lsh_bucketed",
    build = (s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.filter(col("doc_id") % 2 === 0).select(col("doc_id"), col("text"))
      val batch = docs.filter(col("doc_id") % 2 === 1).select(col("doc_id"), col("text"))
        .union(docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 300000).as("doc_id"),
            concat(col("text"), lit(" extratoken")).as("text")))
      // session-suffixed name/path: concurrent runs on one machine must
      // not clobber each other's index mid-query
      val tok = graft.sources.TableIO.sessionToken(s)
      Dedup.writeBandIndex(corpus, "doc_id", "text", s"graft_lsh_band_index_$tok",
        buckets = 8,
        path = Some(graft.sources.TableIO.scratchDir(s, "bucketed_lsh/index")))
      val index = graft.sources.TableIO.readTable(s, s"graft_lsh_band_index_$tok")
      Dedup.incrementalLshDups(batch, index, "doc_id", "text",
          shingleN = 3, k = 8, rowsPerBand = 2, forceShuffleJoin = true)
        .orderBy("doc_id")
    })

  /** Blocked fuzzy dedup: prefix blocking + Levenshtein verification on
    * the dup-synthesized corpus (exact copies at distance 0; unrelated
    * docs sharing a block prefix are filtered by the distance cap). */
  val dedupFuzzyBlock: QueryDef = QueryDef(
    "dedup_fuzzy_block",
    (s, d) => Dedup.fuzzyBlockedPairs(docsWithDups(s, d), "doc_id", "text",
        blockPrefixLen = 30, comparePrefixLen = 150, maxDistance = 30)
      .orderBy("id_a", "id_b"),
    Some(s"""WITH t AS ($docsWithDupsSql),
      |base AS (SELECT doc_id AS id, $normalizeSql AS norm FROM t),
      |b2 AS (SELECT id, substr(norm, 1, 30) AS blk, substr(norm, 1, 150) AS cmp FROM base)
      |SELECT a.id AS id_a, b.id AS id_b,
      |  CAST(levenshtein(a.cmp, b.cmp) AS BIGINT) AS edit_distance
      |FROM b2 a JOIN b2 b ON a.blk = b.blk AND a.id < b.id
      |WHERE levenshtein(a.cmp, b.cmp) <= 30
      |ORDER BY id_a, id_b""".stripMargin))

  /** Cross-source RECORD LINKAGE (entity resolution between two tables —
    * `dedup_fuzzy_block`'s cross-table sibling,
    * [[graft.ops.Dedup.linkBestMatchBlocked]]): an external "dirty"
    * registry (deterministic perturbation: every 3rd customer re-keyed
    * +1e6 with the last name character dropped — SQL-regenerable, so the
    * oracle rebuilds the same source) is resolved against the canonical
    * customer table by BLOCKING on a 16-char NAME PREFIX and picking
    * each external record's BEST match by (edit distance asc, key asc) —
    * the arg-min shape real linkage uses where a hard threshold would
    * leave records unresolved. Emits the match plus a `true_match` audit
    * bit (did linkage recover the actual source row?).
    *
    * Scale: the block key's cardinality GROWS WITH THE DATA (distinct
    * name prefixes ∝ corpus; block sizes stay roughly constant), so
    * candidate cost is Σ|blockA|·|blockB| ∝ N — the
    * [[graft.ops.Dedup.fuzzyBlockedPairs]] shape. The previous
    * (nation, segment) key fixed the block count at 125 forever, making
    * within-block cost O(N²/125) — quadratic at 100× with guaranteed
    * hot partitions. The arg-min is a map-combined `min_by` aggregate,
    * no ranking window; recall holds because the perturbation (a
    * last-char drop) never touches the 16-char prefix. */
  val linkEntities: QueryDef = QueryDef(
    "link_entities",
    (s, d) => {
      val cust = Tables.customer(s, d)
      val dirty = cust.filter(col("c_custkey") % 3 === 0)
        .select((col("c_custkey") + 1000000).as("x_key"),
          expr("substring(c_name, 1, length(c_name) - 1)").as("x_name"))
      Dedup.linkBestMatchBlocked(cust, "c_custkey", "c_name",
          dirty, "x_key", "x_name", blockPrefixLen = 16)
        .select(col("x_key"), col("matched_key"), col("edit_distance"),
          (col("matched_key") === col("x_key") - 1000000).as("true_match"))
        .orderBy("x_key")
    },
    Some("""WITH dirty AS (
      |  SELECT c_custkey + 1000000 AS x_key,
      |    substr(c_name, 1, length(c_name) - 1) AS x_name
      |  FROM customer WHERE c_custkey % 3 = 0),
      |scored AS (
      |  SELECT x_key, c_custkey, levenshtein(c_name, x_name) AS dist
      |  FROM customer JOIN dirty
      |    ON substr(c_name, 1, 16) = substr(x_name, 1, 16)),
      |best AS (
      |  SELECT x_key, c_custkey, dist,
      |    row_number() OVER (PARTITION BY x_key
      |      ORDER BY dist ASC, c_custkey ASC) AS rk
      |  FROM scored)
      |SELECT x_key, c_custkey AS matched_key, CAST(dist AS BIGINT) AS edit_distance,
      |  (c_custkey = x_key - 1000000) AS true_match
      |FROM best WHERE rk = 1 ORDER BY x_key""".stripMargin))

  /** Sorted-neighborhood dedup
    * ([[graft.ops.Dedup.sortedNeighborhoodPairs]] — Hernández & Stolfo's
    * merge/purge windowing, the third blocking paradigm in the dedup
    * family): customers plus a perturbed clone slice (every 4th,
    * re-keyed +1e6, last name char dropped) sorted by name, each record
    * paired with its 5 sort-successors, pairs verified at edit distance
    * ≤ 2. Every clone sorts adjacent to its source (the prefix is the
    * sort key), so recall is 1 for the planted channel; the oracle
    * replays rank, window and distances. Scale: range-partitioned rank
    * + ≤2-bucket binned self-join — N·window pair work, no
    * single-partition window, skew-free unique ranks. */
  val dedupSortedNeighborhood: QueryDef = QueryDef(
    "dedup_sorted_neighborhood",
    (s, d) => {
      val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
      val clones = cust.filter(col("c_custkey") % 4 === 0)
        .select((col("c_custkey") + 1000000).as("c_custkey"),
          expr("substring(c_name, 1, length(c_name) - 1)").as("c_name"))
      Dedup.sortedNeighborhoodPairs(cust.unionByName(clones),
          "c_custkey", "c_name", window = 5, maxDistance = 2)
        .orderBy("id_a", "id_b")
    },
    Some("""WITH t AS (
      |  SELECT c_custkey AS id, c_name AS nm FROM customer
      |  UNION ALL
      |  SELECT c_custkey + 1000000, substr(c_name, 1, length(c_name) - 1)
      |  FROM customer WHERE c_custkey % 4 = 0),
      |r AS (SELECT id, nm,
      |    row_number() OVER (ORDER BY nm, id) - 1 AS rnk FROM t)
      |SELECT a.id AS id_a, b.id AS id_b,
      |  CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS edit_distance
      |FROM r a JOIN r b ON b.rnk > a.rnk AND b.rnk <= a.rnk + 5
      |WHERE levenshtein(a.nm, b.nm) <= 2
      |ORDER BY id_a, id_b""".stripMargin))

  /** SimHash near-dup candidates (md5-derived word hashes, so the oracle
    * recomputes the 64-bit signatures, 16-bit band buckets and Hamming
    * distances exactly; also verified against ground truth in
    * PipelineSpec). */
  val dedupSimhash: QueryDef = QueryDef(
    "dedup_simhash",
    (s, d) => Dedup.simhashPairs(docsWithDups(s, d), "doc_id", "text", maxHamming = 8)
      .orderBy("id_a", "id_b"),
    Some(s"""WITH t AS ($docsWithDupsSql),
      |w AS (SELECT doc_id, unnest(string_split($normalizeSql, ' ')) AS w FROM t),
      |h AS (SELECT doc_id,
      |  CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT) AS hhi,
      |  CAST(concat('0x', substr(md5(w), 9, 8)) AS BIGINT) AS hlo FROM w),
      |v AS (SELECT doc_id, b,
      |  sum(CASE WHEN ((CASE WHEN b < 32 THEN hlo >> b ELSE hhi >> (b - 32) END) & 1) = 1
      |      THEN 1 ELSE -1 END) AS vote
      |  FROM h, range(0, 64) r(b) GROUP BY doc_id, b),
      |bits AS (SELECT doc_id, b, CASE WHEN vote > 0 THEN 1 ELSE 0 END AS bit FROM v),
      |bands AS (SELECT doc_id, b // 16 AS band_id,
      |  sum(bit * (1::BIGINT << (b % 16))) AS band_key
      |  FROM bits GROUP BY doc_id, b // 16),
      |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b
      |    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
      |ham AS (SELECT c.id_a, c.id_b,
      |  sum(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS hamming
      |  FROM cand c
      |  JOIN bits x ON x.doc_id = c.id_a
      |  JOIN bits y ON y.doc_id = c.id_b AND y.b = x.b
      |  GROUP BY c.id_a, c.id_b)
      |SELECT id_a, id_b, CAST(hamming AS INTEGER) AS hamming FROM ham
      |WHERE hamming <= 8 ORDER BY id_a, id_b""".stripMargin))

  /** Embedding-cosine near-dup pairs over a synthesized near-dup corpus
    * (embeddings ∪ 1.01×-scaled copies), blocked on the
    * [[Similarity.e2lshKey]] over the UNIT-NORMALIZED vectors — the
    * scale path, replacing the earlier broadcast all-pairs form whose
    * candidate cost was O(N²/16) with a broadcast side ∝ corpus.
    *
    * Why normalize before keying: cosine is scale-invariant, so the
    * block key must be too. Keyed on raw vectors, the 1.01× duplication
    * channel shifts every projection by 1% of its magnitude — a real
    * boundary-miss rate; keyed on v/‖v‖ the scaled copy differs from its
    * original only by float-rounding noise (≤ a few ulps per component,
    * projection shift ~1e-6 against bucketWidth 0.25), so the channel's
    * recall is ~1 (pinned exactly in PipelineSpec) while the cell count
    * still grows with the corpus: candidate cost Σ|cell|² ∝ N, no
    * broadcast of anything data-sized. The full corpus participates —
    * the old fixed-fraction sample existed only to bound the quadratic
    * form. Determinism: normalization, projections and cosines are
    * order-pinned IEEE chains the oracle replays bit-for-bit (the
    * sim_topk_brute contract); floor-quantization therefore lands in the
    * same cell in both engines even at a boundary. */
  val dedupEmbedding: QueryDef = QueryDef(
    "dedup_embedding",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val perturbed = emb.filter(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.01f)).as("embedding"))
      val corpus = emb.select(col("vec_id"), col("embedding")).union(perturbed)
      val normed = corpus
        .withColumn("vn0", Similarity.norm(col("embedding")))
        .filter(col("vn0") > 0)
        .select(col("vec_id"),
          transform(col("embedding"),
            x => (x.cast("double") / col("vn0")).cast("float")).as("nv"))
      Similarity.cosineNearDupPairsLsh(normed, "vec_id", "nv",
        threshold = 0.99, nPlanes = 8, dim = 64, bucketWidth = 0.25)
        .orderBy("id_a", "id_b")
    },
    Some("""WITH corpus AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000 AS vec_id, [x * CAST(1.01 AS FLOAT) for x in embedding] AS embedding
      |  FROM embeddings WHERE vec_id % 20 = 0),
      |normed AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS vn0
      |  FROM corpus),
      |nv AS (
      |  SELECT vec_id, [CAST(CAST(x AS DOUBLE) / vn0 AS FLOAT) for x in embedding] AS v
      |  FROM normed WHERE vn0 > 0),
      |planes AS (
      |  SELECT p, list(CASE WHEN strpos('13579bdf', substr(md5(p || ':' || d), 2, 1)) > 0
      |                 THEN 1.0 ELSE -1.0 END ORDER BY d) AS pv
      |  FROM range(0, 8) rp(p), range(1, 65) rd(d)
      |  GROUP BY p),
      |keyed AS (
      |  SELECT vec_id, any_value(v) AS v,
      |    string_agg(CAST(CAST(floor(list_dot_product(CAST(v AS DOUBLE[]), pv) / 0.25) AS BIGINT) AS VARCHAR),
      |               ':' ORDER BY p) AS blk
      |  FROM nv, planes GROUP BY vec_id),
      |pairs AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    list_dot_product(CAST(a.v AS DOUBLE[]), CAST(b.v AS DOUBLE[])) /
      |      (sqrt(list_dot_product(CAST(a.v AS DOUBLE[]), CAST(a.v AS DOUBLE[]))) *
      |       sqrt(list_dot_product(CAST(b.v AS DOUBLE[]), CAST(b.v AS DOUBLE[])))) AS cos
      |  FROM keyed a JOIN keyed b ON a.blk = b.blk AND a.vec_id < b.vec_id)
      |SELECT id_a, id_b, round(cos, 4) AS cos_r FROM pairs WHERE cos >= 0.99
      |ORDER BY id_a, id_b""".stripMargin))

  /** Brute-force cosine top-5 for query vectors (vec_id % 50 = 0). */
  val simTopkBrute: QueryDef = QueryDef(
    "sim_topk_brute",
    (s, d) => Similarity.bruteForceTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        col("vec_id") % 50 === 0, k = 5)
      .orderBy("query_id", "rk"),
    Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
      |c AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings),
      |scored AS (
      |  SELECT query_id, cand_id,
      |    list_dot_product(CAST(qv AS DOUBLE[]), CAST(cv AS DOUBLE[])) /
      |      (sqrt(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[]))) *
      |       sqrt(list_dot_product(CAST(cv AS DOUBLE[]), CAST(cv AS DOUBLE[])))) AS cos
      |  FROM c, q WHERE query_id <> cand_id),
      |ranked AS (
      |  SELECT query_id, cand_id, cos,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS rk
      |  FROM scored)
      |SELECT query_id, rk, cand_id, round(cos, 4) AS cos_r
      |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin))

  /** ANN recall audit: IVF(16 cells, 2 probes) top-5 measured against the
    * brute-force ground truth, per query — the acceptance number every
    * approximate index ships with (FAISS's recall@k). Both rankings are
    * already bit-exact cross-engine, so the overlap COUNT is too; recall
    * is one guarded IEEE division. Scale shape: the brute pass is the
    * audit's cost and runs on the SAME broadcast-query/heap plan as
    * sim_topk_brute (audits run on a sampled query set, not the
    * firehose); the join is list-sized. */
  /** MATRYOSHKA truncation audit (Kusupati et al. 2022, "Matryoshka
    * Representation Learning"): top-5 cosine neighbors under the FULL
    * 64-dim embedding vs under its 32-dim PREFIX, overlap per query —
    * the acceptance test for serving truncated embeddings (half the
    * memory/bandwidth) off an MRL-style encoder. Same shape as
    * `sim_recall_audit`: both rankings ride the broadcast-query/heap
    * brute plan on a sampled query set, the join is list-sized, and the
    * overlap COUNT is exact because both rankings are bit-exact
    * cross-engine. */
  val embMatryoshkaOverlap: QueryDef = QueryDef(
    "emb_matryoshka_overlap",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val isQ = col("vec_id") % 50 === 0
      val full = Similarity.bruteForceTopK(emb, "vec_id", "embedding", isQ, k = 5)
        .select(col("query_id"), col("cand_id"))
      val half = Similarity.bruteForceTopK(
          emb.select(col("vec_id"), slice(col("embedding"), 1, 32).as("embedding")),
          "vec_id", "embedding", isQ, k = 5)
        .select(col("query_id"), col("cand_id"))
      val hits = half.join(full, Seq("query_id", "cand_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_overlap"))
      full.select(col("query_id")).distinct()
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
        .orderBy("query_id")
    },
    Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS v FROM embeddings WHERE vec_id % 50 = 0),
      |c AS (SELECT vec_id AS cand_id, embedding AS v FROM embeddings),
      |rank_full AS (
      |  SELECT query_id, cand_id FROM (
      |    SELECT q.query_id, c.cand_id,
      |      row_number() OVER (PARTITION BY q.query_id ORDER BY
      |        list_dot_product(CAST(q.v AS DOUBLE[]), CAST(c.v AS DOUBLE[])) /
      |          (sqrt(list_dot_product(CAST(q.v AS DOUBLE[]), CAST(q.v AS DOUBLE[]))) *
      |           sqrt(list_dot_product(CAST(c.v AS DOUBLE[]), CAST(c.v AS DOUBLE[])))) DESC,
      |        c.cand_id ASC) AS rk
      |    FROM c, q WHERE q.query_id <> c.cand_id)
      |  WHERE rk <= 5),
      |rank_half AS (
      |  SELECT query_id, cand_id FROM (
      |    SELECT q.query_id, c.cand_id,
      |      row_number() OVER (PARTITION BY q.query_id ORDER BY
      |        list_dot_product(CAST(q.v[1:32] AS DOUBLE[]), CAST(c.v[1:32] AS DOUBLE[])) /
      |          (sqrt(list_dot_product(CAST(q.v[1:32] AS DOUBLE[]), CAST(q.v[1:32] AS DOUBLE[]))) *
      |           sqrt(list_dot_product(CAST(c.v[1:32] AS DOUBLE[]), CAST(c.v[1:32] AS DOUBLE[])))) DESC,
      |        c.cand_id ASC) AS rk
      |    FROM c, q WHERE q.query_id <> c.cand_id)
      |  WHERE rk <= 5),
      |hits AS (
      |  SELECT h.query_id, count(*) AS n_overlap
      |  FROM rank_half h JOIN rank_full f
      |    ON h.query_id = f.query_id AND h.cand_id = f.cand_id
      |  GROUP BY h.query_id)
      |SELECT q.query_id, CAST(coalesce(hits.n_overlap, 0) AS BIGINT) AS n_overlap
      |FROM (SELECT DISTINCT query_id FROM rank_full) q
      |LEFT JOIN hits ON q.query_id = hits.query_id
      |ORDER BY q.query_id""".stripMargin))

  val simRecallAudit: QueryDef = QueryDef(
    "sim_recall_audit",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val isQ = col("vec_id") % 50 === 0
      val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", isQ, k = 5)
        .select(col("query_id"), col("cand_id"))
      val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", isQ,
          k = 5, nCells = 16, nProbe = 2)
        .select(col("query_id"), col("cand_id"))
      val hits = ivf.join(brute, Seq("query_id", "cand_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
      brute.select(col("query_id")).distinct()
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          round(coalesce(col("n_hits"), lit(0L)).cast("double") /
            lit(5L).cast("double"), 4).as("recall_at_5"))
        .orderBy("query_id")
    },
    Some("""WITH normed AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS vn
      |  FROM embeddings),
      |nz AS (SELECT * FROM normed WHERE vn > 0),
      |bs AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
      |    list_dot_product(q.v, c.v) / (q.vn * c.vn) AS cos
      |  FROM nz c, nz q
      |  WHERE q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id),
      |bt AS (
      |  SELECT query_id, cand_id FROM (
      |    SELECT query_id, cand_id,
      |      row_number() OVER (PARTITION BY query_id
      |                         ORDER BY cos DESC, cand_id ASC) AS rk
      |    FROM bs) WHERE rk <= 5),
      |mx AS (SELECT greatest(1, (max(vec_id) + 1) // 16) AS stride FROM nz),
      |cent AS (
      |  SELECT vec_id AS cell_id, v AS cv, vn AS cn FROM nz, mx
      |  WHERE vec_id % stride = 0 AND vec_id < stride * 16),
      |assigned AS (
      |  SELECT vec_id, v, vn, cell_id FROM (
      |    SELECT n.vec_id, n.v, n.vn, c.cell_id,
      |      row_number() OVER (PARTITION BY n.vec_id
      |        ORDER BY list_dot_product(n.v, c.cv) / (n.vn * c.cn) DESC, c.cell_id ASC) AS crk
      |    FROM nz n, cent c) WHERE crk = 1),
      |probes AS (
      |  SELECT query_id, qv, qn, cell_id FROM (
      |    SELECT n.vec_id AS query_id, n.v AS qv, n.vn AS qn, c.cell_id,
      |      row_number() OVER (PARTITION BY n.vec_id
      |        ORDER BY list_dot_product(n.v, c.cv) / (n.vn * c.cn) DESC, c.cell_id ASC) AS crk
      |    FROM nz n, cent c WHERE n.vec_id % 50 = 0) WHERE crk <= 2),
      |isc AS (
      |  SELECT query_id, a.vec_id AS cand_id,
      |    list_dot_product(qv, a.v) / (qn * a.vn) AS cos
      |  FROM assigned a JOIN probes USING (cell_id) WHERE query_id <> a.vec_id),
      |it AS (
      |  SELECT query_id, cand_id FROM (
      |    SELECT query_id, cand_id,
      |      row_number() OVER (PARTITION BY query_id
      |                         ORDER BY cos DESC, cand_id ASC) AS rk
      |    FROM isc) WHERE rk <= 5),
      |h AS (
      |  SELECT i.query_id, count(*) AS n_hits
      |  FROM it i JOIN bt b
      |    ON i.query_id = b.query_id AND i.cand_id = b.cand_id
      |  GROUP BY i.query_id),
      |bq AS (SELECT DISTINCT query_id FROM bt)
      |SELECT bq.query_id,
      |  CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
      |  round(CAST(coalesce(n_hits, 0) AS DOUBLE) / CAST(5 AS DOUBLE), 4) AS recall_at_5
      |FROM bq LEFT JOIN h ON bq.query_id = h.query_id
      |ORDER BY bq.query_id""".stripMargin))

  /** Hybrid-retrieval rank fusion ([[graft.ops.Similarity.rrfFusion]],
    * reciprocal-rank fusion over truncated cosine and dot-product lists):
    * one corpus pass fills BOTH ranker heaps, fusion runs on list-sized
    * relations, micro-snapped contributions keep the fused ranking exact
    * cross-engine. */
  val simRrfFusion: QueryDef = QueryDef(
    "sim_rrf_fusion",
    (s, d) => Similarity.rrfFusion(Tables.embeddings(s, d), "vec_id",
        "embedding", col("vec_id") % 200 === 0, perList = 32, k = 5)
      .orderBy("query_id", "rk"),
    Some("""WITH q AS (
      |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      |  WHERE vec_id % 200 = 0
      |    AND list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0),
      |c AS (
      |  SELECT vec_id AS cand_id, embedding AS cv FROM embeddings
      |  WHERE list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0),
      |scored AS (
      |  SELECT query_id, cand_id,
      |    list_dot_product(CAST(qv AS DOUBLE[]), CAST(cv AS DOUBLE[])) /
      |      (sqrt(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[]))) *
      |       sqrt(list_dot_product(CAST(cv AS DOUBLE[]), CAST(cv AS DOUBLE[])))) AS cos,
      |    list_dot_product(CAST(qv AS DOUBLE[]), CAST(cv AS DOUBLE[])) AS dp
      |  FROM c, q WHERE query_id <> cand_id),
      |a AS (
      |  SELECT query_id, cand_id,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY cos DESC, cand_id ASC) AS rk_cos
      |  FROM scored QUALIFY rk_cos <= 32),
      |b AS (
      |  SELECT query_id, cand_id,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY dp DESC, cand_id ASC) AS rk_dot
      |  FROM scored QUALIFY rk_dot <= 32),
      |f AS (
      |  SELECT coalesce(a.query_id, b.query_id) AS query_id,
      |    coalesce(a.cand_id, b.cand_id) AS cand_id,
      |    coalesce(CAST(round(1000000.0 / (60 + rk_cos)) AS BIGINT), 0)
      |      + coalesce(CAST(round(1000000.0 / (60 + rk_dot)) AS BIGINT), 0) AS rrf_micro
      |  FROM a FULL OUTER JOIN b
      |    ON a.query_id = b.query_id AND a.cand_id = b.cand_id),
      |r AS (
      |  SELECT query_id, cand_id, rrf_micro,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY rrf_micro DESC, cand_id ASC) AS rk
      |  FROM f QUALIFY rk <= 5)
      |SELECT query_id, rk, cand_id, rrf_micro
      |FROM r ORDER BY query_id, rk""".stripMargin))

  /** MMR diversified re-ranking ([[graft.ops.Similarity.mmrTopK]]):
    * 5 greedy rounds of λ·rel − (1−λ)·max-sim over a 16-candidate recall
    * set, scores micro-snapped before every argmax so the DuckDB oracle
    * replays each selection exactly (the unrolled-rounds recipe). */
  val simMmr: QueryDef = QueryDef(
    "sim_mmr",
    (s, d) => Similarity.mmrTopK(Tables.embeddings(s, d), "vec_id",
        "embedding", col("vec_id") % 200 === 0, perList = 16, k = 5)
      .orderBy("query_id", "rk"),
    Some {
      val rounds = (2 to 5).map { t =>
        s"""ms$t AS (
          |  SELECT s.query_id, s.a AS cand_id, max(s.sim) AS msim
          |  FROM sims s JOIN sel${t - 1} p
          |    ON s.query_id = p.query_id AND s.b = p.cand_id
          |  GROUP BY s.query_id, s.a),
          |sc$t AS (
          |  SELECT c.query_id, c.cand_id,
          |    CAST(round(1000000.0 * (0.7 * c.rel - 0.3 * m.msim)) AS BIGINT) AS score_micro
          |  FROM cand c JOIN ms$t m
          |    ON c.query_id = m.query_id AND c.cand_id = m.cand_id
          |  WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} p
          |                    WHERE p.query_id = c.query_id AND p.cand_id = c.cand_id)),
          |pick$t AS (
          |  SELECT query_id, CAST($t AS BIGINT) AS rk, cand_id, score_micro FROM sc$t
          |  QUALIFY row_number() OVER (PARTITION BY query_id
          |                             ORDER BY score_micro DESC, cand_id ASC) = 1),
          |sel$t AS (SELECT * FROM sel${t - 1} UNION ALL SELECT * FROM pick$t),""".stripMargin
      }.mkString("\n")
      s"""WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        |  WHERE vec_id % 200 = 0
        |    AND list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0),
        |c AS (
        |  SELECT vec_id AS cand_id, embedding AS cv FROM embeddings
        |  WHERE list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0),
        |scored AS (
        |  SELECT query_id, cand_id,
        |    list_dot_product(CAST(qv AS DOUBLE[]), CAST(cv AS DOUBLE[])) /
        |      (sqrt(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[]))) *
        |       sqrt(list_dot_product(CAST(cv AS DOUBLE[]), CAST(cv AS DOUBLE[])))) AS cos
        |  FROM c, q WHERE query_id <> cand_id),
        |cand AS (
        |  SELECT query_id, cand_id, cos AS rel FROM (
        |    SELECT query_id, cand_id, cos,
        |      row_number() OVER (PARTITION BY query_id
        |                         ORDER BY cos DESC, cand_id ASC) AS rk0
        |    FROM scored) WHERE rk0 <= 16),
        |sims AS (
        |  SELECT x.query_id, x.cand_id AS a, y.cand_id AS b,
        |    list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])) /
        |      (sqrt(list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(ea.embedding AS DOUBLE[]))) *
        |       sqrt(list_dot_product(CAST(eb.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])))) AS sim
        |  FROM cand x JOIN cand y
        |    ON x.query_id = y.query_id AND x.cand_id <> y.cand_id
        |  JOIN embeddings ea ON ea.vec_id = x.cand_id
        |  JOIN embeddings eb ON eb.vec_id = y.cand_id),
        |sc1 AS (
        |  SELECT query_id, cand_id,
        |    CAST(round(1000000.0 * (0.7 * rel)) AS BIGINT) AS score_micro
        |  FROM cand),
        |sel1 AS (
        |  SELECT query_id, CAST(1 AS BIGINT) AS rk, cand_id, score_micro FROM sc1
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |                             ORDER BY score_micro DESC, cand_id ASC) = 1),
        |$rounds
        |final AS (SELECT * FROM sel5)
        |SELECT query_id, rk, cand_id, score_micro
        |FROM final ORDER BY query_id, rk""".stripMargin
    })

  /** Margin-based alignment mining ([[graft.ops.Similarity.marginTopK]],
    * the Artetxe & Schwenk 2019 ratio margin): each query's best match
    * scored relative to its top-4 cosine neighborhood — the hub-robust
    * gate bitext mining and semantic-dedup triage use instead of a raw
    * cosine threshold. The oracle replays the brute top-4 ranking and
    * the SAME left-associated mean, so margin values hash-match. */
  val simBitextMargin: QueryDef = QueryDef(
    "sim_bitext_margin",
    (s, d) => Similarity.marginTopK(Tables.embeddings(s, d), "vec_id",
        "embedding", col("vec_id") % 50 === 0, k = 4)
      .orderBy("query_id"),
    Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
      |c AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings),
      |scored AS (
      |  SELECT query_id, cand_id,
      |    list_dot_product(CAST(qv AS DOUBLE[]), CAST(cv AS DOUBLE[])) /
      |      (sqrt(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[]))) *
      |       sqrt(list_dot_product(CAST(cv AS DOUBLE[]), CAST(cv AS DOUBLE[])))) AS cos
      |  FROM c, q WHERE query_id <> cand_id),
      |ranked AS (
      |  SELECT query_id, cand_id, cos,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS rk
      |  FROM scored),
      |t AS (SELECT query_id,
      |    max(CASE WHEN rk = 1 THEN cand_id END) AS best_id,
      |    max(CASE WHEN rk = 1 THEN cos END) AS c1,
      |    max(CASE WHEN rk = 2 THEN cos END) AS c2,
      |    max(CASE WHEN rk = 3 THEN cos END) AS c3,
      |    max(CASE WHEN rk = 4 THEN cos END) AS c4
      |  FROM ranked WHERE rk <= 4 GROUP BY query_id)
      |SELECT query_id, best_id, round(c1, 4) AS cos_r,
      |  round(c1 / ((((c1 + c2) + c3) + c4) / 4.0), 4) AS margin_r
      |FROM t ORDER BY query_id""".stripMargin))

  /** Deterministic contrastive negative sampling
    * ([[graft.ops.Similarity.negativeSamples]]): 8 hash-drawn corpus
    * negatives per query with their cosine hardness, reproducible across
    * engines because the draw is md5 mod corpus size into a dense
    * range-partitioned index ([[graft.ops.Sampling.denseIndex]] — the
    * no-global-window rank). The oracle replays index, draw, and cosine. */
  val sampleNegatives: QueryDef = QueryDef(
    "sample_negatives",
    (s, d) => Similarity.negativeSamples(Tables.embeddings(s, d), "vec_id",
        "embedding", col("vec_id") % 50 === 0, m = 8)
      .orderBy("query_id", "j"),
    Some("""WITH c AS (SELECT vec_id, embedding,
      |    row_number() OVER (ORDER BY vec_id) - 1 AS idx FROM embeddings),
      |n AS (SELECT count(*) AS cnt FROM embeddings),
      |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      |  WHERE vec_id % 50 = 0
      |    AND list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0),
      |d AS (SELECT query_id, qv, j,
      |    CAST(concat('0x', substr(md5(concat(CAST(query_id AS VARCHAR), ':',
      |      CAST(j AS VARCHAR))), 1, 15)) AS BIGINT) % cnt AS nidx
      |  FROM q, n, unnest(range(0, 8)) AS t(j))
      |SELECT query_id, j, c.vec_id AS neg_id,
      |  round(list_dot_product(CAST(qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) /
      |    (sqrt(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[]))) *
      |     sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))),
      |    4) AS cos_r,
      |  (c.vec_id = query_id) AS is_self
      |FROM d JOIN c ON d.nidx = c.idx
      |ORDER BY query_id, j""".stripMargin))

  /** Sign-LSH ANN top-5. Hyperplanes are md5-derived ±1 vectors, so the
    * oracle regenerates them and recomputes buckets + cosines exactly
    * (multiplying by ±1 is exact, making the projection bit-identical
    * across engines); recall additionally pinned in PipelineSpec against
    * the brute-force baseline. */
  val simAnnLsh: QueryDef = QueryDef(
    "sim_ann_lsh",
    (s, d) => Similarity.annTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        col("vec_id") % 50 === 0, k = 5, nPlanes = 4, dim = 64)
      .orderBy("query_id", "rk"),
    Some("""WITH planes AS (
      |  SELECT p, list(CASE WHEN strpos('13579bdf', substr(md5(p || ':' || d), 2, 1)) > 0
      |                 THEN 1.0 ELSE -1.0 END ORDER BY d) AS pv
      |  FROM range(0, 4) rp(p), range(1, 65) rd(d)
      |  GROUP BY p),
      |normed AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS vn
      |  FROM embeddings),
      |nz AS (SELECT * FROM normed WHERE vn > 0),
      |buckets AS (
      |  SELECT vec_id, v, vn,
      |    sum(CASE WHEN list_dot_product(v, pv) > 0 THEN (1::BIGINT << p) ELSE 0 END) AS bucket
      |  FROM nz, planes GROUP BY vec_id, v, vn),
      |q AS (SELECT vec_id AS query_id, v AS qv, vn AS qn,
      |    unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4), xor(bucket, 8)]) AS bucket
      |  FROM buckets WHERE vec_id % 50 = 0),
      |scored AS (
      |  SELECT query_id, b.vec_id AS cand_id,
      |    list_dot_product(qv, b.v) / (qn * b.vn) AS cos
      |  FROM buckets b JOIN q USING (bucket) WHERE query_id <> b.vec_id),
      |ranked AS (
      |  SELECT query_id, cand_id, cos,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS rk
      |  FROM scored)
      |SELECT query_id, rk, cand_id, round(cos, 4) AS cos_r
      |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin))

  /** Directed 3-NN GRAPH over the full embedding corpus under sign-LSH
    * blocking ([[graft.ops.Similarity.knnGraphLsh]]) — every vector is
    * a query, so candidates come from a bucket-keyed equi SELF-join
    * (sum-of-squared-bucket-sizes pairs, never all-pairs, nothing
    * corpus-sized broadcast) and per-node ranking is the bounded-heap
    * top-k aggregate (map-side combined — no window over the candidate
    * pairs). The k-NN graph is the substrate semantic clustering and
    * mutual-NN dedup build on (feed the edges to the connected-
    * components / label-propagation ops); the oracle replays hash,
    * pairs, cosine and id-tie-broken ranks exactly. */
  /** Shared oracle CTE chain for the LSH-blocked k-NN graph (6 sign
    * planes, dim 64, per-node rank over in-bucket cosine with id tie
    * break) — extended by both the edge gate and the cluster gate. */
  private val knnRankedSql: String =
    """planes AS (
      |  SELECT p, list(CASE WHEN strpos('13579bdf', substr(md5(p || ':' || d), 2, 1)) > 0
      |                 THEN 1.0 ELSE -1.0 END ORDER BY d) AS pv
      |  FROM range(0, 6) rp(p), range(1, 65) rd(d)
      |  GROUP BY p),
      |normed AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS vn
      |  FROM embeddings),
      |nz AS (SELECT * FROM normed WHERE vn > 0),
      |buckets AS (
      |  SELECT vec_id, v, vn,
      |    sum(CASE WHEN list_dot_product(v, pv) > 0 THEN (1::BIGINT << p) ELSE 0 END) AS bucket
      |  FROM nz, planes GROUP BY vec_id, v, vn),
      |scored AS (
      |  SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
      |    list_dot_product(a.v, b.v) / (a.vn * b.vn) AS cos
      |  FROM buckets a JOIN buckets b USING (bucket)
      |  WHERE a.vec_id <> b.vec_id),
      |ranked AS (
      |  SELECT src_id, dst_id, cos,
      |    row_number() OVER (PARTITION BY src_id ORDER BY cos DESC, dst_id ASC) AS rk
      |  FROM scored)""".stripMargin

  val simKnnGraph: QueryDef = QueryDef(
    "sim_knn_graph",
    (s, d) => Similarity.knnGraphLsh(Tables.embeddings(s, d), "vec_id",
        "embedding", k = 3, nPlanes = 6, dim = 64)
      .orderBy("src_id", "rk"),
    Some(s"""WITH $knnRankedSql
      |SELECT src_id, rk, dst_id, round(cos, 4) AS cos_r
      |FROM ranked WHERE rk <= 3 ORDER BY src_id, rk""".stripMargin))

  /** Mutual-NN semantic clustering — the composition the k-NN graph
    * exists for: keep only RECIPROCAL edges (each endpoint ranks the
    * other in its top-3 — the classic mutual-kNN density filter that
    * strips hub/chain edges), then run min-label connected components
    * ([[graft.ops.Dedup.connectedComponents]], the checkpointed
    * iterative op already gated by `dedup_cluster`) over them. Result
    * is every clustered vector with its cluster label; the oracle
    * replays the graph CTE and closes the components with a recursive
    * CTE. Scale: mutuality is one self-semi-join of the k-bounded edge
    * list (corpus × k rows, never candidate pairs), and CC is the
    * existing O(rounds) shuffle-join loop. */
  val simKnnClusters: QueryDef = QueryDef(
    "sim_knn_clusters",
    (s, d) => {
      val edges = Similarity.knnGraphLsh(Tables.embeddings(s, d), "vec_id",
          "embedding", k = 3, nPlanes = 6, dim = 64)
        .select(col("src_id"), col("dst_id"))
      // shuffle_hash: both sides are the k-bounded edge list (corpus × k
      // rows, broadcast impossible at scale) and semi-join needs no
      // sort order — the hash build skips two corpus-sized sorts (the
      // dedup_substrings hint precedent, pinned in PlanAuditSpec)
      val mutual = edges.join(
          edges.select(col("dst_id").as("src_id"), col("src_id").as("dst_id"))
            .hint("shuffle_hash"),
          Seq("src_id", "dst_id"), "left_semi")
        .filter(col("src_id") < col("dst_id"))
      // star alternation, not plain min-label: a mutual-kNN graph forms
      // long CHAINS (each node keeps only its reciprocal top-k), so the
      // O(diameter)-round propagation paid ~20 checkpointed rounds here
      // where large/small-star converges in O(log^2) — measured 10.5s
      // -> ~2s at sf0.1, identical labels (min of component) either way
      Dedup.connectedComponentsStar(mutual, "src_id", "dst_id").orderBy("id")
    },
    Some(s"""WITH RECURSIVE $knnRankedSql,
      |knn AS (SELECT src_id, dst_id FROM ranked WHERE rk <= 3),
      |mutual AS (
      |  SELECT a.src_id, a.dst_id FROM knn a
      |  JOIN knn b ON a.src_id = b.dst_id AND a.dst_id = b.src_id
      |  WHERE a.src_id < a.dst_id),
      |sym AS (SELECT src_id AS src, dst_id AS dst FROM mutual
      |  UNION SELECT dst_id AS src, src_id AS dst FROM mutual),
      |reach(id, r) AS (
      |  SELECT src, src FROM (SELECT DISTINCT src FROM sym)
      |  UNION
      |  SELECT s.src, r.r FROM sym s JOIN reach r ON s.dst = r.id)
      |SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
      |ORDER BY id""".stripMargin))

  /** TRUE hybrid retrieval ([[graft.ops.Similarity.hybridRetrieval]]):
    * dense cosine over the embedding column fused with a LEXICAL
    * distinct-shared-token ranking between query and candidate text by
    * truncated RRF — the production RAG hybrid (`sim_rrf_fusion` fuses
    * two dense rankers; this crosses modalities, so a candidate that is
    * lexically dead-on but embeds far away still surfaces). Corpus =
    * documents that carry embeddings (doc_id ≡ vec_id, the testdata
    * contract); every rank ties on candidate id and the fused score is
    * an exact integer micro-unit sum, so the oracle replays dense list,
    * inverted-index lexical list, and fusion bit-for-bit. */
  val simHybridRetrieval: QueryDef = QueryDef(
    "sim_hybrid_retrieval",
    (s, d) => {
      val corpus = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .join(Tables.embeddings(s, d)
          .select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
      Similarity.hybridRetrieval(corpus, "doc_id", "text", "embedding",
          col("doc_id") % 50 === 0, perList = 20, k = 5)
        .orderBy("query_id", "rk")
    },
    Some(s"""WITH corpus AS (
      |  SELECT d.doc_id AS id, d.text, e.embedding
      |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
      |nv AS (
      |  SELECT id, text, CAST(embedding AS DOUBLE[]) AS v,
      |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |         CAST(embedding AS DOUBLE[]))) AS vn
      |  FROM corpus),
      |q AS (SELECT id AS query_id, v AS qv, vn AS qn FROM nv
      |      WHERE id % 50 = 0 AND vn > 0),
      |c AS (SELECT id AS cand_id, v AS cv, vn AS cn FROM nv WHERE vn > 0),
      |dense AS (
      |  SELECT query_id, cand_id,
      |    row_number() OVER (PARTITION BY query_id ORDER BY
      |      list_dot_product(qv, cv) / (qn * cn) DESC, cand_id ASC) AS rk_dense
      |  FROM c, q WHERE query_id <> cand_id QUALIFY rk_dense <= 20),
      |toks AS (
      |  SELECT id, unnest(list_distinct(string_split($normalizeSql, ' '))) AS w
      |  FROM corpus),
      |tw AS (SELECT id, w FROM toks WHERE len(w) > 0),
      |qt AS (SELECT tw.id AS query_id, w FROM tw JOIN q ON tw.id = q.query_id),
      |shared AS (
      |  SELECT qt.query_id, tw.id AS cand_id, count(*) AS n_shared
      |  FROM tw JOIN qt USING (w) WHERE qt.query_id <> tw.id
      |  GROUP BY 1, 2),
      |lex AS (
      |  SELECT query_id, cand_id,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY n_shared DESC, cand_id ASC) AS rk_lex
      |  FROM shared QUALIFY rk_lex <= 20),
      |f AS (
      |  SELECT coalesce(a.query_id, b.query_id) AS query_id,
      |    coalesce(a.cand_id, b.cand_id) AS cand_id,
      |    coalesce(CAST(round(1000000.0 / (60 + rk_dense)) AS BIGINT), 0)
      |      + coalesce(CAST(round(1000000.0 / (60 + rk_lex)) AS BIGINT), 0)
      |      AS rrf_micro
      |  FROM dense a FULL OUTER JOIN lex b
      |    ON a.query_id = b.query_id AND a.cand_id = b.cand_id),
      |r AS (
      |  SELECT query_id, cand_id, rrf_micro,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY rrf_micro DESC, cand_id ASC) AS rk
      |  FROM f QUALIFY rk <= 5)
      |SELECT query_id, rk, cand_id, rrf_micro
      |FROM r ORDER BY query_id, rk""".stripMargin))

  /** IVF ANN top-5 — the inverted-file scale path (probe 2 of 16 cells;
    * recall pinned in PipelineSpec). Centroid seeding is an id-stride
    * (deterministic, no trained state), and cell assignment/probing rank
    * by the same bit-identical cosine both engines compute — so the whole
    * index build + search is oracle-recomputable. */
  val simIvf: QueryDef = QueryDef(
    "sim_ivf",
    (s, d) => Similarity.ivfTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        col("vec_id") % 50 === 0, k = 5, nCells = 16, nProbe = 2)
      .orderBy("query_id", "rk"),
    Some("""WITH normed AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS vn
      |  FROM embeddings),
      |nz AS (SELECT * FROM normed WHERE vn > 0),
      |mx AS (SELECT greatest(1, (max(vec_id) + 1) // 16) AS stride FROM nz),
      |cent AS (
      |  SELECT vec_id AS cell_id, v AS cv, vn AS cn FROM nz, mx
      |  WHERE vec_id % stride = 0 AND vec_id < stride * 16),
      |assigned AS (
      |  SELECT vec_id, v, vn, cell_id FROM (
      |    SELECT n.vec_id, n.v, n.vn, c.cell_id,
      |      row_number() OVER (PARTITION BY n.vec_id
      |        ORDER BY list_dot_product(n.v, c.cv) / (n.vn * c.cn) DESC, c.cell_id ASC) AS crk
      |    FROM nz n, cent c) WHERE crk = 1),
      |probes AS (
      |  SELECT query_id, qv, qn, cell_id FROM (
      |    SELECT n.vec_id AS query_id, n.v AS qv, n.vn AS qn, c.cell_id,
      |      row_number() OVER (PARTITION BY n.vec_id
      |        ORDER BY list_dot_product(n.v, c.cv) / (n.vn * c.cn) DESC, c.cell_id ASC) AS crk
      |    FROM nz n, cent c WHERE n.vec_id % 50 = 0) WHERE crk <= 2),
      |scored AS (
      |  SELECT query_id, a.vec_id AS cand_id,
      |    list_dot_product(qv, a.v) / (qn * a.vn) AS cos
      |  FROM assigned a JOIN probes USING (cell_id) WHERE query_id <> a.vec_id),
      |ranked AS (
      |  SELECT query_id, cand_id, cos,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS rk
      |  FROM scored)
      |SELECT query_id, rk, cand_id, round(cos, 4) AS cos_r
      |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin))

  /** Int8-quantized brute-force top-k: vectors quantize to symmetric
    * int8 codes (4x smaller on every wire the search touches), then the
    * SAME brute-force path ranks quantized cosines — the codes cast back
    * to float exactly (|q| <= 127), so the codegen'd dot stays on the
    * hot path and every quantized dot is an exact integer. The oracle
    * re-derives the quantization arithmetic end-to-end. */
  val simTopkInt8: QueryDef = QueryDef(
    "sim_topk_int8",
    (s, d) => {
      val q = Similarity.quantizeInt8(Tables.embeddings(s, d), "vec_id", "embedding")
        .select(col("id").as("vec_id"), col("q").cast("array<float>").as("embedding"))
      Similarity.bruteForceTopK(q, "vec_id", "embedding", col("vec_id") % 50 === 0, k = 5)
        .orderBy("query_id", "rk")
    },
    Some("""WITH m AS (
      |  SELECT vec_id, embedding,
      |    CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS maxabs
      |  FROM embeddings),
      |qz AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x ->
      |      greatest(-127.0, least(127.0, round(CAST(x AS DOUBLE) * (127.0 / maxabs))))) AS qv
      |  FROM m WHERE maxabs > 0),
      |q AS (SELECT vec_id AS query_id, qv FROM qz WHERE vec_id % 50 = 0),
      |c AS (SELECT vec_id AS cand_id, qv AS cv FROM qz),
      |scored AS (
      |  SELECT query_id, cand_id,
      |    list_dot_product(qv, cv) /
      |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
      |  FROM c, q
      |  WHERE query_id <> cand_id
      |    AND list_dot_product(qv, qv) > 0 AND list_dot_product(cv, cv) > 0),
      |ranked AS (
      |  SELECT query_id, cand_id, cos,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS rk
      |  FROM scored)
      |SELECT query_id, rk, cand_id, round(cos, 4) AS cos_r
      |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin))

  /** Product-quantization ADC top-5 — the memory-compression ANN path
    * (codes are 8 codeword ids per vector instead of 64 floats; see
    * [[graft.ops.Pq]]). Bit-deterministic end-to-end: the oracle replays
    * the per-subspace Lloyd rounds unrolled (grouped by subspace in ONE
    * CTE chain — all 8 codebooks train in the same SQL pass) and re-ranks
    * by the same exact integer ADC distances. */
  /** Shared CTE prefix for the PQ-family oracles: integer micro vectors
    * (`v`), subspace rows (`sub`), id-stride seeds, two unrolled Lloyd
    * rounds (`a2` = final codes, `cb2` = final codebook), query
    * subvectors (`q`) and the per-query ADC distance table (`dt`) —
    * exactly the arithmetic [[graft.ops.Pq]] executes. */
  /** One Lloyd assignment in SQL against codebook CTE `cb` — the packed
    * (dist·ks + cid) argmin over the `sub` CTE's subvector rows. */
  private def pqAssignSql(cb: String, ks: Int, src: String = "sub"): String =
    s"""SELECT id, sub, sv, CAST(min(key) % $ks AS BIGINT) AS cid
       |  FROM (
       |    SELECT s.id, s.sub, s.sv,
       |      CAST(list_sum([(s.sv[i] - c.cm[i]) * (s.sv[i] - c.cm[i])
       |                     for i in range(1, len(s.sv) + 1)]) AS BIGINT)
       |        * $ks + c.cid AS key
       |    FROM $src s JOIN $cb c ON s.sub = c.sub)
       |  GROUP BY id, sub, sv""".stripMargin

  /** One Lloyd centroid update in SQL over assignment CTE `a`. */
  private def pqUpdateSql(a: String): String =
    s"""SELECT sub, cid, list(cm_j ORDER BY dim) AS cm
       |  FROM (
       |    SELECT sub, cid, dim,
       |      CAST(round(CAST(sum(vv) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS cm_j
       |    FROM (SELECT sub, cid, generate_subscripts(sv, 1) AS dim, unnest(sv) AS vv FROM $a)
       |    GROUP BY sub, cid, dim)
       |  GROUP BY sub, cid""".stripMargin

  /** `trainWhere`: optional id predicate restricting TRAINING (stride
    * derivation, seeds, Lloyd assignment+update rounds) to a corpus
    * slice while the final encode (`a2`), queries and ADC still span the
    * full corpus — the oracle shape of the frozen-sidecar index append
    * ([[graft.ops.Pq.appendIvfPqIndex]]). None reproduces the original
    * full-corpus text byte-identically. */
  private def pqOracleCtes(m: Int, ks: Int, dsub: Int,
      trainWhere: Option[String] = None): String = {
    def assign(cb: String, src: String = "sub"): String = pqAssignSql(cb, ks, src)
    def update(a: String): String = pqUpdateSql(a)
    val mxFrom = trainWhere.fold("FROM v")(w => s"FROM v WHERE $w")
    val cb1And = trainWhere.fold("")(w => s" AND $w")
    val subtCte = trainWhere.fold("")(w =>
      s"\nsubt AS (SELECT * FROM sub WHERE $w),")
    val a1Src = trainWhere.fold("sub")(_ => "subt")
    s"""WITH v AS (
      |  SELECT CAST(vec_id AS BIGINT) AS id,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xm
      |  FROM embeddings),
      |sub AS (
      |  SELECT id, r.sub, xm[r.sub * $dsub + 1 : r.sub * $dsub + $dsub] AS sv
      |  FROM v, (SELECT unnest(range(0, $m)) AS sub) r),$subtCte
      |mx AS (SELECT greatest(1, (max(id) + 1) // $ks) AS stride $mxFrom),
      |cb1 AS (
      |  SELECT sub, id // stride AS cid, sv AS cm FROM sub, mx
      |  WHERE id % stride = 0 AND id // stride < $ks$cb1And),
      |a1 AS (${assign("cb1", a1Src)}),
      |cb2 AS (${update("a1")}),
      |a2 AS (${assign("cb2")}),
      |q AS (SELECT id AS query_id, sub, sv AS qsv FROM sub WHERE id % 50 = 0),
      |dt AS (
      |  SELECT query_id, c.sub, c.cid,
      |    CAST(list_sum([(q.qsv[i] - c.cm[i]) * (q.qsv[i] - c.cm[i])
      |                   for i in range(1, len(q.qsv) + 1)]) AS BIGINT) AS d
      |  FROM q JOIN cb2 c ON q.sub = c.sub)""".stripMargin
  }

  val simPqAdc: QueryDef = QueryDef(
    "sim_pq_adc",
    (s, d) => graft.ops.Pq.pqTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        col("vec_id") % 50 === 0, k = 5, dim = 64, m = 8, ks = 64, iters = 2)
      .orderBy("query_id", "rk"),
    Some(pqOracleCtes(m = 8, ks = 64, dsub = 8) + ",\n" +
      """scored AS (
        |  SELECT query_id, a.id AS cand_id, CAST(sum(d) AS BIGINT) AS adist
        |  FROM a2 a JOIN dt ON a.sub = dt.sub AND a.cid = dt.cid
        |  WHERE dt.query_id <> a.id
        |  GROUP BY query_id, a.id),
        |ranked AS (
        |  SELECT query_id, cand_id, adist,
        |    row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, cand_id ASC) AS rk
        |  FROM scored)
        |SELECT query_id, rk, cand_id, adist FROM ranked WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin))

  /** Shared IVF-ADC oracle CTE chain (coarse assignment, probing, ADC
    * scoring, per-query ADC ranking): sim_ivf_pq selects straight from
    * `ranked`; sim_ivf_pq_rerank refines it with an exact pass.
    * `trainWhere` restricts TRAINING (PQ seeds/rounds + coarse seeds) to
    * a corpus slice while cell assignment, encode, queries and ADC span
    * the full corpus — the append-to-frozen-index oracle; None
    * reproduces the full-corpus text byte-identically. */
  private def ivfAdcRankedCtesFor(trainWhere: Option[String]): String = {
    val mxcFrom = trainWhere.fold("FROM v")(w => s"FROM v WHERE $w")
    val ccAnd = trainWhere.fold("")(w => s" AND $w")
    pqOracleCtes(m = 8, ks = 64, dsub = 8, trainWhere) + ",\n" +
      s"""mxc AS (SELECT greatest(1, (max(id) + 1) // 16) AS stridec $mxcFrom),
        |cc AS (
        |  SELECT id // stridec AS cell_id, xm AS ccm FROM v, mxc
        |  WHERE id % stridec = 0 AND id // stridec < 16$ccAnd),""".stripMargin + "\n" +
      ivfAdcTail
  }

  // a def, not a val: ivfAdcRankedCtes (a val above in init order) calls
  // ivfAdcRankedCtesFor which reads this — a val here would still be
  // null at that point in the object's initialization
  private def ivfAdcTail: String =
    """ca AS (
        |  SELECT id, CAST(min(
        |      CAST(list_sum([(v.xm[i] - c.ccm[i]) * (v.xm[i] - c.ccm[i])
        |                     for i in range(1, len(v.xm) + 1)]) AS BIGINT)
        |        * 16 + c.cell_id) % 16 AS BIGINT) AS cell
        |  FROM v, cc c GROUP BY id),
        |qp AS (
        |  SELECT query_id, cell FROM (
        |    SELECT v.id AS query_id, c.cell_id AS cell,
        |      row_number() OVER (PARTITION BY v.id
        |        ORDER BY CAST(list_sum([(v.xm[i] - c.ccm[i]) * (v.xm[i] - c.ccm[i])
        |                     for i in range(1, len(v.xm) + 1)]) AS BIGINT) ASC,
        |          c.cell_id ASC) AS crk
        |    FROM v, cc c WHERE v.id % 50 = 0)
        |  WHERE crk <= 4),
        |scored AS (
        |  SELECT dt.query_id, a.id AS cand_id, CAST(sum(d) AS BIGINT) AS adist
        |  FROM a2 a
        |  JOIN ca ON a.id = ca.id
        |  JOIN qp ON ca.cell = qp.cell
        |  JOIN dt ON a.sub = dt.sub AND a.cid = dt.cid AND dt.query_id = qp.query_id
        |  WHERE dt.query_id <> a.id
        |  GROUP BY dt.query_id, a.id),
        |ranked AS (
        |  SELECT query_id, cand_id, adist,
        |    row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, cand_id ASC) AS rk
        |  FROM scored)""".stripMargin

  private val ivfAdcRankedCtes: String = ivfAdcRankedCtesFor(None)

  /** IVF-PQ composition (the FAISS IVFADC shape): 16 id-stride coarse
    * cells prune each query to its 4 nearest, and the SAME PQ-ADC
    * machinery ranks only candidates inside probed cells — bounding the
    * flat scan's nq·N scored pairs to nq·Σ|probed cells|. The oracle
    * replays coarse assignment (integer L2 argmin, ties to the lower
    * cell), probing (top-4 cells), Lloyd training, and ADC bit-for-bit
    * on top of the shared PQ CTE prefix. */
  val simIvfPq: QueryDef = QueryDef(
    "sim_ivf_pq",
    (s, d) => graft.ops.Pq.ivfPqTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        col("vec_id") % 50 === 0, k = 5, dim = 64, m = 8, ks = 64, iters = 2,
        nCells = 16, nProbe = 4)
      .orderBy("query_id", "rk"),
    Some(ivfAdcRankedCtes + "\n" +
      """SELECT query_id, rk, cand_id, adist FROM ranked WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin))

  /** IVF-PQ + EXACT RE-RANK (the FAISS refine stage,
    * [[graft.ops.Pq.ivfPqRerankTopK]]): ADC selects each query's top-20
    * candidates, an exact full-dim integer squared-L2 pass over the
    * original vectors re-ranks them to the final top-5. The oracle
    * refines the shared ADC chain with a plain integer self-join on v —
    * both the candidate set (same (adist, cand_id) tie-break) and the
    * exact distances replay bit-for-bit. */
  val simIvfPqRerank: QueryDef = QueryDef(
    "sim_ivf_pq_rerank",
    (s, d) => graft.ops.Pq.ivfPqRerankTopK(Tables.embeddings(s, d), "vec_id",
        "embedding", col("vec_id") % 50 === 0, k = 5, dim = 64, m = 8,
        ks = 64, iters = 2, nCells = 16, nProbe = 4, rerankR = 20)
      .orderBy("query_id", "rk"),
    Some(ivfAdcRankedCtes + ",\n" +
      """cand AS (SELECT query_id, cand_id FROM ranked WHERE rk <= 20),
        |exact AS (
        |  SELECT c.query_id, c.cand_id,
        |    CAST(list_sum([(q.xm[i] - x.xm[i]) * (q.xm[i] - x.xm[i])
        |                   for i in range(1, len(q.xm) + 1)]) AS BIGINT) AS dist
        |  FROM cand c JOIN v q ON q.id = c.query_id JOIN v x ON x.id = c.cand_id),
        |rr AS (
        |  SELECT query_id, cand_id, dist,
        |    row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, cand_id ASC) AS rk
        |  FROM exact)
        |SELECT query_id, rk, cand_id, dist FROM rr WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin))

  /** The same IVF-PQ search served from a PERSISTED index
    * ([[graft.ops.Pq.writeIvfPqIndex]] / `ivfPqIndexedTopK`) — the
    * production serving split: the corpus is trained + encoded ONCE into
    * a codes table bucketed by coarse cell plus tiny centroid/codebook
    * sidecars, and the query batch probes it with ZERO retraining — it
    * encodes row-locally against the broadcast sidecars and its bounded
    * probed-cell set prunes the index scan at the bucket level
    * (`SelectedBucketsCount`, PlanAudit pin). The incremental-ANN twin
    * of [[dedupIncrementalLshBucketed]]. Training arithmetic is
    * identical to the inline composition, so values match
    * [[simIvfPq]] bit-for-bit and the oracle is shared. */
  val simIvfPqIndexed: QueryDef = simIvfPq.copy(
    name = "sim_ivf_pq_indexed",
    build = (s, d) => {
      val emb = Tables.embeddings(s, d)
      // session-suffixed name/paths: concurrent runs must not clobber
      // each other's index mid-query
      val tok = graft.sources.TableIO.sessionToken(s)
      val sidecar = graft.sources.TableIO.scratchDir(s, "ivfpq_index/sidecar")
      graft.ops.Pq.writeIvfPqIndex(emb, "vec_id", "embedding",
        s"graft_ivfpq_codes_$tok", buckets = 8, sidecarPath = sidecar,
        dim = 64, path = Some(graft.sources.TableIO.scratchDir(s, "ivfpq_index/codes")),
        m = 8, ks = 64, iters = 2, nCells = 16)
      graft.ops.Pq.ivfPqIndexedTopK(emb.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", s"graft_ivfpq_codes_$tok", sidecar,
          k = 5, dim = 64, m = 8, nProbe = 4)
        .orderBy("query_id", "rk")
    })

  /** Index MAINTENANCE gate — the append half of the persisted-index
    * lifecycle ([[graft.ops.Pq.appendIvfPqIndex]]): the index is built
    * on 90% of the corpus (vec_id % 10 != 9), the remaining 10% batch
    * is absorbed with ZERO retraining (row-local encode against the
    * frozen sidecars, bucketed append — existing index files never
    * rewritten), and the probe then searches old + new rows through the
    * same bucket-pruned scan. The oracle trains stride seeds, coarse
    * centroids and both Lloyd rounds on the 90% slice only but encodes
    * and ranks the FULL corpus — exactly what build-then-append
    * persists — so a drifted append (any retraining, any re-encode of
    * old rows) breaks the match. */
  val simIvfPqAppended: QueryDef = simIvfPq.copy(
    name = "sim_ivf_pq_appended",
    build = (s, d) => {
      val emb = Tables.embeddings(s, d)
      val tok = graft.sources.TableIO.sessionToken(s)
      val sidecar = graft.sources.TableIO.scratchDir(s, "ivfpq_index_app/sidecar")
      val table = s"graft_ivfpq_codes_app_$tok"
      graft.ops.Pq.writeIvfPqIndex(emb.filter(col("vec_id") % 10 =!= 9),
        "vec_id", "embedding", table, buckets = 8, sidecarPath = sidecar,
        dim = 64, path = Some(graft.sources.TableIO.scratchDir(s, "ivfpq_index_app/codes")),
        m = 8, ks = 64, iters = 2, nCells = 16)
      graft.ops.Pq.appendIvfPqIndex(emb.filter(col("vec_id") % 10 === 9),
        "vec_id", "embedding", table, buckets = 8, sidecarPath = sidecar,
        dim = 64, m = 8)
      graft.ops.Pq.ivfPqIndexedTopK(emb.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", table, sidecar, k = 5, dim = 64, m = 8,
          nProbe = 4)
        .orderBy("query_id", "rk")
    },
    oracle = Some(ivfAdcRankedCtesFor(Some("id % 10 <> 9")) + "\n" +
      """SELECT query_id, rk, cand_id, adist FROM ranked WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin))

  /** RESIDUAL IVF-PQ — the complete FAISS IVFADC design
    * ([[graft.ops.Pq.ivfPqResidualTopK]]): PQ codebooks train on the
    * residuals to each vector's coarse centroid, so codewords describe
    * within-cell variation instead of re-describing the coarse
    * structure; queries re-center per probed cell (the ADC table is
    * per-(query, cell)). The oracle replays coarse assignment,
    * residual computation, Lloyd training ON RESIDUALS, and the
    * per-cell ADC bit-for-bit. */
  val simIvfPqResidual: QueryDef = {
    val (m, ks, dsub, nCells, nProbe) = (8, 64, 8, 16, 4)
    QueryDef(
      "sim_ivf_pq_residual",
      (s, d) => graft.ops.Pq.ivfPqResidualTopK(Tables.embeddings(s, d),
          "vec_id", "embedding", col("vec_id") % 50 === 0, k = 5, dim = 64,
          m = m, ks = ks, iters = 2, nCells = nCells, nProbe = nProbe)
        .orderBy("query_id", "rk"),
      Some(s"""WITH v AS (
        |  SELECT CAST(vec_id AS BIGINT) AS id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xm
        |  FROM embeddings),
        |mxc AS (SELECT greatest(1, (max(id) + 1) // $nCells) AS stridec FROM v),
        |ccb1 AS (
        |  SELECT id // stridec AS cell_id, xm AS ccm FROM v, mxc
        |  WHERE id % stridec = 0 AND id // stridec < $nCells),
        |cca1 AS (
        |  SELECT id, CAST(min(
        |      CAST(list_sum([(v.xm[i] - c.ccm[i]) * (v.xm[i] - c.ccm[i])
        |                     for i in range(1, len(v.xm) + 1)]) AS BIGINT)
        |        * $nCells + c.cell_id) % $nCells AS BIGINT) AS cell
        |  FROM v, ccb1 c GROUP BY id),
        |cc AS (
        |  SELECT cell AS cell_id, list(cm_j ORDER BY dim) AS ccm FROM (
        |    SELECT cell, dim,
        |      CAST(round(CAST(sum(vv) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS cm_j
        |    FROM (SELECT a.cell, generate_subscripts(v.xm, 1) AS dim, unnest(v.xm) AS vv
        |          FROM v JOIN cca1 a ON v.id = a.id)
        |    GROUP BY cell, dim)
        |  GROUP BY cell),
        |ca AS (
        |  SELECT id, CAST(min(
        |      CAST(list_sum([(v.xm[i] - c.ccm[i]) * (v.xm[i] - c.ccm[i])
        |                     for i in range(1, len(v.xm) + 1)]) AS BIGINT)
        |        * $nCells + c.cell_id) % $nCells AS BIGINT) AS cell
        |  FROM v, cc c GROUP BY id),
        |qp AS (
        |  SELECT query_id, cell FROM (
        |    SELECT v.id AS query_id, c.cell_id AS cell,
        |      row_number() OVER (PARTITION BY v.id
        |        ORDER BY CAST(list_sum([(v.xm[i] - c.ccm[i]) * (v.xm[i] - c.ccm[i])
        |                     for i in range(1, len(v.xm) + 1)]) AS BIGINT) ASC,
        |          c.cell_id ASC) AS crk
        |    FROM v, cc c WHERE v.id % 50 = 0)
        |  WHERE crk <= $nProbe),
        |resv AS (
        |  SELECT v.id, ca.cell,
        |    [v.xm[i] - c.ccm[i] for i in range(1, len(v.xm) + 1)] AS rm
        |  FROM v JOIN ca ON v.id = ca.id JOIN cc c ON ca.cell = c.cell_id),
        |sub AS (
        |  SELECT id, r.sub, rm[r.sub * $dsub + 1 : r.sub * $dsub + $dsub] AS sv
        |  FROM resv, (SELECT unnest(range(0, $m)) AS sub) r),
        |mx AS (SELECT greatest(1, (max(id) + 1) // $ks) AS stride FROM v),
        |cb1 AS (
        |  SELECT sub, id // stride AS cid, sv AS cm FROM sub, mx
        |  WHERE id % stride = 0 AND id // stride < $ks),
        |a1 AS (${pqAssignSql("cb1", ks)}),
        |cb2 AS (${pqUpdateSql("a1")}),
        |a2 AS (${pqAssignSql("cb2", ks)}),
        |qres AS (
        |  SELECT qp.query_id, qp.cell,
        |    [v.xm[i] - c.ccm[i] for i in range(1, len(v.xm) + 1)] AS qrm
        |  FROM qp JOIN v ON v.id = qp.query_id JOIN cc c ON qp.cell = c.cell_id),
        |qsub AS (
        |  SELECT query_id, cell, r.sub,
        |    qrm[r.sub * $dsub + 1 : r.sub * $dsub + $dsub] AS qsv
        |  FROM qres, (SELECT unnest(range(0, $m)) AS sub) r),
        |dt AS (
        |  SELECT query_id, cell, c.sub, c.cid,
        |    CAST(list_sum([(q.qsv[i] - c.cm[i]) * (q.qsv[i] - c.cm[i])
        |                   for i in range(1, len(q.qsv) + 1)]) AS BIGINT) AS d
        |  FROM qsub q JOIN cb2 c ON q.sub = c.sub),
        |scored AS (
        |  SELECT dt.query_id, a.id AS cand_id, CAST(sum(d) AS BIGINT) AS adist
        |  FROM a2 a
        |  JOIN ca ON a.id = ca.id
        |  JOIN qp ON ca.cell = qp.cell
        |  JOIN dt ON dt.query_id = qp.query_id AND dt.cell = qp.cell
        |         AND a.sub = dt.sub AND a.cid = dt.cid
        |  WHERE dt.query_id <> a.id
        |  GROUP BY dt.query_id, a.id),
        |ranked AS (
        |  SELECT query_id, cand_id, adist,
        |    row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, cand_id ASC) AS rk
        |  FROM scored)
        |SELECT query_id, rk, cand_id, adist FROM ranked WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin))
  }

  /** Model-based quality filter (fasttext/CCNet shape): linear score
    * over md5-hashed word-unigram buckets with an integer weight table —
    * the structure of the learned quality classifiers, bit-exact in both
    * engines because the demo weights regenerate from md5 (see
    * [[TextOps.pseudoWeights]]). The weight vector is a plan literal
    * (per-task constant, no join) and the logit is the row-local
    * [[graft.functions.HashedBagScore]] kernel — zero shuffles before
    * the output sort. */
  val textQualityModel: QueryDef = QueryDef(
    "text_quality_model",
    (s, d) => TextOps.hashedQualityScore(Tables.documents(s, d), "doc_id", "text",
        TextOps.pseudoWeights(4096), bias = 0L)
      .orderBy("doc_id"),
    Some {
      val u64 = "18446744073709551616::HUGEINT"
      val i63 = "9223372036854775808::HUGEINT"
      def md5u(e: String) =
        s"""(CAST(concat('0x', substr(md5($e), 1, 8)) AS BIGINT)::HUGEINT * 4294967296::HUGEINT
           | + CAST(concat('0x', substr(md5($e), 9, 8)) AS BIGINT)::HUGEINT)""".stripMargin
      s"""WITH w AS (
        |  SELECT doc_id, unnest(string_split($normalizeSql, ' ')) AS w FROM documents),
        |wn AS (SELECT doc_id, w FROM w WHERE length(w) > 0),
        |bkt AS (SELECT doc_id, CAST(${md5u("w")} % 4096 AS BIGINT) AS b FROM wn),
        |wt AS (SELECT doc_id,
        |  (CASE WHEN uw >= $i63 THEN uw - $u64 ELSE uw END % 7 + 7) % 7 - 3 AS wt
        |  FROM (SELECT doc_id, ${md5u("'w:' || b")} AS uw FROM bkt)),
        |scored AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS score FROM wt GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(s.score, 0) AS score, coalesce(s.score, 0) > 0 AS keep
        |FROM documents d LEFT JOIN scored s USING (doc_id)
        |ORDER BY doc_id""".stripMargin
    })

  /** Language ID heuristic per document. */
  val textLangid: QueryDef = QueryDef(
    "text_langid",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"), TextOps.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id"),
    Some {
      def hits(l: String, wordsList: Seq[String]) =
        s"len(list_filter(w, x -> x IN (${wordsList.map(w => s"'$w'").mkString(", ")}))) AS h_$l"
      val en = Seq("the", "and", "of", "to", "in", "is", "that", "for")
      val es = Seq("el", "la", "de", "que", "los", "las", "una", "por")
      val fr = Seq("le", "la", "les", "des", "est", "dans", "pour", "que")
      val de = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein")
      s"""WITH words AS (SELECT doc_id, string_split($normalizeSql, ' ') AS w FROM documents),
        |h AS (SELECT doc_id, ${hits("de", de)}, ${hits("en", en)}, ${hits("es", es)}, ${hits("fr", fr)} FROM words),
        |b AS (SELECT doc_id, h_de, h_en, h_es, h_fr, greatest(h_de, h_en, h_es, h_fr) AS best FROM h)
        |SELECT doc_id,
        |  CASE WHEN best = 0 THEN 'und'
        |       WHEN h_de = best THEN 'de' WHEN h_en = best THEN 'en'
        |       WHEN h_es = best THEN 'es' ELSE 'fr' END AS lang_pred
        |FROM b ORDER BY doc_id""".stripMargin
    })

  /** LANGID CONFUSION MATRIX: the n-gram language heuristic's prediction
    * against the corpus's labeled `lang` column — the acceptance audit
    * for the heuristic itself (text_langid gates the predictions;
    * this gates how often they're RIGHT, per (label, prediction) cell,
    * with the per-label hit rate). Same one-scan row-local vote
    * expression; one 16-cell map-combined aggregate; hit rate is one
    * guarded IEEE division. */
  val textLangConfusion: QueryDef = QueryDef(
    "text_lang_confusion",
    (s, d) => {
      val cells = Tables.documents(s, d)
        .select(col("lang"), TextOps.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
      val perLabel = Window.partitionBy(col("lang"))
      cells
        .withColumn("n_label", sum(col("n")).over(perLabel))
        .select(col("lang"), col("lang_pred"), col("n"),
          round(col("n").cast("double") /
            nullif(col("n_label"), lit(0L)).cast("double"), 4).as("cell_rate"))
        .orderBy("lang", "lang_pred")
    },
    Some {
      def hits(l: String, wordsList: Seq[String]) =
        s"len(list_filter(w, x -> x IN (${wordsList.map(w => s"'$w'").mkString(", ")}))) AS h_$l"
      val en = Seq("the", "and", "of", "to", "in", "is", "that", "for")
      val es = Seq("el", "la", "de", "que", "los", "las", "una", "por")
      val fr = Seq("le", "la", "les", "des", "est", "dans", "pour", "que")
      val de = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein")
      s"""WITH words AS (SELECT doc_id, lang, string_split($normalizeSql, ' ') AS w FROM documents),
        |h AS (SELECT doc_id, lang, ${hits("de", de)}, ${hits("en", en)}, ${hits("es", es)}, ${hits("fr", fr)} FROM words),
        |b AS (SELECT doc_id, lang, h_de, h_en, h_es, h_fr, greatest(h_de, h_en, h_es, h_fr) AS best FROM h),
        |p AS (SELECT lang,
        |  CASE WHEN best = 0 THEN 'und'
        |       WHEN h_de = best THEN 'de' WHEN h_en = best THEN 'en'
        |       WHEN h_es = best THEN 'es' ELSE 'fr' END AS lang_pred
        |  FROM b),
        |c AS (SELECT lang, lang_pred, count(*) AS n FROM p GROUP BY lang, lang_pred),
        |t AS (SELECT lang, lang_pred, n,
        |  CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS n_label FROM c)
        |SELECT lang, lang_pred, n,
        |  round(CAST(n AS DOUBLE) / CAST(nullif(n_label, 0) AS DOUBLE), 4) AS cell_rate
        |FROM t ORDER BY lang, lang_pred""".stripMargin
    })

  /** BENFORD FIRST-DIGIT AUDIT: observed leading-digit distribution of
    * order totals against Benford's law — the forensic-accounting /
    * data-quality screen for fabricated or truncated numeric columns.
    * The expected shares are FIXED literals (log10(1+1/d) to 5 dp —
    * spec'd constants, no runtime log), observed counts are exact
    * integers, the deviation is one IEEE expression per digit. One scan,
    * 9-group map-combined aggregate. */
  val qBenfordDigits: QueryDef = QueryDef(
    "q_benford_digits",
    (s, d) => {
      val expected = Seq(0.30103, 0.17609, 0.12494, 0.09691, 0.07918,
        0.06695, 0.05799, 0.05115, 0.04576)
      val expArr = array(expected.map(lit): _*)
      val whole = Window.partitionBy()
      Tables.orders(s, d)
        .select(substring(round(col("o_totalprice") * 100).cast("long")
          .cast("string"), 1, 1).cast("long").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
        .withColumn("n_total", sum(col("n")).over(whole))
        .select(col("digit"), col("n"),
          round(col("n").cast("double") / col("n_total").cast("double"), 4)
            .as("observed"),
          element_at(expArr, col("digit").cast("int")).as("expected"),
          round(abs(col("n").cast("double") / col("n_total").cast("double")
            - element_at(expArr, col("digit").cast("int"))), 4).as("abs_dev"))
        .orderBy("digit")
    },
    Some("""WITH e AS (
      |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
      |  FROM orders),
      |c AS (SELECT digit, count(*) AS n FROM e GROUP BY digit),
      |t AS (SELECT digit, n, CAST(sum(n) OVER () AS BIGINT) AS n_total FROM c),
      |x AS (SELECT digit, n, n_total,
      |  CAST(([0.30103, 0.17609, 0.12494, 0.09691, 0.07918,
      |    0.06695, 0.05799, 0.05115, 0.04576])[CAST(digit AS INT)] AS DOUBLE) AS expected
      |  FROM t)
      |SELECT digit, n,
      |  round(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE), 4) AS observed,
      |  expected,
      |  round(abs(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE) - expected), 4) AS abs_dev
      |FROM x ORDER BY digit""".stripMargin))

  /** HTML ingest front door: boilerplate-stripping text extraction
    * ([[graft.ops.TextOps.htmlExtract]] — the jusText/boilerpipe block-
    * length signal) composed with language ID over the EXTRACTED text.
    * The corpus is closed-form HTML (title/nav/sidebar/footer chrome
    * around the document body, SQL-regenerable), so the oracle rebuilds
    * the pages, replays the identical tag-split/trim/length-filter list
    * algebra, and re-derives the language votes — extraction and the
    * downstream gate are value-checked end-to-end. Scale: one narrow
    * codegen'd pass, block lists never leave their row, no shuffle
    * before the output sort. */
  val ingestHtmlExtract: QueryDef = QueryDef(
    "ingest_html_extract",
    (s, d) => {
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title></head><body><nav>home | about | contact | login</nav>" +
          "<div id=\"side\">related: item "),
        (col("doc_id") % 7).cast("string"),
        lit("</div><p>"), col("text"),
        lit("</p><footer>copyright 2026 example corp</footer></body></html>"))
      val blocks = TextOps.htmlBlocks(col("html"))
      val nonempty = filter(blocks, b => length(b) > 0)
      val dropped = filter(blocks, b => length(b) > 0 && length(b) < 40)
      Tables.documents(s, d)
        .select(col("doc_id"), html.as("html"))
        .select(col("doc_id"),
          size(nonempty).cast(LongType).as("n_blocks"),
          aggregate(dropped, lit(0L),
            (acc, x) => acc + length(x).cast(LongType)).as("boilerplate_chars"),
          TextOps.htmlExtract(col("html"), 40).as("extracted"))
        .withColumn("extracted_chars", length(col("extracted")).cast(LongType))
        .withColumn("lang_pred", TextOps.langId(col("extracted")))
        .orderBy("doc_id")
    },
    Some {
      def hits(l: String, wordsList: Seq[String]) =
        s"len(list_filter(w, x -> x IN (${wordsList.map(w => s"'$w'").mkString(", ")}))) AS h_$l"
      val en = Seq("the", "and", "of", "to", "in", "is", "that", "for")
      val es = Seq("el", "la", "de", "que", "los", "las", "una", "por")
      val fr = Seq("le", "la", "les", "des", "est", "dans", "pour", "que")
      val de = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein")
      s"""WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
        |    '</title></head><body><nav>home | about | contact | login</nav>' ||
        |    '<div id="side">related: item ' || CAST(doc_id % 7 AS VARCHAR) ||
        |    '</div><p>' || text ||
        |    '</p><footer>copyright 2026 example corp</footer></body></html>' AS html
        |  FROM documents),
        |b AS (
        |  SELECT doc_id,
        |    list_transform(regexp_split_to_array(html, '<[^>]*>'), x -> trim(x)) AS bl
        |  FROM h),
        |e AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(bl, x -> len(x) > 0)) AS BIGINT) AS n_blocks,
        |    CAST(coalesce(list_sum(list_transform(
        |      list_filter(bl, x -> len(x) > 0 AND len(x) < 40), x -> len(x))), 0)
        |      AS BIGINT) AS boilerplate_chars,
        |    array_to_string(list_filter(bl, x -> len(x) >= 40), ' ') AS extracted
        |  FROM b),
        |words AS (
        |  SELECT doc_id, n_blocks, boilerplate_chars, extracted,
        |    string_split(trim(regexp_replace(regexp_replace(lower(extracted),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS w
        |  FROM e),
        |sc AS (SELECT *, ${hits("de", de)}, ${hits("en", en)}, ${hits("es", es)}, ${hits("fr", fr)} FROM words),
        |v AS (SELECT *, greatest(h_de, h_en, h_es, h_fr) AS best FROM sc)
        |SELECT doc_id, n_blocks, boilerplate_chars, extracted,
        |  CAST(length(extracted) AS BIGINT) AS extracted_chars,
        |  CASE WHEN best = 0 THEN 'und'
        |       WHEN h_de = best THEN 'de' WHEN h_en = best THEN 'en'
        |       WHEN h_es = best THEN 'es' ELSE 'fr' END AS lang_pred
        |FROM v ORDER BY doc_id""".stripMargin
    })

  /** URL canonicalization + dedup ([[graft.ops.Web.canonicalizeUrl]]):
    * a closed-form crawl log carries each logical page under 4 chrome
    * variants (case-shuffled scheme/host + explicit default port,
    * tracking params, fragments, shuffled query order); canonicalization
    * collapses them and the gate counts variants merged per canonical
    * URL plus the registrable-domain key
    * ([[graft.ops.Web.registrableDomain]]) the per-domain caps and
    * blocklist joins run on. Raw-URL dedup would merge NOTHING here
    * (all variants differ byte-wise) — the oracle replays the full
    * normalization chain, so the rules themselves are value-gated.
    * Scale: row-local regex/list algebra fused with the scan; the only
    * exchange is the final group-by on the canonical key. */
  val ingestUrlCanonicalize: QueryDef = QueryDef(
    "ingest_url_canonicalize",
    (s, d) => {
      val k = expr("doc_id div 4")
      val v = col("doc_id") % 4
      val scheme = when(k % 2 === 0, lit("http")).otherwise(lit("https"))
      val defPort = when(k % 2 === 0, lit(":80")).otherwise(lit(":443"))
      val host = concat(lit("www.example"), (k % 50).cast("string"), lit(".com"))
      val path = concat(lit("/a/b"), (k % 7).cast("string"))
      val url =
        when(v === 0, concat(scheme, lit("://"), host, path, lit("?a=1&b=2")))
          .when(v === 1, concat(upper(scheme), lit("://"), upper(host), defPort,
            path, lit("?b=2&a=1")))
          .when(v === 2, concat(scheme, lit("://"), host, path,
            lit("?utm_source=news&a=1&b=2#frag")))
          .otherwise(concat(scheme, lit("://"), host, path,
            lit("?fbclid=xyz&b=2&a=1#x")))
      Tables.documents(s, d).select(col("doc_id"), url.as("url"))
        .select(col("doc_id"), graft.ops.Web.canonicalizeUrl(col("url")).as("canon"))
        .groupBy(col("canon"))
        .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("first_id"))
        .withColumn("domain", graft.ops.Web.registrableDomain(
          regexp_extract(col("canon"), "^[a-z]+://([^/]+)", 1)))
        .orderBy("canon")
    },
    Some("""WITH u AS (
      |  SELECT doc_id,
      |    CASE WHEN (doc_id // 4) % 2 = 0 THEN 'http' ELSE 'https' END AS scheme,
      |    CASE WHEN (doc_id // 4) % 2 = 0 THEN ':80' ELSE ':443' END AS defport,
      |    'www.example' || CAST((doc_id // 4) % 50 AS VARCHAR) || '.com' AS host,
      |    '/a/b' || CAST((doc_id // 4) % 7 AS VARCHAR) AS path,
      |    doc_id % 4 AS v
      |  FROM documents),
      |raw AS (
      |  SELECT doc_id,
      |    CASE WHEN v = 0 THEN scheme || '://' || host || path || '?a=1&b=2'
      |         WHEN v = 1 THEN upper(scheme) || '://' || upper(host) || defport || path || '?b=2&a=1'
      |         WHEN v = 2 THEN scheme || '://' || host || path || '?utm_source=news&a=1&b=2#frag'
      |         ELSE scheme || '://' || host || path || '?fbclid=xyz&b=2&a=1#x' END AS url
      |  FROM u),
      |parts AS (
      |  SELECT doc_id,
      |    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
      |    regexp_replace(regexp_replace(url, '^[A-Za-z]+://', ''), '#.*$', '') AS nofrag
      |  FROM raw),
      |p2 AS (
      |  SELECT doc_id, scheme,
      |    lower(regexp_extract(nofrag, '^([^/?]+)', 1)) AS hostport,
      |    regexp_extract(nofrag, '^[^/?]+(/[^?]*)?', 1) AS path,
      |    regexp_extract(nofrag, '\?(.*)$', 1) AS query
      |  FROM parts),
      |p3 AS (
      |  SELECT doc_id, scheme,
      |    CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
      |         WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
      |         ELSE hostport END AS host,
      |    path,
      |    array_to_string(list_sort(list_filter(string_split(query, '&'),
      |      p -> NOT regexp_matches(p, '^(utm_[^=]*|gclid|fbclid)=') AND len(p) > 0)),
      |      '&') AS q
      |  FROM p2),
      |c AS (
      |  SELECT doc_id,
      |    scheme || '://' || host ||
      |    CASE WHEN path = '' THEN '/' ELSE path END ||
      |    CASE WHEN q = '' THEN '' ELSE '?' || q END AS canon
      |  FROM p3),
      |g AS (
      |  SELECT canon, count(*) AS n_variants, min(doc_id) AS first_id
      |  FROM c GROUP BY canon)
      |SELECT canon, n_variants, first_id,
      |  regexp_extract(regexp_extract(canon, '^[a-z]+://([^/]+)', 1),
      |    '([^.]+\.[^.]+)$', 1) AS domain
      |FROM g ORDER BY canon""".stripMargin))

  /** Quality-scoring features per document. */
  val textQuality: QueryDef = QueryDef(
    "text_quality",
    (s, d) => {
      // ratios are computed/rounded in DECIMAL(18,6) (identical in both
      // engines), then the FINAL value is cast to DOUBLE so the driver's
      // hash compare is representation-stable across engines.
      val ratioCols = Set("mean_word_len", "punct_ratio", "digit_ratio", "stopword_ratio")
      val cols = TextOps.qualityFeatures(col("text")).map { case (n, c) =>
        (if (ratioCols(n)) c.cast("double") else c).as(n)
      }
      Tables.documents(s, d).select(col("doc_id") +: cols: _*).orderBy("doc_id")
    },
    Some(s"""WITH base AS (
      |  SELECT doc_id, text, $normalizeSql AS norm,
      |    string_split($normalizeSql, ' ') AS w
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_chars,
      |  CAST(CASE WHEN length(norm) = 0 THEN 0 ELSE len(w) END AS BIGINT) AS n_words,
      |  CAST(CASE WHEN (CASE WHEN length(norm) = 0 THEN 0 ELSE len(w) END) > 0
      |    THEN CAST(CAST(length(norm) - len(w) + 1 AS DECIMAL(18,6)) / CAST(len(w) AS DECIMAL(18,6)) AS DECIMAL(18,6))
      |    ELSE NULL END AS DOUBLE) AS mean_word_len,
      |  CAST(CAST(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DECIMAL(18,6)) / CAST(greatest(length(text), 1) AS DECIMAL(18,6)) AS DECIMAL(18,6)) AS DOUBLE) AS punct_ratio,
      |  CAST(CAST(CAST(len(regexp_extract_all(text, '[0-9]')) AS DECIMAL(18,6)) / CAST(greatest(length(text), 1) AS DECIMAL(18,6)) AS DECIMAL(18,6)) AS DOUBLE) AS digit_ratio,
      |  CAST(CASE WHEN (CASE WHEN length(norm) = 0 THEN 0 ELSE len(w) END) > 0
      |    THEN CAST(CAST(len(list_filter(w, x -> x IN ('the','and','of','to','in','is','that','for'))) AS DECIMAL(18,6)) / CAST(len(w) AS DECIMAL(18,6)) AS DECIMAL(18,6))
      |    ELSE NULL END AS DOUBLE) AS stopword_ratio
      |FROM base ORDER BY doc_id""".stripMargin))

  /** Token counting: BPE-ish regex + whitespace counts. */
  val textTokens: QueryDef = QueryDef(
    "text_tokens",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"),
        TextOps.tokenCount(col("text")).cast(LongType).as("n_tokens"),
        TextOps.wordCount(col("text")).cast(LongType).as("n_words"))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_tokens,
      |  CAST(CASE WHEN length($normalizeSql) = 0 THEN 0
      |       ELSE len(string_split($normalizeSql, ' ')) END AS BIGINT) AS n_words
      |FROM documents ORDER BY doc_id""".stripMargin))

  /** Document fingerprinting: exact md5 fingerprint (oracle-checked) +
    * rolling min-shingle-hash (Spark-native column). */
  val textFingerprint: QueryDef = QueryDef(
    "text_fingerprint",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id, md5($normalizeSql) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin))

  /** Overlapping token-window chunking ([[TextOps.chunkRows]], the RAG /
    * context-packing primitive): 32-token windows every 24 tokens, chunk
    * content verified through its md5 so the oracle pins the exact token
    * span of every chunk, not just the counts. */
  val textChunkOverlap: QueryDef = QueryDef(
    "text_chunk_overlap",
    (s, d) => TextOps.chunkRows(Tables.documents(s, d), "doc_id", "text",
        window = 32, stride = 24)
      .select(col("id").as("doc_id"), col("chunk_idx"), col("n_tokens"),
        md5(col("chunk")).as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx"),
    Some(s"""WITH t AS (SELECT doc_id, string_split($normalizeSql, ' ') AS w
      |  FROM documents),
      |s AS (SELECT doc_id, w, unnest(range(0, len(w), 24)) AS st FROM t)
      |SELECT doc_id, st // 24 AS chunk_idx,
      |  least(st + 32, len(w)) - st AS n_tokens,
      |  md5(array_to_string(w[st + 1:least(st + 32, len(w))], ' ')) AS chunk_hash
      |FROM s ORDER BY doc_id, chunk_idx""".stripMargin))

  /** Corpus-level duplicated-span statistics ([[TextOps.dupGramStats]],
    * the detection half of substring-level dedup — Lee et al. 2022): per
    * document, the share of its distinct 8-token grams occurring in at
    * least one other document. Runs on the dup-synthesized corpus so the
    * three duplicate classes are all exercised: exact copies (ratio 1),
    * one-token-appended near copies (ratio ~1 — every original gram
    * still duplicated), and untouched docs (ratio from incidental
    * word-soup overlap only). */
  val textDupGrams: QueryDef = QueryDef(
    "text_dup_grams",
    (s, d) => TextOps.dupGramStats(docsWithDups(s, d), "doc_id", "text", k = 8)
      .select(col("id").as("doc_id"), col("n_grams"), col("dup_grams"),
        col("dup_ratio"))
      .orderBy("doc_id"),
    Some(s"""WITH t AS ($docsWithDupsSql),
      |w AS (SELECT doc_id, string_split($normalizeSql, ' ') AS w FROM t),
      |g AS (SELECT DISTINCT doc_id,
      |        array_to_string(w[st:st + 7], ' ') AS gram
      |      FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6, 1)) AS st FROM w)),
      |d AS (SELECT gram, count(*) AS nd FROM g GROUP BY gram)
      |SELECT g.doc_id,
      |  count(*) AS n_grams,
      |  CAST(sum(CASE WHEN d.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams,
      |  CAST(CAST(sum(CASE WHEN d.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*) AS DOUBLE) AS dup_ratio
      |FROM g JOIN d USING (gram)
      |GROUP BY g.doc_id ORDER BY doc_id""".stripMargin))

  /** The APPLY side of `text_dup_grams`
    * ([[graft.ops.TextOps.removeDuplicatedSpans]], the fixed-k
    * approximation of Lee et al. 2022 exact-substring dedup): every word
    * covered by an 8-gram shared across >= 2 documents is struck, and the
    * cleaned documents reassemble from the survivors — duplicated runs of
    * any length >= 8 vanish while unique flanks survive. Gated on the
    * same synthesized-duplicate corpus as `text_dup_grams`; the oracle
    * replays gram starts, coverage union, and positional reassembly. */
  val textDedupSpans: QueryDef = QueryDef(
    "text_dedup_spans",
    (s, d) => TextOps.removeDuplicatedSpans(docsWithDups(s, d), "doc_id", "text",
        k = 8, minDocs = 2)
      .orderBy("doc_id"),
    Some(s"""WITH t AS ($docsWithDupsSql),
      |w AS (SELECT doc_id, string_split($normalizeSql, ' ') AS w FROM t),
      |g AS (SELECT doc_id, st, array_to_string(w[st:st + 7], ' ') AS gram
      |      FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6, 1)) AS st FROM w)),
      |f AS (SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g)
      |      GROUP BY gram HAVING count(*) >= 2),
      |occ AS (SELECT DISTINCT g.doc_id, g.st FROM g JOIN f USING (gram)),
      |cov AS (SELECT DISTINCT doc_id, st + i AS pos
      |        FROM occ, unnest(range(0, 8)) AS r(i)),
      |wr AS (SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS pos FROM w),
      |kept AS (SELECT wr.doc_id, wr.word, wr.pos FROM wr
      |         LEFT JOIN cov ON wr.doc_id = cov.doc_id AND wr.pos = cov.pos
      |         WHERE cov.pos IS NULL),
      |k2 AS (SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS txt,
      |              count(*) AS nk
      |       FROM kept GROUP BY doc_id)
      |SELECT w.doc_id, coalesce(k2.txt, '') AS cleaned_text,
      |  CAST(len(w.w) - coalesce(k2.nk, 0) AS BIGINT) AS n_removed_words
      |FROM w LEFT JOIN k2 USING (doc_id) ORDER BY w.doc_id""".stripMargin))

  /** EXACT-SUBSTRING dedup, KEEP-ONE flavor
    * ([[graft.ops.TextOps.removeRepeatedSpansKeepFirst]] — Lee et al.
    * 2022 ExactSubstr): every repeated run of >= 8 words keeps exactly
    * its first occurrence (smallest (doc_id, position)) and loses every
    * other copy; maximal struck spans are counted per document. The
    * missing dedup paradigm next to `text_dedup_spans` (which strikes
    * ALL copies): here the synthesized exact/near duplicates lose their
    * text while the originals keep theirs verbatim. The oracle replays
    * gram keys, the canonical min, coverage union, span runs, and
    * positional reassembly. */
  val dedupSubstrings: QueryDef = QueryDef(
    "dedup_substrings",
    (s, d) => TextOps.removeRepeatedSpansKeepFirst(docsWithDups(s, d),
        "doc_id", "text", k = 8)
      .orderBy("doc_id"),
    Some(s"""WITH t AS ($docsWithDupsSql),
      |w AS (SELECT doc_id, string_split($normalizeSql, ' ') AS w FROM t),
      |g AS (SELECT doc_id, CAST(st AS BIGINT) - 1 AS pos,
      |        array_to_string(w[CAST(st AS INTEGER):CAST(st AS INTEGER) + 7], ' ') AS gram,
      |        doc_id * 1048576 + CAST(st AS BIGINT) - 1 AS key
      |      FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6, 1)) AS st FROM w)),
      |dup AS (SELECT gram, min(key) AS canon FROM g
      |        GROUP BY gram HAVING count(*) >= 2),
      |cov AS (SELECT DISTINCT g.doc_id, CAST(g.pos + i AS BIGINT) AS cp
      |        FROM g JOIN dup ON g.gram = dup.gram AND g.key <> dup.canon,
      |             unnest(range(0, 8)) r(i)),
      |sp AS (SELECT doc_id, cp,
      |         CASE WHEN cp - lag(cp) OVER (PARTITION BY doc_id ORDER BY cp) = 1
      |              THEN 0 ELSE 1 END AS brk FROM cov),
      |ag AS (SELECT doc_id, count(*) AS nr, CAST(sum(brk) AS BIGINT) AS ns
      |       FROM sp GROUP BY doc_id),
      |wr AS (SELECT doc_id, unnest(w) AS word,
      |         CAST(generate_subscripts(w, 1) AS BIGINT) - 1 AS pos
      |       FROM w WHERE w <> ['']),
      |kept AS (SELECT wr.doc_id, wr.word, wr.pos FROM wr
      |         LEFT JOIN cov ON wr.doc_id = cov.doc_id AND wr.pos = cov.cp
      |         WHERE cov.cp IS NULL),
      |k2 AS (SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS txt
      |       FROM kept GROUP BY doc_id)
      |SELECT w.doc_id, coalesce(k2.txt, '') AS deduped_text,
      |  CAST(coalesce(ag.nr, 0) AS BIGINT) AS n_removed_words,
      |  CAST(coalesce(ag.ns, 0) AS BIGINT) AS n_spans
      |FROM w LEFT JOIN k2 USING (doc_id) LEFT JOIN ag USING (doc_id)
      |ORDER BY w.doc_id""".stripMargin))

  /** dedup_substr50: the PAPER-FIDELITY parameterization of keep-first
    * exact-substring dedup — Lee et al. 2022 strike runs of >= 50
    * tokens, not 8 (k=8 over-strikes: natural 8-word collisions get
    * deduped that the paper would keep). Same operator
    * ([[graft.ops.TextOps.removeRepeatedSpansKeepFirst]]), k=50, over a
    * corpus with SYNTHESIZED long repeats: every doc_id % 9 == 0 doc is
    * self-concatenated (a >= 50-word within-doc repeat for long docs)
    * and every doc_id % 10 == 0 doc gets a verbatim cross-doc copy —
    * both repeat shapes the paper targets. The oracle replays gram
    * keys, canonical min, coverage union and reassembly at k=50. */
  val dedupSubstr50: QueryDef = QueryDef(
    "dedup_substr50",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.select(col("doc_id"),
          when(col("doc_id") % 9 === 0, concat(col("text"), lit(" "), col("text")))
            .otherwise(col("text")).as("text"))
        .union(docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      TextOps.removeRepeatedSpansKeepFirst(corpus, "doc_id", "text", k = 50)
        .orderBy("doc_id")
    },
    Some(s"""WITH t AS (
      |  SELECT doc_id, CASE WHEN doc_id % 9 = 0 THEN text || ' ' || text
      |                      ELSE text END AS text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0),
      |w AS (SELECT doc_id, string_split($normalizeSql, ' ') AS w FROM t),
      |g AS (SELECT doc_id, CAST(st AS BIGINT) - 1 AS pos,
      |        array_to_string(w[CAST(st AS INTEGER):CAST(st AS INTEGER) + 49], ' ') AS gram,
      |        doc_id * 1048576 + CAST(st AS BIGINT) - 1 AS key
      |      FROM (SELECT doc_id, w, unnest(range(1, len(w) - 48, 1)) AS st FROM w)),
      |dup AS (SELECT gram, min(key) AS canon FROM g
      |        GROUP BY gram HAVING count(*) >= 2),
      |cov AS (SELECT DISTINCT g.doc_id, CAST(g.pos + i AS BIGINT) AS cp
      |        FROM g JOIN dup ON g.gram = dup.gram AND g.key <> dup.canon,
      |             unnest(range(0, 50)) r(i)),
      |sp AS (SELECT doc_id, cp,
      |         CASE WHEN cp - lag(cp) OVER (PARTITION BY doc_id ORDER BY cp) = 1
      |              THEN 0 ELSE 1 END AS brk FROM cov),
      |ag AS (SELECT doc_id, count(*) AS nr, CAST(sum(brk) AS BIGINT) AS ns
      |       FROM sp GROUP BY doc_id),
      |wr AS (SELECT doc_id, unnest(w) AS word,
      |         CAST(generate_subscripts(w, 1) AS BIGINT) - 1 AS pos
      |       FROM w WHERE w <> ['']),
      |kept AS (SELECT wr.doc_id, wr.word, wr.pos FROM wr
      |         LEFT JOIN cov ON wr.doc_id = cov.doc_id AND wr.pos = cov.cp
      |         WHERE cov.cp IS NULL),
      |k2 AS (SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS txt
      |       FROM kept GROUP BY doc_id)
      |SELECT w.doc_id, coalesce(k2.txt, '') AS deduped_text,
      |  CAST(coalesce(ag.nr, 0) AS BIGINT) AS n_removed_words,
      |  CAST(coalesce(ag.ns, 0) AS BIGINT) AS n_spans
      |FROM w LEFT JOIN k2 USING (doc_id) LEFT JOIN ag USING (doc_id)
      |ORDER BY w.doc_id""".stripMargin))

  /** Multimodal plumbing: binary payload + metadata -> per-partition
    * batched (stub) decode -> feature rows. The metadata surface
    * (modality routing, byte accounting, md5 content hash) is
    * oracle-checked; the fake feature vector itself is pinned in
    * PipelineSpec. */
  val mmDecode: QueryDef = QueryDef(
    "mm_decode_stub",
    (s, d) => Multimodal.decodeFeatures(Multimodal.fromDocuments(Tables.documents(s, d)))
      .select(col("media_id"), col("modality"), col("n_bytes"), col("content_hash"))
      .orderBy("media_id"),
    // payload is the utf-8 encoding of `text`, so md5(text) in DuckDB
    // hashes the same bytes; n_bytes is the utf-8 octet length
    Some("""SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS content_hash
      |FROM documents ORDER BY media_id""".stripMargin))

  /** End-to-end multimodal similarity: opaque binary payloads →
    * md5-content features ([[Multimodal.hashFeatures]] — the
    * encoder-swap boundary) → the SAME brute-force cosine top-k path
    * the float embeddings use. The whole composition is value-level
    * verifiable because the features regenerate from md5 in SQL; a real
    * deployment replaces only the feature stage with a learned encoder
    * and keeps the ranking machinery unchanged. */
  val mmSimilarity: QueryDef = QueryDef(
    "mm_similarity",
    (s, d) => Similarity.bruteForceTopK(
        Multimodal.hashFeatures(Multimodal.fromDocuments(Tables.documents(s, d)), 16),
        "media_id", "feature", col("media_id") % 50 === 0, k = 5)
      .orderBy("query_id", "rk"),
    Some("""WITH f AS (
      |  SELECT doc_id AS media_id,
      |    [CAST(CAST(concat('0x', substr(md5(text), 2 * d + 1, 2)) AS BIGINT) AS DOUBLE)
      |     for d in range(0, 16)] AS v
      |  FROM documents),
      |q AS (SELECT media_id AS query_id, v AS qv FROM f WHERE media_id % 50 = 0),
      |c AS (SELECT media_id AS cand_id, v AS cv FROM f),
      |scored AS (
      |  SELECT query_id, cand_id,
      |    list_dot_product(qv, cv) /
      |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
      |  FROM c, q WHERE query_id <> cand_id),
      |ranked AS (
      |  SELECT query_id, cand_id, cos,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS rk
      |  FROM scored)
      |SELECT query_id, rk, cand_id, round(cos, 4) AS cos_r
      |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin))

  /** Multimodal resize plumbing: payload replaced by the stub transform,
    * byte accounting + content hash oracle-checked (payload bytes are the
    * utf-8 text, so DuckDB's substr/md5 over the ASCII corpus hashes the
    * same bytes). */
  val mmResize: QueryDef = QueryDef(
    "mm_resize",
    (s, d) => Multimodal.resizeStub(
        Multimodal.fromDocuments(Tables.documents(s, d)), 64, 64)
      .select(col("media_id"), col("modality"),
        col("meta.n_bytes").as("n_bytes"), md5(col("payload")).as("content_hash"))
      .orderBy("media_id"),
    Some("""SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
      |  CAST(length(substr(text, 1, greatest(least(length(text), 64), 1))) AS BIGINT) AS n_bytes,
      |  md5(substr(text, 1, greatest(least(length(text), 64), 1))) AS content_hash
      |FROM documents ORDER BY media_id""".stripMargin))

  /** REAL image decode (JDK `javax.imageio`, zero new dependencies):
    * the corpus is genuine PNG (even ids) / BMP (odd ids) container
    * bytes whose pixels follow a closed-form formula of (id, x, y), so
    * the codec-less oracle recomputes the decoded width/height and the
    * exact per-image pixel sum — a wrong decode breaks the hash match.
    * Scale shape: per-partition batched decode, payloads never shuffle
    * (same boundary as the stub path). */
  val mmDecodeImage: QueryDef = QueryDef(
    "mm_decode_image",
    (s, d) => Multimodal.decodeImages(
        Multimodal.imageCorpus(Tables.documents(s, d)))
      .select(col("media_id"), col("fmt"), col("width"), col("height"),
        col("pixel_sum"))
      .orderBy("media_id"),
    Some("""WITH dims AS (
      |  SELECT doc_id AS id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h FROM documents),
      |px AS (
      |  SELECT id, w, h,
      |    sum((id*31 + x*7 + y*13) % 256 + (id*17 + x*11 + y*3) % 256
      |      + (id*13 + x*5 + y*19) % 256) AS ps
      |  FROM dims, range(0, 16) xs(x), range(0, 13) ys(y)
      |  WHERE x < w AND y < h
      |  GROUP BY id, w, h)
      |SELECT id AS media_id,
      |  CASE WHEN id % 2 = 0 THEN 'png' ELSE 'bmp' END AS fmt,
      |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  CAST(ps AS BIGINT) AS pixel_sum
      |FROM px ORDER BY media_id""".stripMargin))

  /** REAL image resize: decode the PNG/BMP container, nearest-neighbor
    * resample to 7x9 (`sx = x·srcW div 7` — exact integer sampling, so
    * the oracle replays it), re-encode PNG. The reported pixel sums are
    * of the RESIZED raster; re-encoded payload round-trip is pinned in
    * PipelineSpec (PNG is lossless). */
  val mmResizeImage: QueryDef = QueryDef(
    "mm_resize_image",
    (s, d) => Multimodal.resizeImages(
        Multimodal.imageCorpus(Tables.documents(s, d)), w = 7, h = 9)
      .select(col("media_id"), col("width"), col("height"), col("pixel_sum"))
      .orderBy("media_id"),
    Some("""WITH dims AS (
      |  SELECT doc_id AS id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h FROM documents),
      |px AS (
      |  SELECT id,
      |    sum((id*31 + ((x*w)//7)*7 + ((y*h)//9)*13) % 256
      |      + (id*17 + ((x*w)//7)*11 + ((y*h)//9)*3) % 256
      |      + (id*13 + ((x*w)//7)*5 + ((y*h)//9)*19) % 256) AS ps
      |  FROM dims, range(0, 7) xs(x), range(0, 9) ys(y)
      |  GROUP BY id)
      |SELECT id AS media_id, CAST(7 AS BIGINT) AS width, CAST(9 AS BIGINT) AS height,
      |  CAST(ps AS BIGINT) AS pixel_sum
      |FROM px ORDER BY media_id""".stripMargin))

  /** Multimodal frame-sampling plumbing: one row per sampled frame with
    * frame indexing, per-frame byte accounting, and frame content hash —
    * all oracle-checked over the same byte slices. */
  val mmFrameSample: QueryDef = QueryDef(
    "mm_frame_sample",
    (s, d) => Multimodal.frameSampleStub(
        Multimodal.fromDocuments(Tables.documents(s, d)), nFrames = 4)
      .select(col("media_id"), col("frame_no").cast(LongType).as("frame_no"),
        col("n_bytes"), md5(col("payload")).as("frame_hash"))
      .orderBy("media_id", "frame_no"),
    Some("""SELECT doc_id AS media_id, f AS frame_no,
      |  CAST(length(substr(text, 1 + CAST(f AS INTEGER) * 16, 16)) AS BIGINT) AS n_bytes,
      |  md5(substr(text, 1 + CAST(f AS INTEGER) * 16, 16)) AS frame_hash
      |FROM documents, range(0, 4) r(f)
      |WHERE doc_id % 3 = 2 ORDER BY media_id, frame_no""".stripMargin))

  /** REAL video frame sampling: the corpus is genuine uncompressed
    * RIFF/AVI container bytes (raw-DIB '00db' frames — no codec needed,
    * which is what makes honest video I/O possible in a codec-less
    * JVM); [[Multimodal.sampleVideoFrames]] parses the chunk tree and
    * index-seeks to every 2nd frame, reading ONLY those rasters. Frame
    * pixels follow a closed form of (id, frame, x, y), so the oracle
    * recomputes each sampled frame's exact pixel sum — a wrong header
    * parse, wrong idx1 offset, or wrong bottom-up row order all break
    * the hash match. */
  val mmFrameSampleAvi: QueryDef = QueryDef(
    "mm_frame_sample_avi",
    (s, d) => Multimodal.sampleVideoFrames(
        Multimodal.videoCorpus(Tables.documents(s, d)), everyNth = 2)
      .orderBy("media_id", "frame_no"),
    Some("""WITH dims AS (
      |  SELECT doc_id AS id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h,
      |    2 + doc_id % 4 AS n FROM documents),
      |fr AS (
      |  SELECT id, w, h, f FROM dims, range(0, 6) fs(f)
      |  WHERE f < n AND f % 2 = 0),
      |px AS (
      |  SELECT id, f, w, h,
      |    sum((id*31 + f*41 + x*7 + y*13) % 256
      |      + (id*17 + f*29 + x*11 + y*3) % 256
      |      + (id*13 + f*23 + x*5 + y*19) % 256) AS ps
      |  FROM fr, range(0, 16) xs(x), range(0, 13) ys(y)
      |  WHERE x < w AND y < h
      |  GROUP BY id, f, w, h)
      |SELECT id AS media_id, CAST(f AS BIGINT) AS frame_no,
      |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  CAST(ps AS BIGINT) AS pixel_sum
      |FROM px ORDER BY media_id, frame_no""".stripMargin))

  /** Perceptual-hash image dedup ([[graft.ops.Multimodal.imageAHashes]]):
    * the corpus plus its cross-format re-encodes (every 10th image as the
    * OTHER lossless container under id+100000 — different payload bytes,
    * identical decoded raster) hashed with the 8x8 average hash, then
    * grouped by hash. Every re-encode must land in its original's group —
    * the duplicate class byte dedup (`dedup_exact` on payload bytes)
    * cannot see, caught here by a 64-bit structural signature instead of
    * a full pixel-feature ANN pass. Output: hash groups of >= 2 members
    * as bounded stats (hash, n, min/max id) — robust to structural-hash
    * collisions, which the closed-form oracle reproduces exactly anyway.
    * Scale: decode+hash is the one codec pass; the groupBy shuffles
    * 72-byte hash rows, never payloads (PlanAuditSpec pins the payload
    * column off every Exchange). */
  /** DCT perceptual-hash dedup ([[Multimodal.imagePHashes]]) — the
    * pHash twin of [[mmAHashDedup]] on the same cross-format duplicate
    * corpus: the 15-bit sign pattern of the low-frequency integer DCT
    * block groups re-encodes with their originals where byte dedup is
    * blind. The cosine basis is rounded to 1/1024 integer units and the
    * SAME 32 constants are inlined into the oracle, so the whole
    * transform replays exactly — no float DCT anywhere. Same scale
    * shape as aHash: one codec pass, hash-only shuffle. */
  val mmPHashDedup: QueryDef = {
    val coefValues = (for (u <- 0 until 4; x <- 0 until 8)
      yield s"($u, $x, ${graft.ops.Multimodal.dctQ(u)(x)})").mkString(", ")
    QueryDef(
      "mm_phash_dedup",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val media = Multimodal.imageCorpus(docs)
          .unionByName(Multimodal.imageCorpusCrossDup(docs, every = 10,
            idOffset = 100000))
        Multimodal.imagePHashes(media)
          .groupBy(col("phash"))
          .agg(count(lit(1)).as("n_members"),
            min(col("media_id")).as("min_id"), max(col("media_id")).as("max_id"))
          .filter(col("n_members") >= 2)
          .orderBy("phash")
      },
      Some(s"""WITH ids AS (
        |  SELECT doc_id AS id, doc_id AS sid FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, doc_id FROM documents WHERE doc_id % 10 = 0),
        |dims AS (SELECT id, sid, 8 + sid % 8 AS w, 8 + sid % 5 AS h FROM ids),
        |cells AS (
        |  SELECT id, cx, cy,
        |      (sid*31 + ((cx*w)//8)*7  + ((cy*h)//8)*13) % 256
        |    + (sid*17 + ((cx*w)//8)*11 + ((cy*h)//8)*3)  % 256
        |    + (sid*13 + ((cx*w)//8)*5  + ((cy*h)//8)*19) % 256 AS gray
        |  FROM dims, range(0, 8) xs(cx), range(0, 8) ys(cy)),
        |coef AS (SELECT * FROM (VALUES $coefValues) t(u, k, c)),
        |d AS (
        |  SELECT id, cu.u AS u, cv.u AS v,
        |    CAST(sum(gray * cu.c * cv.c) AS BIGINT) AS dct
        |  FROM cells JOIN coef cu ON cu.k = cx JOIN coef cv ON cv.k = cy
        |  GROUP BY id, cu.u, cv.u),
        |hb AS (
        |  SELECT id, CAST(sum(CASE WHEN v*4 + u > 0 AND dct > 0
        |    THEN CAST(1 AS BIGINT) << CAST(v*4 + u - 1 AS INT)
        |    ELSE 0 END) AS BIGINT) AS phash
        |  FROM d GROUP BY id)
        |SELECT phash, count(*) AS n_members,
        |  min(id) AS min_id, max(id) AS max_id
        |FROM hb GROUP BY phash HAVING count(*) >= 2
        |ORDER BY phash""".stripMargin))
  }

  val mmAHashDedup: QueryDef = QueryDef(
    "mm_ahash_dedup",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val media = Multimodal.imageCorpus(docs)
        .unionByName(Multimodal.imageCorpusCrossDup(docs, every = 10,
          idOffset = 100000))
      Multimodal.imageAHashes(media)
        .groupBy(col("ahash"))
        .agg(count(lit(1)).as("n_members"),
          min(col("media_id")).as("min_id"), max(col("media_id")).as("max_id"))
        .filter(col("n_members") >= 2)
        .orderBy("ahash")
    },
    Some("""WITH ids AS (
      |  SELECT doc_id AS id, doc_id AS sid FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, doc_id FROM documents WHERE doc_id % 10 = 0),
      |dims AS (SELECT id, sid, 8 + sid % 8 AS w, 8 + sid % 5 AS h FROM ids),
      |cells AS (
      |  SELECT id, cy*8 + cx AS i,
      |      (sid*31 + ((cx*w)//8)*7  + ((cy*h)//8)*13) % 256
      |    + (sid*17 + ((cx*w)//8)*11 + ((cy*h)//8)*3)  % 256
      |    + (sid*13 + ((cx*w)//8)*5  + ((cy*h)//8)*19) % 256 AS gray
      |  FROM dims, range(0, 8) xs(cx), range(0, 8) ys(cy)),
      |m AS (SELECT id, sum(gray) // 64 AS mean FROM cells GROUP BY id),
      |h AS (
      |  SELECT cells.id,
      |    string_agg(CASE WHEN gray > mean THEN '1' ELSE '0' END, '' ORDER BY i)
      |      AS ahash
      |  FROM cells JOIN m ON cells.id = m.id GROUP BY cells.id)
      |SELECT ahash, count(*) AS n_members,
      |  min(id) AS min_id, max(id) AS max_id
      |FROM h GROUP BY ahash HAVING count(*) >= 2
      |ORDER BY ahash""".stripMargin))

  /** The multimodal→ANN composition with EVERY stage real: genuine
    * PNG/BMP container bytes → JDK ImageIO decode → pixel-statistics
    * feature vector ([w, h, integer channel means] — small exact
    * integers, so the float cosine is bit-deterministic) → the standard
    * brute-force cosine top-k. The closed-form synthetic pixels let the
    * codec-less oracle regenerate the features and replay the ranking
    * value-for-value — the end-to-end story [[mmSimilarity]]'s md5
    * stand-in features only approximated. */
  val mmSimilarityPixels: QueryDef = QueryDef(
    "mm_similarity_pixels",
    (s, d) => Similarity.bruteForceTopK(
        Multimodal.imagePixelFeatures(
          Multimodal.imageCorpus(Tables.documents(s, d))),
        "media_id", "feature", col("media_id") % 50 === 0, k = 5)
      .orderBy("query_id", "rk"),
    Some("""WITH dims AS (
      |  SELECT doc_id AS id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h FROM documents),
      |px AS (
      |  SELECT id, w, h,
      |    sum((id*31 + x*7 + y*13) % 256) AS rs,
      |    sum((id*17 + x*11 + y*3) % 256) AS gs,
      |    sum((id*13 + x*5 + y*19) % 256) AS bs
      |  FROM dims, range(0, 16) xs(x), range(0, 13) ys(y)
      |  WHERE x < w AND y < h
      |  GROUP BY id, w, h),
      |f AS (
      |  SELECT id, [CAST(w AS DOUBLE), CAST(h AS DOUBLE),
      |    CAST(rs // (w*h) AS DOUBLE), CAST(gs // (w*h) AS DOUBLE),
      |    CAST(bs // (w*h) AS DOUBLE)] AS v
      |  FROM px),
      |q AS (SELECT id AS query_id, v AS qv FROM f WHERE id % 50 = 0),
      |c AS (SELECT id AS cand_id, v AS cv FROM f),
      |scored AS (
      |  SELECT query_id, cand_id,
      |    list_dot_product(qv, cv) /
      |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
      |  FROM c, q WHERE query_id <> cand_id),
      |ranked AS (
      |  SELECT query_id, cand_id, cos,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS rk
      |  FROM scored)
      |SELECT query_id, rk, cand_id, round(cos, 4) AS cos_r
      |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin))

  /** PERMISSIVE decode over a DIRTY corpus — the 100 TB reality gate:
    * every 10th payload is truncated to 10 bytes (an undecodable
    * container prefix), and [[Multimodal.decodeImagesSafe]] must flag
    * exactly those rows `decode_ok = false` with null stats while
    * decoding the rest bit-exactly — one corrupt file never kills the
    * stage. The oracle knows which ids were corrupted and replays the
    * closed-form stats for the healthy ones. */
  val mmDecodeImageSafe: QueryDef = QueryDef(
    "mm_decode_image_safe",
    (s, d) => Multimodal.decodeImagesSafe(
        Multimodal.imageCorpus(Tables.documents(s, d))
          .withColumn("payload",
            when(col("media_id") % 10 === 0, expr("substring(payload, 1, 10)"))
              .otherwise(col("payload"))))
      .orderBy("media_id"),
    Some("""WITH dims AS (
      |  SELECT doc_id AS id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h FROM documents),
      |px AS (
      |  SELECT id, w, h,
      |    sum((id*31 + x*7 + y*13) % 256 + (id*17 + x*11 + y*3) % 256
      |      + (id*13 + x*5 + y*19) % 256) AS ps
      |  FROM dims, range(0, 16) xs(x), range(0, 13) ys(y)
      |  WHERE x < w AND y < h
      |  GROUP BY id, w, h)
      |SELECT id AS media_id,
      |  CASE WHEN id % 2 = 0 THEN 'png' ELSE 'bmp' END AS fmt,
      |  id % 10 <> 0 AS decode_ok,
      |  CASE WHEN id % 10 <> 0 THEN CAST(w AS BIGINT) END AS width,
      |  CASE WHEN id % 10 <> 0 THEN CAST(h AS BIGINT) END AS height,
      |  CASE WHEN id % 10 <> 0 THEN CAST(ps AS BIGINT) END AS pixel_sum
      |FROM px ORDER BY media_id""".stripMargin))

  /** JPEG decode through the same ImageIO boundary — the compressed
    * codec the JDK DOES ship. Lossy decode is not bit-exact across
    * libraries, so the gate is the [[Multimodal.decodeImagesSafe]]
    * decode_ok/dims contract (dims survive a lossy round-trip exactly;
    * pixel sums are codec-dependent and projected out): every 10th
    * payload is truncated to 10 bytes and must flag decode_ok = false;
    * healthy rows must report the closed-form raster dims. The JDK
    * round-trip itself (dims exact + pixel sum within lossy tolerance)
    * is pinned in MultimodalSpec. */
  val mmDecodeJpeg: QueryDef = QueryDef(
    "mm_decode_jpeg",
    (s, d) => Multimodal.decodeImagesSafe(
        Multimodal.jpegCorpus(Tables.documents(s, d))
          .withColumn("payload",
            when(col("media_id") % 10 === 0, expr("substring(payload, 1, 10)"))
              .otherwise(col("payload"))))
      .select(col("media_id"), col("fmt"), col("decode_ok"),
        col("width"), col("height"))
      .orderBy("media_id"),
    Some("""SELECT doc_id AS media_id, 'jpg' AS fmt,
      |  doc_id % 10 <> 0 AS decode_ok,
      |  CASE WHEN doc_id % 10 <> 0 THEN CAST(8 + doc_id % 8 AS BIGINT) END AS width,
      |  CASE WHEN doc_id % 10 <> 0 THEN CAST(8 + doc_id % 5 AS BIGINT) END AS height
      |FROM documents ORDER BY media_id""".stripMargin))

  /** GIF decode through the same ImageIO boundary — a compressed format
    * the JDK genuinely ships, and unlike JPEG it is LOSSLESS here: the
    * corpus is indexed-color ([[Multimodal.synthIndexedImage]] — GIF
    * stores a palette + indices verbatim), so the gate carries exact
    * decoded pixel sums, not just the dims contract. Palette entry i is
    * (i, 7i mod 256, 13i mod 256) and pixel (x,y) holds index
    * (id·31 + x·7 + y·13) mod 256, so the codec-less oracle recomputes
    * every decoded value. */
  val mmDecodeGif: QueryDef = QueryDef(
    "mm_decode_gif",
    (s, d) => Multimodal.decodeImages(
        Multimodal.gifCorpus(Tables.documents(s, d)))
      .select(col("media_id"), col("fmt"), col("width"), col("height"),
        col("pixel_sum"))
      .orderBy("media_id"),
    Some("""WITH dims AS (
      |  SELECT doc_id AS id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h FROM documents),
      |px AS (
      |  SELECT id, w, h,
      |    sum((id*31 + x*7 + y*13) % 256
      |      + ((id*31 + x*7 + y*13) % 256 * 7) % 256
      |      + ((id*31 + x*7 + y*13) % 256 * 13) % 256) AS ps
      |  FROM dims, range(0, 16) xs(x), range(0, 13) ys(y)
      |  WHERE x < w AND y < h
      |  GROUP BY id, w, h)
      |SELECT id AS media_id, 'gif' AS fmt,
      |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  CAST(ps AS BIGINT) AS pixel_sum
      |FROM px ORDER BY media_id""".stripMargin))

  /** COMPRESSED video frames, genuinely decoded: the corpus is MJPEG
    * AVI (per-frame JPEGs in '00dc' chunks — the one compressed video
    * codec a bare JVM can really decode), every 10th payload truncated
    * to 10 bytes. [[Multimodal.sampleVideoFramesMjpegSafe]] index-seeks
    * to every 2nd frame and runs each chunk through the JDK JPEG codec;
    * corrupt containers flag `decode_ok = false`, healthy frames report
    * the DECODED raster dims (exact under lossy round trips — the
    * `mm_decode_jpeg` contract, now for video). */
  val mmFrameSampleMjpeg: QueryDef = QueryDef(
    "mm_frame_sample_mjpeg",
    (s, d) => Multimodal.sampleVideoFramesMjpegSafe(
        Multimodal.videoCorpusMjpeg(Tables.documents(s, d))
          .withColumn("payload",
            when(col("media_id") % 10 === 0, expr("substring(payload, 1, 10)"))
              .otherwise(col("payload"))),
        everyNth = 2)
      .orderBy("media_id", "frame_no"),
    Some("""WITH dims AS (
      |  SELECT doc_id AS id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h,
      |    2 + doc_id % 4 AS n FROM documents),
      |fr AS (
      |  SELECT id, w, h, f FROM dims, range(0, 6) fs(f)
      |  WHERE id % 10 <> 0 AND f < n AND f % 2 = 0),
      |bad AS (
      |  SELECT id FROM dims WHERE id % 10 = 0)
      |SELECT id AS media_id, TRUE AS decode_ok, CAST(f AS BIGINT) AS frame_no,
      |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height
      |FROM fr
      |UNION ALL
      |SELECT id AS media_id, FALSE AS decode_ok, CAST(NULL AS BIGINT) AS frame_no,
      |  CAST(NULL AS BIGINT) AS width, CAST(NULL AS BIGINT) AS height
      |FROM bad
      |ORDER BY media_id, frame_no""".stripMargin))

  /** COMPRESSED multi-frame container, decoded EXACTLY: animated GIF
    * through the JDK codec's sequence API. Indexed-color frames make
    * the compression lossless, so unlike `mm_frame_sample_mjpeg`
    * (dims-only, JPEG is lossy) every sampled frame gates on its exact
    * decoded pixel sum — frame f's palette index at (x,y) is
    * (id·31 + f·41 + x·7 + y·13) mod 256 under the
    * (i, 7i mod 256, 13i mod 256) palette, closed-form for the
    * codec-less oracle. */
  /** SHOT-BOUNDARY detection over genuinely COMPRESSED video
    * ([[Multimodal.detectSceneCuts]] on the scene-structured animated
    * GIF corpus): frames decode through the real JDK codec, consecutive
    * frames compare by the exact integer sum of absolute gray deltas,
    * and a cut fires on the integer test diff_sum > τ·npixels. Scenes
    * are length-3 by construction (single-pixel jitter inside, a
    * whole-raster 97-step palette jump at boundaries — measured
    * separation ≥ 91.4 vs ≤ 10.4 per pixel, 4× margin around τ = 40),
    * so cuts land exactly at f ∈ {3, 6} — but the gate does not trust
    * that: the oracle recomputes every per-frame diff closed-form from
    * the frame formula and applies the same threshold, pixel for pixel.
    * This is the curation primitive that splits clips before frame
    * sampling / captioning. */
  val mmSceneDetect: QueryDef = QueryDef(
    "mm_scene_detect",
    (s, d) => Multimodal.detectSceneCuts(
        Multimodal.gifSceneCorpus(Tables.documents(s, d)), tau = 40L)
      .orderBy("media_id", "frame_no"),
    Some("""WITH dims AS (
      |  SELECT doc_id AS id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h,
      |    6 + doc_id % 4 AS n FROM documents),
      |fr AS (SELECT id, w, h, f FROM dims, range(1, 10) fs(f) WHERE f < n),
      |px AS (
      |  SELECT id, f, w, h, x, y,
      |    (id*31 + (f//3)*97 + x*7 + y*13
      |      + CASE WHEN x = 0 AND y = 0 THEN f ELSE 0 END) % 256 AS ic,
      |    (id*31 + ((f-1)//3)*97 + x*7 + y*13
      |      + CASE WHEN x = 0 AND y = 0 THEN f - 1 ELSE 0 END) % 256 AS ip
      |  FROM fr, range(0, 16) xs(x), range(0, 13) ys(y)
      |  WHERE x < w AND y < h),
      |d AS (
      |  SELECT id, f, w, h,
      |    sum(abs((ic + (ic*7) % 256 + (ic*13) % 256)
      |          - (ip + (ip*7) % 256 + (ip*13) % 256))) AS ds
      |  FROM px GROUP BY id, f, w, h)
      |SELECT id AS media_id, CAST(f AS BIGINT) AS frame_no,
      |  CAST(ds AS BIGINT) AS diff_sum, ds > 40 * w * h AS is_cut
      |FROM d ORDER BY media_id, frame_no""".stripMargin))

  val mmFrameSampleGif: QueryDef = QueryDef(
    "mm_frame_sample_gif",
    (s, d) => Multimodal.sampleGifFrames(
        Multimodal.gifVideoCorpus(Tables.documents(s, d)), everyNth = 2)
      .orderBy("media_id", "frame_no"),
    Some("""WITH dims AS (
      |  SELECT doc_id AS id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h,
      |    2 + doc_id % 4 AS n FROM documents),
      |fr AS (
      |  SELECT id, w, h, f FROM dims, range(0, 6) fs(f)
      |  WHERE f < n AND f % 2 = 0),
      |px AS (
      |  SELECT id, f, w, h,
      |    sum((id*31 + f*41 + x*7 + y*13) % 256
      |      + ((id*31 + f*41 + x*7 + y*13) % 256 * 7) % 256
      |      + ((id*31 + f*41 + x*7 + y*13) % 256 * 13) % 256) AS ps
      |  FROM fr, range(0, 16) xs(x), range(0, 13) ys(y)
      |  WHERE x < w AND y < h
      |  GROUP BY id, f, w, h)
      |SELECT id AS media_id, CAST(f AS BIGINT) AS frame_no,
      |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  CAST(ps AS BIGINT) AS pixel_sum
      |FROM px ORDER BY media_id, frame_no""".stripMargin))

  /** REAL audio decode (JDK `javax.sound.sampled`, zero new
    * dependencies): the corpus is genuine PCM WAV container bytes whose
    * int16 samples follow a closed form of (id, i), so the codec-less
    * oracle recomputes the decoded sample count and exact amplitude
    * statistics — wrong header parse or byte order breaks the match.
    * With this, all three modalities run genuine container I/O (PNG/BMP
    * images, AVI video, WAV audio); only COMPRESSED codecs stay out. */
  val mmDecodeWav: QueryDef = QueryDef(
    "mm_decode_wav",
    (s, d) => Multimodal.decodeAudio(
        Multimodal.audioCorpus(Tables.documents(s, d)))
      .orderBy("media_id"),
    Some("""WITH d AS (
      |  SELECT doc_id AS id, 64 + doc_id % 64 AS n FROM documents),
      |s AS (
      |  SELECT id, n, abs((id*31 + i*17) % 2003 - 1001) AS a
      |  FROM d, range(0, 128) rs(i) WHERE i < n)
      |SELECT id AS media_id, CAST(8000 AS BIGINT) AS sample_rate,
      |  CAST(n AS BIGINT) AS n_samples,
      |  CAST(sum(a) AS BIGINT) AS amp_sum, CAST(max(a) AS BIGINT) AS peak
      |FROM s GROUP BY id, n ORDER BY media_id""".stripMargin))

  /** Audio loudness / clipping QC ([[Multimodal.audioLoudness]] over the
    * really-encoded WAV corpus): peak, near-full-scale sample count and
    * exact integer energy per clip, RMS derived at the boundary — the
    * gain-staging audit before training on found audio. The oracle
    * recomputes everything from the synthesis formula through the REAL
    * decode path (wrong byte order breaks energy immediately). */
  val mmAudioLoudness: QueryDef = QueryDef(
    "mm_audio_loudness",
    (s, d) => Multimodal.audioLoudness(
        Multimodal.audioCorpus(Tables.documents(s, d)), clipThreshold = 950L)
      .withColumn("rms_milli",
        round(sqrt(col("energy").cast("double") /
          col("n_samples").cast("double")) * 1000).cast("long"))
      .orderBy("media_id"),
    Some("""WITH d AS (
      |  SELECT doc_id AS id, 64 + doc_id % 64 AS n FROM documents),
      |s AS (
      |  SELECT id, n, abs((id*31 + i*17) % 2003 - 1001) AS a
      |  FROM d, range(0, 128) rs(i) WHERE i < n)
      |SELECT id AS media_id, CAST(n AS BIGINT) AS n_samples,
      |  CAST(max(a) AS BIGINT) AS peak,
      |  CAST(sum(CASE WHEN a >= 950 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
      |  CAST(sum(a * a) AS BIGINT) AS energy,
      |  CAST(round(sqrt(CAST(sum(a * a) AS DOUBLE) / CAST(n AS DOUBLE)) * 1000) AS BIGINT) AS rms_milli
      |FROM s GROUP BY id, n ORDER BY media_id""".stripMargin))

  /** LEAKAGE-SAFE train/test split: folds are assigned by CONTENT
    * FINGERPRINT (md5 of the normalized text), not by document id, so
    * every exact-duplicate group lands wholly on one side of the
    * boundary — the split discipline deduplicated-training-data work
    * (Lee et al. 2022) demands: an id-hash split scatters a duplicate
    * group's members across train AND test, leaking test content into
    * training verbatim. The gate CONTRASTS the two: per split,
    * doc/group counts plus the corpus-wide count of fingerprint groups
    * spanning ≥2 folds under the fingerprint split (provably 0) and
    * under the naive id split (>0 on the dup-synthesized corpus — the
    * leak made visible). Scale: two map-combined aggregations on the
    * 16-byte fingerprint; content never shuffles. */
  val sampleSplitLeakageSafe: QueryDef = QueryDef(
    "sample_split_leakage_safe",
    (s, d) => {
      val base = docsWithDups(s, d)
        .withColumn("fp", md5(TextOps.normalize(col("text"))))
        .withColumn("split_fp",
          when(conv(substring(md5(col("fp")), 1, 15), 16, 10).cast("long")
            % 100 < 80, lit("train")).otherwise(lit("test")))
        .withColumn("split_id",
          when(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("long") % 100 < 80, lit("train")).otherwise(lit("test")))
      val perSplit = base.groupBy(col("split_fp").as("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_groups"))
      val crossing = base.groupBy(col("fp"))
        .agg(countDistinct(col("split_fp")).as("k_fp"),
          countDistinct(col("split_id")).as("k_id"))
        .agg(sum(when(col("k_fp") > 1, 1L).otherwise(0L)).as("fp_crossing_groups"),
          sum(when(col("k_id") > 1, 1L).otherwise(0L)).as("id_crossing_groups"))
      perSplit.crossJoin(broadcast(crossing)).orderBy("split")
    },
    Some(s"""WITH t AS ($docsWithDupsSql),
      |b AS (
      |  SELECT doc_id, md5($normalizeSql) AS fp FROM t),
      |sp AS (
      |  SELECT doc_id, fp,
      |    CASE WHEN CAST(concat('0x', substr(md5(fp), 1, 15)) AS BIGINT) % 100 < 80
      |         THEN 'train' ELSE 'test' END AS split_fp,
      |    CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80
      |         THEN 'train' ELSE 'test' END AS split_id
      |  FROM b),
      |per AS (
      |  SELECT split_fp AS split, count(*) AS n_docs,
      |    count(DISTINCT fp) AS n_groups
      |  FROM sp GROUP BY split_fp),
      |cr AS (
      |  SELECT
      |    CAST(sum(CASE WHEN k_fp > 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp_crossing_groups,
      |    CAST(sum(CASE WHEN k_id > 1 THEN 1 ELSE 0 END) AS BIGINT) AS id_crossing_groups
      |  FROM (SELECT fp, count(DISTINCT split_fp) AS k_fp,
      |          count(DISTINCT split_id) AS k_id
      |        FROM sp GROUP BY fp))
      |SELECT split, n_docs, n_groups, fp_crossing_groups, id_crossing_groups
      |FROM per, cr ORDER BY split""".stripMargin))

  /** Voice-activity-style audio frame gating
    * ([[graft.ops.Multimodal.audioFrameActivity]]): every synthesized
    * WAV clip is REALLY decoded (AudioSystem), cut into 16-sample
    * frames, and gated on exact integer frame energy Σsample² ≥ 5e6 —
    * the silent-clip drop / speech-onset locate pass a speech corpus
    * runs. The oracle regenerates the closed-form sample stream and
    * replays framing, energies, the gate, the first-active index and
    * the basis-point ratio; a wrong header parse, byte order or frame
    * hop breaks the numbers. Payloads never shuffle (per-partition
    * decode). */
  val mmAudioVad: QueryDef = QueryDef(
    "mm_audio_vad",
    (s, d) => Multimodal.audioFrameActivity(
        Multimodal.audioCorpus(Tables.documents(s, d)),
        frameLen = 16, energyThreshold = 5000000L)
      .orderBy("media_id"),
    Some("""WITH d AS (
      |  SELECT doc_id AS id, 64 + doc_id % 64 AS n FROM documents),
      |sm AS (
      |  SELECT id, i, ((id*31 + i*17) % 2003) - 1001 AS s
      |  FROM d, range(0, 128) rs(i) WHERE i < (n // 16) * 16),
      |fr AS (SELECT id, i // 16 AS f, sum(s*s) AS e FROM sm GROUP BY id, i // 16),
      |ag AS (
      |  SELECT id, count(*) AS n_frames,
      |    CAST(sum(CASE WHEN e >= 5000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
      |    coalesce(min(CASE WHEN e >= 5000000 THEN f END), -1) AS first_active
      |  FROM fr GROUP BY id)
      |SELECT id AS media_id, n_frames, n_active,
      |  CAST(first_active AS BIGINT) AS first_active,
      |  n_active * 10000 // n_frames AS active_bp
      |FROM ag ORDER BY media_id""".stripMargin))

  /** Vocabulary top-k: explode word tokens, count, rank — the
    * tokenize/explode/aggregate shape of corpus statistics. */
  val textWordcount: QueryDef = QueryDef(
    "text_wordcount",
    (s, d) => {
      val words = Tables.documents(s, d)
        .select(explode(TextOps.words(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
      words.groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word").asc)
        .limit(20)
    },
    Some(s"""WITH w AS (
      |  SELECT unnest(string_split($normalizeSql, ' ')) AS word FROM documents)
      |SELECT word, count(*) AS n FROM w WHERE length(word) > 0
      |GROUP BY word ORDER BY n DESC, word ASC LIMIT 20""".stripMargin))

  /** Word BURSTINESS (Church & Gale dispersion): variance-to-mean ratio
    * of per-document occurrence counts — bursty words (VMR ≫ 1)
    * concentrate in few documents (topical/named entities), uniform
    * words (VMR ≈ 1, Poisson) spread evenly; the lexical statistic
    * keyword extraction and stopword induction both read. Exact integer
    * algebra over the zero-inclusive moments: with S = Σx, Q = Σx² over
    * the word's per-doc counts and N the corpus size (zeros contribute
    * nothing to S/Q but inflate N), VMR·10⁶ = 10⁶·(N·Q − S²) div (N·S).
    * One (doc, word) count aggregation, one per-word rollup, the corpus
    * doc count rides as a one-row broadcast. Top 20 burstiest above a
    * support floor, total-ordered. */
  val textBurstiness: QueryDef = QueryDef(
    "text_burstiness",
    (s, d) => {
      val counts = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextOps.words(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("x"))
      val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      counts.groupBy(col("word"))
        .agg(sum(col("x")).as("s"), sum(col("x") * col("x")).as("q"),
          count(lit(1)).as("n_docs_with"))
        .filter(col("s") >= 20)
        .crossJoin(broadcast(nDocs))
        .select(col("word"), col("s").as("n_occ"), col("n_docs_with"),
          expr("(1000000 * (n_docs * q - s * s)) div (n_docs * s)")
            .as("vmr_ppm"))
        .orderBy(col("vmr_ppm").desc, col("word").asc)
        .limit(20)
    },
    Some(s"""WITH c AS (
      |  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS x FROM (
      |    SELECT doc_id, unnest(string_split($normalizeSql, ' ')) AS word
      |    FROM documents) t WHERE length(word) > 0 GROUP BY doc_id, word),
      |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      |w AS (
      |  SELECT word, CAST(sum(x) AS BIGINT) AS s,
      |    CAST(sum(x * x) AS BIGINT) AS q,
      |    CAST(count(*) AS BIGINT) AS n_docs_with
      |  FROM c GROUP BY word)
      |SELECT word, s AS n_occ, n_docs_with,
      |  CAST((1000000 * (n_docs * q - s * s)) // (n_docs * s) AS BIGINT)
      |    AS vmr_ppm
      |FROM w CROSS JOIN nd
      |WHERE s >= 20
      |ORDER BY vmr_ppm DESC, word ASC LIMIT 20""".stripMargin))

  /** Vocabulary NOVELTY curve — the marginal-value-of-data signal: as
    * the corpus is consumed in doc_id order, how many word types does
    * each 50-doc slice see FIRST? Novelty attribution is one min-
    * aggregation (word → first doc), slice totals a second, and the
    * cumulative vocabulary a running sum over the bounded slice
    * relation — the diminishing-returns curve data-acquisition planning
    * reads without any ordered scan of the corpus itself. novelty_bp =
    * 10⁴·novel div distinct-words-touched, exact integers. ONE corpus
    * scan: first-doc attribution rides a per-word window over the same
    * (doc, word) relation the slice rollup consumes — the two-branch
    * formulation re-expanded the scan+explode subtree (the
    * unigramRarityScores lesson), pinned away in PlanAuditSpec. */
  val textNoveltyCurve: QueryDef = QueryDef(
    "text_novelty_curve",
    (s, d) => {
      val dw = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextOps.words(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
        .distinct()
      val byWord = org.apache.spark.sql.expressions.Window.partitionBy(col("word"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("slice"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      dw.withColumn("fd", min(col("doc_id")).over(byWord))
        .groupBy(expr("doc_id div 50").as("slice"))
        .agg(count(lit(1)).as("word_uses"),
          sum(when(col("doc_id") === col("fd"), 1L).otherwise(0L))
            .as("novel_words"))
        .withColumn("vocab_cum", sum(col("novel_words")).over(w))
        .withColumn("novelty_bp",
          expr("(10000 * novel_words) div word_uses"))
        .orderBy("slice")
    },
    Some(s"""WITH dw AS (
      |  SELECT DISTINCT doc_id, word FROM (
      |    SELECT doc_id, unnest(string_split($normalizeSql, ' ')) AS word
      |    FROM documents) t WHERE length(word) > 0),
      |fd AS (SELECT word, min(doc_id) AS fd FROM dw GROUP BY word),
      |nv AS (SELECT fd // 50 AS slice, CAST(count(*) AS BIGINT) AS novel_words
      |  FROM fd GROUP BY 1),
      |tc AS (SELECT doc_id // 50 AS slice, CAST(count(*) AS BIGINT) AS word_uses
      |  FROM dw GROUP BY 1)
      |SELECT tc.slice, word_uses,
      |  COALESCE(novel_words, 0) AS novel_words,
      |  CAST(sum(COALESCE(novel_words, 0)) OVER (ORDER BY tc.slice
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS vocab_cum,
      |  CAST((10000 * COALESCE(novel_words, 0)) // word_uses AS BIGINT)
      |    AS novelty_bp
      |FROM tc LEFT JOIN nv ON tc.slice = nv.slice
      |ORDER BY tc.slice""".stripMargin))

  /** Audio decimation gated exactly ([[Multimodal.resampleAudioHalf]]):
    * really-decoded WAV samples pair through the 2-tap truncating mean
    * and the decimated stream's count/amplitude/peak replay closed-form
    * from the sample formula — a dropped pair boundary or a
    * floor-vs-truncate slip on negative samples breaks the hash. */
  val mmAudioResample: QueryDef = QueryDef(
    "mm_audio_resample",
    (s, d) => Multimodal.resampleAudioHalf(
        Multimodal.audioCorpus(Tables.documents(s, d)))
      .orderBy("media_id"),
    Some("""WITH d AS (
      |  SELECT doc_id AS id, 64 + doc_id % 64 AS n FROM documents),
      |y AS (
      |  SELECT id,
      |    ( ((id*31 + (2*j)*17) % 2003 - 1001)
      |    + ((id*31 + (2*j+1)*17) % 2003 - 1001) ) // 2 AS y
      |  FROM d, range(0, 64) js(j) WHERE 2*j + 1 < n)
      |SELECT id AS media_id, CAST(count(*) AS BIGINT) AS n_out,
      |  CAST(sum(abs(y)) AS BIGINT) AS amp_sum,
      |  CAST(max(abs(y)) AS BIGINT) AS peak
      |FROM y GROUP BY id ORDER BY media_id""".stripMargin))

  /** Patch extraction gated exactly: the image corpus decodes and
    * splits into a 2×2 tile lattice ([[Multimodal.imageTileStats]] —
    * the ViT patchify shape with integer tile bounds, remainder pixels
    * deterministically assigned), and every tile's pixel count + exact
    * gray sum replays closed-form from the synth formula — a wrong
    * boundary on uneven dims moves a pixel column between tiles and
    * breaks the hash. */
  val mmImageTiles: QueryDef = QueryDef(
    "mm_image_tiles",
    (s, d) => Multimodal.imageTileStats(
        Multimodal.imageCorpus(Tables.documents(s, d)), grid = 2)
      .orderBy("media_id", "tile_y", "tile_x"),
    Some("""WITH dims AS (
      |  SELECT doc_id AS id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h FROM documents),
      |px AS (
      |  SELECT id, w, h, x, y,
      |      (id*31 + x*7  + y*13) % 256
      |    + (id*17 + x*11 + y*3)  % 256
      |    + (id*13 + x*5  + y*19) % 256 AS gray
      |  FROM dims, range(0, 16) xs(x), range(0, 13) ys(y)
      |  WHERE x < w AND y < h),
      |t AS (
      |  SELECT id, tx, ty, w, h, x, y, gray
      |  FROM px, range(0, 2) txs(tx), range(0, 2) tys(ty)
      |  WHERE x >= (tx*w)//2 AND x < ((tx+1)*w)//2
      |    AND y >= (ty*h)//2 AND y < ((ty+1)*h)//2)
      |SELECT id AS media_id, CAST(tx AS BIGINT) AS tile_x,
      |  CAST(ty AS BIGINT) AS tile_y,
      |  CAST(count(*) AS BIGINT) AS n_px, CAST(sum(gray) AS BIGINT) AS gray_sum
      |FROM t GROUP BY id, tx, ty
      |ORDER BY media_id, tile_y, tile_x""".stripMargin))

  /** Source-pair VOCABULARY similarity — the corpus-slice overlap matrix
    * mixture planning reads before weighting sources (near-identical
    * vocabularies → redundant slices; disjoint → coverage). Per source,
    * the distinct word set; per source PAIR, exact Jaccard in ppm via a
    * posting-list self-join on the word (each word contributes its
    * source-pair co-occurrences — no all-pairs document work, the
    * postings shape every dedup operator here already rides). Source
    * cardinality is bounded (20), so per-source sizes broadcast. */
  val textSourceSimilarity: QueryDef = QueryDef(
    "text_source_similarity",
    (s, d) => {
      val sw = Tables.documents(s, d)
        .select(col("source"), explode(TextOps.words(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
        .distinct()
      val sizes = sw.groupBy(col("source")).agg(count(lit(1)).as("n_vocab"))
      val a = sw.select(col("source").as("src_a"), col("word"))
      val b = sw.select(col("source").as("src_b"), col("word"))
      a.join(b, Seq("word"))
        .filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_shared"))
        .join(broadcast(sizes.select(col("source").as("src_a"),
          col("n_vocab").as("n_a"))), "src_a")
        .join(broadcast(sizes.select(col("source").as("src_b"),
          col("n_vocab").as("n_b"))), "src_b")
        .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
          col("n_shared"),
          expr("(1000000 * n_shared) div (n_a + n_b - n_shared)")
            .as("jaccard_ppm"))
        .orderBy(col("jaccard_ppm").desc, col("src_a").asc, col("src_b").asc)
        .limit(30)
    },
    Some(s"""WITH sw AS (
      |  SELECT DISTINCT source, word FROM (
      |    SELECT source, unnest(string_split($normalizeSql, ' ')) AS word
      |    FROM documents) t WHERE length(word) > 0),
      |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n_vocab FROM sw GROUP BY source),
      |p AS (
      |  SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS n_shared
      |  FROM sw a JOIN sw b ON a.word = b.word AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT src_a, src_b, sa.n_vocab AS n_a, sb.n_vocab AS n_b, n_shared,
      |  CAST((1000000 * n_shared) // (sa.n_vocab + sb.n_vocab - n_shared) AS BIGINT)
      |    AS jaccard_ppm
      |FROM p JOIN sz sa ON p.src_a = sa.source JOIN sz sb ON p.src_b = sb.source
      |ORDER BY jaccard_ppm DESC, src_a ASC, src_b ASC LIMIT 30""".stripMargin))

  /** Week-over-week volume deltas per event type in exact basis points —
    * the trend monitor a pipeline dashboard runs on its ingest volumes
    * (q_anomaly_hourly's longer-horizon sibling). date_trunc to weeks,
    * one lag window over the tiny (type, week) relation, delta_bp =
    * 10⁴·(cur − prev) div prev. */
  val qEventsWow: QueryDef = QueryDef(
    "q_events_wow",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("week"))
      Tables.events(s, d)
        .groupBy(date_format(date_trunc("week", col("ts")), "yyyy-MM-dd")
          .as("week"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .withColumn("prev_n", lag(col("n_events"), 1).over(w))
        .select(col("week"), col("event_type"), col("n_events"),
          when(col("prev_n").isNotNull,
            expr("(10000 * (n_events - prev_n)) div prev_n")).as("wow_bp"))
        .orderBy("event_type", "week")
    },
    Some("""WITH h AS (
      |  SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
      |    event_type, CAST(count(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1, 2),
      |l AS (
      |  SELECT week, event_type, n_events,
      |    lag(n_events) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
      |  FROM h)
      |SELECT week, event_type, n_events,
      |  CASE WHEN prev_n IS NOT NULL
      |    THEN CAST((10000 * (n_events - prev_n)) // prev_n AS BIGINT) END AS wow_bp
      |FROM l ORDER BY event_type, week""".stripMargin))

  /** Repetition gates (Gopher-style): top-word share and duplicate
    * trigram fraction per document — one narrow typed pass, zero
    * shuffles; the oracle recomputes both from an explode + group
    * formulation, pinning the hash-map/sliding-window Scala against
    * declarative SQL. */
  val textRepetition: QueryDef = QueryDef(
    "text_repetition",
    (s, d) => TextOps.repetitionMetrics(Tables.documents(s, d), "doc_id", "text", n = 3)
      .select(col("id").as("doc_id"),
        round(col("top_word_share"), 4).as("top_word_share"),
        round(col("dup_ngram_frac"), 4).as("dup_trigram_frac"))
      .orderBy("doc_id"),
    Some(s"""WITH words AS (
      |  SELECT doc_id, string_split($normalizeSql, ' ') AS w FROM documents),
      |wc AS (
      |  SELECT doc_id, word, count(*) AS c
      |  FROM (SELECT doc_id, unnest(w) AS word FROM words) GROUP BY doc_id, word),
      |tw AS (SELECT doc_id, max(c) AS best, sum(c) AS nw FROM wc GROUP BY doc_id),
      |sh AS (
      |  SELECT doc_id, len(w) - 2 AS total,
      |    len(list_distinct([array_to_string(w[i:i+2], ' ')
      |      for i in range(1, greatest(len(w) - 1, 1))])) AS dis
      |  FROM words)
      |SELECT t.doc_id,
      |  round(CAST(best AS DOUBLE) / CAST(nw AS DOUBLE), 4) AS top_word_share,
      |  CASE WHEN total <= 0 THEN 0.0
      |       ELSE round(1.0 - CAST(dis AS DOUBLE) / CAST(total AS DOUBLE), 4)
      |  END AS dup_trigram_frac
      |FROM tw t JOIN sh USING (doc_id)
      |ORDER BY doc_id""".stripMargin))

  /** As-of join: each purchase event picks the latest signup event of
    * the same user at-or-before its timestamp (point-in-time feature
    * alignment). Oracle: DuckDB's native ASOF LEFT JOIN. */
  val asofJoin: QueryDef = QueryDef(
    "q_asof_join",
    (s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val snapshots = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts").as("snap_ts"))
        .agg(max(col("event_id")).as("snap_id"))
      graft.ops.AsOf.asOfJoin(purchases, snapshots, "user_id", "ts", "snap_ts", Seq("snap_id"))
        .select(col("user_id"), col("event_id"), col("snap_id"))
        .orderBy("event_id")
    },
    Some("""WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
      |s AS (SELECT user_id, ts AS snap_ts, max(event_id) AS snap_id
      |      FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
      |SELECT p.user_id, p.event_id, s.snap_id
      |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.snap_ts
      |ORDER BY p.event_id""".stripMargin))

  /** The same as-of semantics through the custom plan node
    * (AsOfJoinNode -> merge-scan AsOfJoinExec via the injected
    * strategy) — same DuckDB ASOF LEFT JOIN oracle as q_asof_join, so
    * the custom operator is held to the identical answer. */
  val asofJoinNative: QueryDef = QueryDef(
    "q_asof_native",
    (s, d) => {
      graft.functions.GraftExtensions.register(s)
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val snapshots = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts").as("snap_ts"))
        .agg(max(col("event_id")).as("snap_id"))
      graft.ops.AsOf.asOfJoinNative(purchases, snapshots,
          "user_id", "ts", "snap_ts", Seq("snap_id"))
        .select(col("user_id"), col("event_id"), col("snap_id"))
        .orderBy("event_id")
    },
    Some("""WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
      |s AS (SELECT user_id, ts AS snap_ts, max(event_id) AS snap_id
      |      FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
      |SELECT p.user_id, p.event_id, s.snap_id
      |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.snap_ts
      |ORDER BY p.event_id""".stripMargin))

  /** Bounded-staleness as-of: same alignment as q_asof_native but a
    * snapshot older than 3 days no longer counts (feature-freshness
    * gate). Oracle: ASOF LEFT JOIN + a CASE on the matched age. */
  val asofTolerance: QueryDef = QueryDef(
    "q_asof_tolerance",
    (s, d) => {
      graft.functions.GraftExtensions.register(s)
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val snapshots = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts").as("snap_ts"))
        .agg(max(col("event_id")).as("snap_id"))
      graft.ops.AsOf.asOfJoinTolerance(purchases, snapshots,
          "user_id", "ts", "snap_ts", Seq("snap_id"), toleranceSeconds = 3L * 86400)
        .select(col("user_id"), col("event_id"), col("snap_id"))
        .orderBy("event_id")
    },
    Some("""WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
      |s AS (SELECT user_id, ts AS snap_ts, max(event_id) AS snap_id
      |      FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
      |SELECT p.user_id, p.event_id,
      |  CASE WHEN p.ts - s.snap_ts <= INTERVAL 3 DAY THEN s.snap_id ELSE NULL END AS snap_id
      |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.snap_ts
      |ORDER BY p.event_id""".stripMargin))

  /** Range join: purchases falling inside a 3-day window after any
    * signup of the same user — binned candidate generation (join on
    * (key, time-bin)), exact BETWEEN verification. */
  val rangeJoin: QueryDef = QueryDef(
    "q_range_join",
    (s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val intervals = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("interval_id"),
          col("ts").as("start_ts"),
          (col("ts") + expr("INTERVAL 3 DAYS")).as("end_ts"))
      graft.ops.RangeJoin.pointInInterval(purchases, intervals,
          "user_id", "ts", "start_ts", "end_ts", binSeconds = 3L * 86400)
        .select(col("user_id"), col("event_id"), col("interval_id"))
        .orderBy("event_id", "interval_id")
    },
    Some("""WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
      |i AS (SELECT user_id, event_id AS interval_id, ts AS start_ts,
      |        ts + INTERVAL 3 DAY AS end_ts
      |      FROM events WHERE event_type = 'signup')
      |SELECT p.user_id, p.event_id, i.interval_id
      |FROM p JOIN i ON p.user_id = i.user_id
      |  AND p.ts >= i.start_ts AND p.ts <= i.end_ts
      |ORDER BY p.event_id, i.interval_id""".stripMargin))

  /** Keyed keep-latest dedup: per user, the most recent event. */
  val dedupKeepLatest: QueryDef = QueryDef(
    "dedup_keep_latest",
    (s, d) => Dedup.keepLatest(Tables.events(s, d), Seq("user_id"), "ts", "event_id")
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
      .orderBy("user_id"),
    Some("""SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
      |FROM (SELECT user_id, event_id, ts,
      |        row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin))

  /** Exact stratified sample: 20% of documents per language,
    * md5-ordered so the draw is deterministic and oracle-recomputable. */
  val sampleStratified: QueryDef = QueryDef(
    "sample_stratified",
    (s, d) => graft.ops.Sampling.stratifiedExact(
        Tables.documents(s, d).select(col("doc_id"), col("lang")),
        "lang", "doc_id", 0.2)
      .orderBy("doc_id"),
    Some("""SELECT doc_id, lang FROM (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn,
      |    count(*) OVER (PARTITION BY lang) AS n
      |  FROM documents) t
      |WHERE rn <= ceil(0.2 * n)
      |ORDER BY doc_id""".stripMargin))

  /** Weighted source mixing: deterministic per-row Bernoulli keep with
    * per-source rates — row-local (no window, no shuffle; contrast
    * sample_stratified's exact-count window). Rates cycle
    * 1.0/0.5/0.25/0.1 over the 20 sources; the oracle re-derives the
    * 60-bit md5 draw and the same CASE rate table. */
  val sampleWeightedMix: QueryDef = {
    val rates = (0 until 20).map(i => s"src$i" -> Seq(1.0, 0.5, 0.25, 0.1)(i % 4))
    QueryDef(
      "sample_weighted_mix",
      (s, d) => graft.ops.Sampling.weightedBySource(
          Tables.documents(s, d).select(col("doc_id"), col("source")),
          "source", "doc_id", rates.toMap)
        .orderBy("doc_id"),
      Some {
        val cases = rates.map { case (src, w) => s"WHEN '$src' THEN $w" }.mkString(" ")
        s"""SELECT doc_id, source FROM documents
          |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
          |        / 1152921504606846976.0
          |      < CASE source $cases ELSE 0.0 END
          |ORDER BY doc_id""".stripMargin
      })
  }

  /** Corpus statistics: exact interpolated percentiles of document
    * length and token counts (distribution profiling for quality gates). */
  val textPercentiles: QueryDef = QueryDef(
    "text_percentiles",
    (s, d) => Tables.documents(s, d)
      .agg(
        expr("percentile(n_chars, array(0.25, 0.5, 0.75))").as("chars_q"),
        min(col("n_chars")).as("chars_min"),
        max(col("n_chars")).as("chars_max"),
        count(lit(1)).as("n_docs"))
      .select(
        round(element_at(col("chars_q"), 1), 4).as("q25"),
        round(element_at(col("chars_q"), 2), 4).as("q50"),
        round(element_at(col("chars_q"), 3), 4).as("q75"),
        col("chars_min"), col("chars_max"), col("n_docs")),
    Some("""SELECT
      |  round(quantile_cont(n_chars, 0.25), 4) AS q25,
      |  round(quantile_cont(n_chars, 0.5), 4) AS q50,
      |  round(quantile_cont(n_chars, 0.75), 4) AS q75,
      |  min(n_chars) AS chars_min, max(n_chars) AS chars_max,
      |  count(*) AS n_docs
      |FROM documents""".stripMargin))

  /** text_inverted_search: persisted inverted index + conjunctive
    * retrieval ([[graft.ops.InvertedIndex]]). Build writes posting
    * rows (term, doc_id, tf) as a TERM-BUCKETED sorted table; the
    * 3-term AND query then reads ONLY those terms' posting lists — the
    * scan is bucket-pruned (SelectedBucketsCount pinned in
    * InvertedIndexSpec), so query cost is posting-list-sized, never
    * corpus-sized: the property that makes interactive term lookup on
    * a 100 TB corpus possible. Ranked by summed term frequency. The
    * oracle rebuilds the postings and intersection from the raw text. */
  val textInvertedSearch: QueryDef = QueryDef(
    "text_inverted_search",
    (s, d) => {
      val tok = graft.sources.TableIO.sessionToken(s)
      val table = s"graft_invidx_$tok"
      graft.ops.InvertedIndex.buildIndex(
        Tables.documents(s, d), "doc_id", "text", table,
        graft.sources.TableIO.scratchDir(s, "invidx"), buckets = 16)
      graft.ops.InvertedIndex.searchAll(
        s, table, Seq("spark", "join", "data"), k = 20)
    },
    Some(s"""WITH words AS (
      |  SELECT doc_id, unnest(string_split($normalizeSql, ' ')) AS term
      |  FROM documents),
      |p AS (
      |  SELECT term, doc_id, count(*) AS tf FROM words
      |  WHERE len(term) >= 1 GROUP BY term, doc_id),
      |m AS (
      |  SELECT doc_id, count(*) AS n_terms, sum(tf) AS score FROM p
      |  WHERE term IN ('spark', 'join', 'data') GROUP BY doc_id)
      |SELECT doc_id, CAST(score AS BIGINT) AS score FROM m WHERE n_terms = 3
      |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin))

  /** text_inverted_phrase: PHRASE search over a POSITIONAL inverted
    * index — each posting carries the term's sorted word offsets, and
    * the phrase "table hash" resolves as an adjacency intersect
    * (`positions(first)+1 ∩ positions(second)`) between two
    * bucket-pruned posting lists joined on doc_id: no text re-scan, no
    * regex fallback, and the join is exchange-light because both sides
    * come pre-hashed from the same bucketed table. The oracle rebuilds
    * positional postings with unnest-with-ordinality and replays the
    * same adjacency intersection. */
  val textInvertedPhrase: QueryDef = QueryDef(
    "text_inverted_phrase",
    (s, d) => {
      val tok = graft.sources.TableIO.sessionToken(s)
      val table = s"graft_invidx_pos_$tok"
      graft.ops.InvertedIndex.buildIndex(
        Tables.documents(s, d), "doc_id", "text", table,
        graft.sources.TableIO.scratchDir(s, "invidx_pos"), buckets = 16,
        positional = true)
      graft.ops.InvertedIndex.searchPhrase(s, table, "table", "hash")
    },
    Some(s"""WITH words AS (
      |  SELECT doc_id, string_split($normalizeSql, ' ') AS l FROM documents),
      |px AS (
      |  SELECT doc_id, l[i] AS term, i - 1 AS pos
      |  FROM words, unnest(range(1, len(l) + 1)) t(i)
      |  WHERE len(l[i]) >= 1),
      |a AS (SELECT doc_id, list(pos ORDER BY pos) AS p1 FROM px
      |      WHERE term = 'table' GROUP BY doc_id),
      |b AS (SELECT doc_id, list(pos ORDER BY pos) AS p2 FROM px
      |      WHERE term = 'hash' GROUP BY doc_id)
      |SELECT a.doc_id,
      |  CAST(len(list_intersect(list_transform(p1, x -> x + 1), p2)) AS INTEGER)
      |    AS n_phrase
      |FROM a JOIN b ON a.doc_id = b.doc_id
      |WHERE len(list_intersect(list_transform(p1, x -> x + 1), p2)) > 0
      |ORDER BY a.doc_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(
    textInvertedSearch, textInvertedPhrase,
    asofJoin, asofJoinNative, asofTolerance, rangeJoin, dedupExact, dedupKeepLatest,
    dedupMinhashLsh, dedupCluster, dedupClusterStar,
    dedupNgramJaccard, dedupContainment, dedupSimhash, dedupFuzzyBlock, dedupSortedNeighborhood,
    linkEntities, dedupIncremental,
    dedupIncrementalLsh, dedupIncrementalLshBucketed,
    dedupEmbedding, sampleStratified, sampleWeightedMix,
    textPercentiles, simTopkBrute, simBitextMargin, sampleNegatives,
    simAnnLsh, simKnnGraph, simKnnClusters, simHybridRetrieval,
    simIvf, simTopkInt8, simPqAdc,
    simIvfPq, simIvfPqRerank, simIvfPqResidual, simIvfPqIndexed, simIvfPqAppended,
    simRrfFusion, simMmr, simRecallAudit, embMatryoshkaOverlap, dedupMinhashAudit,
    textLangid, textLangConfusion, qBenfordDigits,
    ingestHtmlExtract, ingestUrlCanonicalize, textQuality, textQualityModel,
    textTokens, textFingerprint, textChunkOverlap, textDupGrams, textDedupSpans, dedupSubstrings,
    dedupSubstr50,
    textWordcount, textRepetition,
    mmDecode, mmResize, mmFrameSample, mmSimilarity,
    mmDecodeImage, mmResizeImage, mmFrameSampleAvi, mmDecodeWav,
    mmSimilarityPixels, mmAHashDedup, mmDecodeImageSafe, mmDecodeJpeg, mmDecodeGif,
    mmFrameSampleMjpeg, mmFrameSampleGif, mmSceneDetect, mmPHashDedup,
    mmAudioVad, mmAudioResample, mmAudioLoudness, mmImageTiles, sampleSplitLeakageSafe,
    textSourceSimilarity, textNoveltyCurve, textBurstiness, qEventsWow)
}
