package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Unicode-aware text operators, value-gated on a deterministic
  * mixed-script corpus. The ASCII normalizer ([[graft.ops.TextOps.normalize]])
  * maps every non-ASCII codepoint to a separator, so a CJK/Cyrillic/
  * Arabic document becomes the empty string through every text op; this
  * family gates the `\p{L}\p{N}`-class normalizer
  * ([[graft.ops.TextOps.normalizeUnicode]]) — NFC composition first
  * (the codegen'd [[graft.functions.NfcNormalize]]), then
  * all-script letter/digit classes — end-to-end: tokenization,
  * fingerprinting, script identification, segment dedup.
  *
  * The corpus: each document's text prefixed with a fixed phrase chosen
  * by `doc_id % 7` — Latin, Cyrillic (mixed case: exercises non-ASCII
  * lowercasing), Greek (lowercase — uppercase final sigma is the one
  * documented point where JDK contextual lowercasing and DuckDB's
  * utf8proc simple mapping diverge), Arabic with Arabic-Indic digits
  * (`\p{N}` beyond ASCII), Han, Hangul, and a Latin phrase written with
  * DECOMPOSED combining marks (U+0301/U+0308 sequences — stripped as
  * `\p{M}` unless NFC composes them first, which is exactly what the
  * gate proves happens identically in both engines). Both engines build
  * the corpus from the same literals, so every value — token counts,
  * md5 fingerprints over UTF-8 bytes, script censuses — is exact. */
object UnicodeQueries {

  /** Bucket phrases, indexed by doc_id % 7. Single source of truth for
    * both the Spark expression and the oracle SQL. */
  private val phrases: Seq[String] = Seq(
    "the quick brown fox runs far",
    "Привет МИР данные Поток БЫСТРО",
    "καλημέρα κόσμος δεδομένα γρήγορα",
    "مرحبا بالعالم بيانات سريعة ٤٢",
    "数据 处理 管道 大规模 分析",
    "데이터 파이프라인 대규모 처리",
    "café résumé naïve Über grün")

  private def phraseCol: Column =
    phrases.zipWithIndex.foldLeft(lit(phrases.last)) { case (acc, (p, i)) =>
      when(pmod(col("doc_id"), lit(7)) === i, lit(p)).otherwise(acc)
    }

  private def phraseSql: String =
    phrases.zipWithIndex.map { case (p, i) =>
      s"WHEN doc_id % 7 = $i THEN '$p'"
    }.mkString("CASE ", " ", " END")

  /** DuckDB mirror of [[graft.ops.TextOps.normalizeUnicode]]. */
  private def normUniSql(inner: String): String =
    s"trim(regexp_replace(regexp_replace(lower(nfc_normalize($inner)), " +
      s"'[^\\p{L}\\p{N} ]', ' ', 'g'), ' +', ' ', 'g'))"

  private val uSql = s"$phraseSql || ' ' || coalesce(text, '')"

  private def uCol: Column =
    concat(phraseCol, lit(" "), coalesce(col("text"), lit("")))

  /** Unicode tokenization + fingerprint census per script bucket: word
    * and character counts of the Unicode-normalized mixed-script text,
    * plus distinct md5 fingerprints — any single-document divergence in
    * NFC, lowercasing, the letter classes, or UTF-8 hashing moves a
    * sum. The decomposed-combining-mark bucket (6) only matches because
    * both engines NFC-compose before stripping. */
  val textTokensUnicode: QueryDef = QueryDef(
    "text_tokens_unicode",
    (s, d) => {
      val norm = TextOps.normalizeUnicode(uCol)
      Tables.documents(s, d)
        .select(pmod(col("doc_id"), lit(7)).as("bucket"), norm.as("norm"))
        .select(col("bucket"),
          when(length(col("norm")) === 0, lit(0L))
            .otherwise(size(split(col("norm"), " ")).cast("long")).as("nw"),
          length(col("norm")).cast("long").as("nc"),
          md5(col("norm").cast("binary")).as("fp"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("n_words"),
          sum(col("nc")).as("n_chars"),
          countDistinct(col("fp")).as("n_distinct_fp"))
        .orderBy("bucket")
    },
    Some(s"""WITH u AS (
      |  SELECT doc_id % 7 AS bucket, ${normUniSql(uSql)} AS norm
      |  FROM documents)
      |SELECT bucket, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN len(norm) = 0 THEN 0
      |           ELSE len(string_split(norm, ' ')) END) AS BIGINT) AS n_words,
      |  CAST(sum(len(norm)) AS BIGINT) AS n_chars,
      |  CAST(count(DISTINCT md5(norm)) AS BIGINT) AS n_distinct_fp
      |FROM u GROUP BY bucket ORDER BY bucket""".stripMargin))

  /** Script identification by codepoint census: per document, count the
    * characters in each of six Unicode script classes over the NFC'd
    * phrase + an 8-char slice of the body (the slice keeps the Latin
    * body from drowning the phrase's script — language ID over mixed
    * content scores the section of interest, not the whole blob), then
    * classify to the maximal script, ties breaking alphabetically.
    * Java `\p{IsXxx}` and RE2 `\p{Xxx}` agree on the script
    * properties — that agreement is what this gate pins. */
  val textLangidScript: QueryDef = QueryDef(
    "text_langid_script",
    (s, d) => {
      val u = graft.functions.nfc(
        concat(phraseCol, lit(" "),
          substring(coalesce(col("text"), lit("")), 1, 8)))
      def census(clazz: String): Column =
        length(regexp_replace(u, s"[^\\p{Is$clazz}]", ""))
      val scripts = Seq("Arabic" -> census("Arabic"),
        "Cyrillic" -> census("Cyrillic"), "Greek" -> census("Greek"),
        "Han" -> census("Han"), "Hangul" -> census("Hangul"),
        "Latin" -> census("Latin"))
      val withCounts = Tables.documents(s, d).select(
        (col("doc_id") +: scripts.map { case (n, c) =>
          c.cast("long").as(s"c_${n.toLowerCase}")
        }): _*)
      val mx = greatest(scripts.map { case (n, _) =>
        col(s"c_${n.toLowerCase}")
      }: _*)
      val script = scripts.foldRight(lit("none")) { case ((n, _), acc) =>
        when(col(s"c_${n.toLowerCase}") === mx && mx > 0,
          lit(n.toLowerCase)).otherwise(acc)
      }
      // foldRight gives alphabetical priority: the FIRST when wins a tie
      withCounts.withColumn("script", script)
        .groupBy(col("script"))
        .agg(count(lit(1)).as("n_docs"),
          sum(greatest(scripts.map { case (n, _) =>
            col(s"c_${n.toLowerCase}") }: _*)).as("n_chars_top"))
        .orderBy("script")
    },
    Some {
      val inner = s"nfc_normalize($phraseSql || ' ' || substr(coalesce(text, ''), 1, 8))"
      val classes = Seq("arabic" -> "Arabic", "cyrillic" -> "Cyrillic",
        "greek" -> "Greek", "han" -> "Han", "hangul" -> "Hangul",
        "latin" -> "Latin")
      val cs = classes.map { case (a, c) =>
        s"len(regexp_replace(u, '[^\\p{$c}]', '', 'g')) AS c_$a"
      }.mkString(",\n    ")
      val mx = s"greatest(${classes.map("c_" + _._1).mkString(", ")})"
      val caseExpr = classes.map { case (a, _) =>
        s"WHEN c_$a = $mx AND $mx > 0 THEN '$a'"
      }.mkString("CASE ", " ", " ELSE 'none' END")
      s"""WITH c0 AS (SELECT doc_id, $inner AS u FROM documents),
         |c AS (SELECT doc_id,
         |    $cs
         |  FROM c0),
         |cls AS (SELECT doc_id, $caseExpr AS script, $mx AS topn FROM c)
         |SELECT script, count(*) AS n_docs,
         |  CAST(sum(topn) AS BIGINT) AS n_chars_top
         |FROM cls GROUP BY script ORDER BY script""".stripMargin
    })

  /** Segment-level dedup over the MULTILINGUAL stream: the CCNet-style
    * boilerplate strike ([[graft.ops.TextOps.removeFrequentSegments]])
    * with the Unicode tokenizer — the bucket phrases are cross-document
    * boilerplate by construction (every bucket shares its phrase
    * prefix), so non-Latin segments must hash, count, and strike
    * identically in both engines for a single row to match. Same
    * broadcast-set narrow-pass scale shape as `dedup_segments`. */
  val dedupSegmentsUnicode: QueryDef = QueryDef(
    "dedup_segments_unicode",
    (s, d) => TextOps.removeFrequentSegments(
        Tables.documents(s, d).withColumn("u", uCol),
        "doc_id", "u", k = 3, minDocs = 2, unicode = true)
      .orderBy("doc_id"),
    Some(s"""WITH w AS (
      |  SELECT doc_id, string_split(${normUniSql(uSql)}, ' ') AS w
      |  FROM documents),
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
      |SELECT doc_id, coalesce(array_to_string(kept, ' '), '') AS deduped_text,
      |  CAST(len(segs) - len(kept) AS BIGINT) AS n_removed_segments
      |FROM kept ORDER BY doc_id""".stripMargin))

  val all: Seq[QueryDef] =
    Seq(textTokensUnicode, textLangidScript, dedupSegmentsUnicode)
}
