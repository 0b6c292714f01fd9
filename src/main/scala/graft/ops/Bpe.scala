package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich, Haddow & Birch 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the real
  * merge-training loop plus row-local application, engine-replayable.
  *
  * Scale shape. BPE training state is TINY (a word-frequency table and
  * an ordered merge list); what is huge is the corpus it summarizes. So
  * the split is: ONE distributed map-side-combined aggregation produces
  * the word-frequency table, capped to the `maxTrainWords` most frequent
  * words (TakeOrdered — bounded driver transfer, the standard practice:
  * production BPE vocabularies are trained on a capped/sampled slice,
  * and the cap is what makes the collect safe at 100 TB); the merge loop
  * then runs driver-side over that bounded table — numMerges rounds of
  * pure string work, ZERO further Spark jobs (running each round as a
  * cluster job would pay numMerges job latencies to aggregate a table
  * that fits in L2). Application is embarrassingly row-local: the merge
  * list ships in the task closure and each word is re-segmented
  * independently.
  *
  * Engine-exactness contract (what makes the DuckDB oracle replay
  * training AND application bit-for-bit):
  *  - the symbol alphabet stays SINGLE-CHAR: initial symbols are the
  *    normalized chars [a-z0-9]; merge i's output symbol is the single
  *    char `chr(191 + i)` (i 1-based — U+00C0..), disjoint from the
  *    input alphabet. A segmentation is therefore a plain string, one
  *    char per token;
  *  - applying a merge is literal left-to-right non-overlapping
  *    `replace(seg, pair, mergedChar)` — Java `String.replace` and SQL
  *    `replace` agree exactly;
  *  - a pair's weighted count is `freq * (len(seg) - len(replace(seg,
  *    pair, ''))) / 2` — the same non-overlap convention as
  *    application, expressible identically in both engines;
  *  - ties break (count desc, pair asc) — BMP codepoint order, on which
  *    Java UTF-16 and DuckDB UTF-8 comparisons agree.
  * Sequential exhaustive application in training order equals standard
  * priority application: a merge's output symbol is fresh, so later
  * merges can never create new occurrences of an earlier merge's pair.
  */
object Bpe {

  final case class Merge(rk: Long, pair: String, merged: String, cnt: Long)

  /** JVM twin of [[TextOps.normalize]] (lowercase, strip non-alnum,
    * collapse spaces) — keep in sync with the column expression. */
  def normalizeString(text: String): String =
    Option(text).getOrElse("").toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim

  /** Non-overlapping left-to-right occurrences of 2-char `pair` in `s` —
    * the `(len - len(replace)) / 2` formula, same as the oracle's. */
  private def countPair(s: String, pair: String): Int =
    (s.length - s.replace(pair, "").length) / 2

  def mergedChar(rank1Based: Int): String = (191 + rank1Based).toChar.toString

  /** Train `numMerges` merges over the corpus' word-frequency table
    * (capped to `maxTrainWords` by (freq desc, word asc)). Eager: runs
    * the one aggregation job at call time. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      maxTrainWords: Int): Seq[Merge] = {
    require(numMerges >= 1 && numMerges <= 63,
      "merged symbols live in the single-char range U+00C0..U+00FF")
    require(maxTrainWords >= 1, "need a positive training-word cap")
    val freqRows = docs
      .select(explode(TextOps.words(col(textCol))).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w").asc).limit(maxTrainWords)
      .collect()
    require(freqRows.nonEmpty, "BPE training corpus has no words")
    var segs: Array[(String, Long)] =
      freqRows.map(r => r.getString(0) -> r.getLong(1))
    val merges = Seq.newBuilder[Merge]
    for (i <- 1 to numMerges) {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      segs.foreach { case (s, f) =>
        var j = 0
        while (j + 2 <= s.length) { // candidate pairs from every position;
          val p = s.substring(j, j + 2) // the COUNT is the non-overlap formula
          if (!counts.contains(p)) counts(p) = 0L
          j += 1
        }
      }
      counts.keysIterator.toArray.foreach { p =>
        counts(p) = segs.iterator.map { case (s, f) => countPair(s, p) * f }.sum
      }
      require(counts.nonEmpty,
        s"BPE round $i: no adjacent pairs left to merge (corpus too small " +
          s"for numMerges=$numMerges)")
      val (bestPair, bestCnt) = counts.toSeq
        .minBy { case (p, c) => (-c, p) } // (count desc, pair asc)
      val m = mergedChar(i)
      merges += Merge(i.toLong, bestPair, m, bestCnt)
      segs = segs.map { case (s, f) => (s.replace(bestPair, m), f) }
    }
    merges.result()
  }

  /** Segment one normalized word under an ordered merge list: chars,
    * then each merge applied exhaustively left-to-right. One char of the
    * result = one BPE token. */
  def segment(word: String, merges: Seq[Merge]): String = {
    var s = word
    merges.foreach(m => s = s.replace(m.pair, m.merged))
    s
  }

  /** The trained merge table as a DataFrame (rk, pair, merged, cnt). */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
  }

  /** Per-document BPE token accounting under a trained merge list:
    * (id, n_words, n_tokens_bpe) where n_tokens_bpe sums the segmented
    * length of every word. Row-local typed map — the merge list rides
    * the task closure; nothing shuffles before the per-doc aggregate
    * (which is row-per-doc already, so this is a narrow pass). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ms = merges.map(m => (m.pair, m.merged))
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val ws = normalizeString(text).split(" ", -1).filter(_.nonEmpty)
        var toks = 0L
        ws.foreach { w =>
          var s = w
          ms.foreach { case (p, m) => s = s.replace(p, m) }
          toks += s.length
        }
        (id, ws.length.toLong, toks)
      }
      .toDF(idCol, "n_words", "n_tokens_bpe")
  }

  // ---- oracle SQL generation (unrolled training replay) ----

  /** The unrolled training CTE chain `w0, s0, cnt1, best1, s1, ...,
    * cnt$n, best$n, s$n` over `documents(text)`: paste after WITH. Each
    * round counts candidate pairs with the replace formula, picks the
    * (count desc, pair asc) argmax, and rewrites segmentations — the
    * exact driver loop, in SQL. */
  def trainCtesSql(normalizeSql: String, numMerges: Int,
      maxTrainWords: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""w0 AS MATERIALIZED (
         |  SELECT w AS word, count(*) AS freq FROM (
         |    SELECT unnest(string_split($normalizeSql, ' ')) AS w FROM documents) t
         |  WHERE len(w) >= 1 GROUP BY w
         |  ORDER BY freq DESC, word ASC LIMIT $maxTrainWords),
         |s0 AS MATERIALIZED (SELECT word, freq, word AS s FROM w0)""".stripMargin)
    for (i <- 1 to numMerges) {
      val prev = s"s${i - 1}"
      sb.append(
        s""",
           |cnt$i AS MATERIALIZED (
           |  SELECT c.pair,
           |    CAST(sum(f.freq * (len(f.s) - len(replace(f.s, c.pair, ''))) // 2)
           |      AS BIGINT) AS cnt
           |  FROM (SELECT DISTINCT substr(s, CAST(x AS INTEGER), 2) AS pair
           |        FROM $prev, unnest(range(1, len(s), 1)) r(x)) c, $prev f
           |  GROUP BY c.pair),
           |best$i AS MATERIALIZED (SELECT pair, cnt FROM cnt$i ORDER BY cnt DESC, pair ASC LIMIT 1),
           |s$i AS MATERIALIZED (SELECT word, freq,
           |  replace(s, (SELECT pair FROM best$i), chr(${191 + i})) AS s FROM $prev)""".stripMargin)
    }
    sb.toString()
  }

  /** SQL expression segmenting `wordExpr` under the trained merges: the
    * nested scalar-subquery replace chain (round order). */
  def segmentExprSql(wordExpr: String, numMerges: Int): String =
    (1 to numMerges).foldLeft(wordExpr) { (acc, i) =>
      s"replace($acc, (SELECT pair FROM best$i), chr(${191 + i}))"
    }

  /** Human-readable expansion of every merged symbol: merge i's token
    * string is expansion(pair[0]) || expansion(pair[1]), base chars
    * expanding to themselves — the inspectable vocabulary a tokenizer
    * ships. */
  def expansions(merges: Seq[Merge]): Seq[(Merge, String)] = {
    val decode = scala.collection.mutable.Map.empty[Char, String]
    merges.map { m =>
      def ex(c: Char): String = decode.getOrElse(c, c.toString)
      val e = ex(m.pair.charAt(0)) + ex(m.pair.charAt(1))
      decode(m.merged.charAt(0)) = e
      (m, e)
    }
  }

  /** The expansion table in SQL: CTE chain `exp0..exp$n` where exp$i
    * maps every symbol live after round i to its character expansion.
    * Paste after [[trainCtesSql]]'s CTEs (depends on best$i). */
  def expansionCtesSql(numMerges: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """exp0 AS MATERIALIZED (
        |  SELECT chr(CAST(x AS INTEGER)) AS sym, chr(CAST(x AS INTEGER)) AS ex
        |  FROM (SELECT unnest(range(97, 123)) AS x UNION ALL
        |        SELECT unnest(range(48, 58))) t)""".stripMargin)
    for (i <- 1 to numMerges) {
      val prev = s"exp${i - 1}"
      sb.append(
        s""",
           |exp$i AS MATERIALIZED (
           |  SELECT sym, ex FROM $prev
           |  UNION ALL
           |  SELECT chr(${191 + i}),
           |    (SELECT e1.ex FROM $prev e1
           |     WHERE e1.sym = substr((SELECT pair FROM best$i), 1, 1)) ||
           |    (SELECT e2.ex FROM $prev e2
           |     WHERE e2.sym = substr((SELECT pair FROM best$i), 2, 1)))""".stripMargin)
    }
    sb.toString()
  }
}
