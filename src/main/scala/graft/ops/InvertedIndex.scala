package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted text index: posting lists as a TERM-BUCKETED
  * table, so term lookups never scan the corpus — the retrieval-side
  * complement of the scan-side text operators in [[TextOps]].
  *
  * Scale shape. The index is rows of (term, doc_id, tf [, positions]),
  * written once as a bucketed+sorted table keyed by `term`
  * ([[graft.sources.TableIO.replaceBucketed]]). A query then:
  *  1. filters `term IN (query terms)` — Spark prunes to the buckets
  *     the terms hash into (`SelectedBucketsCount` in the scan, pinned
  *     by InvertedIndexSpec), so a k-term query against a 100 TB corpus
  *     reads k posting lists, not the corpus and not even the whole
  *     index;
  *  2. intersects/ranks the posting rows — a groupBy over the MATCHED
  *     postings only (vocabulary-Zipf makes these tiny next to the
  *     data; a stop-word query degrades gracefully to the longest
  *     list's size, never the corpus').
  * The corpus text is touched only at build time. Build is one
  * explode + groupBy over the documents — the same one-shuffle shape
  * as the word-count family.
  *
  * The positional variant stores each term's occurrence positions
  * (sorted word offsets) per document, enabling PHRASE search as an
  * adjacency check between two posting lists — `positions(t1)+1 ∩
  * positions(t2) ≠ ∅` via `arrays_overlap(transform(p1, +1), p2)` —
  * with no text re-scan and no regex fallback.
  */
object InvertedIndex {

  /** Posting rows (term, doc_id, tf) over normalized whitespace tokens
    * ([[TextOps.normalize]] — the corpus-wide canonical form). */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(TextOps.words(col(textCol))).as("term"))
      .filter(length(col("term")) >= 1)
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** Positional posting rows (term, doc_id, tf, positions): `positions`
    * is the sorted 0-based word offsets of the term in the document.
    * posexplode keeps the offset with the token — no second pass. */
  def positionalPostings(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(TextOps.words(col(textCol))).as(Seq("pos", "term")))
      .filter(length(col("term")) >= 1)
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))

  /** Build and persist the index as a bucketed external table keyed by
    * `term` (sorted within buckets, so posting lists are contiguous
    * runs inside each bucket file). */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String,
      table: String, path: String, buckets: Int,
      positional: Boolean = false): Unit = {
    val p =
      if (positional) positionalPostings(docs, idCol, textCol)
      else postings(docs, idCol, textCol)
    graft.sources.TableIO.replaceBucketed(
      p, table, Seq("term"), buckets, Some(path))
  }

  /** Conjunctive (AND) search against a built index: documents
    * containing ALL `terms`, ranked by summed term frequency
    * (score desc, doc_id asc), top `k`. Reads only the query terms'
    * posting lists (bucket-pruned scan + tiny groupBy). */
  def searchAll(spark: SparkSession, table: String, terms: Seq[String],
      k: Int): DataFrame = {
    val ts = terms.distinct
    require(ts.nonEmpty, "searchAll needs at least one term")
    spark.table(table)
      .filter(col("term").isin(ts: _*))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("score"))
      .filter(col("n_terms") === ts.size) // postings are per-(term,doc) unique
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** PHRASE search `"first second"` against a POSITIONAL index: the
    * documents where `second` occurs at `position(first) + 1`, with the
    * number of phrase occurrences. Two bucket-pruned posting-list reads
    * and one doc-keyed join — both sides already hash-partitioned by
    * the bucketing; the adjacency test is a codegen'd array intersect
    * on the two position lists, no text access. */
  def searchPhrase(spark: SparkSession, table: String, first: String,
      second: String): DataFrame = {
    val a = spark.table(table).filter(col("term") === first)
      .select(col("doc_id"), col("positions").as("p1"))
    val b = spark.table(table).filter(col("term") === second)
      .select(col("doc_id"), col("positions").as("p2"))
    a.join(b, Seq("doc_id"))
      .select(col("doc_id"),
        size(array_intersect(
          transform(col("p1"), x => x + lit(1)), col("p2"))).as("n_phrase"))
      .filter(col("n_phrase") > 0)
      .orderBy(col("doc_id"))
  }
}
