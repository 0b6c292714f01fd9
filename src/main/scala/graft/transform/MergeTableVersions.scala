package graft.transform

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.config.Constants

/** N-way merge of table versions on `Connect_ID`: the
  * `merge_table_versions` capability.
  *
  * Mirrors `merge_table_versions`
  * (`/root/reference/core/transformations.py:19-172`):
  *  - per-table column validity filtering (forbidden names + excluded
  *    substrings, `core/utils.py:305-350`);
  *  - case-insensitive common-column computation with case-maps back to
  *    each table's original spelling;
  *  - common columns coalesce in v1..vN order (earliest table wins),
  *    sorted by name; unique columns appended per table, sorted;
  *  - output names lowercased except `Connect_ID`;
  *  - FULL OUTER join chain on `Connect_ID`.
  *
  * Join semantics — two modes:
  *  - `strict = false` (default): the *fold* (left-to-right full-outer
  *    with coalesced key) — a `Connect_ID` present in v1 and v2 but
  *    absent from the last table merges into ONE row. The correct
  *    semantics; what `dfs.reduce(_.join(_, Seq("Connect_ID"),
  *    "full_outer"))` gives. Decision documented in SURVEY.md §2.C-1.
  *  - `strict = true`: the reference's LITERAL SQL shape
  *    (`core/transformations.py:126-136`) — every earlier version joins
  *    against the *base* (last) table's key, so a `Connect_ID` present
  *    in two non-base versions but absent from base yields one row per
  *    such version (their base-key join predicates are NULL ≠ NULL).
  *    For byte-for-byte replay of reference outputs.
  *
  * Scale: full-outer cannot broadcast (both sides must preserve unmatched
  * rows), so each join is a sort-merge with an exchange on `Connect_ID`.
  * All N-1 joins share the same key, so Catalyst reuses the partitioning
  * across the chain — one shuffle per input, not per join. At the 100 TB
  * north star, pre-bucketing every version table by `Connect_ID`
  * (`df.write.bucketBy(n, "Connect_ID")`) removes the exchanges entirely.
  */
object MergeTableVersions {

  /** Validity filter (B13/B14): drop forbidden names and columns containing
    * excluded substrings, preserving input order (the reference loses order
    * to a set, then re-sorts at emit; sorting at emit makes order moot). */
  def validColumns(columns: Seq[String]): Seq[String] = {
    val forbidden = Constants.ForbiddenNonCidVariableNamesLower
    val excluded = Constants.ExcludedNonCidSubstrings.map(_.toLowerCase)
    columns.filter { c =>
      val lower = c.toLowerCase
      !forbidden.contains(lower) && !excluded.exists(lower.contains)
    }
  }

  def apply(dfs: Seq[DataFrame]): DataFrame = apply(dfs, strict = false)

  def apply(dfs: Seq[DataFrame], strict: Boolean): DataFrame = {
    require(dfs.size >= 2, "at least two source tables must be provided")
    val aliases = dfs.indices.map(i => s"v${i + 1}")
    val valid = dfs.map(df => validColumns(df.schema.fieldNames.toSeq))
    valid.zipWithIndex.foreach { case (cols, i) =>
      require(cols.exists(_.equalsIgnoreCase("connect_id")),
        s"source table ${i + 1} has no Connect_ID column")
    }
    val caseMaps = valid.map(cols => cols.map(c => c.toLowerCase -> c).toMap)
    val commonLower = caseMaps.map(_.keySet).reduce(_ intersect _)

    // SELECT clauses: coalesced common columns first (sorted), then unique
    // columns per table (sorted). Ref: core/transformations.py:86-124.
    val processed = mutable.Set.empty[String]
    val clauses = mutable.ListBuffer.empty[Column]
    for (cl <- commonLower.toSeq.sorted) {
      val out = if (cl == "connect_id") "Connect_ID" else cl
      val parts = aliases.zip(caseMaps).map { case (a, m) => col(s"$a.${m(cl)}") }
      clauses += coalesce(parts: _*).as(out)
      processed += cl
    }
    for ((a, cols) <- aliases.zip(valid)) {
      val unique = cols.filterNot(c => processed.contains(c.toLowerCase))
      for (c <- unique.sorted) {
        val out = if (c == "Connect_ID") "Connect_ID" else c.toLowerCase
        clauses += col(s"$a.$c").as(out)
        processed += c.toLowerCase
      }
    }

    val aliased = dfs.zip(valid).zip(aliases).map { case ((df, cols), a) =>
      df.select(cols.map(col): _*).alias(a)
    }
    val keyOf = aliases.zip(caseMaps).map { case (a, m) => col(s"$a.${m("connect_id")}") }
    val joined =
      if (strict) {
        // Reference-literal chain: FROM base (last) FULL OUTER JOIN each
        // earlier table ON base.Connect_ID = vi.Connect_ID, reversed
        // order (core/transformations.py:126-136). Base-absent keys do
        // NOT merge across versions.
        var j = aliased.last
        for (i <- aliased.size - 2 to 0 by -1) {
          j = j.join(aliased(i), keyOf.last === keyOf(i), "full_outer")
        }
        j
      } else {
        // Fold full-outer join chain with coalesced key (SURVEY §2.C-1).
        var j = aliased.head
        for (i <- 1 until aliased.size) {
          val key = if (i == 1) keyOf.head else coalesce(keyOf.take(i): _*)
          j = j.join(aliased(i), key === keyOf(i), "full_outer")
        }
        j
      }
    joined.select(clauses.toSeq: _*)
  }
}
