package graft.naming

import scala.collection.mutable

/** Pure column-name grammar over survey concept-ID names.
  *
  * The name grammar is `d_<9-digit CID>(_d_<CID>)*(_vN)?(_N_N)*` with
  * real-world impurities (loop suffixes, version tags in the middle,
  * legacy substrings). Semantics derived from the reference implementation
  * (`/root/reference/core/utils.py:91-373`); all behavior pinned by the
  * ported test vectors in `NamingSpec` (reference `test/test_utils.py`).
  *
  * Everything here is pure Scala over strings — no Spark, no I/O. This is
  * the planning layer: it decides which relational expression each column
  * receives before any job is launched.
  */
object Naming {

  private val CidPattern = "[dD]_(\\d{9})".r
  private val NonStandardCidPattern = "[dD]_(\\d+)(?=_|$)".r
  private val VersionPattern = "_[vV](\\d+)(?=_|$)".r
  private val VersionExcisePattern = "_[vV]\\d+(?=_|$)"
  private val LoopWithVersionPattern = "(?i)_v\\d+_(\\d+)_\\1(?!\\d)".r
  private val LoopPairPattern = "_(\\d+)_\\1(?!\\d)".r
  private val LoopPairLoosePattern = "_(\\d+)_\\1".r
  private val TrailingNumberPattern = "_(\\d+)$".r

  /** Ordered 9-digit concept IDs in a name; duplicates kept.
    * Ref: `core/utils.py:91-100`. */
  def extractOrderedConceptIds(name: String): List[String] =
    CidPattern.findAllMatchIn(name).map(_.group(1)).toList

  /** `(name, digits, length)` for every `d_<digits>` token whose digit run
    * is not exactly 9 long. Ref: `core/utils.py:102-120`. */
  def findNonStandardConceptIds(names: Seq[String]): Seq[(String, String, Int)] =
    for {
      col <- names
      m <- NonStandardCidPattern.findAllMatchIn(col).toSeq
      digits = m.group(1)
      if digits.length != 9
    } yield (col, digits, digits.length)

  /** Version suffix `_vN` found anywhere (case-insensitive), normalized to
    * lowercase, or "" when absent. Ref: `core/utils.py:184-201`. */
  def extractVersionSuffix(name: String): String =
    VersionPattern.findFirstMatchIn(name).map(m => s"_v${m.group(1)}").getOrElse("")

  /** Remove every `_vN` token wherever it appears. Ref: `core/utils.py:203-220`. */
  def exciseVersion(name: String): String =
    name.replaceAll(VersionExcisePattern, "")

  /** Loop index from `_N_N` pairs. Three cases, in priority order
    * (ref `core/utils.py:222-245`):
    *  1. version-interleaved `_vX_N_N`;
    *  2. first `_N_N` pair after version excision;
    *  3. trailing `_N` when some (loose) `_N_N` pair exists.
    */
  def extractLoopNumber(name: String): Option[Int] =
    LoopWithVersionPattern.findFirstMatchIn(name).map(_.group(1).toInt).orElse {
      val cleaned = exciseVersion(name)
      val pairs = LoopPairPattern.findAllMatchIn(cleaned).toList
      if (pairs.nonEmpty) Some(pairs.head.group(1).toInt)
      else if (LoopPairLoosePattern.findFirstIn(cleaned).isDefined)
        TrailingNumberPattern.findFirstMatchIn(cleaned).map(_.group(1).toInt)
      else None
    }

  /** Grouping key: unique CIDs (unordered), loop number, version suffix. */
  final case class LoopKey(cids: Set[String], loopNumber: Int, versionSuffix: String)

  /** Group loop variables by (CID set, loop number, version); names without
    * a loop number are excluded. Insertion order preserved (both for the
    * groups and within each group). Ref: `core/utils.py:247-275`. */
  def groupVarsByCidAndLoopNum(names: Seq[String]): Seq[(LoopKey, List[String])] = {
    val grouped = mutable.LinkedHashMap.empty[LoopKey, mutable.ListBuffer[String]]
    for (name <- names) {
      val versionSuffix = extractVersionSuffix(name)
      val cleaned = exciseVersion(name)
      val cids = extractOrderedConceptIds(cleaned).toSet
      extractLoopNumber(name) match {
        case Some(loop) if cids.nonEmpty =>
          grouped.getOrElseUpdate(LoopKey(cids, loop, versionSuffix), mutable.ListBuffer.empty) += name
        case _ => ()
      }
    }
    grouped.iterator.map { case (k, v) => (k, v.toList) }.toSeq
  }

  /** Remove each fixable substring (every occurrence, in list order).
    * Ref: `core/utils.py:352-358`. */
  def exciseSubstrings(name: String, substrings: Seq[String]): String =
    substrings.foldLeft(name)((acc, s) => acc.replace(s, ""))

  /** Lowercase everything except the literal identity column `Connect_ID`.
    * Ref: `core/utils.py:360-373`. */
  def standardizeCase(name: String): String =
    if (name == "Connect_ID") name else name.toLowerCase

  /** True when the name consists only of allowed tokens: `d`/`D`, digit
    * runs, `vN` version tags, or allow-listed words. Names on the allow
    * list pass outright; names on the forbidden list fail outright.
    * Ref: `core/utils.py:138-182`. */
  def isPureVariable(
      name: String,
      allowedNames: Set[String] = graft.config.Constants.AllowedNonCidVariableNamesLower,
      forbiddenNames: Set[String] = graft.config.Constants.ForbiddenNonCidVariableNamesLower,
      allowedSubstrings: Set[String] = graft.config.Constants.AllowedNonCidSubstringsLower
  ): Boolean = {
    val lower = name.toLowerCase
    if (allowedNames.contains(lower)) true
    else if (forbiddenNames.contains(lower)) false
    else name.split('_').forall { raw =>
      val t = raw.trim
      t.isEmpty ||
        t.equalsIgnoreCase("d") ||
        t.forall(_.isDigit) ||
        (t.length > 1 && (t.head == 'v' || t.head == 'V') && t.tail.forall(_.isDigit)) ||
        allowedSubstrings.contains(t.toLowerCase)
    }
  }

  /** Non-conforming fragments of each name after deleting `d_<cid>(_N)*`
    * runs. Implements the documented per-column behavior (the reference has
    * an indentation bug that reports only the last column,
    * `core/utils.py:277-303`; we implement the docstring's intent). */
  def listNonCidStrPatterns(names: Seq[String]): Seq[(String, String)] = {
    val pattern = "(?i)d_\\d{9}(?:_\\d{1,2})*"
    names.flatMap { name =>
      val cleaned = name.replaceAll(pattern, "").replaceAll("^_+|_+$", "").trim
      if (cleaned.nonEmpty && cleaned != "_" &&
          cleaned.toLowerCase != "connect_id" && cleaned.toLowerCase != "token")
        Some((cleaned, name))
      else None
    }
  }
}
