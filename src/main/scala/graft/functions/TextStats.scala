package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All per-document text statistics in ONE codegen'd code-point walk:
  * `[n_chars, n_words, norm_len, n_punct, n_digit, sw_de, sw_en, sw_es,
  * sw_fr]` — replacing the quality/langid regex battery (two
  * regexp_replace passes for normalize, two charClassCount passes, four
  * anchored regexp_count passes = 8 string scans per row) with a single
  * scan. Semantics replicate the regex formulation exactly:
  *
  *  - n_chars = code-point count (Spark `length`);
  *  - normalize = trim(collapse(replace(lower(text), [^a-z0-9 ] → ' '))):
  *    token characters are ASCII `[a-z0-9]` with `A-Z` lowered; every
  *    other code point is a separator. n_words = token count, norm_len =
  *    Σ token length + (n_words − 1);
  *  - n_punct = code points outside `[a-zA-Z0-9\s]` (`\s` = the 6 Java
  *    regex whitespace chars); n_digit = `[0-9]` count;
  *  - sw_* = occurrence counts of each language's stopword list as whole
  *    tokens (the `(?<= )(w1|…)(?= )` regexp_count semantics: repeats
  *    count, containing tokens don't).
  *
  * Boundary (documented divergence): Spark `lower()` maps U+0130 (İ) and
  * U+212A (K, the Kelvin sign) into sequences containing ASCII letters;
  * this kernel treats ALL non-ASCII code points as separators. Every
  * other code point behaves identically (non-ASCII letters lowercase to
  * non-ASCII, which the `[^a-z0-9 ]` class maps to a separator anyway).
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"text_stats requires a string input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "text_stats"

  override def nullSafeEval(input: Any): Any =
    TextStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  // alphabetical language order (the langId tie-break order)
  private val langs: Array[Array[String]] = Array(
    Array("der", "die", "das", "und", "ist", "nicht", "mit", "ein"), // de
    Array("the", "and", "of", "to", "in", "is", "that", "for"),      // en
    Array("el", "la", "de", "que", "los", "las", "una", "por"),      // es
    Array("le", "la", "les", "des", "est", "dans", "pour", "que"))   // fr
  private val maxStopLen = 5 // "nicht"

  def stats(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = new Array[Long](9)
    val tok = new Array[Char](maxStopLen)
    var tokLen = 0          // chars captured (valid while <= maxStopLen)
    var tokTotal = 0        // true token length
    var nWords = 0L
    var normLen = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      out(0) += 1 // n_chars (code points)
      val lowered =
        if (cp >= 'A' && cp <= 'Z') cp + 32
        else cp
      val isTokenChar =
        (lowered >= 'a' && lowered <= 'z') || (lowered >= '0' && lowered <= '9')
      if (cp >= '0' && cp <= '9') out(4) += 1 // n_digit
      if (!isTokenChar && cp != ' ' && cp != '\t' && cp != '\n' &&
          cp != 0x0B && cp != '\f' && cp != '\r') out(3) += 1 // n_punct
      if (isTokenChar) {
        if (tokLen < maxStopLen) { tok(tokLen) = lowered.toChar; tokLen += 1 }
        tokTotal += 1
      } else if (tokTotal > 0) {
        endToken(tok, tokLen, tokTotal, out)
        nWords += 1; normLen += tokTotal
        tokLen = 0; tokTotal = 0
      }
    }
    if (tokTotal > 0) {
      endToken(tok, tokLen, tokTotal, out)
      nWords += 1; normLen += tokTotal
    }
    out(1) = nWords
    out(2) = if (nWords > 0) normLen + nWords - 1 else 0L
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  private def endToken(tok: Array[Char], tokLen: Int, tokTotal: Int,
      out: Array[Long]): Unit = {
    if (tokTotal <= maxStopLen && tokLen == tokTotal) {
      var l = 0
      while (l < 4) {
        val words = langs(l)
        var w = 0
        var hit = false
        while (w < words.length && !hit) {
          val word = words(w)
          if (word.length == tokTotal) {
            var c = 0
            var eq = true
            while (c < tokTotal && eq) { eq = word.charAt(c) == tok(c); c += 1 }
            hit = eq
          }
          w += 1
        }
        if (hit) out(5 + l) += 1
        l += 1
      }
    }
  }
}
