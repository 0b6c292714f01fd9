package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Unicode normalization invariants beyond the oracle gates: the
  * codegen'd NFC expression, the column/JVM-twin equivalence the typed
  * narrow passes rest on, and the combining-mark composition the
  * `\p{L}` class silently breaks without NFC. */
class UnicodeSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "the Quick BROWN fox 42",
    "Привет МИР данные Поток БЫСТРО",
    "καλημέρα κόσμος δεδομένα γρήγορα",
    "مرحبا بالعالم بيانات سريعة ٤٢",
    "数据 处理 管道 大规模 分析",
    "데이터 파이프라인 대규모 처리",
    "café résumé naïve Über grün", // decomposed
    "café résumé naïve Über grün", // composed
    "", "   ", "á́b") // stacked marks

  test("nfc: decomposed sequences compose; composed text round-trips unchanged") {
    val df = samples.zipWithIndex.map(_.swap).toDF("id", "t")
    val got = df.select(col("id"), graft.functions.nfc(col("t")).as("n"))
      .orderBy("id").collect().map(_.getString(1))
    assert(got(6) === got(7), "decomposed and composed must NFC to the same string")
    assert(got(7) === samples(7), "already-NFC input must round-trip byte-identical")
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(got(i) === java.text.Normalizer.normalize(s,
        java.text.Normalizer.Form.NFC))
    }
  }

  test("normalizeUnicode column == normalizeUnicodeString twin on every sample") {
    val df = samples.zipWithIndex.map(_.swap).toDF("id", "t")
    val got = df.select(col("id"),
        TextOps.normalizeUnicode(col("t")).as("n"))
      .orderBy("id").collect().map(_.getString(1))
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(got(i) === TextOps.normalizeUnicodeString(s),
        s"twin divergence on sample $i")
    }
    // null column behaves like the twin's null guard
    val nullRow = Seq((0, null: String)).toDF("id", "t")
      .select(TextOps.normalizeUnicode(col("t"))).collect()(0)
    assert(nullRow.isNullAt(0)) // column is null-propagating; twin guards
  }

  test("normalizeUnicode keeps every script's letters and digits, strips marks/punct") {
    val one = Seq((1L, "Привет, мир! 数据×42 — naïve ٤٢"))
      .toDF("id", "t")
      .select(TextOps.normalizeUnicode(col("t"))).collect()(0).getString(0)
    assert(one === "привет мир 数据 42 naïve ٤٢")
  }

  test("ASCII normalize and unicode normalize agree on pure-ASCII text") {
    val df = Seq((1L, "The QUICK   brown-fox, 42!")).toDF("id", "t")
    val r = df.select(TextOps.normalize(col("t")).as("a"),
      TextOps.normalizeUnicode(col("t")).as("u")).collect()(0)
    assert(r.getString(0) === r.getString(1))
  }
}
