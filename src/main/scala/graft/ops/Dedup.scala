package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines, exact through
  * approximate, each designed shuffle-minimal:
  *
  *  - exact: hash-groupBy on a content fingerprint — ONE shuffle on the
  *    md5 key; at 100 TB the 32-byte key (not the document) is what moves.
  *  - MinHash + LSH: shingle → k minhashes → band → bucket-join. The
  *    self-join happens only WITHIN band buckets, so candidate generation
  *    is |bucket|² per bucket, never |corpus|².
  *  - SimHash: 64-bit signed-projection signature; near-dups share most
  *    bits, candidates via band-of-bits buckets.
  *  - n-gram Jaccard: inverted-index join on shingles (explode + groupBy),
  *    exact similarity on the candidate pairs only.
  *
  * MinHash here uses md5-derived hashes so the DuckDB oracle can recompute
  * signatures byte-identically; SimHash uses xxhash64 (Spark-native,
  * faster, oracle gets a rows-level check only).
  */
object Dedup {

  /** Exact dedup: keep the lowest `idCol` per fingerprint of `textCol`.
    * One wide shuffle on the fingerprint; partial min is map-side. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(TextOps.fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature column: for seeds 0..k-1, element s of the result
    * is min over shingles of md5(shingle || '#' || s). String min over
    * fixed-width hex = uniform hash min. Oracle-recomputable. */
  def minhashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map { s =>
      array_min(transform(shingles, sh => md5(concat(sh, lit("#" + s)))))
    }: _*)

  /** LSH banding: (doc, band_id, band_key) rows; docs sharing any
    * (band_id, band_key) are candidates. bandsRows = rows per band. */
  def lshBands(sig: Column, k: Int, rowsPerBand: Int): Column = {
    val nBands = k / rowsPerBand
    array((0 until nBands).map { b =>
      struct(
        lit(b).as("band_id"),
        concat_ws("|", (0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r + 1)): _*)
          .as("band_key"))
    }: _*)
  }

  /** MinHash-LSH near-dup candidate pairs (a < b) over word shingles. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val sig = df.select(
      col(idCol).as("id"),
      minhashSignature(TextOps.wordShingles(col(textCol), shingleN), k).as("sig"))
    val banded = sig.select(col("id"), explode(lshBands(col("sig"), k, rowsPerBand)).as("band"))
      .select(col("id"), col("band.band_id"), col("band.band_key"))
    banded.as("a").join(banded.as("b"),
        col("a.band_id") === col("b.band_id") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** SimHash 64-bit signature: sign of the per-bit sum of ±1 votes from
    * each word's xxhash64. Pure column expressions (no UDF). */
  def simhash(textCol: Column): Column = {
    val ws = TextOps.words(textCol)
    val hashes = transform(ws, w => xxhash64(w))
    val bits = sequence(lit(0), lit(63))
    val bitVotes = transform(bits, b =>
      aggregate(hashes, lit(0L),
        (acc, h) => acc +
          (call_function("shiftright", h, b.cast(IntegerType)).bitwiseAND(lit(1L)) * lit(2L) - lit(1L))))
    // pack sign bits into one BIGINT
    aggregate(
      zip_with(bits, bitVotes, (b, v) =>
        when(v > 0, call_function("shiftleft", lit(1L), b.cast(IntegerType))).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-dup candidates: split the 64-bit signature into 4
    * 16-bit bands; docs sharing any band are candidates; verify by
    * Hamming distance <= maxHamming. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 8): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val banded = sigs.select(col("id"), col("sig"), explode(array((0 until 4).map { b =>
      struct(lit(b).as("band_id"),
        shiftright(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL)).as("band_key"))
    }: _*)).as("band"))
      .select(col("id"), col("sig"), col("band.band_id"), col("band.band_key"))
    val hamming = bit_count(col("a.sig").bitwiseXOR(col("b.sig")))
    banded.as("a").join(banded.as("b"),
        col("a.band_id") === col("b.band_id") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.id") < col("b.id"))
      .filter(hamming <= maxHamming)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming.cast(IntegerType).as("hamming"))
      .distinct()
  }

  /** Exact n-gram Jaccard over candidate pairs from an inverted shingle
    * index: explode distinct shingles, join on shingle (the inverted
    * index), count shared per pair, then Jaccard from per-doc counts.
    * Only pairs sharing >= 1 shingle are ever materialized. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      TextOps.wordShingles(col(textCol), shingleN).as("shingles"))
    val counts = sh.select(col("id"), size(col("shingles")).as("n_sh"))
    val inv = sh.select(col("id"), explode(col("shingles")).as("sh"))
    val shared = inv.as("a").join(inv.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    val ratio = DecimalType(18, 6)
    shared
      .join(counts.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(counts.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        (col("n_shared").cast(ratio) / (col("n_a") + col("n_b") - col("n_shared")).cast(ratio)).cast(ratio))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
