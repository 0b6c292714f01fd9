package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video as opaque `binary`
  * payloads with typed metadata, processed per-partition in batches.
  *
  * The Spark-side architecture is real and tested: schema contracts,
  * partition-sized batching via `mapPartitions` over a typed Dataset
  * (the JVM analogue of arrow-batched Python UDFs), and a feature schema
  * downstream operators (similarity, dedup) consume directly.
  *
  * IMAGE decode/resize are REAL as of round 5: [[decodeImages]] and
  * [[resizeImages]] parse actual PNG/BMP containers through the JDK's
  * built-in `javax.imageio` (no external codec dependency) inside the
  * same mapPartitions boundary, and the synthetic corpus
  * ([[imageCorpus]]) has closed-form pixel values so a codec-less SQL
  * oracle verifies the decoded numbers end-to-end.
  *
  * ==STUB== Only the VIDEO path (frame seeking in [[frameSampleStub]])
  * and the generic any-modality feature fake ([[decodeStub]], kept for
  * the audio/video rows of `mm_decode_stub`) remain deterministic
  * stand-ins: the JDK ships no video/audio codec. Swapping in a real
  * one changes ONLY those bodies — the plumbing (schema, batching,
  * partitioning) is shared with the real image path.
  */
object Multimodal {

  /** Canonical multimodal record schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = true))), nullable = true)))

  /** Build a multimodal table from the documents table: payload = utf-8
    * bytes of text (a stand-in binary column with realistic sizes). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("modality"),
      col("text").cast(BinaryType).as("payload"),
      struct(col("source").as("source"), length(col("text")).cast(LongType).as("n_bytes")).as("meta"))

  /** Decoded-feature schema: what a real decoder would emit.
    * `content_hash` is the md5 hex digest of the payload — engine-shared,
    * so the DuckDB oracle recomputes it (an xxhash/FNV long would be
    * Spark-only and unverifiable). */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("content_hash", StringType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** ==STUB== deterministic fake decode: real decode would call an image/
    * audio codec here. Features are derived from payload bytes so tests
    * are reproducible. Called once per row, but always inside one
    * partition's iterator — a real codec (like the digest here) is opened
    * once per partition in [[decodeFeatures]] and fed rows (or row
    * batches) from that iterator. */
  private[ops] def decodeStub(mediaId: Long, modality: String, payload: Array[Byte],
      dim: Int, digest: java.security.MessageDigest): Row = {
    val bytes = if (payload == null) Array.emptyByteArray else payload
    digest.reset()
    val contentHash = digest.digest(bytes).map("%02x".format(_)).mkString
    var h = 1125899906842597L // FNV-ish rolling hash seeds the fake features
    var i = 0
    while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
    val feature = new Array[Float](dim)
    var d = 0
    var g = h
    while (d < dim) {
      g = g * 6364136223846793005L + 1442695040888963407L // splitmix-ish
      feature(d) = ((g >>> 16).toInt % 1000) / 1000.0f
      d += 1
    }
    Row(mediaId, modality, bytes.length.toLong, contentHash, feature.toSeq)
  }

  /** ==STUB== "resize": a real implementation decodes, resamples to
    * (w, h), and re-encodes. The stub keeps the contract — payload is
    * replaced by a deterministic transformation whose size scales with
    * the target dims — so downstream schema/size accounting is real. */
  def resizeStub(media: DataFrame, w: Int, h: Int): DataFrame = {
    val target = w.toLong * h / 64 // fake bytes-per-pixel-block
    media.withColumn("payload",
      expr(s"substring(payload, 1, greatest(least(length(payload), $target), 1))"))
      .withColumn("meta", struct(
        col("meta.source").as("source"),
        length(col("payload")).cast(LongType).as("n_bytes")))
  }

  /** ==STUB== "frame sampling": one row per sampled frame. A real
    * implementation seeks the container and decodes every Nth frame;
    * the stub emits `nFrames` deterministic payload slices. The row
    * explosion, frame indexing, and per-frame metadata are the real
    * plumbing downstream operators consume. */
  def frameSampleStub(media: DataFrame, nFrames: Int): DataFrame = {
    val frames = sequence(lit(0), lit(nFrames - 1))
    media.filter(col("modality") === "video")
      .select(col("media_id"), explode(frames).as("frame_no"), col("payload"))
      .withColumn("frame_payload",
        expr("substring(payload, 1 + frame_no * 16, 16)"))
      .select(col("media_id"), col("frame_no"),
        col("frame_payload").as("payload"),
        length(col("frame_payload")).cast(LongType).as("n_bytes"))
  }

  /** ==STUB==-adjacent content-hash features: `dim` (≤ 16) byte values
    * of md5(payload) as a float vector. NOT a learned embedding — a real
    * pipeline swaps in a vision/audio encoder at the same boundary — but
    * unlike [[decodeFeatures]]'s rolling-hash fake these features are
    * md5-derived, so a DuckDB oracle regenerates them exactly and the
    * WHOLE opaque-payload → feature → similarity-search composition is
    * value-level verifiable (see the `mm_similarity` query). Narrow
    * (per-row expressions, payloads never shuffle). */
  def hashFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    require(dim >= 1 && dim <= 16, "md5 yields 16 feature bytes")
    val hex = md5(col("payload"))
    val bytes = (0 until dim).map { d =>
      conv(substring(hex, 2 * d + 1, 2), 16, 10).cast("float")
    }
    media.select(col("media_id"), col("modality"),
      array(bytes: _*).as("feature"))
  }

  // ---- REAL image path (JDK javax.imageio — PNG + BMP) ----

  /** Deterministic synthetic image for `media_id = id`: dims
    * `(8 + id%8) x (8 + id%5)`, pixel (x, y) channels
    * r = (id·31 + x·7 + y·13) mod 256, g = (id·17 + x·11 + y·3) mod 256,
    * b = (id·13 + x·5 + y·19) mod 256. Closed-form pixels mean an
    * engine-neutral oracle recomputes every decoded value WITHOUT a
    * codec — so the PNG/BMP encode→decode round trip is value-gated,
    * not just byte-counted. */
  private[graft] def synthImage(id: Long): java.awt.image.BufferedImage = {
    require(id >= 0, s"synthImage needs a non-negative id, got $id")
    val w = (8 + id % 8).toInt
    val h = (8 + id % 5).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id * 17 + x * 11 + y * 3) % 256).toInt
        val b = ((id * 13 + x * 5 + y * 19) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  private[graft] def encodeImage(img: java.awt.image.BufferedImage,
      fmt: String): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, fmt, baos)
    require(ok, s"no ImageIO writer for format '$fmt'")
    baos.toByteArray
  }

  private def pixelSum(img: java.awt.image.BufferedImage): Long = {
    var s = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        s += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
        x += 1
      }
      y += 1
    }
    s
  }

  /** Image corpus with REAL encoded payloads: PNG for even ids, BMP for
    * odd (both lossless 24-bit, both decoders ship in the JDK). Encoding
    * runs per-partition like every codec stage here; the payload column
    * is genuine container bytes, not a text stand-in. */
  def imageCorpus(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("fmt", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    docs.select(col("doc_id").cast(LongType).as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val fmt = if (id % 2 == 0) "png" else "bmp"
          Row(id, fmt, encodeImage(synthImage(id), fmt))
        }
      }(enc)
  }

  /** REAL image decode: `javax.imageio.ImageIO.read` parses the PNG/BMP
    * container and the reported width/height/pixel_sum come from the
    * decoded raster — any codec bug breaks the oracle's closed-form
    * numbers. Same scale shape as [[decodeFeatures]]: per-partition
    * batches, payloads never shuffle. */
  def decodeImages(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("fmt", StringType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("pixel_sum", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.select(col("media_id"), col("fmt"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.get(2).asInstanceOf[Array[Byte]]
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"payload for media_id=${r.getLong(0)} is not a decodable image")
          Row(r.getLong(0), r.getString(1), img.getWidth.toLong,
            img.getHeight.toLong, pixelSum(img), bytes.length.toLong)
        }
      }(enc)
  }

  /** REAL resize: decode, nearest-neighbor resample to (w, h) with
    * `sx = x·srcW div w` / `sy = y·srcH div h` (exact integer sampling —
    * no interpolation, so the resample is engine-reproducible), then
    * re-encode as PNG. Output pixel_sum/dims describe the RESIZED
    * raster; the payload is the re-encoded container (round-trip pinned
    * in the spec — PNG is lossless, so payload re-decodes to the same
    * pixels). */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    require(w >= 1 && h >= 1, "target dims must be positive")
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("pixel_sum", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.get(1).asInstanceOf[Array[Byte]]
          val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(src != null, s"payload for media_id=${r.getLong(0)} is not a decodable image")
          val dst = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            val sy = y * src.getHeight / h
            var x = 0
            while (x < w) {
              dst.setRGB(x, y, src.getRGB(x * src.getWidth / w, sy) & 0xFFFFFF)
              x += 1
            }
            y += 1
          }
          val out = encodeImage(dst, "png")
          Row(r.getLong(0), w.toLong, h.toLong, pixelSum(dst),
            out.length.toLong, out)
        }
      }(enc)
  }

  /** Per-partition batched decode: the mapPartitions boundary is where a
    * real pipeline hands row batches to a native decoder. Partition count
    * governs decoder parallelism; payloads never shuffle. */
  def decodeFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select(col("media_id"), col("modality"), col("payload"))
      .mapPartitions { rows =>
        // batch shape: pull the whole partition iterator through one
        // decoder session (amortizes per-batch codec/digest setup)
        val digest = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          decodeStub(r.getLong(0), r.getString(1),
            r.get(2) match { case b: Array[Byte] => b; case _ => null }, dim, digest)
        }
      }(enc)
  }
}
