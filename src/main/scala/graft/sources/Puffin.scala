package graft.sources

import java.util.zip.CRC32

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}

/** The PUBLIC Apache Puffin file format (the Iceberg project's
  * stats/blob sidecar spec) — the container format-v3 stores DELETION
  * VECTORS in, read and written here with nothing but Jackson (already
  * on Spark's classpath) so [[IcebergCompat]] can apply v3 row-level
  * deletes without an Iceberg library.
  *
  * Layout replayed from the open spec:
  *  - file: `Magic Blob₁ … Blobₙ Footer`, magic = the 4 bytes `PFA1`;
  *  - footer: `Magic FooterPayload FooterPayloadSize Flags Magic` —
  *    payload is UTF-8 JSON (`{"blobs":[…],"properties":{…}}`),
  *    size is a 4-byte little-endian int, flags are 4 bytes with byte
  *    0 / bit 0 meaning lz4-compressed payload (refused here: this
  *    codec writes uncompressed and says so loudly when reading);
  *  - a `deletion-vector-v1` blob: a 4-byte BIG-endian length of the
  *    magic-plus-vector bytes, the 4 magic bytes `D1 D3 39 64`, the
  *    vector in the 64-bit roaring-bitmap portable serialization, and
  *    a 4-byte BIG-endian CRC-32 of the magic-plus-vector bytes. The
  *    magic bytes ARE the little-endian int `1681511377` — v3 adopted
  *    Delta's DV serialization verbatim, so [[DeletionVectors]]'
  *    `serialize`/`deserialize` (whose output starts with that magic)
  *    is reused as-is; blob `offset`/`length` in the footer and the
  *    manifest's `content_offset`/`content_size_in_bytes` both frame
  *    the whole length+magic+vector+CRC span.
  *
  * Scale posture: one DV is bounded by the rows of ONE data file, so a
  * blob is KB–MB of driver-side metadata; the data plane only ever
  * sees the resulting (file, row_index) anti-join. */
object Puffin {

  private val Magic = Array[Byte]('P', 'F', 'A', '1')

  private val mapper = new ObjectMapper()

  /** One deletion-vector-v1 blob's coordinates: where it lives in the
    * puffin file and which data file its positions address. */
  final case class DvBlob(referencedDataFile: String, offset: Long,
      length: Long, cardinality: Long)

  /** Write one Puffin file holding a `deletion-vector-v1` blob per
    * `(referenced data file, deleted positions)` pair — the writer
    * side of v3's one-DV-per-data-file rule — returning each blob's
    * coordinates for the manifest's `content_offset` /
    * `content_size_in_bytes` fields. */
  def writeDvFile(fs: FileSystem, path: Path,
      dvs: Seq[(String, Array[Long])]): Seq[DvBlob] = {
    require(dvs.nonEmpty, "a Puffin DV file needs at least one blob")
    require(dvs.map(_._1).distinct.size == dvs.size,
      "at most one deletion vector per data file (v3 rule)")
    val out = fs.create(path, true)
    try {
      out.write(Magic)
      var pos = 4L
      val blobs = dvs.map { case (target, positions) =>
        val data = DeletionVectors.serialize(positions) // magic + vector
        val crc = new CRC32(); crc.update(data)
        val off = pos
        out.writeInt(data.length) // big-endian
        out.write(data)
        out.writeInt(crc.getValue.toInt) // big-endian
        pos += 4L + data.length + 4L
        DvBlob(target, off, 4L + data.length + 4L,
          positions.distinct.length.toLong)
      }
      val blobJson = blobs.map { b =>
        s"""{"type":"deletion-vector-v1","fields":[],"snapshot-id":0,""" +
          s""""sequence-number":0,"offset":${b.offset},"length":${b.length},""" +
          s""""properties":{"referenced-data-file":"${b.referencedDataFile}",""" +
          s""""cardinality":"${b.cardinality}"}}"""
      }.mkString("[", ",", "]")
      val payload =
        s"""{"blobs":$blobJson,"properties":{"created-by":"graft"}}"""
          .getBytes("UTF-8")
      out.write(Magic)
      out.write(payload)
      // footer payload size: 4-byte LITTLE-endian (the one LE field)
      out.write(payload.length & 0xff)
      out.write((payload.length >> 8) & 0xff)
      out.write((payload.length >> 16) & 0xff)
      out.write((payload.length >> 24) & 0xff)
      out.write(Array[Byte](0, 0, 0, 0)) // flags: uncompressed payload
      out.write(Magic)
      blobs
    } finally out.close()
  }

  /** Read one `deletion-vector-v1` blob at `(offset, length)` — file
    * magic, declared length, and CRC all verified — returning the
    * deleted row positions ascending. */
  def readDvBlob(fs: FileSystem, path: Path, offset: Long,
      length: Long): Array[Long] = {
    val in = fs.open(path)
    try {
      val m = new Array[Byte](4)
      in.readFully(0, m)
      require(java.util.Arrays.equals(m, Magic),
        s"$path is not a Puffin file (bad magic)")
      in.seek(offset)
      val dataSize = in.readInt() // big-endian
      require(dataSize + 8L == length,
        s"DV blob at $path#$offset declares $dataSize vector bytes but " +
          s"the manifest frames $length total (want ${dataSize + 8})")
      val data = new Array[Byte](dataSize)
      in.readFully(data)
      val expected = in.readInt()
      val crc = new CRC32(); crc.update(data)
      require(crc.getValue.toInt == expected,
        s"DV checksum mismatch at $path#$offset")
      DeletionVectors.deserialize(data) // verifies the D1 D3 39 64 magic
    } finally in.close()
  }

  /** List the footer's `deletion-vector-v1` blobs — the fallback
    * coordinate source for puffin files whose manifests lost their
    * offsets, and the round-trip check for this codec's own writes. */
  def listDvBlobs(fs: FileSystem, path: Path): Seq[DvBlob] = {
    val len = fs.getFileStatus(path).getLen
    require(len >= 20, s"$path too short to be a Puffin file")
    val in = fs.open(path)
    try {
      val head = new Array[Byte](4)
      in.readFully(0, head)
      require(java.util.Arrays.equals(head, Magic),
        s"$path is not a Puffin file (bad magic)")
      val tail = new Array[Byte](12) // size(4) + flags(4) + magic(4)
      in.readFully(len - 12, tail)
      require(java.util.Arrays.equals(tail.takeRight(4), Magic),
        s"$path is not a Puffin file (bad trailing magic)")
      require((tail(4) & 1) == 0,
        s"$path has an lz4-compressed footer payload — out of scope " +
          "for this codec")
      val size = (tail(0) & 0xff) | ((tail(1) & 0xff) << 8) |
        ((tail(2) & 0xff) << 16) | ((tail(3) & 0xff) << 24)
      require(size >= 0 && size <= len - 20, s"bad footer size $size in $path")
      val payload = new Array[Byte](size)
      in.readFully(len - 12 - size, payload)
      val root = mapper.readTree(payload)
      val blobs = root.path("blobs")
      require(blobs.isArray, s"no blobs array in $path footer")
      import scala.jdk.CollectionConverters._
      blobs.elements().asScala.toSeq
        .filter(_.path("type").asText("") == "deletion-vector-v1")
        .map { b =>
          val props = b.path("properties")
          DvBlob(
            props.path("referenced-data-file").asText(""),
            b.path("offset").asLong(-1L),
            b.path("length").asLong(-1L),
            props.path("cardinality").asText("0").toLong)
        }
    } finally in.close()
  }
}
