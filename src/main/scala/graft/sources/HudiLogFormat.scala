package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The PUBLIC Apache Hudi LOG-FILE block format (the open
  * `HoodieLogFormat` spec: merge-on-read tables append row changes as
  * framed blocks to `.<fileId>_<baseInstant>.log.<version>_<token>`
  * files instead of rewriting parquet). Both directions, no Hudi
  * library: the reader lets [[HudiCompat]] merge MOR file slices
  * written elsewhere; the writer produces spec-shaped fixtures.
  *
  * Block framing replayed here (one block per append):
  *  - magic `#HUDI#` (6 bytes);
  *  - block size (8-byte big-endian: everything after this field);
  *  - log-format version (4 bytes, 1);
  *  - block type (4 bytes: the public HoodieLogBlockType ordinal —
  *    0 command, 1 delete, 2 corrupt, 3 avro-data, ...);
  *  - header map: 4-byte entry count, then per entry the public
  *    HeaderMetadataType ordinal (4 bytes: 0 INSTANT_TIME,
  *    1 TARGET_INSTANT_TIME, 2 SCHEMA, 3 COMMAND_BLOCK_TYPE), a 4-byte
  *    value length, UTF-8 bytes;
  *  - content length (8 bytes) + content;
  *  - footer map (same shape as the header);
  *  - total block length (8 bytes, for tail-first traversal).
  *
  * Avro-data block content: 4-byte format version, 4-byte record
  * count, then per record a 4-byte length + the binary-encoded Avro
  * record (schema = the block's SCHEMA header). Command blocks carry
  * rollback targets in headers and no content. DELETE blocks refuse
  * loudly (their key serialization is engine-internal); a MOR chain
  * with delete blocks needs a compaction first.
  *
  * Visibility is per BLOCK: each block's INSTANT_TIME header names the
  * deltacommit that wrote it, and only blocks of COMPLETED instants
  * are readable — a crashed writer leaves blocks whose instant never
  * completed, invisible exactly like an uncommitted base file.
  *
  * Scale posture: log files are DATA, not metadata — parsing runs in
  * executors ([[HudiCompat.readHoodieTable]] parallelizes over log
  * files); only schemas and instant sets ride the closure.
  */
object HudiLogFormat {

  val Magic: Array[Byte] = "#HUDI#".getBytes("UTF-8")

  // public HoodieLogBlockType ordinals
  val CommandBlock = 0
  val DeleteBlock = 1
  val AvroDataBlock = 3

  // public HeaderMetadataType ordinals
  val InstantTime = 0
  val TargetInstantTime = 1
  val SchemaKey = 2
  val CommandBlockType = 3

  // ---------------------------------------------------------------
  // Avro <-> Catalyst bridge (flat primitive schemas)
  // ---------------------------------------------------------------

  /** Catalyst type for a flat Avro field; nullable unions unwrap.
    * Nested records/arrays/maps refuse loudly — this reader's scope is
    * flat row-change logs, and half-reading a nested schema would
    * corrupt the merge. */
  private def catalystType(s: Schema): DataType = s.getType match {
    case Schema.Type.LONG => LongType
    case Schema.Type.INT => IntegerType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => BinaryType
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"non-nullable Avro union ${s} is out of scope for the MOR reader")
      catalystType(nonNull.head)
    case other => throw new IllegalArgumentException(
      s"Avro type $other in a Hudi log block is out of scope for this " +
        "compat reader (flat primitive schemas only) — compact the table")
  }

  def structOf(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD, s"not a record schema: $avro")
    StructType(avro.getFields.asScala.map(f =>
      StructField(f.name(), catalystType(f.schema()), nullable = true)).toSeq)
  }

  /** The Avro twin of a flat Catalyst schema (fixture writer side). */
  def avroOf(struct: StructType, name: String): Schema = {
    val fields = struct.fields.map { f =>
      val t = f.dataType match {
        case LongType => Schema.Type.LONG
        case IntegerType => Schema.Type.INT
        case DoubleType => Schema.Type.DOUBLE
        case FloatType => Schema.Type.FLOAT
        case BooleanType => Schema.Type.BOOLEAN
        case StringType => Schema.Type.STRING
        case BinaryType => Schema.Type.BYTES
        case other => throw new IllegalArgumentException(
          s"no flat Avro twin for Catalyst type $other")
      }
      new Schema.Field(f.name,
        Schema.createUnion(Schema.create(Schema.Type.NULL), Schema.create(t)),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft.hudi", false, fields.toList.asJava)
  }

  private def jvmValue(v: AnyRef, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: String, StringType) => s
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (x, _) => x
  }

  // ---------------------------------------------------------------
  // Block reader
  // ---------------------------------------------------------------

  private def readMap(in: DataInputStream): Map[Int, String] =
    (0 until in.readInt()).map { _ =>
      val k = in.readInt()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      k -> new String(b, "UTF-8")
    }.toMap

  /** One parsed block: type, headers, raw content. */
  final case class Block(blockType: Int, headers: Map[Int, String],
      content: Array[Byte])

  def readBlocks(conf: Configuration, path: String): Seq[Block] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val fileLen = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[Block]
      while (in.getPos < fileLen) {
        val magic = new Array[Byte](Magic.length)
        in.readFully(magic)
        require(magic.sameElements(Magic),
          s"bad log block magic at $path#${in.getPos - Magic.length}")
        val blockSize = in.readLong()
        val start = in.getPos
        val version = in.readInt()
        require(version == 1, s"unsupported log format version $version at $path")
        val blockType = in.readInt()
        val headers = readMap(in)
        val contentLen = in.readLong()
        require(contentLen >= 0 && contentLen <= blockSize,
          s"corrupt content length $contentLen at $path")
        val content = new Array[Byte](contentLen.toInt)
        in.readFully(content)
        readMap(in) // footer
        val total = in.readLong()
        require(in.getPos - start == blockSize && total == blockSize,
          s"log block framing mismatch at $path (declared $blockSize)")
        out += Block(blockType, headers, content)
      }
      out.toSeq
    } finally in.close()
  }

  /** Decode an avro-data block's records against `schemaJson` (the
    * TABLE schema — blocks written under an older compatible writer
    * schema decode through Avro's own resolution via their SCHEMA
    * header). Emits value arrays aligned to the table field order. */
  def decodeDataBlock(content: Array[Byte], tableSchemaJson: String,
      blockSchemaJson: String): Seq[Array[Any]] = {
    val writerSchema = new Schema.Parser().parse(blockSchemaJson)
    val readerSchema = new Schema.Parser().parse(tableSchemaJson)
    val struct = structOf(readerSchema)
    val in = new DataInputStream(new ByteArrayInputStream(content))
    in.readInt() // content format version
    val n = in.readInt()
    val reader = new GenericDatumReader[GenericRecord](writerSchema, readerSchema)
    (0 until n).map { _ =>
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      val rec = reader.read(null,
        DecoderFactory.get().binaryDecoder(bytes, null))
      struct.fields.map(f => jvmValue(rec.get(f.name), f.dataType))
    }
  }

  /** Parse one log file into (instant, blockIdx, recIdx, values) rows,
    * honoring block-level visibility (`completed`) and rollback command
    * blocks (a later command block voids this file's earlier blocks of
    * its target instant). Runs in executors. */
  def parseFile(conf: Configuration, path: String, completed: Set[String],
      tableSchemaJson: String): Seq[(String, Int, Int, Array[Any])] = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int, Array[Any])]
    readBlocks(conf, path).zipWithIndex.foreach { case (b, bi) =>
      b.blockType match {
        case AvroDataBlock =>
          val instant = b.headers.getOrElse(InstantTime,
            throw new IllegalArgumentException(s"data block without INSTANT_TIME at $path"))
          if (completed.contains(instant)) {
            val blockSchema = b.headers.getOrElse(SchemaKey,
              throw new IllegalArgumentException(s"data block without SCHEMA at $path"))
            decodeDataBlock(b.content, tableSchemaJson, blockSchema)
              .zipWithIndex.foreach { case (vals, ri) =>
                rows += ((instant, bi, ri, vals))
              }
          }
        case CommandBlock =>
          // rollback: void this file's earlier blocks of the target
          // instant (the reader-side half of Hudi's lazy rollback)
          b.headers.get(TargetInstantTime).foreach { target =>
            val kept = rows.filterNot(_._1 == target)
            rows.clear(); rows ++= kept
          }
        case DeleteBlock => throw new IllegalArgumentException(
          s"Hudi DELETE log block at $path — its key serialization is " +
            "engine-internal and out of this compat reader's scope; " +
            "compact the table before reading through this path")
        case other => throw new IllegalArgumentException(
          s"unsupported Hudi log block type $other at $path")
      }
    }
    rows.toSeq
  }

  /** The first data block's SCHEMA header — the table schema source for
    * log-only file groups (driver-side, reads one file's framing). */
  def firstSchema(conf: Configuration, path: String): Option[String] =
    readBlocks(conf, path).collectFirst {
      case b if b.blockType == AvroDataBlock && b.headers.contains(SchemaKey) =>
        b.headers(SchemaKey)
    }

  // ---------------------------------------------------------------
  // Block writer (fixtures/exports; driver-side)
  // ---------------------------------------------------------------

  private def writeMap(out: DataOutputStream, m: Seq[(Int, String)]): Unit = {
    out.writeInt(m.size)
    m.foreach { case (k, v) =>
      val b = v.getBytes("UTF-8")
      out.writeInt(k); out.writeInt(b.length); out.write(b)
    }
  }

  /** Append one framed block (fixture/diagnostic surface — the typed
    * writers below are the normal entry points). */
  def appendBlock(conf: Configuration, path: String, blockType: Int,
      headers: Seq[(Int, String)], content: Array[Byte]): Unit = {
    val body = new ByteArrayOutputStream()
    val d = new DataOutputStream(body)
    d.writeInt(1) // log format version
    d.writeInt(blockType)
    writeMap(d, headers)
    d.writeLong(content.length.toLong)
    d.write(content)
    writeMap(d, Nil) // footer
    val blockSize = body.size().toLong + 8L // + the trailing total field
    d.writeLong(blockSize)
    d.flush()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    // local FS has no atomic append: read-modify-write the (fixture)
    // file; real writers append with a single hflush per block
    val prior =
      if (fs.exists(p)) { val i = fs.open(p); try i.readAllBytes() finally i.close() }
      else Array.emptyByteArray
    val out = fs.create(p, true)
    try {
      out.write(prior)
      out.write(Magic)
      out.writeLong(blockSize)
      out.write(body.toByteArray)
    } finally out.close()
  }

  /** Append an avro-data block holding `rows` (aligned to `schema`). */
  def appendDataBlock(conf: Configuration, path: String, instant: String,
      schema: StructType, rows: Seq[Row]): Unit = {
    val avro = avroOf(schema, "hudi_log_record")
    val body = new ByteArrayOutputStream()
    val d = new DataOutputStream(body)
    d.writeInt(3) // content format version (public writer's current)
    d.writeInt(rows.size)
    val writer = new GenericDatumWriter[GenericRecord](avro)
    rows.foreach { r =>
      val rec = new GenericData.Record(avro)
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        val v = r.get(i) match {
          case null => null
          case s: String => s
          case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
          case x => x
        }
        rec.put(f.name, v)
      }
      val buf = new ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(buf, null)
      writer.write(rec, enc)
      enc.flush()
      d.writeInt(buf.size())
      d.write(buf.toByteArray)
    }
    d.flush()
    appendBlock(conf, path, AvroDataBlock,
      Seq(InstantTime -> instant, SchemaKey -> avro.toString), body.toByteArray)
  }

  /** Append a rollback command block targeting `targetInstant`. */
  def appendRollbackBlock(conf: Configuration, path: String, instant: String,
      targetInstant: String): Unit =
    appendBlock(conf, path, CommandBlock,
      Seq(InstantTime -> instant, TargetInstantTime -> targetInstant,
        CommandBlockType -> "0"),
      Array.emptyByteArray)
}
