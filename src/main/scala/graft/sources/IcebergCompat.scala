package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interop front door for the PUBLIC Apache Iceberg table format (the
  * open spec's `metadata/vN.metadata.json` → manifest list → manifest
  * chain) — the third lake-migration leg next to [[DeltaCompat]] and
  * [[HudiCompat]], built on nothing but the Avro core library and
  * Jackson already on Spark's classpath.
  *
  * Resolution follows the spec: `version-hint.text` (or the highest
  * `vN.metadata.json`) names the current metadata file; its
  * `current-snapshot-id` picks the snapshot; the snapshot's
  * `manifest-list` Avro file lists manifests; each DATA manifest's
  * entries carry a `status` (1 ADDED / 0 EXISTING / 2 DELETED) and a
  * `data_file` record whose `file_path` points at the parquet. Live
  * files = non-DELETED entries across the current snapshot's
  * manifests. Reads are GENERIC (field-by-NAME over whatever writer
  * schema the file embeds), so files written by real Iceberg libraries
  * resolve the same as this module's own fixture writers.
  *
  * Scope (checked loudly): snapshots WITHOUT row-level deletes —
  * a manifest-list entry with `content = 1` (a DELETE manifest) or a
  * data-file record with `content != 0` (position/equality delete
  * files) refuses rather than silently resurrecting deleted rows;
  * format-version 3 refuses outright (deletion vectors / row lineage).
  * Data files must be parquet. Manifest metadata is read driver-side —
  * the metadata plane is MBs where the data plane is TBs; a table
  * whose manifests themselves are huge wants the real library's
  * distributed planning. */
object IcebergCompat {

  private val mapper = new ObjectMapper()

  private def fsFor(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Resolve a spec path: Iceberg writes ABSOLUTE URIs (`file:/…`,
    * `s3://…`); fixture/relative paths resolve against the table root. */
  private def resolve(dir: String, p: String): Path = {
    val uri = java.net.URI.create(p.replace(" ", "%20"))
    if (uri.isAbsolute || p.startsWith("/")) new Path(uri.getPath)
    else new Path(s"$dir/$p")
  }

  /** The current metadata JSON file: `version-hint.text` when present,
    * else the highest `vN.metadata.json`. */
  def currentMetadataFile(spark: SparkSession, dir: String): Path = {
    val fs = fsFor(spark, dir)
    val meta = new Path(s"$dir/metadata")
    require(fs.exists(meta), s"$dir has no metadata/ — not an Iceberg table")
    val hint = new Path(meta, "version-hint.text")
    if (fs.exists(hint)) {
      val in = fs.open(hint)
      val v = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
      new Path(meta, s"v$v.metadata.json")
    } else {
      val vs = fs.listStatus(meta).map(_.getPath.getName).collect {
        case n if n.matches("v\\d+\\.metadata\\.json") =>
          n.stripPrefix("v").stripSuffix(".metadata.json").toLong
      }
      require(vs.nonEmpty, s"no vN.metadata.json under $meta")
      new Path(meta, s"v${vs.max}.metadata.json")
    }
  }

  private def readAvro(spark: SparkSession, path: Path): Seq[GenericRecord] = {
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(path), s"manifest file missing: $path")
    val in = fs.open(path)
    try {
      val rdr = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      try rdr.iterator().asScala.toVector finally rdr.close()
    } finally in.close()
  }

  private def field(r: GenericRecord, name: String): Option[AnyRef] =
    if (r.getSchema.getField(name) != null) Option(r.get(name)) else None

  private def longField(r: GenericRecord, name: String): Option[Long] =
    field(r, name).map {
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"field $name is not numeric: $other")
    }

  /** Live data-file paths of the table's CURRENT snapshot. */
  def liveFiles(spark: SparkSession, dir: String): Seq[String] = {
    val fs = fsFor(spark, dir)
    val mf = currentMetadataFile(spark, dir)
    require(fs.exists(mf), s"metadata file missing: $mf")
    val in = fs.open(mf)
    val root = try mapper.readTree(in.readAllBytes()) finally in.close()
    val fv = root.path("format-version").asInt(1)
    require(fv <= 2, s"Iceberg format-version $fv (deletion vectors / row " +
      "lineage) is out of scope for this compat reader")
    val snapId = root.path("current-snapshot-id").asLong(-1L)
    require(snapId > 0, s"no current-snapshot-id in $mf (empty table?)")
    val snaps = root.path("snapshots")
    require(snaps.isArray, s"no snapshots array in $mf")
    val snap = snaps.elements().asScala
      .find(_.path("snapshot-id").asLong(-2L) == snapId)
      .getOrElse(throw new IllegalArgumentException(
        s"current-snapshot-id $snapId not found among snapshots in $mf"))
    val mlPath = snap.path("manifest-list").asText("")
    require(mlPath.nonEmpty,
      s"snapshot $snapId has no manifest-list (v1 inline manifests are " +
        "out of scope — rewrite the table with a manifest list)")
    val manifestEntries = readAvro(spark, resolve(dir, mlPath))
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    manifestEntries.foreach { me =>
      val content = longField(me, "content").getOrElse(0L)
      require(content == 0L,
        s"table at $dir carries a DELETE manifest — row-level deletes " +
          "this reader would silently resurrect; compact/rewrite first")
      val mPath = field(me, "manifest_path").map(_.toString).getOrElse(
        throw new IllegalArgumentException("manifest-list entry has no manifest_path"))
      readAvro(spark, resolve(dir, mPath)).foreach { e =>
        val status = longField(e, "status").getOrElse(0L)
        if (status != 2L) { // 2 = DELETED
          val df = field(e, "data_file").collect { case r: GenericRecord => r }
            .getOrElse(throw new IllegalArgumentException(
              s"manifest entry without data_file in $mPath"))
          require(longField(df, "content").getOrElse(0L) == 0L,
            s"table at $dir carries delete files (position/equality) — " +
              "out of scope for this compat reader")
          val fmt = field(df, "file_format").map(_.toString.toUpperCase)
            .getOrElse("PARQUET")
          require(fmt == "PARQUET",
            s"data file format $fmt unsupported (parquet only)")
          out += resolve(dir, field(df, "file_path").map(_.toString).getOrElse(
            throw new IllegalArgumentException("data_file without file_path")))
            .toUri.getPath
        }
      }
    }
    require(out.nonEmpty, s"Iceberg snapshot $snapId at $dir has no live files")
    out.toSeq.sorted
  }

  /** Read the table's current snapshot. */
  def readIcebergTable(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(liveFiles(spark, dir): _*)

  // ---- fixture/export writers (minimal spec-shaped Avro + JSON) ----

  private val manifestEntrySchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |  {"name":"status","type":"int"},
      |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |    {"name":"content","type":"int"},
      |    {"name":"file_path","type":"string"},
      |    {"name":"file_format","type":"string"},
      |    {"name":"record_count","type":"long"}
      |  ]}}
      |]}""".stripMargin.replace("\n", ""))

  private val manifestFileSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |  {"name":"manifest_path","type":"string"},
      |  {"name":"manifest_length","type":"long"},
      |  {"name":"content","type":"int"}
      |]}""".stripMargin.replace("\n", ""))

  private def writeAvro(spark: SparkSession, path: Path, schema: Schema,
      rows: Seq[GenericRecord]): Unit = {
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(path.getParent)
    val out = fs.create(path, true)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    try { w.create(schema, out); rows.foreach(w.append) }
    finally w.close() // closes the stream
  }

  /** Fixture: write a DATA manifest for `files` with per-file status
    * (1 ADDED / 0 EXISTING / 2 DELETED). Paths relative to the root. */
  def writeManifest(spark: SparkSession, dir: String, name: String,
      files: Seq[(Int, String, Long)]): String = {
    val rows = files.map { case (status, relPath, n) =>
      val df = new GenericData.Record(
        manifestEntrySchema.getField("data_file").schema())
      df.put("content", 0)
      df.put("file_path", relPath)
      df.put("file_format", "PARQUET")
      df.put("record_count", n)
      val e = new GenericData.Record(manifestEntrySchema)
      e.put("status", status)
      e.put("data_file", df)
      e
    }
    writeAvro(spark, new Path(s"$dir/metadata/$name"), manifestEntrySchema, rows)
    s"metadata/$name"
  }

  /** Fixture: write a manifest LIST naming `manifests` (all data
    * manifests, content = 0). */
  def writeManifestList(spark: SparkSession, dir: String, name: String,
      manifests: Seq[String]): String = {
    val rows = manifests.map { m =>
      val r = new GenericData.Record(manifestFileSchema)
      r.put("manifest_path", m)
      r.put("manifest_length", 0L)
      r.put("content", 0)
      r
    }
    writeAvro(spark, new Path(s"$dir/metadata/$name"), manifestFileSchema, rows)
    s"metadata/$name"
  }

  /** Fixture: write `vN.metadata.json` + `version-hint.text` with a
    * snapshot per (id, manifestList), current = the last. */
  def writeMetadata(spark: SparkSession, dir: String, version: Int,
      snapshots: Seq[(Long, String)]): Unit = {
    val fs = fsFor(spark, dir)
    fs.mkdirs(new Path(s"$dir/metadata"))
    val snapsJson = snapshots.map { case (id, ml) =>
      s"""{"snapshot-id":$id,"manifest-list":"$ml"}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"format-version":2,"table-uuid":"graft-fixture",
         |"current-snapshot-id":${snapshots.last._1},
         |"snapshots":$snapsJson}""".stripMargin.replace("\n", "")
    val out = fs.create(new Path(s"$dir/metadata/v$version.metadata.json"), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    val hint = fs.create(new Path(s"$dir/metadata/version-hint.text"), true)
    try hint.write(version.toString.getBytes("UTF-8")) finally hint.close()
  }
}
