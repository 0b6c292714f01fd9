package graft

import graft.sources.IcebergCompat

/** Edge pins for the Iceberg compat reader: snapshot resolution through
  * version-hint → metadata JSON → manifest list → manifests, DELETED
  * entry handling, EXISTING carry-over, and loud refusals for delete
  * manifests / delete files / v3. */
class IcebergCompatSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(): String =
    java.nio.file.Files.createTempDirectory("graft-iceberg").toString

  private def writeData(dir: String, name: String, rows: Seq[(Long, String)]): Long = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = s"$dir/.tmp-$name"
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/data"))
    assert(fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/data/$name")))
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    rows.size.toLong
  }

  test("snapshot chain: added, existing-carry-over, deleted; hint picks current") {
    val dir = mkTable()
    val na = writeData(dir, "a.parquet", Seq((1L, "a")))
    val nb = writeData(dir, "b.parquet", Seq((2L, "b"), (3L, "b")))
    val nc = writeData(dir, "c.parquet", Seq((4L, "c")))
    // snapshot 1: adds a + b
    val m1 = IcebergCompat.writeManifest(spark, dir, "m1.avro",
      Seq((1, "data/a.parquet", na), (1, "data/b.parquet", nb)))
    val ml1 = IcebergCompat.writeManifestList(spark, dir, "ml1.avro", Seq(m1))
    IcebergCompat.writeMetadata(spark, dir, 1, Seq((101L, ml1)))
    assert(IcebergCompat.readIcebergTable(spark, dir).count() == 3)
    // snapshot 2 (overwrite): a DELETED, b EXISTING, c ADDED
    val m2 = IcebergCompat.writeManifest(spark, dir, "m2.avro",
      Seq((2, "data/a.parquet", na), (0, "data/b.parquet", nb),
        (1, "data/c.parquet", nc)))
    val ml2 = IcebergCompat.writeManifestList(spark, dir, "ml2.avro", Seq(m2))
    IcebergCompat.writeMetadata(spark, dir, 2, Seq((101L, ml1), (102L, ml2)))
    val got = IcebergCompat.readIcebergTable(spark, dir)
      .as[(Long, String)].collect().toSet
    assert(got == Set((2L, "b"), (3L, "b"), (4L, "c")),
      s"deleted entry must drop, existing must carry, got $got")
    // the v1 metadata file still resolves snapshot 101 if hinted back
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hint = fs.create(new org.apache.hadoop.fs.Path(
      s"$dir/metadata/version-hint.text"), true)
    try hint.write("1".getBytes("UTF-8")) finally hint.close()
    assert(IcebergCompat.readIcebergTable(spark, dir).count() == 3)
  }

  test("delete manifests, delete files, v3, and non-Iceberg dirs refuse loudly") {
    val dir = mkTable()
    val na = writeData(dir, "a.parquet", Seq((1L, "a")))
    val m1 = IcebergCompat.writeManifest(spark, dir, "m1.avro",
      Seq((1, "data/a.parquet", na)))
    // a manifest-list entry with content=1 (DELETE manifest)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    run {
      val schema = new org.apache.avro.Schema.Parser().parse(
        """{"type":"record","name":"manifest_file","fields":[
          |{"name":"manifest_path","type":"string"},
          |{"name":"manifest_length","type":"long"},
          |{"name":"content","type":"int"}]}""".stripMargin.replace("\n", ""))
      val r = new org.apache.avro.generic.GenericData.Record(schema)
      r.put("manifest_path", m1); r.put("manifest_length", 0L); r.put("content", 1)
      val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/metadata/mldel.avro"), true)
      val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
        new org.apache.avro.generic.GenericDatumWriter(schema))
      try { w.create(schema, out); w.append(r) } finally w.close()
    }
    IcebergCompat.writeMetadata(spark, dir, 1, Seq((101L, "metadata/mldel.avro")))
    val e = intercept[IllegalArgumentException] { IcebergCompat.liveFiles(spark, dir) }
    assert(e.getMessage.contains("DELETE manifest"))
    // v3 refuses outright
    val out = fs.create(new org.apache.hadoop.fs.Path(
      s"$dir/metadata/v2.metadata.json"), true)
    try out.write(
      """{"format-version":3,"current-snapshot-id":101,"snapshots":[]}"""
        .getBytes("UTF-8")) finally out.close()
    val hint = fs.create(new org.apache.hadoop.fs.Path(
      s"$dir/metadata/version-hint.text"), true)
    try hint.write("2".getBytes("UTF-8")) finally hint.close()
    val e2 = intercept[IllegalArgumentException] { IcebergCompat.liveFiles(spark, dir) }
    assert(e2.getMessage.contains("format-version"))
    val e3 = intercept[IllegalArgumentException] {
      IcebergCompat.liveFiles(spark, mkTable())
    }
    assert(e3.getMessage.contains("metadata"))
  }

  private def run(f: => Unit): Unit = f
}
