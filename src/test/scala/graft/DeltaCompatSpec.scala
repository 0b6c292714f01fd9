package graft

import org.apache.spark.sql.functions._

import graft.sources.DeltaCompat

/** Edge pins for the Delta-log compat reader: last-action-wins
  * reconciliation (re-add after remove resurrects the file) and the
  * loud checkpoint refusal. */
class DeltaCompatSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(): (String, org.apache.hadoop.fs.FileSystem) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-delta").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (dir, fs)
  }

  private def writePart(dir: String, fs: org.apache.hadoop.fs.FileSystem,
      name: String, rows: Seq[(Long, String)]): Unit = {
    val tmp = s"$dir/.tmp-$name"
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    assert(fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/$name")))
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  private def writeCommit(dir: String, fs: org.apache.hadoop.fs.FileSystem,
      id: Long, lines: Seq[String]): Unit = {
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/_delta_log"))
    val out = fs.create(new org.apache.hadoop.fs.Path(
      f"$dir/_delta_log/$id%020d.json"), true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  test("re-add after remove resurrects the file; last action per path wins") {
    val (dir, fs) = mkTable()
    writePart(dir, fs, "a.parquet", Seq((1L, "a")))
    writePart(dir, fs, "b.parquet", Seq((2L, "b")))
    writeCommit(dir, fs, 0, Seq(
      """{"add":{"path":"a.parquet","dataChange":true}}""",
      """{"add":{"path":"b.parquet","dataChange":true}}"""))
    writeCommit(dir, fs, 1, Seq(
      """{"remove":{"path":"a.parquet","dataChange":true}}"""))
    assert(DeltaCompat.liveFiles(spark, dir).map(_.split('/').last) == Seq("b.parquet"))
    writeCommit(dir, fs, 2, Seq(
      """{"add":{"path":"a.parquet","dataChange":true}}"""))
    assert(DeltaCompat.liveFiles(spark, dir).map(_.split('/').last)
      == Seq("a.parquet", "b.parquet"))
    val got = DeltaCompat.readDeltaTable(spark, dir)
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b")))
  }

  test("checkpointed logs refuse loudly; non-Delta dirs refuse loudly") {
    val (dir, fs) = mkTable()
    writePart(dir, fs, "a.parquet", Seq((1L, "a")))
    writeCommit(dir, fs, 0, Seq(
      """{"add":{"path":"a.parquet","dataChange":true}}"""))
    val cp = fs.create(new org.apache.hadoop.fs.Path(
      s"$dir/_delta_log/_last_checkpoint"), true)
    try cp.write("""{"version":0,"size":1}""".getBytes("UTF-8"))
    finally cp.close()
    val e = intercept[IllegalArgumentException] {
      DeltaCompat.liveFiles(spark, dir)
    }
    assert(e.getMessage.contains("checkpoint"))
    val e2 = intercept[IllegalArgumentException] {
      DeltaCompat.liveFiles(spark,
        java.nio.file.Files.createTempDirectory("graft-notdelta").toString)
    }
    assert(e2.getMessage.contains("_delta_log"))
  }
}
