package graft

import graft.sources.HudiCompat

/** Edge pins for the Hudi CoW compat reader: latest-file-slice
  * resolution, inflight invisibility, and loud MOR/replacecommit
  * refusals. */
class HudiCompatSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(): String =
    java.nio.file.Files.createTempDirectory("graft-hudi").toString

  test("latest completed file slice wins; inflight instants stay invisible") {
    val dir = mkTable()
    // commit 001: file group A (p=a) v1, file group B (p=b)
    HudiCompat.beginCommit(spark, dir, "001")
    HudiCompat.writeBaseFile(Seq((1L, "old"), (2L, "old")).toDF("id", "v"),
      dir, "p=a", "fgA", "001")
    HudiCompat.writeBaseFile(Seq((10L, "b")).toDF("id", "v"),
      dir, "p=b", "fgB", "001")
    HudiCompat.completeCommit(spark, dir, "001")
    assert(HudiCompat.readHoodieTable(spark, dir).count() == 3)
    // commit 002 REWRITES file group A (the CoW update): same fileId,
    // new base file at the new instant
    HudiCompat.beginCommit(spark, dir, "002")
    HudiCompat.writeBaseFile(Seq((1L, "new"), (2L, "new"), (3L, "new"))
      .toDF("id", "v"), dir, "p=a", "fgA", "002")
    HudiCompat.completeCommit(spark, dir, "002")
    val got = HudiCompat.readHoodieTable(spark, dir)
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "new"), (2L, "new"), (3L, "new"), (10L, "b")),
      s"latest slice of fgA must shadow v1 entirely, got $got")
    // commit 003 writes data but NEVER completes: invisible
    HudiCompat.beginCommit(spark, dir, "003")
    HudiCompat.writeBaseFile(Seq((99L, "ghost")).toDF("id", "v"),
      dir, "p=a", "fgC", "003")
    assert(HudiCompat.readHoodieTable(spark, dir)
      .filter($"id" === 99L).count() == 0,
      "data of an in-flight commit must stay invisible")
    // completing it flips visibility atomically
    HudiCompat.completeCommit(spark, dir, "003")
    assert(HudiCompat.readHoodieTable(spark, dir).count() == 5)
    // TIME TRAVEL: asOf 001 resolves fgA's ORIGINAL slice, no fgC
    assert(HudiCompat.readHoodieTable(spark, dir, asOf = Some("001"))
      .as[(Long, String)].collect().toSet ==
        Set((1L, "old"), (2L, "old"), (10L, "b")))
    assert(HudiCompat.readHoodieTable(spark, dir, asOf = Some("002"))
      .filter($"id" === 99L).count() == 0)
  }

  test("non-partitioned table: a CoW update at the table root shadows the old slice") {
    val dir = mkTable()
    // base files sit directly at the table root (partition = "")
    HudiCompat.beginCommit(spark, dir, "001")
    HudiCompat.writeBaseFile(Seq((1L, "old"), (2L, "old")).toDF("id", "v"),
      dir, "", "fgA", "001")
    HudiCompat.completeCommit(spark, dir, "001")
    HudiCompat.beginCommit(spark, dir, "002")
    HudiCompat.writeBaseFile(Seq((1L, "new"), (2L, "new")).toDF("id", "v"),
      dir, "", "fgA", "002")
    HudiCompat.completeCommit(spark, dir, "002")
    val got = HudiCompat.readHoodieTable(spark, dir)
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "new"), (2L, "new")),
      s"root-level file slices must dedup per (partition='', fileId), got $got")
  }

  test("incremental query: only file groups created/rewritten after the checkpoint") {
    val dir = mkTable()
    HudiCompat.beginCommit(spark, dir, "001")
    HudiCompat.writeBaseFile(Seq((1L, "a1")).toDF("id", "v"), dir, "p=a", "fgA", "001")
    HudiCompat.writeBaseFile(Seq((2L, "b1")).toDF("id", "v"), dir, "p=b", "fgB", "001")
    HudiCompat.completeCommit(spark, dir, "001")
    HudiCompat.beginCommit(spark, dir, "002")
    HudiCompat.writeBaseFile(Seq((1L, "a2")).toDF("id", "v"), dir, "p=a", "fgA", "002")
    HudiCompat.completeCommit(spark, dir, "002")
    // since 001: only the rewritten fgA slice comes back
    assert(HudiCompat.readIncremental(spark, dir, "001")
      .as[(Long, String)].collect().toSet == Set((1L, "a2")))
    // since 000: everything (both groups' LATEST slices, not v1 of fgA)
    assert(HudiCompat.readIncremental(spark, dir, "000")
      .as[(Long, String)].collect().toSet == Set((1L, "a2"), (2L, "b1")))
    // since the head: empty window refuses loudly
    val e = intercept[IllegalArgumentException] {
      HudiCompat.readIncremental(spark, dir, "002")
    }
    assert(e.getMessage.contains("no file slices"))
  }

  test("MOR tables and replacecommits refuse loudly; non-Hudi dirs refuse") {
    val dir = mkTable()
    HudiCompat.beginCommit(spark, dir, "001")
    HudiCompat.writeBaseFile(Seq((1L, "a")).toDF("id", "v"), dir, "p=a", "fgA", "001")
    HudiCompat.completeCommit(spark, dir, "001")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def touch(p: String): Unit = {
      val o = fs.create(new org.apache.hadoop.fs.Path(p), true)
      try o.write(Array.emptyByteArray) finally o.close()
    }
    touch(s"$dir/.hoodie/002.deltacommit")
    val e = intercept[IllegalArgumentException] { HudiCompat.liveFiles(spark, dir) }
    assert(e.getMessage.contains("MERGE_ON_READ"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/.hoodie/002.deltacommit"), false)
    touch(s"$dir/.hoodie/003.replacecommit")
    val e2 = intercept[IllegalArgumentException] { HudiCompat.liveFiles(spark, dir) }
    assert(e2.getMessage.contains("replacecommit"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/.hoodie/003.replacecommit"), false)
    // a stray log file refuses even without a deltacommit marker
    touch(s"$dir/p=a/fgA_0-0-0.log.1")
    val e3 = intercept[IllegalArgumentException] { HudiCompat.liveFiles(spark, dir) }
    assert(e3.getMessage.contains("log"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/p=a/fgA_0-0-0.log.1"), false)
    val e4 = intercept[IllegalArgumentException] {
      HudiCompat.liveFiles(spark, mkTable())
    }
    assert(e4.getMessage.contains(".hoodie"))
  }
}
