package graft

import graft.sources.{HudiCompat, HudiLogFormat}

/** Edge pins for the Hudi MERGE-ON-READ reader: log-block framing
  * round-trips, base+log key merges with upsert precedence, log-only
  * file groups, in-flight deltacommit invisibility at block level,
  * rollback command blocks, post-compaction stale-log exclusion, and
  * loud refusals (delete blocks, composite keys, base-file-only API). */
class HudiMorSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-hudi-mor").toString
    HudiCompat.writeProperties(spark, dir, "MERGE_ON_READ", "id")
    dir
  }

  test("log block framing round-trips through the reader") {
    val dir = mkTable()
    val conf = spark.sparkContext.hadoopConfiguration
    val path = s"$dir/.fgX_001.log.1_0-0-0"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    HudiLogFormat.appendDataBlock(conf, path, "002", df.schema, df.collect().toSeq)
    HudiLogFormat.appendRollbackBlock(conf, path, "003", "999")
    val blocks = HudiLogFormat.readBlocks(conf, path)
    assert(blocks.map(_.blockType) == Seq(
      HudiLogFormat.AvroDataBlock, HudiLogFormat.CommandBlock))
    assert(blocks.head.headers(HudiLogFormat.InstantTime) == "002")
    val schema = blocks.head.headers(HudiLogFormat.SchemaKey)
    val rows = HudiLogFormat.decodeDataBlock(blocks.head.content, schema, schema)
    assert(rows.map(_.toSeq) == Seq(Seq(1L, "a"), Seq(2L, "b")))
  }

  test("MOR snapshot merges base + logs: latest completed record per key wins") {
    val dir = mkTable()
    // base slice at 001 with rows 1..4
    HudiCompat.beginCommit(spark, dir, "001")
    HudiCompat.writeBaseFile(
      (1L to 4L).map(i => (i, s"base$i")).toDF("id", "v"), dir, "p=a", "fgA", "001")
    HudiCompat.completeCommit(spark, dir, "001")
    // deltacommit 002: update id=2, insert id=5
    HudiCompat.beginDeltaCommit(spark, dir, "002")
    HudiCompat.appendLogData(Seq((2L, "upd2"), (5L, "ins5")).toDF("id", "v"),
      dir, "p=a", "fgA", "001", 1, "002")
    HudiCompat.completeDeltaCommit(spark, dir, "002")
    // deltacommit 003: update id=2 AGAIN (later block wins)
    HudiCompat.beginDeltaCommit(spark, dir, "003")
    HudiCompat.appendLogData(Seq((2L, "upd2b")).toDF("id", "v"),
      dir, "p=a", "fgA", "001", 1, "003")
    HudiCompat.completeDeltaCommit(spark, dir, "003")
    val got = HudiCompat.readHoodieTable(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "base1", 2L -> "upd2b", 3L -> "base3",
      4L -> "base4", 5L -> "ins5"), s"got $got")
    // time travel to 002: the first update visible, the second not
    assert(HudiCompat.readMorSnapshot(spark, dir, asOf = Some("002"))
      .as[(Long, String)].collect().toMap.apply(2L) == "upd2")
    // the base-file-only API refuses a MOR table loudly
    val e = intercept[IllegalArgumentException] { HudiCompat.liveFiles(spark, dir) }
    assert(e.getMessage.contains("MERGE_ON_READ"))
  }

  test("MOR incremental: only keys whose winning row postdates the checkpoint") {
    val dir = mkTable()
    HudiCompat.beginCommit(spark, dir, "001")
    HudiCompat.writeBaseFile(
      (1L to 4L).map(i => (i, s"base$i")).toDF("id", "v"), dir, "p=a", "fgA", "001")
    HudiCompat.completeCommit(spark, dir, "001")
    // 002: update id=2, log-only insert id=9 in a second group
    HudiCompat.beginDeltaCommit(spark, dir, "002")
    HudiCompat.appendLogData(Seq((2L, "upd2")).toDF("id", "v"),
      dir, "p=a", "fgA", "001", 1, "002")
    HudiCompat.appendLogData(Seq((9L, "ins9")).toDF("id", "v"),
      dir, "p=b", "fgB", "002", 1, "002")
    HudiCompat.completeDeltaCommit(spark, dir, "002")
    // 003: update id=3 and id=2 (2's winning row is now 003's)
    HudiCompat.beginDeltaCommit(spark, dir, "003")
    HudiCompat.appendLogData(Seq((3L, "upd3"), (2L, "upd2b")).toDF("id", "v"),
      dir, "p=a", "fgA", "001", 2, "003")
    HudiCompat.completeDeltaCommit(spark, dir, "003")
    // since 002: exactly 003's touched keys, post-merge values
    val got = HudiCompat.readMorIncremental(spark, dir, "002")
      .as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "upd2b", 3L -> "upd3"), s"got $got")
    // since 001: 002's insert + updates too, each key once at its
    // newest value
    val got1 = HudiCompat.readMorIncremental(spark, dir, "001")
      .as[(Long, String)].collect().toMap
    assert(got1 == Map(2L -> "upd2b", 3L -> "upd3", 9L -> "ins9"), s"got $got1")
    // since the head: nothing
    assert(HudiCompat.readMorIncremental(spark, dir, "003").isEmpty)
  }

  test("in-flight deltacommits stay invisible at block level; rollback voids its target") {
    val dir = mkTable()
    HudiCompat.beginCommit(spark, dir, "001")
    HudiCompat.writeBaseFile(Seq((1L, "base")).toDF("id", "v"),
      dir, "p=a", "fgA", "001")
    HudiCompat.completeCommit(spark, dir, "001")
    // deltacommit 002 writes a block but NEVER completes
    HudiCompat.beginDeltaCommit(spark, dir, "002")
    HudiCompat.appendLogData(Seq((1L, "ghost")).toDF("id", "v"),
      dir, "p=a", "fgA", "001", 1, "002")
    assert(HudiCompat.readHoodieTable(spark, dir)
      .as[(Long, String)].collect().toMap.apply(1L) == "base",
      "blocks of an in-flight deltacommit must stay invisible")
    // completing flips visibility
    HudiCompat.completeDeltaCommit(spark, dir, "002")
    assert(HudiCompat.readHoodieTable(spark, dir)
      .as[(Long, String)].collect().toMap.apply(1L) == "ghost")
    // a rollback command block voids the completed target's records
    HudiCompat.beginDeltaCommit(spark, dir, "003")
    HudiCompat.appendLogRollback(spark, dir, "p=a", "fgA", "001", 1, "003", "002")
    HudiCompat.completeDeltaCommit(spark, dir, "003")
    assert(HudiCompat.readHoodieTable(spark, dir)
      .as[(Long, String)].collect().toMap.apply(1L) == "base",
      "rollback must void the target instant's log records")
  }

  test("log-only file groups read with no base file; schema from the block header") {
    val dir = mkTable()
    HudiCompat.beginDeltaCommit(spark, dir, "001")
    HudiCompat.appendLogData(Seq((10L, "x"), (11L, "y")).toDF("id", "v"),
      dir, "p=b", "fgB", "001", 1, "001")
    HudiCompat.completeDeltaCommit(spark, dir, "001")
    HudiCompat.beginDeltaCommit(spark, dir, "002")
    HudiCompat.appendLogData(Seq((10L, "x2")).toDF("id", "v"),
      dir, "p=b", "fgB", "001", 2, "002")
    HudiCompat.completeDeltaCommit(spark, dir, "002")
    val got = HudiCompat.readHoodieTable(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(got == Map(10L -> "x2", 11L -> "y"), s"got $got")
  }

  test("post-compaction stale logs are excluded by base-instant attachment") {
    val dir = mkTable()
    HudiCompat.beginCommit(spark, dir, "001")
    HudiCompat.writeBaseFile(Seq((1L, "v1")).toDF("id", "v"),
      dir, "p=a", "fgA", "001")
    HudiCompat.completeCommit(spark, dir, "001")
    HudiCompat.beginDeltaCommit(spark, dir, "002")
    HudiCompat.appendLogData(Seq((1L, "v2")).toDF("id", "v"),
      dir, "p=a", "fgA", "001", 1, "002")
    HudiCompat.completeDeltaCommit(spark, dir, "002")
    // compaction at 003: new base carries the merged value; the old
    // log (attached to base instant 001) must drop out of the slice
    HudiCompat.beginCommit(spark, dir, "003")
    HudiCompat.writeBaseFile(Seq((1L, "v2")).toDF("id", "v"),
      dir, "p=a", "fgA", "003")
    HudiCompat.completeCommit(spark, dir, "003")
    val got = HudiCompat.readHoodieTable(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "v2"))
    // and the stale log must not double-apply as a NEWER record: write
    // a post-compaction update to prove ordering still works
    HudiCompat.beginDeltaCommit(spark, dir, "004")
    HudiCompat.appendLogData(Seq((1L, "v3")).toDF("id", "v"),
      dir, "p=a", "fgA", "003", 1, "004")
    HudiCompat.completeDeltaCommit(spark, dir, "004")
    assert(HudiCompat.readHoodieTable(spark, dir)
      .as[(Long, String)].collect().toMap.apply(1L) == "v3")
  }

  test("clean reclaims pre-retention slices with their logs; serving slices stay") {
    val dir = mkTable()
    // fgA: base 001 (+log at 002), rewritten by compaction-style base 003
    HudiCompat.beginCommit(spark, dir, "001")
    HudiCompat.writeBaseFile(
      (1L to 3L).map(i => (i, s"b$i")).toDF("id", "v"), dir, "p=a", "fgA", "001")
    HudiCompat.completeCommit(spark, dir, "001")
    HudiCompat.beginDeltaCommit(spark, dir, "002")
    HudiCompat.appendLogData(Seq((2L, "upd2")).toDF("id", "v"),
      dir, "p=a", "fgA", "001", 1, "002")
    HudiCompat.completeDeltaCommit(spark, dir, "002")
    HudiCompat.beginCommit(spark, dir, "003")
    HudiCompat.writeBaseFile(
      Seq((1L, "b1"), (2L, "upd2"), (3L, "b3")).toDF("id", "v"),
      dir, "p=a", "fgA", "003")
    HudiCompat.completeCommit(spark, dir, "003")
    // fgB: single slice at 001 — serving, must survive any keepInstant
    HudiCompat.beginCommit(spark, dir, "004")
    HudiCompat.writeBaseFile(Seq((9L, "b9")).toDF("id", "v"),
      dir, "p=b", "fgB", "004")
    HudiCompat.completeCommit(spark, dir, "004")
    val before = HudiCompat.readHoodieTable(spark, dir)
      .as[(Long, String)].collect().toSet
    val gone = HudiCompat.clean(spark, dir, "003")
    assert(gone.exists(_.endsWith("fgA_0-0-0_001.parquet")), s"got $gone")
    assert(gone.exists(_.contains(".fgA_001.log")),
      s"the reclaimed slice's logs must go with it, got $gone")
    assert(gone.size == 2, s"only the superseded slice may go, got $gone")
    // the table reads identically after cleaning
    assert(HudiCompat.readHoodieTable(spark, dir)
      .as[(Long, String)].collect().toSet == before)
    // nothing further to clean
    assert(HudiCompat.clean(spark, dir, "004").isEmpty)
  }

  test("delete blocks and composite record keys refuse loudly") {
    val dir = mkTable()
    HudiCompat.beginDeltaCommit(spark, dir, "001")
    HudiCompat.appendLogData(Seq((1L, "a")).toDF("id", "v"),
      dir, "p=a", "fgA", "001", 1, "001")
    HudiCompat.completeDeltaCommit(spark, dir, "001")
    assert(HudiCompat.readHoodieTable(spark, dir).count() == 1)
    // splice a DELETE block into the log: the read must refuse, not
    // silently skip a row-removal it cannot decode
    val conf = spark.sparkContext.hadoopConfiguration
    val blocksPath = s"$dir/p=a/.fgA_001.log.1_0-0-0"
    HudiLogFormat.appendBlock(conf, blocksPath, HudiLogFormat.DeleteBlock,
      Seq(HudiLogFormat.InstantTime -> "001"), Array.emptyByteArray)
    val e = intercept[Exception] { HudiCompat.readHoodieTable(spark, dir).count() }
    assert(e.toString.contains("DELETE") ||
      Option(e.getCause).exists(_.toString.contains("DELETE")) ||
      e.toString.contains("delete"), s"unexpected failure: $e")
    // composite record key
    val dir2 = java.nio.file.Files.createTempDirectory("graft-hudi-ck").toString
    HudiCompat.writeProperties(spark, dir2, "MERGE_ON_READ", "id,v")
    HudiCompat.beginDeltaCommit(spark, dir2, "001")
    HudiCompat.appendLogData(Seq((1L, "a")).toDF("id", "v"),
      dir2, "p=a", "fgA", "001", 1, "001")
    HudiCompat.completeDeltaCommit(spark, dir2, "001")
    val e2 = intercept[IllegalArgumentException] {
      HudiCompat.readHoodieTable(spark, dir2).count()
    }
    assert(e2.getMessage.contains("composite"))
  }
}
