package graft

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** The manifest-pointer snapshot layer: atomic replace BY CONSTRUCTION.
  * The load-bearing test is the live-race one — 20 consecutive
  * compactions under a hammering PLAIN reader (no retry wrapper): with
  * the pointer flip there is no swap window at all, so zero read
  * errors is a structural guarantee, not a retry outcome. */
class SnapshotTableSpec extends SparkSpec {

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-snap").toString + "/t"

  test("commit/read round trip; each commit bumps the snapshot id") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    val id1 = SnapshotTable.commit((1 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "v"), root)
    assert(id1 == 1L)
    assert(SnapshotTable.read(spark, root).count() == 50)
    val id2 = SnapshotTable.commit((1 to 80).map(i => (i.toLong, s"w$i")).toDF("id", "v"), root)
    assert(id2 == 2L)
    assert(SnapshotTable.currentSnapshot(spark, root) == 2L)
    assert(SnapshotTable.read(spark, root).count() == 80)
    assert(SnapshotTable.snapshots(spark, root) == Seq(1L, 2L))
  }

  test("time travel: old snapshots stay readable until vacuumed") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit((1 to 10).map(i => (i.toLong, "old")).toDF("id", "tag"), root)
    SnapshotTable.commit((1 to 20).map(i => (i.toLong, "new")).toDF("id", "tag"), root)
    val v1 = SnapshotTable.readAt(spark, root, 1L)
    assert(v1.count() == 10 && v1.select("tag").distinct().head().getString(0) == "old")
    val v2 = SnapshotTable.readAt(spark, root, 2L)
    assert(v2.count() == 20 && v2.select("tag").distinct().head().getString(0) == "new")
  }

  test("compact rewrites layout, preserves content exactly, keeps prior snapshot") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit(
      (1 to 400).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(32), root)
    val before = SnapshotTable.read(spark, root)
      .agg(count(lit(1)), sum(col("id"))).head()
    val newId = SnapshotTable.compact(spark, root, rowsPerFile = 200)
    assert(newId == 2L)
    val snapDir = new java.io.File(root, f"snap-${2L}%020d")
    val files = snapDir.listFiles().count(f => f.getName.endsWith(".parquet"))
    assert(files == 2, s"expected 2 compacted files, got $files")
    val after = SnapshotTable.read(spark, root)
      .agg(count(lit(1)), sum(col("id"))).head()
    assert(after == before)
    // old layout still time-travel-readable
    assert(SnapshotTable.readAt(spark, root, 1L).count() == 400)
  }

  test("zorder commit preserves content under snapshot isolation") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit(
      (1 to 256).map(i => (i.toLong, (i * 37 % 256).toLong, s"v$i"))
        .toDF("x", "y", "v"), root)
    SnapshotTable.zorder(spark, root, Seq("x", "y"), numFiles = 4, bits = 8)
    val got = SnapshotTable.read(spark, root).orderBy("x")
      .select("x", "y", "v").collect().toSeq
    val want = (1 to 256).map(i =>
      org.apache.spark.sql.Row(i.toLong, (i * 37 % 256).toLong, s"v$i"))
    assert(got == want)
  }

  test("vacuum keeps the newest keepLast snapshots and reclaims the rest + orphans") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    (1 to 4).foreach(k =>
      SnapshotTable.commit((1 to k * 10).map(i => (i.toLong, k)).toDF("id", "gen"), root))
    // simulate a crashed commit: orphan snap dir with no manifest
    val orphan = new java.io.File(root, f"snap-${99L}%020d")
    assert(orphan.mkdirs())
    val removed = SnapshotTable.vacuum(spark, root, keepLast = 2)
    assert(removed == 2)
    assert(SnapshotTable.snapshots(spark, root) == Seq(3L, 4L))
    assert(!orphan.exists, "orphan snapshot dir survived vacuum")
    assert(SnapshotTable.read(spark, root).count() == 40)
    assert(SnapshotTable.readAt(spark, root, 3L).count() == 30)
    intercept[Exception] { SnapshotTable.readAt(spark, root, 1L).count() }
  }

  test("PLAIN readers race 20 consecutive live compactions with zero errors") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit(
      (1 to 500).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(8), root)
    val expected = (1 to 500).map(_.toLong).sum
    @volatile var maintErr: Throwable = null
    val maintainer = new Thread(() => {
      try (1 to 20).foreach { k =>
        SnapshotTable.compact(spark, root, rowsPerFile = if (k % 2 == 0) 250 else 100)
        // retention pressure mid-race: the reader also races deletions.
        // keepLast=10 is the documented retention-vs-reader-latency
        // trade: a reader would have to lag TEN full compact+vacuum
        // cycles inside one aggregate for its snapshot to be reclaimed.
        SnapshotTable.vacuum(spark, root, keepLast = 10)
      }
      catch { case e: Throwable => maintErr = e }
    })
    maintainer.start()
    var reads = 0
    try {
      while (maintainer.isAlive) {
        // no withCompactSafeRead, no retry: atomicity is structural
        val sum0 = SnapshotTable.read(spark, root)
          .agg(sum(col("id"))).head().getLong(0)
        assert(sum0 == expected, s"reader saw $sum0 mid-commit, wanted $expected")
        reads += 1
      }
    } finally maintainer.join()
    assert(maintErr == null, s"maintenance failed: $maintErr")
    assert(reads > 0, "race produced no overlapping reads")
    assert(SnapshotTable.read(spark, root).count() == 500)
  }

  test("PLAIN readers race live appends + vacuums: every read is a committed prefix") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    // batch k carries ids (k*1000, k*1000+99]; a committed prefix after
    // k appends sums to a unique, recognizable value
    def batch(k: Int) = ((k * 1000 + 1) to (k * 1000 + 100))
      .map(i => (i.toLong, k)).toDF("id", "gen")
    SnapshotTable.commit(batch(0), root)
    def prefixSum(k: Int): Long =
      (0 to k).map(g => ((g * 1000 + 1) to (g * 1000 + 100)).map(_.toLong).sum).sum
    val validSums = (0 to 20).map(prefixSum).toSet
    @volatile var maintErr: Throwable = null
    val maintainer = new Thread(() => {
      try (1 to 20).foreach { k =>
        SnapshotTable.append(batch(k), root)
        // retention pressure mid-race: reclaims only manifests 10+ behind
        SnapshotTable.vacuum(spark, root, keepLast = 10)
      }
      catch { case e: Throwable => maintErr = e }
    })
    maintainer.start()
    var reads = 0
    try {
      while (maintainer.isAlive) {
        // no retry wrapper: the manifest a read resolves is a complete,
        // committed prefix of the append chain — never a torn state
        val got = SnapshotTable.read(spark, root)
          .agg(sum(col("id"))).head().getLong(0)
        assert(validSums.contains(got),
          s"reader saw $got, not a committed prefix sum")
        reads += 1
      }
    } finally maintainer.join()
    assert(maintErr == null, s"maintenance failed: $maintErr")
    assert(reads > 0, "race produced no overlapping reads")
    assert(SnapshotTable.read(spark, root).count() == 21 * 100)
  }

  test("tags pin snapshots from vacuum; dropTag releases them for reclaim") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit((1 to 10).map(i => (i.toLong, "v1")).toDF("id", "tag"), root)
    SnapshotTable.tag(spark, root, "baseline", 1L)
    SnapshotTable.commit((1 to 20).map(i => (i.toLong, "v2")).toDF("id", "tag"), root)
    SnapshotTable.commit((1 to 30).map(i => (i.toLong, "v3")).toDF("id", "tag"), root)
    // keepLast=1 would reclaim v1 and v2 — the tag pins v1
    assert(SnapshotTable.vacuum(spark, root, keepLast = 1) == 1)
    assert(SnapshotTable.snapshots(spark, root) == Seq(1L, 3L))
    assert(SnapshotTable.readTag(spark, root, "baseline").count() == 10)
    assert(SnapshotTable.tags(spark, root) == Map("baseline" -> 1L))
    // moving the tag re-pins; dropping releases for the next pass
    SnapshotTable.tag(spark, root, "baseline", 3L)
    assert(SnapshotTable.vacuum(spark, root, keepLast = 1) == 1)
    assert(SnapshotTable.snapshots(spark, root) == Seq(3L))
    assert(SnapshotTable.dropTag(spark, root, "baseline"))
    assert(SnapshotTable.tags(spark, root).isEmpty)
    intercept[IllegalArgumentException] {
      SnapshotTable.readTag(spark, root, "baseline")
    }
    // tagging a reclaimed snapshot refuses loudly
    intercept[IllegalArgumentException] {
      SnapshotTable.tag(spark, root, "x", 2L)
    }
  }

  test("append is O(delta): each append adds exactly one data dir, read = union") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit((1 to 10).map(i => (i.toLong, "a")).toDF("id", "tag"), root)
    SnapshotTable.append((11 to 15).map(i => (i.toLong, "b")).toDF("id", "tag"), root)
    SnapshotTable.append((16 to 18).map(i => (i.toLong, "c")).toDF("id", "tag"), root)
    assert(SnapshotTable.dirsAt(spark, root, 1L).size == 1)
    assert(SnapshotTable.dirsAt(spark, root, 2L).size == 2)
    assert(SnapshotTable.dirsAt(spark, root, 3L).size == 3)
    // dirs are SHARED by name across the chain — nothing was rewritten
    assert(SnapshotTable.dirsAt(spark, root, 3L).take(2) ==
      SnapshotTable.dirsAt(spark, root, 2L))
    assert(SnapshotTable.read(spark, root).count() == 18)
    assert(SnapshotTable.readAt(spark, root, 2L).count() == 15)
    assert(SnapshotTable.readAt(spark, root, 1L).count() == 10)
  }

  test("appendedBetween reads only the delta dirs; refuses non-append windows") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit((1 to 10).map(i => (i.toLong, "a")).toDF("id", "tag"), root)
    SnapshotTable.append((11 to 15).map(i => (i.toLong, "b")).toDF("id", "tag"), root)
    SnapshotTable.append((16 to 18).map(i => (i.toLong, "c")).toDF("id", "tag"), root)
    val delta = SnapshotTable.appendedBetween(spark, root, 1L, 3L)
    assert(delta.count() == 8)
    assert(delta.select("tag").distinct().collect().map(_.getString(0)).sorted
      .toSeq == Seq("b", "c"))
    assert(SnapshotTable.appendedBetween(spark, root, 3L, 3L).count() == 0)
    // compact rewrites the file list -> the window is no longer append-only
    SnapshotTable.compact(spark, root, rowsPerFile = 100)
    intercept[IllegalArgumentException] {
      SnapshotTable.appendedBetween(spark, root, 1L, 4L)
    }
  }

  test("diff classifies insert/delete/update between arbitrary snapshots") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit(
      (1 to 10).map(i => (i.toLong, i * 100L)).toDF("id", "amt"), root)
    // v2: delete ids 1-2, update amt of 3-4, keep 5-10, insert 11-12
    SnapshotTable.commit(
      ((3 to 4).map(i => (i.toLong, i * 100L + 1)) ++
        (5 to 10).map(i => (i.toLong, i * 100L)) ++
        (11 to 12).map(i => (i.toLong, i * 100L))).toDF("id", "amt"), root)
    val d = SnapshotTable.diff(spark, root, 1L, 2L, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(d == Set((1L, "delete"), (2L, "delete"), (3L, "update"),
      (4L, "update"), (11L, "insert"), (12L, "insert")))
  }

  test("stats sidecar prunes disjoint files; pruned read == full-scan filter") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    // range-clustered layout: 8 files, each covering a narrow id band
    SnapshotTable.commit(
      (1 to 800).map(i => (i.toLong, s"v$i")).toDF("id", "v")
        .repartitionByRange(8, col("id")).sortWithinPartitions("id"),
      root, statsCols = Seq("id"))
    val (selected, total) = SnapshotTable.prunedFiles(spark, root, "id", 150.0, 250.0)
    assert(total == 8, s"expected 8 data files, saw $total")
    assert(selected.size < total,
      s"stats pruning selected all $total files for a narrow range")
    val pruned = SnapshotTable.readPruned(spark, root, "id", 150.0, 250.0)
      .orderBy("id").select("id", "v").collect().toSeq
    val full = SnapshotTable.read(spark, root)
      .filter(col("id") >= 150 && col("id") <= 250)
      .orderBy("id").select("id", "v").collect().toSeq
    assert(pruned == full)
    assert(pruned.size == 101)
  }

  test("files without stats are always kept (pruning is a superset)") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    // no statsCols at commit -> no sidecar -> nothing may be pruned
    SnapshotTable.commit(
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(4), root)
    val (selected, total) = SnapshotTable.prunedFiles(spark, root, "id", 1.0, 2.0)
    assert(total == 4 && selected.size == 4)
    assert(SnapshotTable.readPruned(spark, root, "id", 1.0, 2.0).count() == 2)
  }

  test("vacuum on an append chain keeps dirs shared with retained manifests") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit((1 to 10).map(i => (i.toLong, "a")).toDF("id", "tag"), root)
    SnapshotTable.append((11 to 15).map(i => (i.toLong, "b")).toDF("id", "tag"), root)
    SnapshotTable.append((16 to 18).map(i => (i.toLong, "c")).toDF("id", "tag"), root)
    val removed = SnapshotTable.vacuum(spark, root, keepLast = 2)
    assert(removed == 1)
    // manifest 1 is gone but its dir is SHARED with snapshots 2 and 3 —
    // reference-counted liveness must keep it
    assert(SnapshotTable.readAt(spark, root, 2L).count() == 15)
    assert(SnapshotTable.read(spark, root).count() == 18)
    intercept[Exception] { SnapshotTable.readAt(spark, root, 1L).count() }
    // replace ends the chain; vacuum keepLast=1 then reclaims all three
    // chain dirs at once
    SnapshotTable.commit((1 to 5).map(i => (i.toLong, "z")).toDF("id", "tag"), root)
    assert(SnapshotTable.vacuum(spark, root, keepLast = 1) == 2)
    val dirs = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("snap-"))
    assert(dirs.length == 1, s"chain dirs survived: ${dirs.map(_.getName).toSeq}")
    assert(SnapshotTable.read(spark, root).count() == 5)
  }

  test("merge-on-read delete masks keys without rewriting; time travel unaffected") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit(
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v"), root)
    val delId = SnapshotTable.deleteWhere(spark, root, col("id") % 10 === 0, Seq("id"))
    assert(delId == 2L)
    // no data rewrite: the base dir's parquet is untouched, the delete
    // dir holds only the 10 key rows
    val delDir = new java.io.File(root, f"del-${2L}%020d")
    assert(delDir.isDirectory, "equality delete must be its own del- dir")
    assert(SnapshotTable.read(spark, root).count() == 90)
    assert(SnapshotTable.read(spark, root)
      .filter(col("id") % 10 === 0).count() == 0)
    // pre-delete snapshot still shows all rows
    assert(SnapshotTable.readAt(spark, root, 1L).count() == 100)
  }

  test("delete sequencing: a key re-inserted AFTER the delete survives reads") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit((1 to 20).map(i => (i.toLong, "old")).toDF("id", "tag"), root)
    SnapshotTable.deleteKeys(Seq(5L, 7L).toDF("id"), root)
    SnapshotTable.append(Seq((5L, "new")).toDF("id", "tag"), root)
    val rows = SnapshotTable.read(spark, root)
      .filter(col("id").isin(5L, 7L)).collect()
    assert(rows.length == 1 && rows.head.getString(1) == "new",
      s"expected only the re-inserted (5,new), got ${rows.toSeq}")
    assert(SnapshotTable.read(spark, root).count() == 19) // 20 - 2 + 1
    // a LATER delete of the same key masks the re-insert too
    SnapshotTable.deleteKeys(Seq(5L).toDF("id"), root)
    assert(SnapshotTable.read(spark, root)
      .filter(col("id") === 5L).count() == 0)
  }

  test("null-safe delete keys: a NULL key masks NULL-keyed rows, not nothing") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit(
      Seq((Some(1L), "a"), (None, "b"), (Some(3L), "c"))
        .toDF("id", "v"), root)
    SnapshotTable.deleteKeys(Seq(Option.empty[Long]).toDF("id"), root)
    val left = SnapshotTable.read(spark, root).select("v")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(left == Seq("a", "c"))
  }

  test("compact materializes pending deletes; vacuum reclaims the delete dir") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit(
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v"), root)
    SnapshotTable.deleteWhere(spark, root, col("id") <= 40, Seq("id"))
    val compactId = SnapshotTable.compact(spark, root, rowsPerFile = 30)
    assert(compactId == 3L)
    assert(SnapshotTable.read(spark, root).count() == 60)
    // ceil(60/30) = 2 files: the row count fed the layout, so the MOR
    // count (not the raw footer count of 100) was used
    val snapDir = new java.io.File(root, f"snap-${3L}%020d")
    assert(snapDir.listFiles().count(_.getName.endsWith(".parquet")) == 2)
    assert(SnapshotTable.vacuum(spark, root, keepLast = 1) == 2)
    assert(!new java.io.File(root, f"del-${2L}%020d").exists(),
      "vacuum must reclaim unreferenced delete dirs")
    assert(SnapshotTable.read(spark, root).count() == 60)
  }

  test("pruned read applies pending deletes (MOR scan == full-scan filter)") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit(
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(4),
      root, statsCols = Seq("id"))
    SnapshotTable.deleteKeys((10 to 30).map(_.toLong).toDF("id"), root)
    val pruned = SnapshotTable.readPruned(spark, root, "id", 1.0, 50.0)
    assert(pruned.count() == 29, "50 in range minus 21 deleted")
    assert(pruned.filter(col("id") === 15L).count() == 0)
  }

  test("diff sees merge-on-read deletes as row-level deletes") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit((1 to 30).map(i => (i.toLong, "x")).toDF("id", "v"), root)
    SnapshotTable.deleteKeys(Seq(3L, 9L).toDF("id"), root)
    val d = SnapshotTable.diff(spark, root, 1L, 2L, Seq("id")).collect()
    assert(d.length == 2 && d.forall(_.getString(1) == "delete"))
  }

  test("appendedBetween refuses a window containing an equality delete") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit((1 to 10).map(i => (i.toLong, "a")).toDF("id", "v"), root)
    SnapshotTable.deleteKeys(Seq(1L).toDF("id"), root)
    SnapshotTable.append(Seq((11L, "b")).toDF("id", "v"), root)
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.appendedBetween(spark, root, 1L, 3L)
    }
    assert(e.getMessage.contains("delete"))
  }

  test("appendConcurrent: 8 racing writers all commit; no rows lost, chain linear") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit(Seq((0L, "base")).toDF("id", "v"), root)
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val ids = Await.result(
        Future.sequence((1 to 8).map { w =>
          Future(SnapshotTable.appendConcurrent(
            Seq((w.toLong, s"writer$w")).toDF("id", "v"), root))
        }),
        5.minutes)
      // every writer got a DISTINCT snapshot id; the chain is linear 2..9
      assert(ids.sorted == (2L to 9L), s"ids: ${ids.sorted}")
      assert(SnapshotTable.currentSnapshot(spark, root) == 9L)
      // nothing lost: the final manifest references all 9 dirs
      assert(SnapshotTable.dirsAt(spark, root, 9L).size == 9)
      assert(SnapshotTable.read(spark, root).count() == 9)
      assert(SnapshotTable.read(spark, root)
        .agg(sum(col("id"))).head().getLong(0) == (0 to 8).sum)
      // every intermediate snapshot is a committed consistent prefix
      (2L to 9L).foreach { id =>
        assert(SnapshotTable.readAt(spark, root, id).count() == id)
      }
    } finally pool.shutdown()
  }

  test("partition evolution: mixed specs read as one table; hive dirs directory-prune") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    val flat = (1 to 60).map(i => (i.toLong, if (i % 3 == 0) "a" else "b", i * 10L))
      .toDF("id", "cat", "v")
    SnapshotTable.commit(flat, root)
    val evolved = (61 to 120).map(i => (i.toLong, if (i % 2 == 0) "a" else "c", i * 10L))
      .toDF("id", "cat", "v")
    SnapshotTable.appendPartitioned(evolved, root, Seq("cat"))
    val all = SnapshotTable.read(spark, root)
    assert(all.count() == 120)
    // same logical schema across specs; values reconcile by name
    val aSum = all.filter(col("cat") === "a")
      .agg(org.apache.spark.sql.functions.sum(col("v"))).head().getLong(0)
    val want = (1 to 60).filter(_ % 3 == 0).map(_ * 10L).sum +
      (61 to 120).filter(_ % 2 == 0).map(_ * 10L).sum
    assert(aSum == want)
    // the filter directory-prunes the evolved dir: its scan lists a
    // PartitionFilters entry on cat
    val plan = all.filter(col("cat") === "a").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(cat"),
      s"expected partition pruning on the evolved dir, plan:\n$plan")
    // deletes compose with partition evolution (MOR read is per-dir)
    SnapshotTable.deleteKeys(Seq(3L, 62L).toDF("id"), root)
    assert(SnapshotTable.read(spark, root).count() == 118)
    // compact materializes back to ONE flat dir
    SnapshotTable.compact(spark, root, rowsPerFile = 1000)
    val cur = SnapshotTable.dirsAt(spark, root,
      SnapshotTable.currentSnapshot(spark, root))
    assert(cur.size == 1)
    assert(SnapshotTable.read(spark, root).count() == 118)
  }

  test("syncAppend: replayed delta dedups; rolled-back source refused") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-sync").toString
    val (src, dst) = (s"$base/src", s"$base/dst")
    SnapshotTable.commit((1 to 10).map(i => (i.toLong, i * 2L)).toDF("id", "v"), src)
    val xf: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      _.filter(col("id") % 2 === 0)
    assert(SnapshotTable.syncAppend(spark, src, dst, xf).contains(1L))
    SnapshotTable.append((11 to 20).map(i => (i.toLong, i * 2L)).toDF("id", "v"), src)
    assert(SnapshotTable.syncAppend(spark, src, dst, xf).contains(2L))
    // a crash-replay of the same source state commits nothing
    assert(SnapshotTable.syncAppend(spark, src, dst, xf).isEmpty)
    assert(SnapshotTable.read(spark, dst).count() == 10) // evens of 1..20
    // source rollback puts the cursor ahead -> loud refusal
    SnapshotTable.rollback(spark, src, 1L)
    // rollback creates snapshot 3 > 2, so sync would RUN — build the
    // ahead case explicitly: cursor 2 vs a fresh src at snapshot 1
    val src2 = s"$base/src2"
    SnapshotTable.commit(Seq((1L, 1L)).toDF("id", "v"), src2)
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.syncAppend(spark, src2, dst, xf)
    }
    assert(e.getMessage.contains("AHEAD"))
  }

  test("catalog: versions pin consistent table sets; unknown names and ids refused") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-cat").toString
    val (aRoot, bRoot, cat) = (s"$base/a", s"$base/b", s"$base/_catalog")
    SnapshotTable.commit(Seq((1L, "a1")).toDF("id", "v"), aRoot)
    SnapshotTable.commit(Seq((1L, "b1")).toDF("id", "v"), bRoot)
    graft.sources.SnapshotCatalog.commit(spark, cat,
      Map("a" -> (aRoot, 1L), "b" -> (bRoot, 1L)))
    SnapshotTable.commit(Seq((2L, "a2")).toDF("id", "v"), aRoot)
    graft.sources.SnapshotCatalog.commit(spark, cat,
      Map("a" -> (aRoot, 2L), "b" -> (bRoot, 1L)))
    assert(graft.sources.SnapshotCatalog.versions(spark, cat) == Seq(1L, 2L))
    // current resolves a@2; catalog time travel resolves a@1
    assert(graft.sources.SnapshotCatalog.readTable(spark, cat, "a")
      .head().getString(1) == "a2")
    assert(graft.sources.SnapshotCatalog.readTable(spark, cat, "a", 1L)
      .head().getString(1) == "a1")
    assert(graft.sources.SnapshotCatalog.readTable(spark, cat, "b")
      .head().getString(1) == "b1")
    intercept[IllegalArgumentException] {
      graft.sources.SnapshotCatalog.readTable(spark, cat, "nope")
    }
    intercept[IllegalArgumentException] {
      graft.sources.SnapshotCatalog.commit(spark, cat, Map("a" -> (aRoot, 42L)))
    }
  }

  test("readAsOf: timestamp time travel picks the newest snapshot at-or-before") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit((1 to 10).map(i => (i.toLong, "v1")).toDF("id", "t"), root)
    SnapshotTable.commit((1 to 20).map(i => (i.toLong, "v2")).toDF("id", "t"), root)
    SnapshotTable.commit((1 to 30).map(i => (i.toLong, "v3")).toDF("id", "t"), root)
    // pin distinct publish times via the filesystem (mtime is the clock)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(1L, 2L, 3L).zip(Seq(1000L, 2000L, 3000L)).foreach { case (id, ts) =>
      fs.setTimes(new org.apache.hadoop.fs.Path(root, f"_manifest-$id%020d"), ts, -1)
    }
    assert(SnapshotTable.readAsOf(spark, root, 1000L).count() == 10)
    assert(SnapshotTable.readAsOf(spark, root, 2500L).count() == 20)
    assert(SnapshotTable.readAsOf(spark, root, 99999L).count() == 30)
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.readAsOf(spark, root, 500L)
    }
    assert(e.getMessage.contains("no snapshot"))
  }

  test("commitAudited: a failing audit publishes nothing and quarantines the dir") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commitAudited(
      (1 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "v"), root,
      notNull = Seq("id"), uniqueKey = Seq("id"))
    assert(SnapshotTable.read(spark, root).count() == 50)
    // duplicate keys fail
    val dup = ((1 to 50).map(i => (i.toLong, "x")) :+ (7L, "dup")).toDF("id", "v")
    val e1 = intercept[IllegalStateException] {
      SnapshotTable.commitAudited(dup, root, Seq("id"), Seq("id"))
    }
    assert(e1.getMessage.contains("duplicate"))
    // null keys fail
    val withNull = Seq((Some(1L), "a"), (None, "b")).toDF("id", "v")
    val e2 = intercept[IllegalStateException] {
      SnapshotTable.commitAudited(withNull, root, Seq("id"), Nil)
    }
    assert(e2.getMessage.contains("NULLs"))
    assert(SnapshotTable.snapshots(spark, root) == Seq(1L))
    assert(SnapshotTable.read(spark, root).count() == 50)
  }

  test("upsert: one atomic commit updates matched keys, inserts the rest") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit(
      (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v"), root)
    SnapshotTable.upsert(
      Seq((3L, "V3"), (7L, "V7"), (11L, "V11")).toDF("id", "v"), root, Seq("id"))
    assert(SnapshotTable.snapshots(spark, root) == Seq(1L, 2L))
    val got = SnapshotTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 11)
    assert(got(3L) == "V3" && got(7L) == "V7" && got(11L) == "V11")
    assert(got(1L) == "v1" && got(10L) == "v10")
    // upserting again over the upsert composes (delete sequencing)
    SnapshotTable.upsert(Seq((3L, "Z3")).toDF("id", "v"), root, Seq("id"))
    assert(SnapshotTable.read(spark, root)
      .filter(col("id") === 3L).head().getString(1) == "Z3")
    assert(SnapshotTable.read(spark, root).count() == 11)
  }

  test("compactSmall folds only sub-threshold dirs; big dirs stay listed untouched") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit((1 to 1000).map(i => (i.toLong, "big")).toDF("id", "t"), root)
    (1 to 3).foreach(b => SnapshotTable.append(
      (1 to 20).map(i => (b * 10000L + i, "small")).toDF("id", "t"), root))
    val bigDir = SnapshotTable.dirsAt(spark, root, 1L).head
    val bigFiles = new java.io.File(root, bigDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toSet
    val id = SnapshotTable.compactSmall(spark, root, smallMaxRows = 100, rowsPerFile = 1000)
    assert(id == 5L)
    val dirs = SnapshotTable.dirsAt(spark, root, 5L)
    assert(dirs.size == 2 && dirs.head == bigDir)
    val after = new java.io.File(root, bigDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toSet
    assert(after == bigFiles, "big dir files must be byte-untouched")
    assert(SnapshotTable.read(spark, root).count() == 1060)
    // no-op when fewer than two dirs qualify
    assert(SnapshotTable.compactSmall(spark, root, 100, 1000) == 5L)
    // refuses pending deletes
    SnapshotTable.deleteKeys(Seq(1L).toDF("id"), root)
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.compactSmall(spark, root, 100, 1000)
    }
    assert(e.getMessage.contains("delete"))
  }

  test("appendIdempotent: replayed keys are no-ops; marker is atomic with the commit") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit(Seq((0L, "base")).toDF("id", "v"), root)
    val id1 = SnapshotTable.appendIdempotent(
      Seq((1L, "batch1")).toDF("id", "v"), root, "b1")
    assert(id1 == 2L)
    // replay with DIFFERENT data: key decides, nothing is written
    val id1b = SnapshotTable.appendIdempotent(
      Seq((99L, "evil-dup")).toDF("id", "v"), root, "b1")
    assert(id1b == 2L)
    assert(SnapshotTable.snapshots(spark, root) == Seq(1L, 2L))
    assert(SnapshotTable.read(spark, root).count() == 2)
    assert(SnapshotTable.read(spark, root)
      .filter(col("id") === 99L).count() == 0)
    // a fresh key appends normally; metadata lines are invisible to readers
    val id2 = SnapshotTable.appendIdempotent(
      Seq((2L, "batch2")).toDF("id", "v"), root, "b2")
    assert(id2 == 3L && SnapshotTable.dirsAt(spark, root, 3L).size == 3)
    // crashed-attempt shape: orphan data dir, no manifest -> same key
    // re-appends (the orphan is vacuum fodder, never read)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq((3L, "batch3")).toDF("id", "v").write
      .parquet(root + f"/snap-${4L}%020d-orphan")
    val id3 = SnapshotTable.appendIdempotent(
      Seq((3L, "batch3")).toDF("id", "v"), root, "b3")
    assert(id3 == 4L)
    assert(SnapshotTable.read(spark, root).count() == 4)
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, f"snap-${4L}%020d-orphan")))
  }

  test("appendConcurrent composes with deletes and vacuum") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit((1 to 10).map(i => (i.toLong, "a")).toDF("id", "v"), root)
    SnapshotTable.appendConcurrent((11 to 20).map(i => (i.toLong, "b")).toDF("id", "v"), root)
    SnapshotTable.deleteKeys(Seq(1L, 11L).toDF("id"), root)
    assert(SnapshotTable.read(spark, root).count() == 18)
    SnapshotTable.compact(spark, root, rowsPerFile = 1000)
    SnapshotTable.vacuum(spark, root, keepLast = 1)
    assert(SnapshotTable.read(spark, root).count() == 18)
    val stray = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName != f"snap-${4L}%020d")
    assert(stray.isEmpty, s"unreclaimed dirs: ${stray.map(_.getName).toSeq}")
  }

  test("branch: isolation, vacuum protection, merge consumes the ref") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit(Seq((1L, "a"), (2L, "a")).toDF("id", "v"), root)
    SnapshotTable.branchCreate(spark, root, "dev")
    // duplicate create refuses
    intercept[IllegalArgumentException] {
      SnapshotTable.branchCreate(spark, root, "dev")
    }
    SnapshotTable.branchAppend(Seq((3L, "b")).toDF("id", "v"), root, "dev")
    SnapshotTable.append(Seq((4L, "m")).toDF("id", "v"), root)
    // isolation both ways
    assert(SnapshotTable.read(spark, root).count() == 3)
    assert(SnapshotTable.branchRead(spark, root, "dev").count() == 3)
    assert(SnapshotTable.branchRead(spark, root, "dev")
      .filter($"id" === 4L).count() == 0)
    // retention while the branch lives: its data dir survives the sweep
    SnapshotTable.vacuum(spark, root, keepLast = 1)
    assert(SnapshotTable.branchRead(spark, root, "dev").count() == 3)
    val merged = SnapshotTable.mergeBranch(spark, root, "dev")
    assert(SnapshotTable.readAt(spark, root, merged).count() == 4)
    assert(SnapshotTable.branches(spark, root).isEmpty)
    // post-merge vacuum reclaims everything unreferenced
    SnapshotTable.vacuum(spark, root, keepLast = 1)
    assert(SnapshotTable.read(spark, root).count() == 4)
  }

  test("mergeBranch refuses a fast-forward across a main rewrite") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit(Seq((1L, "a")).toDF("id", "v"), root)
    SnapshotTable.branchCreate(spark, root, "dev")
    SnapshotTable.branchAppend(Seq((2L, "b")).toDF("id", "v"), root, "dev")
    // main REWRITES (replace commit): the fork dir is no longer listed
    SnapshotTable.commit(Seq((9L, "z")).toDF("id", "v"), root)
    intercept[IllegalArgumentException] {
      SnapshotTable.mergeBranch(spark, root, "dev")
    }
    // the branch itself stays readable after the refused merge
    assert(SnapshotTable.branchRead(spark, root, "dev").count() == 2)
  }

  test("mergeBranch rolls renames back on a mid-merge failure; branch stays readable") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    SnapshotTable.commit(Seq((1L, "a")).toDF("id", "v"), root)
    SnapshotTable.branchCreate(spark, root, "dev")
    SnapshotTable.branchAppend(Seq((2L, "b")).toDF("id", "v"), root, "dev")
    SnapshotTable.branchAppend(Seq((3L, "c")).toDF("id", "v"), root, "dev")
    val before = SnapshotTable.branchRead(spark, root, "dev")
      .as[(Long, String)].collect().toSet
    assert(before == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // REGRESSION (r13 advice): inject a failure between the two dir
    // renames — a plain FILE squatting on the second rename's target
    // (next main id is 2; branch-only dirs re-point to snap-…2-mNNN).
    // Pre-fix, the first rename stuck and the branch manifest pointed
    // at a renamed-away dir: unreadable, orphaned until vacuum.
    val squat = new java.io.File(root, f"snap-${2L}%020d-m001")
    assert(squat.createNewFile())
    intercept[Exception] { SnapshotTable.mergeBranch(spark, root, "dev") }
    assert(SnapshotTable.branchRead(spark, root, "dev")
      .as[(Long, String)].collect().toSet == before,
      "failed merge must leave the branch fully readable")
    assert(SnapshotTable.read(spark, root).count() == 1, "main untouched")
    // clear the obstruction: the merge retries cleanly
    assert(squat.delete())
    val id = SnapshotTable.mergeBranch(spark, root, "dev")
    assert(SnapshotTable.readAt(spark, root, id)
      .as[(Long, String)].collect().toSet == before)
  }

  test("shallow clone: zero-copy, diverges locally, source untouched") {
    val s = spark
    import s.implicits._
    val src = tmpRoot()
    val dst = tmpRoot()
    SnapshotTable.commit((1 to 6).map(i => (i.toLong, "a")).toDF("id", "v"), src)
    SnapshotTable.append((7 to 9).map(i => (i.toLong, "b")).toDF("id", "v"), src)
    val id = SnapshotTable.cloneTo(spark, src, dst)
    assert(id == 2L)
    // zero data dirs under the clone root
    assert(!new java.io.File(dst).listFiles()
      .exists(f => f.isDirectory &&
        (f.getName.startsWith("snap-") || f.getName.startsWith("del-"))))
    intercept[IllegalArgumentException] { SnapshotTable.cloneTo(spark, src, dst) }
    // diverge: delete an INHERITED row, then re-append the same key —
    // the re-appended row must survive (delete sequencing across the
    // clone boundary: inherited dirs keep their source-born sequences)
    SnapshotTable.deleteKeys(Seq(3L).toDF("id"), dst)
    SnapshotTable.append(Seq((3L, "new")).toDF("id", "v"), dst)
    val got = SnapshotTable.read(spark, dst).as[(Long, String)].collect().toMap
    assert(got.size == 9 && got(3L) == "new")
    assert(SnapshotTable.read(spark, src).count() == 9)
    assert(SnapshotTable.read(spark, src).filter($"v" === "new").count() == 0)
  }
}
