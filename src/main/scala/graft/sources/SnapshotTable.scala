package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}

/** Manifest-pointer snapshot table: the transactional layer that makes
  * table REPLACEMENT (CTAS, compaction, re-clustering) atomic BY
  * CONSTRUCTION instead of by retry — the mini-Iceberg answer to the
  * rename-aside swap in [[TableIO.compact]], whose one-instant missing
  * path forces readers through [[TableIO.withCompactSafeRead]]'s bounded
  * retry (and whose retry predicate demonstrably missed a failure shape
  * in the r12 closing-tree race test).
  *
  * Layout under the table root:
  * {{{
  *   <root>/_manifest-00000000000000000001   # pointer file, content = "snap-...0001"
  *   <root>/_manifest-00000000000000000002
  *   <root>/snap-00000000000000000001/       # immutable parquet snapshot dirs
  *   <root>/snap-00000000000000000002/
  * }}}
  *
  * Protocol (single committer; readers unlimited):
  *  - COMMIT: write parquet into a fresh `snap-N` dir, write the pointer
  *    content to a dot-temp, then RENAME it to `_manifest-N`. The rename
  *    is the commit point: one metadata operation creating a NEW name —
  *    never a rename over the live path, so there is no instant where
  *    the table is unreadable. A crash before the rename leaves an
  *    orphan snapshot dir that no manifest references: invisible to
  *    readers, reclaimed by [[vacuum]]. After the rename the committer
  *    reads the pointer back and verifies it still resolves to its own
  *    snapshot — a cheap lost-update detector for the documented
  *    single-committer contract (true multi-writer CAS needs a catalog
  *    or lock service the filesystem does not provide; same position as
  *    Iceberg's HadoopTableOperations).
  *  - READ: list `_manifest-*`, take the max sequence, read its one-line
  *    content, scan that snapshot dir. Listing sees either the old
  *    manifest set or old+new — both are complete, committed states.
  *    Snapshot dirs are immutable once committed, so a plan built
  *    against snap-N can execute concurrently with ANY number of later
  *    commits: reader isolation with zero retries.
  *  - TIME TRAVEL: [[readAt]] scans any still-retained snapshot id.
  *  - VACUUM: drop all but the newest `keepLast` snapshots (and their
  *    manifests) plus any orphan snap dirs newer than every manifest
  *    (crashed commits). Deletion only ever touches non-current
  *    versions, so vacuum is safe on any schedule; a reader still
  *    executing against a snapshot older than the retention window is
  *    the standard lakehouse retention trade, stated here explicitly.
  *
  * 100 TB posture: the pointer flip costs one small-file write + one
  * metadata rename regardless of table size; compaction/re-clustering
  * rewrite data into the NEXT snapshot while readers keep scanning the
  * current one — maintenance never takes the table offline and never
  * races a reader. Reference anchor: the reference's only sink is atomic
  * `CREATE OR REPLACE TABLE` (`/root/reference/core/transformations.py:149`);
  * this layer supplies the same atomic-replace contract for a
  * path-based lake, plus the reader isolation BigQuery gives for free.
  */
object SnapshotTable {

  private val ManifestPrefix = "_manifest-"
  private val SnapPrefix = "snap-"

  private def fmt(id: Long): String = f"$id%020d"

  private def fsFor(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** All committed snapshot ids at `root`, ascending (empty for a
    * not-yet-created table). One directory listing. */
  def snapshots(spark: SparkSession, root: String): Seq[Long] = {
    val (fs, p) = fsFor(spark, root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).iterator
      .map(_.getPath.getName)
      .filter(_.startsWith(ManifestPrefix))
      .map(n => n.stripPrefix(ManifestPrefix).toLong)
      .toSeq.sorted
  }

  /** Current (highest committed) snapshot id. */
  def currentSnapshot(spark: SparkSession, root: String): Long = {
    val s = snapshots(spark, root)
    require(s.nonEmpty, s"no committed snapshot at $root")
    s.last
  }

  private def readManifest(fs: FileSystem, root: Path, id: Long): String = {
    val in = fs.open(new Path(root, ManifestPrefix + fmt(id)))
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, "UTF-8").trim
    } finally in.close()
  }

  /** Commit `df` as the next snapshot of the table at `root`; returns
    * the new snapshot id. The data write happens entirely in a fresh
    * snapshot directory; the single-rename pointer flip at the end is
    * the commit point (see object doc for the crash/concurrency
    * contract). */
  def commit(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val (fs, rootPath) = fsFor(spark, root)
    fs.mkdirs(rootPath)
    val next = snapshots(spark, root).lastOption.getOrElse(0L) + 1L
    val snapDir = SnapPrefix + fmt(next)
    df.write.mode(SaveMode.Overwrite)
      .parquet(new Path(rootPath, snapDir).toString)
    // pointer flip: dot-temp (hidden from parquet listings) -> rename to
    // the NEW manifest name; never touches the live pointer set
    val tmp = new Path(rootPath, s".manifest-${fmt(next)}.tmp")
    val out = fs.create(tmp, true)
    try out.write((snapDir + "\n").getBytes("UTF-8")) finally out.close()
    val manifest = new Path(rootPath, ManifestPrefix + fmt(next))
    require(fs.rename(tmp, manifest), s"snapshot commit failed: $tmp -> $manifest")
    // lost-update detector for the single-committer contract
    val cur = currentSnapshot(spark, root)
    require(cur == next,
      s"concurrent commit detected at $root: committed $next but current is " +
        s"$cur — snapshot commits require a single committer per table")
    next
  }

  /** Read the current snapshot. No retry wrapper needed: the pointer
    * resolves to an immutable directory that survives any concurrent
    * commit (until vacuumed past retention). */
  def read(spark: SparkSession, root: String): DataFrame =
    readAt(spark, root, currentSnapshot(spark, root))

  /** Time travel: read snapshot `id` (must still be retained). */
  def readAt(spark: SparkSession, root: String, id: Long): DataFrame = {
    val (fs, rootPath) = fsFor(spark, root)
    val snapDir = readManifest(fs, rootPath, id)
    spark.read.parquet(new Path(rootPath, snapDir).toString)
  }

  /** Maintenance rewrite as a snapshot commit: read the CURRENT
    * snapshot, rewrite it into ⌈rows/rowsPerFile⌉ round-robin files (the
    * [[TableIO.compact]] layout policy), commit as the NEXT snapshot.
    * Readers of the current snapshot are untouched throughout; the old
    * layout stays time-travel-readable until vacuum. Returns the new
    * snapshot id. */
  def compact(spark: SparkSession, root: String, rowsPerFile: Long): Long = {
    require(rowsPerFile >= 1, "rowsPerFile must be positive")
    val (fs, rootPath) = fsFor(spark, root)
    val snapDir = readManifest(fs, rootPath, currentSnapshot(spark, root))
    val snapPath = new Path(rootPath, snapDir)
    // row count from parquet footers (same discipline as
    // [[TableIO.compact]]): the data itself is read exactly once, by
    // the rewrite — O(files) tiny footer range-reads are the cheap side
    // of the trade for a many-small-files input at any scale
    val hconf = spark.sparkContext.hadoopConfiguration
    val n = fs.listStatus(snapPath)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, hconf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
    val files = math.max(1L, (n + rowsPerFile - 1) / rowsPerFile).toInt
    commit(spark.read.parquet(snapPath.toString).repartition(files), root)
  }

  /** Z-order maintenance rewrite as a snapshot commit (the
    * [[TableIO.replaceZOrdered]] layout under snapshot isolation). */
  def zorder(spark: SparkSession, root: String, clusterCols: Seq[String],
      numFiles: Int, bits: Int = 16): Long = {
    val cur = read(spark, root)
    val z = TableIO.mortonCode(clusterCols.map(cur(_)), bits)
    val zc = Iterator.from(0).map(i => s"__zorder$i")
      .filterNot(cur.columns.contains).next()
    commit(
      cur.withColumn(zc, z)
        .repartitionByRange(numFiles, org.apache.spark.sql.functions.col(zc))
        .sortWithinPartitions(zc)
        .drop(zc),
      root)
  }

  /** Retention pass: keep the newest `keepLast` committed snapshots
    * (manifest + data), delete everything older, plus orphan snapshot
    * dirs and stale dot-temps from crashed commits. Returns the number
    * of snapshots removed. Never deletes the current snapshot
    * (`keepLast >= 1` enforced). */
  def vacuum(spark: SparkSession, root: String, keepLast: Int = 2): Int = {
    require(keepLast >= 1, "must retain at least the current snapshot")
    val (fs, rootPath) = fsFor(spark, root)
    val ids = snapshots(spark, root)
    require(ids.nonEmpty, s"no committed snapshot at $root")
    val keep = ids.takeRight(keepLast).toSet
    val keptDirs = keep.map(id => readManifest(fs, rootPath, id))
    var removed = 0
    ids.filterNot(keep).foreach { id =>
      // data first, manifest last: a crash mid-vacuum leaves a manifest
      // whose dir is gone (time travel to it fails loudly) rather than
      // an orphan dir masquerading as retained
      fs.delete(new Path(rootPath, readManifest(fs, rootPath, id)), true)
      fs.delete(new Path(rootPath, ManifestPrefix + fmt(id)), false)
      removed += 1
    }
    // orphans: after the loop above the surviving manifests are exactly
    // `keep`, so any snap dir outside `keptDirs` is unreferenced — a
    // crashed commit's data write. Stale dot-temps likewise.
    fs.listStatus(rootPath).foreach { st =>
      val name = st.getPath.getName
      val orphanSnap = st.isDirectory && name.startsWith(SnapPrefix) &&
        !keptDirs.contains(name)
      val staleTmp = !st.isDirectory && name.startsWith(".manifest-") &&
        name.endsWith(".tmp")
      if (orphanSnap || staleTmp) fs.delete(st.getPath, true)
    }
    removed
  }
}
