package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interop front door for the PUBLIC Delta Lake transaction-log format
  * (the `_delta_log/` JSON commit protocol, documented in the open
  * Delta PROTOCOL.md): resolve a table's LIVE file set from its commit
  * log and read it — no Delta library needed. This is the migration
  * path for a lake that already holds Delta tables: the log is plain
  * JSON-lines metadata, so the resolution runs as an ordinary Spark
  * job (`spark.read.json` over the commit files + one last-action-wins
  * aggregation per path), which is exactly how it must work at scale —
  * a long-lived table's log is thousands of commits, and resolving it
  * driver-side line by line would serialize the metadata plane.
  *
  * Checkpoints are supported: a `_last_checkpoint` pointer routes the
  * read to the checkpoint parquet (single or multi-part) plus the JSON
  * commits AFTER the checkpoint version — the common shape of any Delta
  * table past ~10 commits, where older JSON may already be vacuumed.
  * Deletion vectors and column mapping are newer protocol features a
  * `protocol` line would gate in a full implementation.
  *
  * Paths in the log are RELATIVE PERCENT-ENCODED URIs per the public
  * protocol: the reader URL-decodes them (a file named `a b=c.parquet`
  * appears as `a%20b%3Dc.parquet`) and refuses absolute-URI adds
  * (external files) loudly; the exporter percent-encodes on the way
  * out, so round-trips preserve exotic file names.
  */
object DeltaCompat {

  /** Refuse protocol features this reader cannot honor — SILENTLY
    * ignoring them reads wrong data (a deletion-vector'd file would
    * surface its deleted rows; column mapping renames every column):
    * `protocol.minReaderVersion > 1`, any live `add.deletionVector`,
    * and `metaData.configuration."delta.columnMapping.mode"` other than
    * none. Checks are schema-driven (absent fields = feature never
    * used = fine) and cost one short job over log metadata. */
  private def guardUnsupported(df: DataFrame, dir: String): Unit = {
    import org.apache.spark.sql.types.StructType
    def subField(struct: String, name: String): Boolean =
      df.schema.find(_.name == struct).exists(_.dataType match {
        case st: StructType => st.fieldNames.contains(name)
        case _ => false
      })
    if (subField("protocol", "minReaderVersion")) {
      require(df.filter(col("protocol.minReaderVersion") > 1).isEmpty,
        s"Delta table at $dir declares protocol.minReaderVersion > 1 " +
          "(v2+ reader features: deletion vectors / column mapping / v2 " +
          "checkpoints) — out of scope for this compat reader")
    }
    if (subField("add", "deletionVector")) {
      require(df.filter(col("add").isNotNull &&
          col("add.deletionVector").isNotNull).isEmpty,
        s"Delta table at $dir carries deletion vectors — row-level " +
          "deletes this reader would silently resurrect; compact the " +
          "table (purge DVs) before reading through this compat path")
    }
    val cmField = df.schema.find(_.name == "metaData").map(_.dataType).exists {
      case st: StructType => st.find(_.name == "configuration").exists(_.dataType match {
        case cs: StructType => cs.fieldNames.contains("delta.columnMapping.mode")
        case _ => false
      })
      case _ => false
    }
    if (cmField) {
      require(df.filter(col("metaData").isNotNull &&
          col("metaData.configuration.`delta.columnMapping.mode`").isNotNull &&
          col("metaData.configuration.`delta.columnMapping.mode`") =!= "none")
          .isEmpty,
        s"Delta table at $dir uses column mapping — physical parquet " +
          "column names differ from the logical schema; out of scope " +
          "for this compat reader")
    }
  }

  /** One line of actions with its commit version attached: `add.path` /
    * `remove.path` extracted (absent action kinds tolerated), rows
    * without either dropped. */
  private def actionsOf(df: DataFrame): DataFrame = {
    val cols = df.columns.toSet
    def pathOf(action: String): org.apache.spark.sql.Column =
      if (cols.contains(action)) col(s"$action.path") else lit(null).cast("string")
    df.select(col("commit"), pathOf("add").as("add_path"),
        pathOf("remove").as("rm_path"))
      .select(col("commit"),
        coalesce(col("add_path"), col("rm_path")).as("path"),
        col("add_path").isNotNull.as("is_add"))
      .filter(col("path").isNotNull)
  }

  /** The reconciled per-path state of the log — one row per path with
    * its LATEST action (the Delta reconciliation rule) — plus the
    * latest commit version present. With a `_last_checkpoint`, the
    * checkpoint parquet carries the state at its version and only
    * LATER JSON commits replay on top. */
  private def resolvedState(spark: SparkSession, dir: String,
      asOf: Option[Long] = None): (DataFrame, Long) = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(s"$dir/_delta_log")
    require(fs.exists(logDir), s"$dir has no _delta_log — not a Delta table")
    val lastCp = new Path(logDir, "_last_checkpoint")
    val (cpActions, cpVersion): (Option[DataFrame], Long) =
      // TIME TRAVEL: a checkpoint NEWER than the asked version already
      // folded later commits in — ignore it and replay JSON from 0
      if (!fs.exists(lastCp)) (None, -1L)
      else {
        // one small JSON object: {"version":N,"size":M[,"parts":P]}
        val in = fs.open(lastCp)
        val meta = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        def longField(k: String): Option[Long] =
          s""""$k"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(meta).map(_.group(1).toLong)
        val v = longField("version").getOrElse(
          throw new IllegalArgumentException(
            s"_last_checkpoint at $dir has no version field: $meta"))
        val files = longField("parts") match {
          case Some(p) => (1L to p).map(i =>
            f"$dir/_delta_log/$v%020d.checkpoint.$i%010d.$p%010d.parquet")
          case None => Seq(f"$dir/_delta_log/$v%020d.checkpoint.parquet")
        }
        files.foreach(f => require(fs.exists(new Path(f)),
          s"_last_checkpoint points at version $v but $f is missing"))
        if (asOf.exists(_ < v)) (None, -1L)
        else (Some(spark.read.parquet(files: _*).withColumn("commit", lit(v))), v)
      }
    // JSON commits AFTER the checkpoint (older ones may be vacuumed —
    // and must not be replayed anyway: the checkpoint subsumes them),
    // capped at the asked version when time-traveling
    val jsonFiles = fs.listStatus(logDir).map(_.getPath).filter { p =>
      p.getName.matches("\\d{20}\\.json") && {
        val v = p.getName.stripSuffix(".json").toLong
        v > cpVersion && asOf.forall(v <= _)
      }
    }.map(_.toString).sorted
    asOf.foreach { v =>
      // the window (cpVersion, v] must be fully present — a vacuumed
      // commit means the asked version is no longer reconstructible
      val have = jsonFiles.map(f => new Path(f).getName.stripSuffix(".json").toLong).toSet
      val missing = ((cpVersion + 1) to v).filterNot(have.contains)
      require(missing.isEmpty,
        s"version $v of $dir is not reconstructible: commits " +
          s"${missing.mkString(", ")} are vacuumed and no usable checkpoint covers them")
    }
    require(cpActions.nonEmpty || jsonFiles.nonEmpty,
      s"$dir/_delta_log has neither a checkpoint nor JSON commits" +
        asOf.map(v => s" at or before version $v").getOrElse(""))
    cpActions.foreach(guardUnsupported(_, dir))
    val jsonActions =
      if (jsonFiles.isEmpty) None
      else {
        val raw = spark.read.json(jsonFiles: _*)
          .withColumn("commit",
            regexp_extract(input_file_name(), "(\\d{20})\\.json$", 1).cast("long"))
        guardUnsupported(raw, dir)
        Some(actionsOf(raw))
      }
    val actions = (cpActions.map(actionsOf) ++ jsonActions).reduce(_ unionByName _)
    val latest = (cpVersion +: jsonFiles.map(f =>
      new Path(f).getName.stripSuffix(".json").toLong)).max
    (actions
      .groupBy(col("path"))
      .agg(max_by(col("is_add"), col("commit")).as("is_add")), latest)
  }

  /** The live data-file paths of the Delta table at `dir`: reconciled
    * state filtered to adds, paths URL-decoded (the protocol stores
    * them percent-encoded), absolute-URI adds refused. `asOf` = TIME
    * TRAVEL to that commit version (replays only commits <= asOf; a
    * newer checkpoint is bypassed, so the needed JSON must still
    * exist — vacuumed history refuses by name). */
  def liveFiles(spark: SparkSession, dir: String,
      asOf: Option[Long] = None): Seq[String] =
    resolvedState(spark, dir, asOf)._1
      .filter(col("is_add"))
      .select(col("path"))
      .collect().map { r =>
        val raw = r.getString(0)
        // protocol: relative percent-encoded URI; absolute = external file
        val uri = try new java.net.URI(raw) catch {
          case e: java.net.URISyntaxException => throw new IllegalArgumentException(
            s"Delta log at $dir holds a malformed path URI '$raw'", e)
        }
        require(!uri.isAbsolute && !raw.startsWith("/"),
          s"absolute add path '$raw' (external file) is out of scope for " +
            "this compat reader")
        s"$dir/${uri.getPath}"
      }.toSeq.sorted

  /** CHECKPOINT the log at its latest version — the writer-side
    * maintenance op that makes long logs cheap to open: one parquet
    * holding the reconciled state (live `add`s plus `remove` tombstone
    * paths) and the `_last_checkpoint` pointer. JSON commits at or
    * before the checkpointed version become vacuum-able; this reader
    * ignores them afterwards. Scope: data actions only (protocol /
    * metaData rows a full Delta writer also snapshots are carried by
    * the JSON header commit, which [[exportDeltaLog]] always writes
    * first and never vacuums here). Returns the checkpointed version. */
  def checkpoint(spark: SparkSession, dir: String, parts: Int = 1): Long = {
    require(parts >= 1, "need parts >= 1")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (state, v) = resolvedState(spark, dir)
    require(v >= 0L, s"no commits to checkpoint at $dir")
    val tmp = new Path(s"$dir/_delta_log/.cp-tmp")
    val rows = state.select(
      when(col("is_add"),
        struct(col("path"), lit(true).as("dataChange"))).as("add"),
      when(not(col("is_add")),
        struct(col("path"), lit(true).as("dataChange"))).as("remove"))
    // multi-part checkpoints (the protocol's shape for state too large
    // for one file — each part is written by one task, so a 100 TB
    // table's multi-million-file state never funnels through one
    // writer): repartition to `parts` and name each part per the spec,
    // <v>.checkpoint.<i-of-n>.parquet
    rows.repartition(parts).write.mode("overwrite").parquet(tmp.toString)
    val written = fs.listStatus(tmp).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    require(written.nonEmpty, s"checkpoint write at $tmp produced no parquet")
    val targets =
      if (parts == 1) Seq(new Path(f"$dir/_delta_log/$v%020d.checkpoint.parquet"))
      else (1 to written.length).map(i => new Path(
        f"$dir/_delta_log/$v%020d.checkpoint.$i%010d.${written.length}%010d.parquet"))
    written.zip(targets).foreach { case (src, dst) =>
      fs.delete(dst, false)
      require(fs.rename(src, dst), s"rename $src -> $dst failed")
    }
    fs.delete(tmp, true)
    val n = spark.read.parquet(targets.map(_.toString): _*).count()
    val partsField = if (parts == 1) "" else s""","parts":${written.length}"""
    val out = fs.create(new Path(s"$dir/_delta_log/_last_checkpoint"), true)
    try out.write(s"""{"version":$v,"size":$n$partsField}""".getBytes("UTF-8"))
    finally out.close()
    v
  }

  /** Latest commit version present in the log (checkpoint-aware). */
  def latestVersion(spark: SparkSession, dir: String): Long =
    resolvedState(spark, dir)._2

  /** INCREMENTAL PULL: the file paths ADDED by commits in `(fromV,
    * toV]` — the Delta-side half of a continuous foreign-lake sync
    * (pair with [[SnapshotTable.syncAppend]] on the destination).
    * Append-only windows only, checked loudly: a remove inside the
    * window of a file added BEFORE the window means the window carries
    * a rewrite/delete, and replaying just its adds would double rows —
    * callers must fall back to a full re-read (or a keyed upsert).
    * An add-then-remove WITHIN the window (transient compaction state)
    * cancels out and is fine. All JSON commits in the window must
    * still exist (not vacuumed past a checkpoint). */
  def addedBetween(spark: SparkSession, dir: String,
      fromV: Long, toV: Long): Seq[String] = {
    require(fromV < toV, s"empty commit window ($fromV, $toV]")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(s"$dir/_delta_log")
    require(fs.exists(logDir), s"$dir has no _delta_log — not a Delta table")
    val want = ((fromV + 1) to toV).map(v => f"$v%020d.json")
    val missing = want.filterNot(n => fs.exists(new Path(logDir, n)))
    require(missing.isEmpty,
      s"commits ${missing.mkString(", ")} are missing at $dir (vacuumed " +
        "past a checkpoint?) — the incremental window cannot be replayed")
    val raw = spark.read.json(want.map(n => s"$dir/_delta_log/$n"): _*)
      .withColumn("commit",
        regexp_extract(input_file_name(), "(\\d{20})\\.json$", 1).cast("long"))
    guardUnsupported(raw, dir)
    val acts = actionsOf(raw)
    val perPath = acts.groupBy(col("path"))
      .agg(max_by(col("is_add"), col("commit")).as("live"),
        min_by(col("is_add"), col("commit")).as("first_is_add"))
      .collect()
    perPath.foreach { r =>
      // a path whose FIRST in-window action is a remove targets
      // pre-window data (plain delete, or remove-then-re-add rewrite)
      require(r.getBoolean(2),
        s"window ($fromV, $toV] at $dir removes pre-window file " +
          s"'${r.getString(0)}' — not an append-only window; re-read or upsert")
    }
    perPath.filter(_.getBoolean(1)).map { r =>
      val raw = r.getString(0)
      val uri = new java.net.URI(raw)
      require(!uri.isAbsolute && !raw.startsWith("/"),
        s"absolute add path '$raw' is out of scope")
      s"$dir/${uri.getPath}"
    }.toSeq.sorted
  }

  /** Read the rows appended in `(fromV, toV]` (append-only windows). */
  def readAddedBetween(spark: SparkSession, dir: String,
      fromV: Long, toV: Long): DataFrame = {
    val files = addedBetween(spark, dir, fromV, toV)
    require(files.nonEmpty, s"no files added in ($fromV, $toV] at $dir")
    spark.read.parquet(files: _*)
  }

  /** Read the table's current state, or (`asOf`) a past version. */
  def readDeltaTable(spark: SparkSession, dir: String,
      asOf: Option[Long] = None): DataFrame = {
    val files = liveFiles(spark, dir, asOf)
    require(files.nonEmpty, s"Delta table at $dir has no live files" +
      asOf.map(v => s" at version $v").getOrElse(""))
    spark.read.parquet(files: _*)
  }

  /** DUAL-FORMAT EXPORT (the UniForm idea): write a `_delta_log` INTO a
    * [[SnapshotTable]] root so the SAME files read as a Delta table —
    * zero data copied, one small JSON commit per snapshot. Each
    * snapshot's manifest diff becomes a Delta commit: dirs entering the
    * manifest contribute `add` actions for their parquet files, dirs
    * leaving contribute `remove`s (a replace/compact shows up exactly
    * as Delta expects: old files removed, new files added, same
    * commit). Merge-on-read delete dirs refuse loudly — Delta expresses
    * row-level deletes as deletion vectors, not equality-delete files,
    * so a faithful export of a MOR chain needs a compact first.
    * Returns the number of Delta commits written. */
  def exportDeltaLog(spark: SparkSession, snapshotRoot: String): Int = {
    val fs = new Path(snapshotRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids = SnapshotTable.snapshots(spark, snapshotRoot)
    require(ids.nonEmpty, s"no committed snapshot at $snapshotRoot")
    def filesOf(dir: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) {
          val full = st.getPath.toUri.getPath
          val root = fs.makeQualified(new Path(snapshotRoot)).toUri.getPath
          out += full.stripPrefix(root + "/")
        }
      }
      walk(new Path(snapshotRoot, dir))
      out.toSeq.sorted
    }
    val logDir = new Path(s"$snapshotRoot/_delta_log")
    fs.delete(logDir, true) // re-export replaces the previous translation
    fs.mkdirs(logDir)
    var prevDirs = Seq.empty[String]
    ids.zipWithIndex.foreach { case (id, idx) =>
      val dirs = SnapshotTable.dirsAt(spark, snapshotRoot, id)
      require(dirs.forall(d => !d.substring(d.lastIndexOf('/') + 1)
          .startsWith("del-")),
        s"snapshot $id carries merge-on-read deletes — compact before " +
          "exporting a Delta log (Delta models row deletes as deletion " +
          "vectors, not equality-delete files)")
      val added = dirs.filterNot(prevDirs.contains).flatMap(filesOf)
      val removed = prevDirs.filterNot(dirs.contains).flatMap(filesOf)
      val header = if (idx == 0) Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"graft-${new Path(snapshotRoot).getName}","format":{"provider":"parquet"}}}""")
      else Nil
      // protocol: paths are relative percent-encoded URIs (spaces, '=',
      // '%' in file names must round-trip); encoding leaves no JSON
      // metacharacters behind, but escape defensively anyway
      def enc(p: String): String = {
        val encoded = new java.net.URI(null, null, p, null).getRawPath
        encoded.replace("\\", "\\\\").replace("\"", "\\\"")
      }
      val lines = header ++
        removed.map(p => s"""{"remove":{"path":"${enc(p)}","dataChange":true}}""") ++
        added.map(p => s"""{"add":{"path":"${enc(p)}","dataChange":true}}""")
      val out = fs.create(new Path(logDir, f"$idx%020d.json"), true)
      try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
      prevDirs = dirs
    }
    ids.size
  }
}
