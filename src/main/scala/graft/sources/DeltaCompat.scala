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
  * Scope (checked loudly): JSON commits only. A `_last_checkpoint`
  * indirection (parquet checkpoints replace old JSON) refuses rather
  * than silently reading a stale prefix; deletion vectors and column
  * mapping are newer protocol features a `protocol` line would gate in
  * a full implementation.
  */
object DeltaCompat {

  /** The live data-file paths of the Delta table at `dir`, resolved
    * from its commit log: per path, the LATEST add/remove action wins
    * (the Delta reconciliation rule). */
  def liveFiles(spark: SparkSession, dir: String): Seq[String] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(s"$dir/_delta_log")),
      s"$dir has no _delta_log — not a Delta table")
    require(!fs.exists(new Path(s"$dir/_delta_log/_last_checkpoint")),
      "checkpointed Delta logs are out of scope for this compat reader " +
        "(it would silently miss pre-checkpoint actions); read the " +
        "checkpoint parquet + later JSON in a full implementation")
    val log = spark.read.json(s"$dir/_delta_log/*.json")
      .withColumn("commit",
        regexp_extract(input_file_name(), "(\\d{20})\\.json$", 1).cast("long"))
    val cols = log.columns.toSet
    def pathOf(action: String): org.apache.spark.sql.Column =
      if (cols.contains(action)) col(s"$action.path") else lit(null).cast("string")
    log.select(col("commit"), pathOf("add").as("add_path"),
        pathOf("remove").as("rm_path"))
      .select(col("commit"),
        coalesce(col("add_path"), col("rm_path")).as("path"),
        col("add_path").isNotNull.as("is_add"))
      .filter(col("path").isNotNull)
      .groupBy(col("path"))
      .agg(max_by(col("is_add"), col("commit")).as("live"))
      .filter(col("live"))
      .select(col("path"))
      .collect().map(r => s"$dir/${r.getString(0)}").toSeq.sorted
  }

  /** Read the table's current state. */
  def readDeltaTable(spark: SparkSession, dir: String): DataFrame = {
    val files = liveFiles(spark, dir)
    require(files.nonEmpty, s"Delta table at $dir has no live files")
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
      val lines = header ++
        removed.map(p => s"""{"remove":{"path":"$p","dataChange":true}}""") ++
        added.map(p => s"""{"add":{"path":"$p","dataChange":true}}""")
      val out = fs.create(new Path(logDir, f"$idx%020d.json"), true)
      try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
      prevDirs = dirs
    }
    ids.size
  }
}
