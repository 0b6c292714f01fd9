package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interop front door for the PUBLIC Apache Hudi COPY-ON-WRITE table
  * layout (the `.hoodie/` timeline + base-file naming convention,
  * documented in the open Hudi spec): resolve the table's live FILE
  * SLICES from the completed timeline and read them — no Hudi library
  * needed. The second leg of the lake-migration story next to
  * [[DeltaCompat]]: a CoW Hudi table is plain parquet whose visibility
  * rules live in file NAMES (`<fileId>_<writeToken>_<instantTime>
  * .parquet`) plus the timeline (`.hoodie/<instant>.commit` appears
  * only when the commit COMPLETED; `.commit.inflight` /
  * `.commit.requested` mark in-flight writers whose data files must
  * stay invisible).
  *
  * Snapshot semantics replayed here:
  *  - only instants with a completed `<ts>.commit` are visible — a
  *    crashed/racing writer leaves data files carrying an instant that
  *    never completed, and they are filtered out by instant, exactly
  *    how Hudi readers get atomicity over eventually-consistent
  *    storage;
  *  - an UPDATE rewrites a file group: same `fileId`, new base file at
  *    the new instant. Per (partition, fileId) the LATEST completed
  *    instant wins — the "latest file slice" rule.
  *
  * Scope (checked loudly): COPY_ON_WRITE only. A MERGE_ON_READ table
  * (`.deltacommit` instants / `.log.*` files) needs the Hudi log-block
  * format merged at read time; `replacecommit` (clustering /
  * insert_overwrite) re-points file groups through replace metadata
  * this reader does not parse. Both refuse rather than silently
  * returning stale slices. File listing walks the table tree
  * driver-side — the layout every Hudi reader falls back to without
  * the optional metadata table; at very large file counts the listing
  * itself should come from `.hoodie/metadata/` (out of scope, named
  * loudly in the error path should it matter: listing cost, not
  * correctness).
  */
object HudiCompat {

  private val CompletedCommit = """^(\d+)\.commit$""".r
  private val BaseFile = """^([^_]+)_([^_]+)_(\d+)\.parquet$""".r

  /** Completed commit instants on the timeline, ascending. */
  def completedInstants(spark: SparkSession, dir: String): Seq[String] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = new Path(s"$dir/.hoodie")
    require(fs.exists(meta), s"$dir has no .hoodie — not a Hudi table")
    val names = fs.listStatus(meta).map(_.getPath.getName)
    require(!names.exists(_.endsWith(".deltacommit")),
      s"$dir carries .deltacommit instants — a MERGE_ON_READ table " +
        "whose log blocks this compat reader cannot merge; compact to " +
        "base files (or read through Hudi) instead")
    require(!names.exists(_.endsWith(".replacecommit")),
      s"$dir carries .replacecommit instants — clustering/insert_overwrite " +
        "re-points file groups through replace metadata this reader does " +
        "not parse; reading by file slice alone would return stale groups")
    names.collect { case CompletedCommit(ts) => ts }.toSeq.sorted
  }

  /** The live base-file paths: per (partition, fileId) the latest
    * COMPLETED instant's base file. `asOf` = TIME TRAVEL: only instants
    * at or before it participate, so the table reads as it stood at
    * that commit (slices rewritten later resolve to their older base
    * file while it still exists — i.e. until cleaning reclaims it, the
    * standard Hudi retention caveat). */
  def liveFiles(spark: SparkSession, dir: String,
      asOf: Option[String] = None): Seq[String] = {
    val completed = completedInstants(spark, dir)
      .filter(ts => asOf.forall(ts <= _)).toSet
    require(completed.nonEmpty, s"no completed commits at $dir" +
      asOf.map(v => s" at or before instant $v").getOrElse(""))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(new Path(dir)).toUri.getPath
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, String)]
    def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory) { if (name != ".hoodie") walk(st.getPath) }
      else name match {
        case BaseFile(fileId, _, instant) =>
          val full = st.getPath.toUri.getPath
          // partition = the file's PARENT dir relative to the table
          // root ("" for a non-partitioned table, where base files sit
          // at the root). Derived structurally — string-stripping the
          // file name off `full` would leave the name itself as the
          // partition at root, giving every file a unique slice key
          // and silently disabling latest-file-slice dedup.
          val partition = st.getPath.getParent.toUri.getPath
            .stripPrefix(root).stripPrefix("/")
          if (completed.contains(instant)) out += ((partition, fileId, instant, full))
        case _ =>
          require(!name.contains(".log."),
            s"$dir holds Hudi log files ($name) — a MERGE_ON_READ table " +
              "whose log blocks this compat reader cannot merge")
        // other marker/metadata sidecars and foreign files: not base files
      }
    }
    walk(new Path(dir))
    require(out.nonEmpty, s"Hudi table at $dir has no visible base files")
    out.groupBy(t => (t._1, t._2)).values
      .map(_.maxBy(_._3)._4).toSeq.sorted
  }

  /** Read the table's current snapshot (CoW), or (`asOf`) a past one. */
  def readHoodieTable(spark: SparkSession, dir: String,
      asOf: Option[String] = None): DataFrame =
    spark.read.parquet(liveFiles(spark, dir, asOf): _*)

  /** INCREMENTAL QUERY (Hudi's flagship consumption mode, file-slice
    * granularity): the LIVE base files whose instant is AFTER
    * `sinceInstant` — i.e. the file groups created or rewritten since
    * the consumer's last checkpoint. CoW rewrites carry the whole file
    * group, so a consumer re-processes the touched groups (upserting
    * by key downstream), never the untouched ones; row-level change
    * extraction inside a group needs the `_hoodie_commit_time` meta
    * column real Hudi writers embed — out of scope for foreign files
    * that lack it. */
  def incrementalFiles(spark: SparkSession, dir: String,
      sinceInstant: String): Seq[String] = {
    val all = liveFiles(spark, dir)
    all.filter { p =>
      new Path(p).getName match {
        case BaseFile(_, _, instant) => instant > sinceInstant
        case _ => false
      }
    }
  }

  /** Read the file groups created/rewritten after `sinceInstant`. */
  def readIncremental(spark: SparkSession, dir: String,
      sinceInstant: String): DataFrame = {
    val files = incrementalFiles(spark, dir, sinceInstant)
    require(files.nonEmpty, s"no file slices after $sinceInstant at $dir")
    spark.read.parquet(files: _*)
  }

  /** Test/export fixture support: write one base file for `fileId` at
    * `instant` under `partition`, plus (optionally) the completed
    * commit marker. Writers in-flight simply skip [[completeCommit]] —
    * exactly the visibility protocol. */
  def writeBaseFile(df: DataFrame, dir: String, partition: String,
      fileId: String, instant: String): Unit = {
    val spark = df.sparkSession
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = s"$dir/.tmp-$fileId-$instant"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = fs.listStatus(new Path(tmp)).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no parquet written at $tmp"))
    fs.mkdirs(new Path(s"$dir/$partition"))
    val dst = new Path(s"$dir/$partition/${fileId}_0-0-0_$instant.parquet")
    fs.delete(dst, false)
    require(fs.rename(part, dst), s"rename $part -> $dst failed")
    fs.delete(new Path(tmp), true)
  }

  /** Mark `instant` requested+inflight (the writer-side breadcrumbs a
    * reader must ignore until completion). */
  def beginCommit(spark: SparkSession, dir: String, instant: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$dir/.hoodie"))
    Seq(s"$instant.commit.requested", s"$instant.commit.inflight").foreach { n =>
      val out = fs.create(new Path(s"$dir/.hoodie/$n"), true)
      try out.write(Array.emptyByteArray) finally out.close()
    }
  }

  /** Complete `instant`: the atomic visibility flip. */
  def completeCommit(spark: SparkSession, dir: String, instant: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(s"$dir/.hoodie/$instant.commit"), true)
    try out.write("{}".getBytes("UTF-8")) finally out.close()
  }
}
