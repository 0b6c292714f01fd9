package graft

import org.apache.spark.sql.functions._

import graft.queries.RelationalQueries
import graft.streaming.EventStreams

/** Streaming/batch consistency: the watermarked streaming hourly
  * aggregation must equal the batch q_events_hourly on the same files,
  * and the stateful sessionizer must run and conserve event counts. */
class StreamingSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("streaming hourly agg equals batch q_events_hourly") {
    val q = EventStreams.runHourlyToMemory(spark, sf, "hourly_test")
    try {
      val streamed = spark.table("hourly_test")
        .select("hour", "event_type", "n_events", "sum_value")
        .collect().map(_.toString).sorted
      val batch = RelationalQueries.qEventsHourly.build(spark, sf)
        .select("hour", "event_type", "n_events", "sum_value")
        .collect().map(_.toString).sorted
      assert(streamed.length == batch.length,
        s"row count: streamed=${streamed.length} batch=${batch.length}")
      assert(streamed.sameElements(batch))
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch join on the same files") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val q = EventStreams.purchasesWithRecentClicks(EventStreams.readEvents(spark, sf))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssj_test")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ssj-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ssj_test")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val e = graft.queries.Tables.events(spark, sf)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("event_id").as("pid"), col("ts").as("pts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("event_id").as("cid"), col("ts").as("cts"))
      val batch = p.join(c, col("pu") === col("cu") &&
          col("cts") >= col("pts") - expr("interval 1 hour") && col("cts") <= col("pts"))
        .select("pid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch.nonEmpty, "batch interval join found no pairs — test data changed?")
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming KMV cardinality equals the batch bottom-k sketch per type") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val k = 64
    val q = EventStreams.kmvDistinctPerType(EventStreams.readEvents(spark, sf), k)
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("kmv_test")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-kmv-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      // last update per type is the drained-stream sketch
      val streamed = spark.table("kmv_test")
        .groupBy(col("event_type"))
        .agg(last(col("n_kept")).as("n_kept"), last(col("kth")).as("kth"))
        .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
      // batch expectation: per-type bottom-k over the same hash
      val batch = graft.queries.Tables.events(spark, sf)
        .select(col("event_type"),
          conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
            .cast("long").as("h"))
        .distinct()
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_type")).orderBy(col("h").asc)))
        .filter(col("rn") <= k)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("int").as("n_kept"), max(col("h")).as("kth"))
        .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("streaming dedup drops within-watermark duplicate event ids") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    // duplicate the stream by unioning it with itself — every event_id
    // arrives twice within the watermark horizon
    val events = EventStreams.readEvents(spark, sf)
    val doubled = events.union(events)
    val q = EventStreams.dedupedEvents(doubled)
      .select("event_id")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_test")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-dedup-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("dedup_test").count()
      val expected = graft.queries.Tables.events(spark, sf).count()
      assert(streamed === expected, s"streamed $streamed vs distinct $expected")
    } finally q.stop()
  }

  test("streaming curation gates + fingerprint dedup match the batch pipeline's survivor set") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val q = EventStreams.curatedDocuments(EventStreams.readDocuments(spark, sf))
      .select("fp")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("curate_test")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-curate-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val streamedFps = spark.table("curate_test").collect().map(_.getString(0)).toSet
      val batchFps = graft.queries.Tables.documents(spark, sf)
        .select(col("text"),
          graft.ops.TextOps.langId(col("text")).as("lang_pred"),
          graft.ops.TextOps.wordCount(col("text")).as("nw"))
        .filter(col("lang_pred") === "en" && col("nw") >= 20)
        .select(graft.ops.TextOps.fingerprint(col("text")).as("fp"))
        .distinct().collect().map(_.getString(0)).toSet
      assert(batchFps.nonEmpty, "batch gates kept nothing — test data changed?")
      assert(streamedFps == batchFps)
    } finally q.stop()
  }

  test("streaming LSH probe of the static bucketed band index equals the batch probe") {
    import org.apache.spark.sql.streaming.Trigger
    val docs = graft.queries.Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 2 === 0).select(col("doc_id"), col("text"))
    graft.ops.Dedup.writeBandIndex(corpus, "doc_id", "text",
      "graft_stream_band_index", buckets = 4,
      path = Some(java.nio.file.Files.createTempDirectory("graft-lsh-idx").toString))
    val index = spark.read.table("graft_stream_band_index")
    // streaming side: the odd-id docs arrive as micro-batches and probe
    // the static index; flags accumulate through the foreachBatch sink
    val flagged = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
    val stream = EventStreams.readDocuments(spark, sf)
      .filter(col("doc_id") % 2 === 1)
    val q = EventStreams.lshDedupStream(stream, index,
        (out, _) => flagged.synchronized {
          flagged ++= out.collect().map(r => (r.getLong(0), r.getLong(1)))
        })
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-lsh-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val batchFlags = graft.ops.Dedup.incrementalLshDups(
          docs.filter(col("doc_id") % 2 === 1).select(col("doc_id"), col("text")),
          index, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batchFlags.nonEmpty, "batch probe flagged nothing — test data changed?")
      assert(flagged.toSet == batchFlags)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS graft_stream_band_index")
    }
  }

  test("staged multi-batch LSH probe: >=2 micro-batches, union independent of the file split") {
    import org.apache.spark.sql.streaming.Trigger
    val docs = graft.queries.Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 2 === 0).select(col("doc_id"), col("text"))
    val index = graft.ops.Dedup.minhashBandIndex(corpus, "doc_id", "text",
      shingleN = 3, k = 8, rowsPerBand = 2)
    val probe = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 300000).as("doc_id"),
        concat(col("text"), lit(" extratoken")).as("text"))
    val staged = java.nio.file.Files.createTempDirectory("graft-lsh-staged").toString
    probe.repartitionByRange(3, col("doc_id")).write.mode("overwrite").parquet(staged)
    val parts = new java.io.File(staged).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    val base = System.currentTimeMillis() - parts.length * 2000L
    parts.zipWithIndex.foreach { case (f, i) => f.setLastModified(base + i * 2000L) }
    val flagged = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
    val batchIds = scala.collection.mutable.Set.empty[Long]
    val stream = spark.readStream.schema(probe.schema).format("parquet")
      .option("maxFilesPerTrigger", "1").load(staged)
    val q = EventStreams.lshDedupStream(stream, index,
        (out, bid) => flagged.synchronized {
          batchIds += bid
          flagged ++= out.collect().map(r => (r.getLong(0), r.getLong(1)))
        })
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-lsh-stg-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(batchIds.size >= 2, s"expected a multi-batch drive, got $batchIds")
      val oneShot = graft.ops.Dedup.incrementalLshDups(
          probe, index, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(oneShot.nonEmpty)
      assert(flagged.toSet == oneShot)
    } finally q.stop()
  }

  test("event-time sessionizer is file-split invariant (2-batch == 6-batch drive)") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    def run(nFiles: Int): Set[(Long, Long, Long, Double)] =
      EventStreams.drainToMemory(
          EventStreams.sessionizeEventTime(
            EventStreams.eventsMultiBatchStream(spark, sf, nFiles)
              .filter(col("user_id") % 10 === 0)
              .as[EventStreams.Event],
            gapMinutes = 30).toDF(),
          OutputMode.Append, s"sess_split_$nFiles", statePartitions = Some(2))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
    val two = run(2)
    val six = run(6)
    assert(two.nonEmpty, "sessionizer emitted nothing")
    // WHAT is emitted (the closed session set, timeout- and data-closed
    // alike) must depend only on the data and the final watermark, never
    // on which micro-batch carried which rows
    assert(two == six,
      s"session set depends on the file split: only-in-2=${two.diff(six).take(3)} " +
        s"only-in-6=${six.diff(two).take(3)}")
  }

  test("left-outer interval join: null rows are file-split invariant and disjoint from matches") {
    import org.apache.spark.sql.streaming.OutputMode
    // across a multi-batch drive, null rows trickle out as the watermark
    // advances; the FINAL emitted set (matches + nulls) must equal the
    // one-shot drain's — eviction timing is pacing, not semantics
    def run(src: org.apache.spark.sql.DataFrame, tag: String) =
      EventStreams.drainToMemory(
          EventStreams.purchasesWithClicksLeftOuter(src),
          OutputMode.Append, s"louter_$tag", statePartitions = Some(2))
        .select(col("user_id"), col("purchase_id"), col("click_id"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val oneShot = run(EventStreams.readEvents(spark, sf), "one")
    val multi = run(EventStreams.eventsMultiBatchStream(spark, sf, nFiles = 4), "multi")
    assert(oneShot.nonEmpty && oneShot == multi,
      s"outer-join result depends on batching: only-one=${oneShot.diff(multi).take(3)} " +
        s"only-multi=${multi.diff(oneShot).take(3)}")
    // a purchase never emits both a matched row and a null row
    val nullIds = oneShot.collect { case (_, p, -1L) => p }
    val matchedIds = oneShot.collect { case (_, p, c) if c != -1L => p }.toSet
    assert(nullIds.forall(!matchedIds.contains(_)), "null row for a matched purchase")
  }

  test("native session_window stream is file-split invariant (2-batch == 6-batch drive)") {
    import org.apache.spark.sql.streaming.OutputMode
    import org.apache.spark.sql.types.DecimalType
    // sessions MERGE in the state store when split across micro-batches;
    // the emitted (watermark-finalized) session set must depend only on
    // the data and the final watermark, never on the file split
    def run(nFiles: Int): Set[(Long, java.sql.Timestamp, Long, Double)] =
      EventStreams.drainToMemory(
          EventStreams.eventsMultiBatchStream(spark, sf, nFiles)
            .filter(col("user_id") % 10 === 0)
            .withWatermark("ts", "30 minutes")
            .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
            .agg(count(lit(1)).as("n_events"),
              sum(col("value").cast(DecimalType(18, 4))).cast("double")
                .as("total_value")),
          OutputMode.Append, s"swin_split_$nFiles", statePartitions = Some(2))
        .select(col("user_id"), col("session_window.start"), col("n_events"),
          col("total_value"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
        .toSet
    val two = run(2)
    val six = run(6)
    assert(two.nonEmpty, "session_window stream emitted nothing")
    assert(two == six,
      s"session set depends on the file split: only-in-2=${two.diff(six).take(3)} " +
        s"only-in-6=${six.diff(two).take(3)}")
  }

  test("stateful sessionizer runs and emits sessions on timeout-free drain") {
    import spark.implicits._
    val events = graft.queries.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.Event]
    // batch Dataset drive of the same state logic: group sizes must match
    val counts = events.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == events.count())
    // the streaming transformation itself must at least plan + type-check
    // against a streaming source (state semantics driven in production)
    val streamEvents = EventStreams.readEvents(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.Event]
    val sessions = EventStreams.sessionize(streamEvents)
    assert(sessions.isStreaming)
  }

  test("stream-static broadcast enrichment + row-local split equal their batch twins") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val dim = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    val enriched = EventStreams.enrichedWithDim(
      EventStreams.readEvents(spark, sf), dim, "user_id")
    // row-local ops compose on the stream unchanged: deterministic split
    val split = graft.ops.Sampling.deterministicSplit(
      enriched, "event_id", "split", Seq("train" -> 90, "test" -> 100))
    val q = split.select("event_id", "segment", "split")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("enrich_test")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-enrich-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("enrich_test").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2))).toSet
      val batch = graft.ops.Sampling.deterministicSplit(
          graft.queries.Tables.events(spark, sf).join(broadcast(dim), Seq("user_id"), "left"),
          "event_id", "split", Seq("train" -> 90, "test" -> 100))
        .select("event_id", "segment", "split").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2))).toSet
      assert(batch.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("streaming SpaceSaving hitters with headroom equal the exact batch counts") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    // capacity far above the per-type distinct-user count -> no eviction
    // -> counts are exact and deterministic
    val q = EventStreams.spaceSavingHitters(
        EventStreams.readEvents(spark, sf), capacity = 100000, topN = 5)
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("ss_exact_test")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ss-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ss_exact_test")
        .groupBy(col("event_type")).agg(last(col("top")).as("top"))
        .select(col("event_type"), explode(col("top")).as("h"))
        .select(col("event_type"), col("h.user_id"), col("h.cnt"), col("h.err"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(col("cnt").desc, col("user_id").asc)
      val batch = graft.queries.Tables.events(spark, sf)
        .groupBy(col("event_type"), col("user_id").cast("string").as("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select(col("event_type"), col("user_id"), col("cnt"), lit(0L).as("err"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed.nonEmpty && streamed == batch,
        s"streamed=${streamed.take(5)} batch=${batch.take(5)}")
    } finally q.stop()
  }

  test("streaming SpaceSaving under eviction keeps the classical guarantees") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val cap = 16
    val q = EventStreams.spaceSavingHitters(
        EventStreams.readEvents(spark, sf), capacity = cap, topN = cap)
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("ss_evict_test")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ss-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val lastRows = spark.table("ss_evict_test")
        .groupBy(col("event_type"))
        .agg(last(col("top")).as("top"), last(col("n_seen")).as("n_seen"))
        .collect()
      val truth = graft.queries.Tables.events(spark, sf)
        .groupBy(col("event_type"), col("user_id").cast("string").as("user_id"))
        .agg(count(lit(1)).as("cnt")).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(lastRows.nonEmpty)
      lastRows.foreach { row =>
        val tpe = row.getString(0)
        val top = row.getSeq[org.apache.spark.sql.Row](1)
          .map(h => (h.getString(0), h.getLong(1), h.getLong(2)))
        val nSeen = row.getLong(2)
        val tracked = top.map(_._1).toSet
        // 1. every key with true count > n_seen/cap is in the summary
        truth.collect { case ((t, u), c) if t == tpe && c > nSeen / cap => u }
          .foreach(u => assert(tracked.contains(u),
            s"type $tpe: heavy user $u missing from summary"))
        // 2. for tracked keys: cnt - err <= true <= cnt
        top.foreach { case (u, cnt, err) =>
          val t = truth.getOrElse((tpe, u), 0L)
          assert(t <= cnt && t >= cnt - err,
            s"type $tpe user $u: true=$t not in [${cnt - err}, $cnt]")
        }
      }
    } finally q.stop()
  }

  test("interval join state is evicted under watermark advance (bounded across micro-batches)") {
    // stream_interval_join's driver gate checks COMPLETENESS only; this
    // pins the scale property that makes the design 100 TB-viable: the
    // event-time range predicate + watermarks let Spark EVICT buffered
    // rows, so state tracks the join window, not the stream's history.
    // Drive: files of strictly advancing event time, one per micro-batch
    // (maxFilesPerTrigger=1), then read per-batch state-store totals from
    // the progress log.
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import spark.implicits._
    val streamDir = java.nio.file.Files.createTempDirectory("graft-ssj-state")
    val nFiles = 8; val hoursPerFile = 12; val usersN = 10
    val perFileRows = hoursPerFile * usersN * 2
    for (f <- 0 until nFiles) {
      val rows = for {
        h <- 0 until hoursPerFile; u <- 0 until usersN; isPurchase <- Seq(false, true)
      } yield {
        val hour = f * hoursPerFile + h
        val ts = java.sql.Timestamp.valueOf(
          java.time.LocalDateTime.of(2026, 1, 1, 0, 0).plusHours(hour).plusMinutes(u))
        (f.toLong * 100000 + h * 1000 + u * 2 + (if (isPurchase) 1 else 0),
          ts, u.toLong, if (isPurchase) "purchase" else "click", 1.0, "{}")
      }
      // one single-part write per file, copied to a lexicographically
      // increasing name so the file source's oldest-first order is the
      // event-time order
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-ssj-part-$f")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(streamDir.toFile, f"f$f%03d.parquet")
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      dest.setLastModified(1000000L + f * 60000L)
    }
    val schema = spark.read.parquet(streamDir.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
    val q = EventStreams.purchasesWithRecentClicks(stream)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssj_state_test")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ssj-state-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val stateRows = q.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty)
        .map(_.stateOperators.map(_.numRowsTotal).sum)
      assert(stateRows.size >= nFiles - 1,
        s"expected ~$nFiles micro-batches, saw ${stateRows.size} — file-per-trigger pacing broke")
      val totalRows = nFiles.toLong * perFileRows
      // Unbounded buffering would retain ~all seen rows by the last
      // batches (state ~ totalRows). Eviction keeps state near one
      // batch's window: assert BOTH the peak and the final state sit far
      // below history, with generous margins for eviction lag (watermark
      // applies a batch late under AvailableNow).
      assert(stateRows.max <= totalRows / 2,
        s"peak state ${stateRows.max} ~ history $totalRows: no eviction happening")
      assert(stateRows.last <= 3L * perFileRows,
        s"final state ${stateRows.last} exceeds ~one window (${3L * perFileRows})")
      // and the join still produced output (the gate's completeness is
      // checked against DuckDB by the driver; here just non-vacuousness)
      assert(spark.table("ssj_state_test").count() > 0)
    } finally q.stop()
  }

  test("checkpoint resume is exactly-once: stop mid-stream, restart, no loss or duplication") {
    // The production restart contract: a stream killed between
    // micro-batches and restarted on the SAME checkpoint must deliver
    // every input row exactly once to an idempotent-append sink. Drive:
    // phase 1 processes the first files one per batch and stops; phase 2
    // restarts on the same checkpoint + directory (now holding more
    // files) and drains. The union of foreachBatch outputs must equal
    // the batch answer over all files — no re-emission of phase-1
    // batches, no gap at the boundary.
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val streamDir = java.nio.file.Files.createTempDirectory("graft-resume")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-resume-ckpt").toString
    def writeFile(f: Int): Unit = {
      val rows = (0 until 100).map(i => (f.toLong * 1000 + i, s"v$f"))
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-resume-part-$f")
      rows.toDF("id", "tag").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(streamDir.toFile, f"f$f%03d.parquet").toPath)
    }
    (0 until 3).foreach(writeFile)
    val schema = spark.read.parquet(streamDir.toString).schema
    val seen = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Long)]()) // (batchId-tagged run, id)
    def run(runId: Long, stopAfterBatches: Option[Int]): Unit = {
      val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("id").collect().foreach(r => seen.add((runId, r.getLong(0))))
          nBatches.incrementAndGet()
          // phase 1 "crashes" after the stop threshold by throwing —
          // the query dies between batch commits, like a lost driver
          stopAfterBatches.foreach { n =>
            if (nBatches.get() >= n) throw new RuntimeException("simulated crash")
          }
          ()
        }
        .start()
      try q.awaitTermination()
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
      finally q.stop()
    }
    run(1L, stopAfterBatches = Some(2)) // dies during/after the 2nd batch
    (3 until 5).foreach(writeFile)      // more data arrives while down
    run(2L, stopAfterBatches = None)    // restart on the same checkpoint
    val delivered = seen.toArray.map(_.asInstanceOf[(Long, Long)]).toSeq
    val expected = spark.read.parquet(streamDir.toString)
      .select("id").as[Long].collect().toSet
    // batch 2's rows were delivered to the sink but its commit may not
    // have landed before the crash — Spark REPLAYS it on restart; the
    // foreachBatch contract is exactly-once only for idempotent sinks
    // (batchId-keyed overwrite). Dedup by id (what an idempotent sink
    // does) and demand exact equality; also pin that phase 2 did NOT
    // re-deliver phase-1's COMMITTED batch 1.
    assert(delivered.map(_._2).toSet == expected,
      s"resume lost or invented rows: got ${delivered.size} deliveries")
    val phase1Ids = delivered.filter(_._1 == 1L).map(_._2).toSet
    val replayed = delivered.filter(d => d._1 == 2L && phase1Ids.contains(d._2))
      .map(_._2).toSet
    // the crash lands in file f001's batch (ids 1000-1099): only IT may
    // legitimately be replayed; f000's batch committed and must not be
    assert(replayed.subsetOf((1000L until 1100L).toSet),
      s"restart replayed a COMMITTED batch (ids ${replayed.take(5)}...) — " +
        "checkpoint offsets went backwards")
  }

  test("drained stream gates re-run safely in one session (unique sink per drain)") {
    // Bench reps and the driver both run a query's build() repeatedly in
    // ONE session — each drain must get a fresh sink/checkpoint (no
    // name collision with the stopped prior query, no stale table) and
    // the arrival-order-independent projection must come back identical.
    val q = graft.queries.StreamingQueries.streamDedupKeys
    val a = q.build(spark, sf).collect().map(_.toString)
    val b = q.build(spark, sf).collect().map(_.toString)
    assert(a.nonEmpty && a.sameElements(b))
    // and the drained set IS the batch distinct on the same files
    val batch = graft.queries.Tables.events(spark, sf)
      .select("user_id", "event_type").distinct()
      .orderBy("user_id", "event_type").collect().map(_.toString)
    assert(a.sameElements(batch))
  }

  test("stateful packer carries the cursor across micro-batches (4-batch == batch packer)") {
    import org.apache.spark.sql.streaming.OutputMode
    // each shard's pack cursor lives in keyed state; a 4-file id-ordered
    // drive must produce the IDENTICAL per-doc chunk assignment as the
    // one-shot batch packer — state carry, not per-batch restart
    val multi = EventStreams.drainToMemory(
        EventStreams.packChunksStream(
          EventStreams.documentsMultiBatchStream(spark, sf, nFiles = 4),
          nShards = 8, budgetTokens = 1000).toDF(),
        OutputMode.Append, "pack_multi", statePartitions = Some(2))
      .select("shard", "doc_id", "chunk_id", "n_tokens", "straddles")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val batch = graft.ops.Packing
      .assignChunks(graft.queries.Tables.documents(spark, sf),
        "doc_id", "text", nShards = 8, budgetTokens = 1000)
      .select(col("shard"), col("id"), col("chunk_id"), col("n_tokens"),
        when(col("straddles"), 1L).otherwise(0L))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(multi.nonEmpty && multi == batch,
      s"cursor lost across batches: only-stream=${multi.diff(batch).take(3)} " +
        s"only-batch=${batch.diff(multi).take(3)}")
  }

  test("streaming attribution carries the last-click channel across micro-batches") {
    import org.apache.spark.sql.streaming.OutputMode
    // the per-user channel lives in keyed state: a 4-file ts-ordered
    // drive must attribute every purchase identically to the one-shot
    // drive (clicks in earlier batches attribute purchases in later ones)
    def run(src: org.apache.spark.sql.DataFrame, tag: String) =
      EventStreams.drainToMemory(
          EventStreams.attributeLastTouch(src).toDF(),
          OutputMode.Append, s"attr_$tag", statePartitions = Some(2))
        .select("event_id", "channel")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val oneShot = run(EventStreams.readEvents(spark, sf), "one")
    val multi = run(EventStreams.eventsMultiBatchStream(spark, sf, nFiles = 4), "multi")
    assert(oneShot.nonEmpty && oneShot == multi,
      s"attribution depends on batching: only-one=${oneShot.diff(multi).take(3)} " +
        s"only-multi=${multi.diff(oneShot).take(3)}")
    // and some purchase must be attributed to a non-organic channel
    assert(oneShot.exists(_._2 != "organic"), "no click ever attributed")
  }
}
