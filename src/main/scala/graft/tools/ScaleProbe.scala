package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** One-off empirical scale-exponent probe (BASELINE.md evidence): times
  * the heavy query family at the base scale factor and at a synthetic
  * `K`x scale-up, and reports the time-vs-rows slope
  * `ln(tK/t1) / ln(K)` per query — ≈1.0 for the linear family, the
  * measured counterpart to the plan-shape pins in PlanAuditSpec.
  *
  * The scaled corpus is built so the WORKLOAD scales linearly, not just
  * the row count:
  *  - `documents`: K id-offset copies with every word suffixed by the
  *    copy index — copies are not exact/near duplicates of each other,
  *    so dedup candidate structure grows linearly (verbatim copies
  *    would multiply duplicate groups instead, a quadratic pair count
  *    no engine scales through);
  *  - `embeddings`: K id-offset copies, rows whose new id lands on the
  *    `% 50 == 0` query-selection residue dropped from copies >= 1 —
  *    the ANN query SET stays fixed while the corpus grows (queries
  *    growing with the corpus measures nq x N = quadratic by design,
  *    not an engine property); same drop applied to documents (the
  *    multimodal similarity queries select by the same residue);
  *  - `events`: K copies with event_id AND user_id offset — per-user
  *    event density is unchanged, so interval-join pair counts and
  *    per-key state grow linearly (offsetting only event_id would 16x
  *    the join output at K=4).
  *
  * Tables are staged as single FILES named `<table>.parquet` to mirror
  * the testdata layout exactly (the streaming sources glob-filter on
  * those names). Dimension tables pass through unscaled.
  *
  * Caveat read with the numbers: local fixed overhead (~0.2-0.5s of
  * job/codegen setup per run) is constant across scales, so CHEAP
  * queries report slopes well under 1.0 — the probe is evidence about
  * the expensive family, where overhead is amortized.
  */
object ScaleProbe {

  private def stageSingleFile(df: DataFrame, dir: String, table: String): Unit = {
    val tmp = s"$dir/_tmp_$table"
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file staged for $table"))
    java.nio.file.Files.move(part.toPath,
      new java.io.File(s"$dir/$table.parquet").toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(tmp))
  }

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = sys.env.getOrElse("SPARK_GRAFT_SCALE", "4").toInt
    require(k >= 2, "scale factor must be >= 2")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.maxFields", "1500")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val scaled = graft.sources.TableIO.scratchDir(spark, s"scaleprobe_${k}x")
    new java.io.File(scaled).mkdirs()
    for (t <- Seq("region", "nation", "supplier", "part",
        "orders", "lineitem"))
      stageSingleFile(spark.read.parquet(s"$sf/$t.parquet"), scaled, t)

    // customer scales like a fact for the record-linkage probe: K
    // id-offset copies with the NAME REGENERATED from the new key
    // (TPC-H's own convention) — verbatim name copies would multiply
    // every linkage block K-fold, a quadratic pair count by design, not
    // an engine property; regenerated names grow the distinct-prefix
    // space linearly instead
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val maxCust = cust.agg(max("c_custkey")).head().getLong(0) + 1
    stageSingleFile((0 until k).map { c =>
      if (c == 0) cust
      else cust.withColumn("c_custkey", col("c_custkey") + lit(c * maxCust))
        .withColumn("c_name", format_string("Customer#%09d", col("c_custkey")))
    }.reduce(_ unionAll _), scaled, "customer")

    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val maxDoc = docs.agg(max("doc_id")).head().getLong(0) + 1
    val maxVec = emb.agg(max("vec_id")).head().getLong(0) + 1
    val maxEvt = ev.agg(max("event_id")).head().getLong(0) + 1
    val maxUser = ev.agg(max("user_id")).head().getLong(0) + 1

    stageSingleFile((0 until k).map { c =>
      if (c == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(c * maxDoc))
        .withColumn("text", regexp_replace(col("text"), "(\\w+)", s"$$1x$c"))
        .filter(col("doc_id") % 50 =!= 0)
    }.reduce(_ unionAll _), scaled, "documents")

    stageSingleFile((0 until k).map { c =>
      if (c == 0) emb
      else emb.withColumn("vec_id", col("vec_id") + lit(c * maxVec))
        .filter(col("vec_id") % 50 =!= 0)
    }.reduce(_ unionAll _), scaled, "embeddings")

    stageSingleFile((0 until k).map { c =>
      if (c == 0) ev
      else ev.withColumn("event_id", col("event_id") + lit(c * maxEvt))
        .withColumn("user_id", col("user_id") + lit(c * maxUser))
    }.reduce(_ unionAll _), scaled, "events")

    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("dedup_segments", "dedup_minhash_lsh", "pipeline_pretrain",
        "pipeline_multimodal", "sim_ivf_pq", "sim_ivf_pq_rerank",
        "text_unigram_lm", "stream_events_hourly", "stream_dedup_keys",
        "stream_curated_docs", "stream_kmv_users", "stream_interval_join")
    val byName = graft.SparkEntry.allQueries.map(q => q.name -> q).toMap
    val unknown = names.filterNot(byName.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    def time(name: String, dir: String, reps: Int = 2): Double = {
      def run(): Unit = byName(name).build(spark, dir)
        .write.format("noop").mode("overwrite").save()
      run() // untimed warmup
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    names.foreach { name =>
      val t1 = time(name, sf)
      val tk = time(name, scaled)
      val slope = math.log(tk / t1) / math.log(k.toDouble)
      println(f"""{"scaleprobe":{"query":"$name","k":$k,"t1_sec":$t1%.2f,"tk_sec":$tk%.2f,"slope":$slope%.2f}}""")
    }
    spark.stop()
  }
}
