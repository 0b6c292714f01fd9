package graft

import org.apache.spark.sql.functions._

import graft.plans.SummaryRewrite

/** Behavioral pins for the materialized-summary rewrite rule: matching
  * aggregates are redirected to the summary (proven from the optimized
  * plan's scan path), non-matching shapes are left on the base, and
  * the rewritten results equal the direct computation exactly. */
class SummaryRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toUri.getPath)
          case _ => Nil
        }
    }.flatten

  test("matching aggregates reroute to the summary; results exact; non-matching stay on base") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv").toString
    val base = s"$dir/base"
    val summary = s"$dir/summary"
    val src = (1 to 400).map(i =>
      (i.toLong, s"g${i % 5}", s"h${i % 3}", (i % 97).toLong))
      .toDF("id", "g1", "g2", "v")
    src.write.parquet(base)
    graft.functions.GraftExtensions.register(spark)
    SummaryRewrite.summarize(spark, base, summary,
      groupCols = Seq("g1", "g2"), sumCols = Seq("v"),
      minCols = Seq("v"), maxCols = Seq("v"))
    try {
      val q = spark.read.parquet(base).groupBy(col("g1"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"),
          min(col("v")).as("mn"), max(col("v")).as("mx"))
      assert(scanPaths(q).exists(_.endsWith("/summary")) &&
        !scanPaths(q).exists(_.endsWith("/base")),
        s"matching aggregate must scan the summary, scanned ${scanPaths(q)}")
      // exactness vs the in-memory source (never touched the registry)
      val expected = src.groupBy(col("g1"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"),
          min(col("v")).as("mn"), max(col("v")).as("mx"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val got = q.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(got == expected, "rewritten results diverged from direct computation")
      // ExprId preservation: downstream operators keep resolving
      assert(q.filter(col("n") > 0).orderBy(col("sv").desc).count() == 5)
      // full-lattice grouping (G == G') also matches
      val q2 = spark.read.parquet(base).groupBy(col("g1"), col("g2"))
        .agg(count(lit(1)).as("n"))
      assert(scanPaths(q2).exists(_.endsWith("/summary")))
      assert(q2.agg(sum(col("n"))).head().getLong(0) == 400)
      // non-matching shapes stay on base: filter on a non-group column
      val f = spark.read.parquet(base).filter(col("v") > 50)
        .groupBy(col("g1")).agg(sum(col("v")).as("sv"))
      assert(scanPaths(f).exists(_.endsWith("/base")),
        "filtered aggregate must NOT use the summary")
      // distinct aggregate stays on base
      val dq = spark.read.parquet(base).groupBy(col("g1"))
        .agg(countDistinct(col("v")).as("nd"))
      assert(scanPaths(dq).exists(_.endsWith("/base")))
      // unregistered aggregate column stays on base
      val uq = spark.read.parquet(base).groupBy(col("g1"))
        .agg(sum(col("id")).as("si"))
      assert(scanPaths(uq).exists(_.endsWith("/base")))
      // REFRESH while registered: the rebuild must re-read the BASE,
      // not consume its own (deleted) summary — the repeated-run path
      val fs = new org.apache.hadoop.fs.Path(summary)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(summary), true)
      SummaryRewrite.summarize(spark, base, summary,
        groupCols = Seq("g1", "g2"), sumCols = Seq("v"),
        minCols = Seq("v"), maxCols = Seq("v"))
      val qr = spark.read.parquet(base).groupBy(col("g1"))
        .agg(sum(col("v")).as("sv"))
      assert(scanPaths(qr).exists(_.endsWith("/summary")))
      assert(qr.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        == expected.map { case (k, v) => k -> v._1 })
      // a vacuumed summary fails OPEN back to the base scan
      fs.delete(new org.apache.hadoop.fs.Path(summary), true)
      val qo = spark.read.parquet(base).groupBy(col("g1"))
        .agg(sum(col("v")).as("sv"))
      assert(scanPaths(qo).exists(_.endsWith("/base")))
      assert(qo.count() == 5)
    } finally SummaryRewrite.deregister(base)
  }

  test("row policy: plain reads come back filtered, compose with user filters, converge") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rls").toString
    val base = s"$dir/t"
    val src = (1 to 100).map(i => (i.toLong, if (i % 4 == 0) "secret" else "ok"))
      .toDF("id", "tier")
    src.write.parquet(base)
    graft.functions.GraftExtensions.register(spark)
    graft.plans.RowPolicy.register(base, "tier <> 'secret'")
    try {
      // plain read: policy rows gone
      assert(spark.read.parquet(base).count() == 75)
      assert(spark.read.parquet(base).filter($"tier" === "secret").count() == 0)
      // composes with a user filter; both reach the scan
      val q = spark.read.parquet(base).filter($"id" <= 10)
      assert(q.count() == 8) // ids 1..10 minus 4, 8
      val phys = q.queryExecution.executedPlan.toString
      assert(phys.contains("EqualTo(tier,secret)") && phys.contains("LessThanOrEqual(id,10)"),
        s"both conjuncts must push to the scan:\n$phys")
      // convergence: re-optimizing an already-guarded plan adds nothing
      val once = q.queryExecution.optimizedPlan
      assert(graft.plans.RowPolicy(once).sameResult(once),
        "rule must be a no-op on an already-guarded plan")
      // unknown policy column fails loud at read time
      graft.plans.RowPolicy.register(base, "no_such_col = 1")
      intercept[Exception] { spark.read.parquet(base).count() }
    } finally graft.plans.RowPolicy.deregister(base)
  }

  test("row policy: a scan spanning two differently-governed roots ANDs both policies") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rls2").toString
    val (t1, t2) = (s"$dir/t1", s"$dir/t2")
    val src = (1 to 100).map(i =>
      (i.toLong, if (i % 4 == 0) "secret" else "ok")).toDF("id", "tier")
    src.write.parquet(t1)
    src.write.parquet(t2)
    graft.functions.GraftExtensions.register(spark)
    graft.plans.RowPolicy.register(t1, "tier <> 'secret'")
    graft.plans.RowPolicy.register(t2, "id <= 50L")
    try {
      // one multi-root scan: rows must satisfy BOTH policies — applying
      // whichever iterates first would leak t2's id>50 rows (or t1's
      // secret rows). 2 roots x (ids 1..50 minus the 12 secret) = 76.
      assert(spark.read.parquet(t1, t2).count() == 76)
      // single-root reads keep their own policy only
      assert(spark.read.parquet(t1).count() == 75)
      assert(spark.read.parquet(t2).count() == 50)
    } finally {
      graft.plans.RowPolicy.deregister(t1)
      graft.plans.RowPolicy.deregister(t2)
    }
  }

  test("join elimination: declared FK drops; dim-side filters and mirrored order behave") {
    val dir = java.nio.file.Files.createTempDirectory("graft-je").toString
    val fact = s"$dir/fact"; val dim = s"$dir/dim"
    // ck=30 is an ORPHAN vs dim, ck=null a NULL fk: the eliminated plan
    // must drop neither more nor less than the real join would —
    // register only the INTACT subset contractually, i.e. don't: here we
    // declare anyway and check the rewrite keeps non-null fk rows only
    (Seq((1L, Option(10L), 5L), (2L, Option(20L), 7L), (3L, None, 9L)))
      .toDF("ok", "ck", "v").write.parquet(fact)
    Seq((10L, "a"), (20L, "b")).toDF("c_ck", "seg").write.parquet(dim)
    graft.functions.GraftExtensions.register(spark)
    graft.plans.JoinElimination.registerFk(fact, "ck", dim, "c_ck")
    try {
      def joins(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
        }.size
      val f = spark.read.parquet(fact); val d = spark.read.parquet(dim)
      val q = f.join(d, f("ck") === d("c_ck")).select(f("ok"), f("v"))
      assert(joins(q) == 0, "declared FK join with fact-only output must drop")
      assert(q.count() == 2) // null-fk row gone, like the real inner join
      // mirrored operand order drops too
      val qm = d.join(f, f("ck") === d("c_ck")).select(f("ok"))
      assert(joins(qm) == 0 && qm.count() == 2)
      // a REAL dim-side filter blocks elimination (it changes survivors)
      val qf = f.join(d.filter($"seg" === "a"), f("ck") === d("c_ck"))
        .select(f("ok"))
      assert(joins(qf) == 1 && qf.count() == 1)
      // using a dim column keeps the join
      val qd = f.join(d, f("ck") === d("c_ck")).select(f("ok"), d("seg"))
      assert(joins(qd) == 1)

      // REGRESSION (r13 advice, high): a multi-path fact scan where only
      // ONE root carries the declaration must NOT eliminate — the
      // undeclared path can hold orphan FKs the real join drops
      val fact2 = s"$dir/fact2"
      Seq((4L, Option(99L), 1L)).toDF("ok", "ck", "v").write.parquet(fact2)
      val fm = spark.read.parquet(fact, fact2)
      val qmp = fm.join(d, fm("ck") === d("c_ck")).select(fm("ok"), fm("v"))
      assert(joins(qmp) == 1,
        "partially-declared multi-path fact must keep the join")
      assert(qmp.count() == 2, "orphan ck=99 must not survive")
      // declaring BOTH roots (same dim) re-enables elimination
      graft.plans.JoinElimination.registerFk(fact2, "ck", dim, "c_ck")
      try {
        val fm2 = spark.read.parquet(fact, fact2)
        val q2 = fm2.join(d, fm2("ck") === d("c_ck")).select(fm2("ok"))
        assert(joins(q2) == 0,
          "fully-declared multi-path fact should eliminate")
      } finally graft.plans.JoinElimination.deregister(fact2, "ck")
      // a dim scan that reads MORE than the declared dim path must block
      // (PK uniqueness across the union was never declared)
      val dim2 = s"$dir/dim2"
      Seq((10L, "dup")).toDF("c_ck", "seg").write.parquet(dim2)
      val du = spark.read.parquet(dim, dim2)
      val qdu = f.join(du, f("ck") === du("c_ck")).select(f("ok"))
      assert(joins(qdu) == 1, "multi-path dim must keep the join")
      assert(qdu.count() == 3) // ck=10 matches twice in the union
    } finally graft.plans.JoinElimination.deregister(fact, "ck")
  }

  test("row policy governs descendant-path reads (glob / direct part files)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rls2").toString
    val base = s"$dir/t"
    (1 to 100).map(i => (i.toLong, if (i % 4 == 0) "secret" else "ok"))
      .toDF("id", "tier").coalesce(2).write.parquet(base)
    graft.functions.GraftExtensions.register(spark)
    graft.plans.RowPolicy.register(base, "tier <> 'secret'")
    try {
      // REGRESSION (r13 advice, medium): reading via a glob or direct
      // part-file paths resolves to DESCENDANTS of the registered root
      // and previously bypassed the policy entirely
      assert(spark.read.parquet(s"$base/part-*.parquet").count() == 75,
        "glob read must come back policy-filtered")
      val parts = new java.io.File(base).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      assert(parts.length >= 2)
      assert(spark.read.parquet(parts.head).filter($"tier" === "secret").count() == 0,
        "direct part-file read must come back policy-filtered")
      assert(spark.read.parquet(parts: _*).count() == 75)
    } finally graft.plans.RowPolicy.deregister(base)
  }

  test("distinct elimination: declared unique key drops the dedup; unsafe shapes keep it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-de").toString
    val t = s"$dir/t"
    (1 to 100).map(i => (i.toLong, s"g${i % 5}", (i % 7).toLong))
      .toDF("id", "g", "v").write.parquet(t)
    graft.functions.GraftExtensions.register(spark)
    graft.plans.DistinctElimination.registerUnique(t, Seq("id"))
    try {
      def dedups(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.optimizedPlan.collect {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
          case d: org.apache.spark.sql.catalyst.plans.logical.Deduplicate => d
        }.size
      // distinct over a superset of the key: dropped, values identical
      val q = spark.read.parquet(t).select($"id", $"g").distinct()
      assert(dedups(q) == 0, "key-covering distinct must be eliminated")
      assert(q.count() == 100)
      // SQL DISTINCT, with a filter in between (uniqueness-preserving)
      spark.read.parquet(t).createOrReplaceTempView("de_t")
      val sq = spark.sql("SELECT DISTINCT id, v FROM de_t WHERE v > 2")
      assert(dedups(sq) == 0)
      assert(sq.count() ==
        spark.read.parquet(t).filter($"v" > 2).count())
      // dropDuplicates on a SUBSET not covering the key: kept
      val nk = spark.read.parquet(t).dropDuplicates("g")
      assert(dedups(nk) == 1 && nk.count() == 5)
      // distinct that PROJECTS AWAY the key: kept (g,v are not unique)
      val pa = spark.read.parquet(t).select($"g", $"v").distinct()
      assert(dedups(pa) == 1 && pa.count() ==
        (1 to 100).map(i => (i % 5, i % 7)).distinct.size)
      // grouping-only aggregate (DISTINCT in disguise): dropped; a real
      // aggregate function keeps the Aggregate
      val ga = spark.read.parquet(t).groupBy($"id", $"g").agg(Map.empty[String, String])
      assert(dedups(ga) == 0 && ga.count() == 100)
      val ra = spark.read.parquet(t).groupBy($"id").agg(sum($"v").as("sv"))
      assert(dedups(ra) == 1 && ra.count() == 100)
      // multi-path scan: never eliminable (rows can repeat across roots)
      val t2 = s"$dir/t2"
      spark.read.parquet(t).write.parquet(t2)
      graft.plans.DistinctElimination.registerUnique(t2, Seq("id"))
      try {
        val mp = spark.read.parquet(t, t2).select($"id").distinct()
        assert(dedups(mp) == 1 && mp.count() == 100,
          "multi-path distinct must survive: each root is unique, the union is not")
      } finally graft.plans.DistinctElimination.deregister(t2)
    } finally graft.plans.DistinctElimination.deregister(t)
  }

  test("summary rewrite: grouping-less COUNT over an empty base is 0, not NULL") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv0").toString
    val base = s"$dir/base"; val summary = s"$dir/summary"
    Seq.empty[(Long, String, Long)].toDF("id", "g1", "v").write.parquet(base)
    graft.functions.GraftExtensions.register(spark)
    SummaryRewrite.summarize(spark, base, summary,
      groupCols = Seq("g1"), sumCols = Seq("v"))
    try {
      // REGRESSION (r13 advice, medium): COUNT → bare sum(cnt) decoded
      // NULL at the SQL level for the grouping-less shape on empty input
      val q = spark.read.parquet(base).agg(count(lit(1)).as("n"))
      val row = q.head()
      assert(!row.isNullAt(0) && row.getLong(0) == 0L,
        s"grouping-less count over empty base must be 0, got $row")
      assert(!q.schema("n").nullable, "count output must stay non-nullable")
      // SQL-level isNull must agree (the consumer the bug hit)
      assert(q.select(col("n").isNull.as("b")).head().getBoolean(0) == false)
    } finally SummaryRewrite.deregister(base)
  }
}
