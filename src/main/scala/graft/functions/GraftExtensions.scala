package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registers the engine's native expressions for SQL use.
  *
  * Two entry points:
  *  - `withExtensions(new GraftExtensions)` at session build time
  *    (`SparkSessionExtensions.injectFunction`) — the standard extension
  *    wiring for clusters;
  *  - [[GraftExtensions.register]] on a live session, for notebooks/tests.
  *
  * After registration: `SELECT float_vector_dot(a.embedding, b.embedding)`
  * works in `spark.sql` with the same codegen'd implementation as the
  * `graft.functions.float_dot` Column API. The integer-vector kernels
  * (`long_vector_dot` / `long_vector_sqdist` / `long_vector_argmin_key`),
  * `mix64` and the `long_gram_matrix` aggregate are registered too, so
  * the whole deterministic-arithmetic family is reachable from SQL.
  * (The bloom probe is not SQL-registrable: it closes over a broadcast
  * filter handle, which has no literal SQL form.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach(ext.injectFunction)
    ext.injectTableFunction(GraftExtensions.snapshotTableTvf)
    ext.injectTableFunction(GraftExtensions.snapshotBranchTvf)
    ext.injectTableFunction(GraftExtensions.deltaTableTvf)
    ext.injectTableFunction(GraftExtensions.hudiTableTvf)
    ext.injectTableFunction(GraftExtensions.icebergTableTvf)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinThreshold)
    ext.injectOptimizerRule(_ => graft.plans.SummaryRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RowPolicy)
    ext.injectOptimizerRule(_ => graft.plans.JoinElimination)
    ext.injectOptimizerRule(_ => graft.plans.DistinctElimination)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got $other")
  }

  private def build(children: Seq[Expression]): Expression = {
    require(children.length == 2, "float_vector_dot takes exactly 2 arguments")
    FloatVectorDot(children.head, children(1))
  }

  private def buildMd5(children: Seq[Expression]): Expression = {
    require(children.length == 1, "md5_hash64 takes exactly 1 argument")
    Md5Hash64(children.head)
  }

  private def buildTopK(children: Seq[Expression]): Expression = {
    require(children.length == 3, "topk_pairs takes (score, id, k)")
    TopKPairs(children.head, children(1), intLit(children(2), "topk_pairs k"))
  }

  private def buildLongDot(children: Seq[Expression]): Expression = {
    require(children.length == 2, "long_vector_dot takes exactly 2 arguments")
    LongVectorDot(children.head, children(1))
  }

  private def buildLongSqDist(children: Seq[Expression]): Expression = {
    require(children.length == 2, "long_vector_sqdist takes exactly 2 arguments")
    LongVectorSqDist(children.head, children(1))
  }

  private def buildArgmin(children: Seq[Expression]): Expression = {
    require(children.length == 4, "long_vector_argmin_key takes (vec, cmat, cids, k)")
    LongVectorArgminKey(children.head, children(1), children(2),
      intLit(children(3), "long_vector_argmin_key k"))
  }

  private def buildMix64(children: Seq[Expression]): Expression = {
    require(children.length == 3, "mix64 takes (value, a, b)")
    Mix64(children.head, longLit(children(1), "mix64 a"), longLit(children(2), "mix64 b"))
  }

  private def buildBagScore(children: Seq[Expression]): Expression = {
    require(children.length == 2, "hashed_bag_score takes (tokens, weights)")
    HashedBagScore(children.head, children(1))
  }

  private def buildGram(children: Seq[Expression]): Expression = {
    require(children.length == 2, "long_gram_matrix takes (vec, d)")
    LongGramMatrix(children.head, intLit(children(1), "long_gram_matrix d"))
  }

  private def descriptor(name: String, cls: Class[_],
      builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), builder)

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    descriptor("float_vector_dot", classOf[FloatVectorDot], build),
    descriptor("md5_hash64", classOf[Md5Hash64], buildMd5),
    descriptor("topk_pairs", classOf[TopKPairs], buildTopK),
    descriptor("long_vector_dot", classOf[LongVectorDot], buildLongDot),
    descriptor("long_vector_sqdist", classOf[LongVectorSqDist], buildLongSqDist),
    descriptor("long_vector_argmin_key", classOf[LongVectorArgminKey], buildArgmin),
    descriptor("mix64", classOf[Mix64], buildMix64),
    descriptor("long_gram_matrix", classOf[LongGramMatrix], buildGram),
    descriptor("hashed_bag_score", classOf[HashedBagScore], buildBagScore))

  /** `snapshot_table('<root>' [, <snapshot id>])` — the SQL front door
    * to the snapshot layer: a TABLE-VALUED FUNCTION resolving to the
    * manifest-pointer read ([[graft.sources.SnapshotTable.readAt]]),
    * merge-on-read deletes and partition evolution included, so plain
    * `spark.sql` users get transactional reads and time travel without
    * touching the Scala API:
    * {{{ SELECT * FROM snapshot_table('/lake/orders', 3) }}}
    * Registered via [[SparkSessionExtensions.injectTableFunction]] (or
    * [[register]] on a live session). Arguments must be literals — the
    * table a query reads cannot be row-dependent. */
  val snapshotTableTvf: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) = {
    val builder: Seq[Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = { args =>
      val root = args.headOption match {
        case Some(Literal(s, org.apache.spark.sql.types.StringType)) if s != null =>
          s.toString
        case other => throw new IllegalArgumentException(
          s"snapshot_table's first argument is the table root as a string " +
            s"literal, got $other")
      }
      val spark = SparkSession.active
      val df = args.length match {
        case 1 => graft.sources.SnapshotTable.read(spark, root)
        case 2 => graft.sources.SnapshotTable.readAt(spark, root,
          longLit(args(1), "snapshot_table snapshot id"))
        case n => throw new IllegalArgumentException(
          s"snapshot_table takes (root [, snapshot_id]), got $n arguments")
      }
      df.queryExecution.analyzed
    }
    (FunctionIdentifier("snapshot_table"),
      new ExpressionInfo("graft.sources.SnapshotTable", "snapshot_table"),
      builder)
  }

  /** `snapshot_branch('<root>', '<branch>')` — SQL front door to branch
    * reads ([[graft.sources.SnapshotTable.branchRead]]): the branch's
    * current state, deletes-aware, data resolved against the main
    * root's dir pool:
    * {{{ SELECT * FROM snapshot_branch('/lake/orders', 'dev') }}} */
  val snapshotBranchTvf: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) = {
    def strLit(e: Expression, what: String): String = e match {
      case Literal(s, org.apache.spark.sql.types.StringType) if s != null =>
        s.toString
      case other => throw new IllegalArgumentException(
        s"$what must be a string literal, got $other")
    }
    val builder: Seq[Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = { args =>
      require(args.length == 2, "snapshot_branch takes (root, branch_name)")
      val df = graft.sources.SnapshotTable.branchRead(SparkSession.active,
        strLit(args.head, "snapshot_branch root"),
        strLit(args(1), "snapshot_branch name"))
      df.queryExecution.analyzed
    }
    (FunctionIdentifier("snapshot_branch"),
      new ExpressionInfo("graft.sources.SnapshotTable", "snapshot_branch"),
      builder)
  }

  /** `delta_table('<dir>')` / `hudi_table('<dir>')` /
    * `iceberg_table('<dir>')` — SQL front doors to the foreign-lake
    * compat readers ([[graft.sources.DeltaCompat]],
    * [[graft.sources.HudiCompat]], [[graft.sources.IcebergCompat]]):
    * {{{ SELECT * FROM delta_table('/lake/events') }}}
    * so a migrating SQL user queries a foreign table with zero Scala. */
  private def foreignTvf(name: String, clazz: String,
      read: (SparkSession, String) => org.apache.spark.sql.DataFrame)
      : (FunctionIdentifier, ExpressionInfo,
        Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) = {
    val builder: Seq[Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = { args =>
      val dir = args match {
        case Seq(Literal(s, org.apache.spark.sql.types.StringType)) if s != null =>
          s.toString
        case other => throw new IllegalArgumentException(
          s"$name takes exactly one string literal (the table dir), got $other")
      }
      read(SparkSession.active, dir).queryExecution.analyzed
    }
    (FunctionIdentifier(name), new ExpressionInfo(clazz, name), builder)
  }

  val deltaTableTvf = foreignTvf("delta_table",
    "graft.sources.DeltaCompat", (s, d) => graft.sources.DeltaCompat.readDeltaTable(s, d))
  val hudiTableTvf = foreignTvf("hudi_table",
    "graft.sources.HudiCompat", (s, d) => graft.sources.HudiCompat.readHoodieTable(s, d))
  val icebergTableTvf = foreignTvf("iceberg_table",
    "graft.sources.IcebergCompat", (s, d) => graft.sources.IcebergCompat.readIcebergTable(s, d))

  /** `delta_changes('<dir>', fromV, toV)` — the SQL front door to the
    * Delta CHANGE DATA FEED ([[graft.sources.DeltaCompat
    * .readChangeFeed]]): every row-level change in the commit window
    * `(fromV, toV]` with `_change_type` and `_commit_version`, so a
    * SQL consumer builds incremental pipelines with zero Scala:
    * {{{ SELECT * FROM delta_changes('/lake/events', 3, 7) }}} */
  val deltaChangesTvf: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) = {
    def longOf(e: Expression, what: String): Long = e match {
      case Literal(v: Int, _) => v.toLong
      case Literal(v: Long, _) => v
      case other => throw new IllegalArgumentException(
        s"delta_changes: $what must be an integer literal, got $other")
    }
    val builder: Seq[Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
      case Seq(Literal(s, org.apache.spark.sql.types.StringType), f, t)
          if s != null =>
        graft.sources.DeltaCompat.readChangeFeed(SparkSession.active,
          s.toString, longOf(f, "fromVersion"), longOf(t, "toVersion"))
          .queryExecution.analyzed
      case other => throw new IllegalArgumentException(
        "delta_changes takes (dir string literal, fromVersion, toVersion), " +
          s"got $other")
    }
    (FunctionIdentifier("delta_changes"),
      new ExpressionInfo("graft.sources.DeltaCompat", "delta_changes"), builder)
  }

  private def allTvfs = Seq(snapshotTableTvf, snapshotBranchTvf,
    deltaTableTvf, hudiTableTvf, icebergTableTvf, deltaChangesTvf)

  /** Register on an already-built session (functions via the registry,
    * the optimizer rule via `experimental.extraOptimizations` — the
    * live-session hook for rules). Idempotent. */
  def register(spark: SparkSession): Unit = {
    descriptors.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        id.funcName, builder, "built-in")
    }
    allTvfs.foreach { tvf =>
      spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
        tvf._1.funcName, tvf._3, "built-in")
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.LevenshteinThreshold))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.LevenshteinThreshold
    if (!spark.experimental.extraOptimizations.contains(graft.plans.SummaryRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.SummaryRewrite
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RowPolicy))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RowPolicy
    if (!spark.experimental.extraOptimizations.contains(graft.plans.JoinElimination))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.JoinElimination
    if (!spark.experimental.extraOptimizations.contains(graft.plans.DistinctElimination))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.DistinctElimination
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
  }

  // kept for source compatibility with earlier rounds' wiring examples
  val floatVectorDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    descriptors(0)
  val md5Hash64Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    descriptors(1)
  val topkPairsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    descriptors(2)
}
