package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Cast, Conv, Expression, ExpressionInfo, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.LongType

/** SQL surface registration: users get the engine's primitives as SQL
  * functions, either at session build time
  * (`spark.sql.extensions=graft.functions.GraftExtensions` /
  * `builder.withExtensions(new GraftExtensions)`) or into a live session
  * via [[GraftExtensions.register]].
  *
  *  - `graft_cosine(a, b)` — fused native cosine ([[CosineSimilarity]]);
  *  - `graft_hash64(s)`    — the project hash (md5-hex → 60-bit long),
  *    composed from builtin expressions so it codegens end-to-end.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    GraftExtensions.tableFunctions.foreach(ext.injectTableFunction)
    // catalog glue (round 18): reads of graftcat tables become the
    // single-scan manifest relation; MERGE INTO lowers onto the
    // row-level merge engine
    ext.injectResolutionRule(session => graft.catalog.GraftResolution(session))
    ext.injectOptimizerRule(_ => LevenshteinPrefilterRule)
    ext.injectOptimizerRule(_ => graft.plans.TopKWindowRewriteRule)
    ext.injectOptimizerRule(_ => graft.plans.ManifestMetadataAggRule)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}

object GraftExtensions {

  private def hash64Expr(child: Expression): Expression =
    Cast(Conv(Substring(Md5(child), Literal(1), Literal(15)), Literal(16), Literal(10)), LongType)

  /** The injectable (identifier, info, builder) triples. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_cosine(arrayA, arrayB)")
        CosineSimilarity(args.head, args(1))
      }),
    (
      new FunctionIdentifier("graft_jaccard"),
      new ExpressionInfo(classOf[ArrayJaccard].getName, "graft_jaccard"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_jaccard(arrayA, arrayB)")
        ArrayJaccard(args.head, args(1))
      }),
    (
      new FunctionIdentifier("graft_hash64"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_hash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_hash64(str)")
        hash64Expr(args.head)
      }),
    // Spark ships BloomFilterAggregate/BloomFilterMightContain for its
    // runtime join filtering but does not register them as SQL
    // functions; exposing them gives pipelines the classic 100 TB
    // pattern — build a KB-scale sketch of the small side, prefilter
    // the big scan, exact-verify only survivors (q96). The bloom side
    // of graft_might_contain must be foldable or a scalar subquery
    // (Spark's own type check enforces it).
    (
      new FunctionIdentifier("graft_rolling_minhash"),
      new ExpressionInfo(classOf[RollingMinHash].getName, "graft_rolling_minhash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_rolling_minhash(str)")
        RollingMinHash(args.head, RollingMinHash.DefaultWindow, RollingMinHash.DefaultBase)
      }),
    (
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (args: Seq[Expression]) => args match {
        case Seq(child) => new BloomFilterAggregate(child)
        case Seq(child, items) => new BloomFilterAggregate(child, items)
        case Seq(child, items, bits) => new BloomFilterAggregate(child, items, bits)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_agg(xxhash64_value[, est_items[, num_bits]])")
      }),
    (
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_might_contain(bloom, xxhash64_value)")
        BloomFilterMightContain(args.head, args(1))
      }),
  )

  /** SQL TABLE functions (round-17 verdict task 6) — the manifest
    * table features reachable from pure SQL, no Scala API required:
    *
    *  - `graft_table('<root>'[, version])` — the manifested table's
    *    live state, or VERSION AS OF a retained commit. The partition
    *    column comes from the manifest itself; the plan is the same
    *    single-scan [[graft.core.ManifestFileIndex]] relation the
    *    Scala path builds (pushdown, pruning, metadata aggregates all
    *    apply).
    *  - `graft_table_at('<root>', '<ts>')` — TIMESTAMP AS OF: epoch
    *    millis or an ISO-8601 instant, resolved by store mtime like
    *    the option surface.
    *  - `graft_table_changes('<root>', from, to)` — the row-level
    *    change feed between commit versions, Delta's `table_changes`
    *    shape ([[graft.core.ManifestChanges.between]]).
    *
    * Arguments must be literals (foldable) — the standard TVF
    * restriction; the builders fail loudly otherwise.
    */
  val tableFunctions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = {
    def lit(e: Expression, what: String): Any = {
      require(e.foldable, s"$what must be a literal")
      e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    }
    def str(e: Expression, what: String): String = lit(e, what) match {
      case null => throw new IllegalArgumentException(s"$what must not be null")
      case v => v.toString
    }
    def long(e: Expression, what: String): Long = lit(e, what) match {
      case n: java.lang.Number => n.longValue()
      case v => throw new IllegalArgumentException(s"$what must be numeric, got $v")
    }
    def activeSession: SparkSession = SparkSession.getActiveSession.getOrElse(
      throw new IllegalStateException("no active SparkSession for graft table function"))
    def tablePlan(root: String, asOf: Option[Long]) = {
      val spark = activeSession
      val rootPath = new org.apache.hadoop.fs.Path(root)
      val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
      graft.core.ManifestTable.resolve(fs, rootPath) match {
        case Some(m) =>
          graft.core.ManifestFileIndex.relation(spark, root, m.partCol,
            asOfSeq = asOf).queryExecution.analyzed
        case None =>
          require(asOf.isEmpty, s"graft_table: no manifested table at $root — " +
            "time travel needs a commit history")
          spark.read.parquet(root).queryExecution.analyzed
      }
    }
    Seq(
      (
        new FunctionIdentifier("graft_table"),
        new ExpressionInfo(classOf[GraftExtensions].getName, "graft_table"),
        (args: Seq[Expression]) => {
          require(args.length == 1 || args.length == 2,
            "graft_table(root[, versionAsOf])")
          val asOf = args.lift(1).map { e =>
            lit(e, "graft_table versionAsOf") match {
              case n: java.lang.Number => n.longValue()
              case v =>
                // the most common confusion: a timestamp where a
                // version number goes — name the sibling function
                val looksLikeTs = v != null && (scala.util.Try(
                  java.time.Instant.parse(v.toString)).isSuccess ||
                  v.toString.matches("""\d{4}-\d{2}-\d{2}.*"""))
                throw new IllegalArgumentException(
                  if (looksLikeTs)
                    s"graft_table takes a VERSION number; for TIMESTAMP AS OF " +
                      s"semantics use graft_table_at(root, '$v')"
                  else s"graft_table versionAsOf must be numeric, got $v")
            }
          }
          tablePlan(str(args.head, "graft_table root"), asOf)
        }),
      (
        new FunctionIdentifier("graft_table_at"),
        new ExpressionInfo(classOf[GraftExtensions].getName, "graft_table_at"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "graft_table_at(root, timestampAsOf)")
          val root = str(args.head, "graft_table_at root")
          val raw = str(args(1), "graft_table_at timestampAsOf")
          val millis = raw.toLongOption.getOrElse(
            try java.time.Instant.parse(raw).toEpochMilli
            catch { case _: java.time.format.DateTimeParseException =>
              throw new IllegalArgumentException(
                s"graft_table_at: '$raw' is neither epoch millis nor an ISO-8601 instant")
            })
          val spark = activeSession
          val rootPath = new org.apache.hadoop.fs.Path(root)
          val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
          val v = graft.core.ManifestTable.versionAt(fs, rootPath, millis).getOrElse(
            throw new IllegalArgumentException(
              s"graft_table_at: no retained commit at or before $raw (retained: " +
                s"${graft.core.ManifestTable.versions(fs, rootPath).mkString(", ")})"))
          tablePlan(root, Some(v))
        }),
      (
        new FunctionIdentifier("graft_table_changes"),
        new ExpressionInfo(classOf[GraftExtensions].getName, "graft_table_changes"),
        (args: Seq[Expression]) => {
          require(args.length == 3, "graft_table_changes(root, fromVersion, toVersion)")
          graft.core.ManifestChanges.between(activeSession,
            str(args.head, "graft_table_changes root"),
            long(args(1), "graft_table_changes fromVersion"),
            long(args(2), "graft_table_changes toVersion"))
            .queryExecution.analyzed
        }),
    )
  }

  /** Register into an already-running session (extensions only apply at
    * session construction; this covers notebooks/REPLs). Installs the
    * full surface the construction-time path injects: the SQL
    * functions, the TABLE functions AND the optimizer rules/strategy
    * (top-k rewrite, manifest metadata aggregates) — round 15 aligned
    * the two paths so a live session is not silently missing the plan
    * rewrites.
    */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    tableFunctions.foreach { case (ident, info, builder) =>
      spark.sessionState.tableFunctionRegistry.registerFunction(ident, info, builder)
    }
    graft.plans.TopKWindowRewriteRule.install(spark)
    graft.plans.ManifestMetadataAgg.ensure(spark)
    if (!spark.experimental.extraOptimizations.contains(LevenshteinPrefilterRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ LevenshteinPrefilterRule
  }
}
