package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** `statsCols` (round-16 verdict task 3, Delta's statsCols /
  * dataSkippingNumIndexedCols analog): by default envelopes cover the
  * first [[ParquetStats.MaxCols]] leading columns — silently, so a
  * filter on a wide table's 13th+ column gets no file-level skipping
  * and no metadata min/max. Naming columns at write time aims the
  * budget; the choice persists in the manifest header so compaction,
  * merge and the streaming sink keep the same coverage.
  */
class ManifestStatsColsSpec extends SparkSpec {

  private lazy val tmp = tmpDir("stats-cols")
  private var n = 0
  private def freshRoot(): String = { n += 1; s"$tmp/t$n" }
  private def fs = new Path(tmp).getFileSystem(spark.sessionState.newHadoopConf())

  /** 16 columns: c00..c14 filler leading, `late` LAST — past the
    * default MaxCols=12 budget.
    */
  private def wideDf: DataFrame = {
    val base = spark.range(0, 400).select(
      (0 until 15).map(i => (col("id") * (i + 1)).as(f"c$i%02d")) :+
        col("id").as("late"): _*)
    base
  }

  private def scansIn(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => scansIn(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scansIn(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => (other.children ++ other.subqueries).flatMap(scansIn)
    }

  private def filesRead(df: DataFrame): Long = {
    df.collect() // materialize THIS QueryExecution so its metrics fill
    scansIn(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }

  test("default budget: a 13th+ column has no envelope — filter reads every file, metadata agg scans") {
    val root = freshRoot()
    ManifestWrite.write(wideDf.repartitionByRange(5, col("late")), root, "", SaveMode.Overwrite)
    val m = ManifestTable.resolve(fs, new Path(root)).get
    assert(m.statsCols.isEmpty)
    val covered = m.entries.flatMap(_.allStats).flatMap(_.cols.map(_.col)).toSet
    assert(!covered.contains("late"), s"covered=$covered")
    assert(covered.contains("c00") && covered.size == ParquetStats.MaxCols)
    // no envelope -> conservatism keeps every file
    val narrow = ManifestFileIndex.relation(spark, root, "").filter(col("late") === 7L)
    assert(filesRead(narrow) == 5, "a stats-less column must not skip")
  }

  test("named statsCols: the late column gets the envelope; skipping and metadata min/max work; choice persists") {
    val root = freshRoot()
    ManifestWrite.write(wideDf.repartitionByRange(5, col("late")), root, "", SaveMode.Overwrite,
      options = Map("statsCols" -> "late,c00"))
    val m = ManifestTable.resolve(fs, new Path(root)).get
    assert(m.statsCols == Seq("late", "c00"))
    val covered = m.entries.flatMap(_.allStats).flatMap(_.cols.map(_.col)).toSet
    assert(covered == Set("late", "c00"), s"covered=$covered")
    // file-level skipping on the named late column
    val narrow = ManifestFileIndex.relation(spark, root, "").filter(col("late") === 7L)
    assert(narrow.collect().map(_.getAs[Long]("late")).toSeq == Seq(7L))
    val counted = ManifestFileIndex.relation(spark, root, "").filter(col("late") === 7L)
    assert(filesRead(counted) == 1, "named column must skip to its one range file")
    // metadata aggregate answers from the named column's envelopes
    graft.plans.ManifestMetadataAgg.ensure(spark)
    val meta = ManifestFileIndex.relation(spark, root, "")
      .agg(count(lit(1)).as("n_rows"), min(col("late")).as("lo"), max(col("late")).as("hi"))
    assert(meta.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l }.nonEmpty)
    val r = meta.head()
    assert(r.getAs[Long]("n_rows") == 400L && r.getAs[Long]("lo") == 0L &&
      r.getAs[Long]("hi") == 399L)

    // the choice survives writers that DON'T pass the option: a merge
    // keeps collecting stats for exactly the named columns
    ManifestMerge(root, Seq("late"), partCol = "")
      .whenMatchedUpdate(Map("c01" -> ((s, _) => s("nv"))))
      .run(spark.range(5, 10).select(col("id").as("late"), lit(-1L).as("nv")))
    val m2 = ManifestTable.resolve(fs, new Path(root)).get
    assert(m2.statsCols == Seq("late", "c00"), "merge dropped the statsCols choice")
    val newGen = m2.entries.flatMap(_.stats)
    assert(newGen.nonEmpty && newGen.forall(_.cols.map(_.col).toSet == Set("late", "c00")),
      s"merge-written files lost the named coverage: ${newGen.map(_.cols.map(_.col))}")
    // and an Append on an unpartitioned table carries it too
    ManifestWrite.write(wideDf.limit(10), root, "", SaveMode.Append)
    val m3 = ManifestTable.resolve(fs, new Path(root)).get
    assert(m3.statsCols == Seq("late", "c00"))
  }

  test("header round-trips statsCols exactly; pre-round-16 (4-field) headers still parse") {
    val m = Manifest(3L, "day",
      Seq(ManifestEntry("a", "g-x/day=a", Nil, Seq(FileStat("f.parquet", 10L)))),
      statsCols = Seq("ts", "user_id"))
    assert(ManifestTable.deserialize(ManifestTable.serialize(m)).contains(m))
    val legacy = Manifest(3L, "day",
      Seq(ManifestEntry("a", "g-x/day=a", Nil, Seq(FileStat("f.parquet", 10L)))))
    assert(ManifestTable.deserialize(ManifestTable.serialize(legacy)).contains(legacy))
  }

  test("budget shed still honored: an over-budget manifest sheds envelopes, keeps (name,len) and statsCols") {
    // the shed path is size-triggered inside commit(); simulate by
    // verifying serialize length monotonicity instead of forcing 8MB:
    // a manifest with envelopes is strictly larger than its shed form,
    // and the shed form still carries statsCols + the listing
    val withEnv = Manifest(1L, "", Seq(ManifestEntry("", "g-a", Nil,
      Seq(FileStat("f.parquet", 10L, 100L,
        Seq(ColStat("late", 'i', Some("0"), Some("9"), 0L)))))),
      statsCols = Seq("late"))
    val shed = withEnv.copy(entries = withEnv.entries.map(e =>
      e.copy(stats = e.stats.map(s => FileStat(s.name, s.len)))))
    assert(ManifestTable.serialize(withEnv).length > ManifestTable.serialize(shed).length)
    val back = ManifestTable.deserialize(ManifestTable.serialize(shed)).get
    assert(back.statsCols == Seq("late"))
    assert(back.entries.head.stats == Seq(FileStat("f.parquet", 10L)))
  }
}
