package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Round-17 merge hardening — verdict tasks 2/3/4:
  *
  *   - the merge SOURCE is pinned once per run: every phase (key
  *     summary, find-touched, rewrite, change record) and every
  *     optimistic retry reads ONE materialization, so a
  *     non-deterministic source cannot make the captured feed diverge
  *     from the committed rows (round-16 ADVICE, medium);
  *   - the rewrite within a hot partition parallelizes: REBALANCE +
  *     AQE split by real row volume instead of the old one-task-per-
  *     partition repartition (and one-task-total for unpartitioned);
  *   - file-level conflict detection: a commit that loses the
  *     optimistic race to a DISJOINT interleaved commit re-commits
  *     without re-deriving — both merges land in one attempt each.
  */
class MergeScaleHardeningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp = tmpDir("merge-scale")
  private var n = 0
  private def freshRoot(): String = { n += 1; s"$tmp/t$n" }
  private def fs = new Path(tmp).getFileSystem(spark.sessionState.newHadoopConf())

  /** Range-partitioned days: d0 holds ids 0..199, d1 200..399,
    * d2 400..599 — so a key set confined to one id range touches ONE
    * partition and key envelopes across partitions are disjoint (the
    * setup file-level conflict detection needs).
    */
  private def buildRangeLayout(root: String): Unit = {
    val df = spark.range(0, 600).select(
      col("id"), (col("id") * 10).as("v"),
      concat(lit("d"), (col("id") / 200).cast("int")).as("day"))
    ManifestWrite.write(df.repartitionByRange(6, col("id")), root, "day", SaveMode.Overwrite)
  }

  private def readBack(root: String): DataFrame =
    ManifestFileIndex.relation(spark, root, "day")

  test("merge source plan is evaluated exactly once (pinned), even with a change feed") {
    val root = freshRoot()
    buildRangeLayout(root)
    MergeScaleHardeningSpec.evals.reset()
    val countingUdf = udf { id: Long =>
      MergeScaleHardeningSpec.evals.increment(); id * 1000
    }
    val src = spark.range(0, 20).select(col("id"), countingUdf(col("id")).as("v"))
    ManifestMerge(root, Seq("id"))
      .whenMatchedUpdate(Map("v" -> ((s, _) => s("v"))))
      .withChangeFeed()
      .run(src): Unit
    assert(MergeScaleHardeningSpec.evals.sum() == 20,
      s"source must be evaluated exactly once (20 rows), saw ${MergeScaleHardeningSpec.evals.sum()}")
  }

  test("non-deterministic source: change record agrees with the committed rows") {
    val root = freshRoot()
    buildRangeLayout(root)
    // rand()-valued updates: without pinning, the record job's
    // re-evaluation would capture DIFFERENT values than the rewrite
    val src = spark.range(0, 50)
      .select(col("id"), (rand(seed = 0) * 1e9).cast("long").as("v"))
      .where(rand() > -1) // keep the plan visibly non-deterministic
    ManifestMerge(root, Seq("id"))
      .whenMatchedUpdate(Map("v" -> ((s, _) => s("v"))))
      .withChangeFeed()
      .run(src): Unit
    val rootPath = new Path(root)
    val v = ManifestTable.resolve(fs, rootPath).get.seq
    val feed = ManifestChanges.between(spark, root, v, v)
    val post = feed.filter(col(ManifestChanges.ChangeTypeCol) === "update_postimage")
      .select("id", "v")
    val table = readBack(root).select("id", "v")
    assert(post.join(table, Seq("id", "v"), "left_anti").isEmpty,
      "every captured postimage must be exactly the committed row")
    assert(post.count() == 50)
  }

  test("hot-partition rewrite splits into multiple write tasks under AQE rebalance") {
    val root = freshRoot()
    // one fat partition: 60k rows, all day d0, several input files
    val df = spark.range(0, 60000).select(
      col("id"), concat(lit("payload-"), col("id")).as("v"), lit("d0").as("day"))
    ManifestWrite.write(df.repartitionByRange(6, col("id")), root, "day", SaveMode.Overwrite)
    val before = spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try {
      val src = spark.range(0, 60000).select(col("id"),
        concat(lit("updated-"), col("id")).as("v"))
      val res = ManifestMerge(root, Seq("id"))
        .whenMatchedUpdate(Map("v" -> ((s, _) => s("v"))))
        .run(src)
      assert(res.touchedFiles == 6)
      // the single touched partition's fresh generation must hold >1
      // data file — i.e. >1 write task served the hot partition
      val entry = ManifestTable.resolve(fs, new Path(root)).get.entries.find(_.part == "d0").get
      assert(entry.stats.size > 1,
        s"expected a parallel rewrite (>1 file) for the hot partition, got ${entry.stats.size}")
      val out = readBack(root)
      assert(out.count() == 60000)
      assert(out.filter(col("v").startsWith("updated-")).count() == 60000)
    } finally before match {
      case Some(x) => spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", x)
      case None => spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }
  }

  test("disjoint concurrent merges: loser re-commits via conflict check, one attempt each") {
    val root = freshRoot()
    buildRangeLayout(root)
    val base = ManifestMerge.fastPathRecommits.sum()
    // merge B (outer) updates day d2 keys; in B's pre-commit window,
    // merge A lands an update to day d0 keys — disjoint partitions,
    // disjoint key envelopes
    val innerRan = new java.util.concurrent.atomic.AtomicBoolean(false)
    @volatile var innerResult: MergeResult = null
    ManifestMerge.beforeMergeCommit = () =>
      if (innerRan.compareAndSet(false, true)) {
        val srcA = spark.range(0, 10).select(col("id"), lit(-1L).as("v"))
        innerResult = ManifestMerge(root, Seq("id"))
          .whenMatchedUpdate(Map("v" -> ((s, _) => s("v"))))
          .run(srcA)
      }
    try {
      val srcB = spark.range(400, 410).select(col("id"), lit(-2L).as("v"))
      val resB = ManifestMerge(root, Seq("id"))
        .whenMatchedUpdate(Map("v" -> ((s, _) => s("v"))))
        .run(srcB)
      assert(innerResult != null && innerResult.attempts == 1)
      assert(resB.attempts == 1,
        s"disjoint interleave must not force re-derivation, attempts=${resB.attempts}")
      assert(ManifestMerge.fastPathRecommits.sum() == base + 1)
      val out = readBack(root).cache()
      try {
        assert(out.filter(col("id") < 10 && col("v") === -1L).count() == 10)
        assert(out.filter(col("id") >= 400 && col("id") < 410 && col("v") === -2L).count() == 10)
        assert(out.count() == 600)
      } finally { out.unpersist(); () }
    } finally ManifestMerge.beforeMergeCommit = () => ()
  }

  test("overlapping concurrent merges still re-derive (conflict detected)") {
    val root = freshRoot()
    buildRangeLayout(root)
    val base = ManifestMerge.fastPathRecommits.sum()
    val innerRan = new java.util.concurrent.atomic.AtomicBoolean(false)
    ManifestMerge.beforeMergeCommit = () =>
      if (innerRan.compareAndSet(false, true)) {
        // SAME partition, overlapping keys — the fast path must refuse
        val srcA = spark.range(0, 5).select(col("id"), lit(-5L).as("v"))
        ManifestMerge(root, Seq("id"))
          .whenMatchedUpdate(Map("v" -> ((s, _) => s("v"))))
          .run(srcA): Unit
      }
    try {
      val srcB = spark.range(3, 8).select(col("id"), lit(-6L).as("v"))
      val resB = ManifestMerge(root, Seq("id"))
        .whenMatchedUpdate(Map("v" -> ((s, _) => s("v"))))
        .run(srcB)
      assert(resB.attempts == 2, s"overlap must re-derive, attempts=${resB.attempts}")
      assert(ManifestMerge.fastPathRecommits.sum() == base)
      val out = readBack(root)
      // B re-derived from A's state: B wins on the overlap 3..4
      assert(out.filter(col("id") < 3 && col("v") === -5L).count() == 3)
      assert(out.filter(col("id") >= 3 && col("id") < 8 && col("v") === -6L).count() == 5)
    } finally ManifestMerge.beforeMergeCommit = () => ()
  }
}

object MergeScaleHardeningSpec {
  val evals = new java.util.concurrent.atomic.LongAdder
}
