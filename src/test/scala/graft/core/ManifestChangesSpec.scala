package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Change data feed over manifested tables (round 16): write-time
  * capture for merges, synthesized inserts for appends, silence for
  * folds, loud failure for uncaptured rewrites — and the CDC
  * invariant: old snapshot + feed = new snapshot, exactly.
  */
class ManifestChangesSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path(tmp).getFileSystem(spark.sessionState.newHadoopConf())
  private lazy val tmp = tmpDir("manifest-changes")
  private var n = 0
  private def freshRoot(): String = { n += 1; s"$tmp/t$n" }

  /** Same 600-row / 5-day / disjoint-id-range shape as
    * ManifestMergeSpec — envelopes selective, every day populated.
    */
  private def buildLayout(root: String): Unit = {
    val df = spark.range(0, 600).select(
      col("id"),
      (col("id") * 10).as("v"),
      date_add(lit("2024-05-01").cast("date"), (col("id") % 5).cast("int")).as("day"))
    ManifestWrite.write(df.repartitionByRange(6, col("id")), root, "day", SaveMode.Overwrite)
  }

  private def feed(root: String, from: Long, to: Long): DataFrame =
    ManifestChanges.between(spark, root, from, to)

  private def asSet(df: DataFrame): Set[String] = df.collect().map(_.toString).toSet

  test("manifest serialization round-trips the per-commit change pointer; next commit drops it") {
    val root = new Path(freshRoot())
    fs.mkdirs(root)
    val e = ManifestEntry("", "g-x", Nil, Seq(FileStat("f.parquet", 10L)))
    val m1 = ManifestTable.commit(fs, root, "", Map("" -> Some(e)),
      changes = Some("_changes/g-x"))
    assert(m1.changes == "_changes/g-x")
    assert(ManifestTable.resolve(fs, root).get.changes == "_changes/g-x")
    // direct serialize/deserialize round trip
    val rt = ManifestTable.deserialize(ManifestTable.serialize(m1))
    assert(rt.contains(m1))
    // per-commit by contract: the NEXT commit must not inherit it
    val e2 = ManifestEntry("a2", "g-y", Nil, Seq(FileStat("f2.parquet", 11L)))
    val m2 = ManifestTable.commit(fs, root, "", Map("a2" -> Some(e2)))
    assert(m2.changes.isEmpty)
    assert(ManifestTable.resolveAt(fs, root, m1.seq).get.changes == "_changes/g-x")
  }

  test("initial write and appends synthesize exact insert rows, attributed to their commit") {
    val root = freshRoot()
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
      .write.format("graftmanifest").save(root)
    Seq((4, "d"), (5, "e")).toDF("id", "v")
      .write.format("graftmanifest").mode(SaveMode.Append).save(root)
    Seq((6, "f")).toDF("id", "v")
      .write.format("graftmanifest").mode(SaveMode.Append).save(root)
    val all = feed(root, 1, 3)
    assert(all.columns.toSeq ==
      Seq("id", "v", "_change_type", "_commit_version"))
    val rows = all.as[(Int, String, String, Long)].collect().toSet
    assert(rows == Set(
      (1, "a", "insert", 1L), (2, "b", "insert", 1L), (3, "c", "insert", 1L),
      (4, "d", "insert", 2L), (5, "e", "insert", 2L),
      (6, "f", "insert", 3L)))
    // a sub-range excludes the initial snapshot
    val tail = feed(root, 2, 3).as[(Int, String, String, Long)].collect().toSet
    assert(tail == Set((4, "d", "insert", 2L), (5, "e", "insert", 2L),
      (6, "f", "insert", 3L)))
    // the public option surface reads the same feed
    val viaOption = spark.read.format("graftmanifest")
      .option("readChangeFeed", "true")
      .option("startingVersion", "2").option("endingVersion", "3")
      .load(root)
    assert(asSet(viaOption) == asSet(feed(root, 2, 3)))
  }

  test("captured update merge emits exact pre/post images; delete and insert merges their rows") {
    val root = freshRoot()
    buildLayout(root)
    // v2: update ids 100-119 (v := v + 7)
    ManifestMerge(root, Seq("id"))
      .whenMatchedUpdate(Map("v" -> ((s, _) => s("nv"))))
      .withChangeFeed()
      .run(spark.range(100, 120).select(col("id"), (col("id") + 7).as("nv")))
    val v2 = ManifestTable.resolve(fs, new Path(root)).get.seq
    val upd = feed(root, v2, v2)
      .select($"_change_type", $"id", $"v").as[(String, Long, Long)].collect().toSet
    val expectedUpd =
      (100L until 120L).map(i => ("update_preimage", i, i * 10)).toSet ++
        (100L until 120L).map(i => ("update_postimage", i, i + 7)).toSet
    assert(upd == expectedUpd)
    // v3: delete ids 10-19
    ManifestMerge(root, Seq("id"))
      .whenMatchedDelete()
      .withChangeFeed()
      .run(spark.range(10, 20).toDF("id"))
    val v3 = ManifestTable.resolve(fs, new Path(root)).get.seq
    val del = feed(root, v3, v3)
      .select($"_change_type", $"id", $"v").as[(String, Long, Long)].collect().toSet
    assert(del == (10L until 20L).map(i => ("delete", i, i * 10)).toSet)
    // v4: insert-only merge — new ids, NO existing file rewritten
    val ins = spark.range(9000, 9005).select(
      col("id"), (col("id") * 10).as("v"),
      lit("2024-05-01").cast("date").as("day"))
    val res = ManifestMerge(root, Seq("id"))
      .whenNotMatchedInsert()
      .withChangeFeed()
      .run(ins)
    assert(res.touchedFiles == 0,
      s"insert-only merge must rewrite nothing, touched ${res.touchedFiles}")
    val v4 = ManifestTable.resolve(fs, new Path(root)).get.seq
    val insRows = feed(root, v4, v4)
      .select($"_change_type", $"id").as[(String, Long)].collect().toSet
    assert(insRows == (9000L until 9005L).map(i => ("insert", i)).toSet)
    // day is recovered on every change row (partition column in the
    // feed); v3..v4 are the versions still retained after v4's gc
    assert(feed(root, v3, v4).filter($"day".isNull).isEmpty)
  }

  test("CDC invariant: old snapshot + feed = new snapshot, across a merge chain") {
    val root = freshRoot()
    buildLayout(root)
    val before = ManifestTable.read(spark, root, partCol = "day")
      .collect().toSeq // materialize: gc retires v1 during the chain
    val beforeDf = spark.createDataFrame(
      spark.sparkContext.parallelize(before),
      ManifestTable.read(spark, root, partCol = "day").schema)
    val v1 = ManifestTable.resolve(fs, new Path(root)).get.seq
    // two captured merges (each merge gc's with keepCommits=2, so a
    // longer chain would retire the commits the feed needs): an
    // update+insert, then a delete
    ManifestMerge(root, Seq("id"))
      .whenMatchedUpdate(Map("v" -> ((s, _) => s("nv"))))
      .whenNotMatchedInsert()
      .withChangeFeed()
      .run(spark.range(200, 260).select(col("id"), lit(-1L).as("nv"),
        lit(-1L).as("v"), lit("2024-05-03").cast("date").as("day"))
        .unionByName(spark.range(7000, 7020).select(col("id"),
          lit(-1L).as("nv"), (col("id") + 1).as("v"),
          lit("2024-05-03").cast("date").as("day"))))
    ManifestMerge(root, Seq("id"))
      .whenMatchedDelete()
      .withChangeFeed()
      .run(spark.range(50, 80).toDF("id"))
    val latest = ManifestTable.resolve(fs, new Path(root)).get.seq
    val applied = ManifestChanges.applyChanges(
      beforeDf, feed(root, v1 + 1, latest), Seq("id"))
    assert(asSet(applied) == asSet(ManifestTable.read(spark, root, partCol = "day")))
  }

  test("an uncaptured rewrite fails the feed loudly, naming the fix") {
    val root = freshRoot()
    buildLayout(root)
    ManifestMerge(root, Seq("id")) // NO withChangeFeed
      .whenMatchedDelete()
      .run(spark.range(0, 5).toDF("id"))
    val v = ManifestTable.resolve(fs, new Path(root)).get.seq
    val e = intercept[IllegalStateException] { feed(root, v, v).collect() }
    assert(e.getMessage.contains("change record") &&
      e.getMessage.contains("withChangeFeed"), e.getMessage)
  }

  test("fold commits contribute no change rows") {
    val root = freshRoot()
    val rootPath = new Path(root)
    Seq((1, "a")).toDF("id", "v").write.format("graftmanifest").save(root)
    Seq((2, "b")).toDF("id", "v")
      .write.format("graftmanifest").mode(SaveMode.Append).save(root)
    val base = ManifestTable.resolve(fs, rootPath).get
    // hand-rolled fold, the sink's shape: one repacked generation whose
    // entry covers the subsumed part keys
    val gen = "g-fold1"
    ManifestTable.read(spark, root).coalesce(1)
      .write.parquet(new Path(rootPath, gen).toString)
    fs.delete(new Path(new Path(rootPath, gen), "_SUCCESS"), false)
    val stats = ManifestTable.fileStats(fs, new Path(rootPath, gen))
    ManifestTable.commit(fs, rootPath, "",
      base.entries.map(e => e.part -> (None: Option[ManifestEntry])).toMap +
        (gen -> Some(ManifestEntry(gen, gen, Nil, stats, base.entries.map(_.part)))))
    val foldV = ManifestTable.resolve(fs, rootPath).get.seq
    assert(feed(root, foldV, foldV).isEmpty,
      "a fold repacks rows — it must contribute zero change rows")
    // and the full feed still carries exactly the two real inserts
    val all = feed(root, 1, foldV).select($"_change_type", $"id")
      .as[(String, Int)].collect().toSet
    assert(all == Set(("insert", 1), ("insert", 2)))
  }

  test("partition compaction is feed-transparent; a data-changing rewrite still fails loudly") {
    val root = freshRoot()
    buildLayout(root)
    // captured merge first, so the feed has real content around the repack
    ManifestMerge(root, Seq("id")).withKeepCommits(8)
      .whenMatchedUpdate(Map("v" -> ((s, _) => s("nv"))))
      .withChangeFeed()
      .run(spark.range(5, 10).select(col("id"), lit(1L).as("nv")))
    val vMerge = ManifestTable.resolve(fs, new Path(root)).get.seq
    val liveBefore = asSet(ManifestTable.read(spark, root, partCol = "day"))
    graft.operators.StorageOps.compactDays(spark, root, Seq("2024-05-01", "2024-05-02"))
    val vCompact = ManifestTable.resolve(fs, new Path(root)).get.seq
    assert(vCompact == vMerge + 1)
    // same rows after the repack, and the feed across it carries NOTHING
    assert(asSet(ManifestTable.read(spark, root, partCol = "day")) == liveBefore)
    assert(feed(root, vCompact, vCompact).isEmpty,
      "a compaction changes no rows — its feed contribution must be empty")
    // the whole window still reads: merge delta + silent repack
    val all = feed(root, vMerge, vCompact)
    assert(all.filter(col("_change_type") === "update_postimage").count() == 5)
    // and compaction folds the merge's CARRY back in without breaking
    // the feed either side of it
    assert(asSet(ManifestTable.read(spark, root, partCol = "day")) == liveBefore)
  }

  test("erasure propagates as KEY-ONLY deletes: erased content never enters the feed") {
    val src = freshRoot()
    val dst = freshRoot()
    val df = spark.range(0, 100).select(
      col("id").as("event_id"), (col("id") % 10).as("user_id"),
      concat(lit("secret-"), col("id")).as("payload"),
      date_add(lit("2024-07-01").cast("date"), (col("id") % 3).cast("int")).as("day"))
    ManifestWrite.write(df.repartitionByRange(4, col("event_id")), src, "day",
      SaveMode.Overwrite)
    ManifestChanges.replicate(spark, src, dst, Seq("event_id"), "day")
    graft.operators.StorageOps.eraseUsers(spark, src, Seq(3L, 7L), Seq("event_id"))
    val v = ManifestTable.resolve(fs, new Path(src)).get.seq
    val chg = feed(src, v, v)
    // deletion orders only: keys + partition populated, content NULL
    assert(chg.select("_change_type").distinct().as[String].collect().toSeq == Seq("delete"))
    assert(chg.filter($"user_id".isNotNull || $"payload".isNotNull).isEmpty,
      "erased content must never enter the feed")
    val wantIds = (0L until 100L).filter(i => i % 10 == 3 || i % 10 == 7).toSet
    assert(chg.select("event_id").as[Long].collect().toSet == wantIds)
    assert(chg.filter($"day".isNull).isEmpty)
    // the record FILES themselves hold no content either
    val rec = spark.read.parquet(
      s"$src/${ManifestTable.resolveAt(fs, new Path(src), v).get.changes}")
    assert(rec.filter($"payload".isNotNull || $"user_id".isNotNull).isEmpty)
    // the replica drops the same rows purely from the feed
    ManifestChanges.replicate(spark, src, dst, Seq("event_id"), "day")
    val dstDf = ManifestTable.read(spark, dst, partCol = "day")
    assert(asSet(dstDf) == asSet(ManifestTable.read(spark, src, partCol = "day")))
    assert(dstDf.filter($"user_id".isin(3L, 7L)).isEmpty)
  }

  test("gc retires change records with their commits; never-committed strays age out") {
    val root = freshRoot()
    val rootPath = new Path(root)
    buildLayout(root)
    def mergeOnce(lo: Long): Unit =
      ManifestMerge(root, Seq("id"))
        .whenMatchedUpdate(Map("v" -> ((s, _) => s("nv"))))
        .withChangeFeed()
        .run(spark.range(lo, lo + 5).select(col("id"), lit(0L).as("nv")))
    mergeOnce(100); mergeOnce(200); mergeOnce(300)
    // merge gc keeps KeepCommits=2: only the two newest records survive
    val kept = ManifestTable.versions(fs, rootPath)
      .flatMap(v => ManifestTable.resolveAt(fs, rootPath, v))
      .map(_.changes).filter(_.nonEmpty)
      .map(c => new Path(c).getName).toSet
    val onDisk = fs.listStatus(new Path(rootPath, ManifestTable.ChangesDir))
      .map(_.getPath.getName).toSet
    assert(kept.size == 2 && onDisk == kept,
      s"records on disk $onDisk != records referenced by retained commits $kept")
    // a crashed merge's record: referenced by nothing — young survives,
    // aged is swept
    val stray = new Path(rootPath, s"${ManifestTable.ChangesDir}/g-stray")
    fs.mkdirs(stray)
    val f = new Path(stray, "part-0.parquet")
    val out = fs.create(f); out.write(Array[Byte](1, 2, 3)); out.close()
    ManifestTable.gc(fs, rootPath) // default retention: young stray stays
    assert(fs.exists(stray))
    fs.setTimes(f, System.currentTimeMillis() - 10 * 3600 * 1000L, -1)
    ManifestTable.gc(fs, rootPath)
    assert(!fs.exists(stray), "aged unreferenced change record must be swept")
  }

  test("a feed request past the retained window fails naming it") {
    val root = freshRoot()
    buildLayout(root)
    (0 until 3).foreach { i =>
      ManifestMerge(root, Seq("id"))
        .whenMatchedUpdate(Map("v" -> ((s, _) => s("nv"))))
        .withChangeFeed()
        .run(spark.range(i * 10, i * 10 + 3).select(col("id"), lit(9L).as("nv")))
    }
    val retainedMin = ManifestTable.versions(fs, new Path(root)).min
    val e = intercept[IllegalStateException] {
      feed(root, retainedMin - 1, retainedMin).collect()
    }
    assert(e.getMessage.contains("no longer retained"), e.getMessage)
    // the retained range itself still reads (records are authoritative,
    // no parent diff needed)
    assert(feed(root, retainedMin, retainedMin).count() > 0)
  }

  test("replication: seed + incremental catch-up equals the source; crash re-apply is idempotent") {
    val src = freshRoot()
    val dst = freshRoot()
    buildLayout(src)
    def srcSet = asSet(ManifestTable.read(spark, src, partCol = "day"))
    def dstSet = asSet(ManifestTable.read(spark, dst, partCol = "day"))
    // first call seeds the replica from the snapshot
    val (f0, t0) = ManifestChanges.replicate(spark, src, dst, Seq("id"), "day")
    assert(f0 == t0 && dstSet == srcSet)
    // captured merges on the source: update+insert, then delete
    ManifestMerge(src, Seq("id"))
      .whenMatchedUpdate(Map("v" -> ((s, _) => s("nv"))))
      .whenNotMatchedInsert()
      .withChangeFeed()
      .run(spark.range(100, 130).select(col("id"), lit(-5L).as("nv"),
        lit(-5L).as("v"), lit("2024-05-02").cast("date").as("day"))
        .unionByName(spark.range(8000, 8010).select(col("id"), lit(-5L).as("nv"),
          (col("id") * 2).as("v"), lit("2024-05-02").cast("date").as("day"))))
    ManifestMerge(src, Seq("id"))
      .whenMatchedDelete()
      .withChangeFeed()
      .run(spark.range(40, 60).toDF("id"))
    val (f1, t1) = ManifestChanges.replicate(spark, src, dst, Seq("id"), "day")
    assert(t1 > f1, s"expected versions applied, got ($f1, $t1)")
    assert(dstSet == srcSet)
    // already current: a second sync is a no-op
    val (f2, t2) = ManifestChanges.replicate(spark, src, dst, Seq("id"), "day")
    assert(f2 == t2)
    // crash-before-marker simulation: roll the applied ledger back one
    // version; the re-applied deletes match nothing, the re-applied
    // upserts rewrite the same values — replica unchanged
    val dfs = new Path(dst).getFileSystem(spark.sessionState.newHadoopConf())
    val markerDir = new Path(dst, "_replication")
    dfs.delete(new Path(markerDir, s"applied-$t1"), false)
    dfs.create(new Path(markerDir, s"applied-${t1 - 1}"), false).close()
    val (f3, t3) = ManifestChanges.replicate(spark, src, dst, Seq("id"), "day")
    assert(f3 == t1 - 1 && t3 == t1)
    assert(dstSet == srcSet, "re-applying the last version must be a value no-op")
  }

  test("change-feed stream: appends arrive as inserts, a captured merge as exact change rows") {
    val root = tmpDir("gm-cdf-stream") + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.format("graftmanifest").save(root)
    val q = spark.readStream.format("graftmanifest")
      .option("readChangeFeed", "true").load(root)
      .writeStream.format("memory").queryName("gmcdf").outputMode("append").start()
    try {
      q.processAllAvailable()
      def seen = spark.table("gmcdf")
        .select($"id", $"v", $"_change_type", $"_commit_version")
        .as[(Long, String, String, Long)].collect().toSet
      assert(seen == Set((1L, "a", "insert", 1L), (2L, "b", "insert", 1L)))
      Seq((3L, "c")).toDF("id", "v")
        .write.format("graftmanifest").mode(SaveMode.Append).save(root)
      q.processAllAvailable()
      assert(seen.contains((3L, "c", "insert", 2L)))
      // a captured merge mid-stream: consumed as change rows, not a failure
      ManifestMerge(root, Seq("id"), partCol = "")
        .whenMatchedUpdate(Map("v" -> ((s, _) => s("nv"))))
        .withChangeFeed()
        .run(Seq((1L, "A")).toDF("id", "nv"))
      q.processAllAvailable()
      assert(seen.contains((1L, "a", "update_preimage", 3L)) &&
        seen.contains((1L, "A", "update_postimage", 3L)),
        s"missing merge change rows in $seen")
      assert(seen.size == 5, s"unexpected extra rows: $seen")
    } finally q.stop()
  }

  test("change-feed stream starting against a gc-truncated history loads the full snapshot first") {
    val root = tmpDir("gm-cdf-trunc") + "/t"
    val rootPath = new Path(root)
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.format("graftmanifest").save(root) // v1
    Seq((3L, "c")).toDF("id", "v")
      .write.format("graftmanifest").mode(SaveMode.Append).save(root) // v2
    // v3: captured merge; its gc (keepCommits=2) retires v1 — a fresh
    // stream now starts mid-history, where the first retained version
    // is a REWRITE commit whose record alone is not the table
    ManifestMerge(root, Seq("id"), partCol = "")
      .whenMatchedUpdate(Map("v" -> ((s, _) => s("nv"))))
      .withChangeFeed()
      .run(Seq((1L, "A")).toDF("id", "nv"))
    assert(ManifestTable.versions(fs, rootPath).min == 2, "v1 must be gc'd for this test")
    val q = spark.readStream.format("graftmanifest")
      .option("readChangeFeed", "true").load(root)
      .writeStream.format("memory").queryName("gmcdf_trunc").outputMode("append").start()
    try {
      q.processAllAvailable()
      val seen = spark.table("gmcdf_trunc")
        .select($"id", $"v", $"_change_type", $"_commit_version")
        .as[(Long, String, String, Long)].collect().toSet
      // first retained version (2) = FULL snapshot as inserts — row 1
      // at its pre-merge value — then version 3's exact delta
      assert(seen == Set(
        (1L, "a", "insert", 2L), (2L, "b", "insert", 2L), (3L, "c", "insert", 2L),
        (1L, "a", "update_preimage", 3L), (1L, "A", "update_postimage", 3L)),
        s"initial load must be the snapshot at the first retained version: $seen")
    } finally q.stop()
  }

  test("rate-capped change-feed stream drains a merge backlog commit by commit, value-exact") {
    val root = tmpDir("gm-cdf-capped") + "/t"
    Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("id", "v")
      .write.format("graftmanifest").save(root)
    // a 4-merge backlog BEFORE the stream starts; retention sized so
    // the capped drain can still read every version
    (1L to 4L).foreach { i =>
      ManifestMerge(root, Seq("id"), partCol = "").withKeepCommits(16)
        .whenMatchedUpdate(Map("v" -> ((s, _) => s("nv"))))
        .withChangeFeed()
        .run(Seq((i % 3 + 1, i * 10)).toDF("id", "nv"))
    }
    val q = spark.readStream.format("graftmanifest")
      .option("readChangeFeed", "true")
      .option("maxCommitsPerTrigger", "1")
      .load(root)
      .writeStream.format("memory").queryName("gmcdf_capped").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("gmcdf_capped")
        .select($"id", $"v", $"_change_type", $"_commit_version")
        .as[(Long, Long, String, Long)].collect().toSet
      // initial snapshot (v1) + four exact per-version deltas; each
      // merge i updated key (i%3+1) from its then-current value to i*10
      val want = Set[(Long, Long, String, Long)](
        (1L, 0L, "insert", 1L), (2L, 0L, "insert", 1L), (3L, 0L, "insert", 1L),
        (2L, 0L, "update_preimage", 2L), (2L, 10L, "update_postimage", 2L),
        (3L, 0L, "update_preimage", 3L), (3L, 20L, "update_postimage", 3L),
        (1L, 0L, "update_preimage", 4L), (1L, 30L, "update_postimage", 4L),
        (2L, 10L, "update_preimage", 5L), (2L, 40L, "update_postimage", 5L))
      assert(rows == want, s"capped drain diverged: ${rows.diff(want)} / ${want.diff(rows)}")
      // and the drain really was multi-batch: one commit per trigger
      assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
        s"expected >=4 non-empty micro-batches, saw " +
          s"${q.recentProgress.map(_.numInputRows).mkString(",")}")
    } finally q.stop()
  }

  test("plain stream failing on a captured merge names the readChangeFeed fix") {
    val root = tmpDir("gm-cdf-hint") + "/t"
    Seq((1L, "a")).toDF("id", "v").write.format("graftmanifest").save(root)
    val q = spark.readStream.format("graftmanifest").load(root)
      .writeStream.format("memory").queryName("gmcdf_hint").outputMode("append").start()
    try {
      q.processAllAvailable()
      ManifestMerge(root, Seq("id"), partCol = "")
        .whenMatchedUpdate(Map("v" -> ((s, _) => s("nv"))))
        .withChangeFeed()
        .run(Seq((1L, "A")).toDF("id", "nv"))
      val e = intercept[Exception] { q.processAllAvailable() }
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
      assert(msg.contains("readChangeFeed"),
        s"expected the mode-switch hint in the failure: $e")
    } finally q.stop()
  }
}
