package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Round-17 hardening — each test pins one round-16 ADVICE finding:
  *
  *   1. a gc retention widened via `ManifestMerge.withKeepCommits` is
  *      PERSISTED in the manifest header, so a later gc at the
  *      2-commit default (compaction, erasure, another writer) cannot
  *      collapse the history window feed consumers sized their lag
  *      against;
  *   2. `versionAt` selects max(seq) among commits with mtime <= ts —
  *      a single commit file with a skewed-ahead clock must not hide a
  *      genuinely matching newer commit (the old takeWhile assumed
  *      mtimes monotonic in seq);
  *   3. a legitimately EMPTY change-feed range over a table with no
  *      live files returns the documented empty frame with the tag
  *      columns instead of tripping ManifestTable.read's
  *      at-least-one-file requirement;
  *   4. an option-only `readChangeFeed` batch read on a table whose
  *      commit 1 has been gc'd defaults startingVersion to the oldest
  *      RETAINED version and serves the window, instead of always
  *      throwing the retention error.
  */
class RetentionHardeningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp = tmpDir("retention-hardening")
  private var n = 0
  private def freshRoot(): String = { n += 1; s"$tmp/t$n" }
  private def fs = new Path(tmp).getFileSystem(spark.sessionState.newHadoopConf())

  private def seed(root: String, ids: Range): Unit =
    ManifestWrite.write(
      ids.toDF("id").select(col("id"), (col("id") * 10).as("v"),
        date_add(lit("2024-05-01").cast("date"), (col("id") % 3).cast("int")).as("day")),
      root, "day", SaveMode.Overwrite)

  private def mergeBump(root: String, ids: Seq[Int],
      m: ManifestMerge => ManifestMerge = identity): Unit = {
    val src = ids.toDF("id").select(col("id"), (col("id") * 100).as("v"))
    m(ManifestMerge(root, Seq("id")))
      .whenMatchedUpdate(Map("v" -> ((s, _) => s("v"))))
      .run(src): Unit
  }

  test("withKeepCommits persists retention: a later default-window gc keeps it") {
    val root = freshRoot()
    seed(root, 0 until 90)
    // one retention-setting merge: header now carries retain=5
    mergeBump(root, Seq(1), _.withKeepCommits(5))
    val rootPath = new Path(root)
    assert(ManifestTable.resolve(fs, rootPath).get.retain == 5)
    // four more writers, all at the DEFAULT window — the round-16 bug:
    // each ran gc(keepCommits=2) and collapsed the table to 2 commits
    (2 to 5).foreach(i => mergeBump(root, Seq(i)))
    // explicit default-window gc on top (the compaction/erasure path)
    ManifestTable.gc(fs, rootPath): Unit
    val retained = ManifestTable.versions(fs, rootPath)
    assert(retained.size == 5, s"expected the persisted 5-commit window, got $retained")
    // retain survives commits that never mentioned it
    assert(ManifestTable.resolve(fs, rootPath).get.retain == 5)
    // and the serialized header round-trips it exactly
    val m = ManifestTable.resolve(fs, rootPath).get
    assert(ManifestTable.deserialize(ManifestTable.serialize(m)).get.retain == 5)
  }

  test("versionAt picks max(seq) with mtime <= ts despite a skewed-ahead middle commit") {
    val root = freshRoot()
    val rootPath = new Path(root)
    (1 to 3).foreach { i =>
      ManifestTable.commit(fs, rootPath, "day",
        Map(s"d$i" -> Some(ManifestEntry(s"d$i", s"day=d$i", Nil)))): Unit
    }
    val now = System.currentTimeMillis()
    def commitFile(seq: Long) =
      java.nio.file.Paths.get(
        new Path(new Path(rootPath, ManifestTable.CommitsDir), f"$seq%020d").toUri.getPath)
    // commits 1 and 3 landed in the past; commit 2's store clock is an
    // hour AHEAD — the non-monotonic case the takeWhile got wrong
    java.nio.file.Files.setLastModifiedTime(commitFile(1),
      java.nio.file.attribute.FileTime.fromMillis(now - 60000))
    java.nio.file.Files.setLastModifiedTime(commitFile(2),
      java.nio.file.attribute.FileTime.fromMillis(now + 3600000))
    java.nio.file.Files.setLastModifiedTime(commitFile(3),
      java.nio.file.attribute.FileTime.fromMillis(now - 30000))
    assert(ManifestTable.versionAt(fs, rootPath, now).contains(3L),
      "the newest commit with mtime <= ts must win; a skewed middle commit must not hide it")
    // and below every mtime: nothing qualifies
    assert(ManifestTable.versionAt(fs, rootPath, now - 3600000).isEmpty)
  }

  test("empty change-feed range over an empty table returns the tagged empty frame") {
    val root = freshRoot()
    val rootPath = new Path(root)
    // commit 1: a manifested table with ZERO entries (every row merged
    // away / never written) — ManifestTable.read would refuse it
    ManifestTable.commit(fs, rootPath, "day", Map.empty): Unit
    val feed = ManifestChanges.between(spark, root, 1, 1)
    assert(feed.count() == 0)
    assert(feed.columns.contains(ManifestChanges.ChangeTypeCol))
    assert(feed.columns.contains(ManifestChanges.CommitVersionCol))
    // pointer-only commit on a table WITH files: schema comes from the
    // probe, still zero rows
    val root2 = freshRoot()
    seed(root2, 0 until 30)
    ManifestTable.commit(fs, new Path(root2), "day", Map.empty): Unit
    val feed2 = ManifestChanges.between(spark, root2, 2, 2)
    assert(feed2.count() == 0)
    assert(Set("id", "v", "day", ManifestChanges.ChangeTypeCol,
      ManifestChanges.CommitVersionCol).subsetOf(feed2.columns.toSet))
  }

  test("option-only readChangeFeed serves the retained window after commit 1 is gc'd") {
    val root = freshRoot()
    seed(root, 0 until 60) // v1
    (1 to 3).foreach(i => mergeBump(root, Seq(i), _.withChangeFeed())) // v2..v4
    // default-window gc already ran inside the merges: v1/v2 are gone
    val retained = ManifestTable.versions(fs, new Path(root))
    assert(retained.min > 1, s"precondition: commit 1 must be gc'd, retained $retained")
    val feed = spark.read.format("graftmanifest")
      .option("readChangeFeed", "true").load(root)
    val versions = feed.select(ManifestChanges.CommitVersionCol).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(versions == retained.toSet,
      s"the retained window $retained should be served, got $versions")
  }
}
