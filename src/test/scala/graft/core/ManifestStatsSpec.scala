package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import java.nio.charset.StandardCharsets

/** Round-15 verdict task 1: the manifest IS the listing. Writers record
  * each committed file's (name, len) into its entry ([[FileStat]]), so
  * [[ManifestFileIndex]] construction synthesizes the scan's FileStatus
  * set straight from the manifest — zero filesystem listing calls,
  * flat in file count — where round 14 did O(live files) SERIAL
  * getFileStatus/listStatus driver RPCs (minutes on a million-file
  * table on real S3). Pre-upgrade (3-field) manifests still parse and
  * fall back to a concurrent listing.
  */
class ManifestStatsSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("memfs://shared/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def freshStore(sub: String): FileConnector = {
    MemFsStore.clear()
    spark.sparkContext.hadoopConfiguration
      .set("fs.memfs.impl", classOf[MemFs].getName)
    FileConnector("obj", s"memfs://shared/$sub", "parquet")
  }

  test("serialize/deserialize round-trips stats and covers; legacy 3-field lines still parse") {
    val m = Manifest(7, "day", Seq(
      ManifestEntry("2024-01-01", "g-aa/day=2024-01-01", Nil,
        Seq(FileStat("part-00000-x.snappy.parquet", 12345L),
          FileStat("part-00001-y.snappy.parquet", 678L))),
      ManifestEntry("2024-01-02", "g-bb/day=2024-01-02", Seq("f1.parquet"),
        Seq(FileStat("f1.parquet", 99L)), covers = Seq("g-b0-aa", "g-b1-bb"))))
    assert(ManifestTable.deserialize(ManifestTable.serialize(m)).contains(m))
    // a pre-round-15 commit file: 3-field entry lines, correct sha —
    // must parse with empty stats/covers (time travel + streaming
    // offsets read RETAINED old files, not just fresh ones)
    val payload = "graft-manifest\t1\t3\t\n\tg-old\tf0.parquet,f1.parquet\n"
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(payload.getBytes(StandardCharsets.UTF_8)).map("%02x".format(_)).mkString
    val legacy = (s"sha256:$sha\n" + payload).getBytes(StandardCharsets.UTF_8)
    assert(ManifestTable.deserialize(legacy).contains(
      Manifest(3, "", Seq(ManifestEntry("", "g-old", Seq("f0.parquet", "f1.parquet"))))))
    // a malformed stats field (no '#') must reject the whole manifest,
    // never half-parse — torn-pointer safety is parse-strictness
    val bad = "graft-manifest\t1\t3\t\n\tg-x\t\tnosep\t\n"
    val badSha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(bad.getBytes(StandardCharsets.UTF_8)).map("%02x".format(_)).mkString
    assert(ManifestTable.deserialize(
      (s"sha256:$badSha\n" + bad).getBytes(StandardCharsets.UTF_8)).isEmpty)
  }

  test("stats-bearing manifests resolve with ZERO per-file listing calls — flat in file count") {
    val c = freshStore("stats1")
    c.write(spark.range(0, 50).selectExpr("id", "cast(id as string) v"),
      "t", WriteMode.Overwrite)
    c.write(spark.range(50, 60).selectExpr("id", "cast(id as string) v"),
      "t", WriteMode.Append)
    val root = new Path(c.pathFor("t"))
    def countsFor(r: Path): (Long, Long) = {
      MemFsStore.resetCounters()
      val idx = new ManifestFileIndex(spark, r, "")
      val files = idx.listFiles(Nil, Nil).flatMap(_.files)
      assert(files.nonEmpty && idx.sizeInBytes > 0)
      (MemFsStore.listStatusCalls.get(), MemFsStore.getFileStatusCalls.get())
    }
    val (ls1, gs1) = countsFor(root)
    // resolve() itself costs one _commits listing plus two statuses
    // (the _commits existence probe + the commit file's own status) —
    // CONSTANT; the per-file listing of round 14 is gone
    assert(ls1 == 1, s"expected exactly the _commits listing, got $ls1 listStatus calls")
    assert(gs1 == 2, s"expected the two resolve statuses only, got $gs1 getFileStatus calls")
    // a table with many more files and generations costs EXACTLY the same
    val c2 = freshStore("stats2")
    c2.write(spark.range(0, 200).repartition(8).selectExpr("id", "cast(id as string) v"),
      "t", WriteMode.Overwrite)
    (1 to 5).foreach(i => c2.write(
      spark.range(200L * i, 200L * i + 40).repartition(4)
        .selectExpr("id", "cast(id as string) v"), "t", WriteMode.Append))
    val (ls2, gs2) = countsFor(new Path(c2.pathFor("t")))
    assert((ls2, gs2) == (ls1, gs1),
      s"resolve cost grew with file count: ($ls2, $gs2) vs ($ls1, $gs1)")
  }

  test("synthesized statuses carry the REAL lengths: sizeInBytes matches the filesystem") {
    val c = freshStore("stats3")
    c.write(spark.range(0, 100).selectExpr("id", "concat('v', id) v"),
      "t", WriteMode.Overwrite)
    c.write(spark.range(100, 120).selectExpr("id", "concat('v', id) v"),
      "t", WriteMode.Append)
    val root = new Path(c.pathFor("t"))
    val idx = new ManifestFileIndex(spark, root, "")
    val m = ManifestTable.resolve(fs, root).get
    val realBytes = m.entries.flatMap(e => ManifestTable.entryPaths(root, e))
      .flatMap(p => fs.listStatus(p).toSeq.filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith(".")))
      .map(_.getLen).sum
    assert(idx.sizeInBytes == realBytes,
      s"stats drifted from reality: ${idx.sizeInBytes} vs $realBytes")
    // and the single-scan read over synthesized statuses is value-exact
    val got = ManifestFileIndex.relation(spark, root.toString, "")
      .as[(Long, String)].collect().toMap
    assert(got == (0L until 120L).map(i => i -> s"v$i").toMap)
  }

  test("a stats-LESS manifest (pre-upgrade shape) still reads via the listing fallback") {
    val c = freshStore("stats4")
    val root = new Path(c.pathFor("t"))
    // write real data, then commit entries WITHOUT stats — the shape
    // every pre-round-15 commit file has after deserialization
    spark.range(0, 30).selectExpr("id", "cast(id as string) v")
      .write.parquet(new Path(root, "g-legacy").toString)
    fs.delete(new Path(new Path(root, "g-legacy"), "_SUCCESS"), false)
    ManifestTable.commit(fs, root, "",
      Map("" -> Some(ManifestEntry("", "g-legacy", Nil))))
    val got = ManifestFileIndex.relation(spark, root.toString, "")
      .as[(Long, String)].collect().toMap
    assert(got == (0L until 30L).map(i => i -> i.toString).toMap)
    val idx = new ManifestFileIndex(spark, root, "")
    assert(idx.sizeInBytes > 0 && idx.inputFiles.nonEmpty)
  }
}
