package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The write side of the graftmanifest surface (round 14):
  * `df.write.format("graftmanifest")` lands every mode as an immutable
  * generation + one pointer commit. Runs on copy-rename MemFs (S3A
  * semantics) — the store family the discipline exists for.
  */
class ManifestWriteSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("memfs://shared/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private var n = 0
  private def freshRoot(): String = {
    MemFsStore.clear()
    MemFsStore.renameAsCopy = true
    spark.sparkContext.hadoopConfiguration
      .set("fs.memfs.impl", classOf[MemFs].getName)
    n += 1
    s"memfs://shared/mw$n/t"
  }

  private def day(d: Int) = s"2024-01-0$d"

  test("fresh partitioned overwrite: manifested from write one, read back via the single scan, pruned") {
    val root = freshRoot()
    val df = spark.range(0, 60).select(col("id").as("event_id"),
      date_add(lit("2024-01-01").cast("date"), (col("id") % 3).cast("int")).as("day"))
    df.write.format("graftmanifest").option("partCol", "day").save(root)
    assert(ManifestTable.resolve(fs, new Path(root)).exists(_.entries.size == 3))
    val back = spark.read.format("graftmanifest").option("partCol", "day").load(root)
    assert(back.count() == 60)
    assert(back.filter(col("day") === lit(day(2)).cast("date")).count() == 20)
    // resolve-time pruning option agrees
    assert(spark.read.format("graftmanifest").option("partCol", "day")
      .option("parts", day(2)).load(root).count() == 20)
  }

  test("overwrite retires every previous entry; superseded bytes become gc-able; _commits survives") {
    val root = freshRoot()
    Seq((1, "a"), (2, "b")).toDF("id", "v")
      .write.format("graftmanifest").save(root)
    Seq((9, "z")).toDF("id", "v")
      .write.format("graftmanifest").mode(SaveMode.Overwrite).save(root)
    val m = ManifestTable.resolve(fs, new Path(root)).get
    assert(m.entries.size == 1)
    assert(spark.read.format("graftmanifest").load(root)
      .as[(Int, String)].collect().toMap == Map(9 -> "z"))
    ManifestTable.gc(fs, new Path(root), keepCommits = 1, orphanRetentionMs = 0L)
    val gens = fs.listStatus(new Path(root)).map(_.getPath.getName)
      .filter(_.startsWith(ManifestTable.GenPrefix)).toSet
    assert(gens.size == 1, s"superseded generation survived aged gc: $gens")
    assert(spark.read.format("graftmanifest").load(root)
      .as[(Int, String)].collect().toMap == Map(9 -> "z"), "gc touched live data")
  }

  test("unpartitioned append is additive; partitioned append carries old files by reference") {
    val root = freshRoot()
    Seq((1, "a")).toDF("id", "v").write.format("graftmanifest").save(root)
    Seq((2, "b")).toDF("id", "v")
      .write.format("graftmanifest").mode(SaveMode.Append).save(root)
    assert(spark.read.format("graftmanifest").load(root)
      .as[(Int, String)].collect().toMap == Map(1 -> "a", 2 -> "b"))
    // partitioned append (round 18): new entry = fresh files + carry of
    // the partition's previous files; untouched partitions untouched;
    // NO data file is rewritten or moved
    val proot = freshRoot()
    spark.range(0, 6).select(col("id").as("event_id"),
        lit("2024-01-01").cast("date").as("day"))
      .write.format("graftmanifest").option("partCol", "day").save(proot)
    val fsP = new Path(proot).getFileSystem(spark.sessionState.newHadoopConf())
    val before = ManifestTable.liveFileRefs(fsP, new Path(proot),
      ManifestTable.resolve(fsP, new Path(proot)).get)
      .map(r => r.rootRel -> fsP.getFileStatus(new Path(new Path(proot), r.rootRel))
        .getModificationTime).toMap
    spark.range(6, 9).select(col("id").as("event_id"),
        lit("2024-01-01").cast("date").as("day"))
      .write.format("graftmanifest").option("partCol", "day")
      .mode(SaveMode.Append).save(proot)
    spark.range(9, 11).select(col("id").as("event_id"),
        lit("2024-01-02").cast("date").as("day"))
      .write.format("graftmanifest").option("partCol", "day")
      .mode(SaveMode.Append).save(proot)
    val m = ManifestTable.resolve(fsP, new Path(proot)).get
    val day1 = m.entries.find(_.part == "2024-01-01").get
    assert(day1.carry.nonEmpty, "appended partition must carry its previous files")
    before.foreach { case (rel, mtime) =>
      assert(fsP.getFileStatus(new Path(new Path(proot), rel)).getModificationTime
        == mtime, s"partitioned append touched pre-existing data file $rel")
    }
    val out = spark.read.format("graftmanifest").option("partCol", "day").load(proot)
    assert(out.count() == 11)
    assert(out.filter(col("day") === lit("2024-01-01").cast("date")).count() == 9)
    assert(out.filter(col("day") === lit("2024-01-02").cast("date")).count() == 2)
    assert(out.agg(sum("event_id")).head().getLong(0) == (0 until 11).map(_.toLong).sum)
  }

  test("ErrorIfExists refuses an existing table; Ignore leaves it untouched; both write a fresh one") {
    val root = freshRoot()
    Seq((1, "a")).toDF("id", "v")
      .write.format("graftmanifest").mode(SaveMode.ErrorIfExists).save(root)
    intercept[IllegalStateException] {
      Seq((2, "b")).toDF("id", "v")
        .write.format("graftmanifest").mode(SaveMode.ErrorIfExists).save(root)
    }
    Seq((2, "b")).toDF("id", "v")
      .write.format("graftmanifest").mode(SaveMode.Ignore).save(root)
    assert(spark.read.format("graftmanifest").load(root)
      .as[(Int, String)].collect().toMap == Map(1 -> "a"))
  }

  test("overwrite ADOPTS a plain partitioned layout: pre-manifest files are retired and gc-able") {
    val root = freshRoot()
    spark.range(0, 10).select(col("id").as("event_id"),
        lit("2024-01-01").cast("date").as("day"))
      .write.partitionBy("day").parquet(root) // a plain external layout
    assert(ManifestTable.resolve(fs, new Path(root)).isEmpty)
    spark.range(100, 105).select(col("id").as("event_id"),
        lit("2024-01-02").cast("date").as("day"))
      .write.format("graftmanifest").option("partCol", "day")
      .mode(SaveMode.Overwrite).save(root)
    val got = spark.read.format("graftmanifest").option("partCol", "day").load(root)
    assert(got.select("event_id").as[Long].collect().sorted.toSeq == (100L to 104L))
    ManifestTable.gc(fs, new Path(root), keepCommits = 1, orphanRetentionMs = 0L)
    val plainDirs = fs.listStatus(new Path(root)).map(_.getPath.getName)
      .filter(_.startsWith("day=")).toSeq
    assert(plainDirs.isEmpty, s"adopted plain partitions never became gc-able: $plainDirs")
  }

  test("versionAsOf time-travels within the retained window; a gc'd version fails naming the retained set") {
    val root = freshRoot()
    Seq((1, "v1")).toDF("id", "v").write.format("graftmanifest").save(root)
    Seq((2, "v2")).toDF("id", "v")
      .write.format("graftmanifest").mode(SaveMode.Overwrite).save(root)
    val vs = ManifestTable.versions(fs, new Path(root))
    assert(vs.size == 2, s"expected both versions retained (KeepCommits=2): $vs")
    val (cur, prev) = (vs.head, vs.last)
    assert(spark.read.format("graftmanifest").option("versionAsOf", prev.toString)
      .load(root).as[(Int, String)].collect().toMap == Map(1 -> "v1"),
      "time travel did not read the previous complete state")
    assert(spark.read.format("graftmanifest").option("versionAsOf", cur.toString)
      .load(root).as[(Int, String)].collect().toMap == Map(2 -> "v2"))
    // retire the old version; reading it must fail LOUDLY with the window
    ManifestTable.gc(fs, new Path(root), keepCommits = 1, orphanRetentionMs = 0L)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graftmanifest").option("versionAsOf", prev.toString)
        .load(root).collect()
    }
    assert(e.getMessage.contains("no retained version") &&
      e.getMessage.contains(cur.toString), e.getMessage)
  }

  test("a planted mid-copy crash during a graftmanifest overwrite leaves the previous state live") {
    val root = freshRoot()
    Seq((1, "keep")).toDF("id", "v").write.format("graftmanifest").save(root)
    var fired = 0
    (1 to 4).foreach { step =>
      MemFsStore.renameCopyCrashAfter.set(step)
      val crashed =
        try {
          Seq((2, "new")).toDF("id", "v")
            .write.format("graftmanifest").mode(SaveMode.Overwrite).save(root)
          false
        } catch { case _: Throwable => true }
      if (crashed) fired += 1
      MemFsStore.disarmCrash()
      val now = spark.read.format("graftmanifest").load(root)
        .as[(Int, String)].collect().toMap
      assert(now == Map(1 -> "keep") || now == Map(2 -> "new"),
        s"step-$step crash tore the table: $now")
    }
    assert(fired > 0, "injection never fired")
  }
}
