package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Round-13 hardening of the manifest engine — each test pins one of
  * the advisor's round-12 findings:
  *
  *   1. commit() on HDFS-family stores (name reserved at create,
  *      content at close) must WAIT OUT an open-but-unwritten newest
  *      commit instead of claiming above it — claiming over it would
  *      silently drop that commit's update once its bytes land;
  *   2. an invalid newest commit OLDER than the grace window (a dead
  *      committer's husk) is claimed over, not waited on forever;
  *   3. gc ages `g-*` orphans by the newest FILE mtime under the
  *      generation, never the directory status — real S3A directories
  *      are synthetic and report mtime 0, which would make every
  *      in-flight generation look infinitely old; an empty candidate
  *      is young (a writer may be about to land its first object);
  *   4. readDayLayout with a day selection on a NOT-yet-manifested
  *      plain layout filters to the selection instead of silently
  *      returning every partition;
  *   5. adoptIfPlain on an already-manifested root checks the
  *      caller's partCol, failing with the real mismatch instead of a
  *      misleading downstream error.
  */
class ManifestHardeningSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("memfs://shared/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def freshStore(): Unit = {
    MemFsStore.clear()
    spark.sparkContext.hadoopConfiguration
      .set("fs.memfs.impl", classOf[MemFs].getName)
  }

  private def commitFile(root: Path, seq: Long): Path =
    new Path(new Path(root, ManifestTable.CommitsDir), f"$seq%020d")

  test("commit waits out an open-but-unwritten newest commit; its update is never dropped") {
    freshStore()
    val root = new Path("memfs://shared/grace/open")
    ManifestTable.commit(fs, root, "day",
      Map("d1" -> Some(ManifestEntry("d1", "day=d1", Nil))))
    // a concurrent committer has RESERVED seq 2 (create succeeded) but
    // its content has not landed yet — the HDFS open-commit window
    val reserved = fs.create(commitFile(root, 2L), false)
    val landLate = new Thread(() => {
      Thread.sleep(400)
      val m2 = Manifest(2L, "day",
        Seq(ManifestEntry("d1", "day=d1", Nil), ManifestEntry("d2", "g-x/day=d2", Nil)))
      reserved.write(ManifestTable.serialize(m2)); reserved.close()
    }, "late-lander")
    landLate.start()
    val t0 = System.nanoTime()
    val m3 = ManifestTable.commit(fs, root, "day",
      Map("d3" -> Some(ManifestEntry("d3", "g-y/day=d3", Nil))))
    landLate.join(5000)
    val waitedMs = (System.nanoTime() - t0) / 1000000
    assert(waitedMs >= 300, s"commit did not wait for the open commit ($waitedMs ms)")
    assert(m3.seq == 3L, s"expected to build on the landed seq 2, got seq ${m3.seq}")
    assert(m3.entries.map(_.part).toSet == Set("d1", "d2", "d3"),
      s"the landed commit's update was dropped: ${m3.entries.map(_.part).sorted}")
  }

  test("an aged invalid newest commit (dead committer's husk) is claimed over, not waited on") {
    freshStore()
    val root = new Path("memfs://shared/grace/husk")
    ManifestTable.commit(fs, root, "day",
      Map("d1" -> Some(ManifestEntry("d1", "day=d1", Nil))))
    val husk = fs.create(commitFile(root, 2L), false)
    husk.write("garbage from a committer that died mid-write".getBytes("UTF-8"))
    husk.close()
    fs.setTimes(commitFile(root, 2L), System.currentTimeMillis() - 120000L, -1)
    val t0 = System.nanoTime()
    val m3 = ManifestTable.commit(fs, root, "day",
      Map("d3" -> Some(ManifestEntry("d3", "g-y/day=d3", Nil))))
    val tookMs = (System.nanoTime() - t0) / 1000000
    assert(tookMs < 5000, s"commit stalled on an aged husk ($tookMs ms)")
    assert(m3.seq == 3L && m3.entries.map(_.part).toSet == Set("d1", "d3"))
  }

  test("gc ages orphans by newest file mtime, not directory mtime; empty candidates are young") {
    freshStore()
    val root = new Path("memfs://shared/gcage/t")
    val d1 = new Path(root, "day=d1/part-0.parquet")
    val out = fs.create(d1, true); out.write(Array.fill(16)(1.toByte)); out.close()
    ManifestTable.commit(fs, root, "day",
      Map("d1" -> Some(ManifestEntry("d1", "day=d1", Nil))))
    val hourMs = 3600L * 1000
    val now = System.currentTimeMillis()
    def plant(gen: String, withFile: Boolean, fileAge: Long, dirMtime: Long): Unit = {
      val dir = new Path(root, gen)
      if (withFile) {
        val p = new Path(dir, "day=dx/part-0.parquet")
        val o = fs.create(p, true); o.write(Array.fill(64)(7.toByte)); o.close()
        fs.setTimes(p, now - fileAge, -1)
        fs.setTimes(new Path(dir, "day=dx"), dirMtime, -1)
      } else fs.mkdirs(dir)
      fs.setTimes(dir, dirMtime, -1) // S3A synthetic-dir emulation
    }
    // fresh file under a dir reporting mtime 0 (the S3A trap): young
    plant("g-fresh", withFile = true, fileAge = 0L, dirMtime = 0L)
    // aged file under a dir reporting a FRESH mtime (inverse trap): dead
    plant("g-aged", withFile = true, fileAge = 2 * hourMs, dirMtime = now)
    // empty generation, dir mtime 0: young (first object may be landing)
    plant("g-empty", withFile = false, fileAge = 0L, dirMtime = 0L)
    val reclaimed = ManifestTable.gc(fs, root, keepCommits = 1, orphanRetentionMs = hourMs)
    val survivors = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith(ManifestTable.GenPrefix)).toSet
    assert(survivors == Set("g-fresh", "g-empty"),
      s"expected g-aged alone to be swept, survivors: $survivors")
    assert(reclaimed >= 64L, s"aged orphan's bytes not counted: $reclaimed")
  }

  test("day selection on a plain (unmanifested) layout filters instead of returning everything") {
    freshStore()
    val root = "memfs://shared/plainsel/events"
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03")
    val rows = for { (d, di) <- days.zipWithIndex; i <- 1 to 20 }
      yield (di * 100L + i, d)
    rows.toDF("id", "day_s").withColumn("day", to_date($"day_s")).drop("day_s")
      .repartition(2).write.partitionBy("day").parquet(root)
    // no compaction has ever touched this root — no manifest exists
    assert(ManifestTable.resolve(fs, new Path(root)).isEmpty)
    val sel = graft.operators.StorageOps.readDayLayout(
      spark, root, Some(Set("2024-01-02")))
    assert(sel.count() == 20, "selection must prune to the chosen day")
    assert(sel.select(col("day").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq == Seq("2024-01-02"))
  }

  test("a husk whose store mtime is skewed into the future is claimed over on the CLIENT clock, not waited on forever") {
    freshStore()
    val root = new Path("memfs://shared/grace/skew")
    ManifestTable.commit(fs, root, "day",
      Map("d1" -> Some(ManifestEntry("d1", "day=d1", Nil))))
    val husk = fs.create(commitFile(root, 2L), false)
    husk.write("dead committer, skewed store clock".getBytes("UTF-8")); husk.close()
    // store clock an hour AHEAD of the client: store-mtime age is
    // negative forever, so the pre-round-14 wait never ends
    fs.setTimes(commitFile(root, 2L), System.currentTimeMillis() + 3600L * 1000, -1)
    val t0 = System.nanoTime()
    val m3 = ManifestTable.commit(fs, root, "day",
      Map("d3" -> Some(ManifestEntry("d3", "g-y/day=d3", Nil))),
      invalidGraceMs = 150L)
    val tookMs = (System.nanoTime() - t0) / 1000000
    assert(tookMs >= 250 && tookMs < 5000,
      s"expected a ~2x-grace client-clock wait then claim-over, took $tookMs ms")
    assert(m3.seq == 3L && m3.entries.map(_.part).toSet == Set("d1", "d3"))
  }

  test("a stream of crash-looping committers planting fresh husks fails loudly at the total-wait ceiling, never hangs") {
    freshStore()
    val root = new Path("memfs://shared/grace/stream")
    ManifestTable.commit(fs, root, "day",
      Map("d1" -> Some(ManifestEntry("d1", "day=d1", Nil))))
    // the planter: every 40 ms a "new committer" reserves the next seq,
    // writes garbage, stamps a future mtime (always store-young), and
    // dies — the newest husk is never older than 40 ms on our clock
    def plantHusk(): Unit = {
      val newest = fs.listStatus(new Path(root, ManifestTable.CommitsDir))
        .flatMap(_.getPath.getName.toLongOption).max
      try {
        val p = commitFile(root, newest + 1)
        val o = fs.create(p, false)
        o.write("husk".getBytes("UTF-8")); o.close()
        fs.setTimes(p, System.currentTimeMillis() + 3600L * 1000, -1)
      } catch { case _: java.io.IOException => } // raced; re-plant next tick
    }
    plantHusk() // the first husk is in place BEFORE the committer starts
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val planter = new Thread(() => {
      while (!stop.get()) { Thread.sleep(40); plantHusk() }
    }, "husk-planter")
    planter.start()
    try {
      val ex = intercept[ManifestContentionException] {
        ManifestTable.commit(fs, root, "day",
          Map("dx" -> Some(ManifestEntry("dx", "g-x/day=dx", Nil))),
          invalidGraceMs = 100L)
      }
      assert(ex.getMessage.contains("ceiling"), ex.getMessage)
    } finally { stop.set(true); planter.join(5000) }
    // safety untouched: the last VALID state is still commit 1
    assert(ManifestTable.resolve(fs, root).get.entries.map(_.part) == Seq("d1"))
  }

  test("schema drift across generations fails the read loudly instead of silently narrowing") {
    freshStore()
    val root = "memfs://shared/drift/t"
    Seq((1L, "a")).toDF("id", "v")
      .write.parquet(s"$root/g-aa/day=d1")
    // the newer generation grew a column the first group lacks
    Seq((2L, "b", 9L)).toDF("id", "v", "extra")
      .write.parquet(s"$root/g-zz/day=d2")
    ManifestTable.commit(fs, new Path(root), "day", Map(
      "d1" -> Some(ManifestEntry("d1", "g-aa/day=d1", Nil)),
      "d2" -> Some(ManifestEntry("d2", "g-zz/day=d2", Nil))))
    val ex = intercept[IllegalArgumentException] {
      ManifestTable.read(spark, root, partCol = "day").collect()
    }
    assert(ex.getMessage.contains("schema drifted") && ex.getMessage.contains("extra"),
      ex.getMessage)
    // same shape with NO drift still reads: both generations united
    val root2 = "memfs://shared/drift/ok"
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$root2/g-aa/day=d1")
    Seq((2L, "b")).toDF("id", "v").write.parquet(s"$root2/g-zz/day=d2")
    ManifestTable.commit(fs, new Path(root2), "day", Map(
      "d1" -> Some(ManifestEntry("d1", "g-aa/day=d1", Nil)),
      "d2" -> Some(ManifestEntry("d2", "g-zz/day=d2", Nil))))
    assert(ManifestTable.read(spark, root2, partCol = "day")
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("adoptIfPlain on an already-manifested root rejects a partCol mismatch by name") {
    freshStore()
    val root = new Path("memfs://shared/adoptchk/t")
    ManifestTable.commit(fs, root, "day",
      Map("d1" -> Some(ManifestEntry("d1", "day=d1", Nil))))
    val ex = intercept[IllegalArgumentException] {
      ManifestTable.adoptIfPlain(fs, root, partCol = "")
    }
    assert(ex.getMessage.contains("partitions on 'day'"), ex.getMessage)
    // the matching partCol still adopts as a no-op
    assert(ManifestTable.adoptIfPlain(fs, root, "day").entries.map(_.part) == Seq("d1"))
  }
}
