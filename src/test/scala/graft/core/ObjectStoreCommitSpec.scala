package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Round-12 verdict task 1: the layout maintenance engine on
  * OBJECT-STORE rename semantics.
  *
  * On S3-family stores there is no rename: S3A emulates it as a
  * per-object copy followed by a per-object delete — non-atomic and
  * O(data). [[MemFsStore.renameAsCopy]] models exactly that, with a
  * countdown crash injector ([[MemFsStore.renameCopyCrashAfter]]) that
  * kills the "process" mid-copy and latches, so task retries cannot
  * quietly absorb the injection.
  *
  * The first two tests DEMONSTRATE the failure the round-11 engine had
  * there: the retired two-rename swap (stage sibling → rename live
  * away → rename staging in) leaves a missing table for the whole
  * second copy window and, on a crash mid-copy, a PARTIAL table that a
  * plain reader consumes without any error — silent row loss, the
  * worst failure class a table maintenance engine can have.
  *
  * The rest prove the replacement ([[ManifestTable]] pointer commits):
  * data files are immutable, rewrites land in fresh `g-*` generation
  * directories, and the live state flips via one create-if-absent
  * pointer file — so a crash at ANY point (including inside Spark's
  * own job-commit renames, which on this FS are themselves non-atomic
  * copies) leaves either the old or the new file set live, never a
  * mix, and gc sweeps the debris.
  */
class ObjectStoreCommitSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("memfs://shared/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def freshStore(): Unit = {
    MemFsStore.clear()
    MemFsStore.renameAsCopy = true
    spark.sparkContext.hadoopConfiguration
      .set("fs.memfs.impl", classOf[MemFs].getName)
  }

  private def memKeys(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    MemFsStore.entries.keySet().asScala.toSeq.sorted
  }

  test("copy-rename: the window is observable and a crash strands a partial destination") {
    freshStore()
    val src = new Path("memfs://shared/raw/src")
    (1 to 5).foreach { i =>
      val out = fs.create(new Path(src, s"f$i"), true)
      out.write(Array.fill(10)(i.toByte)); out.close()
    }
    // crash after 3 per-object copy steps (dir node + 2 files)
    MemFsStore.renameCopyCrashAfter.set(3)
    val ex = intercept[java.io.IOException] {
      fs.rename(src, new Path("memfs://shared/raw/dst"))
    }
    assert(ex.getMessage.contains("injected crash"))
    // the torn state: source fully intact, destination PARTIALLY populated
    assert(fs.listStatus(src).count(_.isFile) == 5, "source must survive a mid-copy crash")
    val dstFiles = fs.listStatus(new Path("memfs://shared/raw/dst")).count(_.isFile)
    assert(dstFiles > 0 && dstFiles < 5, s"expected a partial destination, got $dstFiles of 5")
    // the process is dead: every further rename fails until disarmed
    intercept[java.io.IOException] {
      fs.rename(new Path("memfs://shared/raw/src/f1"), new Path("memfs://shared/raw/x"))
    }
    MemFsStore.disarmCrash()
  }

  test("the retired two-rename swap silently loses rows on object-store semantics") {
    freshStore()
    val live = "memfs://shared/twostep/table"
    val staging = "memfs://shared/twostep/table.compact-1"
    val retired = "memfs://shared/twostep/table.old-1"
    val df = (1 to 400).map(i => (i.toLong, s"row-$i")).toDF("id", "v")
    df.repartition(4).write.parquet(live)
    df.repartition(2).write.parquet(staging)
    fs.delete(new Path(live, "_SUCCESS"), false)
    fs.delete(new Path(staging, "_SUCCESS"), false)
    assert(spark.read.parquet(live).count() == 400)

    // replay the round-11 discipline. Rename #1 (live → retired)
    // completes — but on this store it is a copy, and the instant it
    // finishes the table is GONE for every reader until rename #2
    // finishes its own O(data) copy: the missing-table window.
    assert(fs.rename(new Path(live), new Path(retired)))
    intercept[Exception] { spark.read.parquet(live).count() }

    // rename #2 (staging → live) crashes mid-copy: 1 dir node + 1 of
    // 2 data files copied. A plain reader now sees a directory of
    // valid parquet files — and returns HALF the table with NO error.
    MemFsStore.renameCopyCrashAfter.set(2)
    intercept[java.io.IOException] {
      fs.rename(new Path(staging), new Path(live))
    }
    MemFsStore.disarmCrash()
    val torn = spark.read.parquet(live).count()
    assert(torn > 0 && torn < 400,
      s"expected silent partial reads from the torn swap, got $torn of 400")
  }

  test("manifest rewrite: a crash at any copy step leaves the previous commit live; rerun converges; gc sweeps the orphan") {
    freshStore()
    val root = "memfs://shared/mtable/events"
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03")
    val rows = for {
      (d, di) <- days.zipWithIndex
      i <- 1 to 50
    } yield (di * 1000L + i, s"u$i", d)
    rows.toDF("id", "user", "day_s")
      .withColumn("day", to_date($"day_s")).drop("day_s")
      .repartition(4)
      .write.partitionBy("day").parquet(root)

    // first compaction adopts the plain layout and rewrites one day
    graft.operators.StorageOps.compactDays(spark, root, Seq("2024-01-01"))
    def live() = graft.operators.StorageOps.readDayLayout(spark, root)
    val snap = live().collect().map(_.toString).sorted.toSeq
    assert(snap.size == 150)

    // now crash INSIDE the rewrite at EVERY copy step in turn —
    // Spark's own job-commit renames (non-atomic copies here) are the
    // injection surface; the latch keeps the "process" dead through
    // Spark's task retries. Whatever the step: either the write died
    // (no commit — table unchanged) or the write finished and the
    // pointer committed (table = recompacted same rows). NEVER a mix.
    var fired = 0
    (1 to 8).foreach { step =>
      MemFsStore.renameCopyCrashAfter.set(step)
      val crashed =
        try { graft.operators.StorageOps.compactDays(spark, root, Seq("2024-01-02")); false }
        catch { case _: Throwable => true }
      assert(crashed == MemFsStore.renameCopyCrashed,
        s"step $step: crash flag and outcome disagree")
      if (crashed) fired += 1
      MemFsStore.disarmCrash()
      assert(live().collect().map(_.toString).sorted.toSeq == snap,
        s"step-$step crash tore the visible table")
    }
    assert(fired > 0, "injection never fired — the rewrite does no renames?")

    // rerun converges; content identical
    graft.operators.StorageOps.compactDays(spark, root, Seq("2024-01-02"))
    assert(live().collect().map(_.toString).sorted.toSeq == snap)
    // the other crash class: died AFTER writing data, BEFORE the
    // pointer commit — a fully-populated generation no commit names
    val orphan = new Path(root, ManifestTable.GenPrefix + "diedprecommit/day=2024-01-02")
    val out = fs.create(new Path(orphan, "part-dead.parquet"), true)
    out.write(Array.fill(96)(1.toByte)); out.close()
    assert(live().collect().map(_.toString).sorted.toSeq == snap,
      "an uncommitted generation leaked into the read path")
    // aged gc with history collapsed to the single newest commit
    // reclaims it, every crashed-rewrite husk, AND the grace-window
    // generation of the previous commit, in one sweep
    val reclaimed = ManifestTable.gc(fs, new Path(root),
      keepCommits = 1, orphanRetentionMs = 0L)
    assert(reclaimed >= 96L, s"uncommitted generation not reclaimed: $reclaimed")
    // nothing unreferenced left: every surviving top-level g-* dir is
    // named by the one kept commit
    val kept = ManifestTable.resolve(fs, new Path(root)).get
    val liveGens = kept.entries.map(_.dir.split('/').head).toSet
    val onDisk = fs.listStatus(new Path(root)).map(_.getPath.getName)
      .filter(_.startsWith(ManifestTable.GenPrefix)).toSet
    assert(onDisk.subsetOf(liveGens + ""), s"orphan generations survived gc: ${onDisk -- liveGens}")
    assert(live().collect().map(_.toString).sorted.toSeq == snap,
      "gc touched live data")
  }

  test("compactParquet (unpartitioned, explicit-file adoption) is crash-safe on copy-rename storage") {
    freshStore()
    val root = "memfs://shared/flat/t"
    (1 to 500).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(6).write.parquet(root)
    fs.delete(new Path(root, "_SUCCESS"), false)
    def content() = Maintenance.readTable(spark, root)
      .collect().map(_.toString).sorted.toSeq
    val snap = content()
    val (b1, a1) = Maintenance.compactParquet(spark, root, targetBytes = 1L << 30)
    assert(b1 == 6 && a1 == 1 && content() == snap)
    // crash sweep inside the rewrite's own job-commit copies: whatever
    // the step, readers see the 1-file state or the (identical)
    // recompacted one — never a partial directory
    var fired = 0
    (1 to 5).foreach { step =>
      MemFsStore.renameCopyCrashAfter.set(step)
      val crashed =
        try { Maintenance.compactParquet(spark, root, targetBytes = 1L << 30); false }
        catch { case _: Throwable => true }
      if (crashed) fired += 1
      MemFsStore.disarmCrash()
      assert(content() == snap, s"step-$step crash tore the unpartitioned table")
    }
    assert(fired > 0, "injection never fired")
    assert(ManifestTable.gc(fs, new Path(root),
      keepCommits = 1, orphanRetentionMs = 0L) >= 0L)
    assert(content() == snap)
  }

  test("a torn or corrupt commit pointer is skipped; readers observe the previous state") {
    freshStore()
    val root = new Path("memfs://shared/torn/t")
    val m1 = ManifestTable.commit(fs, root, "", Map("" ->
      Some(ManifestEntry("", "g-aaa", Seq("part-0.parquet")))))
    val m2 = ManifestTable.commit(fs, root, "", Map("" ->
      Some(ManifestEntry("", "g-bbb", Seq("part-0.parquet")))))
    assert(m1.seq == 1 && m2.seq == 2)
    // a torn write: half of a VALID commit's bytes under the next seq
    val valid = {
      val in = fs.open(new Path(root, s"${ManifestTable.CommitsDir}/${"%020d".format(2)}"))
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, true)
      buf.toByteArray
    }
    val torn = fs.create(new Path(root, s"${ManifestTable.CommitsDir}/${"%020d".format(3)}"), true)
    torn.write(valid, 0, valid.length / 2); torn.close()
    // and outright garbage above it
    val junk = fs.create(new Path(root, s"${ManifestTable.CommitsDir}/${"%020d".format(4)}"), true)
    junk.write("not a manifest".getBytes("UTF-8")); junk.close()

    val resolved = ManifestTable.resolve(fs, root)
    assert(resolved.map(_.seq).contains(2L),
      s"reader must fall back to the newest VALID commit, got $resolved")
    assert(resolved.get.entries.head.dir == "g-bbb")
    // the next commit goes ABOVE the debris — sequence stays linear.
    // Grace 0: these husks are modeled as a LONG-dead committer's; a
    // YOUNG invalid newest is waited out instead (CommitGraceSpec).
    val m5 = ManifestTable.commit(fs, root, "", Map("" ->
      Some(ManifestEntry("", "g-ccc", Seq("part-0.parquet")))), invalidGraceMs = 0L)
    assert(m5.seq == 5 && ManifestTable.resolve(fs, root).get.seq == 5)
  }

  test("concurrent committers race on create-if-absent; every update lands, the log stays linear") {
    freshStore()
    val root = new Path("memfs://shared/race/t")
    ManifestTable.commit(fs, root, "day",
      Map("seed" -> Some(ManifestEntry("seed", "day=seed", Nil))))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = (1 to 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = ManifestTable.commit(fs, root, "day",
            Map(s"d$i" -> Some(ManifestEntry(s"d$i", s"g-t$i/day=d$i", Nil)))).seq
        })
      }
      val seqs = futs.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      assert(seqs.distinct.size == 8, s"two committers claimed one sequence: $seqs")
    } finally pool.shutdownNow()
    val fin = ManifestTable.resolve(fs, root).get
    assert(fin.entries.map(_.part).toSet == (1 to 8).map(i => s"d$i").toSet + "seed",
      s"lost update: ${fin.entries.map(_.part).sorted}")
  }

  test("gc racing live committers never deletes live data; the final state carries every update") {
    freshStore()
    val root = new Path("memfs://shared/gcrace/t")
    // seed: 6 adopted partitions
    ManifestTable.commit(fs, root, "day", (1 to 6).map { i =>
      val d = s"d$i"
      val p = new Path(root, s"day=$d/part-0.parquet")
      val out = fs.create(p, true); out.write(Array.fill(32)(i.toByte)); out.close()
      d -> Some(ManifestEntry(d, s"day=$d", Nil))
    }.toMap)
    @volatile var stop = false
    val gcErrors = new java.util.concurrent.atomic.AtomicInteger(0)
    // default orphan retention: a retention shorter than the longest
    // in-flight write WOULD race data written before its commit — the
    // documented VACUUM caveat, not a bug; production keeps the 1 h
    // grace. Dropped-commit generations still retire on every sweep.
    val sweeper = new Thread(() => {
      while (!stop) {
        try ManifestTable.gc(fs, root)
        catch { case _: Throwable => gcErrors.incrementAndGet() }
      }
    }, "gc-race-sweeper")
    sweeper.start()
    // 30 sequential rewrites across the 6 partitions while gc churns:
    // each writes a fresh generation file then commits the pointer
    (1 to 30).foreach { n =>
      val d = s"d${(n % 6) + 1}"
      val gen = s"${ManifestTable.GenPrefix}r$n"
      val p = new Path(root, s"$gen/day=$d/part-0.parquet")
      val out = fs.create(p, true)
      out.write(Array.fill(32)((100 + n).toByte)); out.close()
      ManifestTable.commit(fs, root, "day",
        Map(d -> Some(ManifestEntry(d, s"$gen/day=$d", Nil))))
    }
    stop = true
    sweeper.join(10000)
    assert(gcErrors.get() == 0, s"gc threw ${gcErrors.get()} times under the race")
    // every partition's LIVE file exists and carries its newest bytes
    val fin = ManifestTable.resolve(fs, root).get
    assert(fin.entries.map(_.part).toSet == (1 to 6).map(i => s"d$i").toSet)
    fin.entries.foreach { e =>
      val files = ManifestTable.entryPaths(root, e)
        .flatMap(p => fs.listStatus(p).toSeq.filter(_.isFile))
      assert(files.nonEmpty, s"live partition ${e.part} lost its data to gc")
      files.foreach { st =>
        val in = fs.open(st.getPath)
        val b = new Array[Byte](st.getLen.toInt)
        in.readFully(0, b); in.close()
        assert(b.nonEmpty && (b(0) & 0xff) >= 100,
          s"live partition ${e.part} serves stale adopted bytes after 30 rewrites")
      }
    }
  }

  test("q142 erased layout + audit runs end-to-end on copy-rename storage, value-identical") {
    val sfDir = "/root/testdata/sf0.001"
    val expected = graft.SparkEntry.queries("q142_erase_audit")(spark, sfDir)
      .collect().map(_.toString).toSeq
    freshStore()
    val s = spark.newSession()
    s.conf.set(graft.operators.StorageOps.RootConfKey, "memfs://shared/layout")
    val got = graft.SparkEntry.queries("q142_erase_audit")(s, sfDir)
      .collect().map(_.toString).toSeq
    assert(got == expected)
    // the erase really went through the manifest engine on this store
    assert(memKeys().exists(_.contains("events_erased/" + ManifestTable.CommitsDir)),
      "no manifest commits under the erased layout on memfs")
  }
}
