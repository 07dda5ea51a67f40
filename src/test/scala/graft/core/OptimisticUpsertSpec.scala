package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Round-14 verdict task 2: remote FileConnector upserts were
  * documented single-writer last-commit-wins — two concurrent upserts
  * to one index silently dropped the earlier one's rows, because each
  * rewrite carries its own full merged state and the later pointer flip
  * replaced the earlier's. Now every upsert commit is CONDITIONAL on
  * the snapshot it merged from (`ManifestTable.commit(expectedSeq)`);
  * a loser detects staleness, deletes its orphaned generation,
  * re-merges from the winner's state and retries, bounded at
  * [[FileConnector.MaxUpsertAttempts]]. All on copy-rename MemFs (S3A
  * semantics) — the store family where the anomaly actually bites.
  */
class OptimisticUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("memfs://shared/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def freshStore(sub: String): FileConnector = {
    MemFsStore.clear()
    MemFsStore.renameAsCopy = true
    spark.sparkContext.hadoopConfiguration
      .set("fs.memfs.impl", classOf[MemFs].getName)
    FileConnector("obj", s"memfs://shared/$sub", "parquet")
  }

  test("commit(expectedSeq) throws ManifestStaleException when the state advanced; nothing is written") {
    val c = freshStore("oc1")
    c.write(Seq((1, "a")).toDF("id", "v"), "t", WriteMode.Overwrite)
    val root = new Path(c.pathFor("t"))
    val base = ManifestTable.resolve(fs, root).get
    // an interleaved writer lands
    ManifestTable.commit(fs, root, "",
      Map("x" -> Some(ManifestEntry("x", base.entries.head.dir, Nil))))
    val advanced = ManifestTable.resolve(fs, root).get
    assert(advanced.seq == base.seq + 1)
    intercept[ManifestStaleException] {
      ManifestTable.commit(fs, root, "",
        Map("" -> Some(ManifestEntry("", "g-dead", Nil))),
        expectedSeq = Some(base.seq))
    }
    // the conditional commit wrote NOTHING — state is exactly the winner's
    assert(ManifestTable.resolve(fs, root).get == advanced)
  }

  test("two interleaved upserts BOTH land their rows value-exactly (deterministic interleave)") {
    val c = freshStore("oc2")
    c.write(Seq((1, "old1"), (2, "old2"), (3, "keep")).toDF("id", "v"),
      "t", WriteMode.Overwrite)
    val hookFired = new java.util.concurrent.atomic.AtomicInteger(0)
    // writer B's full upsert runs INSIDE writer A's stale window — after
    // A wrote its generation, before A's conditional commit
    FileConnector.beforeUpsertCommit = () =>
      if (hookFired.incrementAndGet() == 1) {
        c.write(Seq((2, "B"), (11, "AddB")).toDF("id", "v"),
          "t", WriteMode.Replace(Seq("id")))
      }
    try c.write(Seq((1, "A"), (10, "AddA")).toDF("id", "v"),
      "t", WriteMode.Replace(Seq("id")))
    finally FileConnector.beforeUpsertCommit = () => ()
    // A attempt 1 (stale) + B's attempt + A's retry
    assert(hookFired.get() == 3,
      s"expected exactly one stale retry, hook fired ${hookFired.get()} times")
    assert(c.read(spark, "t").as[(Int, String)].collect().toMap ==
      Map(1 -> "A", 2 -> "B", 3 -> "keep", 10 -> "AddA", 11 -> "AddB"),
      "the interleaved writer's rows were dropped — lost update")
    // the loser's first-attempt generation was swept, not left as debris
    val live = ManifestTable.resolve(fs, new Path(c.pathFor("t"))).get
      .entries.map(_.dir.split('/').head).toSet
    val commits = ManifestTable.resolve(fs, new Path(c.pathFor("t"))).get.seq
    assert(commits >= 3, "retry did not go through a fresh commit")
    val onDisk = fs.listStatus(new Path(c.pathFor("t"))).map(_.getPath.getName)
      .filter(_.startsWith(ManifestTable.GenPrefix)).toSet
    // gc keeps the previous-commit window; beyond that only live gens
    ManifestTable.gc(fs, new Path(c.pathFor("t")), keepCommits = 1, orphanRetentionMs = 0L)
    val after = fs.listStatus(new Path(c.pathFor("t"))).map(_.getPath.getName)
      .filter(_.startsWith(ManifestTable.GenPrefix)).toSet
    assert(after.subsetOf(live), s"stale-attempt debris survived: ${after -- live} (was $onDisk)")
  }

  test("concurrent upserts from real threads all land under the bounded retry") {
    val c = freshStore("oc3")
    c.write(Seq((0, "base")).toDF("id", "v"), "t", WriteMode.Overwrite)
    val writers = 3
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    val barrier = new java.util.concurrent.CyclicBarrier(writers)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (1 to writers).foreach { w =>
      pool.execute { () =>
        try {
          barrier.await()
          c.write(Seq((w * 100, s"w$w"), (w * 100 + 1, s"w${w}b")).toDF("id", "v"),
            "t", WriteMode.Replace(Seq("id")))
        } catch { case t: Throwable => failures.add(t); () }
      }
    }
    pool.shutdown()
    assert(pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS))
    assert(failures.isEmpty, s"writer failed: ${Option(failures.peek()).map(_.toString)}")
    val got = c.read(spark, "t").as[(Int, String)].collect().toMap
    val want = Map(0 -> "base") ++
      (1 to writers).flatMap(w => Seq(w * 100 -> s"w$w", w * 100 + 1 -> s"w${w}b"))
    assert(got == want, s"concurrent upserts lost rows: missing ${want.keySet -- got.keySet}")
  }

  test("commit=manifest forces the optimistic manifest protocol on a LOCAL root (NFS-share shape)") {
    val root = tmpDir("graft-local-manifest")
    val c = FileConnector("loc", root, "parquet", Map("commit" -> "manifest"))
    c.write(Seq((1, "old"), (2, "keep")).toDF("id", "v"), "t", WriteMode.Overwrite)
    val lfs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(ManifestTable.resolve(lfs, new Path(c.pathFor("t"))).isDefined,
      "local root with commit=manifest fell through to the rename-swap path")
    // interleaved upserts both land, exactly like the remote case
    val hookFired = new java.util.concurrent.atomic.AtomicInteger(0)
    FileConnector.beforeUpsertCommit = () =>
      if (hookFired.incrementAndGet() == 1) {
        c.write(Seq((2, "B")).toDF("id", "v"), "t", WriteMode.Replace(Seq("id")))
      }
    try c.write(Seq((1, "A")).toDF("id", "v"), "t", WriteMode.Replace(Seq("id")))
    finally FileConnector.beforeUpsertCommit = () => ()
    assert(hookFired.get() == 3)
    assert(c.read(spark, "t").as[(Int, String)].collect().toMap ==
      Map(1 -> "A", 2 -> "B"))
    assert(c.listIndexes(spark) == Seq("t"),
      s"catalog walk leaked manifest internals: ${c.listIndexes(spark)}")
  }

  test("LOCAL-fs commits are atomic create-with-content: a concurrent hammer loses no update") {
    // Hadoop's raw local create(overwrite=false) is check-then-create —
    // two committers could both "win" one seq and the second TRUNCATED
    // the first (the round-14 upsert kill soak caught it live). The
    // hard-link commit makes the race a real atomic create: hammer it.
    val root = new Path(tmpDir("graft-local-commit-race"))
    val lfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val threads = 6; val perThread = 10
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val barrier = new java.util.concurrent.CyclicBarrier(threads)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (1 to threads).foreach { t =>
      pool.execute { () =>
        try {
          barrier.await()
          (1 to perThread).foreach { i =>
            ManifestTable.commit(lfs, root, "",
              Map(s"t$t-$i" -> Some(ManifestEntry(s"t$t-$i", s"d-t$t-$i", Nil))))
          }
        } catch { case e: Throwable => failures.add(e); () }
      }
    }
    pool.shutdown()
    assert(pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS))
    assert(failures.isEmpty, s"committer failed: ${Option(failures.peek())}")
    val m = ManifestTable.resolve(lfs, root).get
    val want = (1 to threads).flatMap(t => (1 to perThread).map(i => s"t$t-$i")).toSet
    assert(m.entries.map(_.part).toSet == want,
      s"lost updates: missing ${want -- m.entries.map(_.part).toSet}")
    assert(m.seq == (threads * perThread).toLong, s"log not linear: newest seq ${m.seq}")
    // no .tmp-* staging debris under _commits after clean completion
    val tmps = lfs.listStatus(new Path(root, ManifestTable.CommitsDir))
      .map(_.getPath.getName).filter(_.startsWith(".tmp-"))
    assert(tmps.isEmpty, s"leaked staging files: ${tmps.toSeq}")
  }

  test("sustained contention fails LOUDLY at the bound — contention error, no data loss") {
    val c = freshStore("oc4")
    c.write(Seq((1, "a")).toDF("id", "v"), "t", WriteMode.Overwrite)
    val root = new Path(c.pathFor("t"))
    // every attempt is made stale by an interleaved direct commit
    FileConnector.beforeUpsertCommit = () => {
      val cur = ManifestTable.resolve(fs, root).get
      ManifestTable.commit(fs, root, "",
        Map(s"c${cur.seq}" -> Some(ManifestEntry(s"c${cur.seq}", cur.entries.head.dir, Nil))))
      ()
    }
    val e = try intercept[java.io.IOException] {
      c.write(Seq((2, "b")).toDF("id", "v"), "t", WriteMode.Replace(Seq("id")))
    } finally FileConnector.beforeUpsertCommit = () => ()
    assert(e.getMessage.contains("optimistic-commit race"),
      s"wrong failure under sustained contention: ${e.getMessage}")
    // the table is still readable at the last committed state — rows intact
    assert(c.read(spark, "t").as[(Int, String)].collect().toMap.get(1).contains("a"))
  }
}
