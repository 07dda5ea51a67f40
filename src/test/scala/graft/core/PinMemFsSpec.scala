package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.{FileAlreadyExistsException, Path}

/** Round-10 verdict task 2: the Pin artifact root on a NON-local
  * Hadoop FileSystem. Until round 11, Pin's Hadoop-FS plumbing had
  * only ever executed against `file://`; here the write / re-read /
  * memoize / heartbeat / prune lifecycle and a whole pinned funnel
  * (q83) run against [[MemFs]] — an in-memory FS enforcing HDFS
  * rename/commit semantics (rename-fails-on-existing-dst,
  * create-throws-without-overwrite, listStatus-throws-on-missing) that
  * the POSIX local FS is too lax to check, plus an S3A-style
  * setTimes-unsupported mode for heartbeat degradation.
  */
class PinMemFsSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def freshMemSession(root: String) = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.memfs.impl", classOf[MemFs].getName)
    val s = spark.newSession()
    s.conf.set(Pin.RootConfKey, root)
    s
  }

  private def memKeys(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    MemFsStore.entries.keySet().asScala.toSeq.sorted
  }

  test("MemFs enforces the HDFS semantics the local FS is too lax to check") {
    MemFsStore.clear()
    spark.sparkContext.hadoopConfiguration
      .set("fs.memfs.impl", classOf[MemFs].getName)
    val fs = new Path("memfs://shared/").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val f = new Path("memfs://shared/a/b/file1")
    val out = fs.create(f)
    out.write("hello".getBytes("UTF-8")); out.close()
    // parents implicitly created; status is a file of the right length
    assert(fs.getFileStatus(f).getLen == 5L)
    assert(fs.getFileStatus(new Path("memfs://shared/a/b")).isDirectory)
    // create without overwrite on an existing path throws (HDFS), not truncates (POSIX)
    intercept[FileAlreadyExistsException] { fs.create(f, false) }
    // rename onto an existing FILE fails; into an existing DIR moves inside
    val g = new Path("memfs://shared/a/b/file2")
    fs.create(g).close()
    assert(!fs.rename(f, g), "rename onto existing file must fail")
    assert(fs.mkdirs(new Path("memfs://shared/moved")))
    assert(fs.rename(f, new Path("memfs://shared/moved")))
    assert(fs.getFileStatus(new Path("memfs://shared/moved/file1")).getLen == 5L)
    // rename into a missing parent fails (HDFS requires the parent)
    assert(!fs.rename(g, new Path("memfs://shared/no/such/parent/x")))
    // listStatus on missing throws; non-recursive delete of non-empty dir throws
    intercept[java.io.FileNotFoundException] {
      fs.listStatus(new Path("memfs://shared/nope"))
    }
    intercept[java.io.IOException] {
      fs.delete(new Path("memfs://shared/a"), false)
    }
    assert(fs.delete(new Path("memfs://shared/a"), true))
    // directory rename carries the subtree
    fs.create(new Path("memfs://shared/tree/x/1")).close()
    assert(fs.rename(new Path("memfs://shared/tree"), new Path("memfs://shared/tree2")))
    assert(fs.getFileStatus(new Path("memfs://shared/tree2/x/1")).getLen == 0L)
  }

  test("Pin.shared writes, job-commits, re-reads and memoizes through HDFS-semantics storage") {
    MemFsStore.clear()
    val s = freshMemSession("memfs://shared/pins")
    import s.implicits._
    val name = "spec-memfs-pin"
    val pinned = Pin.shared(s, name)(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(pinned.collect().map(_.toString).sorted.toSeq == Seq("[1,a]", "[2,b]"))
    // the artifact lives in the mem store (parquet part + _SUCCESS from
    // the committer's HDFS rename path), NOT on the local disk root
    val keys = memKeys()
    assert(keys.exists(k => k.contains(s"/pins/$name-s") && k.endsWith("_SUCCESS")),
      s"no _SUCCESS in mem store: $keys")
    assert(keys.exists(k => k.contains(s"/pins/$name-s") && k.contains("part-")),
      s"no parquet part in mem store: $keys")
    assert(!new java.io.File(s"target/graft-layout/pins").exists() ||
      !new java.io.File(s"target/graft-layout/pins").listFiles()
        .exists(_.getName.startsWith(s"$name-s")),
      "pin leaked onto the local root despite the memfs conf")
    // memoized: second call must not re-evaluate the plan
    val again = Pin.shared(s, name)(sys.error("must not re-evaluate"))
    assert(again eq pinned)
    // the heartbeat's setTimes executed against memfs (mtime advanced
    // or equal — never an exception, and the dir is still listable)
    val fs = new Path("memfs://shared/pins").getFileSystem(
      s.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new Path("memfs://shared/pins")).nonEmpty)
    Pin.release(s, deleteArtifacts = true)
    assert(!memKeys().exists(_.contains(s"/pins/$name-s")),
      "release(deleteArtifacts) left the session's pins in the store")
  }

  test("age-based pruning reaps a stale foreign pin on the shared root; fresh pins survive") {
    MemFsStore.clear()
    val s = freshMemSession("memfs://shared/pins")
    import s.implicits._
    // a dead JVM's pin, untouched for 25h (the root dir must exist for
    // the pruner's listStatus — a real dead JVM would have created it)
    MemFsStore.entries.put("/pins",
      MemFsStore.Entry(Array.empty, isDir = true, System.currentTimeMillis()))
    val stale = "/pins/old-pin-sdeadbeef"
    MemFsStore.entries.put(stale,
      MemFsStore.Entry(Array.empty, isDir = true,
        System.currentTimeMillis() - 25L * 3600 * 1000))
    MemFsStore.entries.put(s"$stale/part-0.parquet",
      MemFsStore.Entry(Array.fill(4)(1.toByte), isDir = false,
        System.currentTimeMillis() - 25L * 3600 * 1000))
    Pin.rearmPruneForTest()
    val pinned = Pin.shared(s, "spec-memfs-prune")(Seq((9L, "z")).toDF("id", "v"))
    assert(pinned.collect().map(_.toString).toSeq == Seq("[9,z]"))
    assert(!memKeys().exists(_.startsWith(stale)), "stale pin not pruned")
    assert(memKeys().exists(_.contains("/pins/spec-memfs-prune-s")), "fresh pin missing")
    Pin.release(s, deleteArtifacts = true)
  }

  test("round 14 Pin.gc: dead-session pins are swept by newest-file age and the bytes are counted; live and young pins survive") {
    MemFsStore.clear()
    val s = freshMemSession("memfs://shared/pins")
    import s.implicits._
    val now = System.currentTimeMillis()
    def plant(dir: String, fileAgeMs: Long, dirMtime: Long, bytes: Int): Unit = {
      MemFsStore.entries.put(dir, MemFsStore.Entry(Array.empty, isDir = true, dirMtime))
      MemFsStore.entries.put(s"$dir/part-0.parquet",
        MemFsStore.Entry(Array.fill(bytes)(1.toByte), isDir = false, now - fileAgeMs))
      ()
    }
    // a dead JVM's pin: old files, old dir → reaped, bytes counted
    plant("/pins/dead-sdeadbeef", 25L * 3600 * 1000, now - 25L * 3600 * 1000, 64)
    // S3A shape: synthetic dir mtime 0 but FRESH file — the dir-mtime-
    // only aging of the pre-round-14 prune would have reaped this live
    // pin prematurely; newest-file aging must keep it
    plant("/pins/fresh-s3a-scafebabe", 0L, 0L, 8)
    // heartbeat shape: file written a day ago, dir mtime re-stamped NOW
    // (what a long-running foreign JVM's heartbeat does) → must survive
    plant("/pins/beating-sfeedf00d", 25L * 3600 * 1000, now, 8)
    // this session's OWN pin, aged artificially: live-session suffix
    // protection must keep it regardless of any mtime
    val mine = Pin.shared(s, "spec-gc-live")(Seq((1L, "x")).toDF("id", "v"))
    assert(mine.collect().length == 1)
    val myDir = memKeys().filter(_.contains("/pins/spec-gc-live-s"))
    myDir.foreach { k =>
      val e = MemFsStore.entries.get(k)
      MemFsStore.entries.put(k, MemFsStore.Entry(e.bytes, e.isDir, now - 48L * 3600 * 1000))
    }
    val before = Pin.reclaimedBytes
    val swept = Pin.gc(s)
    assert(swept == 64, s"expected exactly the dead pin's 64 bytes, got $swept")
    assert(Pin.reclaimedBytes == before + 64, "reclaimedBytes did not absorb the sweep")
    assert(!memKeys().exists(_.startsWith("/pins/dead-sdeadbeef")), "dead pin survived")
    assert(memKeys().exists(_.startsWith("/pins/fresh-s3a-scafebabe")),
      "fresh pin with synthetic dir mtime 0 was reaped — the S3A premature-deletion hazard")
    assert(memKeys().exists(_.startsWith("/pins/beating-sfeedf00d")),
      "heartbeat-stamped pin was reaped — the dir-mtime signal was ignored")
    assert(memKeys().exists(_.contains("/pins/spec-gc-live-s")),
      "the LIVE session's own pin was reaped despite the session-suffix protection")
    // release drops the session; its pin becomes structurally
    // unreachable and the next aged sweep reaps it too
    Pin.release(s)
    assert(Pin.gc(s, maxAgeMs = 24L * 3600 * 1000) > 0, "released session's aged pin not reaped")
    assert(!memKeys().exists(_.contains("/pins/spec-gc-live-s")))
  }

  test("object-store mode (setTimes unsupported): pins still build and re-read; heartbeat degrades to no-op") {
    MemFsStore.clear()
    MemFsStore.supportSetTimes = false
    try {
      val s = freshMemSession("memfs://shared/pins")
      import s.implicits._
      val pinned = Pin.shared(s, "spec-memfs-s3ish")(Seq((7L, "q")).toDF("id", "v"))
      assert(pinned.collect().map(_.toString).toSeq == Seq("[7,q]"))
      // repeated entry (the documented per-consumption contract) keeps
      // working — the failed touch is swallowed and retried, never fatal
      val again = Pin.shared(s, "spec-memfs-s3ish")(sys.error("must not re-evaluate"))
      assert(again.collect().map(_.toString).toSeq == Seq("[7,q]"))
      Pin.release(s, deleteArtifacts = true)
    } finally MemFsStore.supportSetTimes = true
  }

  test("q83 training funnel runs with its pins on HDFS-semantics storage, value-identical") {
    val expected = graft.SparkEntry.queries("q83_training_funnel")(spark, sfDir)
      .collect().map(_.toString).toSeq
    MemFsStore.clear()
    val s = freshMemSession("memfs://shared/pins")
    val got = graft.SparkEntry.queries("q83_training_funnel")(s, sfDir)
      .collect().map(_.toString).toSeq
    assert(got == expected)
    // the funnel's pins really did ride the mem FS
    assert(memKeys().exists(k => k.contains("/pins/") && k.endsWith("_SUCCESS")),
      s"q83 built no pins on the memfs root: ${memKeys().take(20)}")
    Pin.release(s, deleteArtifacts = true)
  }
}
