package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.SparkSpec
import graft.sources.FtpSource.{FtpClient, FtpConfig}
import org.apache.spark.sql.functions._

/** FTP tier, executed end-to-end against the in-JVM [[FtpMiniServer]]:
  * login, listing (hidden filtering), binary round-trips with byte
  * identity, RESUME in both directions — including the
  * prefix-consistency refusal the reference implements
  * (`d22d/model/ftpmodel.py:686-720`) — directory ops, and the Spark
  * bridge (scanCsv / sinkCsv round-trip through real part files).
  */
class FtpSourceSpec extends SparkSpec {

  private def withServer[T](body: (FtpMiniServer, FtpConfig, java.nio.file.Path) => T): T = {
    val root = Paths.get(tmpDir("ftp-root"))
    val srv = new FtpMiniServer(root)
    try body(srv, FtpConfig("127.0.0.1", srv.port, "graft", "secret"), root)
    finally srv.close()
  }

  /** Deterministic pseudo-random bytes (xorshift64) — resume tests
    * need content where a silent splice of two different files would
    * be visible at every offset.
    */
  private def noiseBytes(n: Int, seed: Long): Array[Byte] = {
    val out = new Array[Byte](n)
    var x = seed | 1L
    var i = 0
    while (i < n) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      out(i) = x.toByte; i += 1
    }
    out
  }

  test("login, list with hidden filtering, size, dir ops, rename") {
    withServer { (_, cfg, root) =>
      Files.write(root.resolve("a.csv"), "x\n1\n".getBytes)
      Files.write(root.resolve(".hidden"), "h".getBytes)
      Files.createDirectory(root.resolve("sub"))
      val c = new FtpClient(cfg)
      try {
        assert(c.pwd() == "/")
        val visible = c.list("/")
        assert(visible.map(_.name).toSet == Set("a.csv", "sub"))
        assert(c.list("/", ignoreHidden = false).map(_.name).toSet ==
          Set("a.csv", "sub", ".hidden"))
        assert(visible.find(_.name == "a.csv").get.size == 4L)
        assert(visible.find(_.name == "sub").get.isDir)
        assert(c.size("/a.csv").contains(4L) && c.size("/nope").isEmpty)
        c.mkdir("/made")
        c.rename("/a.csv", "/made/b.csv")
        assert(c.size("/made/b.csv").contains(4L) && c.size("/a.csv").isEmpty)
        c.delete("/made/b.csv")
        c.rmdir("/made")
        assert(c.list("/").map(_.name).toSet == Set("sub"))
        c.cwd("/sub")
        assert(c.pwd() == "/sub")
      } finally c.close()
    }
  }

  test("download resumes past a verified prefix; a corrupted prefix restarts from zero") {
    withServer { (_, cfg, root) =>
      val payload = noiseBytes(300 * 1024, seed = 7) // > ResumeCheckBytes
      Files.write(root.resolve("blob.bin"), payload)
      val c = new FtpClient(cfg)
      try {
        val local = Paths.get(tmpDir("ftp-dl"), "blob.bin")
        assert(c.retrieve("/blob.bin", local) == payload.length.toLong)
        assert(java.util.Arrays.equals(Files.readAllBytes(local), payload))

        // truncate to half: the resume should move ONLY the tail
        val half = payload.length / 2
        val ch = Files.newByteChannel(local, StandardOpenOption.WRITE)
        try ch.truncate(half.toLong) finally ch.close()
        assert(c.retrieve("/blob.bin", local) == (payload.length - half).toLong)
        assert(java.util.Arrays.equals(Files.readAllBytes(local), payload))

        // corrupt the local prefix: a splice would go undetected by
        // size alone — the prefix check must force a full restart
        val corrupted = noiseBytes(half, seed = 99)
        Files.write(local, corrupted)
        assert(c.retrieve("/blob.bin", local) == payload.length.toLong)
        assert(java.util.Arrays.equals(Files.readAllBytes(local), payload))
      } finally c.close()
    }
  }

  test("upload resumes past a verified prefix; a corrupted remote restarts from zero") {
    withServer { (_, cfg, root) =>
      val payload = noiseBytes(300 * 1024, seed = 21)
      val local = Paths.get(tmpDir("ftp-ul"), "blob.bin")
      Files.write(local, payload)
      val c = new FtpClient(cfg)
      try {
        // seed the remote with the first half (a crashed earlier upload)
        Files.write(root.resolve("blob.bin"),
          java.util.Arrays.copyOf(payload, payload.length / 2))
        assert(c.store(local, "/blob.bin") == (payload.length - payload.length / 2).toLong)
        assert(java.util.Arrays.equals(
          Files.readAllBytes(root.resolve("blob.bin")), payload))

        // remote prefix that does NOT match the local file → restart
        Files.write(root.resolve("blob.bin"),
          noiseBytes(payload.length / 2, seed = 1234))
        assert(c.store(local, "/blob.bin") == payload.length.toLong)
        assert(java.util.Arrays.equals(
          Files.readAllBytes(root.resolve("blob.bin")), payload))
      } finally c.close()
    }
  }

  test("scanCsv / sinkCsv: DataFrame round-trips through the wire") {
    withServer { (_, cfg, root) =>
      import spark.implicits._
      val df = Seq((1L, "alpha", 1.5), (2L, "beta", -2.0), (3L, "gamma", 0.25))
        .toDF("id", "name", "score")
      val staging = tmpDir("ftp-stage")
      val uploaded = FtpSource.sinkCsv(df, cfg, "/export", staging)
      assert(uploaded.nonEmpty)
      assert(Files.list(root.resolve("export")).count() == uploaded.length.toLong)

      val back = FtpSource.scanCsv(spark, cfg, "/export",
        tmpDir("ftp-stage2"))
      assert(back.orderBy($"id").collect().map(_.toSeq).toSeq ==
        df.orderBy($"id").collect().map(_.toSeq).toSeq,
        "CSV round-trip through FTP changed the data")

      // staged re-scan skips complete files (size-matched): second
      // scan must not re-transfer — assert via unchanged mtimes
      val stage3 = tmpDir("ftp-stage3")
      FtpSource.scanCsv(spark, cfg, "/export", stage3).count()
      val m1 = Files.list(Paths.get(stage3)).sorted()
        .map[Long](p => Files.getLastModifiedTime(p).toMillis)
        .toArray.asInstanceOf[Array[AnyRef]].toSeq
      FtpSource.scanCsv(spark, cfg, "/export", stage3).count()
      val m2 = Files.list(Paths.get(stage3)).sorted()
        .map[Long](p => Files.getLastModifiedTime(p).toMillis)
        .toArray.asInstanceOf[Array[AnyRef]].toSeq
      assert(m1 == m2, "already-staged files were re-transferred")
    }
  }

  test("scanCsv publishTo: executors read the shared-FS copies, not the driver's disk") {
    withServer { (_, cfg, root) =>
      graft.core.MemFsStore.clear()
      spark.sparkContext.hadoopConfiguration
        .set("fs.memfs.impl", classOf[graft.core.MemFs].getName)
      Files.createDirectories(root.resolve("pub"))
      Files.write(root.resolve("pub/a.csv"), "id,v\n1,x\n2,y\n".getBytes("UTF-8"))
      Files.write(root.resolve("pub/b.csv"), "id,v\n3,z\n".getBytes("UTF-8"))
      val df = FtpSource.scanCsv(spark, cfg, "/pub", tmpDir("ftp-pubstage"),
        publishTo = Some("memfs://shared/csvstage"))
      // the scan's input files ARE the shared-FS URIs
      assert(df.inputFiles.forall(_.startsWith("memfs://")),
        df.inputFiles.mkString(", "))
      assert(df.count() == 3)
      graft.core.MemFsStore.clear()
    }
  }

  test("publish follows a same-size in-place replacement re-fetch — the shared copy is never stale") {
    withServer { (_, cfg, root) =>
      graft.core.MemFsStore.clear()
      val hconf = spark.sparkContext.hadoopConfiguration
      hconf.set("fs.memfs.impl", classOf[graft.core.MemFs].getName)
      val shared = "memfs://shared/pubstale"
      val memfs = new org.apache.hadoop.fs.Path(shared).getFileSystem(hconf)
      def sharedBytes(name: String): Array[Byte] = {
        val p = new org.apache.hadoop.fs.Path(s"$shared/$name")
        val len = memfs.getFileStatus(p).getLen.toInt
        val in = memfs.open(p)
        try { val b = new Array[Byte](len); in.readFully(0, b); b } finally in.close()
      }
      val v1 = noiseBytes(64 * 1024, seed = 11)
      Files.write(root.resolve("data.bin"), v1)
      val staging = tmpDir("ftp-pubstale")

      // stage + publish v1, both via the driver tier and the executor
      // fan-out tier
      FtpSource.stageFiles(cfg, "/", ".*\\.bin", staging) // local only (no publish arg)
      FtpSource.stageAll(spark, cfg, Seq("/data.bin"), staging,
        slices = 1, publishTo = Some(shared))
      assert(java.util.Arrays.equals(sharedBytes("data.bin"), v1))

      // replace the remote in place, SAME length, different content.
      // The local tier re-fetches (prefix mismatch); a size-only
      // publish check would then skip and leave the cluster on v1.
      val v2 = noiseBytes(64 * 1024, seed = 12)
      Files.write(root.resolve("data.bin"), v2)
      val movedExec = FtpSource.stageAll(spark, cfg, Seq("/data.bin"), staging,
        slices = 1, publishTo = Some(shared))
      assert(movedExec.head._3 > 0L, "replacement was not re-fetched")
      assert(java.util.Arrays.equals(sharedBytes("data.bin"), v2),
        "shared copy is STALE after a same-size in-place replacement")

      // and the driver tier (stageFiles w/ publishConf via scanCsv path):
      // same contract through RemoteStaging.stageFiles' publish leg
      val v3 = ("id,v\n" + (1 to 50).map(i => s"$i,r$i").mkString("\n") + "\n")
        .getBytes("UTF-8")
      Files.write(root.resolve("t.csv"), v3)
      FtpSource.scanCsv(spark, cfg, "/", tmpDir("ftp-pubstale2"),
        pattern = ".*\\.csv", publishTo = Some(shared + "2")).count()
      val v4 = ("id,v\n" + (1 to 50).map(i => s"$i,s$i").mkString("\n") + "\n")
        .getBytes("UTF-8")
      assert(v3.length == v4.length, "fixture must be same-size to exercise the skip")
      Files.write(root.resolve("t.csv"), v4)
      // fresh staging dir: the LOCAL copy is gone (executor replaced),
      // but the SHARED copy survives — publish must still refresh it
      val csvStage = tmpDir("ftp-pubstale3")
      val df = FtpSource.scanCsv(spark, cfg, "/", csvStage,
        pattern = ".*\\.csv", publishTo = Some(shared + "2"))
      assert(df.filter(col("v").startsWith("s")).count() == 50,
        "scan served the stale shared CSV")

      // unchanged remote, SAME staging dir: local copy is current, no
      // bytes move, and publish skips (shared mtime stable)
      val p2 = new org.apache.hadoop.fs.Path(shared + "2/t.csv")
      val t1 = memfs.getFileStatus(p2).getModificationTime
      FtpSource.scanCsv(spark, cfg, "/", csvStage,
        pattern = ".*\\.csv", publishTo = Some(shared + "2")).count()
      assert(memfs.getFileStatus(p2).getModificationTime == t1,
        "a current staged copy was re-published")
      graft.core.MemFsStore.clear()
    }
  }

  test("stageFiles re-fetches a same-size in-place replacement (prefix check on the skip path)") {
    withServer { (_, cfg, root) =>
      val v1 = noiseBytes(96 * 1024, seed = 5)
      Files.write(root.resolve("data.bin"), v1)
      val staging = tmpDir("ftp-stale")
      assert(FtpSource.stageFiles(cfg, "/", ".*\\.bin", staging).length == 1)
      val local = Paths.get(staging, "data.bin")
      assert(java.util.Arrays.equals(Files.readAllBytes(local), v1))

      // replace the REMOTE file in place with different, same-length
      // content: a size-only skip would silently serve v1
      val v2 = noiseBytes(96 * 1024, seed = 6)
      Files.write(root.resolve("data.bin"), v2)
      FtpSource.stageFiles(cfg, "/", ".*\\.bin", staging)
      assert(java.util.Arrays.equals(Files.readAllBytes(local), v2),
        "stale same-size staged copy was served instead of re-fetched")

      // unchanged remote: third run must skip (mtime stable)
      val t1 = Files.getLastModifiedTime(local).toMillis
      FtpSource.stageFiles(cfg, "/", ".*\\.bin", staging)
      assert(Files.getLastModifiedTime(local).toMillis == t1,
        "current staged copy was re-transferred")

      // remote replaced by a SHORTER file with a matching prefix: the
      // resume offset must clamp to the remote size and restart from
      // zero (a REST past EOF would fail every re-run)
      val v3 = java.util.Arrays.copyOf(v2, 32 * 1024)
      Files.write(root.resolve("data.bin"), v3)
      FtpSource.stageFiles(cfg, "/", ".*\\.bin", staging)
      assert(java.util.Arrays.equals(Files.readAllBytes(local), v3),
        "shrunken remote was not re-staged from zero")
    }
  }

  test("stageAll: same-named files in different remote dirs stage to distinct local paths") {
    withServer { (_, cfg, root) =>
      Files.createDirectories(root.resolve("y2024"))
      Files.createDirectories(root.resolve("y2025"))
      val a = noiseBytes(64 * 1024, seed = 71)
      val b = noiseBytes(64 * 1024, seed = 72)
      Files.write(root.resolve("y2024/data.bin"), a)
      Files.write(root.resolve("y2025/data.bin"), b)
      val staging = tmpDir("ftp-dirs")
      val out = FtpSource.stageAll(spark, cfg,
        Seq("/y2024/data.bin", "/y2025/data.bin"), staging, slices = 2)
      assert(out.map(_._2).distinct.length == 2, s"local paths collided: $out")
      assert(java.util.Arrays.equals(
        Files.readAllBytes(Paths.get(staging, "y2024", "data.bin")), a))
      assert(java.util.Arrays.equals(
        Files.readAllBytes(Paths.get(staging, "y2025", "data.bin")), b))
    }
  }

  test("stageAll rejects remote paths that escape the staging root") {
    withServer { (_, cfg, root) =>
      Files.write(root.resolve("ok.bin"), noiseBytes(1024, seed = 5))
      val staging = tmpDir("ftp-fence")
      val escape = intercept[Exception] {
        FtpSource.stageAll(spark, cfg, Seq("/a/../../../evil.bin"), staging, slices = 1)
      }
      val messages = Iterator.iterate[Throwable](escape)(_.getCause)
        .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse("")).toSeq
      assert(messages.exists(_.contains("escapes staging dir")), messages.mkString(" | "))
      // nothing outside the staging root was created by the attempt
      assert(!Files.exists(Paths.get(staging).getParent.resolve("evil.bin")))
    }
  }

  test("stageAll fans out across executors; each file skips/resumes independently after a kill") {
    withServer { (_, cfg, root) =>
      val payloads = (0 until 6).map(i => s"f$i.bin" -> noiseBytes(200 * 1024, seed = 40 + i))
      payloads.foreach { case (n, b) => Files.write(root.resolve(n), b) }
      val staging = tmpDir("ftp-fan")
      val remotes = payloads.map { case (n, _) => s"/$n" }

      // first run: 3 partitions = 3 concurrent clients, everything moves
      val r1 = FtpSource.stageAll(spark, cfg, remotes, staging, slices = 3)
      assert(r1.map(_._1) == remotes.sorted)
      assert(r1.forall { case (_, _, moved) => moved == 200L * 1024 })
      payloads.foreach { case (n, b) =>
        assert(java.util.Arrays.equals(Files.readAllBytes(Paths.get(staging, n)), b))
      }

      // simulate a mid-run kill: one file torn at half, one corrupted,
      // the rest complete — the re-run must resume/restart/skip PER FILE
      val torn = Paths.get(staging, "f1.bin")
      val ch = Files.newByteChannel(torn, StandardOpenOption.WRITE)
      try ch.truncate(100L * 1024) finally ch.close()
      Files.write(Paths.get(staging, "f4.bin"), noiseBytes(200 * 1024, seed = 999))

      val r2 = FtpSource.stageAll(spark, cfg, remotes, staging, slices = 3)
        .map { case (remote, _, moved) => remote -> moved }.toMap
      assert(r2("/f1.bin") == 100L * 1024, "torn file did not REST-resume from its length")
      assert(r2("/f4.bin") == 200L * 1024, "corrupted file did not restart from zero")
      assert(remotes.filterNot(Set("/f1.bin", "/f4.bin")).forall(r2(_) == 0L),
        "complete files were re-transferred")
      payloads.foreach { case (n, b) =>
        assert(java.util.Arrays.equals(Files.readAllBytes(Paths.get(staging, n)), b))
      }

      // third pass after repair: everything current, zero bytes move
      val r3 = FtpSource.stageAll(spark, cfg, remotes, staging, slices = 3)
      assert(r3.forall(_._3 == 0L), s"repaired files re-transferred: $r3")
    }
  }

  test("scanNdjson stages and parses line-delimited JSON") {
    withServer { (_, cfg, root) =>
      Files.write(root.resolve("rows.ndjson"),
        "{\"k\":1,\"v\":\"a\"}\n{\"k\":2,\"v\":\"b\"}\n".getBytes)
      val df = FtpSource.scanNdjson(spark, cfg, "/", tmpDir("ftp-ndj"))
      assert(df.orderBy(col("k")).collect().map(r =>
        (r.getAs[Long]("k"), r.getAs[String]("v"))).toSeq == Seq((1L, "a"), (2L, "b")))
    }
  }
}
