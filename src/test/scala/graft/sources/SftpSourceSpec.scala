package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.SparkSpec
import graft.sources.SftpSource.{SftpClient, SftpConfig}
import org.apache.spark.sql.functions._

/** SFTP tier, executed end-to-end against the in-JVM
  * [[SftpMiniServer]] — which means every test here exercises the
  * REAL stack: SSH-2 version exchange, ECDH key exchange, Ed25519
  * host-key signature, AES-CTR + HMAC packets, password auth, channel
  * windowing, and the SFTP v3 protocol — no mocked layers. Coverage
  * mirrors [[FtpSourceSpec]] (shared [[RemoteStaging]] contract) plus
  * the SSH-specific surfaces: host-key pinning, auth rejection,
  * publickey auth, and the reference's client-side cwd +
  * mkdir -p behaviors (`d22d/model/sftpmodel.py:95-101,327-342`).
  */
class SftpSourceSpec extends SparkSpec {

  private def withServer[T](body: (SftpMiniServer, SftpConfig, java.nio.file.Path) => T): T = {
    val root = Paths.get(tmpDir("sftp-root"))
    val srv = new SftpMiniServer(root)
    try body(srv, SftpConfig("127.0.0.1", srv.port, "graft", "secret"), root)
    finally srv.close()
  }

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

  test("handshake, auth, list with hidden filtering, stat, dir ops, rename, realpath") {
    withServer { (_, cfg, root) =>
      Files.write(root.resolve("a.csv"), "x\n1\n".getBytes)
      Files.write(root.resolve(".hidden"), "h".getBytes)
      Files.createDirectory(root.resolve("sub"))
      val c = new SftpClient(cfg)
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
        // client-side cwd tracking (the reference's work_dir_now)
        c.cwd("/sub")
        assert(c.pwd() == "/sub")
        assert(c.realpath(".") == "/sub")
        c.cwd("..")
        assert(c.pwd() == "/")
        // mkdir -p — sftp_mkdir_p mirror
        c.mkdirs("/deep/er/est")
        assert(c.stat("/deep/er/est").exists(_.isDir))
        // relative resolution against cwd
        c.cwd("/deep")
        assert(c.stat("er/est").exists(_.isDir))
      } finally c.close()
    }
  }

  test("host-key pinning: matching key accepted, mismatched key rejected") {
    withServer { (srv, cfg, _) =>
      import java.net.{InetSocketAddress, Socket}
      def connect(verify: Array[Byte] => Boolean): SshTransport = {
        val s = new Socket()
        s.connect(new InetSocketAddress(cfg.host, cfg.port), 5000)
        s.setSoTimeout(5000)
        SshTransport.client(s, verify)
      }
      val pinned = SshWire.parseAuthorizedEd25519(srv.hostKeyLine)
      val pinnedBlob = SshWire.ed25519Blob(
        pinned.asInstanceOf[java.security.interfaces.EdECPublicKey])
      val ok = connect(blob => java.util.Arrays.equals(blob, pinnedBlob))
      ok.close()
      val wrongKey = SshWire.generateEd25519()
      val wrongBlob = SshWire.ed25519Blob(
        wrongKey.getPublic.asInstanceOf[java.security.interfaces.EdECPublicKey])
      val e = intercept[java.io.IOException] {
        connect(blob => java.util.Arrays.equals(blob, wrongBlob))
      }
      assert(e.getMessage.contains("host key rejected"))
    }
  }

  test("wrong password is rejected; wrong user is rejected") {
    withServer { (_, cfg, _) =>
      val e1 = intercept[Exception] {
        new SftpClient(cfg.copy(password = "wrong")).close()
      }
      assert(e1.getMessage.contains("authentication failed"))
      val e2 = intercept[Exception] {
        new SftpClient(cfg.copy(user = "mallory")).close()
      }
      assert(e2.getMessage.contains("authentication failed"))
    }
  }

  test("publickey auth: authorized key signs in, unknown key falls through") {
    val root = Paths.get(tmpDir("sftp-pk-root"))
    Files.write(root.resolve("f.txt"), "hello".getBytes)
    val key = SshWire.generateEd25519()
    val line = "ssh-ed25519 " + java.util.Base64.getEncoder.encodeToString(
      SshWire.ed25519Blob(key.getPublic.asInstanceOf[java.security.interfaces.EdECPublicKey])) +
      " spec@graft"
    val srv = new SftpMiniServer(root, authorizedKeys = Seq(line))
    try {
      import java.net.{InetSocketAddress, Socket}
      def channel(): SshClientChannel = {
        val s = new Socket()
        s.connect(new InetSocketAddress("127.0.0.1", srv.port), 5000)
        s.setSoTimeout(5000)
        new SshClientChannel(SshTransport.client(s))
      }
      val good = channel()
      good.authPublicKey("graft", key)
      good.openSubsystem("sftp")
      good.close()
      val bad = channel()
      val e = intercept[java.io.IOException] {
        bad.authPublicKey("graft", SshWire.generateEd25519())
      }
      assert(e.getMessage.contains("authentication failed"))
      bad.close()
    } finally srv.close()
  }

  test("download resumes past a verified prefix; a corrupted prefix restarts from zero") {
    withServer { (_, cfg, root) =>
      val payload = noiseBytes(300 * 1024, seed = 7) // > ResumeCheckBytes
      Files.write(root.resolve("blob.bin"), payload)
      val c = new SftpClient(cfg)
      try {
        val local = Paths.get(tmpDir("sftp-dl"), "blob.bin")
        assert(c.retrieve("/blob.bin", local) == payload.length.toLong)
        assert(java.util.Arrays.equals(Files.readAllBytes(local), payload))

        val half = payload.length / 2
        val ch = Files.newByteChannel(local, StandardOpenOption.WRITE)
        try ch.truncate(half.toLong) finally ch.close()
        assert(c.retrieve("/blob.bin", local) == (payload.length - half).toLong)
        assert(java.util.Arrays.equals(Files.readAllBytes(local), payload))

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
      val local = Paths.get(tmpDir("sftp-ul"), "blob.bin")
      Files.write(local, payload)
      val c = new SftpClient(cfg)
      try {
        Files.write(root.resolve("blob.bin"),
          java.util.Arrays.copyOf(payload, payload.length / 2))
        assert(c.store(local, "/blob.bin") == (payload.length - payload.length / 2).toLong)
        assert(java.util.Arrays.equals(
          Files.readAllBytes(root.resolve("blob.bin")), payload))

        Files.write(root.resolve("blob.bin"),
          noiseBytes(payload.length / 2, seed = 1234))
        assert(c.store(local, "/blob.bin") == payload.length.toLong)
        assert(java.util.Arrays.equals(
          Files.readAllBytes(root.resolve("blob.bin")), payload))
      } finally c.close()
    }
  }

  test("a remote file shrunk below the local partial restarts from zero (clamp)") {
    withServer { (_, cfg, root) =>
      val big = noiseBytes(200 * 1024, seed = 5)
      val local = Paths.get(tmpDir("sftp-clamp"), "x.bin")
      Files.write(local, big) // stale large local copy
      val small = java.util.Arrays.copyOf(big, 64 * 1024) // prefix-identical but shorter
      Files.write(root.resolve("x.bin"), small)
      val c = new SftpClient(cfg)
      try {
        assert(c.retrieve("/x.bin", local) == small.length.toLong)
        assert(java.util.Arrays.equals(Files.readAllBytes(local), small))
      } finally c.close()
    }
  }

  test("scanCsv / sinkCsv: DataFrame round-trips through the SSH wire") {
    withServer { (_, cfg, root) =>
      import spark.implicits._
      Files.createDirectory(root.resolve("in"))
      Files.write(root.resolve("in/part1.csv"), "k,v\n1,a\n2,b\n".getBytes)
      Files.write(root.resolve("in/part2.csv"), "k,v\n3,c\n".getBytes)
      val df = SftpSource.scanCsv(spark, cfg, "/in", tmpDir("sftp-stage-csv"))
      assert(df.count() == 3L)
      assert(df.agg(sum("k")).as[Long].head() == 6L)

      val out = Seq((10, "x"), (11, "y")).toDF("k", "v").repartition(2)
      val uploaded = SftpSource.sinkCsv(out, cfg, "/out/nested", tmpDir("sftp-sink"))
      assert(uploaded.nonEmpty)
      val back = SftpSource.scanCsv(spark, cfg, "/out/nested", tmpDir("sftp-back"))
      assert(back.orderBy("k").collect().map(_.getInt(0)).toSeq == Seq(10, 11))
    }
  }

  test("stageFiles re-fetches a same-size in-place replacement (prefix check on the skip path)") {
    withServer { (_, cfg, root) =>
      val v1 = noiseBytes(96 * 1024, seed = 31)
      Files.write(root.resolve("d.bin"), v1)
      val staging = tmpDir("sftp-stage-skip")
      assert(SftpSource.stageFiles(cfg, "/", ".*\\.bin", staging).length == 1)
      val local = Paths.get(staging, "d.bin")
      assert(java.util.Arrays.equals(Files.readAllBytes(local), v1))
      // same-size replacement — size alone would serve the stale copy
      val v2 = noiseBytes(96 * 1024, seed = 32)
      Files.write(root.resolve("d.bin"), v2)
      SftpSource.stageFiles(cfg, "/", ".*\\.bin", staging)
      assert(java.util.Arrays.equals(Files.readAllBytes(local), v2))
    }
  }

  test("stageAll fans out across executors with skip/resume re-entry") {
    withServer { (_, cfg, root) =>
      Files.createDirectories(root.resolve("y2024"))
      Files.createDirectories(root.resolve("y2025"))
      val a = noiseBytes(128 * 1024, seed = 41)
      val b = noiseBytes(96 * 1024, seed = 42)
      Files.write(root.resolve("y2024/data.bin"), a)
      Files.write(root.resolve("y2025/data.bin"), b)
      val staging = tmpDir("sftp-stage-all")
      val remotes = Seq("/y2024/data.bin", "/y2025/data.bin")
      val r1 = SftpSource.stageAll(spark, cfg, remotes, staging, slices = 2)
      assert(r1.map(_._3).sum == (a.length + b.length).toLong)
      assert(r1.map(_._2).distinct.length == 2) // full-path mirroring, no collision
      assert(java.util.Arrays.equals(
        Files.readAllBytes(Paths.get(staging, "y2024/data.bin")), a))
      // re-run: everything current → zero bytes moved
      val r2 = SftpSource.stageAll(spark, cfg, remotes, staging, slices = 2)
      assert(r2.map(_._3).sum == 0L)
      // torn file resumes from its length
      val torn = Paths.get(staging, "y2025/data.bin")
      val ch = Files.newByteChannel(torn, StandardOpenOption.WRITE)
      try ch.truncate(30 * 1024L) finally ch.close()
      val r3 = SftpSource.stageAll(spark, cfg, remotes, staging, slices = 2)
      assert(r3.map(_._3).sum == (b.length - 30 * 1024).toLong)
      assert(java.util.Arrays.equals(Files.readAllBytes(torn), b))
    }
  }

  test("stageAll rejects remote paths that escape the staging root") {
    withServer { (_, cfg, _) =>
      val staging = tmpDir("sftp-escape")
      val e = intercept[Exception] {
        SftpSource.stageAll(spark, cfg, Seq("/a/../../../evil.bin"), staging, slices = 1)
      }
      assert(e.getMessage.contains("escapes staging dir") ||
        Option(e.getCause).exists(_.getMessage.contains("escapes staging dir")))
    }
  }

  test("stageAll publishes to a shared (copy-rename object-store) FS the whole cluster can read") {
    // executor-LOCAL staging disks are invisible to the rest of a real
    // multi-host cluster; publishTo copies each staged file to a
    // shared Hadoop FS and returns the SHARED path — here MemFs in
    // copy-rename (S3A-semantics) mode, consumed back through a
    // normal spark.read over the returned URIs.
    withServer { (_, cfg, root) =>
      graft.core.MemFsStore.clear()
      graft.core.MemFsStore.renameAsCopy = true
      spark.sparkContext.hadoopConfiguration
        .set("fs.memfs.impl", classOf[graft.core.MemFs].getName)
      val remotes = (1 to 3).map { i =>
        val rel = s"corpus/shard$i/doc.txt"
        val p = root.resolve(rel)
        Files.createDirectories(p.getParent)
        Files.write(p, (1 to 50).map(j => s"shard$i line$j").mkString("\n").getBytes("UTF-8"))
        "/" + rel
      }
      val staging = tmpDir("sftp-pub")
      val shared = "memfs://shared/staged"
      val out = SftpSource.stageAll(spark, cfg, remotes, staging,
        slices = 2, publishTo = Some(shared))
      assert(out.map(_._1) == remotes.sorted)
      assert(out.forall(_._2.startsWith("memfs://")), out.map(_._2).mkString(", "))
      // shared bytes identical to the server's
      val fs = new org.apache.hadoop.fs.Path(shared)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      out.foreach { case (remote, sharedPath, _) =>
        val in = fs.open(new org.apache.hadoop.fs.Path(sharedPath))
        val got = in.readAllBytes(); in.close()
        assert(java.util.Arrays.equals(got,
          Files.readAllBytes(root.resolve(remote.stripPrefix("/")))),
          s"$remote diverged on the shared FS")
      }
      // the cluster-side consumer: a plain spark.read over shared URIs
      val lines = spark.read.textFile(out.map(_._2): _*).count()
      assert(lines == 150, s"expected 150 published lines, read $lines")
      // idempotent: re-run moves zero bytes and re-publishes nothing
      // (size-matched skip) — mtimes on the shared FS stay put
      val mtimes = out.map(o => fs.getFileStatus(
        new org.apache.hadoop.fs.Path(o._2)).getModificationTime)
      val again = SftpSource.stageAll(spark, cfg, remotes, staging,
        slices = 2, publishTo = Some(shared))
      assert(again.forall(_._3 == 0L), "re-run re-transferred bytes")
      val mtimes2 = again.map(o => fs.getFileStatus(
        new org.apache.hadoop.fs.Path(o._2)).getModificationTime)
      assert(mtimes2 == mtimes, "re-run re-published size-matched files")
      graft.core.MemFsStore.clear()
    }
  }

  test("large transfer crosses channel-window and packet boundaries intact") {
    withServer { (_, cfg, root) =>
      // > 2 MiB initial window and >> 32 KiB max packet: forces
      // WINDOW_ADJUST traffic and chunked CHANNEL_DATA both ways
      val payload = noiseBytes(5 * 1024 * 1024 + 12345, seed = 77)
      Files.write(root.resolve("big.bin"), payload)
      val c = new SftpClient(cfg)
      try {
        val local = Paths.get(tmpDir("sftp-big"), "big.bin")
        assert(c.retrieve("/big.bin", local) == payload.length.toLong)
        assert(java.util.Arrays.equals(Files.readAllBytes(local), payload))
        c.delete("/big.bin")
        assert(c.store(local, "/big2.bin") == payload.length.toLong)
        assert(java.util.Arrays.equals(
          Files.readAllBytes(root.resolve("big2.bin")), payload))
      } finally c.close()
    }
  }
}
