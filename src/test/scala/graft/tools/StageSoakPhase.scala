package graft.tools

import java.nio.file.{Files, Path, Paths}

import graft.sources.{FtpMiniServer, FtpSource, SftpMiniServer, SftpSource}
import org.apache.spark.sql.SparkSession

/** The remote-staging [[SoakPhase]] (round-12 verdict task 3): FTP +
  * SFTP `stageAll` runs concurrently with [[KillSoak]]'s killer loop.
  * The transfer tasks execute on the executors being SIGKILLed, so a
  * kill landing mid-retrieve exercises the real recovery path: Spark
  * retries the task, the retry re-enters per file — complete files
  * skip on size+prefix, torn files prefix-verify and RESUME from
  * their current length. Each iteration verifies every staged file
  * byte-identical to its fixture and that the staging tree holds
  * NOTHING beyond the expected set (no orphaned partials), then
  * wipes the tree so the next iteration transfers for real.
  *
  * Round 13 (verdict task 1): every iteration ALSO runs the PUBLISH
  * leg — `stageAll(publishTo = Some("file://<host-shared dir>"))`, a
  * root every local-cluster executor JVM can reach — so SIGKILLs land
  * mid-publish (inside the executor-side shared-FS copy at
  * `RemoteFiles.publishOne`), not just mid-retrieve. Per iteration the
  * leg asserts: the SHARED tree is byte-identical to the fixture with
  * nothing beyond the expected set (a kill mid-copy strands a partial
  * only until the task retry re-copies it — never past stageAll's
  * return), and an immediate RE-RUN republishes nothing (every file
  * reports 0 bytes moved and every shared mtime is unchanged — the
  * size-matched skip, `RemoteFiles.scala` publishOne). The split is
  * reported via [[detail]] as `publish_iterations`/`publish_green`.
  */
final class StageSoakPhase extends SoakPhase {

  def name: String = "stage"

  @volatile private var publishIterations = 0
  @volatile private var publishGreen = 0
  override def detail: Map[String, Int] =
    Map("publish_iterations" -> publishIterations, "publish_green" -> publishGreen)

  private def noise(n: Int, seed: Long): Array[Byte] = {
    val out = new Array[Byte](n)
    var x = seed | 1L
    var i = 0
    while (i < n) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      out(i) = x.toByte; i += 1
    }
    out
  }

  private def buildFixture(root: Path, seedBase: Long): Map[String, Array[Byte]] = {
    (1 to 8).map { i =>
      val remote = s"/corpus/shard-2024-0$i/data.bin"
      val bytes = noise(1536 * 1024 + i * 256 * 1024 + i * 77, seedBase + i)
      val p = root.resolve(remote.stripPrefix("/"))
      Files.createDirectories(p.getParent)
      Files.write(p, bytes)
      remote -> bytes
    }.toMap
  }

  /** All regular files under `dir`, staging-root-relative. */
  private def treeFiles(dir: Path): Seq[Path] = {
    if (!Files.exists(dir)) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Path]
    Files.walk(dir).forEach(p => if (Files.isRegularFile(p)) out += p)
    out.toSeq
  }

  private def rmTree(dir: Path): Unit = {
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rec)
      f.delete(): Unit
    }
    rec(dir.toFile)
  }

  def run(spark: SparkSession, stop: () => Boolean): (Int, Int) = {
    val ftpRoot = Files.createTempDirectory("soak-ftp-root")
    val sftpRoot = Files.createTempDirectory("soak-sftp-root")
    val ftpFix = buildFixture(ftpRoot, seedBase = 0xf7f7L)
    val sftpFix = buildFixture(sftpRoot, seedBase = 0x5f5fL)
    val ftpSrv = new FtpMiniServer(ftpRoot)
    val sftpSrv = new SftpMiniServer(sftpRoot)
    val ftpCfg = FtpSource.FtpConfig("127.0.0.1", ftpSrv.port, "graft", "secret")
    val sftpCfg = SftpSource.SftpConfig("127.0.0.1", sftpSrv.port, "graft", "secret")
    var iterations = 0
    var green = 0
    try {
      while (!stop()) {
        val staging = Files.createTempDirectory("soak-stage")
        try {
          val ftpDst = staging.resolve("ftp")
          val sftpDst = staging.resolve("sftp")
          // a kill can exhaust a task's retries in a pathological
          // window; stageAll is re-entrant per file, so ONE re-entry
          // into the same tree is part of the documented contract
          def staged(f: () => Unit): Boolean =
            try { f(); true }
            catch {
              case _: Throwable =>
                try { f(); true } catch { case _: Throwable => false }
            }
          val pubRoot = staging.resolve("shared") // host-shared: all executor JVMs see it
          val ftpPub = s"file://$pubRoot/ftp"
          val sftpPub = s"file://$pubRoot/sftp"
          val ftpOk = staged(() => FtpSource.stageAll(spark, ftpCfg,
            ftpFix.keys.toSeq, ftpDst.toString, slices = 4,
            publishTo = Some(ftpPub)): Unit)
          val sftpOk = staged(() => SftpSource.stageAll(spark, sftpCfg,
            sftpFix.keys.toSeq, sftpDst.toString, slices = 4,
            publishTo = Some(sftpPub)): Unit)
          // byte-identity of every staged file, and not one file more
          // (an orphaned partial or stray temp would show up here)
          def verify(dst: Path, fix: Map[String, Array[Byte]]): Boolean = {
            val got = treeFiles(dst).map(p => "/" + dst.relativize(p).toString).sorted
            got == fix.keys.toSeq.sorted && fix.forall { case (remote, bytes) =>
              java.util.Arrays.equals(
                Files.readAllBytes(dst.resolve(remote.stripPrefix("/"))), bytes)
            }
          }
          iterations += 1
          if (ftpOk && sftpOk && verify(ftpDst, ftpFix) && verify(sftpDst, sftpFix))
            green += 1
          else println(s"[soak] stage iteration $iterations NOT green " +
            s"(ftp=$ftpOk sftp=$sftpOk)")

          // ---- publish-leg verification (round 13): shared side
          // byte-identical with nothing extra, and a re-run is a
          // complete no-op (0 bytes moved, shared mtimes untouched)
          if (ftpOk && sftpOk) {
            publishIterations += 1
            // Hadoop's LocalFileSystem writes `.name.crc` checksum
            // sidecars next to every file it creates (client-side
            // checksums; HDFS/S3 keep them out of the namespace) —
            // hidden files are not part of the published data set
            def dataFiles(dir: Path): Seq[Path] =
              treeFiles(dir).filterNot(_.getFileName.toString.startsWith("."))
            def sharedOk(proto: String, fix: Map[String, Array[Byte]]): Boolean = {
              val dst = pubRoot.resolve(proto)
              val got = dataFiles(dst).map(p => "/" + dst.relativize(p).toString).sorted
              got == fix.keys.toSeq.sorted && fix.forall { case (remote, bytes) =>
                java.util.Arrays.equals(
                  Files.readAllBytes(dst.resolve(remote.stripPrefix("/"))), bytes)
              }
            }
            def mtimes(): Map[String, Long] =
              dataFiles(pubRoot).map(p =>
                pubRoot.relativize(p).toString -> Files.getLastModifiedTime(p).toMillis).toMap
            val firstPass = sharedOk("ftp", ftpFix) && sharedOk("sftp", sftpFix)
            val before = mtimes()
            val rerun =
              try {
                val m1 = FtpSource.stageAll(spark, ftpCfg, ftpFix.keys.toSeq,
                  ftpDst.toString, slices = 4, publishTo = Some(ftpPub))
                val m2 = SftpSource.stageAll(spark, sftpCfg, sftpFix.keys.toSeq,
                  sftpDst.toString, slices = 4, publishTo = Some(sftpPub))
                Some((m1 ++ m2).map(_._3).sum)
              } catch { case _: Throwable => None } // a kill mid-re-run: not green
            val stable = mtimes() == before
            if (firstPass && rerun.contains(0L) && stable) publishGreen += 1
            else println(s"[soak] publish leg $publishIterations NOT green " +
              s"(shared=$firstPass rerunMoved=$rerun mtimesStable=$stable)")
          }
        } catch {
          case e: Throwable =>
            iterations += 1
            println(s"[soak] stage iteration $iterations failed outright: ${e.getMessage}")
        } finally rmTree(staging)
      }
      (iterations, green)
    } finally {
      ftpSrv.close(); sftpSrv.close()
      rmTree(ftpRoot); rmTree(sftpRoot)
    }
  }
}
