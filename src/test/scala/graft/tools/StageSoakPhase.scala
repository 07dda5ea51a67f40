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
  * Fixture: 8 files per protocol, 1.5-3.5 MiB of seeded noise each
  * (~40 MiB per iteration round-trip) — large enough that a
  * kill-every-10/20s soak lands kills INSIDE transfers across the
  * soak's lifetime.
  */
final class StageSoakPhase extends SoakPhase {

  def name: String = "stage"

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
          val ftpOk = staged(() => FtpSource.stageAll(spark, ftpCfg,
            ftpFix.keys.toSeq, ftpDst.toString, slices = 4): Unit)
          val sftpOk = staged(() => SftpSource.stageAll(spark, sftpCfg,
            sftpFix.keys.toSeq, sftpDst.toString, slices = 4): Unit)
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
