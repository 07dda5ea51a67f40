package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Interoperability proof: a STOCK OpenSSH `sftp` client (the real
  * binary on this host, OpenSSH 9.x) drives [[SftpMiniServer]] through
  * publickey auth and a full file-op batch. This is the strongest
  * offline evidence the SSH-2 transport and SFTP v3 server speak the
  * actual wire protocol — the peer here is the reference
  * implementation of the protocol, not our own client. (The loopback
  * spec proves our client against our server; together with this
  * suite the shared dialect is pinned from both sides.)
  *
  * Skips cleanly (canceled, not failed) if no `sftp`/`ssh-keygen`
  * binaries are on PATH.
  */
class SftpOpenSshInteropSpec extends AnyFunSuite {

  private def haveBinary(name: String): Boolean =
    sys.env.getOrElse("PATH", "").split(':')
      .exists(d => Files.isExecutable(Paths.get(d, name)))

  private def tmpDir(prefix: String): Path =
    Files.createTempDirectory(prefix)

  private def run(cmd: Seq[String], timeoutSec: Int = 60): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val done = p.waitFor(timeoutSec.toLong, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) { p.destroyForcibly(); fail(s"command timed out: ${cmd.mkString(" ")}\n$out") }
    (p.exitValue(), out)
  }

  test("stock OpenSSH sftp batch: auth, mkdir, put, get, ls, rename, rm — byte-exact") {
    if (!haveBinary("sftp") || !haveBinary("ssh-keygen"))
      cancel("OpenSSH client binaries not available")

    val keyDir = tmpDir("ssh-keys")
    val keyFile = keyDir.resolve("id_ed25519")
    val (kgCode, kgOut) = run(Seq("ssh-keygen", "-t", "ed25519", "-N", "", "-q",
      "-C", "interop@graft", "-f", keyFile.toString))
    assert(kgCode == 0, s"ssh-keygen failed: $kgOut")
    val pubLine = new String(Files.readAllBytes(Paths.get(keyFile.toString + ".pub")), "UTF-8").trim

    val root = tmpDir("sftp-interop-root")
    val work = tmpDir("sftp-interop-work")
    // deterministic payload large enough to force pipelined 32 KiB
    // chunks and window adjusts through the real client
    val payload = {
      val out = new Array[Byte](3 * 1024 * 1024 + 4321)
      var x = 0x9e3779b97f4a7c15L
      var i = 0
      while (i < out.length) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        out(i) = x.toByte; i += 1
      }
      out
    }
    Files.write(work.resolve("local.bin"), payload)

    val srv = new SftpMiniServer(root, user = "graft", authorizedKeys = Seq(pubLine))
    try {
      val batch = work.resolve("batch.txt")
      Files.write(batch, Seq(
        "mkdir /up",
        s"put ${work.resolve("local.bin")} /up/data.bin",
        s"get /up/data.bin ${work.resolve("fetched.bin")}",
        "rename /up/data.bin /up/data2.bin",
        "ls -l /up",
        s"get /up/data2.bin ${work.resolve("fetched2.bin")}",
        "rm /up/data2.bin",
        "rmdir /up",
        "bye").mkString("\n").getBytes("UTF-8"))

      val (code, out) = run(Seq("sftp",
        "-F", "/dev/null", // no host/user ssh_config surprises
        "-P", srv.port.toString,
        "-o", "StrictHostKeyChecking=no",
        "-o", "UserKnownHostsFile=/dev/null",
        "-o", s"IdentityFile=$keyFile",
        "-o", "IdentitiesOnly=yes",
        "-o", "BatchMode=yes",
        "-b", batch.toString,
        "graft@127.0.0.1"), timeoutSec = 120)
      assert(code == 0, s"sftp batch failed (exit $code):\n$out")
      assert(out.contains("data2.bin"), s"ls output missing renamed file:\n$out")

      val fetched = Files.readAllBytes(work.resolve("fetched.bin"))
      assert(java.util.Arrays.equals(fetched, payload),
        "get round-trip diverged from the uploaded payload")
      val fetched2 = Files.readAllBytes(work.resolve("fetched2.bin"))
      assert(java.util.Arrays.equals(fetched2, payload),
        "post-rename get diverged")
      // server-side tree is empty again after rm + rmdir
      assert(!Files.exists(root.resolve("up")), "rmdir left the directory behind")
    } finally srv.close()
  }

  test("stock OpenSSH sftp against the graft SftpClient's uploads (cross-client visibility)") {
    if (!haveBinary("sftp") || !haveBinary("ssh-keygen"))
      cancel("OpenSSH client binaries not available")

    val keyDir = tmpDir("ssh-keys2")
    val keyFile = keyDir.resolve("id_ed25519")
    run(Seq("ssh-keygen", "-t", "ed25519", "-N", "", "-q", "-f", keyFile.toString))
    val pubLine = new String(Files.readAllBytes(Paths.get(keyFile.toString + ".pub")), "UTF-8").trim

    val root = tmpDir("sftp-cross-root")
    val work = tmpDir("sftp-cross-work")
    val srv = new SftpMiniServer(root, user = "graft", password = "secret",
      authorizedKeys = Seq(pubLine))
    try {
      // graft client uploads with resume discipline...
      val cfg = SftpSource.SftpConfig("127.0.0.1", srv.port, "graft", "secret")
      val local = work.resolve("from-graft.txt")
      Files.write(local, "written by the graft SftpClient\n".getBytes("UTF-8"))
      val c = new SftpSource.SftpClient(cfg)
      try {
        c.mkdirs("/xchg")
        c.store(local, "/xchg/doc.txt")
      } finally c.close()

      // ...and the stock OpenSSH client reads it back byte-identical
      val batch = work.resolve("batch.txt")
      Files.write(batch, Seq(
        s"get /xchg/doc.txt ${work.resolve("via-openssh.txt")}",
        "bye").mkString("\n").getBytes("UTF-8"))
      val (code, out) = run(Seq("sftp", "-F", "/dev/null",
        "-P", srv.port.toString,
        "-o", "StrictHostKeyChecking=no",
        "-o", "UserKnownHostsFile=/dev/null",
        "-o", s"IdentityFile=$keyFile",
        "-o", "IdentitiesOnly=yes",
        "-o", "BatchMode=yes",
        "-b", batch.toString,
        "graft@127.0.0.1"))
      assert(code == 0, s"sftp cross-read failed (exit $code):\n$out")
      assert(Files.readAllLines(work.resolve("via-openssh.txt")).get(0)
        == "written by the graft SftpClient")
    } finally srv.close()
  }

  test("stock OpenSSH with RekeyLimit=64K drives REPEATED re-keys against the graft server, byte-exact") {
    if (!haveBinary("sftp") || !haveBinary("ssh-keygen"))
      cancel("OpenSSH client binaries not available")

    val keyDir = tmpDir("ssh-keys3")
    val keyFile = keyDir.resolve("id_ed25519")
    run(Seq("ssh-keygen", "-t", "ed25519", "-N", "", "-q", "-f", keyFile.toString))
    val pubLine = new String(Files.readAllBytes(Paths.get(keyFile.toString + ".pub")), "UTF-8").trim

    val root = tmpDir("sftp-rekey-root")
    val work = tmpDir("sftp-rekey-work")
    val payload = {
      val out = new Array[Byte](3 * 1024 * 1024 + 77)
      var x = 0x5bd1e995L
      var i = 0
      while (i < out.length) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        out(i) = x.toByte; i += 1
      }
      out
    }
    Files.write(work.resolve("local.bin"), payload)

    val srv = new SftpMiniServer(root, user = "graft", authorizedKeys = Seq(pubLine))
    try {
      val batch = work.resolve("batch.txt")
      Files.write(batch, Seq(
        s"put ${work.resolve("local.bin")} /data.bin",
        s"get /data.bin ${work.resolve("fetched.bin")}",
        "bye").mkString("\n").getBytes("UTF-8"))

      // RekeyLimit=64K: the REFERENCE implementation initiates a key
      // re-exchange roughly every 64 KiB of traffic — a ~6 MiB batch
      // drives the graft server's peer-initiated re-key path ~dozens
      // of times, the exact regime a >1 GiB real-server staging run
      // would hit with stock defaults.
      val (code, out) = run(Seq("sftp",
        "-F", "/dev/null",
        "-P", srv.port.toString,
        "-o", "StrictHostKeyChecking=no",
        "-o", "UserKnownHostsFile=/dev/null",
        "-o", s"IdentityFile=$keyFile",
        "-o", "IdentitiesOnly=yes",
        "-o", "BatchMode=yes",
        "-o", "RekeyLimit=64K",
        "-b", batch.toString,
        "graft@127.0.0.1"), timeoutSec = 180)
      assert(code == 0, s"sftp re-key batch failed (exit $code):\n$out")
      assert(java.util.Arrays.equals(
        Files.readAllBytes(work.resolve("fetched.bin")), payload),
        "round-trip diverged across OpenSSH-driven re-keys")
      assert(java.util.Arrays.equals(
        Files.readAllBytes(root.resolve("data.bin")), payload),
        "server-side upload diverged across OpenSSH-driven re-keys")
      // the session thread books its count on teardown
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (srv.totalRekeys.get() == 0 && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(srv.totalRekeys.get() >= 10,
        s"expected dozens of OpenSSH-initiated re-keys, got ${srv.totalRekeys.get()}")
    } finally srv.close()
  }
}
