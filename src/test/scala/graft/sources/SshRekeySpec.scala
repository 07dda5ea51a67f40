package graft.sources

import java.nio.file.{Files, Paths}

import graft.sources.SftpSource.{SftpClient, SftpConfig}
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 verdict task 2: EXECUTE the RFC 4253 §9 re-key path
  * (`SshTransport.rekey`). The machine guards multi-GiB staging
  * against every stock peer's own re-key window (OpenSSH defaults to
  * re-keying after 1-4 GiB), but until this spec no test ever drove
  * it — loopback transfers topped out at 5 MiB under the 1 GiB
  * default threshold. Here the thresholds shrink to a few hundred
  * KiB so one 5 MiB transfer re-keys MANY times, in three initiation
  * regimes: client-initiated, server-initiated (the client services a
  * peer KEXINIT mid-stream), and both-at-once (the simultaneous-
  * KEXINIT race each side must resolve in its original role). Payload
  * byte-exactness through every regime is the contract; the `rekeys`
  * counters prove the path actually ran.
  */
class SshRekeySpec extends AnyFunSuite {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

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

  /** 5 MiB down + 5 MiB up through one connection with the given
    * re-key thresholds; returns (clientRekeys, serverRekeysTotal).
    */
  private def roundTrip(clientLimit: Long, serverLimit: Long,
      seed: Long): (Long, Long) = {
    val root = Paths.get(tmpDir("rekey-root"))
    val srv = new SftpMiniServer(root, rekeyAfterBytes = serverLimit)
    try {
      val cfg = SftpConfig("127.0.0.1", srv.port, "graft", "secret",
        rekeyAfterBytes = clientLimit)
      val payload = noiseBytes(5 * 1024 * 1024 + 333, seed)
      Files.write(root.resolve("big.bin"), payload)
      val c = new SftpClient(cfg)
      val clientRekeys =
        try {
          val local = Paths.get(tmpDir("rekey-local"), "big.bin")
          assert(c.retrieve("/big.bin", local) == payload.length.toLong)
          assert(java.util.Arrays.equals(Files.readAllBytes(local), payload),
            "download diverged across re-keys")
          assert(c.store(local, "/up.bin") == payload.length.toLong)
          assert(java.util.Arrays.equals(
            Files.readAllBytes(root.resolve("up.bin")), payload),
            "upload diverged across re-keys")
          c.rekeys
        } finally c.close()
      // session thread records its transport's count on teardown
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (srv.totalRekeys.get() == 0 && serverLimit < (1L << 30) &&
          System.nanoTime() < deadline) Thread.sleep(20)
      (clientRekeys, srv.totalRekeys.get())
    } finally srv.close()
  }

  test("client-initiated re-keys: 5 MiB each way across a 384 KiB threshold, byte-exact") {
    val (cr, _) = roundTrip(clientLimit = 384L * 1024,
      serverLimit = SshTransport.DefaultRekeyBytes, seed = 11)
    assert(cr >= 8, s"expected many client-initiated re-keys over ~10 MiB, got $cr")
  }

  test("server-initiated re-keys: the client services peer KEXINIT mid-transfer, byte-exact") {
    val (cr, sr) = roundTrip(clientLimit = SshTransport.DefaultRekeyBytes,
      serverLimit = 384L * 1024, seed = 22)
    assert(sr >= 8, s"expected many server-initiated re-keys, got $sr")
    // the client COMPLETED the same exchanges it never initiated
    assert(cr == sr, s"client serviced $cr of the server's $sr re-keys")
  }

  test("both sides re-key concurrently (simultaneous KEXINIT tolerated), byte-exact") {
    val (cr, sr) = roundTrip(clientLimit = 256L * 1024,
      serverLimit = 320L * 1024, seed = 33)
    assert(cr >= 8 && cr == sr,
      s"re-key counts diverged under dual initiation: client $cr, server $sr")
  }
}
