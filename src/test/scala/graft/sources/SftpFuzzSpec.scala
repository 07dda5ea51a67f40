package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Adversarial coverage for the SFTP tier, following the round-10/11
  * fuzz discipline (workbooks, SQL dumps, RAR, FTP MLSD): the wire
  * codec round-trips under generated hostile values, and a LIAR
  * server — one that mis-executes resume-relevant operations the way
  * broken real servers do — must produce LOUD client failures, never
  * a silently spliced or truncated file.
  */
class SftpFuzzSpec extends AnyFunSuite {

  /** Deterministic generator draw (the repo's property-spec idiom —
    * reproducible cases, no flaky seeds).
    */
  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // ---- SshWire codec properties ----

  test("wire codec round-trips u32/u64/strings/mpint/name-lists under generated values") {
    val genBytes = Gen.choose(0, 2048).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    val genCase = for {
      u32v <- Gen.choose(0L, 0xffffffffL)
      u64v <- Gen.choose(Long.MinValue, Long.MaxValue)
      bytes <- genBytes
      names <- Gen.listOf(Gen.identifier)
    } yield (u32v, u64v, bytes, names)
    (1 to 200).foreach { i =>
      val (u32v, u64v, bytes, names) = sample(genCase, 1000L + i)
      val w = new SshWire.W()
      w.u32(u32v).u64(u64v).str(bytes).nameList(names.filter(_.nonEmpty))
      val r = new SshWire.R(w.bytes)
      assert(r.u32() == u32v)
      assert(r.u64() == u64v)
      assert(java.util.Arrays.equals(r.str(), bytes))
      assert(r.nameList() == names.filter(_.nonEmpty))
      assert(r.remaining == 0)
    }
  }

  test("mpint encoding: high-bit values gain a sign byte, zero is empty, round-trips") {
    val genRaw = Gen.choose(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    (1 to 200).foreach { i =>
      val raw = sample(genRaw, 2000L + i)
      val v = new java.math.BigInteger(1, raw)
      val w = new SshWire.W().mpint(v)
      val r = new SshWire.R(w.bytes)
      assert(r.mpint() == v)
    }
    // the SSH-mandated edge: 0x80... needs a leading zero byte
    val highBit = new java.math.BigInteger(1, Array(0x80.toByte))
    val enc = new SshWire.W().mpint(highBit).bytes
    assert(enc.length == 4 + 2 && enc(4) == 0x00 && (enc(5) & 0xff) == 0x80)
    assert(new SshWire.R(new SshWire.W().mpint(java.math.BigInteger.ZERO).bytes).mpint()
      == java.math.BigInteger.ZERO)
  }

  test("truncated payloads fail loudly at every cut point, never hang or mis-read") {
    val w = new SshWire.W().u32(7L).str("hello").u64(42L).str(Array[Byte](1, 2, 3))
    val full = w.bytes
    (0 until full.length).foreach { cut =>
      val r = new SshWire.R(java.util.Arrays.copyOf(full, cut))
      intercept[Exception] {
        r.u32(); r.str(); r.u64(); r.str()
      }
    }
  }

  test("Ed25519 raw key encoding round-trips generated keys (sign bit included)") {
    (1 to 25).foreach { _ =>
      val kp = SshWire.generateEd25519()
      val pub = kp.getPublic.asInstanceOf[java.security.interfaces.EdECPublicKey]
      val raw = SshWire.ed25519Raw(pub)
      assert(raw.length == 32)
      val back = SshWire.ed25519FromRaw(raw)
      // the round-tripped key must verify a signature made by the original
      val data = raw ++ Array[Byte](9, 9, 9)
      val sig = SshWire.ed25519Sign(kp.getPrivate, data)
      assert(SshWire.ed25519Verify(back, data, sig))
      assert(!SshWire.ed25519Verify(back, data :+ 1.toByte, sig))
    }
  }

  test("normalizePath: rooted, idempotent, never escapes above /") {
    val genSegs = Gen.listOf(Gen.oneOf(Gen.identifier, Gen.const(".."), Gen.const("."), Gen.const("")))
    (1 to 200).foreach { i =>
      val segs = sample(genSegs, 3000L + i)
      val p = segs.mkString("/")
      val n = SftpSource.normalizePath("/" + p)
      assert(n.startsWith("/"))
      assert(!n.contains("//") && !n.split('/').contains("..") && !n.split('/').contains("."))
      assert(SftpSource.normalizePath(n) == n)
    }
    assert(SftpSource.normalizePath("/a/../../../etc/passwd") == "/etc/passwd")
    assert(SftpSource.normalizePath("/a/b/../c//./d") == "/a/c/d")
  }

  // ---- staging fence against hostile listings (protocol-independent) ----

  /** A fake client whose listing advertises a path-escaping name —
    * the fence lives in [[RemoteStaging]], so it is tested without a
    * wire protocol at all.
    */
  private final class HostileListingClient extends RemoteFileClient {
    override def list(path: String, ignoreHidden: Boolean): Seq[RemoteEntry] =
      Seq(RemoteEntry("../evil.bin", 4L, isDir = false))
    override def size(path: String): Option[Long] = Some(4L)
    override def prefixMatches(remote: String, local: Path, n: Long): Boolean = false
    override def retrieve(remote: String, local: Path, resume: Boolean): Long =
      fail(s"retrieve must not be reached for an escaping name: $remote")
    override def store(local: Path, remote: String, resume: Boolean): Long = 0L
    override def ensureDir(path: String): Unit = ()
    override def close(): Unit = ()
  }

  test("stageFiles fences a listing name that escapes the staging root") {
    val staging = Files.createTempDirectory("fence").toString
    val e = intercept[IllegalArgumentException] {
      RemoteStaging.stageFiles(() => new HostileListingClient, "/", ".*", staging)
    }
    assert(e.getMessage.contains("escapes staging dir"))
  }

  // ---- liar servers: resume lies must be loud ----

  private def noiseBytes(n: Int, seed: Long): Array[Byte] = {
    val out = new Array[Byte](n)
    var x = seed | 1L
    var i = 0
    while (i < n) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; out(i) = x.toByte; i += 1 }
    out
  }

  test("a server that writes every chunk at offset 0 cannot splice a resumed upload silently") {
    val root = Files.createTempDirectory("liar-w0")
    val payload = noiseBytes(200 * 1024, seed = 3)
    val local = Files.createTempDirectory("liar-w0-local").resolve("f.bin")
    Files.write(local, payload)
    // a crashed earlier upload left the first half remotely
    Files.write(root.resolve("f.bin"), java.util.Arrays.copyOf(payload, payload.length / 2))
    val srv = new SftpMiniServer(root, chaos = "write-at-zero")
    try {
      val c = new SftpSource.SftpClient(
        SftpSource.SftpConfig("127.0.0.1", srv.port, "graft", "secret"))
      try {
        val e = intercept[Exception] { c.store(local, "/f.bin") }
        assert(e.getMessage.contains("expected"),
          s"offset-ignoring server must fail the size check, got: ${e.getMessage}")
      } finally c.close()
    } finally srv.close()
  }

  test("a server reporting size-1 at a resume boundary fails the byte-count check loudly") {
    val root = Files.createTempDirectory("liar-sz")
    val payload = noiseBytes(150 * 1024, seed = 11)
    Files.write(root.resolve("g.bin"), payload)
    val srv = new SftpMiniServer(root, chaos = "size-minus-one")
    try {
      val c = new SftpSource.SftpClient(
        SftpSource.SftpConfig("127.0.0.1", srv.port, "graft", "secret"))
      try {
        val local = Files.createTempDirectory("liar-sz-local").resolve("g.bin")
        val e = intercept[Exception] { c.retrieve("/g.bin", local) }
        assert(e.getMessage.contains("expected") || e.getMessage.contains("bytes"),
          s"size-lying server must fail the count check, got: ${e.getMessage}")
      } finally c.close()
    } finally srv.close()
  }
}
