package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.net.{InetAddress, ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.file.Files

/** Property fuzz for the FTP client's MLSD parser and resume state
  * machine (round-10 verdict task 5) — adversarial listings (truncated
  * facts, '='-less facts, size lies, bare-CR/LF splits) through a
  * scripted liar server, and randomized resume/corruption scenarios
  * against the honest [[FtpMiniServer]].
  *
  * The liar speaks just enough RFC 959 to reach each state under test
  * and then misbehaves on cue: arbitrary MLSD payload bytes, SIZE
  * over/under-reports, REST ignored (streams from byte 0), data
  * streams truncated mid-RETR with a LYING 226. The client contract
  * under fire: every lie becomes a LOUD diagnosable failure
  * (IllegalArgumentException from its verification requires) — never a
  * silently spliced or truncated staged file, never a raw index/number
  * crash. Deterministic seeds so failures reproduce.
  */
class FtpFuzzSpec extends AnyFunSuite {

  // ---------- scripted liar server ----------

  /** One-session scripted FTP server: logs in anyone, serves `files`,
    * lies per the knobs. Each test constructs its own on an ephemeral
    * loopback port.
    */
  private final class LiarFtp(
      files: Map[String, Array[Byte]] = Map.empty,
      mlsdPayload: Option[Array[Byte]] = None,
      sizeLie: String => Option[Long] = null, // null = honest
      honorRest: Boolean = true,
      truncateRetrTo: Option[Int] = None, // serve only N bytes, then 226 lie
  ) extends AutoCloseable {
    /** Mutable store behind RETR/STOR (STOR writes land here). */
    private val store = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
    files.foreach { case (k, v) => store.put(k, v) }
    private val listener = new ServerSocket(0, 4, InetAddress.getLoopbackAddress)
    @volatile private var running = true
    def port: Int = listener.getLocalPort

    private val acceptor = new Thread(() => {
      while (running) {
        try { val s = listener.accept(); new Thread(() => serve(s), "liar-session").start() }
        catch { case _: SocketException => }
      }
    }, "liar-acceptor")
    acceptor.setDaemon(true); acceptor.start()

    override def close(): Unit = { running = false; listener.close() }

    private def serve(ctrl: Socket): Unit = {
      val in = new BufferedReader(new InputStreamReader(ctrl.getInputStream, US_ASCII))
      val out = new BufferedWriter(new OutputStreamWriter(ctrl.getOutputStream, US_ASCII))
      def send(s: String): Unit = { out.write(s); out.write("\r\n"); out.flush() }
      var rest = 0L
      var dataListener: ServerSocket = null
      def acceptData(): Socket = {
        val s = dataListener.accept(); dataListener.close(); dataListener = null; s
      }
      def sizeOf(name: String): Option[Long] =
        if (sizeLie != null) sizeLie(name)
        else Option(store.get(name.stripPrefix("/"))).map(_.length.toLong)
      try {
        send("220 liar ready")
        var line: String = null
        while (running && { line = in.readLine(); line != null }) {
          val sp = line.indexOf(' ')
          val (verb, arg) =
            if (sp < 0) (line.toUpperCase, "") else (line.substring(0, sp).toUpperCase, line.substring(sp + 1))
          if (verb != "REST" && verb != "RETR" && verb != "STOR") rest = 0L
          verb match {
            case "USER" => send("331 go on")
            case "PASS" => send("230 whoever you are")
            case "TYPE" => send("200 ok")
            case "PASV" =>
              if (dataListener != null) dataListener.close()
              dataListener = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
              val p = dataListener.getLocalPort
              send(s"227 Entering Passive Mode (127,0,0,1,${p / 256},${p % 256})")
            case "MLSD" =>
              send("150 listing")
              val ds = acceptData()
              try {
                val os = ds.getOutputStream
                os.write(mlsdPayload.getOrElse(Array.empty)); os.flush()
              } catch { case _: java.io.IOException => } finally ds.close()
              send("226 done")
            case "SIZE" =>
              sizeOf(arg) match {
                case Some(n) => send(s"213 $n")
                case None => send("550 no such file")
              }
            case "REST" => rest = arg.trim.toLong; send("350 ok")
            case "RETR" =>
              val body = Option(store.get(arg.stripPrefix("/"))).getOrElse(Array.empty[Byte])
              val off = if (honorRest) rest.toInt else 0
              rest = 0L
              send("150 sending")
              val ds = acceptData()
              try {
                val slice0 = body.drop(math.min(off, body.length))
                val slice = truncateRetrTo.fold(slice0)(n => slice0.take(n))
                ds.getOutputStream.write(slice); ds.getOutputStream.flush()
              } catch { case _: java.io.IOException => } finally ds.close()
              send("226 done") // the lie: even a truncated stream "completes"
            case "STOR" =>
              val name = arg.stripPrefix("/")
              val off = if (honorRest) rest.toInt else 0
              rest = 0L
              send("150 receiving")
              val ds = acceptData()
              val incoming =
                try ds.getInputStream.readAllBytes()
                catch { case _: java.io.IOException => Array.empty[Byte] }
                finally ds.close()
              val prev = Option(store.get(name)).getOrElse(Array.empty[Byte])
              val merged = new Array[Byte](off + incoming.length)
              System.arraycopy(prev, 0, merged, 0, math.min(off, prev.length))
              System.arraycopy(incoming, 0, merged, off, incoming.length)
              store.put(name, merged)
              send("226 stored")
            case "QUIT" => send("221 bye"); return
            case other => send(s"502 $other not implemented")
          }
        }
      } catch { case _: Throwable => }
      finally {
        if (dataListener != null) dataListener.close()
        try ctrl.close() catch { case _: Throwable => }
      }
    }
  }

  private def cfg(port: Int) =
    FtpSource.FtpConfig("127.0.0.1", port, "u", "p", readTimeoutMs = 10000)

  // ---------- MLSD listing fuzz ----------

  private sealed trait LineSpec { def render: String }
  /** RFC-valid entry line; `hidden`/dot names exercise the filters. */
  private case class ValidLine(name: String, size: Long, typ: String) extends LineSpec {
    def render = s"type=$typ;size=$size; $name"
  }
  private case class FactlessLine(name: String) extends LineSpec { def render = s" $name" }
  private case class NoSeparator(junk: String) extends LineSpec { def render = junk }
  private case class TruncatedFact(name: String) extends LineSpec {
    def render = s"type=file;size; $name" // fact with no '='
  }
  private case class BadSize(name: String, sz: String) extends LineSpec {
    def render = s"type=file;size=$sz; $name"
  }
  private case class EmptyName() extends LineSpec { def render = "type=file;size=3; " }

  private val validName: Gen[String] = Gen.frequency(
    5 -> Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(24) + ".csv"),
    1 -> Gen.const("name with spaces.csv"),
    1 -> Gen.const("semi;colons;in;name.bin"),
    1 -> Gen.const(".hidden-file"),
    1 -> Gen.const("."),
    1 -> Gen.const(".."),
  )

  private val lineGen: Gen[LineSpec] = Gen.frequency(
    6 -> (for {
      n <- validName; s <- Gen.chooseNum(0L, Long.MaxValue / 2)
      t <- Gen.oneOf("file", "dir", "cdir", "pdir", "OS.unix=slink")
    } yield ValidLine(n, s, t)),
    1 -> validName.map(FactlessLine(_)),
    1 -> Gen.oneOf("no-separator-anywhere", "type=file;size=3;name", "???").map(NoSeparator(_)),
    1 -> validName.map(TruncatedFact(_)),
    1 -> (for { n <- validName; s <- Gen.oneOf("", "abc", "-5", "9" * 30) } yield BadSize(n, s)),
    1 -> Gen.const(EmptyName()),
  )

  private val listingGen: Gen[(List[LineSpec], String)] = for {
    lines <- Gen.listOf(lineGen).map(_.take(20))
    eol <- Gen.oneOf("\r\n", "\n", "\r") // bare-CR/LF splits: readLine treats all three as line ends
    blanks <- Gen.chooseNum(0, 2)
  } yield (lines, lines.map(_.render).mkString("", eol, eol) + ("\r\n" * blanks))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("MLSD fuzz: 150 adversarial listings parse exactly or fail loudly — never crash raw or drop lines silently") {
    (1 to 150).foreach { seed =>
      val (lines, payload) = sample(listingGen, seed.toLong)
      val malformed = lines.exists {
        case _: ValidLine | _: FactlessLine => false
        case _ => true
      }
      val server = new LiarFtp(mlsdPayload = Some(payload.getBytes(US_ASCII)))
      try {
        val client = new FtpSource.FtpClient(cfg(server.port))
        try {
          val got = try Right(client.list("/", ignoreHidden = false))
            catch { case e: IllegalArgumentException => Left(e) }
          (got, malformed) match {
            case (Left(_), true) => () // loud, diagnosable — the contract
            case (Left(e), false) => fail(s"seed=$seed: valid listing rejected: ${e.getMessage}")
            case (Right(_), true) => fail(s"seed=$seed: malformed listing accepted silently")
            case (Right(entries), false) =>
              val expected = lines.collect {
                case ValidLine(n, s, t) if n != "." && n != ".." =>
                  FtpSource.FtpEntry(n, s, t == "dir" || t == "cdir" || t == "pdir")
                case FactlessLine(n) if n != "." && n != ".." =>
                  FtpSource.FtpEntry(n, 0L, isDir = false)
              }
              assert(entries == expected, s"seed=$seed: parsed entries diverged")
          }
        } finally client.close()
      } finally server.close()
    }
  }

  test("MLSD hidden-file toggle filters dot names but never dot-dot traversal entries") {
    val payload = "type=file;size=3; .secret\r\ntype=file;size=4; plain.csv\r\n"
    val server = new LiarFtp(mlsdPayload = Some(payload.getBytes(US_ASCII)))
    try {
      val client = new FtpSource.FtpClient(cfg(server.port))
      try {
        assert(client.list("/").map(_.name) == Seq("plain.csv"))
        assert(client.list("/", ignoreHidden = false).map(_.name) == Seq(".secret", "plain.csv"))
      } finally client.close()
    } finally server.close()
  }

  // ---------- resume state machine: honest server, randomized boundaries ----------

  test("resume fuzz: 60 randomized (size, partial, corruption) scenarios converge to exact remote bytes") {
    val rnd = new scala.util.Random(42)
    val root = Files.createTempDirectory("ftp-fuzz-root")
    val server = new FtpMiniServer(root)
    val c = FtpSource.FtpConfig("127.0.0.1", server.port, "graft", "secret")
    try {
      val check = FtpSource.ResumeCheckBytes
      val sizes = Seq(0, 1, 7, check - 1, check, check + 1, check * 2, 3 * check + 17)
      (1 to 60).foreach { i =>
        val n = sizes(rnd.nextInt(sizes.length))
        val body = new Array[Byte](n); rnd.nextBytes(body)
        val remoteName = s"f$i.bin"
        Files.write(root.resolve(remoteName), body)
        val local = Files.createTempDirectory("ftp-fuzz-local").resolve(remoteName)
        // partial local prefix of random length, optionally corrupted
        // INSIDE the verified window (min(partialLen, check)) — the
        // window is the documented guarantee; beyond it resume trusts
        val partialLen = if (n == 0) 0 else rnd.nextInt(n + 1)
        val corrupt = partialLen > 0 && rnd.nextBoolean()
        if (partialLen > 0) {
          val partial = java.util.Arrays.copyOf(body, partialLen)
          if (corrupt) {
            val w = math.min(partialLen, check)
            val at = rnd.nextInt(w)
            partial(at) = (partial(at) ^ 0x5a).toByte
          }
          Files.write(local, partial)
        }
        val client = new FtpSource.FtpClient(c)
        val moved =
          try client.retrieve(s"/$remoteName", local)
          finally client.close()
        assert(java.util.Arrays.equals(Files.readAllBytes(local), body),
          s"case $i (n=$n partial=$partialLen corrupt=$corrupt): staged bytes diverged")
        val expectMoved = if (corrupt) n.toLong else (n - partialLen).toLong
        assert(moved == expectMoved,
          s"case $i (n=$n partial=$partialLen corrupt=$corrupt): moved $moved, expected $expectMoved")
      }
    } finally { server.close(); () }
  }

  // ---------- resume state machine: size lies and REST betrayal ----------

  private def body(n: Int, seed: Int): Array[Byte] = {
    val b = new Array[Byte](n); new scala.util.Random(seed).nextBytes(b); b
  }

  test("a server that IGNORES REST cannot splice: the byte-count verification fails loudly") {
    val data = body(1000, 1)
    val server = new LiarFtp(files = Map("f.bin" -> data), honorRest = false)
    try {
      val local = Files.createTempDirectory("ftp-liar").resolve("f.bin")
      Files.write(local, java.util.Arrays.copyOf(data, 400)) // clean partial → resume path
      val client = new FtpSource.FtpClient(cfg(server.port))
      val e = try intercept[IllegalArgumentException](client.retrieve("/f.bin", local))
        finally client.close()
      assert(e.getMessage.contains("did the server honor REST"))
    } finally server.close()
  }

  test("a size over-report at the resume boundary fails loudly instead of staging short") {
    val data = body(800, 2)
    val server = new LiarFtp(files = Map("f.bin" -> data),
      sizeLie = _ => Some(1200L)) // claims 400 more bytes than it will send
    try {
      val local = Files.createTempDirectory("ftp-liar2").resolve("f.bin")
      Files.write(local, java.util.Arrays.copyOf(data, 300))
      val client = new FtpSource.FtpClient(cfg(server.port))
      val e = try intercept[IllegalArgumentException](client.retrieve("/f.bin", local))
        finally client.close()
      assert(e.getMessage.contains("moved"))
    } finally server.close()
  }

  test("a mid-stream truncation with a LYING 226 fails loudly instead of staging a torn file") {
    val data = body(5000, 3)
    val server = new LiarFtp(files = Map("f.bin" -> data), truncateRetrTo = Some(1700))
    try {
      val local = Files.createTempDirectory("ftp-liar3").resolve("f.bin")
      val client = new FtpSource.FtpClient(cfg(server.port))
      val e = try intercept[IllegalArgumentException](client.retrieve("/f.bin", local))
        finally client.close()
      assert(e.getMessage.contains("moved"))
    } finally server.close()
  }

  test("upload: a server that IGNORES REST cannot splice — the final-size verification fails loudly") {
    val data = body(1200, 5)
    // remote already holds a matching 500-byte prefix → store() resumes
    val server = new LiarFtp(files = Map("up.bin" -> java.util.Arrays.copyOf(data, 500)),
      honorRest = false)
    try {
      val local = Files.createTempDirectory("ftp-liar5").resolve("up.bin")
      Files.write(local, data)
      val client = new FtpSource.FtpClient(cfg(server.port))
      // client skips its local 500-byte prefix; the betraying server
      // writes the remaining 700 bytes at offset 0 → remote ends up
      // 700 bytes, not 1200 — the final SIZE check must fire
      val e = try intercept[IllegalArgumentException](client.store(local, "/up.bin"))
        finally client.close()
      assert(e.getMessage.contains("did the server honor REST"))
    } finally server.close()
  }

  test("a size UNDER-report (remote shrank mid-flight) fails loudly instead of trusting the stale length") {
    val data = body(900, 4)
    val server = new LiarFtp(files = Map("f.bin" -> data), sizeLie = _ => Some(600L))
    try {
      // local partial LONGER than the lied size → clamp restarts from 0,
      // then the stream delivers 900 bytes against a 600-byte claim
      val local = Files.createTempDirectory("ftp-liar4").resolve("f.bin")
      Files.write(local, java.util.Arrays.copyOf(data, 700))
      val client = new FtpSource.FtpClient(cfg(server.port))
      val e = try intercept[IllegalArgumentException](client.retrieve("/f.bin", local))
        finally client.close()
      assert(e.getMessage.contains("moved"))
    } finally server.close()
  }
}
