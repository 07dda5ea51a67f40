package graft.sources

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter, RandomAccessFile}
import java.net.{InetAddress, ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.file.{Files, Path}

/** Minimal in-JVM FTP server over a directory root — test scaffolding
  * so [[FtpSource]]'s protocol layer is EXECUTED, not mocked (the
  * discipline the Mongo/ES emulations and the Derby-backed JDBC specs
  * follow). Speaks the subset the client uses: USER/PASS, TYPE,
  * PASV, MLSD, RETR/STOR with REST resume, SIZE, DELE, MKD/RMD,
  * RNFR/RNTO, CWD/PWD, QUIT. Thread-per-connection, paths jailed to
  * the root, passive-only data connections on loopback.
  */
final class FtpMiniServer(root: Path, user: String = "graft",
    password: String = "secret") extends AutoCloseable {

  private val listener = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
  @volatile private var running = true
  def port: Int = listener.getLocalPort

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = listener.accept()
        new Thread(() => serve(s), "ftp-mini-session").start()
      } catch { case _: SocketException => /* closed */ }
    }
  }, "ftp-mini-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  override def close(): Unit = { running = false; listener.close() }

  private def serve(ctrl: Socket): Unit = {
    val in = new BufferedReader(new InputStreamReader(ctrl.getInputStream, US_ASCII))
    val out = new BufferedWriter(new OutputStreamWriter(ctrl.getOutputStream, US_ASCII))
    def send(s: String): Unit = { out.write(s); out.write("\r\n"); out.flush() }

    var authed = false
    var pendingUser: String = null
    var cwd = "/"
    var restOffset = 0L
    var renameFrom: Path = null
    var dataListener: ServerSocket = null

    /** Resolve an FTP path against cwd, jailed to the root. */
    def resolve(arg: String): Path = {
      val virtual = if (arg.startsWith("/")) arg else s"$cwd/$arg"
      val p = root.resolve(virtual.stripPrefix("/")).normalize()
      require(p.startsWith(root), s"path escape: $arg")
      p
    }

    def acceptData(): Socket = {
      require(dataListener != null, "no PASV before data command")
      val s = dataListener.accept()
      dataListener.close(); dataListener = null
      s
    }

    try {
      send("220 graft mini FTP ready")
      var line: String = null
      while (running && { line = in.readLine(); line != null }) {
        val sp = line.indexOf(' ')
        val (verb, arg) =
          if (sp < 0) (line.toUpperCase, "")
          else (line.substring(0, sp).toUpperCase, line.substring(sp + 1))
        // Strict RFC 959/3659 restart semantics: REST applies only to
        // the IMMEDIATELY following transfer command — any other
        // intervening command (PASV included) resets the marker. This
        // models the real servers the ADVICE flagged, so a client that
        // sent REST before PASV would stream from byte 0 here and trip
        // its own byte-count verification.
        if (verb != "REST" && verb != "RETR" && verb != "STOR") restOffset = 0L
        try verb match {
          case "USER" => pendingUser = arg; send("331 password required")
          case "PASS" =>
            if (pendingUser == user && arg == password) { authed = true; send("230 logged in") }
            else send("530 login incorrect")
          case _ if !authed => send("530 not logged in")
          case "TYPE" => send("200 binary it is")
          case "SYST" => send("215 UNIX Type: L8")
          case "FEAT" => send("211-features\n MLSD\n REST STREAM\n SIZE\n211 end")
          case "PWD" => send(s"""257 "$cwd"""")
          case "CWD" =>
            val p = resolve(arg)
            if (Files.isDirectory(p)) {
              cwd = "/" + root.relativize(p).toString.replace('\\', '/')
              if (cwd == "/.") cwd = "/"
              send("250 ok")
            } else send("550 no such directory")
          case "PASV" =>
            if (dataListener != null) dataListener.close()
            dataListener = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
            val p = dataListener.getLocalPort
            send(s"227 Entering Passive Mode (127,0,0,1,${p / 256},${p % 256})")
          case "MLSD" =>
            val dir = resolve(if (arg.isEmpty) cwd else arg)
            if (!Files.isDirectory(dir)) send("550 not a directory")
            else {
              send("150 here it comes")
              val ds = acceptData()
              try {
                val w = new BufferedWriter(
                  new OutputStreamWriter(ds.getOutputStream, US_ASCII))
                Files.list(dir).sorted().forEach { f =>
                  val t = if (Files.isDirectory(f)) "dir" else "file"
                  val size = if (Files.isDirectory(f)) 0L else Files.size(f)
                  w.write(s"type=$t;size=$size; ${f.getFileName}\r\n")
                }
                w.flush()
              } finally ds.close()
              send("226 done")
            }
          case "SIZE" =>
            val p = resolve(arg)
            if (Files.isRegularFile(p)) send(s"213 ${Files.size(p)}")
            else send("550 no such file")
          case "REST" => restOffset = arg.trim.toLong; send("350 restarting")
          case "RETR" =>
            val p = resolve(arg)
            if (!Files.isRegularFile(p)) { restOffset = 0L; send("550 no such file") }
            else {
              val off = restOffset; restOffset = 0L
              send("150 sending")
              val ds = acceptData()
              val ok =
                try {
                  val is = Files.newInputStream(p)
                  try {
                    is.skipNBytes(off)
                    val os = ds.getOutputStream
                    val buf = new Array[Byte](64 * 1024)
                    var r = 0
                    while ({ r = is.read(buf); r >= 0 }) os.write(buf, 0, r)
                    os.flush(); true
                  } finally is.close()
                } catch { case _: java.io.IOException => false }
                finally ds.close()
              send(if (ok) "226 done" else "426 transfer aborted")
            }
          case "STOR" =>
            val p = resolve(arg)
            val off = restOffset; restOffset = 0L
            send("150 receiving")
            val ds = acceptData()
            try {
              Option(p.getParent).foreach(Files.createDirectories(_))
              val raf = new RandomAccessFile(p.toFile, "rw")
              try {
                raf.seek(off)
                val is = ds.getInputStream
                val buf = new Array[Byte](64 * 1024)
                var r = 0
                while ({ r = is.read(buf); r >= 0 }) raf.write(buf, 0, r)
                raf.setLength(raf.getFilePointer) // STOR replaces the tail
              } finally raf.close()
            } finally ds.close()
            send("226 stored")
          case "DELE" =>
            val p = resolve(arg)
            if (Files.deleteIfExists(p)) send("250 deleted") else send("550 no such file")
          case "MKD" =>
            Files.createDirectories(resolve(arg)); send(s"""257 "$arg" created""")
          case "RMD" =>
            val p = resolve(arg)
            if (Files.isDirectory(p) && Files.list(p).findFirst().isEmpty) {
              Files.delete(p); send("250 removed")
            } else send("550 not an empty directory")
          case "RNFR" =>
            val p = resolve(arg)
            if (Files.exists(p)) { renameFrom = p; send("350 ready") }
            else send("550 no such file")
          case "RNTO" =>
            if (renameFrom == null) send("503 RNFR first")
            else {
              Files.move(renameFrom, resolve(arg),
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
              renameFrom = null; send("250 renamed")
            }
          case "QUIT" => send("221 bye"); return
          case _ => send(s"502 $verb not implemented")
        } catch {
          case e: Throwable => send(s"550 ${e.getMessage}")
        }
      }
    } catch { case _: Throwable => /* session torn down */ }
    finally {
      if (dataListener != null) dataListener.close()
      try ctrl.close() catch { case _: Throwable => }
    }
  }
}
