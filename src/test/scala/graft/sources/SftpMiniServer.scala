package graft.sources

import java.io.{IOException, RandomAccessFile}
import java.net.{InetAddress, ServerSocket, Socket, SocketException}
import java.nio.file.{Files, NoSuchFileException, Path}
import java.security.KeyPair
import java.security.interfaces.EdECPublicKey

import scala.collection.mutable

/** Minimal in-JVM SSH + SFTP v3 server over a directory root — test
  * scaffolding so [[SftpSource]]'s whole stack (SSH-2 transport, auth,
  * channel, SFTP protocol) is EXECUTED against a real peer, not
  * mocked, following [[FtpMiniServer]]'s discipline. Because it speaks
  * real SSH-2, the interop spec also drives a stock OpenSSH `sftp`
  * binary against it — the strongest wire-correctness proof available
  * offline.
  *
  * Auth: password (user/password ctor args) AND publickey (any key
  * whose `authorized_keys`-style line is in `authorizedKeys` — the
  * path the OpenSSH client uses non-interactively). One session
  * channel per connection, thread-per-connection, paths jailed to the
  * root.
  */
final class SftpMiniServer(root: Path, user: String = "graft",
    password: String = "secret",
    authorizedKeys: Seq[String] = Nil,
    /** Fault-injection mode for the liar-server fuzz (mirrors the FTP
      * tier's REST-ignoring server): "" = honest,
      * "write-at-zero" = WRITE requests ignore the offset and land at
      * byte 0 (the upload-resume splice a broken server produces),
      * "size-minus-one" = STAT/READDIR report size-1 (a stale-metadata
      * server at a resume boundary). The client contract under test:
      * every lie must surface as a LOUD error, never a spliced or
      * truncated file.
      */
    chaos: String = "",
    /** Server-side re-key threshold (RFC 4253 §9); specs shrink it so
      * the SERVER initiates re-keys mid-transfer, forcing the client
      * to service peer-initiated kex.
      */
    rekeyAfterBytes: Long = SshTransport.DefaultRekeyBytes) extends AutoCloseable {

  val hostKey: KeyPair = SshWire.generateEd25519()

  /** Total completed re-keys across all finished sessions. */
  val totalRekeys = new java.util.concurrent.atomic.AtomicLong(0)

  /** The server host key as an `authorized_keys`/`known_hosts` body
    * (`ssh-ed25519 <base64>`), for client-side pinning.
    */
  def hostKeyLine: String =
    "ssh-ed25519 " + java.util.Base64.getEncoder.encodeToString(
      SshWire.ed25519Blob(hostKey.getPublic.asInstanceOf[EdECPublicKey]))

  private val authorized: Seq[java.security.PublicKey] =
    authorizedKeys.map(SshWire.parseAuthorizedEd25519)

  private val listener = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
  @volatile private var running = true
  def port: Int = listener.getLocalPort

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = listener.accept()
        val worker = new Thread(() => serve(s), "sftp-mini-session")
        worker.setDaemon(true)
        worker.start()
      } catch { case _: SocketException => /* closed */ }
    }
  }, "sftp-mini-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  override def close(): Unit = { running = false; listener.close() }

  private def serve(socket: Socket): Unit = {
    import SshWire._
    try {
      socket.setSoTimeout(30000)
      val t = SshTransport.server(socket, hostKey, rekeyAfterBytes)
      try {
        // ---- service + auth phase (RFC 4252) ----
        val svc = new R(t.recv())
        require(svc.u8() == MsgServiceRequest, "expected SERVICE_REQUEST")
        require(svc.strUtf8() == "ssh-userauth", "expected ssh-userauth service")
        t.send(new W().u8(MsgServiceAccept).str("ssh-userauth").bytes)

        var authedUser: String = null
        while (authedUser == null) {
          val r = new R(t.recv())
          require(r.u8() == MsgUserauthRequest, "expected USERAUTH_REQUEST")
          val reqUser = r.strUtf8()
          val service = r.strUtf8()
          require(service == "ssh-connection", s"unsupported service $service")
          val method = r.strUtf8()
          def fail(): Unit =
            t.send(new W().u8(MsgUserauthFailure)
              .nameList(Seq("publickey", "password")).bool(false).bytes)
          method match {
            case "password" =>
              r.bool()
              val given = r.strUtf8()
              if (reqUser == user && given == password) {
                t.send(Array[Byte](MsgUserauthSuccess.toByte))
                authedUser = reqUser
              } else fail()
            case "publickey" =>
              val hasSig = r.bool()
              val alg = r.strUtf8()
              val blob = r.str()
              val known = alg == "ssh-ed25519" && reqUser == user &&
                authorized.exists(k =>
                  java.util.Arrays.equals(
                    ed25519Blob(k.asInstanceOf[EdECPublicKey]), blob))
              if (!known) fail()
              else if (!hasSig) {
                t.send(new W().u8(MsgUserauthPkOk).str(alg).str(blob).bytes)
              } else {
                val sig = ed25519SigFromBlob(r.str())
                // RFC 4252 §7: signature covers session id + the
                // request with the has-signature boolean TRUE
                val signed = new W().str(t.sessionId).u8(MsgUserauthRequest)
                  .str(reqUser).str("ssh-connection").str("publickey")
                  .bool(true).str(alg).str(blob).bytes
                if (ed25519Verify(ed25519FromBlob(blob), signed, sig)) {
                  t.send(Array[Byte](MsgUserauthSuccess.toByte))
                  authedUser = reqUser
                } else fail()
              }
            case _ => fail() // includes "none" — advertises the real methods
          }
        }

        // ---- connection phase: one session channel ----
        new SftpServerSession(t, root, chaos).run()
      } finally { totalRekeys.addAndGet(t.rekeys); t.close() }
    } catch {
      case _: IOException => () // peer went away — session over
      case e: Throwable if running =>
        System.err.println(s"sftp-mini: session error: ${e.getMessage}")
    }
  }
}

/** One authenticated connection's channel + SFTP v3 dispatch. */
private final class SftpServerSession(t: SshTransport, root: Path, chaos: String) {
  import SshWire._

  private val LocalWindow = 1L << 21
  private var remoteId = -1L
  private var remoteWindow = 0L
  private var remoteMaxPacket = 32768L
  private var consumed = 0L
  private var peerEof = false
  private var peerClosed = false
  private var closeSent = false
  private val dataQueue = mutable.Queue[Array[Byte]]()

  def run(): Unit = {
    // channel open + subsystem request
    var subsystemUp = false
    while (!subsystemUp && !peerClosed) {
      val r = new R(t.recv())
      r.u8() match {
        case MsgChannelOpen =>
          val tpe = r.strUtf8()
          val senderId = r.u32()
          val win = r.u32()
          val maxPkt = r.u32()
          if (tpe != "session" || remoteId >= 0) {
            t.send(new W().u8(MsgChannelOpenFailure).u32(senderId).u32(3L)
              .str(s"only one session channel: $tpe").str("").bytes)
          } else {
            remoteId = senderId; remoteWindow = win; remoteMaxPacket = maxPkt
            t.send(new W().u8(MsgChannelOpenConfirmation).u32(remoteId)
              .u32(0L).u32(LocalWindow).u32(32768L).bytes)
          }
        case MsgChannelRequest =>
          r.u32()
          val what = r.strUtf8()
          val wantReply = r.bool()
          if (what == "subsystem" && r.strUtf8() == "sftp") {
            if (wantReply) t.send(new W().u8(MsgChannelSuccess).u32(remoteId).bytes)
            subsystemUp = true
          } else if (wantReply)
            t.send(new W().u8(MsgChannelFailure).u32(remoteId).bytes)
        case MsgGlobalRequest =>
          r.strUtf8()
          if (r.bool()) t.send(Array[Byte](MsgRequestFailure.toByte))
        case MsgChannelClose => peerClosed = true
        case MsgChannelWindowAdjust => r.u32(); remoteWindow += r.u32()
        case MsgChannelData =>
          r.u32(); dataQueue.enqueue(r.str()) // subsystem data raced the reply
        case other => throw new IOException(s"sftp-mini: unexpected pre-subsystem message $other")
      }
    }
    if (!subsystemUp) return

    val fs = new SftpFileOps(root, chaos)
    try {
      while (!peerEof && !peerClosed) {
        val pkt = nextSftpPacket()
        if (pkt != null) {
          val (tpe, r) = pkt
          val reply = fs.handle(tpe, r)
          sendData(reply)
        }
      }
    } finally fs.closeAll()
    // orderly teardown: EOF + exit-status + CLOSE, then drain peer CLOSE
    if (!closeSent) {
      t.send(new W().u8(MsgChannelEof).u32(remoteId).bytes)
      t.send(new W().u8(MsgChannelRequest).u32(remoteId).str("exit-status")
        .bool(false).u32(0L).bytes)
      t.send(new W().u8(MsgChannelClose).u32(remoteId).bytes)
      closeSent = true
    }
    var spins = 0
    while (!peerClosed && spins < 64) {
      try pump() catch { case _: IOException => peerClosed = true }
      spins += 1
    }
  }

  // ---- channel plumbing ----

  private def pump(): Unit = {
    val r = new R(t.recv())
    r.u8() match {
      case MsgChannelWindowAdjust => r.u32(); remoteWindow += r.u32()
      case MsgChannelData =>
        r.u32()
        val d = r.str()
        consumed += d.length
        dataQueue.enqueue(d)
        if (consumed >= LocalWindow / 2) {
          t.send(new W().u8(MsgChannelWindowAdjust).u32(remoteId).u32(consumed).bytes)
          consumed = 0L
        }
      case MsgChannelEof => peerEof = true
      case MsgChannelClose =>
        peerClosed = true
        if (!closeSent) {
          t.send(new W().u8(MsgChannelClose).u32(remoteId).bytes)
          closeSent = true
        }
      case MsgChannelRequest =>
        r.u32(); r.strUtf8()
        if (r.bool()) t.send(new W().u8(MsgChannelFailure).u32(remoteId).bytes)
      case MsgGlobalRequest =>
        r.strUtf8()
        if (r.bool()) t.send(Array[Byte](MsgRequestFailure.toByte))
      case MsgChannelExtendedData => ()
      case other => throw new IOException(s"sftp-mini: unexpected channel message $other")
    }
  }

  private var inBuf: Array[Byte] = Array.emptyByteArray
  private var inPos = 0

  /** Next complete SFTP packet, or null if the peer signalled EOF
    * before another packet arrived.
    */
  private def nextSftpPacket(): (Int, R) = {
    def avail = inBuf.length - inPos
    def fill(need: Int): Boolean = {
      while (avail < need) {
        while (dataQueue.isEmpty) {
          if (peerEof || peerClosed) return false
          pump()
        }
        val chunk = dataQueue.dequeue()
        val merged = new Array[Byte](avail + chunk.length)
        System.arraycopy(inBuf, inPos, merged, 0, avail)
        System.arraycopy(chunk, 0, merged, avail, chunk.length)
        inBuf = merged; inPos = 0
      }
      true
    }
    if (!fill(4)) return null
    val len = ((inBuf(inPos) & 0xff) << 24) | ((inBuf(inPos + 1) & 0xff) << 16) |
      ((inBuf(inPos + 2) & 0xff) << 8) | (inBuf(inPos + 3) & 0xff)
    require(len >= 1 && len <= (1 << 26), s"sftp-mini: implausible packet length $len")
    inPos += 4
    if (!fill(len)) return null
    val body = java.util.Arrays.copyOfRange(inBuf, inPos, inPos + len)
    inPos += len
    if (inPos == inBuf.length) { inBuf = Array.emptyByteArray; inPos = 0 }
    val r = new R(body)
    (r.u8(), r)
  }

  /** Send one framed SFTP packet as channel data, chunked to the
    * peer's max packet and window (RFC 4254 §5.2).
    */
  private def sendData(framed: Array[Byte]): Unit = {
    var p = 0
    val cap = math.min(remoteMaxPacket - 64L, 32768L).toInt
    while (p < framed.length) {
      while (remoteWindow <= 0 && !peerClosed) pump()
      if (peerClosed) throw new IOException("sftp-mini: peer closed mid-reply")
      val n = math.min(math.min(framed.length - p, cap).toLong, remoteWindow).toInt
      t.send(new W().u8(MsgChannelData).u32(remoteId).u32(n.toLong)
        .raw(framed, p, n).bytes)
      remoteWindow -= n
      p += n
    }
  }
}

/** SFTP v3 request dispatch over a jailed directory root. Returns
  * fully-framed reply packets (length-prefixed).
  */
private final class SftpFileOps(root: Path, chaos: String = "") {
  import SshWire._
  import SftpSource._
  import scala.jdk.CollectionConverters._

  private val handles = mutable.Map[String, AnyRef]()
  private var handleSeq = 0

  private final class DirState(val entries: Vector[Path]) { var cursor = 0 }

  def closeAll(): Unit = {
    handles.values.foreach {
      case f: RandomAccessFile => try f.close() catch { case _: Throwable => () }
      case _ => ()
    }
    handles.clear()
  }

  /** Resolve a client path, jailed to the root. */
  private def resolve(virtual: String): Path = {
    val p = root.resolve(SftpSource.normalizePath(virtual).stripPrefix("/")).normalize()
    require(p.startsWith(root), s"path escape: $virtual")
    p
  }

  private def virtualize(p: Path): String =
    "/" + root.relativize(p).toString.replace('\\', '/')

  private def frame(tpe: Int, body: Array[Byte]): Array[Byte] =
    new W().u32((1 + body.length).toLong).u8(tpe).raw(body).bytes

  private def status(id: Long, code: Int, msg: String): Array[Byte] =
    frame(FxpStatus, new W().u32(id).u32(code.toLong).str(msg).str("en").bytes)

  private def attrsOf(p: Path): Array[Byte] = {
    val a = Files.readAttributes(p, classOf[java.nio.file.attribute.BasicFileAttributes])
    val perms = (if (a.isDirectory) 0x4000 | 0x1ed else 0x8000 | 0x1a4) // 755 / 644
    val size =
      if (chaos == "size-minus-one" && !a.isDirectory && a.size() > 0) a.size() - 1
      else a.size()
    new W().u32((AttrSize | AttrPermissions | AttrAcModTime).toLong)
      .u64(size)
      .u32(perms.toLong)
      .u32(a.lastModifiedTime().toMillis / 1000)
      .u32(a.lastModifiedTime().toMillis / 1000)
      .bytes
  }

  private def longnameOf(p: Path): String = {
    val a = Files.readAttributes(p, classOf[java.nio.file.attribute.BasicFileAttributes])
    val d = if (a.isDirectory) 'd' else '-'
    f"$d%crw-r--r--    1 graft    graft    ${a.size()}%10d Jan  1 00:00 ${p.getFileName}"
  }

  private def newHandle(v: AnyRef): Array[Byte] = {
    handleSeq += 1
    val key = s"h$handleSeq"
    handles(key) = v
    key.getBytes("UTF-8")
  }

  private def lookup[T](handle: Array[Byte]): T =
    handles.getOrElse(new String(handle, "UTF-8"),
      throw new NoSuchFileException("stale handle")).asInstanceOf[T]

  def handle(tpe: Int, r: R): Array[Byte] = tpe match {
    case FxpInit =>
      // VERSION carries no request id
      frame(FxpVersion, new W().u32(3L).bytes)
    case _ =>
      val id = r.u32()
      try dispatch(tpe, id, r)
      catch {
        case _: NoSuchFileException => status(id, FxNoSuchFile, "no such file")
        case e: Throwable => status(id, FxFailure, Option(e.getMessage).getOrElse(e.toString))
      }
  }

  private def dispatch(tpe: Int, id: Long, r: R): Array[Byte] = tpe match {
    case FxpRealpath =>
      val p = resolve(r.strUtf8())
      val v = if (p == root) "/" else virtualize(p)
      frame(FxpName, new W().u32(id).u32(1L).str(v).str(v)
        .u32(0L).bytes) // empty attrs: flags 0
    case FxpStat | FxpLstat =>
      val p = resolve(r.strUtf8())
      if (!Files.exists(p)) status(id, FxNoSuchFile, "no such file")
      else frame(FxpAttrs, new W().u32(id).raw(attrsOf(p)).bytes)
    case FxpFstat =>
      val f = lookup[RandomAccessFile](r.str())
      frame(FxpAttrs, new W().u32(id)
        .u32((AttrSize).toLong).u64(f.length()).bytes)
    case FxpSetstat =>
      val p = resolve(r.strUtf8())
      if (!Files.exists(p)) status(id, FxNoSuchFile, "no such file")
      else { applyAttrs(p, r); status(id, FxOk, "ok") }
    case FxpFsetstat =>
      val f = lookup[RandomAccessFile](r.str())
      val attrs = SftpSource.readAttrs(r)
      attrs.size.foreach(f.setLength)
      status(id, FxOk, "ok")
    case FxpOpen =>
      val p = resolve(r.strUtf8())
      val pflags = r.u32().toInt
      SftpSource.readAttrs(r) // open attrs (perms) — accepted, not applied
      if ((pflags & FlagCreat) == 0 && !Files.exists(p))
        status(id, FxNoSuchFile, "no such file")
      else if ((pflags & FlagExcl) != 0 && Files.exists(p))
        status(id, FxFailure, "file exists")
      else if (Files.isDirectory(p))
        status(id, FxFailure, "is a directory")
      else {
        val mode = if ((pflags & FlagWrite) != 0) "rw" else "r"
        val f = new RandomAccessFile(p.toFile, mode)
        if ((pflags & FlagTrunc) != 0) f.setLength(0L)
        frame(FxpHandle, new W().u32(id).str(newHandle(f)).bytes)
      }
    case FxpClose =>
      val key = new String(r.str(), "UTF-8")
      handles.remove(key) match {
        case Some(f: RandomAccessFile) => f.close(); status(id, FxOk, "ok")
        case Some(_) => status(id, FxOk, "ok")
        case None => status(id, FxFailure, "stale handle")
      }
    case FxpRead =>
      val f = lookup[RandomAccessFile](r.str())
      val offset = r.u64()
      val len = math.min(r.u32(), 1L << 20).toInt
      if (offset >= f.length()) status(id, FxEof, "eof")
      else {
        f.seek(offset)
        val buf = new Array[Byte](math.min(len.toLong, f.length() - offset).toInt)
        f.readFully(buf)
        frame(FxpData, new W().u32(id).str(buf).bytes)
      }
    case FxpWrite =>
      val f = lookup[RandomAccessFile](r.str())
      val offset = r.u64()
      val data = r.str()
      f.seek(if (chaos == "write-at-zero") 0L else offset)
      f.write(data)
      status(id, FxOk, "ok")
    case FxpOpendir =>
      val p = resolve(r.strUtf8())
      if (!Files.isDirectory(p)) status(id, FxNoSuchFile, "not a directory")
      else {
        val entries = {
          val s = Files.list(p)
          try s.iterator().asScala.toVector.sortBy(_.getFileName.toString)
          finally s.close()
        }
        frame(FxpHandle, new W().u32(id).str(newHandle(new DirState(entries))).bytes)
      }
    case FxpReaddir =>
      val d = lookup[DirState](r.str())
      if (d.cursor >= d.entries.length) status(id, FxEof, "eof")
      else {
        val batch = d.entries.slice(d.cursor, d.cursor + 100)
        d.cursor += batch.length
        val w = new W().u32(id).u32(batch.length.toLong)
        batch.foreach { p =>
          w.str(p.getFileName.toString).str(longnameOf(p)).raw(attrsOf(p))
        }
        frame(FxpName, w.bytes)
      }
    case FxpRemove =>
      val p = resolve(r.strUtf8())
      if (!Files.exists(p) || Files.isDirectory(p)) status(id, FxNoSuchFile, "no such file")
      else { Files.delete(p); status(id, FxOk, "ok") }
    case FxpMkdir =>
      val p = resolve(r.strUtf8())
      if (Files.exists(p)) status(id, FxFailure, "file exists")
      else { Files.createDirectory(p); status(id, FxOk, "ok") }
    case FxpRmdir =>
      val p = resolve(r.strUtf8())
      if (!Files.isDirectory(p)) status(id, FxNoSuchFile, "not a directory")
      else { Files.delete(p); status(id, FxOk, "ok") }
    case FxpRename =>
      val from = resolve(r.strUtf8())
      val to = resolve(r.strUtf8())
      if (!Files.exists(from)) status(id, FxNoSuchFile, "no such file")
      else if (Files.exists(to)) status(id, FxFailure, "target exists") // v3 semantics
      else { Files.move(from, to); status(id, FxOk, "ok") }
    case FxpExtended =>
      r.strUtf8() // extension name — none supported
      status(id, FxOpUnsupported, "extension not supported")
    case other =>
      status(id, FxOpUnsupported, s"unsupported request type $other")
  }

  private def applyAttrs(p: Path, r: R): Unit = {
    val attrs = SftpSource.readAttrs(r)
    attrs.size.foreach { sz =>
      val f = new RandomAccessFile(p.toFile, "rw")
      try f.setLength(sz) finally f.close()
    }
  }
}
