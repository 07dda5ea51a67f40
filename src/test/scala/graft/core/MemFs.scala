package graft.core

import java.io.{ByteArrayOutputStream, EOFException, FileNotFoundException, IOException}
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FSDataInputStream, FSDataOutputStream, FSInputStream, FileAlreadyExistsException, FileStatus, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Shared in-memory backing store for [[MemFs]] — one namespace per
  * JVM so every FileSystem instance (driver + local executor threads)
  * sees the same tree, the way all HDFS clients see one NameNode.
  */
object MemFsStore {
  final case class Entry(bytes: Array[Byte], isDir: Boolean, var mtime: Long)
  /** Normalized absolute path ("/a/b") → entry. Root "/" is implicit. */
  val entries = new java.util.concurrent.ConcurrentHashMap[String, Entry]()
  /** When false, setTimes throws like S3A — the object-store emulation
    * knob for the heartbeat-degradation spec. */
  @volatile var supportSetTimes: Boolean = true
  /** When true, `rename` loses its HDFS atomicity and becomes what
    * S3A actually executes: a per-object COPY (each destination object
    * appearing individually) followed by a per-object DELETE of the
    * source — a window in which readers observe src and dst both
    * present, partially populated. The round-12 object-store knob.
    * Env default `GRAFT_MEMFS_RENAME_AS_COPY=1` lets whole-gate mains
    * (`Test/runMain graft.Verify` with memfs artifact roots) run the
    * entire catalog on copy-rename semantics.
    */
  private val renameAsCopyDefault: Boolean =
    sys.env.get("GRAFT_MEMFS_RENAME_AS_COPY").contains("1")
  @volatile var renameAsCopy: Boolean = renameAsCopyDefault
  /** Crash injection for copy-rename mode: a countdown of per-object
    * copy steps across all renames; when it reaches zero the rename
    * throws mid-copy, stranding a partial destination AND the intact
    * source — the state a process crash (or S3A client death) leaves.
    * Negative = disabled. Once fired, [[renameCopyCrashed]] latches
    * and EVERY further rename throws until cleared — the process is
    * "dead", so task-level retries (spark.task.maxFailures=8) must
    * not quietly absorb the injection.
    */
  val renameCopyCrashAfter = new java.util.concurrent.atomic.AtomicInteger(-1)
  @volatile var renameCopyCrashed: Boolean = false
  /** When true, `create(overwrite = false)` loses HDFS's atomic name
    * reservation and becomes what a bare object store without
    * conditional PUT executes: a CHECK (does the key exist?) followed
    * later by PUTs of the bytes — with every partial write visible to
    * readers as a torn object, and two concurrent creators both able
    * to "win" the same key (last close overwrites). The round-13 knob
    * behind `TornCreateCommitSpec`: proves which manifest guarantee
    * degrades without atomic create (committer linearizability) and
    * which survives (reader safety via the sha-256 payload guard).
    */
  @volatile var nonAtomicCreate: Boolean = false
  /** Metadata-RPC counters (round 15): every `listStatus` /
    * `getFileStatus` increments — how `ManifestStatsSpec` proves a
    * stats-bearing manifest resolves with ZERO per-file listing calls
    * (each of these is a real round-trip on S3/HDFS).
    */
  val listStatusCalls = new java.util.concurrent.atomic.AtomicLong()
  val getFileStatusCalls = new java.util.concurrent.atomic.AtomicLong()
  val openCalls = new java.util.concurrent.atomic.AtomicLong()
  def resetCounters(): Unit = {
    listStatusCalls.set(0); getFileStatusCalls.set(0); openCalls.set(0)
  }
  def disarmCrash(): Unit = { renameCopyCrashAfter.set(-1); renameCopyCrashed = false }
  def clear(): Unit = {
    entries.clear(); supportSetTimes = true
    renameAsCopy = renameAsCopyDefault; nonAtomicCreate = false; disarmCrash()
    resetCounters()
  }

  private[core] def parentOf(key: String): String = {
    val i = key.lastIndexOf('/')
    if (i <= 0) "/" else key.substring(0, i)
  }
}

/** In-memory Hadoop [[FileSystem]] with HDFS rename/commit semantics —
  * the closest a no-egress single host gets to running the Pin artifact
  * root on a real shared filesystem (round-10 verdict task 2; no
  * hadoop-minicluster jar ships with the Spark binary distribution, so
  * MiniDFSCluster is unavailable here). Registered per test session via
  * `spark.hadoop.fs.memfs.impl = graft.core.MemFs`.
  *
  * Deliberate HDFS-isms (where the local FS is LAXER, so passing on
  * file:// alone would not prove the contract):
  *   - `rename(src, dst)` returns false when dst exists as a file, and
  *     moves src INTO dst when dst is an existing directory (the
  *     FileOutputCommitter's merge path); rename into a missing parent
  *     returns false;
  *   - `create(…, overwrite = false)` on an existing path throws
  *     [[FileAlreadyExistsException]];
  *   - `getFileStatus`/`listStatus` on a missing path throw
  *     [[FileNotFoundException]];
  *   - `delete(dir, recursive = false)` on a non-empty dir throws;
  *   - append is unsupported (HDFS-on-parquet never appends).
  *
  * The `supportSetTimes = false` knob makes `setTimes` throw, emulating
  * S3A's unsupported mtime mutation for the Pin heartbeat spec.
  */
class MemFs extends FileSystem {
  import MemFsStore._

  private var fsUri: URI = URI.create("memfs:///")
  private var workDir: Path = new Path("/work")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    fsUri = URI.create(
      s"memfs://${Option(name.getAuthority).getOrElse("shared")}")
    setConf(conf)
  }

  override def getScheme: String = "memfs"
  override def getUri: URI = fsUri
  // NOT makeQualified(workDir): makeQualified resolves relative paths
  // via getWorkingDirectory — infinite recursion. workDir is kept
  // absolute and qualified by hand.
  override def getWorkingDirectory: Path =
    new Path(fsUri.toString + workDir.toUri.getPath)
  override def setWorkingDirectory(p: Path): Unit =
    workDir = new Path("/" + p.toUri.getPath.dropWhile(_ == '/'))

  /** Normalized absolute path component of `f` ("/a/b"; root = "/"). */
  private def key(f: Path): String = {
    val p = makeQualified(f).toUri.getPath
    if (p.isEmpty || p == "/") "/"
    else if (p.endsWith("/")) p.dropRight(1)
    else p
  }

  private def status(k: String, e: Entry): FileStatus =
    new FileStatus(if (e.isDir) 0L else e.bytes.length.toLong, e.isDir, 1,
      128L * 1024 * 1024, e.mtime, new Path(fsUri.toString + k))

  override def getFileStatus(f: Path): FileStatus = {
    getFileStatusCalls.incrementAndGet()
    val k = key(f)
    if (k == "/") return new FileStatus(0L, true, 1, 0L, 0L, new Path(fsUri.toString + "/"))
    val e = entries.get(k)
    if (e == null) throw new FileNotFoundException(s"memfs: $k")
    status(k, e)
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    listStatusCalls.incrementAndGet()
    val k = key(f)
    val e = if (k == "/") Entry(Array.empty, isDir = true, 0L) else entries.get(k)
    if (e == null) throw new FileNotFoundException(s"memfs: $k")
    if (!e.isDir) Array(status(k, e))
    else {
      val prefix = if (k == "/") "/" else k + "/"
      import scala.jdk.CollectionConverters._
      entries.entrySet().asScala.toArray
        .filter { en =>
          val ek = en.getKey
          ek.startsWith(prefix) && !ek.substring(prefix.length).contains('/')
        }
        .sortBy(_.getKey)
        .map(en => status(en.getKey, en.getValue))
    }
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    var k = key(f)
    val chain = scala.collection.mutable.ArrayBuffer.empty[String]
    while (k != "/") {
      val e = entries.get(k)
      if (e != null && !e.isDir)
        throw new java.io.IOException(s"memfs: $k exists as a file")
      if (e == null) chain += k
      k = parentOf(k)
    }
    chain.foreach(c =>
      entries.putIfAbsent(c, Entry(Array.empty, isDir = true, System.currentTimeMillis())))
    true
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val k = key(f)
    val existing = entries.get(k)
    if (existing != null) {
      if (existing.isDir) throw new FileAlreadyExistsException(s"memfs: $k is a directory")
      if (!overwrite) throw new FileAlreadyExistsException(s"memfs: $k exists")
    }
    mkdirs(new Path(parentOf(k)), permission)
    val torn = nonAtomicCreate
    if (!overwrite && !torn) {
      // HDFS reserves the name ATOMICALLY at create time (zero-length
      // file visible while being written) — the primitive manifest
      // commits race on; a check-then-put would let two concurrent
      // committers both "win" the same sequence number
      val prev = entries.putIfAbsent(k, Entry(Array.empty, isDir = false,
        System.currentTimeMillis()))
      if (prev != null) throw new FileAlreadyExistsException(s"memfs: $k exists")
    }
    // nonAtomicCreate: the existence CHECK above (entries.get) is all
    // the exclusion a store without conditional PUT offers — no name
    // reservation, so a racing creator that also passed the check
    // coexists; last close wins the key
    val buf = new ByteArrayOutputStream()
    new FSDataOutputStream(new java.io.FilterOutputStream(buf) {
      // FilterOutputStream.write(b,off,len) loops single bytes; delegate
      override def write(b: Array[Byte], off: Int, len: Int): Unit = {
        buf.write(b, off, len)
        // torn mode: every partial write is immediately reader-visible
        if (torn)
          entries.put(k, Entry(buf.toByteArray, isDir = false, System.currentTimeMillis()))
      }
      // single-byte writes publish partials too — without this a
      // byte-by-byte writer (TornCreateCommitSpec's torn-pointer loop)
      // would leave the key ABSENT until close, so the spec's
      // sha-guard-rejects-a-partial-prefix assertions would only ever
      // exercise the file-missing fallback, never a real torn read
      override def write(b: Int): Unit = {
        buf.write(b)
        if (torn)
          entries.put(k, Entry(buf.toByteArray, isDir = false, System.currentTimeMillis()))
      }
      override def close(): Unit = {
        super.close()
        entries.put(k, Entry(buf.toByteArray, isDir = false, System.currentTimeMillis()))
      }
    }, statistics)
  }

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("memfs: append unsupported")

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    MemFsStore.openCalls.incrementAndGet()
    val k = key(f)
    val e = entries.get(k)
    if (e == null) throw new FileNotFoundException(s"memfs: $k")
    if (e.isDir) throw new IOException(s"memfs: $k is a directory")
    new FSDataInputStream(new MemFsInputStream(e.bytes))
  }

  /** HDFS rename semantics — see class doc. */
  override def rename(src: Path, dst: Path): Boolean = {
    val sk = key(src)
    val se = entries.get(sk)
    if (se == null) return false
    val dk0 = key(dst)
    val de = entries.get(dk0)
    val dk =
      if (de != null && de.isDir) (if (dk0 == "/") "" else dk0) + "/" + sk.substring(sk.lastIndexOf('/') + 1)
      else if (de != null) return false // dst exists as file
      else {
        val pk = parentOf(dk0)
        val pe = if (pk == "/") null else entries.get(pk)
        if (pk != "/" && (pe == null || !pe.isDir)) return false // missing parent
        dk0
      }
    if (entries.containsKey(dk)) return false
    if (sk == dk) return true
    import scala.jdk.CollectionConverters._
    val moves = entries.keySet().asScala.toSeq
      .filter(k2 => k2 == sk || k2.startsWith(sk + "/"))
      .sorted // parents before children, deterministic injection points
    if (renameAsCopy) {
      // S3A semantics: copy object-by-object (each copy individually
      // visible), then delete the sources — nothing about this is
      // atomic, and a crash mid-copy strands the partial destination
      moves.foreach { k2 =>
        if (renameCopyCrashed)
          throw new IOException("memfs: process already crashed (latched)")
        if (renameCopyCrashAfter.get() >= 0 &&
            renameCopyCrashAfter.getAndDecrement() == 0) {
          renameCopyCrashed = true
          throw new IOException(
            s"memfs: injected crash mid-copy-rename ($k2 of ${moves.size} objects)")
        }
        val e2 = entries.get(k2)
        if (e2 != null)
          entries.put(dk + k2.substring(sk.length),
            Entry(e2.bytes, e2.isDir, System.currentTimeMillis()))
      }
      moves.foreach(entries.remove)
    } else {
      // HDFS semantics: the whole subtree moves atomically
      moves.foreach { k2 =>
        val e2 = entries.remove(k2)
        if (e2 != null) entries.put(dk + k2.substring(sk.length), e2)
      }
    }
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val k = key(f)
    val e = entries.get(k)
    if (e == null) return false
    import scala.jdk.CollectionConverters._
    val doomed = entries.keySet().asScala.toSeq
      .filter(k2 => k2 == k || k2.startsWith(k + "/"))
    if (e.isDir && doomed.size > 1 && !recursive)
      throw new IOException(s"memfs: $k is a non-empty directory")
    doomed.foreach(entries.remove)
    true
  }

  override def setTimes(f: Path, mtime: Long, atime: Long): Unit = {
    if (!supportSetTimes)
      throw new UnsupportedOperationException("memfs: setTimes disabled (object-store emulation)")
    val e = entries.get(key(f))
    if (e == null) throw new FileNotFoundException(s"memfs: ${key(f)}")
    if (mtime >= 0) e.mtime = mtime
  }
}

/** Seekable in-memory input — parquet footer reads need positioned IO. */
private[core] class MemFsInputStream(bytes: Array[Byte]) extends FSInputStream {
  private var pos: Int = 0
  override def seek(p: Long): Unit = {
    if (p < 0 || p > bytes.length) throw new EOFException(s"seek $p of ${bytes.length}")
    pos = p.toInt
  }
  override def getPos: Long = pos.toLong
  override def seekToNewSource(targetPos: Long): Boolean = false
  override def read(): Int =
    if (pos >= bytes.length) -1 else { val b = bytes(pos) & 0xff; pos += 1; b }
  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (pos >= bytes.length) return -1
    val n = math.min(len, bytes.length - pos)
    System.arraycopy(bytes, pos, b, off, n)
    pos += n
    n
  }
  override def available(): Int = bytes.length - pos
}
