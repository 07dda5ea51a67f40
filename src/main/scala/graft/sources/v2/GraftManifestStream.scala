package graft.sources.v2

import graft.core.{ManifestEntry, ManifestTable}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset => LegacyOffset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType

/** Manifested tables as a Structured Streaming SOURCE (round 14):
  * each micro-batch is the set of manifest entries that appeared since
  * the last processed commit — the commit log IS the changelog, so
  * incremental ingestion needs no file-listing diffs, no modification
  * times, and no reprocessing: one `resolve` names the new state, and
  * generation immutability guarantees the files behind an entry never
  * change after their commit.
  *
  * {{{
  *   spark.readStream.format("graftmanifest").load("/data/feed")
  * }}}
  *
  * Offsets are commit sequence numbers. Contract:
  *   - APPEND-ONLY tables (the connector/ManifestWrite append path,
  *     where every commit adds entries and retires none). A commit
  *     that RETIRES an entry (overwrite, upsert, compaction, erasure)
  *     fails the stream loudly — silently re-reading rewritten data
  *     would double-count and silently skipping it would drop rows;
  *     the user picks a semantics by restarting from scratch, exactly
  *     Delta's streaming-source stance without ignoreChanges.
  *   - the gc history window must cover stream lag: diffing seq A→B
  *     needs commit A's file, and `ManifestTable.gc(keepCommits)`
  *     retires old pointers. A gc'd start offset fails naming the
  *     retained versions and the knob, never guessing.
  *
  * Rate control (round-15 verdict task 2): without it a restart
  * against a weekend backlog replayed the WHOLE delta as one giant
  * batch — correct but the memory/latency shape no file-source user
  * expects. The source implements [[SupportsAdmissionControl]] — the
  * exact seam Spark's own FileStreamSource uses on the v1 `Source`
  * API — so the engine asks `latestOffset(start, ReadLimit)` instead
  * of `getOffset`, and the answer honors:
  *   - `maxCommitsPerTrigger`: at most N commits advance per batch;
  *   - `maxBytesPerTrigger`: commits accumulate until their NEW
  *     entries' recorded stats bytes reach the cap (at least one
  *     commit always, so the stream keeps progressing; pre-stats
  *     entries count 0 — the knob needs stats-bearing commits);
  * and [[SupportsTriggerAvailableNow]]: `Trigger.AvailableNow` pins
  * the drain target to the seq at start, then drains it in
  * rate-limited batches and stops — the multi-batch backlog catch-up
  * `Trigger.Once` could never express.
  *
  * Scale contract: latestOffset is one `_commits` listing + one small
  * read (plus, only when a rate cap is set, one read per retained
  * commit in the window); a batch reads exactly the newly committed
  * generations' bytes. State is the offset alone — Spark's checkpoint
  * carries it.
  */
final class GraftManifestSource(
    spark: SparkSession,
    path: String,
    format: String,
    options: Map[String, String],
    override val schema: StructType,
) extends Source with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val rootPath = new Path(path)
  private def fs: FileSystem =
    rootPath.getFileSystem(spark.sessionState.newHadoopConf())

  private val maxCommitsPerTrigger: Option[Int] =
    options.get("maxCommitsPerTrigger").map(_.trim.toInt)
  private val maxBytesPerTrigger: Option[Long] =
    options.get("maxBytesPerTrigger").map(_.trim.toLong)
  require(maxCommitsPerTrigger.forall(_ > 0) && maxBytesPerTrigger.forall(_ > 0),
    s"graftmanifest stream at $path: rate-control triggers must be positive " +
      s"(maxCommitsPerTrigger=$maxCommitsPerTrigger, maxBytesPerTrigger=$maxBytesPerTrigger)")

  /** Options forwarded to the per-batch file read — the rate-control
    * knobs are OURS, not the file format's.
    */
  private val readOptions: Map[String, String] =
    options -- Seq("maxCommitsPerTrigger", "maxBytesPerTrigger")

  private def seqOf(o: LegacyOffset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  private def seqOfV2(o: OffsetV2): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  /** Trigger.AvailableNow drain target: the newest committed seq at
    * prepare time. Commits landing after it belong to the next run.
    */
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = ManifestTable.resolve(fs, rootPath).map(_.seq)

  override def getDefaultReadLimit: ReadLimit = {
    val limits = maxCommitsPerTrigger.map(n => ReadLimit.maxFiles(n)).toSeq ++
      maxBytesPerTrigger.map(b => ReadLimit.maxBytes(b)).toSeq
    limits match {
      case Seq()    => ReadLimit.allAvailable()
      case Seq(one) => one
      case many     => ReadLimit.compositeLimit(many.toArray)
    }
  }

  override def reportLatestOffset(): OffsetV2 =
    ManifestTable.resolve(fs, rootPath).map(m => LongOffset(m.seq)).orNull

  /** The engine's admission-control ask (v1 Source seam: `start` is the
    * stored previous offset, or null before the first batch). Returns
    * the next batch's END offset — the newest committed seq, clamped by
    * the AvailableNow cap and the per-trigger rate caps. Returning
    * `start` unchanged means "no new batch".
    */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val startSeq = Option(start).map(seqOfV2).getOrElse(0L)
    val latest = ManifestTable.resolve(fs, rootPath).map(_.seq).getOrElse(return start)
    val target = math.min(latest, availableNowCap.getOrElse(Long.MaxValue))
    if (target <= startSeq) return start
    if (maxCommitsPerTrigger.isEmpty && maxBytesPerTrigger.isEmpty)
      return LongOffset(target)
    // Walk the retained VALID commits in (startSeq, target] oldest
    // first, taking them under the caps — always at least one, so a
    // cap smaller than one commit's bytes still progresses (the file
    // source's "at least one file" stance). Only commits that
    // VALIDATE are offset candidates: a torn husk never carried data
    // (the next commit's carry logic did), so skipping it skips
    // nothing. O(retained window) small reads, only when a cap is set.
    val versions = ManifestTable.versions(fs, rootPath)
      .filter(s => s > startSeq && s <= target).sorted
    if (versions.isEmpty) return start
    // parts already visible at the start offset: their entries are not
    // NEW bytes. A gc'd start offset is not failed HERE — getBatch
    // reports that contract break with its precise named error.
    var seenParts: Set[String] =
      (if (startSeq == 0) None else ManifestTable.resolveAt(fs, rootPath, startSeq))
        .map(_.entries.map(_.part).toSet).getOrElse(Set.empty)
    var end = -1L
    var taken = 0
    var bytes = 0L
    val it = versions.iterator
    var stop = false
    while (it.hasNext && !stop) {
      val v = it.next()
      val m = ManifestTable.resolveAt(fs, rootPath, v).getOrElse {
        stop = true // raced a gc between versions() and here: stop at what we have
        null
      }
      if (m != null) {
        val newEntries = m.entries.filterNot(e => seenParts.contains(e.part))
        val newBytes = newEntries.flatMap(_.stats).map(_.len).sum
        if (end >= 0 && maxBytesPerTrigger.exists(bytes + newBytes > _)) stop = true
        else {
          end = v; taken += 1; bytes += newBytes
          seenParts ++= m.entries.map(_.part)
          if (maxCommitsPerTrigger.exists(taken >= _) ||
            maxBytesPerTrigger.exists(bytes >= _)) stop = true
        }
      }
    }
    if (end < 0) start else LongOffset(end)
  }

  private def manifestAt(seq: Long) =
    ManifestTable.resolveAt(fs, rootPath, seq).getOrElse(
      throw new IllegalStateException(
        s"graftmanifest stream at $path: commit $seq is no longer retained " +
          s"(retained: [${ManifestTable.versions(fs, rootPath).mkString(", ")}]) — " +
          "the stream lagged past the gc history window; gc streamed tables " +
          "with keepCommits covering the worst-case lag, or restart the stream"))

  override def getOffset: Option[LegacyOffset] =
    ManifestTable.resolve(fs, rootPath).map(m => LongOffset(m.seq))

  override def getBatch(start: Option[LegacyOffset], end: LegacyOffset): DataFrame = {
    val endM = manifestAt(seqOf(end))
    val startEntries: Map[String, ManifestEntry] = start match {
      case None => Map.empty
      case Some(s) => manifestAt(seqOf(s)).entries.map(e => e.part -> e).toMap
    }
    // append-only = every start entry survives IDENTICALLY (an
    // overwrite/upsert reuses the "" part key with a NEW dir, so a
    // name-set diff alone would miss it — compare whole entries)
    val endByPart = endM.entries.map(e => e.part -> e).toMap
    val retired = startEntries.collect {
      case (p, e) if !endByPart.get(p).contains(e) => p
    }
    if (retired.nonEmpty)
      throw new IllegalStateException(
        s"graftmanifest stream at $path: commits ${start.map(seqOf)}..${seqOf(end)} " +
          s"RETIRED or rewrote entries [${retired.toSeq.sorted.take(5).mkString(", ")}] — " +
          "this source streams APPEND-ONLY tables; an overwrite/upsert/compaction " +
          "rewrote data mid-stream, restart the stream against the new state")
    val added: Seq[ManifestEntry] = endM.entries.filterNot(e => startEntries.contains(e.part))
    val paths = added.flatMap(e => ManifestTable.entryPaths(rootPath, e)).map(_.toString)
    val batch =
      if (paths.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else spark.read.format(format).schema(schema)
        .options(graft.core.FormatDefaults.read(format) ++ readOptions).load(paths: _*)
    // the engine asserts isStreaming on what getBatch returns — re-tag
    // the batch rows the way FileStreamSource does
    org.apache.spark.sql.graft.Bridge.asStreamingFrame(spark, batch, schema)
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftManifestSource[$path]"
}

/** Manifested tables as a streaming SINK (round 14): each micro-batch
  * lands as one immutable generation + one pointer commit, and the
  * batch id is carried IN the generation name (`g-b<batchId>-…`) — so
  * a replayed batch (post-crash restart re-offers the last epoch) is
  * detected from the manifest itself and skipped, giving exactly-once
  * output with no side ledger. Append mode commits an additive entry;
  * Complete mode retires the previous state under the optimistic
  * `expectedSeq` discipline (data written once, only the pointer
  * retries). The table is readable mid-stream by every batch/SQL
  * reader and IS a valid upstream for [[GraftManifestSource]] in
  * Append mode — commit-log-chained pipelines end to end.
  */
final class GraftManifestSink(
    spark: SparkSession,
    path: String,
    format: String,
    options: Map[String, String],
    complete: Boolean,
) extends org.apache.spark.sql.execution.streaming.Sink {

  private val rootPath = new Path(path)
  private def fs: FileSystem =
    rootPath.getFileSystem(spark.sessionState.newHadoopConf())

  override def addBatch(batchId: Long, data: org.apache.spark.sql.DataFrame): Unit = {
    val marker = s"${ManifestTable.GenPrefix}b$batchId-"
    val replayed = ManifestTable.resolve(fs, rootPath)
      .exists(_.entries.exists(_.dir.startsWith(marker)))
    if (replayed) return // the epoch already committed before the crash
    val batch = org.apache.spark.sql.graft.Bridge.asBatchFrame(spark, data)
    val gen = marker + java.util.UUID.randomUUID().toString.take(8)
    batch.write.format(format)
      .options(graft.core.FormatDefaults.write(format) ++ options)
      .mode("error").save(new Path(rootPath, gen).toString)
    fs.delete(new Path(new Path(rootPath, gen), "_SUCCESS"), false)
    val genStats = ManifestTable.fileStats(fs, new Path(rootPath, gen))
    if (!complete) {
      ManifestTable.commit(fs, rootPath, "",
        Map(gen -> Some(ManifestEntry(gen, gen, Nil, genStats))))
      ()
    } else {
      // retire-all pointer flip, optimistic: data written once above
      var attempts = 0
      while (attempts < 10) {
        attempts += 1
        val base = ManifestTable.resolve(fs, rootPath)
        val retire = base.map(_.entries).getOrElse(Nil)
          .map(e => e.part -> (None: Option[ManifestEntry])).toMap
        try {
          ManifestTable.commit(fs, rootPath, "",
            retire + (gen -> Some(ManifestEntry(gen, gen, Nil, genStats))),
            expectedSeq = Some(base.map(_.seq).getOrElse(0L)))
          ManifestTable.gc(fs, rootPath)
          return
        } catch { case _: graft.core.ManifestStaleException => }
      }
      throw new java.io.IOException(
        s"graftmanifest sink at $path: complete-mode commit lost the optimistic " +
          "race 10 times — sustained concurrent-writer contention")
    }
  }

  override def toString: String = s"GraftManifestSink[$path]"
}
