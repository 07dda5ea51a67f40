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
  *     Delta's streaming-source stance without ignoreChanges. The one
  *     retirement that does NOT break the contract (round 15) is a
  *     sink FOLD of parts this stream already read: the fold entry's
  *     `covers` proves it is the same rows repacked, so the diff skips
  *     it; a fold subsuming parts the stream never saw fails loudly
  *     ("fold horizon", mirroring the gc-window contract).
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
  * read of the newest commit; with a rate cap set, each NEW commit in
  * the window is read once EVER (round 16: commits are immutable, so
  * parsed ones are LRU-cached across triggers and getBatch — the
  * per-trigger O(retained-window) re-read round 15 disclosed is gone,
  * MemFs open-count spec-proven). A batch reads exactly the newly
  * committed generations' bytes. State is the offset alone — Spark's
  * checkpoint carries it.
  */
final class GraftManifestSource(
    spark: SparkSession,
    path: String,
    format: String,
    options: Map[String, String],
    override val schema: StructType,
    cdf: Boolean = false,
) extends Source with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  /** CDF mode: `schema` carries the two tag columns; the files
    * themselves are read with the data schema.
    */
  private val dataSchema: StructType =
    if (cdf) StructType(schema.fields.dropRight(2)) else schema

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
    options -- Seq("maxCommitsPerTrigger", "maxBytesPerTrigger", "readChangeFeed")

  private def seqOf(o: LegacyOffset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  private def seqOfV2(o: OffsetV2): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  /** Parsed-commit cache (round-16 verdict task 4): a commit file is
    * immutable once valid, so the rate-capped walk re-reading the
    * whole retained window every trigger was pure waste — this LRU
    * keyed by seq drops the steady-state per-trigger cost to one read
    * of each NEW commit (MemFs open-count spec-proven). Only Some
    * results are cached: a None may be an in-flight husk whose bytes
    * land a moment later (non-atomic-create stores), and caching it
    * would skip a valid commit forever. Bounded well above any real
    * retained window.
    */
  private val commitCache =
    new java.util.LinkedHashMap[java.lang.Long, graft.core.Manifest](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[java.lang.Long, graft.core.Manifest]): Boolean =
        size() > 512
    }

  private def cachedResolveAt(seq: Long): Option[graft.core.Manifest] =
    commitCache.synchronized {
      Option(commitCache.get(Long.box(seq))).orElse {
        val m = ManifestTable.resolveAt(fs, rootPath, seq)
        m.foreach(commitCache.put(Long.box(seq), _))
        m
      }
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
    val latestM = ManifestTable.resolve(fs, rootPath).getOrElse(return start)
    // the newest commit was just parsed — seed the cache so getBatch
    // (and the next trigger's walk) never re-reads it
    commitCache.synchronized { commitCache.put(Long.box(latestM.seq), latestM); () }
    val latest = latestM.seq
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
    // ONE listing + cache-validated reads: ManifestTable.versions()
    // re-reads every retained commit to validate it, per call — the
    // O(window)-per-trigger cost the round-16 cache exists to remove.
    // A valid commit validates once, ever; a torn husk (rare,
    // in-flight) is re-checked next trigger and skipped meanwhile.
    val versions = ManifestTable.commitSeqs(fs, rootPath)
      .filter(s => s > startSeq && s <= target).sorted
      .filter(s => cachedResolveAt(s).isDefined)
    if (versions.isEmpty) return start
    // parts already visible at the start offset: their entries are not
    // NEW bytes. A gc'd start offset is not failed HERE — getBatch
    // reports that contract break with its precise named error.
    var seenParts: Set[String] =
      (if (startSeq == 0) None else cachedResolveAt(startSeq))
        .map(_.entries.map(_.part).toSet).getOrElse(Set.empty)
    var end = -1L
    var taken = 0
    var bytes = 0L
    val it = versions.iterator
    var stop = false
    while (it.hasNext && !stop) {
      val v = it.next()
      val m = cachedResolveAt(v).getOrElse {
        stop = true // raced a gc between the listing and here: stop at what we have
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
    cachedResolveAt(seq).getOrElse(
      throw new IllegalStateException(
        s"graftmanifest stream at $path: commit $seq is no longer retained " +
          s"(retained: [${ManifestTable.versions(fs, rootPath).mkString(", ")}]) — " +
          "the stream lagged past the gc history window; gc streamed tables " +
          "with keepCommits covering the worst-case lag, or restart the stream"))

  override def getOffset: Option[LegacyOffset] =
    ManifestTable.resolve(fs, rootPath).map(m => LongOffset(m.seq))

  override def getBatch(start: Option[LegacyOffset], end: LegacyOffset): DataFrame = {
    if (cdf) return getChangeBatch(start, end)
    val endM = manifestAt(seqOf(end))
    val startEntries: Map[String, ManifestEntry] = start match {
      case None => Map.empty
      case Some(s) => manifestAt(seqOf(s)).entries.map(e => e.part -> e).toMap
    }
    // append-only = every start entry survives IDENTICALLY (an
    // overwrite/upsert reuses the "" part key with a NEW dir, so a
    // name-set diff alone would miss it — compare whole entries)...
    // EXCEPT a FOLD (round 15): the sink repacks old micro-batch
    // generations into one compacted generation whose entry NAMES the
    // part keys it subsumed (`covers`). A retirement fully explained by
    // a fold of already-streamed parts is the same rows repacked — skip
    // both the retirement and the fold entry. A fold that subsumes
    // parts this stream NEVER saw individually cannot be separated back
    // out — the stream lagged past the fold horizon; fail loudly with
    // the knobs, the same stance as the gc history-window contract.
    val endByPart = endM.entries.map(e => e.part -> e).toMap
    if (start.isDefined) {
      val retired = startEntries.collect {
        case (p, e) if !endByPart.get(p).contains(e) => p
      }.toSet
      val newFolds = endM.entries.filter(e =>
        e.covers.nonEmpty && !startEntries.contains(e.part))
      val horizonBreaks = newFolds.filterNot(_.covers.forall(startEntries.contains))
      if (horizonBreaks.nonEmpty)
        throw new IllegalStateException(
          s"graftmanifest stream at $path: commits ${start.map(seqOf)}..${seqOf(end)} " +
            s"FOLDED generations this stream never read individually " +
            s"(${horizonBreaks.map(_.part).sorted.take(3).mkString(", ")}) — the stream " +
            "lagged past the fold horizon; raise the sink's foldBatches/recency margin " +
            "to cover worst-case lag, read with maxCommitsPerTrigger to step commit by " +
            "commit, or restart the stream")
      val coveredRetired = newFolds.flatMap(_.covers).toSet
      val genuinelyRetired = retired -- coveredRetired
      if (genuinelyRetired.nonEmpty) {
        // if the rewrite was change-captured (a merge with CDF), the
        // fix is a mode switch, not a restart — say so
        val captured = ManifestTable.commitSeqs(fs, rootPath)
          .filter(s => start.forall(o => s > seqOf(o)) && s <= seqOf(end))
          .exists(s => cachedResolveAt(s).exists(_.changes.nonEmpty))
        val hint = if (captured)
          "the rewrite IS change-captured — read it with " +
            "option(\"readChangeFeed\", \"true\") to consume row-level changes; or "
        else ""
        throw new IllegalStateException(
          s"graftmanifest stream at $path: commits ${start.map(seqOf)}..${seqOf(end)} " +
            s"RETIRED or rewrote entries [${genuinelyRetired.toSeq.sorted.take(5).mkString(", ")}] — " +
            s"this source streams APPEND-ONLY tables; ${hint}restart the stream " +
            "against the new state")
      }
    }
    val added: Seq[ManifestEntry] = endM.entries
      .filterNot(e => startEntries.contains(e.part))
      // folds of already-streamed parts are repacked old rows, not data
      .filterNot(e => start.isDefined && e.covers.nonEmpty)
    val paths = added.flatMap(e => ManifestTable.entryPaths(rootPath, e)).map(_.toString)
    val batch =
      if (paths.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else spark.read.format(format).schema(schema)
        .options(graft.core.FormatDefaults.read(format) ++ readOptions).load(paths: _*)
    // the engine asserts isStreaming on what getBatch returns — re-tag
    // the batch rows the way FileStreamSource does
    org.apache.spark.sql.graft.Bridge.asStreamingFrame(spark, batch, schema)
  }

  /** CDF-mode micro-batch (round 16): the union of each new version's
    * change rows — exact records for captured merges, synthesized
    * inserts for appends, nothing for folds, loud failure for
    * uncaptured rewrites ([[graft.core.ManifestChanges.forVersion]]).
    * Versions chain parent-to-child inside the batch, so a multi-commit
    * batch attributes every row to its `_commit_version`. This is how a
    * continuous pipeline survives a MERGE-maintained upstream: the
    * plain stream must fail on the rewrite, the change stream consumes
    * it.
    */
  private def getChangeBatch(start: Option[LegacyOffset], end: LegacyOffset): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val startSeq = start.map(seqOf).getOrElse(0L)
    val endSeq = seqOf(end)
    val vs = ManifestTable.commitSeqs(fs, rootPath)
      .filter(s => s > startSeq && s <= endSeq).sorted
      .flatMap(s => cachedResolveAt(s).map(s -> _))
    var parent: Option[graft.core.Manifest] =
      if (startSeq == 0) None else Some(manifestAt(startSeq))
    val frames = vs.flatMap { case (v, m) =>
      // initial load at a gc-truncated history: the first retained
      // version's record/diff is that COMMIT's delta, not the table —
      // emit the full state at v as inserts instead (a fresh table's
      // v=1 diffs against empty and needs no special case, but a
      // merge/fold can never be commit 1, so v != 1 here means
      // earlier commits existed and were gc'd)
      val f = (if (parent.isEmpty && startSeq == 0 && v != 1)
        graft.core.ManifestChanges.snapshotAsInserts(
          spark, fs, rootPath, m, Some(dataSchema), format, readOptions)
      else graft.core.ManifestChanges
        .forVersion(spark, fs, rootPath, m, parent, Some(dataSchema), format, readOptions))
        .map(_.withColumn(graft.core.ManifestChanges.CommitVersionCol, lit(v)))
      parent = Some(m)
      f
    }
    val batch =
      if (frames.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else frames.reduce(_ unionByName _)
        .select(schema.fieldNames.map(col).toSeq: _*)
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
  *
  * == Bounded metadata under continuous ingest (round-15 task 3) ==
  *
  * One generation per micro-batch grows manifest entries, small files
  * and commit pointers linearly with batch count forever. Two
  * mechanisms bound it, both on by default in Append mode:
  *
  *   - '''Tiered folding''' (`foldBatches`, default 16; 0 disables;
  *     min 2): when a tier holds `foldBatches` fold-able generations
  *     (tier 0 = `g-b*` micro-batches, tier t = `g-f<t>-*` folds),
  *     the OLDEST `foldBatches` of that tier are rewritten into ONE
  *     tier-(t+1) generation and retired in one optimistic commit
  *     whose new entry `covers` the subsumed part keys (how a
  *     concurrent [[GraftManifestSource]] distinguishes the repack
  *     from a contract-breaking rewrite). LSM discipline: each row is
  *     rewritten once per tier, so write amplification is
  *     O(log_K batches) and live generation count stays
  *     ≤ K·tiers + margin — bounded for any run length. Tier 0 keeps
  *     a 2-batch recency margin un-folded so the replay check always
  *     sees recent batch markers (covers carry them one fold deep;
  *     epoch replays only ever re-offer the last epoch).
  *   - '''Periodic gc''' (`gcEveryBatches`, default 16; 0 disables;
  *     `gcKeepCommits`, default 32): retires old commit pointers and
  *     the folded generations' bytes. `gcKeepCommits` bounds how far
  *     a downstream streaming reader may LAG (the gc-window contract)
  *     — size it to worst-case consumer downtime ÷ trigger interval.
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

  private val foldBatches: Int =
    options.get("foldBatches").map(_.trim.toInt).getOrElse(16)
  private val gcEveryBatches: Int =
    options.get("gcEveryBatches").map(_.trim.toInt).getOrElse(16)
  private val gcKeepCommits: Int =
    options.get("gcKeepCommits").map(_.trim.toInt).getOrElse(32)
  require(foldBatches == 0 || foldBatches >= 2,
    s"graftmanifest sink at $path: foldBatches must be 0 (disabled) or >= 2, got $foldBatches")
  require(gcEveryBatches >= 0 && gcKeepCommits >= 2,
    s"graftmanifest sink at $path: gcEveryBatches >= 0, gcKeepCommits >= 2 " +
      s"(got $gcEveryBatches / $gcKeepCommits)")

  /** Options forwarded to the per-generation file write — the
    * fold/gc knobs are the sink's, not the file format's.
    */
  private val writeOptions: Map[String, String] =
    options -- Seq("foldBatches", "gcEveryBatches", "gcKeepCommits")

  /** Tier 0 entries newer than this never fold — the epoch-replay
    * check reads batch markers from entry dirs and (one fold deep)
    * covers, and restarts only ever re-offer the last epoch.
    */
  private val FoldRecencyMargin = 2

  /** Fold output sizing: stats bytes per output file. */
  private val FoldTargetFileBytes = 128L * 1024 * 1024

  override def addBatch(batchId: Long, data: org.apache.spark.sql.DataFrame): Unit = {
    val marker = s"${ManifestTable.GenPrefix}b$batchId-"
    val resolved = ManifestTable.resolve(fs, rootPath)
    val replayed = resolved
      .exists(_.entries.exists(e =>
        e.dir.startsWith(marker) || e.covers.exists(_.startsWith(marker))))
    if (replayed) return // the epoch already committed before the crash
    val batch0 = org.apache.spark.sql.graft.Bridge.asBatchFrame(spark, data)
    // a COLUMN-MAPPED target (round 17: created via ManifestWrite,
    // streamed into here) keeps its field ids: stamp each batch and
    // write through a clone with field-id writing pinned on
    val mappedCols = resolved.map(_.cols).getOrElse(Nil)
    val batch =
      if (mappedCols.isEmpty) batch0
      else {
        val ws = org.apache.spark.sql.graft.Bridge.cloneSession(spark)
        ws.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
        org.apache.spark.sql.graft.Bridge.ofRows(ws,
          graft.core.ManifestColumns.stamp(batch0, mappedCols, "")
            .queryExecution.analyzed)
      }
    val gen = marker + java.util.UUID.randomUUID().toString.take(8)
    batch.write.format(format)
      .options(graft.core.FormatDefaults.write(format) ++ writeOptions)
      .mode("error").save(new Path(rootPath, gen).toString)
    fs.delete(new Path(new Path(rootPath, gen), "_SUCCESS"), false)
    val genStats = ManifestTable.fileStats(fs, new Path(rootPath, gen),
      resolved.map(_.statsCols).getOrElse(Nil))
    if (!complete) {
      ManifestTable.commit(fs, rootPath, "",
        Map(gen -> Some(ManifestEntry(gen, gen, Nil, genStats))))
      if (foldBatches >= 2) maybeFold()
      if (gcEveryBatches > 0 && batchId % gcEveryBatches == 0)
        // best-effort by contract: a gc failure leaves debris for the
        // next sweep, never fails (or un-succeeds) the committed batch
        try { ManifestTable.gc(fs, rootPath, keepCommits = gcKeepCommits); () }
        catch { case scala.util.control.NonFatal(_) => () }
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
          // best-effort AFTER the successful pointer flip (round-16
          // ADVICE): a transient gc failure must not fail a batch the
          // commit already landed — same contract as the Append path
          try { GraftManifestSink.afterCompleteCommit(); ManifestTable.gc(fs, rootPath); () }
          catch { case scala.util.control.NonFatal(_) => () }
          return
        } catch { case _: graft.core.ManifestStaleException => }
      }
      throw new java.io.IOException(
        s"graftmanifest sink at $path: complete-mode commit lost the optimistic " +
          "race 10 times — sustained concurrent-writer contention")
    }
  }

  /** (tier, loBatch, hiBatch) of a fold-able entry: tier 0 = a
    * micro-batch generation `g-b<id>-…`, tier t = a fold generation
    * `g-f<t>-<lo>-<hi>-…`. Entries written by other paths (batch
    * appends, adopted files) are not the sink's to fold — None.
    */
  private def foldKey(e: ManifestEntry): Option[(Int, Long, Long)] = {
    val b = s"${ManifestTable.GenPrefix}b(\\d+)-.*".r
    val f = s"${ManifestTable.GenPrefix}f(\\d+)-(\\d+)-(\\d+)-.*".r
    e.dir match {
      case b(id) => Some((0, id.toLong, id.toLong))
      case f(t, lo, hi) => Some((t.toInt, lo.toLong, hi.toLong))
      case _ => None
    }
  }

  /** Tiered compaction after an append commit: while any tier holds
    * `foldBatches` foldable entries (tier 0 additionally keeps its
    * [[FoldRecencyMargin]] newest un-folded), rewrite that tier's
    * OLDEST `foldBatches` into one next-tier generation and swap the
    * entries in one optimistic commit (the fold's `covers` names the
    * subsumed part keys for concurrent streaming readers). The loop
    * cascades — a tier-1 fold can push tier 1 itself over the
    * threshold — and every rewrite moves each row up exactly one tier,
    * the LSM bound: O(log_K batches) write amplification, generation
    * count ≤ K per live tier. Failures follow the upsert discipline:
    * stale → sweep own generation, re-derive, retry (bounded); a
    * POST-commit failure with the live manifest referencing our
    * generation is success.
    */
  private def maybeFold(): Unit = {
    var attempts = 0
    while (attempts < 10) {
      attempts += 1
      val base = ManifestTable.resolve(fs, rootPath).getOrElse(return)
      val foldable = base.entries.flatMap(e => foldKey(e).map { case (t, lo, hi) =>
        (t, lo, hi, e)
      })
      val byTier = foldable.groupBy(_._1)
      val tier = byTier.keys.toSeq.sorted.find(t =>
        byTier(t).size >= foldBatches + (if (t == 0) FoldRecencyMargin else 0))
        .getOrElse(return)
      val victims = byTier(tier).sortBy(v => (v._2, v._3)).take(foldBatches)
      val lo = victims.map(_._2).min
      val hi = victims.map(_._3).max
      val entries = victims.map(_._4)
      val paths = entries.flatMap(e => ManifestTable.entryPaths(rootPath, e)).map(_.toString)
      val totalBytes = entries.flatMap(_.stats).map(_.len).sum
      val nFiles = math.max(1, math.ceil(totalBytes.toDouble / FoldTargetFileBytes).toInt)
      val gen = s"${ManifestTable.GenPrefix}f${tier + 1}-$lo-$hi-" +
        java.util.UUID.randomUUID().toString.take(8)
      val genPath = new Path(rootPath, gen)
      try {
        val folded = spark.read.format(format)
          .options(graft.core.FormatDefaults.read(format) ++ writeOptions)
          .load(paths: _*)
          .coalesce(nFiles)
        // mapped tables: inference carries the field ids in metadata;
        // the clone's conf keeps them in the fold's output footers
        val bound =
          if (base.cols.isEmpty) folded
          else {
            val ws = org.apache.spark.sql.graft.Bridge.cloneSession(spark)
            ws.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
            org.apache.spark.sql.graft.Bridge.ofRows(ws, folded.queryExecution.analyzed)
          }
        bound.write.format(format)
          .options(graft.core.FormatDefaults.write(format) ++ writeOptions)
          .mode("error").save(genPath.toString)
        fs.delete(new Path(genPath, "_SUCCESS"), false)
        val stats = ManifestTable.fileStats(fs, genPath, base.statsCols)
        ManifestTable.commit(fs, rootPath, "",
          entries.map(e => e.part -> (None: Option[ManifestEntry])).toMap +
            (gen -> Some(ManifestEntry(gen, gen, Nil, stats, entries.map(_.part)))),
          expectedSeq = Some(base.seq))
        // cascade: this fold may have pushed the next tier over
      } catch {
        case _: graft.core.ManifestStaleException =>
          fs.delete(genPath, true) // never committed; re-derive and retry
        case scala.util.control.NonFatal(e) =>
          val now = ManifestTable.resolve(fs, rootPath)
          val committedByUs = now.exists(_.entries.exists(en =>
            en.dir == gen || en.dir.startsWith(gen + "/")))
          if (!committedByUs) {
            val nowSeq = now.map(_.seq).getOrElse(0L)
            if (nowSeq == base.seq) throw e
            fs.delete(genPath, true)
          }
      }
    }
  }

  override def toString: String = s"GraftManifestSink[$path]"
}

/** Test seam (round 16): runs between the Complete-mode sink's
  * SUCCESSFUL retire-all commit and its gc — a failure there must read
  * as success (the pointer already flipped; the restart's marker check
  * skips the replayed epoch either way, this just spares the restart).
  * Production no-op.
  */
object GraftManifestSink {
  @volatile private[graft] var afterCompleteCommit: () => Unit = () => ()
}
