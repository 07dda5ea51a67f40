package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming layer — the net-new streaming surface (SURVEY
  * §2.3: the reference has no watermarks/event-time; its closest analogs
  * are the watchdog file-sync pipeline S31 and the DiskCache transfer
  * state S30, both subsumed by checkpointed streaming below).
  *
  * Scale: file-source streams shard by file; stateful operators shuffle
  * once on the group key and keep per-key state in the state store
  * (RocksDB-backed on a real cluster) — no driver-side state, unlike the
  * reference's in-memory progress dict.
  */
object StreamingJobs {

  /** S31 analog — incremental file-watch migration: each trigger picks up
    * only files not yet recorded in the checkpoint (exactly-once per
    * file), transforms, appends to the sink. `Trigger.AvailableNow`
    * drains the backlog then stops — the cron-style incremental copy the
    * reference runs with `condition` pushdown + DiskCache state.
    */
  def incrementalFileCopy(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      format: String,
      dstDir: String,
      checkpointDir: String,
      transform: DataFrame => DataFrame = identity,
      backupWindow: Option[BackupWindow] = None,
  ): Option[StreamingQuery] = {
    val gated = backupWindow.exists(_.blocksNow())
    if (gated) None
    else Some(
      transform(spark.readStream.schema(schema).format(format).load(srcDir))
        .writeStream
        .format("parquet")
        .option("path", dstDir)
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .outputMode(OutputMode.Append())
        .start())
  }

  /** Backup-hour gating for the incremental sync — the reference skips
    * its file sync within ± `durationHours` of a configured daily
    * backup instant (`d22d/pipline/__init__.py:73-95`:
    * `send_data_check`), so a copy never races the DB backup. Same
    * fail-open contract: a malformed or out-of-range `startTime`
    * means "never block" (the reference reaches the same outcome via
    * its catch-all except — `datetime.replace` raises on hour > 23).
    * One deliberate divergence: the reference only tests the SAME-DAY
    * backup instant, so a window straddling midnight never blocks on
    * the far side (backup 00:30 ± 2h does not block at 23:00 — the
    * exact race the gate exists to prevent); here yesterday's and
    * tomorrow's instants are tested too, which subsumes the same-day
    * behavior. `now` is injectable for tests; production uses the
    * wall clock.
    */
  final case class BackupWindow(
      startTime: String, // "HH:MM" of the daily backup
      durationHours: Int,
      now: () => java.time.LocalDateTime = () => java.time.LocalDateTime.now(),
  ) {
    def blocksNow(): Boolean =
      startTime.split(":") match {
        case Array(h, m) =>
          (h.toIntOption, m.toIntOption) match {
            case (Some(hh), Some(mm)) if hh >= 0 && hh < 24 && mm >= 0 && mm < 60 =>
              val t = now()
              val backup = t.withHour(hh).withMinute(mm).withSecond(0).withNano(0)
              Seq(backup.minusDays(1), backup, backup.plusDays(1)).exists(b =>
                b.isAfter(t.minusHours(durationHours.toLong)) &&
                  b.isBefore(t.plusHours(durationHours.toLong)))
            case _ => false // fail-open (reference: ValueError → except → send)
          }
        case _ => false // fail-open, as the reference does
      }
  }

  /** Streaming corpus cleaning — the ingest-time twin of the batch
    * quality/PII operators (q71/q72): per-row repetition + quality
    * filters and PII redaction are STATELESS Column expressions, so the
    * exact same logic runs in a `readStream` micro-batch with no state
    * store at all — the batch/stream unification Spark's model buys.
    * Filters: ≥ `minWords` words, top-word fraction ≤ `maxTopWordFrac`;
    * then emails/IPs/phones are redacted in place.
    */
  def cleanDocumentStream(
      docs: DataFrame, // needs doc_id: long, text: string
      minWords: Int = 5,
      maxTopWordFrac: Double = 0.5,
  ): DataFrame =
    docs
      .withColumn("__w", graft.operators.TextPrims.words(col("text")))
      .withColumn("n_words", size(col("__w")))
      .filter(col("n_words") >= minWords &&
        graft.operators.TextPrims.topWordCount("__w").cast("double") / col("n_words") <= maxTopWordFrac)
      .withColumn("text", graft.operators.PipelineOps.redactPii(col("text")))
      .drop("__w")

  /** Streaming incremental dedup — the streaming twin of batch q78:
    * only documents whose content fingerprint is NOT already in the
    * static corpus pass through, via a stream-static LEFT ANTI join.
    * The static side is a plain DataFrame (the corpus fingerprint
    * table, re-read per micro-batch if backed by files — swap in a
    * Delta/Iceberg snapshot on a real cluster); no streaming state is
    * held at all, so the operator's memory is O(1) regardless of
    * stream length — corpus membership lives in the join, not the
    * state store.
    */
  def streamingNovelDocs(
      docs: DataFrame, // streaming; needs text: string
      corpusFingerprints: DataFrame, // static; one column fp: string
  ): DataFrame =
    docs.withColumn("fp", md5(col("text")))
      .join(corpusFingerprints, Seq("fp"), "left_anti")

  /** Watermarked tumbling-window aggregation — the streaming shape of the
    * q15 daily rollup. Late events beyond the watermark are dropped;
    * windows finalize (Append) once the watermark passes window end.
    */
  def windowedEventCounts(
      events: DataFrame, // needs ts: timestamp, event_type: string, value: double
      watermarkDelay: String = "1 hour",
      windowLength: String = "1 day",
  ): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Session windows via the built-in `session_window` (30-min gap): the
    * streaming twin of the batch gaps-and-islands query q42.
    */
  def sessionWindowCounts(
      events: DataFrame,
      gap: String = "30 minutes",
      watermarkDelay: String = "1 hour",
  ): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("sess_start"), col("w.end").as("sess_end"), col("n_events"))

  /** Streaming dedup (P4's streaming twin): drop duplicate keys with
    * bounded state — `dropDuplicatesWithinWatermark` expires state once
    * the watermark passes, so memory is bounded by the dedup horizon,
    * not the stream's lifetime.
    */
  def streamingDedup(
      events: DataFrame, // needs ts + the key columns
      keys: Seq[String],
      watermarkDelay: String = "1 hour",
  ): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-stream interval join (the streaming twin of the q38 funnel):
    * purchases within `horizon` after a view by the same user. Both
    * sides carry watermarks so the join state expires — bounded memory;
    * the time-bound condition is what makes stream-stream inner joins
    * feasible at all.
    */
  def streamingFunnel(
      views: DataFrame, // user_id, ts
      purchases: DataFrame, // user_id, ts
      watermarkDelay: String = "10 minutes",
      horizon: String = "5 minutes",
  ): DataFrame = {
    val v = views.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val p = purchases.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    v.join(p,
      col("v_user") === col("p_user") &&
        col("p_ts") > col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr(s"INTERVAL $horizon"))
  }

  /** Streaming keyed upsert into a [[graft.core.Connector]] sink via
    * foreachBatch — each micro-batch applies InsertIgnore/Replace
    * semantics (the reference's INSERT IGNORE default under retry,
    * made exactly-once-ish by checkpoint + idempotent keyed writes).
    */
  def streamingUpsert(
      source: DataFrame,
      sink: graft.core.Connector,
      index: String,
      mode: graft.core.WriteMode,
      checkpointDir: String,
  ): StreamingQuery =
    source.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        sink.write(batch.toDF(), index, mode)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  // ---- streaming MinHash-LSH near-dup candidates (flatMapGroupsWithState) ----

  case class BandHit(doc_id: Long, band: Int, bkey: String)
  case class BucketState(first_id: Long)
  case class DupCandidate(doc_id: Long, band: Int, bkey: String, dup_of: Long)

  /** Map-only MinHash banding for a document stream: the per-doc
    * signature needs no aggregation at all — 16 `array_min(transform)`
    * expressions over the shingle array (same salted-md5/32-bit-chunk
    * family as batch q21, so stream and batch bucket IDENTICALLY and a
    * doc can be checked against either index). Stateless, codegen'd,
    * runs unchanged on batch or streaming frames.
    */
  def lshBands(docs: DataFrame): DataFrame = {
    import graft.operators.TextPrims
    // every salt/chunk/band constant comes from TextPrims — the ONE
    // definition of the family shared with batch q21 and its oracle
    def perm(i: Int): String =
      s"array_min(transform(__sh, s -> ${TextPrims.minhashPermSql(i, "s")}))"
    val rpb = TextPrims.minhashRowsPerBand
    val bandStructs = (0 until TextPrims.MinhashBands).map { b =>
      val key = TextPrims.minhashBandKey((0 until rpb).map(r => col(s"m${b * rpb + r}")))
      struct(lit(b).as("band"), key.as("bkey"))
    }
    docs
      .withColumn("__w", TextPrims.words(col("text")))
      .filter(size(col("__w")) >= 3)
      .withColumn("__sh", array_distinct(TextPrims.shingles3(col("__w"))))
      .select(col("doc_id") +:
        (0 until TextPrims.MinhashPerms).map(i => expr(perm(i)).as(s"m$i")): _*)
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bkey").as("bkey"))
  }

  /** Streaming near-dup candidate filter — the streaming twin of q21's
    * LSH stage: each arriving document's 4 band buckets are checked
    * against keyed state holding the FIRST document ever seen in that
    * bucket; later arrivals are emitted as (doc, dup_of) candidates for
    * exact verification downstream. State is one long per non-empty
    * bucket, partitioned by (band, bkey) in the state store
    * (RocksDB-backed on a real cluster); with `stateTtl` set it expires
    * after that much processing-time inactivity, so memory is bounded
    * by the dedup horizon, not stream lifetime — the same discipline as
    * [[streamingDedup]]. (`stateTtl = None` keeps state forever —
    * for tests and short-lived backfills; a perpetual ingest should
    * always set the TTL.)
    */
  def streamingLshCandidates(
      docs: DataFrame, // streaming; needs doc_id: long, text: string
      stateTtl: Option[String] = Some("1 hour"),
  ): Dataset[DupCandidate] = {
    import docs.sparkSession.implicits._
    val timeoutConf = if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    lshBands(docs).as[BandHit]
      .groupByKey(h => (h.band, h.bkey))
      .flatMapGroupsWithState[BucketState, DupCandidate](
        OutputMode.Append(), timeoutConf) {
        case ((band, bkey), hits, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = hits.toSeq.sortBy(_.doc_id)
            if (sorted.isEmpty) Iterator.empty
            else {
              val first = state.getOption.map(_.first_id).getOrElse(sorted.head.doc_id)
              state.update(BucketState(first))
              stateTtl.foreach(state.setTimeoutDuration)
              sorted.iterator.filter(_.doc_id != first)
                .map(h => DupCandidate(h.doc_id, band, bkey, first))
            }
          }
      }
  }

  /** Incremental corpus build — the production composition of the
    * streaming layer: per micro-batch, (1) quality-clean + redact
    * ([[cleanDocumentStream]] semantics already applied upstream by the
    * caller or here), (2) drop exact duplicates of the existing corpus
    * (md5 anti-join — the corpus IS the state, no state store), (3)
    * drop LSH near-dup candidates against both the corpus and
    * lower-id docs of the same batch (bucket-level, recall-oriented:
    * same q21 band family; run the exact-verify offline if precision
    * matters), (4) append survivors to the corpus directory. Restart
    * safety comes from the checkpoint (a replayed batch re-drops its
    * own docs via the exact filter). At scale the corpus side is a
    * parquet/Delta snapshot re-read per batch — membership lives in
    * the join, bounded by corpus size on disk, not memory.
    */
  def incrementalCorpusBuild(
      docs: DataFrame, // streaming; needs doc_id: long, text: string
      corpusDir: String,
      checkpointDir: String,
  ): StreamingQuery =
    cleanDocumentStream(docs).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val batchDf = batch.toDF()
        // only a MISSING corpus dir means "first batch" — any other read
        // failure (transient FS error, corrupt footer) must fail the
        // batch loudly, or dedup would be silently skipped for it
        val corpus =
          try Some(spark.read.parquet(corpusDir))
          catch {
            case e: org.apache.spark.sql.AnalysisException
              if e.getCondition == "PATH_NOT_FOUND" => None
          }
        // exact novelty vs corpus
        val novel = corpus match {
          case Some(c) =>
            batchDf.withColumn("__fp", md5(col("text")))
              .join(c.select(md5(col("text")).as("__fp")), Seq("__fp"), "left_anti")
              .drop("__fp")
          case None => batchDf
        }
        // LSH bucket-level near-dup: vs corpus, then vs lower-id batch docs.
        // persist, NOT localCheckpoint: the bands are consumed three
        // times, but they are a pure deterministic function of the
        // replayable batch source + corpus parquet, so lineage-keeping
        // persist recomputes lost blocks identically after a real
        // executor death — truncated localCheckpoint lineage cannot
        // (round-10 soak class, same fix as TextDedup.scala:924-930)
        val newBands = lshBands(novel).persist()
        try {
        val dupVsCorpus = corpus match {
          case Some(c) => newBands
            .join(lshBands(c).select(col("band").as("b2"), col("bkey").as("k2")),
              col("band") === col("b2") && col("bkey") === col("k2"), "left_semi")
            .select(col("doc_id")).distinct()
          case None => spark.emptyDataFrame.select(lit(0L).as("doc_id")).limit(0)
        }
        val dupInBatch = newBands.toDF("a_id", "band", "bkey")
          .join(newBands.toDF("b_id", "band2", "bkey2"),
            col("band") === col("band2") && col("bkey") === col("bkey2") &&
              col("b_id") < col("a_id"))
          .select(col("a_id").as("doc_id")).distinct()
        novel.join(dupVsCorpus.union(dupInBatch).distinct(), Seq("doc_id"), "left_anti")
          .write.mode("append").parquet(corpusDir)
        } finally newBands.unpersist(false)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Versioned-snapshot state discipline shared by the stateful
    * foreachBatch jobs ([[scd2ApplyStream]], [[incrementalSpanScrub]],
    * [[heavyHittersStream]], [[dsirScoreStream]], [[psiDriftStream]],
    * [[semanticDedupStream]]): versions are `dir/v<batchId>`
    * subdirectories; a batch may read only versions STRICTLY OLDER
    * than itself — a replayed batch must re-read the same predecessor
    * it saw the first time, never its own half-written output — and
    * overwrites its own directory. ONE discovery implementation so the
    * streams' replay semantics cannot diverge.
    */
  private def versionsBefore(spark: SparkSession, dir: String, batchId: Long): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .flatMap(s => s.getPath.getName.stripPrefix("v").toLongOption
        .filter(_ => s.getPath.getName.startsWith("v")))
      .filter(_ < batchId).sorted
      .map(v => s"$dir/v$v")
  }

  private def latestVersionBefore(spark: SparkSession, dir: String, batchId: Long): Option[String] =
    versionsBefore(spark, dir, batchId).lastOption

  /** Default snapshot retention: the snapshot streams read only the
    * LATEST committed predecessor, so `retain = 1` is already correct;
    * 2 keeps one extra version of forensic headroom. Pass
    * `Int.MaxValue` to keep every version (replay archaeology/debug) —
    * state disk then grows by one full snapshot PER MICRO-BATCH,
    * unbounded, which is never what a production stream wants.
    */
  val DefaultRetainVersions = 2

  /** Default delta-compaction cadence ([[pruneBehindFullSnapshot]]):
    * every 8th batch folds the older deltas into a `_FULL` snapshot
    * and later batches prune the subsumed tail, bounding state dirs at
    * O(cadence). Pass 0 to disable (every delta kept forever —
    * unbounded; replay stays correct, disk does not).
    */
  val DefaultCompactEvery = 8

  /** Retention for SNAPSHOT-style state (each version is complete on
    * its own): delete all but the newest `retain` versions strictly
    * older than `batchId`. Safe because (a) when batch B runs, every
    * version < B is already checkpoint-committed — Spark replays at
    * most the latest uncommitted batch, so no batch < B will ever run
    * again — and (b) the snapshot streams read only the LATEST
    * strictly-older version, which any `retain >= 1` keeps. Without
    * pruning a long-running stream accumulates one full snapshot per
    * micro-batch forever; with it, state disk is O(retain × snapshot).
    * Runs at batch START so a replayed batch repeats the same
    * (idempotent) deletions before reading the same predecessor.
    * `retain < 1` is an ERROR (it would delete the predecessor a
    * replayed batch must re-read), not something to reinterpret.
    */
  private def pruneSnapshots(
      spark: SparkSession, dir: String, batchId: Long, retain: Int): Unit =
    if (retain != Int.MaxValue) {
      require(retain >= 1,
        s"retainVersions must be >= 1 (got $retain) — the latest committed " +
          "predecessor is load-bearing; use Int.MaxValue to keep every version")
      val older = versionsBefore(spark, dir, batchId)
      val doomed = older.dropRight(retain)
      if (doomed.nonEmpty) {
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        doomed.foreach(d => fs.delete(new org.apache.hadoop.fs.Path(d), true))
      }
    }

  /** Marker making a gram-delta version a FULL snapshot (it holds the
    * union of every delta up to and including its batch). Written only
    * after the parquet commit — a crash in between leaves an oversized
    * but correct delta that simply never triggers pruning.
    */
  private val FullMarker = "_FULL"

  /** Retention for DELTA-style state ([[incrementalSpanScrub]] gram
    * deltas, where correctness needs the UNION of older versions):
    * plain last-N pruning would lose grams, so compaction must come
    * first. Every `compactEvery`-th batch writes its version as the
    * union of all strictly-older deltas plus its own grams and marks
    * it [[FullMarker]]; any later batch may then delete versions
    * strictly older than the newest marked snapshot it can see (their
    * content is contained in it, and duplicates across the remaining
    * versions stay harmless — the consumer is a left-semi membership
    * join). Replay-safe for the same committed-predecessor reason as
    * [[pruneSnapshots]]: the newest full snapshot older than B is
    * committed, and a replayed B re-reads union(full .. B-1) which is
    * the complete index whether or not the pre-full tail still exists.
    */
  private def pruneBehindFullSnapshot(
      spark: SparkSession, dir: String, batchId: Long): Unit = {
    val older = versionsBefore(spark, dir, batchId)
    if (older.nonEmpty) {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val lastFull = older.lastIndexWhere(v =>
        fs.exists(new org.apache.hadoop.fs.Path(s"$v/$FullMarker")))
      if (lastFull > 0)
        older.take(lastFull).foreach(d =>
          fs.delete(new org.apache.hadoop.fs.Path(d), true))
    }
  }

  /** Streaming SCD2 apply — the q116 incremental merge driven by a CDC
    * stream: the stored SCD2 history is the state, each micro-batch
    * merges through [[graft.operators.ExtendedRelational.scd2Merge]]
    * (untouched keys pass through un-shuffled against broadcast
    * batch-derived sides; cost ∝ batch + touched-key history).
    *
    * State storage is a versioned snapshot under `historyDir/v<batchId>`:
    * each batch reads the LATEST version with id < its own batchId and
    * overwrites its own directory. That makes replay idempotent — a
    * restarted batch re-reads the same predecessor snapshot it saw the
    * first time and rewrites the same output, so exactly-once comes from
    * the checkpoint + deterministic merge, with no read-then-clobber
    * hazard on a single table path. This also holds on object stores
    * (round 12): version dirs are written fresh and never renamed over
    * live data, and no later batch exists to read v<B> until batch B's
    * foreachBatch completed and checkpoint-committed — a crash
    * mid-write strands a torn v<B> that only B's own replay ever
    * touches, by overwriting it. At 100 TB the same shape is a
    * Delta/Iceberg MERGE (their commit log is exactly this versioning);
    * plain parquet keeps the sandbox dependency-free. Batches are
    * assumed per-key time-ordered (CDC commit order); late events need
    * the q115 rebuild path.
    */
  def scd2ApplyStream(
      events: DataFrame, // streaming CDC: user_id, event_id, event_type, value, ts
      historyDir: String,
      checkpointDir: String,
      retainVersions: Int = DefaultRetainVersions, // see [[pruneSnapshots]]
  ): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        pruneSnapshots(spark, historyDir, batchId, retainVersions)
        val prev = latestVersionBefore(spark, historyDir, batchId)
        val batchDf = batch.toDF()
        val merged = prev match {
          case Some(p) =>
            graft.operators.ExtendedRelational.scd2Merge(
              spark.read.parquet(p),
              batchDf.withColumn("ts_us", unix_micros(col("ts"))))
          case None =>
            graft.operators.ExtendedRelational.scd2Versions(batchDf)
        }
        merged.write.mode("overwrite").parquet(s"$historyDir/v$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Continuous incremental MATERIALIZED-VIEW maintenance from the
    * change data feed (round 16) — the streaming consumer the feed
    * exists for: a keyed rollup (`n_rows` + `sum_<measure>` per key)
    * over a MERGE-maintained manifested table, refreshed per trigger
    * at O(changed rows), never a source scan. The caller starts it
    * against the table root; the source is
    * `readStream.format("graftmanifest").option("readChangeFeed")`,
    * so captured merges arrive as exact pre/post images, appends as
    * inserts, folds as nothing — inserts and postimages ADD
    * (+1, +measure), deletes and preimages SUBTRACT; sums and counts
    * are self-maintainable so the delta apply is exact in integer
    * arithmetic (a null measure contributes 0, matching SQL `sum`'s
    * null-skipping for any key that has at least one row).
    *
    * State is the view itself under the shared versioned-snapshot
    * discipline ([[pruneSnapshots]]): batch B reads the latest version
    * strictly older than B, applies its signed deltas, overwrites
    * `v<B>` — a replayed epoch re-reads the same committed predecessor
    * and converges to the same bytes, exactly-once without a ledger.
    * Read the current view with [[readMaterializedView]].
    *
    * At 100 TB this is the dashboard/feature-store refresh loop: the
    * alternative — recomputing the rollup per trigger — scans the
    * table every few seconds; this maintains it for the cost of the
    * rows that actually changed (SCALING §21 prices the gap).
    */
  def changeFeedViewMaintenance(
      spark: SparkSession,
      tableRoot: String,
      viewDir: String,
      key: String,
      measure: String,
      checkpointDir: String,
      retainVersions: Int = DefaultRetainVersions,
  ): StreamingQuery = {
    val feed = spark.readStream.format("graftmanifest")
      .option("readChangeFeed", "true").load(tableRoot)
    val sumCol = s"sum_$measure"
    feed.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val ss = batch.sparkSession
        pruneSnapshots(ss, viewDir, batchId, retainVersions)
        val prev = latestVersionBefore(ss, viewDir, batchId)
          .map(v => ss.read.parquet(v))
        val sgn = when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
          .otherwise(lit(-1L))
        val delta = batch.toDF()
          .groupBy(col(key))
          .agg(sum(sgn).as("__dn"),
            sum(coalesce(col(measure).cast("long"), lit(0L)) * sgn).as("__dm"))
        val merged = prev match {
          case None =>
            delta.select(col(key), col("__dn").as("n_rows"), col("__dm").as(sumCol))
          case Some(p) =>
            p.join(delta, Seq(key), "full_outer").select(
              col(key),
              (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
                .as("n_rows"),
              (coalesce(col(sumCol), lit(0L)) + coalesce(col("__dm"), lit(0L)))
                .as(sumCol))
        }
        // a key whose rows all left drops out, exactly as a re-grouped
        // rollup would
        merged.filter(col("n_rows") > 0)
          .write.mode("overwrite").parquet(s"$viewDir/v$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** The current state of a [[changeFeedViewMaintenance]] view: its
    * newest committed snapshot version (empty-schema-safe: an error if
    * no batch has committed yet — the stream owns the directory).
    */
  def readMaterializedView(spark: SparkSession, viewDir: String): DataFrame = {
    val latest = latestVersionBefore(spark, viewDir, Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"no committed view snapshot under $viewDir yet"))
    spark.read.parquet(latest)
  }

  /** Ingest-time span scrub — the streaming twin of q117/q118
    * ([[graft.operators.SpanOps]]): for each micro-batch of arriving
    * documents, localize the token spans covered by 5-grams ALREADY in
    * the corpus (verbatim repeats of what we have), so the cut list for
    * each new document is known at ingest instead of by corpus-wide
    * re-scan. Cost per batch ∝ batch grams semi-joined against the
    * stored gram index — never corpus × corpus.
    *
    * State is the corpus gram index as per-batch delta dirs
    * (`gramDir/v<batchId>` holding that batch's distinct grams), read
    * back as a union filtered to id < batchId. Same idempotent-replay
    * discipline as [[scd2ApplyStream]]: a replayed batch reads only
    * strictly-older deltas — crucially NOT its own half-written
    * output, which would make every gram of the batch "already known"
    * and flag whole documents as duplicated — and overwrites its own
    * two dirs. Span output mirrors the layout (`spansDir/v<batchId>`).
    * At 100 TB both stores are Delta/Iceberg tables and the delta-dir
    * bookkeeping is their commit log; duplicate grams across deltas
    * are harmless (semi-join membership), so no compaction is needed
    * for correctness — but without it per-batch read cost grows with
    * batch count, so `compactEvery = K` makes every K-th batch fold
    * the older deltas into its own version ([[FullMarker]]) and lets
    * later batches prune the tail ([[pruneBehindFullSnapshot]]).
    *
    * `minSpanWords` defaults to the batch policy's threshold
    * ([[graft.operators.SpanOps.MinDupSpan]]) so streamed and batch
    * cut lists agree: short incidental matches stay, long verbatim
    * repeats go.
    */
  def incrementalSpanScrub(
      docs: DataFrame, // streaming; needs doc_id: long, text: string
      gramDir: String,
      spansDir: String,
      checkpointDir: String,
      minSpanWords: Int = graft.operators.SpanOps.MinDupSpan,
      compactEvery: Int = DefaultCompactEvery, // 0 = never; see [[pruneBehindFullSnapshot]]
  ): StreamingQuery = {
    require(compactEvery >= 0,
      s"compactEvery must be >= 0 (got $compactEvery); 0 disables compaction")
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        if (compactEvery > 0) pruneBehindFullSnapshot(spark, gramDir, batchId)
        // persist, NOT localCheckpoint: grams are deterministic over the
        // replayable batch source, so lost blocks recompute identically
        // (round-10 soak class — see [[incrementalCorpusBuild]])
        val g = graft.operators.SpanOps.gramsOf(batch.toDF()).persist()
        try {
        val prevDeltas = versionsBefore(spark, gramDir, batchId)
        val occ = prevDeltas match {
          case Seq() => g.filter(lit(false)) // first batch: nothing to repeat
          case ds => g.join(spark.read.parquet(ds: _*), Seq("gram"), "left_semi")
        }
        graft.operators.SpanOps.spansOf(occ.select(col("doc_id"), col("pos")))
          .filter(col("span_words") >= minSpanWords)
          .write.mode("overwrite").parquet(s"$spansDir/v$batchId")
        // a compaction batch folds every older delta into its own
        // version (making it a full snapshot) so the NEXT batch may
        // prune the tail; otherwise per-batch read cost grows with
        // batch count even though correctness never depends on it
        val compacting = compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0
        val ownGrams = g.select(col("gram")).distinct()
        val delta =
          if (compacting && prevDeltas.nonEmpty)
            ownGrams.unionByName(spark.read.parquet(prevDeltas: _*)).distinct()
          else ownGrams
        delta.write.mode("overwrite").parquet(s"$gramDir/v$batchId")
        if (compacting) {
          val fs = new org.apache.hadoop.fs.Path(gramDir)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          fs.create(new org.apache.hadoop.fs.Path(
            s"$gramDir/v$batchId/$FullMarker"), true).close()
        }
        } finally g.unpersist(false)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** Streaming heavy hitters — the q122 Misra–Gries sketch maintained
    * across micro-batches: each batch is sketched distributed (the
    * [[graft.functions.MisraGriesAgg]] aggregate, partial-merged
    * across the batch's partitions), then folded into the stored
    * summary with the SAME [[graft.functions.MisraGriesAgg.mergeStates]]
    * the shuffle combine uses — mergeability is exactly what makes MG
    * a streaming-state-shaped sketch, and every MG theorem (two-sided
    * bounds, err·(m+1) ≤ n − Σ mass, >n/(m+1) guaranteed presence)
    * holds over the ACCUMULATED stream because the merge tree doesn't
    * care where the batch boundaries fell.
    *
    * The only driver-side data is the O(m) state pair being folded —
    * never batch rows. State storage follows the versioned-snapshot
    * discipline of [[scd2ApplyStream]]: `stateDir/v<batchId>`, read
    * strictly-older-than-self, so a replayed batch re-reads the same
    * predecessor and rewrites the same output (exactly-once from the
    * checkpoint + deterministic-per-merge-order fold).
    */
  def heavyHittersStream(
      items: DataFrame, // streaming; needs item: string
      m: Int,
      stateDir: String,
      checkpointDir: String,
      retainVersions: Int = DefaultRetainVersions, // see [[pruneSnapshots]]
  ): StreamingQuery =
    items.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        pruneSnapshots(spark, stateDir, batchId, retainVersions)
        val prev = latestVersionBefore(spark, stateDir, batchId)
        val batchState = batch.toDF()
          .agg(graft.functions.MisraGriesAgg.column(m)(col("item")).as("sk"))
          .select($"sk.counts", $"sk.err", $"sk.n").as[graft.functions.MGState]
          .head() // O(m) summary, not data
        val merged = prev match {
          case Some(p) =>
            val stored = spark.read.parquet(p).as[graft.functions.MGState].head()
            graft.functions.MisraGriesAgg.mergeStates(stored, batchState, m)
          case None => batchState
        }
        Seq(merged).toDS().write.mode("overwrite").parquet(s"$stateDir/v$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming distinct-count rollup — q130's sketch-as-data shape at
    * ingest time: state is ONE HLL sketch per group (event_type), a
    * few KB regardless of how many users ever arrive, maintained under
    * the shared versioned-snapshot discipline (strictly-older-than-
    * self replay, so a re-run batch cannot double-union itself — HLL
    * union is idempotent per VALUE, but the discipline keeps the state
    * lineage identical to the no-failure run, which is what the chaos
    * spec family asserts everywhere else). Each micro-batch sketches
    * its own rows (`hll_sketch_agg`, partial-merged across executors),
    * full-outer-joins the stored per-group sketches, scalar
    * `hll_union`s where both exist, and publishes the cumulative
    * estimate per group to `outDir/v<batchId>`.
    *
    * The batch twin is [[graft.operators.SketchOps.hllDistinctRollup]]
    * stage 2 verbatim; below register saturation (coupon regime) the
    * streamed estimate is EXACTLY the batch estimate — the parity
    * `HllDistinctStreamSpec` replays — and above it both sit inside
    * the same published bound.
    */
  def hllDistinctStream(
      events: DataFrame, // streaming; needs event_type: string, user_id: long
      stateDir: String,
      outDir: String,
      checkpointDir: String,
      retainVersions: Int = DefaultRetainVersions, // see [[pruneSnapshots]]; outDir is never pruned
      lgK: Int = 14,
  ): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        pruneSnapshots(spark, stateDir, batchId, retainVersions)
        val batchSk = batch.toDF()
          .groupBy(col("event_type"))
          .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sk_new"),
            count(lit(1)).as("n_new"))
        val stored = latestVersionBefore(spark, stateDir, batchId) match {
          case Some(p) => spark.read.parquet(p)
          case None =>
            spark.emptyDataFrame
              .select(lit("").as("event_type"), lit(null).cast("binary").as("sk"),
                lit(0L).as("n_events")).limit(0)
        }
        val merged = stored.join(batchSk, Seq("event_type"), "full_outer")
          .select(col("event_type"),
            when(col("sk").isNotNull && col("sk_new").isNotNull,
              hll_union(col("sk"), col("sk_new")))
              .otherwise(coalesce(col("sk"), col("sk_new"))).as("sk"),
            (coalesce(col("n_events"), lit(0L)) + coalesce(col("n_new"), lit(0L)))
              .as("n_events"))
        // state first, then report FROM the durable state version — not
        // localCheckpoint: truncated lineage is unrecoverable after a
        // real executor death (round-10 soak class), while the state
        // write was already mandatory, so the report costs one
        // O(groups) parquet re-read and survives any executor loss
        merged.write.mode("overwrite").parquet(s"$stateDir/v$batchId")
        spark.read.parquet(s"$stateDir/v$batchId")
          .select(col("event_type"), col("n_events"),
            hll_sketch_estimate(col("sk")).as("distinct_users"))
          .write.mode("overwrite").parquet(s"$outDir/v$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming quantile rollup — q133's KLL sketch-as-data shape at
    * ingest: state is ONE KLL(k=200) sketch per group, ~KBs bounded
    * by k·log(n/k) regardless of row count, under the shared
    * versioned-snapshot discipline (strictly-older-than-self replay —
    * KLL merge is NOT idempotent per value, so replay protection is
    * load-bearing here, not just lineage hygiene). Each micro-batch
    * sketches its own rows (`kll_sketch_agg_double`, partial-merged
    * across executors), full-outer-joins the stored per-group
    * sketches, scalar `kll_sketch_merge_double`s where both exist,
    * and publishes cumulative p50/p90/p99 estimates per batch.
    *
    * Batch twin: [[graft.operators.SketchOps.kllQuantileRollup]]'s
    * fold stage. While a group's total row count stays ≤ k the sketch
    * is in its exact regime (level 0 holds every value), so streamed
    * quantiles equal a plain percentile — the parity
    * `KllQuantileStreamSpec` replays; beyond k both carry the same
    * published rank-error bound.
    */
  def kllQuantileStream(
      events: DataFrame, // streaming; needs event_type: string, value: double
      stateDir: String,
      outDir: String,
      checkpointDir: String,
      retainVersions: Int = DefaultRetainVersions, // see [[pruneSnapshots]]; outDir is never pruned
      k: Int = 200,
  ): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        pruneSnapshots(spark, stateDir, batchId, retainVersions)
        val batchSk = batch.toDF()
          .groupBy(col("event_type"))
          .agg(expr(s"kll_sketch_agg_double(value, $k)").as("sk_new"),
            count(lit(1)).as("n_new"))
        val stored = latestVersionBefore(spark, stateDir, batchId) match {
          case Some(p) => spark.read.parquet(p)
          case None =>
            spark.emptyDataFrame
              .select(lit("").as("event_type"), lit(null).cast("binary").as("sk"),
                lit(0L).as("n_events")).limit(0)
        }
        val merged = stored.join(batchSk, Seq("event_type"), "full_outer")
          .select(col("event_type"),
            when(col("sk").isNotNull && col("sk_new").isNotNull,
              expr("kll_sketch_merge_double(sk, sk_new)"))
              .otherwise(coalesce(col("sk"), col("sk_new"))).as("sk"),
            (coalesce(col("n_events"), lit(0L)) + coalesce(col("n_new"), lit(0L)))
              .as("n_events"))
        // state first, report from the durable state version (see
        // [[hllDistinctStream]] — same no-localCheckpoint rationale;
        // doubly load-bearing here because KLL merge is NOT idempotent,
        // so a recompute-under-retry of a truncated lineage could
        // otherwise publish a different sketch than the state it wrote)
        merged.write.mode("overwrite").parquet(s"$stateDir/v$batchId")
        spark.read.parquet(s"$stateDir/v$batchId")
          .select(col("event_type"), col("n_events"),
            expr("kll_sketch_get_quantile_double(sk, 0.5)").as("p50"),
            expr("kll_sketch_get_quantile_double(sk, 0.9)").as("p90"),
            expr("kll_sketch_get_quantile_double(sk, 0.99)").as("p99"))
          .write.mode("overwrite").parquet(s"$outDir/v$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming DSIR — ingest-time importance scoring of arriving
    * documents against a FIXED target-domain corpus and the raw pool
    * seen so far: the q121 scorer
    * ([[graft.operators.CorpusOps.dsirSelect]]) with the raw-side
    * bucket counts maintained as streaming state. Each micro-batch is
    * scored with the weights as of the PREVIOUS batch (raw counts
    * strictly older than self — same replay discipline as
    * [[incrementalSpanScrub]]: a replayed batch must not see its own
    * grams in the pool, which would depress its own novelty), then its
    * bucket counts fold into the state.
    *
    * State is O(DsirBuckets) = 128 (bucket, rc) rows — the method's
    * whole point is that the model never grows with the corpus — so at
    * any scale the per-batch cost is the batch's gram explode + one
    * 128-row merge; the target side is bucket-counted once per batch
    * from its directory (cache it on a real cluster; it is static).
    * Bucket hashing and the smoothed log-ratio weight are the SHARED
    * `dsirBucket`/`dsirWeight` definitions — the batch query, this
    * stream and the DuckDB oracle cannot drift.
    */
  def dsirScoreStream(
      docs: DataFrame, // streaming; needs doc_id: long, text: string
      targetDir: String, // static parquet of target-domain docs (text)
      stateDir: String,
      outDir: String,
      checkpointDir: String,
      retainVersions: Int = DefaultRetainVersions, // see [[pruneSnapshots]]; outDir is never pruned
  ): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        pruneSnapshots(spark, stateDir, batchId, retainVersions)
        import graft.operators.{CorpusOps, TextPrims}
        val B = CorpusOps.DsirBuckets
        def buckets(d: DataFrame): DataFrame = d
          .select(d.columns.map(col) :+ TextPrims.words(col("text")).as("__w"): _*)
          .filter(size(col("__w")) >= 2)
          .select(d.columns.map(col) :+
            explode(TextPrims.bigrams(col("__w"))).as("__g"): _*)
          .select(d.columns.map(col) :+ CorpusOps.dsirBucket(col("__g")).as("b"): _*)
        // raw pool as of the PREVIOUS batch (empty on the first)
        val rawPrev = latestVersionBefore(spark, stateDir, batchId) match {
          case Some(p) => spark.read.parquet(p)
          case None => spark.range(0).select(col("id").as("b"), lit(0L).as("rc"))
        }
        val tgt = buckets(spark.read.parquet(targetDir).select(col("text")))
          .groupBy(col("b")).agg(count(lit(1)).as("tc"))
        // BOTH totals need the empty-input guard: a degenerate target
        // (no doc with >= 2 words) must yield finite smoothing-only
        // weights, not NULL scores for every document
        val tot = tgt.agg(coalesce(sum(col("tc")), lit(0L)).as("tt")).crossJoin(
          rawPrev.agg(coalesce(sum(col("rc")), lit(0L)).as("rt")))
        val wts = spark.range(B).select(col("id").as("b"))
          .join(tgt, Seq("b"), "left").join(rawPrev, Seq("b"), "left")
          .crossJoin(broadcast(tot))
          .select(col("b"),
            CorpusOps.dsirWeight(col("tc"), col("rc"), col("tt"), col("rt")).as("wt"))
        // persist, NOT localCheckpoint (consumed twice: score + fold):
        // the buckets are deterministic over the replayable batch
        // source, so lineage-keeping persist survives executor death
        // (round-10 soak class — see [[incrementalCorpusBuild]])
        val bk = buckets(batch.toDF()).persist()
        try {
          bk.join(broadcast(wts), "b")
            .groupBy(col("doc_id"))
            .agg(round(sum(col("wt")), 6).as("dsir_score"))
            .write.mode("overwrite").parquet(s"$outDir/v$batchId")
          // fold this batch's counts into the pool AFTER scoring
          val folded = rawPrev.select(col("b"), col("rc"))
            .unionByName(bk.groupBy(col("b")).agg(count(lit(1)).as("rc")))
            .groupBy(col("b")).agg(sum(col("rc")).as("rc"))
          folded.write.mode("overwrite").parquet(s"$stateDir/v$batchId")
        } finally bk.unpersist(false)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming semantic dedup — the q120 SemDeDup cluster-then-prune
    * recipe at ingest time: each micro-batch's vectors are assigned to
    * a FIXED k-means fit (the pinned `centroidsDir` model — write it
    * once with [[graft.operators.CorpusOps.fittedCentroids]]; ingest
    * never re-fits, so every batch sees the same cluster geometry) and
    * pruned against the per-cluster population of STRICTLY OLDER
    * batches plus lower-id batch-mates. The dup rule is q120's
    * verbatim: a vector is a duplicate iff some lower-id vector in the
    * SAME cluster reaches cosine τ, attributed to the LOWEST
    * qualifying partner — assignment and cosine ride the SHARED
    * [[graft.operators.CorpusOps.assignVectors]] /
    * [[graft.operators.TextPrims.cosineD]] definitions, so stream and
    * batch cannot drift. When vec_ids arrive in order (batch
    * boundaries cut the id-sorted corpus), the union of per-batch
    * reports is EXACTLY the batch q120 output — the parity the spec
    * replays; out-of-order ingest degrades gracefully to "dup vs any
    * lower-id vector seen so far".
    *
    * State is the seen (cid, vec_id, v) population as per-batch delta
    * dirs under the [[incrementalSpanScrub]] discipline: read
    * strictly-older-than-self (a replayed batch must not see its own
    * vectors, which would mark the whole batch duplicate), own delta
    * overwritten per batch, optional every-K compaction via
    * [[pruneBehindFullSnapshot]]. ALL batch vectors enter state — q120
    * compares against every lower-id vector, kept or not, so pruning
    * dup vectors from state would break chain attribution.
    *
    * Scale shape: centroids broadcast (model-sized); both dup joins
    * are cluster-keyed equi-joins — per-batch cost ∝ batch × cluster
    * density, never corpus × corpus; state reads partition-prune on
    * cid at 100 TB when the delta store is a cid-partitioned table. A
    * pathologically hot cluster gets q23's banding, same as batch.
    */
  def semanticDedupStream(
      vecs: DataFrame, // streaming; needs vec_id: long, v: array<double>
      centroidsDir: String, // static parquet (cid, cvec) — the pinned fit
      stateDir: String,
      outDir: String,
      checkpointDir: String,
      compactEvery: Int = DefaultCompactEvery, // 0 = never; see [[pruneBehindFullSnapshot]]
  ): StreamingQuery = {
    require(compactEvery >= 0,
      s"compactEvery must be >= 0 (got $compactEvery); 0 disables compaction")
    vecs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        import graft.operators.{CorpusOps, TextPrims}
        if (compactEvery > 0) pruneBehindFullSnapshot(spark, stateDir, batchId)
        val cents = spark.read.parquet(centroidsDir)
        // persist, NOT localCheckpoint (consumed four times): assignment
        // is deterministic over the replayable batch source + the pinned
        // centroid parquet, so lost blocks recompute identically
        // (round-10 soak class — see [[incrementalCorpusBuild]])
        val assigned = CorpusOps.assignVectors(
          batch.toDF().select(col("vec_id"), col("v")), cents).persist()
        try {
        val prevDeltas = versionsBefore(spark, stateDir, batchId)
        val state = prevDeltas match {
          case Seq() => assigned.select(col("cid"),
            col("vec_id").as("b_id"), col("v").as("vb")).limit(0)
          case ds => spark.read.parquet(ds: _*)
            .select(col("cid"), col("vec_id").as("b_id"), col("v").as("vb"))
        }
        val a = assigned.select(col("cid"), col("vec_id").as("a_id"), col("v").as("va"))
        val inBatch = assigned.select(col("cid"),
          col("vec_id").as("b_id"), col("v").as("vb"))
        val tau = CorpusOps.semDedupTauShared
        val dups = a.join(state.unionByName(inBatch), Seq("cid"))
          .filter(col("b_id") < col("a_id"))
          // same native fused cosine as the batch twin (stream ≡ batch)
          .withColumn("cos", graft.functions.CosineSimilarity(col("va"), col("vb")))
          .filter(col("cos") >= tau)
          .groupBy(col("a_id"))
          .agg(min(struct(col("b_id"), col("cos"))).as("m"))
          .select(col("a_id").as("vec_id"), col("m.b_id").as("dup_of"),
            round(col("m.cos"), 6).as("dup_cos"))
        assigned.select(col("vec_id"), col("cid").as("cluster"))
          .join(dups, Seq("vec_id"), "left")
          .select(col("vec_id"), col("cluster"), col("dup_of").isNull.as("kept"),
            col("dup_of"), col("dup_cos"))
          .orderBy(col("vec_id"))
          .write.mode("overwrite").parquet(s"$outDir/v$batchId")
        // fold this batch into the seen population AFTER reporting; a
        // compaction batch folds the older deltas in too (full
        // snapshot, prunable tail — duplicates impossible: each vec_id
        // is written by exactly one batch)
        val own = assigned.select(col("cid"), col("vec_id"), col("v"))
        val compacting = compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0
        val delta =
          if (compacting && prevDeltas.nonEmpty)
            own.unionByName(spark.read.parquet(prevDeltas: _*))
          else own
        delta.write.mode("overwrite").parquet(s"$stateDir/v$batchId")
        if (compacting) {
          val fs = new org.apache.hadoop.fs.Path(stateDir)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          fs.create(new org.apache.hadoop.fs.Path(
            s"$stateDir/v$batchId/$FullMarker"), true).close()
        }
        } finally assigned.unpersist(false)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** Streaming PSI drift monitor — the q125 audit run continuously: a
    * numeric stream is binned against a FIXED reference population's
    * deciles, and each micro-batch emits the cumulative-to-date PSI
    * report (same schema as q125, so the same 0.1/0.25 thresholds
    * apply; an alerting sink just sums psi_term per version). State is
    * the cumulative per-bin count — TEN rows, the degenerate-small end
    * of the versioned-snapshot discipline — so the per-batch cost is
    * one binning pass over the batch plus a 10-row merge, at any
    * scale. Bins, smoothing and the PSI summand are the SHARED
    * `psiBin`/`psiRate`/`psiTerm` definitions; the reference cuts are
    * recomputed from its directory per batch (deterministic; cache on
    * a real cluster — the reference is static by definition).
    */
  def psiDriftStream(
      rows: DataFrame, // streaming; needs x: double
      referenceDir: String, // static parquet with column x
      stateDir: String,
      outDir: String,
      checkpointDir: String,
      retainVersions: Int = DefaultRetainVersions, // see [[pruneSnapshots]]; outDir is never pruned
  ): StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        pruneSnapshots(spark, stateDir, batchId, retainVersions)
        import graft.operators.PipelineOps
        val ref = spark.read.parquet(referenceDir).select(col("x"))
        val cuts = PipelineOps.psiCuts(ref, "x")
        def binCounts(d: DataFrame, as: String): DataFrame = d
          .crossJoin(broadcast(cuts))
          .withColumn("bin", PipelineOps.psiBin(col("x")))
          .groupBy(col("bin")).agg(count(lit(1)).as(as))
        val prevCnt = latestVersionBefore(spark, stateDir, batchId) match {
          case Some(p) => spark.read.parquet(p)
          case None => spark.range(0).select(col("id").as("bin"), lit(0L).as("cur_n"))
        }
        val cum = prevCnt
          .unionByName(binCounts(batch.toDF().select(col("x")), "cur_n"))
          .groupBy(col("bin")).agg(sum(col("cur_n")).as("cur_n"))
        // state first, report from the durable state version (see
        // [[hllDistinctStream]] — no localCheckpoint: the state write
        // was mandatory anyway and the re-read is ten rows)
        cum.write.mode("overwrite").parquet(s"$stateDir/v$batchId")
        val cumD = spark.read.parquet(s"$stateDir/v$batchId")
        val refCnt = binCounts(ref, "ref_n")
        val tot = refCnt.agg(sum(col("ref_n")).as("rt")).crossJoin(
          cumD.agg(coalesce(sum(col("cur_n")), lit(0L)).as("ct")))
        val rr = PipelineOps.psiRate(col("ref_n"), col("rt"))
        val cr = PipelineOps.psiRate(col("cur_n"), col("ct"))
        spark.range(10).select(col("id").as("bin"))
          .join(refCnt, Seq("bin"), "left").join(cumD, Seq("bin"), "left")
          .crossJoin(broadcast(tot))
          .select(col("bin"),
            coalesce(col("ref_n"), lit(0L)).as("ref_n"),
            coalesce(col("cur_n"), lit(0L)).as("cur_n"),
            round(rr, 6).as("ref_rate"), round(cr, 6).as("cur_rate"),
            round(PipelineOps.psiTerm(rr, cr), 6).as("psi_term"))
          .orderBy(col("bin"))
          .write.mode("overwrite").parquet(s"$outDir/v$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  // ---- custom state: running per-user counters (mapGroupsWithState) ----

  case class Evt(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
  case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state — the `KeyValueGroupedDataset.mapGroupsWithState`
    * escape hatch for logic session_window/agg can't express: a running
    * per-user accumulator, updated per micro-batch, emitted in Update
    * mode. State lives in the state store, partitioned by key.
    */
  def runningUserTotals(events: Dataset[Evt]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotals, UserTotals](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Evt], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          batch.foreach { e => n += 1; tot += e.value }
          val next = UserTotals(uid, n, math.rint(tot * 100) / 100)
          state.update(next)
          next
      }
  }
}
