package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Write side of the manifested-table surface (round 14): every save
  * mode lands as an immutable `g-*` generation plus ONE pointer commit
  * — the same discipline [[FileConnector]] applies to its remote
  * tables and [[graft.operators.StorageOps]] to its layouts, exposed
  * for direct `df.write.format("graftmanifest")` use (see
  * [[graft.sources.v2.GraftManifestDataSource]]).
  *
  *   - Overwrite: the new data (optionally `partitionBy(partCol)`)
  *     lands in a fresh generation; one commit retires every previous
  *     entry — resolved, or adopted in place from a plain layout so
  *     pre-manifest files stay gc-able. Readers flip between complete
  *     states. The commit is CONDITIONAL on the snapshot whose entries
  *     it retires ([[ManifestTable.commit]] `expectedSeq`) and
  *     re-derives its retire set on staleness — an interleaved
  *     writer's entry is never half-carried into the overwritten
  *     state. Only the pointer loop retries; the generation is written
  *     once.
  *   - Append: unpartitioned appends commit the fresh generation as an
  *     ADDITIVE entry — no read-modify-write, no staleness to check
  *     (the carry logic preserves interleaved entries). PARTITIONED
  *     appends (round 18) replace each touched partition's entry with
  *     one holding the new files plus the previous files BY REFERENCE
  *     (`carry`) — zero data movement, CAS-guarded because the carry
  *     set is derived from a snapshot.
  *   - ErrorIfExists / Ignore: existence = a resolvable manifest or a
  *     non-empty directory, checked before any bytes move.
  *
  * Scale contract: identical to every other manifest writer — the
  * commit is one small PUT regardless of data size; a crash leaves the
  * previous state live plus an unreferenced generation the next gc
  * sweeps.
  */
object ManifestWrite {

  private val MaxAttempts = 10

  /** Test seam: between an append's generation write and its commit —
    * the window a concurrent schema-evolving append or rename lands in
    * (round-18 ADVICE CAS spec). Production no-op.
    */
  @volatile private[graft] var beforeAppendCommit: () => Unit = () => ()

  def write(df: DataFrame, root: String, partCol: String, mode: SaveMode,
      format: String = "parquet", options: Map[String, String] = Map.empty): Unit = {
    val spark = df.sparkSession
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    // statsCols (round 16, Delta's statsCols analog): aim the envelope
    // budget at NAMED columns instead of the first 12 — persisted in
    // the manifest header so every later writer (compaction, merge,
    // the streaming sink) keeps the same coverage. Omitted = carry the
    // table's current choice; given = set it for this and future commits.
    val statsColsOpt: Option[Seq[String]] =
      options.get("statsCols").map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    def tableStatsCols: Seq[String] = statsColsOpt.getOrElse(
      ManifestTable.resolve(fs, rootPath).map(_.statsCols).getOrElse(Nil))
    def exists: Boolean = ManifestTable.resolve(fs, rootPath).isDefined ||
      (fs.exists(rootPath) && fs.listStatus(rootPath).exists { s =>
        val n = s.getPath.getName
        !n.startsWith("_") && !n.startsWith(".") && !n.startsWith(ManifestTable.GenPrefix)
      })
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"graftmanifest: $root already holds a table (mode ErrorIfExists)")
      case SaveMode.Ignore if exists => ()
      case SaveMode.Append =>
        // Partitioned append (round 18, the TableCatalog INSERT INTO
        // path): each appended partition's new entry holds the fresh
        // generation's files PLUS the partition's previous files BY
        // REFERENCE (the round-16 `carry` vocabulary) — zero data
        // rewrite, one pointer commit. The carry is a read-modify-write
        // of the touched entries, so partitioned appends are ALWAYS
        // CAS-guarded and re-derive their carries on staleness;
        // unpartitioned appends stay purely additive (gen-keyed entry).
        //
        // column mapping (round 17): a mapped table's appends stamp the
        // ids (and register new columns with fresh ids — additive
        // evolution); a FRESH append-created parquet table gets a
        // mapping at birth; legacy (pre-mapping) tables stay id-less.
        //
        // Concurrency (round-18 ADVICE, medium): an append whose extend
        // CHANGED the mapping commits CAS-guarded (`expectedSeq`) — two
        // concurrent schema-evolving appends would otherwise both
        // extend from the same base and assign the SAME fresh id to
        // DIFFERENT columns, the second commit silently rebinding the
        // first's files to the wrong logical column; and a rename/drop
        // landing in the window would be silently reverted. On
        // staleness the mapping is re-extended against the fresh state;
        // if the ids this append's files were stamped with no longer
        // match, the generation is REWRITTEN with the fresh stamps
        // (footer ids are physical — they cannot be patched by
        // metadata). An append that does not change the mapping commits
        // cols=None (carry forward) with no CAS — purely additive.
        val freshTable = !exists
        // ids the frame's columns would carry under a mapping — the
        // footer-physical part of the commit; equality here means the
        // already-written generation is still correct under `cs`
        def stampIds(cs: Seq[ColMapEntry]): Map[String, Option[Int]] =
          df.schema.fieldNames.filterNot(_ == partCol).map(n =>
            n -> cs.find(e => !e.dropped && e.logical == n).map(_.id)).toMap
        var base: Option[Manifest] = resolveOrAdopt(fs, rootPath, partCol)
        var gen: String = null
        var stamped: Seq[ColMapEntry] = Nil
        var attempts = 0
        while (attempts < MaxAttempts) {
          attempts += 1
          val curCols = base.map(_.cols).getOrElse(Nil)
          val colsOpt: Option[Seq[ColMapEntry]] =
            if (format != "parquet") None
            else if (curCols.nonEmpty) Some(ManifestColumns.extend(curCols, df.schema, partCol))
            else if (base.isEmpty && freshTable) Some(ManifestColumns.assign(df.schema, partCol))
            else None
          val mappingChanged = colsOpt.exists(_ != curCols)
          val want = colsOpt.getOrElse(Nil)
          if (gen == null || stampIds(want) != stampIds(stamped)) {
            if (gen != null) fs.delete(new Path(rootPath, gen), true)
            val outDf = if (want.isEmpty) df else ManifestColumns.stamp(df, want, partCol)
            gen = writeGeneration(outDf, fs, rootPath, partCol, format, options)
            stamped = want
          }
          val updates: Map[String, Option[ManifestEntry]] =
            if (partCol.isEmpty)
              // additive entry keyed by the generation name — unique per
              // append, never colliding with the "" overwrite entry
              Map(gen -> Some(ManifestEntry(gen, gen, Nil,
                ManifestTable.fileStats(fs, new Path(rootPath, gen), tableStatsCols))))
            else {
              val genPath = new Path(rootPath, gen)
              val partDirs =
                if (!fs.exists(genPath)) Nil
                else fs.listStatus(genPath).toSeq
                  .filter(s => s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
              if (partDirs.isEmpty) { fs.delete(genPath, true); return } // empty append
              val refsByPart: Map[String, Seq[FileRef]] = base.map(b =>
                ManifestTable.liveFileRefs(fs, rootPath, b).groupBy(_.part))
                .getOrElse(Map.empty)
              partDirs.map { s =>
                val p = s.getPath.getName.substring(partCol.length + 1)
                val carried = refsByPart.getOrElse(p, Nil).map(r =>
                  r.stat.map(st => st.copy(name = r.rootRel))
                    .getOrElse(FileStat(r.rootRel, r.len)))
                p -> Some(ManifestEntry(p, s"$gen/${s.getPath.getName}", Nil,
                  ManifestTable.fileStats(fs, s.getPath, tableStatsCols), Nil, carried))
              }.toMap
            }
          ManifestWrite.beforeAppendCommit()
          try {
            ManifestTable.commit(fs, rootPath, partCol, updates,
              expectedSeq =
                if (partCol.nonEmpty || mappingChanged) Some(base.map(_.seq).getOrElse(0L))
                else None,
              statsCols = statsColsOpt,
              cols = if (mappingChanged) colsOpt else None)
            return
          } catch {
            case _: ManifestStaleException =>
              base = ManifestTable.resolve(fs, rootPath)
          }
        }
        throw new java.io.IOException(
          s"graftmanifest: schema-evolving append at $root lost the optimistic-commit " +
            s"race $MaxAttempts times — sustained concurrent mapping churn")
      case _ => // Overwrite, or first write under ErrorIfExists/Ignore
        // column mapping (round 17): a full rewrite is the identity
        // reset — fresh ids in column order (this is also the
        // documented UPGRADE path for legacy/adopted tables: after an
        // Overwrite, renames and drops are metadata-only)
        val colsOpt: Option[Seq[ColMapEntry]] =
          if (format == "parquet") Some(ManifestColumns.assign(df.schema, partCol))
          else Some(Nil)
        val outDf = colsOpt.filter(_.nonEmpty)
          .fold(df)(cs => ManifestColumns.stamp(df, cs, partCol))
        val gen = writeGeneration(outDf, fs, rootPath, partCol, format, options)
        val entries = genEntries(fs, rootPath, gen, partCol, tableStatsCols)
        var attempts = 0
        while (attempts < MaxAttempts) {
          attempts += 1
          val base = resolveOrAdopt(fs, rootPath, partCol)
          val retire = base.map(_.entries).getOrElse(Nil)
            .map(e => e.part -> (None: Option[ManifestEntry])).toMap
          try {
            ManifestTable.commit(fs, rootPath, partCol,
              retire ++ entries.map(e => e.part -> Some(e)).toMap,
              expectedSeq = Some(base.map(_.seq).getOrElse(0L)),
              statsCols = statsColsOpt, cols = colsOpt)
            ManifestTable.gc(fs, rootPath)
            return
          } catch {
            case _: ManifestStaleException => // re-derive the retire set only
          }
        }
        throw new java.io.IOException(
          s"graftmanifest: overwrite at $root lost the optimistic-commit race " +
            s"$MaxAttempts times — sustained concurrent-writer contention")
    }
  }

  /** Partition-scoped overwrite (round 18 — SQL
    * `INSERT OVERWRITE … PARTITION(partCol=v)` via the catalog): ONE
    * commit replaces the `targeted` partitions' entries with the fresh
    * generation's files (a targeted partition absent from `df` is
    * dropped — overwritten to empty); untouched partitions are carried
    * by the commit protocol, byte-identical. CAS-guarded like every
    * read-modify-write commit; column-mapped tables stamp ids exactly
    * like append.
    */
  def overwritePartitions(df: DataFrame, root: String, partCol: String,
      targeted: Set[String], format: String = "parquet",
      options: Map[String, String] = Map.empty): Unit = {
    require(partCol.nonEmpty, "overwritePartitions needs a partitioned table")
    require(targeted.nonEmpty, "overwritePartitions: empty partition set")
    val spark = df.sparkSession
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    def stampIds(cs: Seq[ColMapEntry]): Map[String, Option[Int]] =
      df.schema.fieldNames.filterNot(_ == partCol).map(n =>
        n -> cs.find(e => !e.dropped && e.logical == n).map(_.id)).toMap
    var base: Manifest = resolveOrAdopt(fs, rootPath, partCol).getOrElse(
      throw new IllegalArgumentException(
        s"overwritePartitions: no manifested table at $root"))
    val statsCols = base.statsCols
    var gen: String = null
    var stamped: Seq[ColMapEntry] = Nil
    var attempts = 0
    while (attempts < MaxAttempts) {
      attempts += 1
      val colsOpt: Option[Seq[ColMapEntry]] =
        if (format != "parquet" || base.cols.isEmpty) None
        else Some(ManifestColumns.extend(base.cols, df.schema, partCol))
      val mappingChanged = colsOpt.exists(_ != base.cols)
      val want = colsOpt.getOrElse(Nil)
      if (gen == null || stampIds(want) != stampIds(stamped)) {
        if (gen != null) fs.delete(new Path(rootPath, gen), true)
        val outDf = if (want.isEmpty) df else ManifestColumns.stamp(df, want, partCol)
        gen = writeGeneration(outDf, fs, rootPath, partCol, format, options)
        stamped = want
      }
      val genPath = new Path(rootPath, gen)
      val written: Map[String, ManifestEntry] =
        (if (!fs.exists(genPath)) Nil
        else fs.listStatus(genPath).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith(partCol + "=")))
          .map { s =>
            val p = s.getPath.getName.substring(partCol.length + 1)
            p -> ManifestEntry(p, s"$gen/${s.getPath.getName}", Nil,
              ManifestTable.fileStats(fs, s.getPath, statsCols))
          }.toMap
      val stray = written.keySet -- targeted
      require(stray.isEmpty,
        s"overwritePartitions at $root: the frame holds partitions outside the " +
          s"targeted set (${stray.toSeq.sorted.take(3).mkString(", ")}…) — a static " +
          s"PARTITION overwrite may only write its own partitions")
      val updates: Map[String, Option[ManifestEntry]] =
        targeted.map(p => p -> written.get(p)).toMap
      try {
        ManifestTable.commit(fs, rootPath, partCol, updates,
          expectedSeq = Some(base.seq),
          cols = if (mappingChanged) colsOpt else None)
        ManifestTable.gc(fs, rootPath): Unit
        return
      } catch {
        case _: ManifestStaleException =>
          base = ManifestTable.resolve(fs, rootPath).getOrElse(
            throw new IllegalStateException(s"table at $root vanished mid-overwrite"))
      }
    }
    throw new java.io.IOException(
      s"overwritePartitions at $root lost the optimistic-commit race $MaxAttempts times")
  }

  /** One immutable generation under `root`, written once. A frame
    * whose schema carries field-id metadata (column mapping) is
    * written through a private cloned session with parquet field-id
    * writing pinned ON — never by flipping the caller's shared conf
    * (the round-16 conf-race lesson).
    */
  private def writeGeneration(df: DataFrame, fs: FileSystem, root: Path,
      partCol: String, format: String, options: Map[String, String]): String = {
    val gen = ManifestTable.GenPrefix + java.util.UUID.randomUUID().toString.take(8)
    val genPath = new Path(root, gen)
    val bound =
      if (!df.schema.fields.exists(_.metadata.contains(ManifestColumns.FieldIdKey))) df
      else {
        val ws = org.apache.spark.sql.graft.Bridge.cloneSession(df.sparkSession)
        ws.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
        org.apache.spark.sql.graft.Bridge.ofRows(ws, df.queryExecution.analyzed)
      }
    val w = bound.write.format(format).options(FormatDefaults.write(format) ++ options)
      .mode(SaveMode.ErrorIfExists)
    (if (partCol.isEmpty) w else w.partitionBy(partCol)).save(genPath.toString)
    fs.delete(new Path(genPath, "_SUCCESS"), false)
    gen
  }

  /** The generation's manifest entries: per-partition for a
    * partitioned write (one `partCol=value` child each), one
    * whole-directory entry otherwise.
    */
  private def genEntries(fs: FileSystem, root: Path, gen: String,
      partCol: String, statsCols: Seq[String]): Seq[ManifestEntry] =
    if (partCol.isEmpty)
      Seq(ManifestEntry("", gen, Nil,
        ManifestTable.fileStats(fs, new Path(root, gen), statsCols)))
    else {
      val parts = fs.listStatus(new Path(root, gen)).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
      require(parts.nonEmpty,
        s"graftmanifest: partitioned write produced no $partCol= partitions " +
          s"(empty input frame?) — an empty manifested table is not representable")
      parts.map { s =>
        val value = s.getPath.getName.substring(partCol.length + 1)
        // the writer just produced these files; recording (name, len)
        // now is what lets every future read skip listing entirely
        ManifestEntry(value, s"$gen/${s.getPath.getName}", Nil,
          ManifestTable.fileStats(fs, s.getPath, statsCols))
      }
    }

  /** Current committed state, adopting a plain layout in place when one
    * exists (so its files are retire-able/gc-able); None for a fresh or
    * generation-debris-only target.
    */
  private def resolveOrAdopt(fs: FileSystem, root: Path, partCol: String): Option[Manifest] =
    ManifestTable.resolve(fs, root).orElse {
      val children = if (fs.exists(root)) fs.listStatus(root).toSeq else Nil
      val visible = children.filterNot { s =>
        val n = s.getPath.getName
        n.startsWith("_") || n.startsWith(".") || n.startsWith(ManifestTable.GenPrefix)
      }
      val adoptable =
        if (partCol.isEmpty) visible.exists(_.isFile) && !visible.exists(_.isDirectory)
        else visible.nonEmpty && visible.forall(s =>
          s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
      if (adoptable) Some(ManifestTable.adoptIfPlain(fs, root, partCol)) else None
    }
}
