package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** One column of a manifested parquet table's COLUMN MAPPING (round-17
  * verdict task 7 — stable field ids, the Delta column-mapping /
  * Iceberg field-id discipline): `id` is the column's permanent
  * identity, written into every data file's parquet footer
  * (`parquet.field.id`); `logical` is its CURRENT user-facing name
  * ("" = dropped); `typeJson` its Catalyst type. The mapping lives in
  * the manifest header, so a RENAME is one pointer commit — no data
  * file is touched — and readers keep matching old files by id however
  * the name has moved since they were written.
  */
final case class ColMapEntry(id: Int, logical: String, typeJson: String,
    retired: Seq[String] = Nil) {
  def dropped: Boolean = logical.isEmpty
  def dataType: DataType = DataType.fromJson(typeJson)
}

/** The column-mapping engine over [[Manifest.cols]]:
  *
  *  - '''Creation''' ([[ManifestWrite]], parquet): fresh tables get ids
  *    1..n assigned in column order; every writer since stamps the ids
  *    into its output files' footers.
  *  - '''Rename''' ([[rename]]): a metadata-only optimistic commit
  *    updating the logical name (and `statsCols`); recorded column
  *    envelopes carrying the OLD name are purged in the same commit —
  *    a later column reusing the name must never consult a stale
  *    envelope and mis-skip files (correctness, not advisory).
  *  - '''Drop''' ([[drop]]): logical name cleared, id RETIRED — reads
  *    stop requesting the id everywhere (old files included), and a
  *    later add of the same name gets a FRESH id, so the old bytes can
  *    never resurrect under the new column (spec-proven).
  *  - '''Read''': the colmap IS the data schema ([[schemaOf]] — names
  *    + ids + types, no footer probing, no cross-generation drift
  *    guard needed: identity is by id). Files written before a rename
  *    match by id; a file missing an id (added later) null-fills.
  *  - '''Legacy refusal''': tables whose generations predate field ids
  *    (no colmap in the manifest — adopted layouts, pre-round-17
  *    tables, csv/json tables) refuse [[rename]]/[[drop]] loudly,
  *    naming the rewrite (Overwrite) that upgrades them; their id-less
  *    read paths are untouched.
  *
  * Scale contract: rename/drop cost one commit (segmented: a full
  * bucket rewrite — still metadata, no data bytes move); reads cost
  * nothing extra (the schema comes straight from the already-read
  * commit); envelope selectivity for files older than a rename is
  * conservatively lost until the next compaction rewrites them.
  */
object ManifestColumns {
  val FieldIdKey = "parquet.field.id"

  private[core] def withId(f: StructField, id: Int): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putLong(FieldIdKey, id.toLong).build())

  /** The logical data schema the mapping defines: live columns in
    * mapping order, nullable, each carrying its field id. This is what
    * every read path requests — never a footer-inferred name schema.
    */
  def schemaOf(cols: Seq[ColMapEntry]): StructType =
    StructType(cols.filterNot(_.dropped).map(e =>
      withId(StructField(e.logical, e.dataType, nullable = true), e.id)))

  /** Fresh ids 1..n for a creation write, in schema order (partition
    * column excluded — it lives in directory names, not file bytes).
    */
  def assign(schema: StructType, partCol: String): Seq[ColMapEntry] =
    schema.fields.filterNot(_.name == partCol).zipWithIndex.map { case (f, i) =>
      ColMapEntry(i + 1, f.name, f.dataType.json)
    }.toSeq

  /** Every name this mapping has EVER bound to some column — live
    * logical names plus names retired by renames and drops. Name reuse
    * is refused table-wide ([[extend]]/[[rename]]): Spark pushes data
    * filters to parquet by NAME while projecting by field id, so a
    * reused name would bind a pushed predicate to the OLD column's
    * bytes inside pre-rename files and silently drop/keep the wrong
    * rows (empirically demonstrated; the reason Delta's column mapping
    * uses GUID physical names). A full rewrite (Overwrite) reclaims
    * names — fresh files, fresh identity.
    */
  def usedNames(cols: Seq[ColMapEntry]): Set[String] =
    cols.flatMap(e => e.retired ++ (if (e.dropped) Nil else Seq(e.logical))).toSet

  /** Extend a mapping with columns new to `schema` (additive append
    * evolution): unknown logical names get fresh ids past the current
    * max — including past RETIRED (dropped) ids, so a re-added column
    * can never alias old bytes. A name RETIRED by an earlier
    * rename/drop is refused (see [[usedNames]]).
    */
  def extend(cols: Seq[ColMapEntry], schema: StructType, partCol: String): Seq[ColMapEntry] = {
    val known = cols.filterNot(_.dropped).map(_.logical).toSet
    val burnt = usedNames(cols) -- known
    var next = cols.map(_.id).maxOption.getOrElse(0)
    cols ++ schema.fields.toSeq
      .filterNot(f => f.name == partCol || known.contains(f.name))
      .map { f =>
        require(!burnt.contains(f.name),
          s"column name '${f.name}' was previously used by a renamed/dropped column " +
            "of this table and cannot be reused (pushed filters bind by name inside " +
            "old files) — pick another name, or rewrite the table (Overwrite) to " +
            "reclaim it")
        next += 1; ColMapEntry(next, f.name, f.dataType.json)
      }
  }

  /** Stamp a logical frame for WRITING: attach each mapped column's id
    * as an alias metadata (plan-native — no RDD round-trip, codegen
    * intact). The partition column passes through; a column the
    * mapping does not know is refused (register it via an append that
    * extends the mapping, or rewrite) — silently writing an id-less
    * column would null-fill under every future read.
    */
  def stamp(df: DataFrame, cols: Seq[ColMapEntry], partCol: String,
      passThrough: Set[String] = Set.empty): DataFrame = {
    val byLogical = cols.filterNot(_.dropped).map(e => e.logical -> e).toMap
    df.select(df.columns.map { c =>
      byLogical.get(c) match {
        case Some(e) =>
          val ft = df.schema(c).dataType
          val meta = new MetadataBuilder().putLong(FieldIdKey, e.id.toLong).build()
          if (ft == e.dataType) col(c).as(c, meta)
          else if (widensTo(ft, e.dataType))
            // a frame still producing the pre-widening type up-casts
            // losslessly at write time (round 18) — old pipelines keep
            // working across a widen without a code change
            col(c).cast(e.dataType).as(c, meta)
          else throw new IllegalArgumentException(
            s"column '$c' is ${ft.simpleString} but the table's column mapping " +
              s"records ${e.dataType.simpleString} (id ${e.id}) — a type conflict " +
              "needs a rewrite (Overwrite); refusing at write time so the mismatch " +
              "cannot land in a file and fail every later read")
        case None if c == partCol || passThrough.contains(c) => col(c)
        case None => throw new IllegalArgumentException(
          s"column '$c' is not in the table's column mapping " +
            s"(${cols.filterNot(_.dropped).map(_.logical).mkString(", ")}) — " +
            "append with schema evolution to register it, or rewrite (Overwrite)")
      }
    }.toSeq: _*)
  }

  /** Relabel an INFERRED frame to the mapping's current logical names
    * by field id: a column whose inferred metadata carries a mapped id
    * is renamed to its current logical name; a column carrying a
    * RETIRED (dropped) id disappears; id-less columns (the partition
    * column, `_change_type`, legacy) pass through. This is how change
    * records and synthesized file reads — whose footers carry the
    * names current AT WRITE TIME — serve the names current NOW.
    */
  def relabelById(df: DataFrame, cols: Seq[ColMapEntry]): DataFrame = {
    val byId = cols.filterNot(_.dropped).map(e => e.id -> e.logical).toMap
    df.select(df.schema.fields.toSeq.flatMap { f =>
      if (!f.metadata.contains(FieldIdKey)) Some(col(f.name))
      else byId.get(f.metadata.getLong(FieldIdKey).toInt)
        .map(l => col(f.name).as(l, f.metadata))
    }: _*)
  }

  /** Field-id matching is requested per-read via schema metadata, but
    * the parquet reader consults this session flag; value `true` is
    * inert for schemas without id metadata, so setting it is safe.
    */
  def ensureReadConf(spark: SparkSession): Unit =
    if (spark.conf.get("spark.sql.parquet.fieldId.read.enabled", "false") != "true")
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")

  private def mapped(spark: SparkSession, root: String): (org.apache.hadoop.fs.FileSystem, Path, Manifest) = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val m = ManifestTable.resolve(fs, rootPath).getOrElse(
      throw new IllegalArgumentException(s"no manifested table at $root"))
    if (m.cols.isEmpty)
      throw new IllegalStateException(
        s"table at $root carries no column mapping — its generations were written " +
          "without field ids (created before column mapping, adopted in place, or " +
          "non-parquet), so a metadata-only rename/drop cannot address them; " +
          "rewrite the table (SaveMode.Overwrite through ManifestWrite) to assign ids")
    (fs, rootPath, m)
  }

  /** Metadata-only RENAME: one optimistic pointer commit. The commit
    * rewrites every entry to purge column envelopes recorded under the
    * old name (stale envelopes under a reused name would mis-skip
    * files — a correctness hole, not an optimization loss) and renames
    * the column in `statsCols` so future writers keep its coverage.
    */
  def rename(spark: SparkSession, root: String, from: String, to: String): Unit = {
    val (fs, rootPath, m) = mapped(spark, root)
    require(from != m.partCol && to != m.partCol,
      s"the partition column '${m.partCol}' is structural (directory names) and cannot be renamed")
    require(m.cols.exists(e => e.logical == from),
      s"no column '$from' at $root (live: ${m.cols.filterNot(_.dropped).map(_.logical).mkString(", ")})")
    require(to.nonEmpty, "rename target must be non-empty")
    require(!usedNames(m.cols).contains(to),
      s"column name '$to' is (or was once) bound to another column of this table " +
        "and cannot be reused (pushed filters bind by name inside old files) — " +
        "pick another name, or rewrite the table (Overwrite) to reclaim it")
    val updated = m.cols.map(e =>
      if (e.logical == from) e.copy(logical = to, retired = e.retired :+ from) else e)
    val purged: Map[String, Option[ManifestEntry]] = m.entries.map { e =>
      e.part -> Some(e.copy(
        stats = e.stats.map(s => s.copy(cols = s.cols.filterNot(_.col == from))),
        carry = e.carry.map(s => s.copy(cols = s.cols.filterNot(_.col == from)))))
    }.toMap
    ManifestTable.commit(fs, rootPath, m.partCol, purged,
      expectedSeq = Some(m.seq),
      statsCols = Some(m.statsCols.map(c => if (c == from) to else c)),
      cols = Some(updated)): Unit
  }

  /** Is `from` → `to` a SAFE widening — every value of `from`
    * representable exactly in `to`, and the parquet reader able to
    * up-cast the old physical bytes at scan time (probed on this Spark:
    * int32→long, float→double, decimal precision AND scale growth all
    * read natively)? Everything else — narrowing, cross-family,
    * int→double (exact only to 2^53 — refuse rather than approximate
    * silently) — stays a loud rewrite-time refusal.
    */
  def widensTo(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => false
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (f: DecimalType, t: DecimalType) =>
      t.scale >= f.scale && t.precision - t.scale >= f.precision - f.scale
    case _ => false
  }

  /** Metadata-only TYPE WIDENING (round-18 verdict task 4, the
    * Delta/Iceberg type-widening discipline): the column keeps its id
    * — its identity — and only the mapping's recorded type changes;
    * every read path up-casts old files' narrow physical values at
    * scan time, and new writes land wide. One optimistic pointer
    * commit, zero data bytes move — where the round-17 answer to "my
    * id column outgrew int32" was a full Overwrite.
    *
    * Recorded envelopes stay VALID across the supported widenings by
    * canonical-encoding design: integral stats are already Long-domain
    * decimal strings ('i'), float stats already exact-double strings
    * ('f'), and decimals are never enveloped — so the skipping tier
    * keeps firing on pre-widening files (spec-held).
    */
  def widen(spark: SparkSession, root: String, name: String, to: DataType): Unit = {
    val (fs, rootPath, m) = mapped(spark, root)
    require(name != m.partCol,
      s"the partition column '${m.partCol}' is structural (directory names) and cannot be widened")
    val e = m.cols.find(c => !c.dropped && c.logical == name).getOrElse(
      throw new IllegalArgumentException(
        s"no column '$name' at $root (live: ${m.cols.filterNot(_.dropped).map(_.logical).mkString(", ")})"))
    val from = e.dataType
    require(widensTo(from, to),
      s"column '$name' is ${from.simpleString} and cannot change to ${to.simpleString} — " +
        "supported metadata-only widenings: byte/short/int→(wider int), float→double, " +
        "decimal precision/scale growth; anything else needs a rewrite (Overwrite)")
    val updated = m.cols.map(c => if (c.id == e.id) c.copy(typeJson = to.json) else c)
    ManifestTable.commit(fs, rootPath, m.partCol, Map.empty,
      expectedSeq = Some(m.seq), cols = Some(updated)): Unit
  }

  /** Metadata-only DROP: the id retires with its bytes left in place;
    * no read requests it again, and [[extend]] never reuses it.
    */
  def drop(spark: SparkSession, root: String, name: String): Unit = {
    val (fs, rootPath, m) = mapped(spark, root)
    require(name != m.partCol,
      s"the partition column '${m.partCol}' is structural and cannot be dropped")
    require(m.cols.exists(e => e.logical == name),
      s"no column '$name' at $root")
    require(m.cols.count(!_.dropped) > 1,
      s"cannot drop the last live column '$name' at $root")
    val updated = m.cols.map(e =>
      if (e.logical == name) e.copy(logical = "", retired = e.retired :+ name) else e)
    val purged: Map[String, Option[ManifestEntry]] = m.entries.map { e =>
      e.part -> Some(e.copy(
        stats = e.stats.map(s => s.copy(cols = s.cols.filterNot(_.col == name))),
        carry = e.carry.map(s => s.copy(cols = s.cols.filterNot(_.col == name)))))
    }.toMap
    ManifestTable.commit(fs, rootPath, m.partCol, purged,
      expectedSeq = Some(m.seq),
      statsCols = Some(m.statsCols.filterNot(_ == name)),
      cols = Some(updated)): Unit
  }
}
