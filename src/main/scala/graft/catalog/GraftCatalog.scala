package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import graft.core.{ColMapEntry, Manifest, ManifestColumns, ManifestTable, ManifestWrite}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, IdentityTransform, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{AlwaysTrue, EqualNullSafe, EqualTo, Filter, In, InsertableRelation}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** V2 `TableCatalog` over manifested tables (round-18 verdict task 1 —
  * the Delta/Iceberg catalog glue): registers as
  *
  * {{{
  *   spark.sql.catalog.graftcat           = graft.catalog.GraftCatalog
  *   spark.sql.catalog.graftcat.warehouse = /data/graft-warehouse
  * }}}
  *
  * and makes manifest roots nameable SQL objects — `graftcat.ns.t`
  * resolves to `<warehouse>/ns/t`. A SQL-only user then gets the whole
  * table-format surface with zero Scala:
  *
  *   - `CREATE TABLE graftcat.ns.t (…) PARTITIONED BY (day)` — one
  *     empty pointer commit carrying the column mapping (field ids
  *     assigned at birth, so rename/drop are metadata-only from day
  *     one) plus the declared partition-column type;
  *   - `INSERT INTO` / `INSERT OVERWRITE` — the [[ManifestWrite]]
  *     generation + pointer-commit discipline via Spark's V1 write
  *     fallback ([[TableCapability.V1_BATCH_WRITE]]); partitioned
  *     inserts carry untouched files by reference, never rewrite;
  *   - `SELECT … [VERSION AS OF n | TIMESTAMP AS OF ts]` — the
  *     analyzer swaps the relation for the single-scan
  *     [[graft.core.ManifestFileIndex]] plan
  *     ([[graft.functions.GraftExtensions]]' resolution rule), so
  *     pushdown, partition pruning, manifest data skipping and the
  *     metadata-aggregate fast path all fire EXACTLY as on the
  *     path-based surface;
  *   - `MERGE INTO` — lowered onto the row-level
  *     [[graft.core.ManifestMerge]] engine (file-pruned, optimistic,
  *     change-feed-capable) by the same rule;
  *   - `DELETE FROM` (partition-predicate), `TRUNCATE TABLE`,
  *     `ALTER TABLE … RENAME/DROP/ADD COLUMN`, `DROP TABLE`,
  *     `SHOW TABLES`, `DESCRIBE`.
  *
  * Reads require the graft extensions
  * (`spark.sql.extensions=graft.functions.GraftExtensions`, the
  * library's documented session configuration) — without them
  * `newScanBuilder` fails loudly naming the fix, never silently
  * degrading to a slower scan.
  *
  * Scale contract: unchanged from the path surface — the catalog adds
  * one directory convention and zero new I/O; every operation above is
  * the same pointer-commit/manifest-resolve the Scala API performs.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouseOpt: Option[String] = None

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouseOpt = Option(options.get("warehouse"))
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private[graft] def warehouse: Path = new Path(warehouseOpt.getOrElse(
    spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") + s"/$catalogName"))

  private def fs: FileSystem =
    warehouse.getFileSystem(spark.sessionState.newHadoopConf())

  private def nsPath(ns: Array[String]): Path =
    ns.foldLeft(warehouse)((p, n) => new Path(p, n))

  private def tablePath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace), ident.name)

  private def fullName(ident: Identifier): String =
    (Seq(catalogName) ++ ident.namespace :+ ident.name).mkString(".")

  private def isTableDir(p: Path): Boolean =
    fs.exists(new Path(p, ManifestTable.CommitsDir))

  // ---- tables ------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace)
    if (!fs.exists(p)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && isTableDir(s.getPath))
      .map(s => Identifier.of(namespace, s.getPath.getName))
      .sortBy(_.name).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    isTableDir(tablePath(ident))

  override def loadTable(ident: Identifier): Table =
    GraftTable.load(spark, fullName(ident), tablePath(ident).toString, None)
      .getOrElse(throw new NoSuchTableException(ident))

  /** `VERSION AS OF n` — a retained commit seq. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val seq = version.toLongOption.getOrElse(throw new IllegalArgumentException(
      s"${fullName(ident)}: VERSION AS OF takes a commit sequence number, got '$version'"))
    GraftTable.load(spark, fullName(ident), tablePath(ident).toString, Some(seq))
      .getOrElse(throw new NoSuchTableException(ident))
  }

  /** `TIMESTAMP AS OF ts` — micros since epoch per the V2 contract,
    * resolved to the newest retained commit at-or-before by store
    * mtime (the Delta discipline, [[ManifestTable.versionAt]]).
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = tablePath(ident)
    if (!isTableDir(root)) throw new NoSuchTableException(ident)
    val seq = ManifestTable.versionAt(fs, root, timestamp / 1000L).getOrElse(
      throw new IllegalArgumentException(
        s"${fullName(ident)}: no retained commit at or before timestamp " +
          s"${java.time.Instant.ofEpochMilli(timestamp / 1000L)} (retained: " +
          s"${ManifestTable.versions(fs, root).mkString(", ")})"))
    GraftTable.load(spark, fullName(ident), root.toString, Some(seq))
      .getOrElse(throw new NoSuchTableException(ident))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val partCols = partitions.toSeq.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        t.references.head.fieldNames.mkString(".")
      case other => throw new UnsupportedOperationException(
        s"${fullName(ident)}: only identity partitioning is supported, got $other")
    }
    require(partCols.size <= 1,
      s"${fullName(ident)}: manifested tables partition on at most ONE column, " +
        s"got ${partCols.mkString(", ")}")
    val partCol = partCols.headOption.getOrElse("")
    if (partCol.nonEmpty) {
      val f = schema.fields.find(_.name == partCol).getOrElse(
        throw new IllegalArgumentException(
          s"${fullName(ident)}: partition column '$partCol' is not in the schema"))
      require(Seq(IntegerType, LongType, DateType, StringType).contains(f.dataType),
        s"${fullName(ident)}: partition column must be int/bigint/date/string " +
          s"(directory-encoded values), got ${f.dataType.simpleString}")
    }
    val root = tablePath(ident)
    fs.mkdirs(root)
    // partition-column TYPE sidecar: the manifest stores the column
    // mapping for DATA columns only (the part col lives in directory
    // names); the declared type pins the read schema so "123"-style
    // string partitions can never be silently re-inferred as ints
    if (partCol.nonEmpty) {
      val out = fs.create(new Path(root, GraftCatalog.PartTypeFile), true)
      try out.write(schema.fields.find(_.name == partCol).get.dataType.json
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    val cols = ManifestColumns.assign(schema, partCol)
    ManifestTable.commit(fs, root, partCol, Map.empty, cols = Some(cols)): Unit
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val root = tablePath(ident).toString
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    changes.foreach {
      case c: TableChange.RenameColumn =>
        require(c.fieldNames.length == 1, "nested columns are not supported")
        ManifestColumns.rename(spark, root, c.fieldNames.head, c.newName)
      case c: TableChange.DeleteColumn =>
        require(c.fieldNames.length == 1, "nested columns are not supported")
        ManifestColumns.drop(spark, root, c.fieldNames.head)
      case c: TableChange.AddColumn =>
        require(c.fieldNames.length == 1, "nested columns are not supported")
        val rootPath = new Path(root)
        val m = ManifestTable.resolve(fs, rootPath).getOrElse(
          throw new NoSuchTableException(ident))
        require(m.cols.nonEmpty,
          s"${fullName(ident)} carries no column mapping — rewrite (INSERT OVERWRITE) to upgrade")
        val added = StructType(Seq(StructField(c.fieldNames.head, c.dataType)))
        val extended = ManifestColumns.extend(m.cols, added, m.partCol)
        require(extended != m.cols,
          s"${fullName(ident)}: column '${c.fieldNames.head}' already exists")
        ManifestTable.commit(fs, rootPath, m.partCol, Map.empty,
          expectedSeq = Some(m.seq), cols = Some(extended)): Unit
      case c: TableChange.UpdateColumnType =>
        require(c.fieldNames.length == 1, "nested columns are not supported")
        // metadata-only widening (round 18): int→long, float→double,
        // decimal growth; everything else refused loudly by the engine
        ManifestColumns.widen(spark, root, c.fieldNames.head, c.newDataType)
      case other => throw new UnsupportedOperationException(
        s"${fullName(ident)}: unsupported ALTER TABLE change $other — supported: " +
          "RENAME COLUMN, DROP COLUMN, ADD COLUMN, ALTER COLUMN TYPE (widening)")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = tablePath(ident)
    if (!isTableDir(p)) false
    else fs.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    // a table rename is one directory move — atomic on HDFS/local; on
    // S3-family stores it is O(data) copy-then-delete (the documented
    // store caveat); data-path commits never rely on rename, only this
    // explicitly-requested DDL does
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    fs.mkdirs(nsPath(newIdent.namespace))
    require(fs.rename(tablePath(oldIdent), tablePath(newIdent)),
      s"rename ${fullName(oldIdent)} -> ${fullName(newIdent)} failed")
  }

  // ---- namespaces --------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    if (!fs.exists(warehouse)) Array.empty
    else fs.listStatus(warehouse).toSeq
      .filter(s => s.isDirectory && !isTableDir(s.getPath))
      .map(s => Array(s.getPath.getName)).sortBy(_.head).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      if (!fs.exists(nsPath(namespace))) throw new NoSuchNamespaceException(namespace)
      Array.empty // one level of namespaces is plenty for a path catalog
    }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || fs.exists(nsPath(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map(SupportsNamespaces.PROP_LOCATION -> nsPath(namespace).toString).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(namespace) && namespace.nonEmpty)
      throw new NamespaceAlreadyExistsException(namespace)
    fs.mkdirs(nsPath(namespace)): Unit
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = nsPath(namespace)
    if (!fs.exists(p)) false
    else {
      if (!cascade)
        require(fs.listStatus(p).isEmpty,
          s"namespace ${namespace.mkString(".")} is not empty (use CASCADE)")
      fs.delete(p, true)
    }
  }
}

object GraftCatalog {
  /** Root-relative sidecar holding the declared partition-column type
    * (json) for catalog-created tables — underscore-prefixed, invisible
    * to data readers and adoption.
    */
  val PartTypeFile = "_catalog-parttype"
}

/** One named manifested table as a V2 [[Table]]. Reads are swapped to
  * the single-scan v1 relation by the extensions' resolution rule
  * (keeping every optimization of the path surface); writes go through
  * the V1 write fallback onto [[ManifestWrite]]; partition-predicate
  * deletes and truncate commit entry retirements directly.
  */
final class GraftTable(
    displayName: String,
    val root: String,
    spark: SparkSession,
    val asOf: Option[Long],
    val manifest: Manifest,
) extends Table with SupportsRead with SupportsWrite with SupportsDelete {

  val partCol: String = manifest.partCol

  private def fsOf: FileSystem =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** Declared partition-column type (catalog-created tables), else
    * None — the value-inference ladder decides.
    */
  val declaredPartType: Option[DataType] =
    if (partCol.isEmpty) None
    else try {
      val p = new Path(root, GraftCatalog.PartTypeFile)
      val f = fsOf
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        try {
          val bytes = new Array[Byte](f.getFileStatus(p).getLen.toInt)
          in.readFully(0, bytes)
          Some(DataType.fromJson(new String(bytes,
            java.nio.charset.StandardCharsets.UTF_8)))
        } finally in.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The v1 single-scan frame this table reads as (None while the
    * table is empty); built once per loadTable. The resolution rule
    * grafts its analyzed plan in place of the v2 relation.
    */
  lazy val readFrame: Option[DataFrame] =
    if (manifest.entries.isEmpty) None
    else Some(graft.core.ManifestFileIndex.relation(spark, root, partCol,
      asOfSeq = asOf, partType = declaredPartType))

  override def name(): String = displayName

  override def schema(): StructType = readFrame.map(_.schema).getOrElse {
    val data = ManifestColumns.schemaOf(manifest.cols)
    if (partCol.isEmpty) data
    else StructType(data.fields :+
      StructField(partCol, declaredPartType.getOrElse(StringType), nullable = true))
  }

  override def partitioning(): Array[Transform] =
    if (partCol.isEmpty) Array.empty else Array(Expressions.identity(partCol))

  override def properties(): util.Map[String, String] =
    Map(TableCatalog.PROP_LOCATION -> root,
      TableCatalog.PROP_PROVIDER -> "graft",
      "current_version" -> manifest.seq.toString).asJava

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER).asJava

  /** Nominal scan builder: the extensions' resolution rule replaces
    * read relations with the native single-scan plan before the
    * optimizer ever builds a scan here, and DELETE/row-level commands
    * only need the RELATION (the strategy calls [[deleteWhere]], never
    * the scan). If a scan actually reaches execution, the session is
    * missing the extensions — fail with the fix, never silently run a
    * pushdown-less scan.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): org.apache.spark.sql.connector.read.Scan =
        new org.apache.spark.sql.connector.read.Scan {
          override def readSchema(): StructType = schema()
          override def toBatch: org.apache.spark.sql.connector.read.Batch =
            throw new UnsupportedOperationException(
              s"$displayName: reading a graft catalog table needs the graft extensions — " +
                "build the session with spark.sql.extensions=graft.functions.GraftExtensions " +
                "(their resolution rule plans this table as one native file scan; a " +
                "from-scratch DSv2 scan would lose pushdown and vectorization)")
        }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(asOf.isEmpty,
      s"$displayName: cannot write to a VERSION/TIMESTAMP AS OF snapshot")
    new GraftWriteBuilder(this)
  }

  // ---- DELETE FROM (partition predicates) / TRUNCATE ---------------

  private def partMatches(filters: Array[Filter]): Option[Manifest => Set[String]] = {
    // conjunction; each conjunct must address the partition column by
    // equality/IN (string-compared against the directory-encoded
    // value) or be AlwaysTrue
    def valueStr(v: Any): String = v match {
      case d: java.sql.Date => d.toString
      case d: java.time.LocalDate => d.toString
      case x => x.toString
    }
    val fns: Seq[Manifest => Set[String]] = filters.toSeq.map {
      case _: AlwaysTrue => (m: Manifest) => m.entries.map(_.part).toSet
      case EqualTo(c, v) if c == partCol && v != null =>
        val s = valueStr(v); (m: Manifest) => m.entries.map(_.part).filter(_ == s).toSet
      case EqualNullSafe(c, v) if c == partCol && v != null =>
        val s = valueStr(v); (m: Manifest) => m.entries.map(_.part).filter(_ == s).toSet
      case In(c, vs) if c == partCol && vs != null && !vs.contains(null) =>
        val set = vs.map(valueStr).toSet
        (m: Manifest) => m.entries.map(_.part).filter(set.contains).toSet
      case _ => return None
    }
    Some(m => fns.map(_(m)).reduceOption(_ intersect _).getOrElse(
      m.entries.map(_.part).toSet))
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    partMatches(filters).isDefined

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val matcher = partMatches(filters).getOrElse(throw new UnsupportedOperationException(
      s"$displayName: DELETE supports partition-column predicates only " +
        s"('$partCol' equality/IN) — row-level deletes go through MERGE INTO " +
        "… WHEN MATCHED THEN DELETE"))
    val fs = fsOf
    val rootPath = new Path(root)
    var attempts = 0
    while (attempts < 5) {
      attempts += 1
      val m = ManifestTable.resolve(fs, rootPath).getOrElse(return)
      val dead = matcher(m)
      if (dead.isEmpty) return
      try {
        ManifestTable.commit(fs, rootPath, m.partCol,
          dead.map(p => p -> (None: Option[graft.core.ManifestEntry])).toMap,
          expectedSeq = Some(m.seq)): Unit
        ManifestTable.gc(fs, rootPath): Unit
        return
      } catch { case _: graft.core.ManifestStaleException => }
    }
    throw new java.io.IOException(s"$displayName: DELETE lost the commit race 5 times")
  }
}

object GraftTable {
  def load(spark: SparkSession, displayName: String, root: String,
      asOf: Option[Long]): Option[GraftTable] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val m = asOf match {
      case Some(seq) => ManifestTable.resolveAt(fs, rootPath, seq).orElse(
        throw new IllegalArgumentException(
          s"$displayName: no retained version $seq (retained: " +
            s"${ManifestTable.versions(fs, rootPath).mkString(", ")})"))
      case None => ManifestTable.resolve(fs, rootPath)
    }
    m.map(new GraftTable(displayName, root, spark, asOf, _))
  }
}

/** INSERT INTO → [[ManifestWrite]] append (partitioned appends carry
  * untouched files by reference); INSERT OVERWRITE → full overwrite
  * (truncate) or partition-scoped overwrite (static `PARTITION (…)`
  * clauses arrive as partition-column filters).
  */
final class GraftWriteBuilder(table: GraftTable)
    extends WriteBuilder with SupportsOverwrite {

  private var overwriteAll = false
  private var overwriteParts: Option[Set[String]] = None

  override def truncate(): WriteBuilder = { overwriteAll = true; this }

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    if (filters.isEmpty || filters.forall(_.isInstanceOf[AlwaysTrue])) overwriteAll = true
    else {
      def str(v: Any): String = v match {
        case d: java.sql.Date => d.toString
        case d: java.time.LocalDate => d.toString
        case x => x.toString
      }
      val parts = filters.toSeq.map {
        case EqualTo(c, v) if c == table.partCol && v != null => str(v)
        case EqualNullSafe(c, v) if c == table.partCol && v != null => str(v)
        case f => throw new UnsupportedOperationException(
          s"${table.name()}: INSERT OVERWRITE supports whole-table overwrite or " +
            s"static PARTITION(${table.partCol}=…) clauses, got filter $f")
      }
      overwriteParts = Some(parts.toSet)
    }
    this
  }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation = new InsertableRelation {
      override def insert(data: DataFrame, overwrite: Boolean): Unit = {
        if (overwriteAll || overwrite)
          ManifestWrite.write(data, table.root, table.partCol, SaveMode.Overwrite)
        else overwriteParts match {
          case Some(parts) =>
            ManifestWrite.overwritePartitions(data, table.root, table.partCol, parts)
          case None =>
            ManifestWrite.write(data, table.root, table.partCol, SaveMode.Append)
        }
      }
    }
  }
}
