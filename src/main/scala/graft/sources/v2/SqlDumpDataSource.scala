package graft.sources.v2

import graft.sources.{SqlDumpParser, SqlDumpSource}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.graft.{Bridge, SerializableHadoopConf}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.regex.Pattern
import scala.jdk.CollectionConverters._

/** DataSource V2 registration of the `.sql`-dump format:
  *
  * {{{
  *   spark.read.format("sqldump")
  *     .option("table", "users")            // which dump table to scan
  *     .load("/path/to/dump-or-dir")
  * }}}
  *
  * Schema comes from the dump's own CREATE TABLE block (bounded
  * driver-side header scan); data partitions are one-per-file — each
  * reader streams its file's lines and parses matching INSERT/REPLACE
  * statements. (Extended-insert dumps put one statement per line, so
  * per-file granularity is the format's natural split; the
  * `SqlDumpSource` path additionally parallelizes across part files of
  * dump directories this library writes.)
  */
class SqlDumpDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "sqldump"

  private def pathAndTable(options: CaseInsensitiveStringMap): (String, String) = {
    val path = Option(options.get("path"))
      .getOrElse(throw new IllegalArgumentException("sqldump: missing path"))
    val table = Option(options.get("table"))
      .getOrElse(throw new IllegalArgumentException("sqldump: option 'table' is required"))
    (path, table)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (path, table) = pathAndTable(options)
    val spark = SparkSession.active
    val cols = SqlDumpSource.scanSchemas(spark, path).getOrElse(table,
      throw new IllegalArgumentException(s"sqldump: no CREATE TABLE `$table` found under $path"))
    StructType(cols.map(StructField(_, StringType, nullable = true)))
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val (path, table) = pathAndTable(opts)
    SqlDumpTable(path, table, schema)
  }
}

case class SqlDumpTable(path: String, table: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"sqldump:$path#$table"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => SqlDumpScan(path, table, tableSchema)
}

case class SqlDumpScan(path: String, table: String, schema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files: Seq[String] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath.toString)
          .filterNot(f => new Path(f).getName.startsWith("_") || new Path(f).getName.startsWith("."))
      else Seq(path)
    files.map(f => SqlDumpPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = Bridge.serializableConf(SparkSession.active.sparkContext.hadoopConfiguration)
    SqlDumpReaderFactory(table, schema.fieldNames.toSeq, conf)
  }
}

case class SqlDumpPartition(file: String) extends InputPartition

case class SqlDumpReaderFactory(table: String, columns: Seq[String], conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SqlDumpPartitionReader(partition.asInstanceOf[SqlDumpPartition].file, table, columns, conf)
}

/** Streams one file: filters lines to the target table's INSERT/REPLACE
  * statements, parses each statement's multi-row VALUES, emits rows.
  */
class SqlDumpPartitionReader(
    file: String, table: String, columns: Seq[String], conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private val insertPrefix = Pattern.compile(
    s"""(?is)^\\s*(INSERT|REPLACE)\\s+(?:IGNORE\\s+)?INTO\\s+[`"]?${Pattern.quote(table)}[`"]?[\\s(].*""")

  private val path = new Path(file)
  private val in = new BufferedReader(new InputStreamReader(
    path.getFileSystem(conf.value).open(path), StandardCharsets.UTF_8))
  private val colIdx = columns.zipWithIndex.toMap
  private var current: Iterator[InternalRow] = Iterator.empty
  private var row: InternalRow = _

  private def rowsOf(stmt: SqlDumpParser.InsertStatement): Iterator[InternalRow] = {
    val mapping = stmt.columns.map(_.map(c => colIdx.getOrElse(c, -1)))
    stmt.rows.iterator.map { vals =>
      val arr = new Array[Any](columns.length)
      mapping match {
        case Some(m) => m.zip(vals).foreach { case (t, v) =>
          if (t >= 0 && v != null) arr(t) = UTF8String.fromString(v)
        }
        case None => vals.take(columns.length).zipWithIndex.foreach { case (v, i) =>
          if (v != null) arr(i) = UTF8String.fromString(v)
        }
      }
      InternalRow.fromSeq(arr.toSeq)
    }
  }

  override def next(): Boolean = {
    while (!current.hasNext) {
      val line = in.readLine()
      if (line == null) return false
      if (insertPrefix.matcher(line).matches())
        SqlDumpParser.parseInsert(line).foreach(s => current = rowsOf(s))
    }
    row = current.next()
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
