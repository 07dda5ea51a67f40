package graft.sources.v2

import graft.sources.{XlsSource, XlsxSource}
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

/** DataSource V2 registration of the workbook formats:
  *
  * {{{
  *   spark.read.format("xlsx").load("/path/to/dir-or-file.xlsx")
  *   spark.read.format("xls").load("/legacy/dir-or-file.xls")
  * }}}
  *
  * All-string schema from the first workbook's header (first-row-typed,
  * like the `XlsxSource`/`XlsSource` connector path); one input
  * partition per workbook file — the container formats (zip / CFB) are
  * not splittable, so per-file is the natural granularity, matching how
  * any engine parallelizes spreadsheet corpora.
  */
abstract class WorkbookDataSourceBase(ext: String) extends TableProvider with DataSourceRegister {

  override def shortName(): String = ext

  private def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path"))
      .getOrElse(throw new IllegalArgumentException(s"$ext: missing path"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = pathOf(options)
    val spark = SparkSession.active
    val files = WorkbookScan.listFiles(spark, path, ext)
    require(files.nonEmpty, s"$ext: no .$ext workbooks at $path")
    val p = new Path(files.head)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val bytes = try in.readAllBytes() finally in.close()
    val header = WorkbookScan.parse(ext, bytes)._1
    StructType(header.map(StructField(_, StringType, nullable = true)))
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    WorkbookTable(pathOf(opts), ext, schema)
  }
}

class XlsxDataSource extends WorkbookDataSourceBase("xlsx")
class XlsDataSource extends WorkbookDataSourceBase("xls")

case class WorkbookTable(path: String, ext: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"$ext:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => WorkbookScan(path, ext, tableSchema)
}

object WorkbookScan {
  def listFiles(spark: SparkSession, path: String, ext: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath)
        .filter(_.getName.endsWith(s".$ext")).map(_.toString).sorted
    else Seq(path)
  }

  def parse(ext: String, bytes: Array[Byte]): (Seq[String], Seq[Seq[String]]) =
    if (ext == "xls") XlsSource.parseWorkbook(bytes) else XlsxSource.parseWorkbook(bytes)
}

case class WorkbookScan(path: String, ext: String, schema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    WorkbookScan.listFiles(SparkSession.active, path, ext)
      .map(f => WorkbookPartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = Bridge.serializableConf(SparkSession.active.sparkContext.hadoopConfiguration)
    WorkbookReaderFactory(ext, schema.fieldNames.toSeq, conf)
  }
}

case class WorkbookPartition(file: String) extends InputPartition

case class WorkbookReaderFactory(ext: String, columns: Seq[String], conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WorkbookPartitionReader(
      partition.asInstanceOf[WorkbookPartition].file, ext, columns, conf)
}

/** Parses one workbook on first advance, then streams its rows. */
class WorkbookPartitionReader(
    file: String, ext: String, columns: Seq[String], conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private var it: Iterator[InternalRow] = _
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (it == null) {
      val p = new Path(file)
      val in = p.getFileSystem(conf.value).open(p)
      val bytes = try in.readAllBytes() finally in.close()
      val n = columns.length
      it = WorkbookScan.parse(ext, bytes)._2.iterator.map { vals =>
        InternalRow.fromSeq(vals.padTo(n, null).take(n)
          .map(v => if (v == null) null else UTF8String.fromString(v)))
      }
    }
    if (!it.hasNext) return false
    row = it.next()
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
