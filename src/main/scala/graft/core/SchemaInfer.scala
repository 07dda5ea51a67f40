package graft.core

import org.apache.spark.sql.types._

/** Schema inference + dialect DDL emission.
  *
  * Reproduces the reference's first-row type inference matrix (SURVEY.md
  * §1.2; `d22d/utils/db/__init__.py:428-474` MySQL, `:189-274` ES,
  * `:1405-1429` ClickHouse) on top of a real `StructType` instead of
  * per-row duck typing: schema = union over a sample with permissive
  * nulls, then `StructType → dialect DDL` for target-table creation.
  *
  * Width ladders mirror `get_int_type_from_len`/`get_str_type_from_len`
  * (`d22d/utils/db/__init__.py:404-426`, `:165-187`).
  */
object SchemaInfer {

  /** Infer a Spark type from one Scala/JDBC value (reference: first-row
    * Python-type dispatch). Nested containers stay native (ArrayType /
    * MapType / StructType) until the sink boundary, where SQL dialects
    * JSON-stringify them (`d22d/utils/db/__init__.py:1071-1075`).
    */
  def typeOf(v: Any): DataType = v match {
    case null                 => NullType
    case _: Boolean           => BooleanType
    case _: Byte | _: Short | _: Int | _: Long => LongType
    case _: Float | _: Double => DoubleType
    case _: BigDecimal        => DecimalType(38, 18)
    case _: java.math.BigDecimal => DecimalType(38, 18)
    case _: String            => StringType
    case _: java.sql.Timestamp | _: java.time.Instant | _: java.time.LocalDateTime => TimestampType
    case _: java.sql.Date | _: java.time.LocalDate => DateType
    case _: Array[Byte]       => BinaryType
    case s: Seq[_]            => ArrayType(unionType(s.map(typeOf)))
    case m: Map[_, _]         => MapType(StringType, unionType(m.values.map(typeOf).toSeq))
    case _                    => StringType // reference fallback: text
  }

  /** Least common type over a sample (NullType-tolerant). */
  def unionType(ts: Seq[DataType]): DataType =
    ts.filterNot(_ == NullType).distinct match {
      case Seq()  => StringType // all-null column → text fallback
      case Seq(t) => t
      case many if many.forall(_.isInstanceOf[NumericType]) =>
        if (many.contains(DoubleType)) DoubleType
        else if (many.exists(_.isInstanceOf[DecimalType])) DecimalType(38, 18)
        else LongType
      case _ => StringType
    }

  /** Schema = union of keys over the sample, types unified per column,
    * all nullable (the reference allows NULL everywhere).
    */
  def infer(rows: Seq[Map[String, Any]]): StructType = {
    val order = rows.flatMap(_.keys).distinct // first-seen column order
    StructType(order.map { k =>
      StructField(k, unionType(rows.flatMap(_.get(k)).map(typeOf)), nullable = true)
    })
  }

  /** Int width ladder (MySQL flavor). */
  def mysqlIntType(maxAbs: Long): String =
    if (maxAbs < 128L) "tinyint"
    else if (maxAbs < 32768L) "smallint"
    else if (maxAbs < 2147483648L) "int"
    else "bigint"

  /** String width ladder (MySQL flavor); pk strings must be varchar. */
  def mysqlStrType(maxLen: Int, isPk: Boolean): String =
    if (isPk) "varchar(256)"
    else if (maxLen <= 0) "text"
    else if (maxLen < 256) s"varchar(${math.max(maxLen * 2, 16)})"
    else if (maxLen < 65536) "text"
    else if (maxLen < 16777216) "mediumtext"
    else "longtext"

  private def mysqlType(f: StructField, pk: Boolean): String = f.dataType match {
    case BooleanType                 => "tinyint"
    case LongType | IntegerType | ShortType | ByteType => "bigint"
    case FloatType | DoubleType      => "double"
    case d: DecimalType              => s"decimal(${d.precision},${d.scale})"
    case TimestampType               => "datetime"
    case DateType                    => "date"
    case BinaryType                  => "blob"
    case StringType                  => if (pk) "varchar(256)" else "text"
    case _: ArrayType | _: MapType | _: StructType => "json"
    case _                           => "text"
  }

  /** `CREATE TABLE` DDL for a MySQL-dialect sink (S3). */
  def toMySqlDdl(schema: StructType, table: String, pks: Seq[String] = Nil): String = {
    val cols = schema.fields.map { f =>
      val pk = pks.contains(f.name)
      s"  `${f.name}` ${mysqlType(f, pk)}${if (pk) " NOT NULL" else ""}"
    }
    val pkLine = if (pks.nonEmpty) Seq(s"  PRIMARY KEY (${pks.map(p => s"`$p`").mkString(", ")})") else Nil
    s"CREATE TABLE IF NOT EXISTS `$table` (\n" +
      (cols ++ pkLine).mkString(",\n") +
      "\n) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4"
  }

  private def chType(dt: DataType): String = dt match {
    case BooleanType => "UInt8"
    case LongType | IntegerType | ShortType | ByteType => "Int64"
    case FloatType | DoubleType => "Float64"
    case d: DecimalType => s"Decimal(${d.precision},${d.scale})"
    case TimestampType => "DateTime"
    case DateType => "Date"
    case ArrayType(e, _) => s"Array(${chType(e)})"
    case _ => "String"
  }

  /** ClickHouse DDL (S-ClickHouse create_index analog). Scalar columns
    * are Nullable except key columns (CH sorting keys cannot be
    * Nullable); composite types (Array/Map) cannot be wrapped in
    * Nullable at all — CH represents missing arrays as empty.
    */
  def toClickHouseDdl(schema: StructType, table: String, orderBy: Seq[String] = Nil): String = {
    val cols = schema.fields.map { f =>
      val t = chType(f.dataType)
      val composite = f.dataType.isInstanceOf[ArrayType] || f.dataType.isInstanceOf[MapType]
      val wrapped = if (orderBy.contains(f.name) || composite) t else s"Nullable($t)"
      s"  `${f.name}` $wrapped"
    }
    val ob = if (orderBy.nonEmpty) orderBy.mkString("(", ", ", ")") else "tuple()"
    s"CREATE TABLE IF NOT EXISTS `$table` (\n" + cols.mkString(",\n") +
      s"\n) ENGINE = MergeTree ORDER BY $ob"
  }

  private def esType(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case LongType | IntegerType | ShortType | ByteType => "long"
    case FloatType | DoubleType => "float"
    case _: DecimalType => "double"
    case TimestampType | DateType => "date"
    case _ => "text"
  }

  /** ES mapping JSON (S8 analog): text fields carry a keyword subfield. */
  def toEsMapping(schema: StructType): String = {
    val props = schema.fields.map { f =>
      val t = esType(f.dataType)
      if (t == "text")
        s""""${f.name}": {"type": "text", "fields": {"keyword": {"type": "keyword", "ignore_above": 256}}}"""
      else s""""${f.name}": {"type": "$t"}"""
    }
    s"""{"mappings": {"properties": {${props.mkString(", ")}}}}"""
  }
}
