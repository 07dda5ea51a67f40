package graft.core

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Inference goldens for the SURVEY §1.2 matrix. */
class SchemaInferSpec extends SparkSpec {

  test("typeOf maps the reference value domain") {
    assert(SchemaInfer.typeOf(3) == LongType)
    assert(SchemaInfer.typeOf(3L) == LongType)
    assert(SchemaInfer.typeOf(3.5) == DoubleType)
    assert(SchemaInfer.typeOf("x") == StringType)
    assert(SchemaInfer.typeOf(null) == NullType)
    assert(SchemaInfer.typeOf(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")) == TimestampType)
    assert(SchemaInfer.typeOf(java.sql.Date.valueOf("2024-01-01")) == DateType)
    assert(SchemaInfer.typeOf(Array[Byte](1, 2)) == BinaryType)
    assert(SchemaInfer.typeOf(Seq(1, 2)) == ArrayType(LongType))
    assert(SchemaInfer.typeOf(Map("a" -> 1)) == MapType(StringType, LongType))
  }

  test("infer unions keys and types over the sample, all nullable") {
    val schema = SchemaInfer.infer(Seq(
      Map("id" -> 1, "name" -> "a", "score" -> null),
      Map("id" -> 2, "score" -> 3.5, "extra" -> "y"),
    ))
    assert(schema.fieldNames.toSeq == Seq("id", "name", "score", "extra"))
    assert(schema("id").dataType == LongType)
    assert(schema("name").dataType == StringType)
    assert(schema("score").dataType == DoubleType) // null + double → double
    assert(schema.fields.forall(_.nullable))
  }

  test("all-null column falls back to text/string") {
    val schema = SchemaInfer.infer(Seq(Map("x" -> null), Map("x" -> null)))
    assert(schema("x").dataType == StringType)
  }

  test("int/double mix widens to double; int widths ladder") {
    assert(SchemaInfer.unionType(Seq(LongType, DoubleType)) == DoubleType)
    assert(SchemaInfer.mysqlIntType(100) == "tinyint")
    assert(SchemaInfer.mysqlIntType(40000) == "int")
    assert(SchemaInfer.mysqlIntType(1L << 40) == "bigint")
  }

  test("MySQL DDL: §1.2 matrix + pk varchar(256) + PRIMARY KEY clause") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("bal", DoubleType), StructField("ts", TimestampType),
      StructField("tags", ArrayType(StringType)),
    ))
    val ddl = SchemaInfer.toMySqlDdl(schema, "t", pks = Seq("name"))
    assert(ddl.contains("`id` bigint"))
    assert(ddl.contains("`name` varchar(256) NOT NULL")) // pk string → varchar
    assert(ddl.contains("`bal` double"))
    assert(ddl.contains("`ts` datetime"))
    assert(ddl.contains("`tags` json")) // nested → json at SQL sink
    assert(ddl.contains("PRIMARY KEY (`name`)"))
  }

  test("ClickHouse DDL: Nullable wrapping except order-by keys and composites") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("ts", TimestampType),
      StructField("emb", ArrayType(DoubleType)), // CH rejects Nullable(Array(...))
    ))
    val ddl = SchemaInfer.toClickHouseDdl(schema, "t", orderBy = Seq("id"))
    assert(ddl.contains("`id` Int64"))
    assert(ddl.contains("`v` Nullable(Float64)"))
    assert(ddl.contains("`ts` Nullable(DateTime)"))
    assert(ddl.contains("`emb` Array(Float64)"))
    assert(!ddl.contains("Nullable(Array"))
    assert(ddl.contains("ORDER BY (id)"))
  }

  test("ES mapping: text + keyword subfield, long/float/date") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("when", TimestampType),
    ))
    val m = SchemaInfer.toEsMapping(schema)
    assert(m.contains(""""id": {"type": "long"}"""))
    assert(m.contains(""""keyword": {"type": "keyword", "ignore_above": 256}"""))
    assert(m.contains(""""when": {"type": "date"}"""))
  }
}
