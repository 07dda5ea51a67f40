package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Metadata-only TYPE WIDENING in the column mapping (round-18 verdict
  * task 4 — the Delta/Iceberg discipline): int→long, float→double and
  * decimal growth change only the mapping's recorded type; the id (the
  * column's identity) is untouched, old files up-cast at scan time,
  * new writes land wide, and narrowing/cross-family changes keep the
  * loud rewrite-time refusal.
  */
class ManifestWidenSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp = tmpDir("widen")
  private var n = 0
  private def freshRoot(): String = { n += 1; s"$tmp/t$n" }
  private def fs = new Path(tmp).getFileSystem(spark.sessionState.newHadoopConf())

  private def build(root: String): Unit =
    ManifestWrite.write(
      spark.range(0, 100).select(
        col("id").cast("int").as("n"),
        (col("id") * 1.5).cast("float").as("x"),
        concat(lit("u"), col("id") % 5).as("who")),
      root, "", SaveMode.Overwrite)

  test("int→long: id kept, old files up-cast, wide and narrow appends both land") {
    val root = freshRoot()
    build(root)
    val idBefore = ManifestTable.resolve(fs, new Path(root)).get
      .cols.find(_.logical == "n").get.id
    ManifestColumns.widen(spark, root, "n", LongType)
    val m = ManifestTable.resolve(fs, new Path(root)).get
    val e = m.cols.find(_.logical == "n").get
    assert(e.id == idBefore, "widening must not change the column's identity")
    assert(e.dataType == LongType)
    // old (int-physical) files read as long
    val df0 = ManifestFileIndex.relation(spark, root, "")
    assert(df0.schema("n").dataType == LongType)
    assert(df0.agg(sum("n")).head().getLong(0) == (0 until 100).map(_.toLong).sum)
    // wide append: values beyond int range
    ManifestWrite.write(
      spark.range(0, 3).select((col("id") + 5000000000L).as("n"),
        lit(0.0f).cast("float").as("x"), lit("w").as("who")),
      root, "", SaveMode.Append)
    // NARROW append (an old pipeline still producing ints) up-casts at
    // write time instead of failing
    ManifestWrite.write(
      spark.range(200, 203).select(col("id").cast("int").as("n"),
        lit(1.0f).cast("float").as("x"), lit("i").as("who")),
      root, "", SaveMode.Append)
    val df = ManifestFileIndex.relation(spark, root, "")
    assert(df.count() == 106)
    assert(df.filter(col("n") > 4000000000L).count() == 3)
    assert(df.agg(sum("n")).head().getLong(0) ==
      (0 until 100).map(_.toLong).sum + (0 until 3).map(_ + 5000000000L).sum +
        (200 until 203).map(_.toLong).sum)
    // legacy union read path agrees
    val legacy = ManifestTable.read(spark, root)
    assert(legacy.schema("n").dataType == LongType)
    assert(legacy.count() == 106)
  }

  test("envelopes survive widening: skipping keeps firing, values exact") {
    val root = freshRoot()
    build(root)
    ManifestColumns.widen(spark, root, "n", LongType)
    ManifestColumns.widen(spark, root, "x", DoubleType)
    val m = ManifestTable.resolve(fs, new Path(root)).get
    // recorded envelopes were NOT purged (canonical encodings are
    // already Long-/Double-domain)
    val statCols = m.entries.flatMap(_.allStats).flatMap(_.cols).map(_.col).toSet
    assert(statCols.contains("n") && statCols.contains("x"),
      s"widening must keep envelopes, got $statCols")
    val df = ManifestFileIndex.relation(spark, root, "")
    assert(df.schema("x").dataType == DoubleType)
    // float 1.5f widens to exactly 1.5; filters on the widened column exact
    assert(df.filter(col("x") === 1.5d).select("n").head().getLong(0) == 1L)
    assert(df.filter(col("n") >= 98L).count() == 2)
  }

  test("merge works across a widening; decimal growth; refusals stay loud") {
    val root = freshRoot()
    ManifestWrite.write(
      spark.range(0, 50).select(col("id").cast("int").as("n"),
        (col("id") * 100).cast(DecimalType(7, 2)).as("amt")),
      root, "", SaveMode.Overwrite)
    ManifestColumns.widen(spark, root, "n", LongType)
    ManifestColumns.widen(spark, root, "amt", DecimalType(12, 4))
    val df0 = ManifestFileIndex.relation(spark, root, "")
    assert(df0.schema("amt").dataType == DecimalType(12, 4))
    assert(df0.agg(sum("n")).head().getLong(0) == (0 until 50).map(_.toLong).sum)
    // row-level merge on the widened table
    ManifestMerge(root, Seq("n"), partCol = "")
      .whenMatchedUpdate(Map("amt" -> ((_, _) =>
        lit(BigDecimal("9999.1234")).cast(DecimalType(12, 4)))))
      .run(spark.range(0, 5).select(col("id").as("n"))): Unit
    val df = ManifestFileIndex.relation(spark, root, "")
    assert(df.filter(col("amt") === lit(BigDecimal("9999.1234"))).count() == 5)
    // refusals: narrowing, cross-family, partition/unknown columns
    intercept[IllegalArgumentException] {
      ManifestColumns.widen(spark, root, "n", IntegerType)
    }
    intercept[IllegalArgumentException] {
      ManifestColumns.widen(spark, root, "amt", DecimalType(8, 2)) // integer digits shrink
    }
    intercept[IllegalArgumentException] {
      ManifestColumns.widen(spark, root, "n", DoubleType) // exact only to 2^53
    }
    intercept[IllegalArgumentException] {
      ManifestColumns.widen(spark, root, "nope", LongType)
    }
  }

  test("partitioned table + streaming read see the widened schema") {
    val root = freshRoot()
    ManifestWrite.write(
      spark.range(0, 40).select(col("id").cast("int").as("n"),
        concat(lit("d"), col("id") % 2).as("day")),
      root, "day", SaveMode.Overwrite)
    ManifestColumns.widen(spark, root, "n", LongType)
    val df = ManifestFileIndex.relation(spark, root, "day")
    assert(df.schema("n").dataType == LongType)
    assert(df.filter(col("day") === "d1").agg(sum("n")).head().getLong(0) ==
      (0 until 40).filter(_ % 2 == 1).map(_.toLong).sum)
    // streaming source on an UNPARTITIONED widened table
    val sroot = freshRoot()
    ManifestWrite.write(
      spark.range(0, 10).select(col("id").cast("int").as("n")),
      sroot, "", SaveMode.Overwrite)
    ManifestColumns.widen(spark, sroot, "n", LongType)
    val q = spark.readStream.format("graftmanifest").load(sroot)
      .writeStream.format("memory").queryName("widen_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("widen_stream")
    assert(got.schema("n").dataType == LongType)
    assert(got.count() == 10)
  }

  test("an unmapped (legacy) table refuses widening, naming the upgrade") {
    val root = freshRoot()
    spark.range(0, 10).select(col("id").cast("int").as("n")).write.parquet(root)
    ManifestTable.adoptIfPlain(fs, new Path(root), ""): Unit
    val e = intercept[IllegalStateException] {
      ManifestColumns.widen(spark, root, "n", LongType)
    }
    assert(e.getMessage.contains("column mapping"), e.getMessage)
  }
}
