package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SaveMode}

/** Round-15 verdict task 5: opt-in ADDITIVE cross-generation schema
  * evolution. Append-with-a-new-nullable-column is the single most
  * common table change; the default drift guard stays (loud error), and
  * `mergeSchema=true` reads the union — new columns null in older
  * generations, type conflicts still fatal — on the single-scan path,
  * the legacy union read, and the streaming source, value-identically.
  */
class ManifestMergeSchemaSpec extends SparkSpec {
  import spark.implicits._

  private def evolvedTable(): String = {
    val root = tmpDir("gm-merge") + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.format("graftmanifest").save(root)
    Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "v", "extra")
      .write.format("graftmanifest").mode(SaveMode.Append).save(root)
    root
  }

  private def asMaps(rows: Array[Row]): Set[Map[String, Any]] =
    rows.map(r => r.schema.fieldNames.map(n =>
      n -> r.get(r.fieldIndex(n))).toMap).toSet

  private val expected = Set(
    Map("id" -> 1L, "v" -> "a", "extra" -> null),
    Map("id" -> 2L, "v" -> "b", "extra" -> null),
    Map("id" -> 3L, "v" -> "c", "extra" -> 30L),
    Map("id" -> 4L, "v" -> "d", "extra" -> 40L))

  /** Two generations with drifted columns, NO column mapping — the
    * pre-round-17 table shape the legacy drift guards still protect.
    */
  private def legacyDrifted(aCols: org.apache.spark.sql.DataFrame,
      bCols: org.apache.spark.sql.DataFrame): String = {
    val root = tmpDir("gm-legacy") + "/t"
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    aCols.write.parquet(new Path(root, "g-one/day=2024-01-01").toString)
    bCols.write.parquet(new Path(root, "g-two/day=2024-01-02").toString)
    Seq("g-one/day=2024-01-01", "g-two/day=2024-01-02").foreach(d =>
      fs.delete(new Path(new Path(root, d), "_SUCCESS"), false))
    ManifestTable.commit(fs, rootPath, "day", Map(
      "2024-01-01" -> Some(ManifestEntry("2024-01-01", "g-one/day=2024-01-01", Nil)),
      "2024-01-02" -> Some(ManifestEntry("2024-01-02", "g-two/day=2024-01-02", Nil))))
    root
  }

  test("mapped tables read the additive union by DEFAULT; legacy drift stays loud") {
    // round 17: tables created through ManifestWrite carry a column
    // mapping, appends REGISTER new columns, and the read schema comes
    // from the mapping — additive evolution no longer needs a flag
    val root = evolvedTable()
    val got = spark.read.format("graftmanifest").load(root)
    assert(got.columns.toSeq == Seq("id", "v", "extra"))
    assert(asMaps(got.collect()) == expected)
    // LEGACY tables (no mapping) keep the round-15 loud drift guard
    val legacy = legacyDrifted(
      Seq((1L, "a")).toDF("id", "v"),
      Seq((2L, "b", 20L)).toDF("id", "v", "extra"))
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graftmanifest").option("partCol", "day").load(legacy).collect()
    }
    assert(e.getMessage.contains("drifted") && e.getMessage.contains("mergeSchema"),
      e.getMessage)
  }

  test("mergeSchema=true reads the additive union — old generations null the new column") {
    val root = evolvedTable()
    val single = spark.read.format("graftmanifest")
      .option("mergeSchema", "true").load(root)
    assert(single.columns.toSeq == Seq("id", "v", "extra"))
    assert(asMaps(single.collect()) == expected)
    // legacy union read: same flag, same rows (parity)
    val legacy = ManifestTable.read(spark, root, mergeSchema = true)
    assert(asMaps(legacy.select("id", "v", "extra").collect()) == expected)
  }

  test("partitioned: both paths merge additively with the partition column intact") {
    val root = tmpDir("gm-merge-part") + "/t"
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq((1L, "a")).toDF("id", "v").write.parquet(new Path(root, "g-one/day=2024-01-01").toString)
    Seq((2L, "b", 20L)).toDF("id", "v", "extra")
      .write.parquet(new Path(root, "g-two/day=2024-01-02").toString)
    Seq("g-one/day=2024-01-01", "g-two/day=2024-01-02").foreach(d =>
      fs.delete(new Path(new Path(root, d), "_SUCCESS"), false))
    ManifestTable.commit(fs, rootPath, "day", Map(
      "2024-01-01" -> Some(ManifestEntry("2024-01-01", "g-one/day=2024-01-01", Nil)),
      "2024-01-02" -> Some(ManifestEntry("2024-01-02", "g-two/day=2024-01-02", Nil))))
    val want = Set(
      Map("id" -> 1L, "v" -> "a", "extra" -> null, "day" -> java.sql.Date.valueOf("2024-01-01")),
      Map("id" -> 2L, "v" -> "b", "extra" -> 20L, "day" -> java.sql.Date.valueOf("2024-01-02")))
    val single = ManifestFileIndex.relation(spark, root, "day", mergeSchema = true)
    assert(single.columns.toSeq == Seq("id", "v", "extra", "day"))
    assert(asMaps(single.collect()) == want)
    val legacy = ManifestTable.read(spark, root, partCol = "day", mergeSchema = true)
    assert(legacy.columns.toSeq == Seq("id", "v", "extra", "day"),
      s"legacy column order diverged: ${legacy.columns.toSeq}")
    assert(asMaps(legacy.collect()) == want)
  }

  test("a same-name TYPE conflict fails loudly — at WRITE time on mapped tables") {
    // round 17: the column mapping records each id's type, so the
    // conflicting append is refused BEFORE any file lands — strictly
    // earlier than the old read-time error
    val root = tmpDir("gm-merge-conflict") + "/t"
    Seq((1L, 10L)).toDF("id", "x").write.format("graftmanifest").save(root)
    val e = intercept[IllegalArgumentException] {
      Seq((2L, "oops")).toDF("id", "x")
        .write.format("graftmanifest").mode(SaveMode.Append).save(root)
    }
    assert(e.getMessage.contains("'x'") && e.getMessage.contains("type conflict"),
      e.getMessage)
    // the refused write left the table fully readable
    assert(spark.read.format("graftmanifest").load(root).count() == 1)
    // LEGACY tables keep the read-time error under mergeSchema
    val legacy = legacyDrifted(
      Seq((1L, 10L)).toDF("id", "x"),
      Seq((2L, "oops")).toDF("id", "x"))
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("graftmanifest").option("partCol", "day")
        .option("mergeSchema", "true").load(legacy).collect()
    }
    assert(e2.getMessage.contains("'x'") && e2.getMessage.contains("type conflict"),
      e2.getMessage)
  }

  test("legacy RENAME-as-drop+add fails loudly under mergeSchema; opt-out reads the union") {
    // pre-field-id tables (no column mapping): the round-16 additive
    // chain contract is unchanged. Mapped tables do REAL renames
    // (metadata-only, ManifestColumns.rename — ManifestColumnMapSpec).
    val root = legacyDrifted(
      Seq((1L, "a")).toDF("id", "v"),
      Seq((2L, "b")).toDF("id", "w")) // v "renamed" to w out of band
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graftmanifest").option("partCol", "day")
        .option("mergeSchema", "true").load(root).collect()
    }
    assert(e.getMessage.contains("additive chain") && e.getMessage.contains("RENAME") &&
      e.getMessage.contains("mergeSchemaAllowMissing"), e.getMessage)
    // the explicit opt-out reads the union, missing columns null
    val got = asMaps(spark.read.format("graftmanifest").option("partCol", "day")
      .option("mergeSchema", "true").option("mergeSchemaAllowMissing", "true")
      .load(root).drop("day").collect())
    assert(got == Set(
      Map("id" -> 1L, "v" -> "a", "w" -> null),
      Map("id" -> 2L, "v" -> null, "w" -> "b")), got.toString)
    // legacy union read enforces the same contract
    val e2 = intercept[IllegalArgumentException] {
      ManifestTable.read(spark, root, partCol = "day", mergeSchema = true).collect()
    }
    assert(e2.getMessage.contains("additive chain"))
    assert(asMaps(ManifestTable.read(spark, root, partCol = "day", mergeSchema = true,
      mergeSchemaAllowMissing = true).drop("day").collect()) == got)
  }

  test("a PURE drop is indistinguishable from an add (no generation order) — reads as the union, documented") {
    val root = tmpDir("gm-drop") + "/t"
    Seq((1L, "a", 10L)).toDF("id", "v", "extra")
      .write.format("graftmanifest").save(root)
    Seq((2L, "b")).toDF("id", "v") // "dropped" extra — structurally an add in reverse
      .write.format("graftmanifest").mode(SaveMode.Append).save(root)
    val got = asMaps(spark.read.format("graftmanifest")
      .option("mergeSchema", "true").load(root).collect())
    assert(got == Set(
      Map("id" -> 1L, "v" -> "a", "extra" -> 10L),
      Map("id" -> 2L, "v" -> "b", "extra" -> null)), got.toString)
  }

  test("streaming source with mergeSchema starts from the union schema") {
    val root = evolvedTable()
    val q = spark.readStream.format("graftmanifest")
      .option("mergeSchema", "true").load(root)
      .writeStream.format("memory").queryName("gmmerge").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("gmmerge")
      assert(got.columns.toSeq == Seq("id", "v", "extra"))
      assert(asMaps(got.collect()) == expected)
    } finally q.stop()
  }
}
