package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Row-level MERGE INTO manifested tables (round-16 verdict task 1):
  * envelope-pruned file rewrites through the optimistic commit engine.
  * The ground truth everywhere is the FULL-REBUILD reference — the
  * same merge computed as whole-table dataframe algebra on the
  * pre-merge snapshot — so file-level pruning can never change
  * results, only file counts (asserted separately).
  */
class ManifestMergeSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path(tmp).getFileSystem(spark.sessionState.newHadoopConf())
  private lazy val tmp = tmpDir("manifest-merge")
  private var n = 0
  private def freshRoot(): String = { n += 1; s"$tmp/t$n" }

  /** 5-day layout, ids 0..599 spread across days by id%5, each day
    * split into ~6 files of DISJOINT id ranges (repartitionByRange) so
    * key envelopes are selective.
    */
  private def buildLayout(root: String): Unit = {
    val df = spark.range(0, 600).select(
      col("id"),
      (col("id") * 10).as("v"),
      concat(lit("row-"), col("id")).as("tag"),
      date_add(lit("2024-05-01").cast("date"), (col("id") % 5).cast("int")).as("day"))
    ManifestWrite.write(df.repartitionByRange(6, col("id")), root, "day", SaveMode.Overwrite)
  }

  private def readBack(root: String): DataFrame =
    ManifestFileIndex.relation(spark, root, "day")

  private def asSet(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  /** Reference MERGE semantics on a snapshot: whole-table algebra, no
    * file awareness at all.
    */
  private def rebuildReference(target: DataFrame, source: DataFrame, keys: Seq[String],
      update: Option[(DataFrame, DataFrame) => Seq[org.apache.spark.sql.Column]] = None,
      delete: Boolean = false, insert: Boolean = false): DataFrame = {
    val srcKeys = source.select(keys.map(col): _*).dropDuplicates(keys)
    val untouched = target.join(srcKeys, keys, "left_anti")
    val matched =
      if (delete || update.isEmpty) None
      else Some(target.alias("t").join(source.alias("s"), keys, "inner")
        .select(update.get(source, target): _*))
    val inserted =
      if (!insert) None
      else Some(source.join(target.select(keys.map(col): _*).dropDuplicates(keys),
        keys, "left_anti"))
    Seq(Some(untouched), matched, inserted).flatten
      .reduce(_.unionByName(_, allowMissingColumns = true))
      .select(target.columns.map(col): _*)
  }

  private def fileBytes(root: String): Map[String, Array[Byte]] = {
    val m = ManifestTable.resolve(fs, new Path(root)).get
    m.entries.flatMap { e =>
      ManifestTable.entryPaths(new Path(root), e).flatMap { p =>
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath)
        else Seq(p)
      }.map(fs.makeQualified).map { p =>
        val in = fs.open(p)
        val bytes = try {
          val len = fs.getFileStatus(p).getLen.toInt
          val buf = new Array[Byte](len)
          in.readFully(0, buf); buf
        } finally in.close()
        p.toString -> bytes
      }
    }.toMap
  }

  test("keyed update rewrites only matching files; untouched files byte-identical; values = full rebuild") {
    val root = freshRoot()
    buildLayout(root)
    val before = readBack(root).cache()
    val beforeBytes = fileBytes(root)
    // 20 consecutive ids — one narrow range bucket, all 5 days
    val source = spark.range(100, 120).select(col("id"), (col("id") + 7).as("nv"))
    val expected = asSet(rebuildReference(before, source, Seq("id"),
      update = Some((s, t) => Seq(col("t.id").as("id"), s("nv").as("v"),
        col("t.tag").as("tag"), col("t.day").as("day")))))

    val res = ManifestMerge(root, Seq("id"))
      .whenMatchedUpdate(Map("v" -> ((s, _) => s("nv"))))
      .run(source)

    assert(res.totalFiles == 30, s"expected 30 live files, saw ${res.totalFiles}")
    // envelope pruning must have dropped most range buckets pre-scan
    assert(res.candidateFiles < 15, s"pruning too weak: ${res.candidateFiles}/30 candidates")
    assert(res.touchedFiles <= res.candidateFiles && res.touchedFiles >= 5,
      s"touched=${res.touchedFiles} candidates=${res.candidateFiles}")
    assert(res.carriedFiles == 30 - res.touchedFiles,
      s"carried=${res.carriedFiles} touched=${res.touchedFiles}")
    assert(res.rewrittenParts.size == 5) // ids 100-119 hit every day

    assert(asSet(readBack(root)) == expected)
    // legacy union read agrees with the single-scan read
    assert(asSet(ManifestTable.read(spark, root, partCol = "day")) == expected)
    // untouched files are BYTE-identical at their original paths
    val afterBytes = fileBytes(root)
    val kept = beforeBytes.keySet.intersect(afterBytes.keySet)
    assert(kept.size == res.carriedFiles.toInt + 0, s"kept=${kept.size}")
    kept.foreach { p =>
      assert(java.util.Arrays.equals(beforeBytes(p), afterBytes(p)), s"file $p changed bytes")
    }
    before.unpersist()
  }

  test("metadata tier over carried entries: count/min/max stay zero-scan and exact after a merge") {
    val root = freshRoot()
    buildLayout(root)
    ManifestMerge(root, Seq("id"))
      .whenMatchedUpdate(Map("v" -> ((s, _) => s("nv"))))
      .run(spark.range(0, 40).select(col("id"), lit(-1L).as("nv")))
    graft.plans.ManifestMetadataAgg.ensure(spark)
    val metaDf = readBack(root).agg(count(lit(1)).as("n_rows"),
      min($"id").as("lo"), max($"id").as("hi"))
    val p = metaDf.queryExecution.optimizedPlan
    assert(p.collect { case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l }.nonEmpty
      && p.collect { case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r }.isEmpty,
      s"metadata agg should still collapse after a merge:\n$p")
    val row = metaDf.head()
    assert(row.getAs[Long]("n_rows") == 600L)
    assert(row.getAs[Long]("lo") == 0L && row.getAs[Long]("hi") == 599L)
    // history sums carried + new files
    val h = ManifestTable.history(spark, root).filter($"is_current").head()
    assert(h.getAs[Long]("row_count") == 600L)
  }

  test("manifest round-trips carry exactly; envelope skipping applies to carried files") {
    val root = freshRoot()
    buildLayout(root)
    ManifestMerge(root, Seq("id"))
      .whenMatchedUpdate(Map("v" -> ((s, _) => s("nv"))))
      .run(spark.range(300, 310).select(col("id"), lit(0L).as("nv")))
    val m = ManifestTable.resolve(fs, new Path(root)).get
    assert(m.entries.exists(_.carry.nonEmpty))
    val back = ManifestTable.deserialize(ManifestTable.serialize(m))
    assert(back.contains(m), "serialize/deserialize must round-trip carried stats")
    // carried files keep their envelopes: a narrow id filter reads few files
    val narrow = readBack(root).filter($"id" === 42L)
    assert(narrow.count() == 1)
    val scanned = narrow.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }.sum
    assert(scanned <= 6, s"envelope skipping through carry should bound the scan, read $scanned files")
  }

  test("delete-matched: rows vanish; a fully-matched file is rewritten away; oracle = rebuild") {
    val root = freshRoot()
    buildLayout(root)
    val before = readBack(root).cache()
    // delete one whole day's low range plus scattered ids
    val victims = spark.range(0, 100).select(col("id"))
    val expected = asSet(rebuildReference(before, victims, Seq("id"), delete = true))
    val res = ManifestMerge(root, Seq("id")).whenMatchedDelete().run(victims)
    assert(asSet(readBack(root)) == expected)
    assert(readBack(root).count() == 500)
    assert(res.touchedFiles >= 5 && res.touchedFiles <= 12, s"touched=${res.touchedFiles}")
    before.unpersist()
  }

  test("not-matched insert: new rows land in their partitions, including a NEW partition") {
    val root = freshRoot()
    buildLayout(root)
    val before = readBack(root).cache()
    val src = Seq(
      (1000L, 1L, "new-1000", java.sql.Date.valueOf("2024-05-02")),  // existing day
      (2000L, 2L, "new-2000", java.sql.Date.valueOf("2024-05-09")),  // NEW day
      (5L, 99L, "upd-5", java.sql.Date.valueOf("2024-05-01")),       // matched -> updated
    ).toDF("id", "nv", "tag", "day")
    val expected = asSet(rebuildReference(before,
      src.withColumnRenamed("nv", "v").withColumn("v", col("v") * 1), Seq("id"),
      update = Some((s, t) => Seq(col("t.id").as("id"), s("v").as("v"),
        col("t.tag").as("tag"), col("t.day").as("day"))),
      insert = true))
    val res = ManifestMerge(root, Seq("id"))
      .whenMatchedUpdate(Map("v" -> ((s, _) => s("v"))))
      .whenNotMatchedInsert()
      .run(src.withColumnRenamed("nv", "v"))
    assert(asSet(readBack(root)) == expected)
    assert(readBack(root).count() == 602)
    assert(res.rewrittenParts.contains("2024-05-09"))
    assert(ManifestTable.resolve(fs, new Path(root)).get.entries.map(_.part).toSet
      .contains("2024-05-09"))
    before.unpersist()
  }

  test("insert-only source missing a target column null-fills it with the right type") {
    val root = freshRoot()
    buildLayout(root)
    val src = Seq((5000L, java.sql.Date.valueOf("2024-05-03")))
      .toDF("id", "day") // no v, no tag
    ManifestMerge(root, Seq("id")).whenNotMatchedInsert().run(src)
    val row = readBack(root).filter($"id" === 5000L).head()
    assert(row.isNullAt(row.fieldIndex("v")) && row.isNullAt(row.fieldIndex("tag")))
    assert(readBack(root).count() == 601)
  }

  test("no-op merges: empty source, and no-match-no-insert, commit NOTHING") {
    val root = freshRoot()
    buildLayout(root)
    val seq0 = ManifestTable.resolve(fs, new Path(root)).get.seq
    val r1 = ManifestMerge(root, Seq("id")).whenMatchedDelete()
      .run(spark.range(0, 0).select(col("id")))
    val r2 = ManifestMerge(root, Seq("id")).whenMatchedDelete()
      .run(spark.range(10000, 10010).select(col("id")))
    assert(r1.touchedFiles == 0 && r2.touchedFiles == 0)
    assert(r2.candidateFiles == 0, "out-of-range keys must prune EVERY file")
    assert(ManifestTable.resolve(fs, new Path(root)).get.seq == seq0,
      "a no-op merge must not advance the manifest")
  }

  test("duplicate source keys fail loudly with matched actions; opt-out accepted; inserts unaffected") {
    val root = freshRoot()
    buildLayout(root)
    val dup = Seq((5L, 1L), (5L, 2L)).toDF("id", "nv")
    val e = intercept[IllegalArgumentException] {
      ManifestMerge(root, Seq("id"))
        .whenMatchedUpdate(Map("v" -> ((s, _) => s("nv")))).run(dup)
    }
    assert(e.getMessage.contains("duplicate keys"))
    // update expressions may not assign keys or the partition column
    intercept[IllegalArgumentException] {
      ManifestMerge(root, Seq("id")).whenMatchedUpdate(Map("id" -> ((s, _) => s("nv"))))
    }
    intercept[IllegalArgumentException] {
      ManifestMerge(root, Seq("id")).whenMatchedUpdate(Map("day" -> ((s, _) => s("nv"))))
    }
  }

  test("staleness: an interleaved commit forces re-derivation; both changes survive") {
    val root = freshRoot()
    buildLayout(root)
    val src = spark.range(200, 210).select(col("id"), lit(-5L).as("nv"))
    @volatile var fired = false
    ManifestMerge.beforeMergeCommit = () => {
      if (!fired) {
        fired = true
        // interleave: a second merge DELETES ids 580-599 and commits first
        ManifestMerge(root, Seq("id")).whenMatchedDelete()
          .run(spark.range(580, 600).select(col("id")))
        ()
      }
    }
    try {
      val res = ManifestMerge(root, Seq("id"))
        .whenMatchedUpdate(Map("v" -> ((s, _) => s("nv"))))
        .run(src)
      assert(res.attempts == 2, s"expected one staleness retry, got ${res.attempts}")
    } finally ManifestMerge.beforeMergeCommit = () => ()
    val after = readBack(root)
    assert(after.count() == 580) // the interleaved delete survived
    assert(after.filter($"id" >= 200 && $"id" < 210).select("v").as[Long].collect().toSet == Set(-5L))
  }

  test("post-commit transient failure reads as success; no double apply") {
    val root = freshRoot()
    buildLayout(root)
    @volatile var fired = false
    ManifestMerge.afterMergeCommit = () => {
      if (!fired) { fired = true; throw new java.io.IOException("transient post-commit") }
    }
    try {
      val res = ManifestMerge(root, Seq("id"))
        .whenMatchedUpdate(Map("v" -> ((s, _) => s("nv"))))
        .run(spark.range(50, 60).select(col("id"), lit(123L).as("nv")))
      assert(res.touchedFiles > 0)
    } finally ManifestMerge.afterMergeCommit = () => ()
    assert(fired)
    val vs = readBack(root).filter($"id" >= 50 && $"id" < 60).select("v").as[Long].collect().toSet
    assert(vs == Set(123L))
    assert(readBack(root).count() == 600)
  }

  test("gc keeps carried generations alive; superseded ones retire after the history window") {
    val root = freshRoot()
    buildLayout(root)
    val origGen = ManifestTable.resolve(fs, new Path(root)).get.entries.head.dir.split('/').head
    ManifestMerge(root, Seq("id"))
      .whenMatchedUpdate(Map("v" -> ((s, _) => s("nv"))))
      .run(spark.range(0, 10).select(col("id"), lit(1L).as("nv")))
    // merge ran gc; the original generation holds carried files — must survive
    assert(fs.exists(new Path(root, origGen)), "carried generation must survive gc")
    assert(asSet(readBack(root)).size == 600)
    // now rewrite EVERYTHING twice (KeepCommits=2) — the original gen
    // becomes unreferenced by any kept commit and gc retires it
    val all = readBack(root).select("id", "v", "tag", "day")
    ManifestWrite.write(all.repartitionByRange(6, col("id")).select("id", "v", "tag", "day"),
      root, "day", SaveMode.Overwrite)
    ManifestWrite.write(readBack(root).repartitionByRange(6, col("id"))
      .select("id", "v", "tag", "day"), root, "day", SaveMode.Overwrite)
    ManifestTable.gc(fs, new Path(root), orphanRetentionMs = 0L)
    assert(!fs.exists(new Path(root, origGen)), "fully superseded generation should be gc'd")
    assert(readBack(root).count() == 600)
  }

  test("unpartitioned table: file-granular merge with carry at the root level") {
    val root = freshRoot()
    val df = spark.range(0, 300).select(col("id"), (col("id") % 7).as("v"))
    ManifestWrite.write(df.repartitionByRange(5, col("id")), root, "", SaveMode.Overwrite)
    val before = ManifestTable.read(spark, root).cache()
    val src = spark.range(10, 20).select(col("id"), lit(0L).as("nv"))
    val expected = asSet(rebuildReference(before, src, Seq("id"),
      update = Some((s, t) => Seq(col("t.id").as("id"), s("nv").as("v")))))
    val res = ManifestMerge(root, Seq("id"), partCol = "")
      .whenMatchedUpdate(Map("v" -> ((s, _) => s("nv"))))
      .run(src)
    assert(res.totalFiles == 5 && res.touchedFiles == 1 && res.carriedFiles == 4,
      s"$res")
    assert(asSet(ManifestTable.read(spark, root)) == expected)
    assert(asSet(ManifestFileIndex.relation(spark, root, "")) == expected)
    before.unpersist()
  }

  test("merge composes with compactDays: a later partition rewrite folds carried files back in") {
    val root = freshRoot()
    buildLayout(root)
    ManifestMerge(root, Seq("id"))
      .whenMatchedUpdate(Map("v" -> ((s, _) => s("nv"))))
      .run(spark.range(0, 30).select(col("id"), lit(-9L).as("nv")))
    val expected = asSet(readBack(root))
    graft.operators.StorageOps.compactDays(spark, root, Seq("2024-05-01", "2024-05-02"))
    val m = ManifestTable.resolve(fs, new Path(root)).get
    // compacted entries are carry-free again (whole-partition rewrite)
    assert(m.entries.filter(e => Set("2024-05-01", "2024-05-02").contains(e.part))
      .forall(_.carry.isEmpty))
    assert(asSet(readBack(root)) == expected)
    assert(asSet(ManifestTable.read(spark, root, partCol = "day")) == expected)
  }
}
