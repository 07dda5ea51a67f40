package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Column mapping via manifest-held parquet field ids (round-17
  * verdict task 7 — the Delta column-mapping / Iceberg field-id
  * discipline): a RENAME is one pointer commit, no data file moves;
  * every reader keeps matching old files by id; a DROP retires the id
  * so a re-added same-name column can never resurrect the old bytes;
  * tables whose generations predate field ids refuse loudly, naming
  * the Overwrite upgrade path.
  */
class ManifestColumnMapSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp = tmpDir("colmap")
  private var n = 0
  private def freshRoot(): String = { n += 1; s"$tmp/t$n" }
  private def fs = new Path(tmp).getFileSystem(spark.sessionState.newHadoopConf())

  private def build(root: String): Unit =
    ManifestWrite.write(
      spark.range(0, 300).select(col("id"), (col("id") * 10).as("v"),
        concat(lit("u"), (col("id") % 7).cast("int")).as("who"),
        concat(lit("d"), (col("id") % 3).cast("int")).as("day")),
      root, "day", SaveMode.Overwrite)

  private def dataFileBytes(root: String): Map[String, Long] = {
    val rootPath = new Path(root)
    ManifestTable.liveFileRefs(fs, rootPath,
      ManifestTable.resolve(fs, rootPath).get)
      .map(r => r.rootRel -> fs.getFileStatus(new Path(rootPath, r.rootRel))
        .getModificationTime).toMap
  }

  test("creation assigns field ids; rename is metadata-only on both read paths") {
    val root = freshRoot()
    build(root)
    val m0 = ManifestTable.resolve(fs, new Path(root)).get
    assert(m0.cols.map(e => e.id -> e.logical) == Seq(1 -> "id", 2 -> "v", 3 -> "who"))
    val before = dataFileBytes(root)
    ManifestColumns.rename(spark, root, "v", "amount")
    assert(dataFileBytes(root) == before, "a rename must not touch any data file")
    // single-scan path
    val rel = ManifestFileIndex.relation(spark, root, "day")
    assert(rel.columns.toSeq == Seq("id", "amount", "who", "day"))
    assert(rel.agg(sum("amount")).head().getLong(0) == (0 until 300).map(_ * 10L).sum)
    // filter pushdown on the renamed column still answers correctly
    assert(rel.filter(col("amount") === 50L).select("id").head().getLong(0) == 5L)
    // legacy union path
    val legacy = ManifestTable.read(spark, root)
    assert(legacy.columns.contains("amount") && !legacy.columns.contains("v"))
    assert(legacy.agg(sum("amount")).head().getLong(0) == rel.agg(sum("amount")).head().getLong(0))
  }

  test("merge and change feed keep working across a rename (old files matched by id)") {
    val root = freshRoot()
    build(root)
    ManifestColumns.rename(spark, root, "v", "amount")
    ManifestMerge(root, Seq("id"))
      .whenMatchedUpdate(Map("amount" -> ((s, _) => s("amount"))))
      .withChangeFeed()
      .run(spark.range(0, 20).select(col("id"), lit(-1L).as("amount"))): Unit
    val out = ManifestFileIndex.relation(spark, root, "day")
    assert(out.filter(col("amount") === -1L).count() == 20)
    assert(out.count() == 300)
    val v = ManifestTable.resolve(fs, new Path(root)).get.seq
    val feed = ManifestChanges.between(spark, root, v, v)
    assert(feed.columns.contains("amount"))
    assert(feed.filter(col(ManifestChanges.ChangeTypeCol) === "update_postimage")
      .agg(sum("amount")).head().getLong(0) == -20L)
  }

  test("rename purges stale envelopes; new writes record under the new name") {
    val root = freshRoot()
    build(root)
    val pre = ManifestTable.resolve(fs, new Path(root)).get
    assert(pre.entries.exists(_.stats.exists(_.cols.exists(_.col == "v"))))
    ManifestColumns.rename(spark, root, "v", "amount")
    val post = ManifestTable.resolve(fs, new Path(root)).get
    assert(!post.entries.exists(_.allStats.exists(_.cols.exists(_.col == "v"))),
      "envelopes recorded under the old name must be purged (a reused name would mis-skip)")
    // a compaction rewrites files -> fresh envelopes under the NEW name
    graft.operators.StorageOps.compactDays(spark, root, Seq("d0"))
    val after = ManifestTable.resolve(fs, new Path(root)).get
    val d0 = after.entries.find(_.part == "d0").get
    assert(d0.stats.exists(_.cols.exists(_.col == "amount")))
    assert(ManifestFileIndex.relation(spark, root, "day").count() == 300)
  }

  test("drop retires the id AND the name: reuse refused, old bytes never resurrect") {
    val root = freshRoot()
    build(root)
    ManifestColumns.drop(spark, root, "who")
    val rel = ManifestFileIndex.relation(spark, root, "day")
    assert(!rel.columns.contains("who"), "dropped column must disappear from reads")
    assert(rel.count() == 300)
    // Name reuse is REFUSED: Spark pushes data filters to parquet by
    // NAME while projecting by field id, so a reused name would bind a
    // pushed predicate to the retired column's bytes inside old files
    // and silently drop the wrong rows (demonstrated during this
    // round's design — `who IS NULL` returned 0 with pushdown, the
    // true count without). Refusal is the correctness stance.
    val root2 = freshRoot()
    ManifestWrite.write(
      spark.range(0, 50).select(col("id"), lit("keep").as("who")),
      root2, "", SaveMode.Append)
    ManifestColumns.drop(spark, root2, "who")
    val e = intercept[IllegalArgumentException] {
      ManifestWrite.write(
        spark.range(50, 60).select(col("id"), lit("fresh").as("who")),
        root2, "", SaveMode.Append)
    }
    assert(e.getMessage.contains("cannot be reused"))
    // a DIFFERENT name extends cleanly with a fresh id; old rows null
    ManifestWrite.write(
      spark.range(50, 60).select(col("id"), lit("fresh").as("who2")),
      root2, "", SaveMode.Append)
    val m2 = ManifestTable.resolve(fs, new Path(root2)).get
    assert(m2.cols.map(e2 => (e2.id, e2.logical)) == Seq(1 -> "id", 2 -> "", 3 -> "who2"))
    assert(m2.cols.exists(e2 => e2.dropped && e2.retired == Seq("who")))
    val out = ManifestTable.read(spark, root2)
    assert(out.count() == 60)
    assert(!out.columns.contains("who"))
    assert(out.filter(col("who2") === "fresh").count() == 10)
    assert(out.filter(col("who2").isNull).count() == 50)
  }

  test("rename to a retired name is refused (pushed-filter name binding)") {
    val root = freshRoot()
    build(root)
    ManifestColumns.rename(spark, root, "v", "amount")
    val e = intercept[IllegalArgumentException] {
      ManifestColumns.rename(spark, root, "who", "v")
    }
    assert(e.getMessage.contains("cannot be reused"))
    // an Overwrite rewrite reclaims the name (fresh files, fresh ids)
    ManifestWrite.write(ManifestFileIndex.relation(spark, root, "day"),
      root, "day", SaveMode.Overwrite)
    ManifestColumns.rename(spark, root, "who", "v")
    assert(ManifestFileIndex.relation(spark, root, "day")
      .columns.toSeq == Seq("id", "amount", "v", "day"))
  }

  test("legacy (pre-field-id) tables refuse rename, and Overwrite upgrades them") {
    val root = freshRoot()
    // adopted plain layout: files never carried ids
    val df = spark.range(0, 60).select(col("id"), (col("id") * 2).as("v"),
      concat(lit("d"), (col("id") % 2).cast("int")).as("day"))
    df.write.partitionBy("day").parquet(root)
    ManifestTable.adoptIfPlain(fs, new Path(root), "day"): Unit
    val e = intercept[IllegalStateException] {
      ManifestColumns.rename(spark, root, "v", "w")
    }
    assert(e.getMessage.contains("rewrite the table"))
    // the documented upgrade: one Overwrite
    ManifestWrite.write(ManifestTable.read(spark, root), root, "day", SaveMode.Overwrite)
    ManifestColumns.rename(spark, root, "v", "w")
    assert(ManifestFileIndex.relation(spark, root, "day").columns.contains("w"))
  }

  test("streaming source serves the renamed schema over old and new generations") {
    val root = freshRoot()
    ManifestWrite.write(spark.range(0, 30).select(col("id"), (col("id") * 3).as("v")),
      root, "", SaveMode.Append)
    ManifestColumns.rename(spark, root, "v", "score")
    ManifestWrite.write(spark.range(30, 40).select(col("id"), (col("id") * 3).as("score")),
      root, "", SaveMode.Append)
    val stream = spark.readStream.format("graftmanifest").load(root)
    assert(stream.schema.fieldNames.toSeq == Seq("id", "score"))
    val q = stream.writeStream.format("memory").queryName("colmap_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("colmap_stream")
    assert(got.count() == 40)
    assert(got.agg(sum("score")).head().getLong(0) == (0 until 40).map(_ * 3L).sum)
  }

  test("append after rename extends nothing; new column appends extend with fresh ids") {
    val root = freshRoot()
    ManifestWrite.write(spark.range(0, 10).select(col("id"), (col("id") * 5).as("v")),
      root, "", SaveMode.Append)
    ManifestColumns.rename(spark, root, "v", "val5")
    ManifestWrite.write(
      spark.range(10, 20).select(col("id"), (col("id") * 5).as("val5"),
        lit("x").as("tag")),
      root, "", SaveMode.Append)
    val m = ManifestTable.resolve(fs, new Path(root)).get
    assert(m.cols.map(e => e.id -> e.logical) == Seq(1 -> "id", 2 -> "val5", 3 -> "tag"))
    val out = ManifestTable.read(spark, root)
    assert(out.count() == 20)
    assert(out.filter(col("tag").isNull).count() == 10, "pre-add rows read the new column as null")
    assert(out.agg(sum("val5")).head().getLong(0) == (0 until 20).map(_ * 5L).sum)
  }
}
