package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SaveMode

/** Round 15: the DESCRIBE-HISTORY surface. One row per retained valid
  * version, newest first, everything derived from the commit files
  * alone: file/byte/row totals from recorded stats (NULL when a
  * version predates stats — unknown, never guessed), `is_current` on
  * the newest, and every listed version accepted by `versionAsOf`.
  */
class ManifestHistorySpec extends SparkSpec {
  import spark.implicits._

  test("history lists retained versions newest-first with exact stats-derived totals") {
    val dir = tmpDir("hist") + "/t"
    ManifestWrite.write(spark.range(0, 100).selectExpr("id").coalesce(1),
      dir, "", SaveMode.Append)
    ManifestWrite.write(spark.range(100, 130).selectExpr("id").coalesce(1),
      dir, "", SaveMode.Append)
    val h = ManifestTable.history(spark, dir).collect()
    assert(h.length == 2, s"KeepCommits=2 should retain both versions, got ${h.length}")
    assert(h(0).getAs[Long]("version") > h(1).getAs[Long]("version"))
    assert(h(0).getAs[Boolean]("is_current") && !h(1).getAs[Boolean]("is_current"))
    assert(h(0).getAs[Long]("row_count") == 130L) // both generations live
    assert(h(1).getAs[Long]("row_count") == 100L)
    assert(h(0).getAs[Int]("n_entries") == 2 && h(1).getAs[Int]("n_entries") == 1)
    assert(h(0).getAs[Long]("n_files") == 2L && h(0).getAs[Long]("bytes") > 0L)
    // every listed version is versionAsOf-addressable with the counts it claims
    h.foreach { row =>
      val v = row.getAs[Long]("version")
      val cnt = ManifestFileIndex.relation(spark, dir, "", asOfSeq = Some(v)).count()
      assert(cnt == row.getAs[Long]("row_count"),
        s"versionAsOf($v) row count drifted from history's claim")
    }
    // the DSv2 option surface returns the same rows
    val viaOption = spark.read.format("graftmanifest")
      .option("history", "true").load(dir).collect()
    assert(viaOption.map(_.toString).sorted.toSeq == h.map(_.toString).sorted.toSeq)
  }

  test("a stats-less (pre-upgrade) version reports NULL sizes, never a guess") {
    val dir = tmpDir("hist-legacy") + "/t"
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    spark.range(0, 20).selectExpr("id").coalesce(1)
      .write.parquet(new Path(root, "g-old").toString)
    fs.delete(new Path(new Path(root, "g-old"), "_SUCCESS"), false)
    ManifestTable.commit(fs, root, "",
      Map("g-old" -> Some(ManifestEntry("g-old", "g-old", Nil)))) // no stats
    ManifestWrite.write(spark.range(20, 30).selectExpr("id").coalesce(1),
      dir, "", SaveMode.Append)
    val h = ManifestTable.history(spark, dir).orderBy($"version".desc).collect()
    assert(h.length == 2)
    // the newest version CARRIES the stats-less legacy entry: unknown
    val cur = h(0)
    assert(cur.isNullAt(cur.fieldIndex("n_files")) &&
      cur.isNullAt(cur.fieldIndex("bytes")) &&
      cur.isNullAt(cur.fieldIndex("row_count")),
      "a version containing any stats-less entry must report NULL totals")
  }
}
