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

  test("timestampAsOf resolves to the newest commit at or before the instant; misses are loud") {
    val dir = tmpDir("tsasof") + "/t"
    ManifestWrite.write(spark.range(0, 3).toDF("id").coalesce(1), dir, "", SaveMode.Append)
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val v1 = ManifestTable.resolve(fs, new Path(dir)).get.seq
    Thread.sleep(1100) // commit-file mtimes are the clock; separate them
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(1100)
    ManifestWrite.write(spark.range(3, 5).toDF("id").coalesce(1), dir, "", SaveMode.Append)
    def readAt(ts: String) = spark.read.format("graftmanifest")
      .option("timestampAsOf", ts).load(dir).as[Long].collect().toSet
    // an instant between the commits sees only v1's rows
    assert(readAt(betweenMs.toString) == Set(0L, 1L, 2L))
    // the ISO form resolves identically
    assert(readAt(java.time.Instant.ofEpochMilli(betweenMs).toString) == Set(0L, 1L, 2L))
    // "now" sees everything
    assert(readAt(System.currentTimeMillis().toString) == Set(0L, 1L, 2L, 3L, 4L))
    // an instant before the retained history fails loudly, never
    // serving the oldest state as if it were that old
    val v1Mtime = fs.getFileStatus(
      new Path(dir, f"${ManifestTable.CommitsDir}/$v1%020d")).getModificationTime
    val e = intercept[IllegalArgumentException] { readAt((v1Mtime - 10000).toString) }
    assert(e.getMessage.contains("precedes"), e.getMessage)
    // garbage neither millis nor ISO is named
    val e2 = intercept[IllegalArgumentException] { readAt("yesterday-ish") }
    assert(e2.getMessage.contains("ISO-8601"), e2.getMessage)
    // the two time-travel options are mutually exclusive
    intercept[IllegalArgumentException] {
      spark.read.format("graftmanifest")
        .option("timestampAsOf", betweenMs.toString)
        .option("versionAsOf", v1.toString).load(dir).collect()
    }
    ()
  }

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
