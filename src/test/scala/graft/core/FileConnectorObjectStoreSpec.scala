package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Round-13 verdict task 3: the file connector's keyed upsert
  * (InsertIgnore/Replace read-union-rewrite) was the LAST user of the
  * two-rename swap — atomic on one local FS, but a non-atomic O(data)
  * copy window on S3-family stores where `rename` does not exist. On
  * remote roots it now goes through [[ManifestTable]] pointer commits
  * (adopt-if-plain on first touch, fresh immutable `g-*` generation,
  * one create-if-absent pointer flip), the same discipline as the
  * layout engine; the java.nio ATOMIC_MOVE fast path survives only for
  * local paths. Every test here runs on COPY-RENAME MemFs (S3A
  * semantics), including a planted mid-copy crash that must leave the
  * previous state live — never a partial table, never a mix.
  */
class FileConnectorObjectStoreSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("memfs://shared/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def freshStore(): FileConnector = {
    MemFsStore.clear()
    MemFsStore.renameAsCopy = true
    spark.sparkContext.hadoopConfiguration
      .set("fs.memfs.impl", classOf[MemFs].getName)
    FileConnector("obj", "memfs://shared/conn", "parquet")
  }

  test("upsert semantics on copy-rename storage match the local connector exactly") {
    val c = freshStore()
    c.write(Seq((1, "old"), (2, "keep")).toDF("id", "v"), "t", WriteMode.Overwrite)
    val incoming = Seq((1, "new"), (3, "add")).toDF("id", "v")
    c.write(incoming, "t", WriteMode.InsertIgnore(Seq("id")))
    assert(c.read(spark, "t").as[(Int, String)].collect().toMap ==
      Map(1 -> "old", 2 -> "keep", 3 -> "add"))
    c.write(incoming, "t", WriteMode.Replace(Seq("id")))
    assert(c.read(spark, "t").as[(Int, String)].collect().toMap ==
      Map(1 -> "new", 2 -> "keep", 3 -> "add"))
    // the rewrite went through the manifest, not a directory rename
    assert(ManifestTable.resolve(fs, new Path(c.pathFor("t"))).isDefined,
      "remote upsert did not adopt the table into the manifest protocol")
  }

  test("append and overwrite on a manifested remote table flip one pointer; rows exactly-once") {
    val c = freshStore()
    c.write(Seq((1, "a")).toDF("id", "v"), "t", WriteMode.Overwrite)
    c.write(Seq((1, "a2")).toDF("id", "v"), "t", WriteMode.Replace(Seq("id"))) // manifests
    c.write(Seq((2, "b")).toDF("id", "v"), "t", WriteMode.Append)
    c.write(Seq((3, "c")).toDF("id", "v"), "t", WriteMode.Append)
    assert(c.read(spark, "t").as[(Int, String)].collect().toMap ==
      Map(1 -> "a2", 2 -> "b", 3 -> "c"))
    assert(c.count(spark, "t") == 3)
    // overwrite retires every prior entry through the manifest (the
    // _commits dir must survive — SaveMode.Overwrite would delete it
    // out from under concurrent readers)
    c.write(Seq((9, "z")).toDF("id", "v"), "t", WriteMode.Overwrite)
    assert(c.read(spark, "t").as[(Int, String)].collect().toMap == Map(9 -> "z"))
    val m = ManifestTable.resolve(fs, new Path(c.pathFor("t")))
    assert(m.isDefined && m.get.entries.size == 1, s"stale entries survived overwrite: $m")
  }

  test("a planted mid-copy crash during the upsert leaves the previous state live — never a mix") {
    val c = freshStore()
    c.write((1 to 50).map(i => (i, s"v$i")).toDF("id", "v"), "t", WriteMode.Overwrite)
    val before = c.read(spark, "t").as[(Int, String)].collect().toMap
    assert(before.size == 50)
    val incoming = Seq((1, "NEW"), (51, "ADD")).toDF("id", "v")
    // crash inside Spark's own job-commit renames (non-atomic copies on
    // this FS) at several successive steps; the latch keeps the
    // "process" dead through task retries
    var fired = 0
    (1 to 6).foreach { step =>
      MemFsStore.renameCopyCrashAfter.set(step)
      val crashed =
        try { c.write(incoming, "t", WriteMode.Replace(Seq("id"))); false }
        catch { case _: Throwable => true }
      if (crashed) fired += 1
      MemFsStore.disarmCrash()
      val now = c.read(spark, "t").as[(Int, String)].collect().toMap
      assert(now == before || (now == before + (1 -> "NEW") + (51 -> "ADD")),
        s"step-$step crash tore the visible table: ${now.size} rows")
    }
    assert(fired > 0, "injection never fired — the upsert write does no renames?")
    // rerun converges, value-exact
    c.write(incoming, "t", WriteMode.Replace(Seq("id")))
    assert(c.read(spark, "t").as[(Int, String)].collect().toMap ==
      before + (1 -> "NEW") + (51 -> "ADD"))
    // aged gc leaves only manifest-named generations on disk
    ManifestTable.gc(fs, new Path(c.pathFor("t")), keepCommits = 1,
      orphanRetentionMs = 0L)
    val live = ManifestTable.resolve(fs, new Path(c.pathFor("t"))).get
      .entries.map(_.dir.split('/').head).toSet
    val onDisk = fs.listStatus(new Path(c.pathFor("t"))).map(_.getPath.getName)
      .filter(_.startsWith(ManifestTable.GenPrefix)).toSet
    assert(onDisk.subsetOf(live), s"crash husks survived aged gc: ${onDisk -- live}")
    assert(c.read(spark, "t").as[(Int, String)].collect().toMap ==
      before + (1 -> "NEW") + (51 -> "ADD"), "gc touched live data")
  }

  test("round 14: a remote table is manifested from its FIRST write — no plain-save fallthrough for overwrite/append") {
    val c = freshStore()
    // fresh overwrite: pointer-flip discipline from write one
    c.write(Seq((1, "a")).toDF("id", "v"), "fresh_ow", WriteMode.Overwrite)
    assert(ManifestTable.resolve(fs, new Path(c.pathFor("fresh_ow"))).isDefined,
      "fresh overwrite fell through to plain SaveMode.Overwrite")
    assert(c.read(spark, "fresh_ow").as[(Int, String)].collect().toMap == Map(1 -> "a"))
    // fresh append: same
    c.write(Seq((2, "b")).toDF("id", "v"), "fresh_ap", WriteMode.Append)
    assert(ManifestTable.resolve(fs, new Path(c.pathFor("fresh_ap"))).isDefined,
      "fresh append fell through to plain SaveMode.Append")
    c.write(Seq((3, "c")).toDF("id", "v"), "fresh_ap", WriteMode.Append)
    assert(c.read(spark, "fresh_ap").as[(Int, String)].collect().toMap ==
      Map(2 -> "b", 3 -> "c"))
  }

  test("round 14: append/overwrite on a PLAIN remote layout adopt it in place — old rows stay visible and become gc-able") {
    val c = freshStore()
    // plant a plain (pre-manifest) layout the way an external writer
    // or an older engine version would have left it
    Seq((1, "old"), (2, "keep")).toDF("id", "v")
      .write.parquet(c.pathFor("t"))
    assert(ManifestTable.resolve(fs, new Path(c.pathFor("t"))).isEmpty)
    c.write(Seq((3, "new")).toDF("id", "v"), "t", WriteMode.Append)
    assert(c.read(spark, "t").as[(Int, String)].collect().toMap ==
      Map(1 -> "old", 2 -> "keep", 3 -> "new"),
      "adopted rows vanished after the manifested append")
    // overwrite retires BOTH the adopted files and the appended gen
    c.write(Seq((9, "z")).toDF("id", "v"), "t", WriteMode.Overwrite)
    assert(c.read(spark, "t").as[(Int, String)].collect().toMap == Map(9 -> "z"))
    // after the history window passes, gc reclaims the adopted originals
    ManifestTable.gc(fs, new Path(c.pathFor("t")), keepCommits = 1, orphanRetentionMs = 0L)
    val liveParts = fs.listStatus(new Path(c.pathFor("t"))).map(_.getPath.getName)
      .filter(n => n.startsWith("part-")).toSeq
    assert(liveParts.isEmpty, s"adopted plain files never became gc-able: $liveParts")
    assert(c.read(spark, "t").as[(Int, String)].collect().toMap == Map(9 -> "z"))
  }

  test("round 14: a crash during a fresh table's FIRST write never surfaces partial data to readers") {
    val c = freshStore()
    val incoming = (1 to 40).map(i => (i, s"v$i")).toDF("id", "v")
    var fired = 0
    (1 to 4).foreach { step =>
      MemFsStore.renameCopyCrashAfter.set(step)
      val crashed =
        try { c.write(incoming, "first", WriteMode.Overwrite); false }
        catch { case _: Throwable => true }
      if (crashed) fired += 1
      MemFsStore.disarmCrash()
      // a reader must see either the complete table or a loud
      // "no committed data" — NEVER a partial row set
      val seen =
        try Some(c.read(spark, "first").as[(Int, String)].collect().toMap)
        catch { case _: Exception => None }
      seen.foreach(m => assert(m.size == 40,
        s"step-$step crash surfaced a PARTIAL table: ${m.size} rows"))
    }
    assert(fired > 0, "injection never fired — the first write does no renames?")
    // rerun converges value-exactly over the debris
    c.write(incoming, "first", WriteMode.Overwrite)
    assert(c.read(spark, "first").as[(Int, String)].collect().toMap.size == 40)
    assert(ManifestTable.resolve(fs, new Path(c.pathFor("first"))).isDefined)
  }

  test("csv tables get the same manifest discipline; listIndexes never leaks manifest internals") {
    val c = FileConnector("objcsv", "memfs://shared/conncsv", "csv")
    MemFsStore.clear()
    MemFsStore.renameAsCopy = true
    spark.sparkContext.hadoopConfiguration
      .set("fs.memfs.impl", classOf[MemFs].getName)
    c.write(Seq((1, "a"), (2, "b")).toDF("id", "v"), "sub-t", WriteMode.Overwrite)
    c.write(Seq((2, "B"), (3, "C")).toDF("id", "v"), "sub-t", WriteMode.Replace(Seq("id")))
    assert(c.read(spark, "sub-t").selectExpr("cast(id as int)", "v")
      .as[(Int, String)].collect().toMap == Map(1 -> "a", 2 -> "B", 3 -> "C"))
    assert(c.listIndexes(spark) == Seq("sub-t"),
      s"catalog leaked manifest internals: ${c.listIndexes(spark)}")
  }
}
