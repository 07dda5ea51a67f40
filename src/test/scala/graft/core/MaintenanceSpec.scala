package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("compactParquet merges small files via a manifest commit, preserves data") {
    val dir = tmpDir("compact") + "/t"
    (1 to 1000).map(i => (i.toLong, s"row-$i")).toDF("id", "v")
      .repartition(20).write.parquet(dir)
    def liveFiles() = {
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      val m = ManifestTable.resolve(fs, root).get
      m.entries.flatMap(e => ManifestTable.entryPaths(root, e)).flatMap { p =>
        val st = fs.getFileStatus(p)
        if (st.isFile) Seq(st.getPath) else fs.listStatus(p).toSeq
          .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
          .map(_.getPath)
      }
    }
    val (before, after) = Maintenance.compactParquet(spark, dir, targetBytes = 1L << 30)
    assert(before == 20)
    assert(after == 1) // 20 tiny files fit one 1 GB target
    assert(liveFiles().length == 1)
    // data intact, read through the manifest resolver
    val back = Maintenance.readTable(spark, dir)
    assert(back.count() == 1000)
    assert(back.agg(sum($"id")).as[Long].head() == (1L to 1000L).sum)
    // second compaction retires the adopted originals past the
    // reader-grace window: original 20 files reclaimed by gc
    val (b2, a2) = Maintenance.compactParquet(spark, dir, targetBytes = 1L << 30)
    assert(b2 == 1 && a2 == 1)
    val top = new java.io.File(dir).listFiles().map(_.getName).toSeq
    assert(!top.exists(_.endsWith(".parquet")),
      s"adopted originals not reclaimed after the history window: $top")
    assert(Maintenance.readTable(spark, dir).count() == 1000)
  }

  test("compactParquet refuses a Hive-partitioned layout instead of flattening it") {
    val dir = tmpDir("compact3") + "/t"
    (1 to 100).map(i => (i.toLong, i % 3)).toDF("id", "part")
      .write.partitionBy("part").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      Maintenance.compactParquet(spark, dir)
    }
    assert(e.getMessage.contains("partition subdirectories"))
    // table untouched
    assert(spark.read.parquet(dir).count() == 100)
  }

  test("a failed rewrite leaves the previous commit live; rerun converges") {
    val dir = tmpDir("compact4") + "/t"
    (1 to 300).map(i => (i.toLong, s"r$i")).toDF("id", "v")
      .repartition(5).write.parquet(dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // crash simulation: a generation directory was written but the
    // commit never happened (process died between write and commit)
    Maintenance.compactParquet(spark, dir, targetBytes = 1L << 30)
    val orphan = new org.apache.hadoop.fs.Path(root, ManifestTable.GenPrefix + "orphan")
    fs.mkdirs(orphan)
    val out = fs.create(new org.apache.hadoop.fs.Path(orphan, "part-zzz.parquet"), true)
    out.write(Array.fill(64)(7.toByte)); out.close()
    // the orphan is invisible to readers
    assert(Maintenance.readTable(spark, dir).count() == 300)
    // and an aged orphan is swept (retention 0 = everything is aged)
    val reclaimed = ManifestTable.gc(fs, root, orphanRetentionMs = 0L)
    assert(reclaimed >= 64, s"orphan not reclaimed: $reclaimed")
    assert(!fs.exists(orphan))
    assert(Maintenance.readTable(spark, dir).count() == 300)
  }

  test("compactParquet splits to multiple files when bytes exceed the target") {
    val dir = tmpDir("compact2") + "/t"
    (1 to 5000).map(i => (i.toLong, "x" * 100)).toDF("id", "v")
      .repartition(10).write.parquet(dir)
    val total = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.length()).sum
    val (_, after) = Maintenance.compactParquet(spark, dir, targetBytes = total / 3)
    assert(after >= 3 && after <= 4)
    assert(Maintenance.readTable(spark, dir).count() == 5000)
  }
}
