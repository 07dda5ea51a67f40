package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("compactParquet merges small files, preserves data, leaves no staging debris") {
    val dir = tmpDir("compact") + "/t"
    (1 to 1000).map(i => (i.toLong, s"row-$i")).toDF("id", "v")
      .repartition(20).write.parquet(dir)
    val parent = new java.io.File(dir).getParentFile
    def files() = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))

    assert(files().length == 20)
    val (before, after) = Maintenance.compactParquet(spark, dir, targetBytes = 1L << 30)
    assert(before == 20)
    assert(after == 1) // 20 tiny files fit one 1 GB target
    assert(files().length == 1)
    // data intact
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    assert(back.agg(sum($"id")).as[Long].head() == (1L to 1000L).sum)
    // no staging/retired leftovers beside the table
    assert(!parent.listFiles().exists(f =>
      f.getName.contains(".compact-") || f.getName.contains(".old-")))
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

  test("crash between the two swap renames: next call restores the parked directory") {
    val dir = tmpDir("compact4") + "/t"
    (1 to 300).map(i => (i.toLong, s"r$i")).toDF("id", "v")
      .repartition(5).write.parquet(dir)
    // simulate the crash window: table retired, swap-in never happened
    val parked = new java.io.File(dir + ".old-deadbeef")
    assert(new java.io.File(dir).renameTo(parked))
    assert(!new java.io.File(dir).exists())
    val (before, after) = Maintenance.compactParquet(spark, dir, targetBytes = 1L << 30)
    assert(before == 5 && after == 1)
    assert(spark.read.parquet(dir).count() == 300)
    assert(!parked.exists())
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
    assert(spark.read.parquet(dir).count() == 5000)
  }
}
