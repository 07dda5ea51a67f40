package graft.core

import graft.SparkSpec
import graft.sources.v2.GraftManifestSink
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.LongOffset

/** Round-15 verdict task 3: a long-running streaming sink used to
  * accumulate one generation + one commit pointer per micro-batch
  * FOREVER. The sink now tier-folds old generations (LSM discipline —
  * each row rewritten once per tier, generation count bounded for any
  * run length) and gc's commit pointers periodically; the streaming
  * SOURCE recognizes a fold from its `covers` (repacked rows — skip)
  * and fails loudly when it lagged past the fold horizon.
  */
class ManifestFoldSpec extends SparkSpec {
  import spark.implicits._

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def liveGens(root: String): Seq[String] =
    ManifestTable.resolve(fs(root), new Path(root)).get.entries.map(_.dir)

  test("churn: 60 micro-batches stay bounded in generations AND commit files, values exact") {
    val root = tmpDir("gm-fold-churn") + "/t"
    val sink = new GraftManifestSink(spark, root, "parquet",
      Map("foldBatches" -> "3", "gcEveryBatches" -> "8", "gcKeepCommits" -> "4"),
      complete = false)
    val bound = 14 // K=3, margin 2: ~4 live per tier, 4 tiers at 60 batches
    var at30 = -1
    (0 until 60).foreach { b =>
      sink.addBatch(b, Seq((b, s"v$b")).toDF("id", "v"))
      if (b == 30) at30 = liveGens(root).size
    }
    val at60 = liveGens(root).size
    assert(at30 <= bound && at60 <= bound,
      s"generation count grew with batch count: $at30 at 30, $at60 at 60 (bound $bound)")
    // every row exactly once through all the folds
    val got = spark.read.format("graftmanifest").load(root)
      .as[(Int, String)].collect().toSeq
    assert(got.size == 60 && got.toSet == (0 until 60).map(i => i -> s"v$i").toSet,
      s"folding lost or duplicated rows: ${got.size} rows")
    // commit pointers bounded by the periodic gc (a gc-less run of 60
    // batches + ~30 folds would hold ~90)
    val commits = fs(root).listStatus(new Path(root, ManifestTable.CommitsDir))
      .count(s => !s.getPath.getName.startsWith("."))
    assert(commits <= 30, s"commit pointers not bounded: $commits on disk")
    // superseded generations' bytes were reclaimed: on-disk g-* dirs
    // shrink toward the live set (gc keeps a small reader-grace window)
    val onDisk = fs(root).listStatus(new Path(root))
      .count(_.getPath.getName.startsWith(ManifestTable.GenPrefix))
    assert(onDisk <= at60 + 30, s"folded generations never reclaimed: $onDisk on disk")
  }

  test("exactly-once survives folding: recent batch ids stay detectable, new ids land") {
    val root = tmpDir("gm-fold-replay") + "/t"
    val sink = new GraftManifestSink(spark, root, "parquet",
      Map("foldBatches" -> "3", "gcEveryBatches" -> "0"), complete = false)
    (0 until 12).foreach(b => sink.addBatch(b, Seq((b, s"v$b")).toDF("id", "v")))
    assert(liveGens(root).exists(_.startsWith("g-f")), "no fold fired in 12 batches")
    def table = spark.read.format("graftmanifest").load(root)
      .as[(Int, String)].collect().toSet
    val before = table
    // a post-crash restart re-offers the LAST epoch — must be a no-op
    // even though older batch markers have been folded away
    sink.addBatch(11, Seq((99, "replay")).toDF("id", "v"))
    assert(table == before, "a replayed recent batch id wrote a second copy after folds")
    sink.addBatch(12, Seq((12, "v12")).toDF("id", "v"))
    assert(table == before + ((12, "v12")))
  }

  test("a concurrent streaming reader rides through folds (repacked rows are skipped)") {
    val root = tmpDir("gm-fold-reader") + "/t"
    val sink = new GraftManifestSink(spark, root, "parquet",
      Map("foldBatches" -> "3", "gcEveryBatches" -> "0"), complete = false)
    sink.addBatch(0, Seq((0, "v0")).toDF("id", "v"))
    val q = spark.readStream.format("graftmanifest")
      .option("maxCommitsPerTrigger", "1").load(root)
      .writeStream.format("memory").queryName("gmfold").outputMode("append").start()
    try {
      q.processAllAvailable()
      (1 until 15).foreach { b =>
        sink.addBatch(b, Seq((b, s"v$b")).toDF("id", "v"))
        q.processAllAvailable()
      }
      val seen = spark.table("gmfold").as[(Int, String)].collect().toSeq
      assert(seen.size == 15 && seen.toSet == (0 until 15).map(i => i -> s"v$i").toSet,
        s"reader diverged across folds: ${seen.size} rows, ${seen.toSet.size} distinct")
    } finally q.stop()
  }

  test("a reader lagged past the fold horizon fails LOUDLY, naming the knobs") {
    val root = tmpDir("gm-fold-horizon") + "/t"
    val rootPath = new Path(root)
    val f = fs(root)
    def writeGen(gen: String, id: Int): Unit = {
      Seq((id, s"v$id")).toDF("id", "v").write.parquet(new Path(root, gen).toString)
      f.delete(new Path(new Path(root, gen), "_SUCCESS"), false)
    }
    writeGen("g-b0-aa", 0)
    ManifestTable.commit(f, rootPath, "",
      Map("g-b0-aa" -> Some(ManifestEntry("g-b0-aa", "g-b0-aa", Nil)))) // seq 1 = stream offset
    writeGen("g-b1-bb", 1)
    ManifestTable.commit(f, rootPath, "",
      Map("g-b1-bb" -> Some(ManifestEntry("g-b1-bb", "g-b1-bb", Nil)))) // seq 2: never streamed
    writeGen("g-f1-0-1-cc", 2)
    ManifestTable.commit(f, rootPath, "", Map(
      "g-b0-aa" -> None, "g-b1-bb" -> None,
      "g-f1-0-1-cc" -> Some(ManifestEntry("g-f1-0-1-cc", "g-f1-0-1-cc", Nil,
        Nil, covers = Seq("g-b0-aa", "g-b1-bb"))))) // seq 3 folds BOTH
    val schema = spark.read.format("graftmanifest").load(root).schema
    val src = new graft.sources.v2.GraftManifestSource(spark, root, "parquet", Map.empty, schema)
    val e = intercept[IllegalStateException] {
      src.getBatch(Some(LongOffset(1L)), LongOffset(3L))
    }
    assert(e.getMessage.contains("fold horizon") && e.getMessage.contains("foldBatches"),
      e.getMessage)
    // a fresh start reads the folded table whole — folds ARE the data then
    val fresh = src.getBatch(None, LongOffset(3L))
    assert(fresh.isStreaming)
  }
}
