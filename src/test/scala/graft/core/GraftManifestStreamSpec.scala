package graft.core

import graft.SparkSpec
import graft.sources.v2.{GraftManifestSink, GraftManifestSource}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, MemoryStream}

/** Manifested tables as a streaming source (round 14): the commit log
  * is the changelog — each micro-batch is exactly the entries newly
  * committed since the last offset, offsets are commit seqs, and the
  * append-only / retained-window contracts fail loudly by name.
  */
class GraftManifestStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streams appended generations exactly-once across micro-batches") {
    val root = tmpDir("gm-stream") + "/t"
    Seq((1, "a")).toDF("id", "v").write.format("graftmanifest").save(root)
    val q = spark.readStream.format("graftmanifest").load(root)
      .writeStream.format("memory").queryName("gmstream").outputMode("append").start()
    try {
      q.processAllAvailable()
      def seen = spark.table("gmstream").as[(Int, String)].collect().toSeq
      assert(seen.toSet == Set(1 -> "a"))
      Seq((2, "b")).toDF("id", "v")
        .write.format("graftmanifest").mode(SaveMode.Append).save(root)
      q.processAllAvailable()
      assert(seen.toSet == Set(1 -> "a", 2 -> "b"))
      // two appends between ticks arrive once each, never twice
      Seq((3, "c")).toDF("id", "v")
        .write.format("graftmanifest").mode(SaveMode.Append).save(root)
      Seq((4, "d")).toDF("id", "v")
        .write.format("graftmanifest").mode(SaveMode.Append).save(root)
      q.processAllAvailable()
      assert(seen.sorted == Seq(1 -> "a", 2 -> "b", 3 -> "c", 4 -> "d"),
        s"duplicated or dropped rows: $seen")
    } finally q.stop()
  }

  test("an overwrite mid-stream breaks the append-only contract loudly") {
    val root = tmpDir("gm-stream-ow") + "/t"
    Seq((1, "a")).toDF("id", "v").write.format("graftmanifest").save(root)
    val q = spark.readStream.format("graftmanifest").load(root)
      .writeStream.format("memory").queryName("gmstream_ow").outputMode("append").start()
    try {
      q.processAllAvailable()
      Seq((9, "z")).toDF("id", "v")
        .write.format("graftmanifest").mode(SaveMode.Overwrite).save(root)
      val e = intercept[Exception] { q.processAllAvailable() }
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
      assert(msg.contains("RETIRED") || msg.contains("APPEND-ONLY"),
        s"wrong failure for a mid-stream overwrite: $e")
    } finally q.stop()
  }

  test("sink: one generation + commit per micro-batch; a replayed batch id is skipped (exactly-once)") {
    val root = tmpDir("gm-sink") + "/t"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Int, String)]
    val q = mem.toDF().toDF("id", "v").writeStream.format("graftmanifest")
      .option("path", root)
      .option("checkpointLocation", tmpDir("gm-sink-ckpt"))
      .outputMode("append").start()
    try {
      mem.addData((1, "a"), (2, "b")); q.processAllAvailable()
      mem.addData((3, "c")); q.processAllAvailable()
    } finally q.stop()
    def table = spark.read.format("graftmanifest").load(root)
      .as[(Int, String)].collect().toMap
    assert(table == Map(1 -> "a", 2 -> "b", 3 -> "c"))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = ManifestTable.resolve(fs, new Path(root)).get.entries
    assert(entries.size == 2 && entries.forall(_.dir.matches("g-b\\d+-.*")),
      s"expected one batch-id-named generation per micro-batch: $entries")
    // a post-crash epoch replay re-offers an already-committed batch id
    // — the sink must detect it FROM THE MANIFEST and write nothing
    val sink = new GraftManifestSink(spark, root, "parquet", Map.empty, complete = false)
    sink.addBatch(0, Seq((99, "replay")).toDF("id", "v"))
    assert(table == Map(1 -> "a", 2 -> "b", 3 -> "c"),
      "a replayed batch id wrote a second copy — exactly-once broken")
    // and a genuinely new batch id lands
    sink.addBatch(7, Seq((4, "d")).toDF("id", "v"))
    assert(table == Map(1 -> "a", 2 -> "b", 3 -> "c", 4 -> "d"))
  }

  test("sink complete mode: each batch REPLACES state via the optimistic pointer flip") {
    val root = tmpDir("gm-sink-complete") + "/t"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val q = mem.toDF().toDF("v").groupBy("v").count()
      .writeStream.format("graftmanifest")
      .option("path", root)
      .option("checkpointLocation", tmpDir("gm-sinkc-ckpt"))
      .outputMode("complete").start()
    try {
      mem.addData("x", "y", "x"); q.processAllAvailable()
      mem.addData("y"); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.format("graftmanifest").load(root)
      .as[(String, Long)].collect().toMap
    assert(got == Map("x" -> 2L, "y" -> 2L),
      s"complete mode did not replace state: $got")
  }

  test("a start offset gc'd past the history window fails naming the retained set and the knob") {
    val root = tmpDir("gm-stream-gc") + "/t"
    Seq((1, "a")).toDF("id", "v").write.format("graftmanifest").save(root)
    (2 to 4).foreach(i => Seq((i, s"v$i")).toDF("id", "v")
      .write.format("graftmanifest").mode(SaveMode.Append).save(root))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    ManifestTable.gc(fs, new Path(root), keepCommits = 1, orphanRetentionMs = 0L)
    val schema = spark.read.format("graftmanifest").load(root).schema
    val src = new GraftManifestSource(spark, root, "parquet", Map.empty, schema)
    val e = intercept[IllegalStateException] {
      src.getBatch(Some(LongOffset(1L)), LongOffset(4L))
    }
    assert(e.getMessage.contains("no longer retained") &&
      e.getMessage.contains("keepCommits"), e.getMessage)
    // the still-retained window keeps streaming: a from-scratch restart
    // (start=None diffs against nothing) builds its batch without
    // touching the gc'd commit — no throw, schema intact
    val restart = src.getBatch(None, LongOffset(4L))
    assert(restart.schema == schema && restart.isStreaming)
  }
}
