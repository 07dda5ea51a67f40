package graft.core

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.streaming.Trigger

/** Round-15 verdict task 2: the manifested-table streaming source is
  * rate-controlled through [[org.apache.spark.sql.connector.read
  * .streaming.SupportsAdmissionControl]] — the seam Spark's own
  * FileStreamSource plugs into on the v1 Source API. A restarted
  * consumer facing a long commit backlog drains it across bounded
  * micro-batches (`maxCommitsPerTrigger` / `maxBytesPerTrigger`)
  * instead of one giant replay, and `Trigger.AvailableNow` drains to
  * the start-time seq in rate-limited batches then stops.
  */
class ManifestRateControlSpec extends SparkSpec {
  import spark.implicits._

  /** A table with a 10-commit backlog: ids 0..9, one per commit. */
  private def backlog(): String = {
    val root = tmpDir("gm-rate") + "/t"
    Seq((0, "v0")).toDF("id", "v").write.format("graftmanifest").save(root)
    (1 to 9).foreach(i => Seq((i, s"v$i")).toDF("id", "v")
      .write.format("graftmanifest").mode(SaveMode.Append).save(root))
    root
  }

  private def batches(q: org.apache.spark.sql.streaming.StreamingQuery): Seq[Long] =
    q.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)

  test("maxCommitsPerTrigger splits a 10-commit backlog across bounded batches, value-exact") {
    val root = backlog()
    val q = spark.readStream.format("graftmanifest")
      .option("maxCommitsPerTrigger", "3").load(root)
      .writeStream.format("memory").queryName("gmrate1").outputMode("append").start()
    try {
      q.processAllAvailable()
      val seen = spark.table("gmrate1").as[(Int, String)].collect().toSet
      assert(seen == (0 to 9).map(i => i -> s"v$i").toSet,
        s"rate-limited drain lost or duplicated rows: $seen")
      val b = batches(q)
      assert(b.size >= 4, s"10 commits at 3/trigger must take >=4 batches, took ${b.size}: $b")
      assert(b.forall(_ <= 3), s"a batch exceeded the 3-commit cap (1 row/commit): $b")
    } finally q.stop()
  }

  test("maxBytesPerTrigger (stats-based) takes at least one commit per batch and stays under cap") {
    val root = backlog()
    // 1 byte: every commit exceeds it, so the at-least-one rule gives
    // exactly one commit per batch — 10 batches, nothing skipped
    val q = spark.readStream.format("graftmanifest")
      .option("maxBytesPerTrigger", "1").load(root)
      .writeStream.format("memory").queryName("gmrate2").outputMode("append").start()
    try {
      q.processAllAvailable()
      val seen = spark.table("gmrate2").as[(Int, String)].collect().toSet
      assert(seen == (0 to 9).map(i => i -> s"v$i").toSet)
      val b = batches(q)
      assert(b.size == 10 && b.forall(_ == 1),
        s"1-byte cap must yield one commit per batch: $b")
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog in rate-limited batches then STOPS") {
    val root = backlog()
    val q = spark.readStream.format("graftmanifest")
      .option("maxCommitsPerTrigger", "4").load(root)
      .writeStream.format("memory").queryName("gmrate3").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000), "AvailableNow drain did not terminate")
      val seen = spark.table("gmrate3").as[(Int, String)].collect().toSet
      assert(seen == (0 to 9).map(i => i -> s"v$i").toSet,
        s"AvailableNow drain incomplete: $seen")
      val b = batches(q)
      assert(b.size >= 3, s"10 commits at 4/trigger must take >=3 batches: $b")
    } finally q.stop()
  }

  test("unlimited source still drains everything in one batch (no behavior change)") {
    val root = backlog()
    val q = spark.readStream.format("graftmanifest").load(root)
      .writeStream.format("memory").queryName("gmrate4").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("gmrate4").count() == 10)
      val b = batches(q)
      assert(b == Seq(10L), s"unlimited source should take the backlog whole: $b")
    } finally q.stop()
  }
  test("rate-capped walk caches parsed commits: steady-state trigger cost is the NEW commits only (round 16)") {
    MemFsStore.clear()
    MemFsStore.renameAsCopy = true
    spark.sparkContext.hadoopConfiguration
      .set("fs.memfs.impl", classOf[MemFs].getName)
    val root = "memfs://shared/rate-cache/t"
    Seq((0, "v0")).toDF("id", "v").write.format("graftmanifest").save(root)
    (1 to 5).foreach(i => Seq((i, s"v$i")).toDF("id", "v")
      .write.format("graftmanifest").mode(SaveMode.Append).save(root))
    val schema = spark.read.format("graftmanifest").load(root).schema
    val src = new graft.sources.v2.GraftManifestSource(
      spark, root, "parquet", Map("maxCommitsPerTrigger" -> "2"), schema)
    val limit = src.getDefaultReadLimit
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset

    // drain the 6-commit backlog in 3 capped triggers, counting every
    // commit-file open across latestOffset calls (the verdict's
    // O(retained-window)-per-trigger complaint). Commit files live
    // under _commits/ — data-file opens are excluded by reset points.
    MemFsStore.resetCounters()
    val o1 = src.latestOffset(null, limit)
    val t1 = MemFsStore.openCalls.get()
    MemFsStore.resetCounters()
    val o2 = src.latestOffset(o1, limit)
    val t2 = MemFsStore.openCalls.get()
    MemFsStore.resetCounters()
    val o3 = src.latestOffset(o2, limit)
    val t3 = MemFsStore.openCalls.get()
    assert(Seq(o1, o2, o3).map(o => o.asInstanceOf[LongOffset].offset) == Seq(2L, 4L, 6L))
    // trigger 1 is cold (resolve + walk); later triggers may read ONLY
    // the newest pointer plus their own NEW commits — the start
    // manifest and every already-walked commit are cache hits.
    // Uncached, each trigger additionally re-read the start commit and
    // every previously parsed version in range.
    assert(t2 <= 3L, s"trigger 2 opened $t2 commit files — cache not effective (cold was $t1)")
    assert(t3 <= 2L, s"trigger 3 opened $t3 commit files — cache not effective")
    // a no-new-data tick costs at most the resolve of the newest commit
    MemFsStore.resetCounters()
    val o4 = src.latestOffset(o3, limit)
    assert(o4.asInstanceOf[LongOffset].offset == 6L)
    assert(MemFsStore.openCalls.get() <= 1L,
      s"idle tick opened ${MemFsStore.openCalls.get()} files")
    MemFsStore.renameAsCopy = false
  }

}
