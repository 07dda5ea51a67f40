package graft.streaming

import graft.SparkSpec
import graft.core.{MemFs, MemFsStore}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-11 completion of the MemFs durability story: a STREAMING job
  * with its checkpoint, versioned state AND output all on the
  * HDFS-semantics in-memory filesystem. Structured Streaming's
  * checkpoint (HDFSMetadataLog: offsets/commits via create-rename) and
  * the versioned-snapshot state discipline (listStatus discovery,
  * strictly-older-than-self reads, overwrite-own-version, last-N
  * pruning deletes) all execute against HDFS rename/commit strictness
  * rather than POSIX leniency — the filesystem surface a real cluster
  * deployment of these streams actually touches.
  */
class StreamMemFsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("hllDistinctStream: checkpoint + versioned state + reports all on HDFS-semantics storage, batch-exact") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    MemFsStore.clear()
    spark.sparkContext.hadoopConfiguration
      .set("fs.memfs.impl", classOf[MemFs].getName)
    val stateDir = "memfs://shared/stream/state"
    val outDir = "memfs://shared/stream/out"
    val ckpt = "memfs://shared/stream/ckpt"

    val rows = graft.Tables.load(spark, dir, "events")
      .select($"event_type", $"user_id").as[(String, Long)]
      .collect().toSeq
    // four batches: pruning runs at batch START, so the 4th batch is
    // what actually deletes state v0 (retain=2 keeps v1, v2) — the
    // deletion must execute on the mem FS to count
    val batches = rows.grouped((rows.length + 3) / 4).toSeq
    assert(batches.length == 4)

    val mem = MemoryStream[(String, Long)]
    val q = StreamingJobs.hllDistinctStream(
      mem.toDF().toDF("event_type", "user_id"), stateDir, outDir, ckpt)
    try batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    finally q.stop()

    // the checkpoint's offset/commit logs and the state/report versions
    // all live in the mem store
    val keys = {
      import scala.jdk.CollectionConverters._
      MemFsStore.entries.keySet().asScala.toSeq
    }
    assert(keys.exists(_.contains("/stream/ckpt/offsets")), "checkpoint offsets not on memfs")
    assert(keys.exists(_.contains("/stream/ckpt/commits")), "checkpoint commits not on memfs")
    assert(keys.exists(_.contains("/stream/state/v3")), "state v3 not on memfs")
    assert(keys.exists(_.contains("/stream/out/v3")), "report v3 not on memfs")
    // batch 3's start-of-batch prune deleted state v0 (retain=2 keeps
    // v1, v2 as its strictly-older set) — a real delete on the mem FS
    assert(!keys.exists(_.contains("/stream/state/v0/")), "state v0 should be pruned")
    assert(keys.exists(_.contains("/stream/state/v2/")), "retained state v2 missing")

    // value contract unchanged: final cumulative report == batch twin
    val streamed = spark.read.parquet(s"$outDir/v3")
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("distinct_users"))).toMap
    val expected = graft.Tables.load(spark, dir, "events")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        hll_sketch_estimate(hll_sketch_agg($"user_id", lit(14))).as("est"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed.keySet == expected.keySet)
    expected.foreach { case (k, (n, est)) =>
      assert(streamed(k) == ((n, est)), s"$k diverged on memfs")
    }
  }

  test("hllDistinctStream state + reports on COPY-RENAME (S3A-semantics) storage, checkpoint on atomic-rename FS, batch-exact") {
    // the realistic 100 TB split: Structured Streaming's checkpoint
    // log REQUIRES an atomic-rename FS by Spark's own contract (HDFS/
    // DBFS), while the heavy state/report parquet lives on the object
    // store. The versioned-snapshot discipline needs NO rename at all
    // — version dirs are written fresh and only read by strictly
    // later batches — so it must hold even where rename is a
    // non-atomic copy (round 12).
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    MemFsStore.clear()
    MemFsStore.renameAsCopy = true
    spark.sparkContext.hadoopConfiguration
      .set("fs.memfs.impl", classOf[MemFs].getName)
    val stateDir = "memfs://shared/s3stream/state"
    val outDir = "memfs://shared/s3stream/out"
    val ckpt = tmpDir("s3stream-ckpt") // atomic-rename FS, per Spark's contract

    val rows = graft.Tables.load(spark, dir, "events")
      .select($"event_type", $"user_id").as[(String, Long)]
      .collect().toSeq
    val batches = rows.grouped((rows.length + 3) / 4).toSeq
    val mem = MemoryStream[(String, Long)]
    val q = StreamingJobs.hllDistinctStream(
      mem.toDF().toDF("event_type", "user_id"), stateDir, outDir, ckpt)
    try batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    finally q.stop()

    val keys = {
      import scala.jdk.CollectionConverters._
      MemFsStore.entries.keySet().asScala.toSeq
    }
    assert(keys.exists(_.contains("/s3stream/state/v3")), "state v3 not on memfs")
    assert(!keys.exists(_.contains("/s3stream/state/v0/")), "state v0 should be pruned")
    val streamed = spark.read.parquet(s"$outDir/v3")
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("distinct_users"))).toMap
    val expected = graft.Tables.load(spark, dir, "events")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        hll_sketch_estimate(hll_sketch_agg($"user_id", lit(14))).as("est"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == expected, "copy-rename-rooted stream diverged")
  }

  test("incrementalSpanScrub delta-state compaction (_FULL marker + tail prune) executes on HDFS-semantics storage") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    MemFsStore.clear()
    spark.sparkContext.hadoopConfiguration
      .set("fs.memfs.impl", classOf[MemFs].getName)
    val gramDir = "memfs://shared/scrub/grams"
    val spansDir = "memfs://shared/scrub/spans"
    val ckpt = "memfs://shared/scrub/ckpt"

    val docs = graft.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
      .collect().toSeq.take(120)
    // 6 batches with compactEvery = 2: batch 2 and 4 fold older deltas
    // into _FULL snapshots, later batches prune the subsumed tail —
    // marker create, exists-probe and tail delete all on the mem FS
    val batches = docs.grouped(20).toSeq
    assert(batches.length == 6)

    val mem = MemoryStream[(Long, String)]
    val q = StreamingJobs.incrementalSpanScrub(
      mem.toDF().toDF("doc_id", "text"), gramDir, spansDir, ckpt, compactEvery = 2)
    try batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    finally q.stop()

    val keys = {
      import scala.jdk.CollectionConverters._
      MemFsStore.entries.keySet().asScala.toSeq
    }
    assert(keys.exists(_.endsWith("/scrub/grams/v4/_FULL")), "compaction marker missing on memfs")
    assert(!keys.exists(_.contains("/scrub/grams/v0")) &&
      !keys.exists(_.contains("/scrub/grams/v1")),
      "pre-full tail should be pruned behind the v2/v4 snapshots")
    assert(keys.exists(_.contains("/scrub/grams/v5")), "latest delta missing")
    assert((0 to 5).forall(b => keys.exists(_.contains(s"/scrub/spans/v$b"))),
      "per-batch span reports missing on memfs")

    // value contract: union of per-batch spans == the same stream run
    // on the local FS (the memfs run must change nothing but location)
    val got = (0 to 5).flatMap(b => spark.read.parquet(s"$spansDir/v$b")
      .collect().map(_.toString)).sorted
    val (lg, ls, lc) = (tmpDir("scrub-l") + "/g", tmpDir("scrub-l") + "/s", tmpDir("scrub-l") + "/c")
    val mem2 = MemoryStream[(Long, String)]
    val q2 = StreamingJobs.incrementalSpanScrub(
      mem2.toDF().toDF("doc_id", "text"), lg, ls, lc, compactEvery = 2)
    try batches.foreach { b => mem2.addData(b); q2.processAllAvailable() }
    finally q2.stop()
    val local = (0 to 5).flatMap(b => spark.read.parquet(s"$ls/v$b")
      .collect().map(_.toString)).sorted
    assert(got == local, "memfs-rooted scrub diverged from the local-FS run")
  }
}
