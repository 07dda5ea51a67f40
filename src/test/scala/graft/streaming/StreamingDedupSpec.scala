package graft.streaming

import graft.SparkSpec
import graft.core.{FileConnector, ProgressListener, WriteMode}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamingDedupSpec extends SparkSpec {
  import StreamingJobs._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streamingDedup drops duplicate keys within the watermark horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF.toDF("ts", "event_id")
    val q = streamingDedup(df, Seq("event_id"), "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      (ts("2024-01-01 00:00:00"), 1L),
      (ts("2024-01-01 00:01:00"), 1L), // dup key within horizon → dropped
      (ts("2024-01-01 00:02:00"), 2L))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 00:03:00"), 2L)) // dup again → dropped
    q.processAllAvailable()
    val got = spark.table("dedup_out").select($"event_id").as[Long].collect().sorted.toSeq
    q.stop()
    assert(got == Seq(1L, 2L))
  }

  test("streamingDedup state is keyed-store-backed and bounded by the watermark (eviction observed)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF.toDF("ts", "event_id")
    val q = streamingDedup(df, Seq("event_id"), "10 minutes")
      .writeStream.format("memory").queryName("dedup_bounded")
      .outputMode(OutputMode.Append()).start()
    // batch 1: two keys enter state
    mem.addData((ts("2024-01-01 00:00:00"), 1L), (ts("2024-01-01 00:02:00"), 2L))
    q.processAllAvailable()
    // batch 2 advances max event time 3h; batch 3 runs with the advanced
    // watermark and must EVICT the expired keys (bounded state).
    mem.addData((ts("2024-01-01 03:00:00"), 3L))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 03:01:00"), 4L))
    q.processAllAvailable()

    val progresses = q.recentProgress.toSeq
    q.stop()
    val stateOps = progresses.flatMap(_.stateOperators)
    // keyed state store, the *WithinWatermark* variant (not unbounded dropDuplicates)
    assert(stateOps.nonEmpty)
    assert(stateOps.forall(_.operatorName == "dedupeWithinWatermark"),
      s"unexpected state operator(s): ${stateOps.map(_.operatorName).distinct}")
    // watermark actually propagated to the operator…
    assert(progresses.flatMap(p => Option(p.eventTime.get("watermark"))).exists(_ != "1970-01-01T00:00:00.000Z"))
    // …and expired keys were removed: state never exceeds the live
    // horizon even though 4 distinct keys passed through.
    assert(stateOps.map(_.numRowsRemoved).sum > 0, "no state eviction observed")
    assert(stateOps.last.numRowsTotal < 4,
      s"state grew unbounded: ${stateOps.last.numRowsTotal} rows")
  }

  test("streamingLshCandidates flags near-dups across micro-batches, first doc owns the bucket") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF.toDF("doc_id", "text")
    // NoTimeout in the spec: ProcessingTimeTimeout keeps the no-data
    // trigger loop busy and processAllAvailable cannot settle
    val q = StreamingJobs.streamingLshCandidates(docs, stateTtl = None)
      .writeStream.format("memory").queryName("lsh_out")
      .outputMode(OutputMode.Append()).start()
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val other = "one two three four five six seven eight nine"
    mem.addData((1L, a))
    q.processAllAvailable()
    mem.addData((2L, a), (3L, other)) // 2 = exact copy of 1; 3 = disjoint
    q.processAllAvailable()
    val got = spark.table("lsh_out")
      .select($"doc_id", $"dup_of").as[(Long, Long)].collect().toSet
    q.stop()
    assert(got == Set((2L, 1L)), s"expected doc 2 flagged against doc 1, got $got")
    // all 4 bands of the identical doc collide
    assert(spark.table("lsh_out").count() == 4)
  }

  test("lshBands buckets (stream family) cover every batch q21 verified pair") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bands = StreamingJobs.lshBands(docs)
    val cand = bands.toDF("a_id", "band", "bkey")
      .join(bands.toDF("b_id", "band2", "bkey2"),
        $"band" === $"band2" && $"bkey" === $"bkey2" && $"a_id" < $"b_id")
      .select($"a_id", $"b_id").distinct()
      .as[(Long, Long)].collect().toSet
    val verified = graft.operators.TextDedup.dedupMinhashLsh(spark, "/root/testdata/sf0.001")
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(verified.nonEmpty)
    assert(verified.subsetOf(cand),
      s"stream banding missed batch pairs: ${verified -- cand}")
  }

  test("incrementalCorpusBuild: exact dups, near-dups vs corpus, and within-batch dups dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("corpus_build").toString
    val corpusDir = s"$base/corpus"
    val ckpt = s"$base/ckpt"
    val A = "alpha beta gamma delta epsilon zeta"
    val B = "one two three four five six seven"
    val B4 = "one two three four five six eight" // near-copy of B
    val C = "red orange yellow green blue indigo"
    val D = "solar lunar stellar cosmic astral nebular"
    val mem = MemoryStream[(Long, String)]
    def runBatch(data: (Long, String)*): Unit = {
      mem.addData(data: _*)
      val q = StreamingJobs.incrementalCorpusBuild(
        mem.toDF.toDF("doc_id", "text"), corpusDir, ckpt)
      q.awaitTermination()
    }
    runBatch((1L, A), (2L, B))
    runBatch((3L, A), (4L, B4), (5L, C)) // 3 = exact dup; 4 = near-dup?; 5 = novel
    runBatch((6L, D), (7L, D)) // within-batch dup: only 6 survives
    val got = spark.read.parquet(corpusDir).select($"doc_id").as[Long].collect().toSet
    // whether 4 is dropped depends on band collision with B — derive the
    // expectation from the same banding family instead of hardcoding
    val bandsOf = (id: Long, t: String) => StreamingJobs.lshBands(Seq((id, t)).toDF("doc_id", "text"))
      .select($"band", $"bkey").as[(Int, String)].collect().toSet
    val drop4 = bandsOf(2L, B).intersect(bandsOf(4L, B4)).nonEmpty
    val expected = Set(1L, 2L, 5L, 6L) ++ (if (drop4) Set.empty[Long] else Set(4L))
    assert(got == expected, s"corpus=$got expected=$expected (drop4=$drop4)")
  }

  test("streamingUpsert applies keyed Replace per micro-batch via foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sink = FileConnector("su", tmpDir("su"), "parquet")
    sink.write(Seq((1L, "old"), (2L, "keep")).toDF("id", "v"), "t", WriteMode.Overwrite)

    val mem = MemoryStream[(Long, String)]
    val q = streamingUpsert(mem.toDF.toDF("id", "v"), sink, "t",
      WriteMode.Replace(Seq("id")), tmpDir("su-ckpt"))
    mem.addData((1L, "new"), (3L, "add"))
    q.awaitTermination()
    val got = sink.read(spark, "t").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "new", 2L -> "keep", 3L -> "add"))
  }

  test("stream-stream interval join matches purchases within the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp)]
    val joined = StreamingJobs.streamingFunnel(
      views.toDF.toDF("user_id", "ts"), purchases.toDF.toDF("user_id", "ts"))
    val q = joined.writeStream.format("memory").queryName("funnel")
      .outputMode(OutputMode.Append()).start()

    views.addData((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 00:00:00")))
    purchases.addData(
      (1L, ts("2024-01-01 00:03:00")), // within 5 min → match
      (2L, ts("2024-01-01 00:09:00")), // beyond horizon → no match
      (3L, ts("2024-01-01 00:01:00"))) // no view → no match
    q.processAllAvailable()
    val got = spark.table("funnel").select($"v_user").as[Long].collect().toSeq
    q.stop()
    assert(got == Seq(1L))
  }

  test("ProgressListener reports rows written for a write action") {
    import spark.implicits._
    val l = ProgressListener.attach(spark)
    try {
      val dir = tmpDir("prog")
      (1 to 42).toDF("n").write.mode("overwrite").parquet(dir)
      // listener bus is async; poll briefly
      val deadline = System.currentTimeMillis() + 5000
      var rows: Option[Long] = None
      while (rows.isEmpty && System.currentTimeMillis() < deadline) {
        rows = l.all.flatMap(_.rowsWritten).find(_ == 42L)
        if (rows.isEmpty) Thread.sleep(50)
      }
      assert(rows.contains(42L), s"reports: ${l.all}")
    } finally spark.listenerManager.unregister(l)
  }
}
