package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamingJobsSpec extends SparkSpec {
  import StreamingJobs._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("incremental file copy: second trigger picks up only new files (checkpoint state)") {
    import spark.implicits._
    val src = tmpDir("stream-src")
    val dst = tmpDir("stream-dst")
    val ckpt = tmpDir("stream-ckpt")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.mode("append").json(src)
    val schema = spark.read.json(src).schema

    val q1 = incrementalFileCopy(spark, src, schema, "json", dst, ckpt).get
    q1.awaitTermination()
    assert(spark.read.parquet(dst).count() == 3)

    Seq((4L, "d"), (5L, "e")).toDF("id", "v").write.mode("append").json(src)
    val q2 = incrementalFileCopy(spark, src, schema, "json", dst, ckpt).get
    q2.awaitTermination()
    val out = spark.read.parquet(dst)
    assert(out.count() == 5) // 3 old files not re-ingested, 2 new appended
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("incremental file copy applies the transform") {
    import spark.implicits._
    val src = tmpDir("stream-src2")
    val dst = tmpDir("stream-dst2")
    val ckpt = tmpDir("stream-ckpt2")
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x").write.mode("append").json(src)
    val schema = spark.read.json(src).schema
    val q = incrementalFileCopy(spark, src, schema, "json", dst, ckpt,
      df => df.withColumn("x2", col("x") * 2).filter(col("id") > 1)).get
    q.awaitTermination()
    val rows = spark.read.parquet(dst).select("id", "x2").as[(Long, Double)].collect()
    assert(rows.toSeq == Seq((2L, 40.0)))
  }

  test("backup-hour gating: sync blocked within ±d hours of the backup instant, fail-open on bad config") {
    import java.time.LocalDateTime
    def at(h: Int, m: Int) = () => LocalDateTime.of(2026, 8, 12, h, m)
    // backup at 02:30, ±1h: 01:31-03:29 blocks, outside runs
    assert(BackupWindow("02:30", 1, at(2, 30)).blocksNow())
    assert(BackupWindow("02:30", 1, at(1, 45)).blocksNow())
    assert(BackupWindow("02:30", 1, at(3, 15)).blocksNow())
    assert(!BackupWindow("02:30", 1, at(1, 30)).blocksNow()) // boundary: reference uses strict <
    assert(!BackupWindow("02:30", 1, at(3, 30)).blocksNow())
    assert(!BackupWindow("02:30", 1, at(12, 0)).blocksNow())
    // malformed start time fails OPEN, exactly like the reference
    assert(!BackupWindow("nonsense", 1, at(2, 30)).blocksNow())
    assert(!BackupWindow("", 1, at(2, 30)).blocksNow())
    // all-digit but unparseable/out-of-range values also fail open
    // (the reference reaches the same outcome via its catch-all except)
    assert(!BackupWindow("99999999999:00", 1, at(2, 30)).blocksNow())
    assert(!BackupWindow("25:70", 1, at(1, 10)).blocksNow())
    // windows straddling midnight block on BOTH sides (deliberate fix
    // over the reference's same-day-only comparison)
    assert(BackupWindow("00:30", 2, at(23, 0)).blocksNow())
    assert(BackupWindow("23:30", 2, at(1, 0)).blocksNow())
    assert(!BackupWindow("00:30", 2, at(21, 0)).blocksNow())
    // a gated incrementalFileCopy starts nothing and touches nothing
    val src = tmpDir("gated-src"); val dst = tmpDir("gated-dst"); val ckpt = tmpDir("gated-ckpt")
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "v").write.mode("append").json(src)
    val schema = spark.read.json(src).schema
    val blocked = incrementalFileCopy(spark, src, schema, "json", dst, ckpt,
      backupWindow = Some(BackupWindow("02:30", 1, at(2, 30))))
    assert(blocked.isEmpty)
    assert(!new java.io.File(dst).exists() || new java.io.File(dst).list().isEmpty)
    // and the same call outside the window copies
    val open = incrementalFileCopy(spark, src, schema, "json", dst, ckpt,
      backupWindow = Some(BackupWindow("02:30", 1, at(12, 0))))
    open.get.awaitTermination()
    assert(spark.read.parquet(dst).count() == 1)
  }

  test("watermarked tumbling window finalizes once watermark passes (Append)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF.toDF("ts", "event_type", "value")
    val agg = windowedEventCounts(df, watermarkDelay = "10 minutes", windowLength = "1 hour")
    val q = agg.writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append()).start()

    mem.addData(
      (ts("2024-01-01 00:05:00"), "click", 1.0),
      (ts("2024-01-01 00:40:00"), "click", 2.0),
      (ts("2024-01-01 00:50:00"), "view", 3.0))
    q.processAllAvailable()
    assert(spark.table("win_counts").count() == 0) // watermark not past window end yet

    mem.addData((ts("2024-01-01 02:00:00"), "view", 9.0)) // advances watermark to 01:50
    q.processAllAvailable()
    val done = spark.table("win_counts")
      .select($"window_start".cast("string"), $"event_type", $"n", $"sum_value")
      .as[(String, String, Long, Double)].collect().toSet
    q.stop()
    assert(done == Set(
      ("2024-01-01 00:00:00", "click", 2L, 3.0),
      ("2024-01-01 00:00:00", "view", 1L, 3.0)))
  }

  test("session_window merges events within the gap, splits across it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF.toDF("ts", "user_id")
    val sess = sessionWindowCounts(df, gap = "30 minutes", watermarkDelay = "5 minutes")
    val q = sess.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()

    mem.addData(
      (ts("2024-01-01 00:00:00"), 1L),
      (ts("2024-01-01 00:10:00"), 1L), // same session
      (ts("2024-01-01 01:00:00"), 1L), // gap > 30min → new session
      (ts("2024-01-01 00:00:00"), 2L))
    mem.addData((ts("2024-01-01 03:00:00"), 99L)) // advance watermark far past
    q.processAllAvailable()
    val rows = spark.table("sessions")
      .select($"user_id", $"sess_start".cast("string"), $"n_events")
      .as[(Long, String, Long)].collect().toSet
    q.stop()
    assert(rows.contains((1L, "2024-01-01 00:00:00", 2L)))
    assert(rows.contains((1L, "2024-01-01 01:00:00", 1L)))
    assert(rows.contains((2L, "2024-01-01 00:00:00", 1L)))
  }

  test("mapGroupsWithState keeps running totals across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Evt]
    val q = runningUserTotals(mem.toDS())
      .writeStream.format("memory").queryName("user_totals")
      .outputMode(OutputMode.Update()).start()

    mem.addData(
      Evt(1L, ts("2024-01-01 00:00:00"), "click", 1.5),
      Evt(1L, ts("2024-01-01 00:01:00"), "view", 2.5),
      Evt(2L, ts("2024-01-01 00:02:00"), "click", 10.0))
    q.processAllAvailable()
    mem.addData(Evt(1L, ts("2024-01-01 00:05:00"), "purchase", 6.0))
    q.processAllAvailable()
    val latest = spark.table("user_totals")
      .groupBy($"user_id").agg(max(struct($"n_events", $"total_value")).as("s"))
      .select($"user_id", $"s.n_events", $"s.total_value")
      .as[(Long, Long, Double)].collect().toSet
    q.stop()
    assert(latest == Set((1L, 3L, 10.0), (2L, 1L, 10.0)))
  }
}
