package graft.streaming

import graft.SparkSpec
import graft.operators.ExtendedRelational
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.sql.Timestamp

/** Streaming SCD2 apply: feeding a CDC stream through
  * [[StreamingJobs.scd2ApplyStream]] in N micro-batches must leave the
  * stored history equal to the one-shot batch rebuild over all events —
  * the same incremental ≡ rebuild property `Scd2PropSpec` proves for a
  * single cut, here proven across MANY sequential merges (each
  * micro-batch merges into the previous snapshot, so numbering and
  * interval-closing errors would compound and surface).
  */
class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._

  // same generator shape as Scd2PropSpec: few users, coarse timestamps,
  // deletes included — collisions are where ordering bugs live
  private val eventGen: Gen[(Long, String, Double, Long)] = for {
    user <- Gen.chooseNum(1L, 6L)
    op <- Gen.frequency(4 -> "update", 2 -> "create", 1 -> "error")
    value <- Gen.chooseNum(-100.0, 100.0).map(x => math.rint(x * 100) / 100)
    tsOff <- Gen.chooseNum(0L, 50L).map(_ * 1000L) // whole seconds (ms)
  } yield (user, op, value, tsOff)

  test("stream-applied SCD2 history == batch rebuild after N micro-batches") {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val raw = Gen.listOfN(60, eventGen)
      .apply(Gen.Parameters.default, Seed(2026L)).get
    // event_ids assigned post-generation (unique tie-break), then order
    // by time and split into 5 CDC batches — per-key commit order, the
    // stream's contract
    val events = raw.zipWithIndex.map { case ((u, op, v, off), ix) =>
      (u, ix.toLong + 1, op, v, new Timestamp(base + off))
    }.sortBy(e => (e._5.getTime, e._2))
    val batches = events.grouped(math.max(1, events.size / 5 + 1)).toSeq
    assert(batches.size >= 3, s"want several micro-batches, got ${batches.size}")

    val historyDir = tmpDir("scd2-stream") + "/history"
    val ckpt = tmpDir("scd2-stream-ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Double, Timestamp)]
    val stream = mem.toDF().toDF("user_id", "event_id", "event_type", "value", "ts")
    val q = StreamingJobs.scd2ApplyStream(stream, historyDir, ckpt)
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()

    // latest snapshot = the stream's final state
    val vdirs = new java.io.File(historyDir).listFiles().map(_.getName)
      .filter(_.startsWith("v")).map(_.stripPrefix("v").toLong)
    assert(vdirs.length >= 3, s"expected one snapshot per micro-batch, got ${vdirs.toSeq}")
    val streamed = spark.read.parquet(s"$historyDir/v${vdirs.max}")

    val rebuilt = ExtendedRelational.scd2Versions(
      events.toDF("user_id", "event_id", "event_type", "value", "ts"))
    assert(streamed.except(rebuilt).count() == 0 && rebuilt.except(streamed).count() == 0,
      s"streamed history != rebuild; stream-only=${streamed.except(rebuilt).count()}, " +
        s"rebuild-only=${rebuilt.except(streamed).count()}")
    assert(rebuilt.count() > 0)
  }
}
