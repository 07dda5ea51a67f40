package graft.streaming

import graft.SparkSpec
import graft.core.{Connector, FileConnector, WriteMode}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQueryException
import java.sql.Timestamp

/** Exactly-once under injected failure — the happy-path idempotence
  * specs promise that checkpoint + keyed idempotent writes converge;
  * this spec PROVES it by killing the sink mid-batch at three
  * different points (before any row, after a partial write, after the
  * full write but before the batch commits) and by planting the torn
  * version dir a crashed snapshot-stream attempt leaves behind. Every
  * restart must converge to the exact no-failure end state: the keyed
  * Replace makes the batch replay idempotent, and the
  * strictly-older-than-self versioned-snapshot rule makes a replayed
  * batch ignore its own half-written output.
  */
class ChaosExactlyOnceSpec extends SparkSpec {
  import spark.implicits._

  /** Failure-injecting sink decorator: consumes one planned failure
    * per write attempt — "before" throws untouched, "midway" applies
    * only half the batch then throws (the torn write), "after" applies
    * everything then throws (the lost-ack case, where replay without
    * idempotence would double-apply).
    */
  private final class ChaosConnector(inner: FileConnector) extends Connector with Serializable {
    @volatile var plan: List[String] = Nil
    var attempts: Int = 0
    def name: String = "chaos-" + inner.name
    def read(spark: SparkSession, index: String): DataFrame = inner.read(spark, index)
    def listIndexes(spark: SparkSession): Seq[String] = inner.listIndexes(spark)
    def write(df: DataFrame, index: String, mode: WriteMode): Unit = synchronized {
      attempts += 1
      plan match {
        case "before" :: rest =>
          plan = rest
          throw new RuntimeException("chaos-before: no rows written")
        case "midway" :: rest =>
          plan = rest
          val half = df.limit(math.max(1, (df.count() / 2).toInt))
          inner.write(half, index, mode)
          throw new RuntimeException("chaos-midway: partial rows written")
        case "after" :: rest =>
          plan = rest
          inner.write(df, index, mode)
          throw new RuntimeException("chaos-after: all rows written, ack lost")
        case _ => inner.write(df, index, mode)
      }
    }
  }

  test("streamingUpsert converges to the no-failure state across 3 injected kill points") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val inner = FileConnector("chaos", tmpDir("chaos-sink"), "parquet")
    inner.write(Seq((1L, "old"), (2L, "keep")).toDF("id", "v"), "t", WriteMode.Overwrite)
    val sink = new ChaosConnector(inner)
    val ckpt = tmpDir("chaos-ckpt")
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "new"), (3L, "add"), (4L, "x"), (5L, "y"))

    def runOnce(): Option[Throwable] = {
      val q = StreamingJobs.streamingUpsert(mem.toDF().toDF("id", "v"), sink, "t",
        WriteMode.Replace(Seq("id")), ckpt)
      try { q.awaitTermination(); None }
      catch { case e: StreamingQueryException => q.stop(); Some(e) }
    }

    sink.plan = List("before", "midway", "after")
    val failures = List(runOnce(), runOnce(), runOnce())
    failures.zip(List("chaos-before", "chaos-midway", "chaos-after")).foreach {
      case (f, tag) => assert(
        f.exists(e => Option(e.getCause).exists(_.getMessage.startsWith(tag))),
        s"expected injected $tag to kill the query, got $f")
    }
    // after chaos-midway the sink holds a TORN batch application —
    // visibly partial, which is exactly what the next replay must heal
    assert(runOnce().isEmpty, "clean restart must complete")
    assert(sink.attempts == 4, s"one write attempt per restart, got ${sink.attempts}")
    val got = inner.read(spark, "t").as[(Long, String)].collect()
    assert(got.length == got.map(_._1).distinct.length, s"duplicate keys after replays: ${got.toSeq}")
    assert(got.toMap == Map(1L -> "new", 2L -> "keep", 3L -> "add", 4L -> "x", 5L -> "y"),
      s"converged state wrong: ${got.toSeq.sorted}")
  }

  test("scd2ApplyStream replay heals a torn version dir from a crashed attempt") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(u: Long, id: Long, op: String, v: Double, sec: Long) =
      (u, id, op, v, new Timestamp(base + sec * 1000))
    val batches = Seq(
      Seq(ev(1, 1, "create", 10.0, 0), ev(2, 2, "create", 20.0, 1)),
      Seq(ev(1, 3, "update", 11.0, 10), ev(3, 4, "create", 30.0, 11)),
      Seq(ev(2, 5, "update", 21.0, 20), ev(1, 6, "update", 12.0, 21)))

    def history(tag: String, torn: Boolean): Set[String] = {
      val historyDir = tmpDir(s"chaos-scd2-$tag") + "/history"
      val ckpt = tmpDir(s"chaos-scd2-ckpt-$tag")
      val mem = MemoryStream[(Long, Long, String, Double, Timestamp)]
      def stream() = mem.toDF().toDF("user_id", "event_id", "event_type", "value", "ts")
      val q1 = StreamingJobs.scd2ApplyStream(stream(), historyDir, ckpt)
      try {
        batches.take(2).foreach { b => mem.addData(b); q1.processAllAvailable() }
      } finally q1.stop()
      if (torn) {
        // what a crash mid-batch-2 leaves: v2 half-written with garbage
        // the replay must neither read (strictly-older-than-self) nor
        // keep (it overwrites its own dir)
        Seq((99L, 99L, "garbage", -1.0, new Timestamp(base)))
          .toDF("user_id", "event_id", "event_type", "value", "ts")
          .write.parquet(s"$historyDir/v2")
      }
      val q2 = StreamingJobs.scd2ApplyStream(stream(), historyDir, ckpt)
      try { mem.addData(batches(2)); q2.processAllAvailable() } finally q2.stop()
      spark.read.parquet(s"$historyDir/v2").collect()
        .map(_.mkString("|")).toSet
    }

    val clean = history("clean", torn = false)
    val healed = history("torn", torn = true)
    assert(!healed.exists(_.contains("garbage")), "torn rows must be overwritten, not merged")
    assert(healed == clean,
      s"replay over a torn v2 must equal the clean run:\nonly torn: ${healed.diff(clean)}\n" +
        s"only clean: ${clean.diff(healed)}")
  }
}
