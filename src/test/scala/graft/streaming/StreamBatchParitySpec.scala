package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming == batch determinism over the REAL corpus: the windowed
  * daily rollup computed as a stream (file source, AvailableNow) must
  * equal the batch q15 aggregation row-for-row.
  */
class StreamBatchParitySpec extends SparkSpec {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("streamed daily event counts equal the batch aggregation") {
    val batchEvents = Tables.load(spark, dir, "events")
    // stage as parquet with µs timestamps (the raw corpus is ns, which
    // the streaming reader would reject the same way batch does)
    val staged = tmpDir("stream-parity")
    batchEvents.write.mode("overwrite").parquet(staged)

    val stream = spark.readStream
      .schema(spark.read.parquet(staged).schema)
      .parquet(staged)
    val agg = StreamingJobs.windowedEventCounts(stream, "1 hour", "1 day")
    val q = agg.writeStream.format("memory").queryName("daily_stream")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("daily_stream")
      .select($"window_start".cast("date").as("day"), $"event_type", $"n", $"sum_value")
    val batch = batchEvents
      .groupBy(date_trunc("day", $"ts").cast("date").as("day"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))

    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }
}
