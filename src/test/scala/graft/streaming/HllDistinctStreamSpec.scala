package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming HLL rollup ≡ batch sketch: events replayed through the
  * stream in batches must leave, after the final batch, exactly the
  * per-group estimate a single batch-built sketch over all the data
  * reports (coupon regime at test size ⇒ exact equality, and both
  * equal true distinct). Also pins the replay discipline: state after
  * batch b read from v<b> only, and the cumulative report is
  * monotone per group.
  */
class HllDistinctStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streamed per-group estimates == batch sketch == exact distinct after replay") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stateDir = tmpDir("hlls-state") + "/state"
    val outDir = tmpDir("hlls-out") + "/out"
    val ckpt = tmpDir("hlls-ckpt")

    val rows = graft.Tables.load(spark, dir, "events")
      .select($"event_type", $"user_id").as[(String, Long)]
      .collect().toSeq
    val batches = rows.grouped((rows.length + 2) / 3).toSeq
    assert(batches.length == 3)

    val mem = MemoryStream[(String, Long)]
    val q = StreamingJobs.hllDistinctStream(
      mem.toDF().toDF("event_type", "user_id"), stateDir, outDir, ckpt)
    try batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    finally q.stop()

    val streamed = spark.read.parquet(s"$outDir/v2")
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("distinct_users"))).toMap
    val expected = graft.Tables.load(spark, dir, "events")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), count_distinct($"user_id").as("u"),
        hll_sketch_estimate(hll_sketch_agg($"user_id", lit(14))).as("est"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(streamed.keySet == expected.keySet)
    expected.foreach { case (k, (n, u, est)) =>
      assert(streamed(k)._1 == n, s"$k row count drift")
      assert(streamed(k)._2 == est, s"$k streamed estimate != batch sketch estimate")
      assert(streamed(k)._2 == u, s"$k estimate not coupon-exact at test size")
    }

    // monotone cumulative counts across batch reports
    val perBatch = (0 until 3).map(b => spark.read.parquet(s"$outDir/v$b")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("distinct_users")).toMap)
    perBatch.sliding(2).foreach { case Seq(a, b) =>
      a.keys.foreach(k => assert(b.getOrElse(k, Long.MaxValue) >= a(k),
        s"distinct estimate regressed for $k"))
    }
  }
}
