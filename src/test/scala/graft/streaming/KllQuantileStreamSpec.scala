package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming KLL rollup ≡ batch sketch: values replayed through the
  * stream in batches must leave, after the final batch, exactly the
  * per-group p50/p90/p99 a single batch-built sketch over all the
  * data reports. The fixture keeps every group ≤ k values so the
  * sketches stay in their exact regime (level 0 holds everything) —
  * merge order cannot matter and the quantiles are order statistics,
  * which the spec re-derives with a rank audit. Also pins monotone
  * cumulative row counts across batch reports.
  */
class KllQuantileStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streamed per-group quantiles == batch sketch, rank-audited, after replay") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stateDir = tmpDir("klls-state") + "/state"
    val outDir = tmpDir("klls-out") + "/out"
    val ckpt = tmpDir("klls-ckpt")

    // every 5th event: ~200 rows, ~40 per group — well under k=200,
    // so the whole run stays in the sketch's exact regime
    val rows = graft.Tables.load(spark, dir, "events")
      .filter($"event_id" % 5 === 0)
      .select($"event_type", $"value").as[(String, Double)]
      .collect().toSeq
    assert(rows.nonEmpty && rows.groupBy(_._1).values.forall(_.size <= 200))
    val batches = rows.grouped((rows.length + 2) / 3).toSeq
    assert(batches.length == 3)

    val mem = MemoryStream[(String, Double)]
    val q = StreamingJobs.kllQuantileStream(
      mem.toDF().toDF("event_type", "value"), stateDir, outDir, ckpt)
    try batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    finally q.stop()

    val streamed = spark.read.parquet(s"$outDir/v2")
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"),
          r.getAs[Double]("p50"), r.getAs[Double]("p90"), r.getAs[Double]("p99"))).toMap
    val batchSketch = rows.toDF("event_type", "value")
      .groupBy($"event_type")
      .agg(expr("kll_sketch_agg_double(value, 200)").as("sk"), count(lit(1)).as("n"))
      .select($"event_type", $"n",
        expr("kll_sketch_get_quantile_double(sk, 0.5)").as("p50"),
        expr("kll_sketch_get_quantile_double(sk, 0.9)").as("p90"),
        expr("kll_sketch_get_quantile_double(sk, 0.99)").as("p99"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(streamed == batchSketch,
      s"streamed final state != batch sketch:\n$streamed\nvs\n$batchSketch")

    // rank audit against the raw values: each quantile is a member of
    // its group with empirical rank bracketing the target (step ranks
    // at ~40 values/group ⇒ ±0.05 slack covers the grid)
    val byGroup = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((g, (n, p50, p90, p99)) <- streamed) {
      val vs = byGroup(g)
      assert(n == vs.size)
      for ((q, v) <- Seq(0.5 -> p50, 0.9 -> p90, 0.99 -> p99)) {
        assert(vs.contains(v), s"$g q$q estimate $v not a member value")
        val lo = vs.count(_ < v).toDouble / vs.size
        val hi = vs.count(_ <= v).toDouble / vs.size
        assert(lo - 0.05 <= q && q <= hi + 0.05,
          s"$g q$q=$v has rank [$lo,$hi], target $q")
      }
    }

    // monotone cumulative row counts across batch reports
    val perBatch = (0 until 3).map(b => spark.read.parquet(s"$outDir/v$b")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_events")).toMap)
    perBatch.sliding(2).foreach { case Seq(a, b) =>
      a.keys.foreach(k => assert(b.getOrElse(k, Long.MaxValue) >= a(k),
        s"cumulative count regressed for $k"))
    }
  }

  test("replayed batch over a torn state snapshot cannot double-merge") {
    // KLL merge is NOT idempotent: if a replayed batch read its own
    // crashed attempt's state (already containing the batch's values),
    // the values would merge TWICE and counts/quantiles would drift.
    // The strictly-older-than-self rule must make the replay read v1,
    // ignore the torn v2, and overwrite it — final state equal to a
    // run that never crashed.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batches = (0 until 3).map(b =>
      (0 until 50).map(i => ("x", (b * 100 + i).toDouble)))

    def run(torn: Boolean): Map[String, (Long, Double, Double)] = {
      val tag = if (torn) "torn" else "clean"
      val stateDir = tmpDir(s"klls-chaos-$tag") + "/state"
      val outDir = tmpDir(s"klls-chaos-out-$tag") + "/out"
      val ckpt = tmpDir(s"klls-chaos-ckpt-$tag")
      val mem = MemoryStream[(String, Double)]
      def stream() = mem.toDF().toDF("event_type", "value")
      val q1 = StreamingJobs.kllQuantileStream(stream(), stateDir, outDir, ckpt)
      try batches.take(2).foreach { b => mem.addData(b); q1.processAllAvailable() }
      finally q1.stop()
      if (torn) {
        // what a crash mid-batch-2 leaves behind: a state version the
        // replay must neither read nor keep — poisoned counts and a
        // sketch over garbage values so any leakage is visible in
        // both n_events and the quantiles
        (0 until 50).map(i => ("x", 1e9 + i)).toDF("event_type", "value")
          .groupBy(col("event_type"))
          .agg(expr("kll_sketch_agg_double(value, 200)").as("sk"),
            lit(999999L).as("n_events"))
          .select(col("event_type"), col("sk"), col("n_events"))
          .write.parquet(s"$stateDir/v2")
      }
      val q2 = StreamingJobs.kllQuantileStream(stream(), stateDir, outDir, ckpt)
      try { mem.addData(batches(2)); q2.processAllAvailable() } finally q2.stop()
      spark.read.parquet(s"$outDir/v2").collect().map(r =>
        r.getString(0) -> (r.getAs[Long]("n_events"),
          r.getAs[Double]("p50"), r.getAs[Double]("p99"))).toMap
    }

    val clean = run(torn = false)
    val healed = run(torn = true)
    assert(clean("x")._1 == 150L, s"clean run should hold all 150 values: $clean")
    assert(healed == clean,
      s"replay over a torn snapshot diverged (double-merge or garbage leak):\n" +
        s"healed $healed\nclean  $clean")
  }
}
