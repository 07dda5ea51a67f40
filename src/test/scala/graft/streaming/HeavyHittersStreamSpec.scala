package graft.streaming

import graft.SparkSpec
import graft.functions.MGState
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming Misra–Gries: the sketch folded batch-into-state across
  * micro-batches must satisfy every MG theorem over the ACCUMULATED
  * stream — the merge tree (partition combines inside a batch, then
  * the state fold between batches) must be invisible to the bounds.
  */
class HeavyHittersStreamSpec extends SparkSpec {
  import spark.implicits._

  private val M = 8

  test("batch-folded sketch keeps MG bounds over the whole stream; heavy item survives") {
    val stateDir = tmpDir("mg-stream") + "/state"
    val ckpt = tmpDir("mg-stream-ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val q = StreamingJobs.heavyHittersStream(
      mem.toDF().toDF("item"), M, stateDir, ckpt)

    // 3 batches, 50-word vocab >> m=8 (decrements fire every batch),
    // one item fed heavily in every batch: 90 of 390 total >> 390/9
    val batches = (0 until 3).map { b =>
      List.fill(30)("HEAVY") ++ (1 to 100).map(i => "w" + ((i + b * 7) % 50))
    }
    try {
      batches.foreach { items => mem.addData(items); q.processAllAvailable() }
    } finally q.stop()

    val vdirs = new java.io.File(stateDir).listFiles().map(_.getName)
      .filter(_.startsWith("v")).map(_.stripPrefix("v").toLong)
    assert(vdirs.length == 3, s"one state snapshot per batch, got ${vdirs.toSeq}")
    val st = spark.read.parquet(s"$stateDir/v${vdirs.max}").as[MGState].head()

    val all = batches.flatten
    val exact = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(st.n == all.size, "n must count every item of every batch")
    assert(st.counts.size <= M)
    for ((g, t) <- exact) {
      val est = st.counts.getOrElse(g, 0L)
      assert(est <= t && est + st.err >= t,
        s"stream bounds violated for '$g': est=$est exact=$t err=${st.err}")
    }
    assert(st.err * (M + 1) <= st.n - st.counts.values.sum, "mass invariant violated")
    assert(st.err > 0, "wide vocab must exercise the decrement path across batches")
    assert(st.counts.contains("HEAVY"),
      s"item above n/(m+1) must survive the whole stream: ${st.counts}")
  }
}
