package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming PSI monitor: each micro-batch's report must reflect the
  * CUMULATIVE current population against the fixed reference deciles.
  * Expected values re-derived in plain Scala — exact-percentile
  * interpolation (pos = p·(n−1), linear), the same add-one smoothing,
  * and HALF_UP rounding — an implementation-independent path.
  */
class PsiDriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def deciles(xs: Seq[Double]): Seq[Double] = {
    val s = xs.sorted
    (1 to 9).map { i =>
      val pos = i / 10.0 * (s.length - 1)
      val lo = math.floor(pos).toInt
      val v = if (lo + 1 > s.length - 1) s(lo)
        else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  private def binOf(x: Double, cuts: Seq[Double]): Long = cuts.count(x > _).toLong

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("per-batch reports carry cumulative counts and PSI vs the fixed reference") {
    val refXs = (1 to 100).map(_.toDouble)
    val refDir = tmpDir("psi-ref") + "/ref"
    refXs.toDF("x").write.parquet(refDir)

    val stateDir = tmpDir("psi-stream") + "/state"
    val outDir = tmpDir("psi-stream-out") + "/reports"
    val ckpt = tmpDir("psi-stream-ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Double]
    val q = StreamingJobs.psiDriftStream(
      mem.toDF().toDF("x"), refDir, stateDir, outDir, ckpt)

    // batch 0 roughly matches the reference; batch 1 is heavily
    // top-shifted, so the cumulative PSI must RISE
    val b0 = (1 to 50).map(_ * 2.0)
    val b1 = (1 to 40).map(i => 90.0 + i * 0.25)
    try {
      mem.addData(b0); q.processAllAvailable()
      mem.addData(b1); q.processAllAvailable()
    } finally q.stop()

    val cuts = deciles(refXs)
    def expected(cur: Seq[Double]): Map[Long, (Long, Long, Double, Double, Double)] = {
      val refN = refXs.groupBy(binOf(_, cuts)).view.mapValues(_.size.toLong).toMap
      val curN = cur.groupBy(binOf(_, cuts)).view.mapValues(_.size.toLong).toMap
      (0L to 9L).map { b =>
        val rn = refN.getOrElse(b, 0L); val cn = curN.getOrElse(b, 0L)
        val rr = (rn + 1.0) / (refXs.size + 10); val cr = (cn + 1.0) / (cur.size + 10)
        b -> ((rn, cn, r6(rr), r6(cr), r6((rr - cr) * math.log(rr / cr))))
      }.toMap
    }
    def read(v: Int): Map[Long, (Long, Long, Double, Double, Double)] =
      spark.read.parquet(s"$outDir/v$v")
        .as[(Long, Long, Long, Double, Double, Double)].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap

    assert(read(0) == expected(b0), "batch-0 report must cover batch 0 alone")
    assert(read(1) == expected(b0 ++ b1), "batch-1 report must be cumulative")
    def psi(m: Map[Long, (Long, Long, Double, Double, Double)]): Double = m.values.map(_._5).sum
    assert(psi(read(1)) > psi(read(0)),
      s"top-shifted batch must raise cumulative PSI: ${psi(read(1))} vs ${psi(read(0))}")
  }
}
