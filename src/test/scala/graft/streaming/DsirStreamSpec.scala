package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.security.MessageDigest

/** Streaming DSIR: scores must use the raw pool as of the PREVIOUS
  * batch (strictly-older-than-self), and the bucket-count state must
  * equal exact whole-stream counts. Expected values are re-derived in
  * plain Scala (independent of the DataFrame implementation) from the
  * same shared hash/weight definitions' published formulas.
  */
class DsirStreamSpec extends SparkSpec {
  import spark.implicits._

  private val B = graft.operators.CorpusOps.DsirBuckets

  private def bucket(g: String): Long = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"dsir:$g".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % B
  }

  private def grams(text: String): Seq[String] = {
    val w = text.split(" ", -1)
    if (w.length < 2) Seq.empty else w.sliding(2).map(_.mkString(" ")).toSeq
  }

  private def score(text: String, tgtCnt: Map[Long, Long], rawCnt: Map[Long, Long]): Double = {
    val tt = tgtCnt.values.sum
    val rt = rawCnt.values.sum
    val s = grams(text).map(bucket).map { b =>
      math.log((tgtCnt.getOrElse(b, 0L) + 1.0) / (tt + B)) -
        math.log((rawCnt.getOrElse(b, 0L) + 1.0) / (rt + B))
    }.sum
    BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def countBuckets(texts: Seq[String]): Map[Long, Long] =
    texts.flatMap(grams).map(bucket).groupBy(identity)
      .map { case (b, xs) => b -> xs.size.toLong }

  test("scores use the previous batch's raw pool; state accumulates exact counts") {
    val targetTexts = Seq("good clean text here", "clean text wins")
    val targetDir = tmpDir("dsir-target") + "/docs"
    targetTexts.toDF("text").write.parquet(targetDir)

    val stateDir = tmpDir("dsir-stream") + "/state"
    val outDir = tmpDir("dsir-stream-out") + "/scores"
    val ckpt = tmpDir("dsir-stream-ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingJobs.dsirScoreStream(
      mem.toDF().toDF("doc_id", "text"), targetDir, stateDir, outDir, ckpt)

    val b0 = Seq((1L, "clean text here now"), (2L, "junk junk junk junk"))
    val b1 = Seq((3L, "clean text here now"), (4L, "other words entirely here"))
    try {
      mem.addData(b0); q.processAllAvailable()
      mem.addData(b1); q.processAllAvailable()
    } finally q.stop()

    val tgtCnt = countBuckets(targetTexts)

    // batch 0 scored against an EMPTY raw pool
    val s0 = spark.read.parquet(s"$outDir/v0").as[(Long, Double)].collect().toMap
    assert(s0(1L) == score(b0.head._2, tgtCnt, Map.empty), "batch-0 doc 1")
    assert(s0(2L) == score(b0(1)._2, tgtCnt, Map.empty), "batch-0 doc 2")

    // batch 1 scored against batch 0's pool only — doc 3 repeats doc 1's
    // text, so its buckets now carry raw mass and its score must DROP
    val raw0 = countBuckets(b0.map(_._2))
    val s1 = spark.read.parquet(s"$outDir/v1").as[(Long, Double)].collect().toMap
    assert(s1(3L) == score(b1.head._2, tgtCnt, raw0), "batch-1 doc 3")
    assert(s1(4L) == score(b1(1)._2, tgtCnt, raw0), "batch-1 doc 4")
    assert(s1(3L) < s0(1L),
      s"novelty must drop for repeated text: ${s1(3L)} vs ${s0(1L)}")

    // final state = exact bucket counts of ALL streamed docs
    val st = spark.read.parquet(s"$stateDir/v1").as[(Long, Long)].collect().toMap
    assert(st == countBuckets((b0 ++ b1).map(_._2)), "state must be exact counts")
  }
}
