package graft.streaming

import graft.SparkSpec
import graft.operators.CorpusOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Ingest-time SemDeDup ≡ batch q120: the corpus replayed through the
  * stream in vec_id order — batch boundaries cutting the id-sorted
  * sequence — must produce, as the union of per-batch reports, EXACTLY
  * the batch operator's output (same fit, same τ, same lowest-partner
  * attribution). This is the strongest available equivalence: every
  * row of q120's oracle-verified answer pinned against the streaming
  * path, including dup_of/dup_cos values.
  */
class SemanticDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("stream-pruned corpus == batch q120 over replayed id-ordered batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val centroidsDir = tmpDir("semdedup-cents") + "/cents"
    val stateDir = tmpDir("semdedup-state") + "/state"
    val outDir = tmpDir("semdedup-out") + "/out"
    val ckpt = tmpDir("semdedup-ckpt")

    // pin the fit once — ingest never re-fits
    CorpusOps.fittedCentroids(spark, dir).write.parquet(centroidsDir)

    val corpus = CorpusOps.embeddingVectors(spark, dir)
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val batches = corpus.grouped((corpus.length + 2) / 3).toSeq
    assert(batches.length == 3)

    val mem = MemoryStream[(Long, Seq[Double])]
    val q = StreamingJobs.semanticDedupStream(
      mem.toDF().toDF("vec_id", "v"), centroidsDir, stateDir, outDir, ckpt)
    try batches.foreach { b => mem.addData(b.toSeq); q.processAllAvailable() }
    finally q.stop()

    type Report = (Long, Long, Boolean, Option[Long], Option[Double])
    def reportOf(df: org.apache.spark.sql.DataFrame): Set[Report] =
      df.select("vec_id", "cluster", "kept", "dup_of", "dup_cos")
        .collect().map { r =>
          (r.getLong(0), r.getLong(1), r.getBoolean(2),
            if (r.isNullAt(3)) None else Some(r.getLong(3)),
            if (r.isNullAt(4)) None else Some(r.getDouble(4)))
        }.toSet

    val streamed = (0 until 3).map(b =>
      reportOf(spark.read.parquet(s"$outDir/v$b"))).reduce(_ ++ _)
    val batch = reportOf(CorpusOps.semanticDedup(spark, dir))
    assert(streamed.size == corpus.length, "every vector reported exactly once")
    assert(streamed == batch,
      s"stream/batch SemDeDup diverge:\nonly stream: ${streamed.diff(batch)}\n" +
        s"only batch: ${batch.diff(streamed)}")

    // non-vacuity: the fixture must exercise BOTH candidate sources —
    // dups against older batches and dups within a batch
    val dups = streamed.filter(!_._3)
    assert(dups.nonEmpty, "fixture has no semantic dups at all")
    val bounds = batches.map(_.last._1)
    def batchOf(id: Long): Int = bounds.indexWhere(id <= _)
    assert(dups.exists(d => batchOf(d._1) != batchOf(d._4.get)),
      "no cross-batch dup exercised")
    assert(dups.exists(d => batchOf(d._1) == batchOf(d._4.get)),
      "no within-batch dup exercised")
  }
}
