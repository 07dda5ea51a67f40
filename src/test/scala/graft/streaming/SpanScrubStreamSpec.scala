package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Ingest-time span scrub: spans are computed against the corpus AS OF
  * the previous batch — exact boundaries are hand-derivable, so the
  * expectations here are literal intervals, not a re-run of the same
  * code path.
  */
class SpanScrubStreamSpec extends SparkSpec {
  import spark.implicits._

  private val a = (1 to 12).map(i => s"a$i").mkString(" ") // 12 words
  private val fresh1 = (1 to 8).map(i => s"x$i").mkString(" ")
  private val fresh2 = (1 to 8).map(i => s"y$i").mkString(" ")

  test("stream span scrub: spans only against earlier batches, exact boundaries") {
    val gramDir = tmpDir("scrub-grams") + "/grams"
    val spansDir = tmpDir("scrub-spans") + "/spans"
    val ckpt = tmpDir("scrub-ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = StreamingJobs.incrementalSpanScrub(stream, gramDir, spansDir, ckpt)
    try {
      // batch 0: the corpus seed — no earlier corpus, so no spans
      mem.addData(Seq((1L, a), (2L, fresh1)))
      q.processAllAvailable()
      // batch 1: 3 = verbatim copy of doc 1 (span = whole doc);
      //          4 = fresh text; 5 = same-batch copy of 4 (within-batch
      //          repeats must NOT count — corpus is earlier batches only)
      mem.addData(Seq((3L, a), (4L, fresh2), (5L, fresh2)))
      q.processAllAvailable()
      // batch 2: 6 = first 9 words of doc 1 + 5 fresh words → grams at
      // starts 1..5 hit the corpus, covering exactly positions 1..9
      // (>= the default MinDupSpan of 8, so the policy filter keeps it);
      // 7 = a 7-word prefix of doc 1 — covered run of 7 falls UNDER the
      // threshold and must be filtered out, matching the batch policy
      mem.addData(Seq(
        (6L, (1 to 9).map(i => s"a$i").mkString(" ") + " z1 z2 z3 z4 z5"),
        (7L, (1 to 7).map(i => s"a$i").mkString(" "))))
      q.processAllAvailable()
    } finally q.stop()

    def spansOfBatch(id: Long) =
      spark.read.parquet(s"$spansDir/v$id")
        .select($"doc_id", $"span_start", $"span_end", $"span_words")
        .as[(Long, Long, Long, Long)].collect().toSet

    assert(spansOfBatch(0) == Set.empty, "seed batch must have no spans")
    assert(spansOfBatch(1) == Set((3L, 1L, 12L, 12L)),
      "verbatim copy should be one whole-doc span; fresh + within-batch dup none")
    assert(spansOfBatch(2) == Set((6L, 1L, 9L, 9L)),
      "copied prefix >= threshold kept with exact boundaries; " +
        "7-word prefix (under MinDupSpan) filtered by the policy")

    // the gram store accumulated one delta per batch
    val deltas = new java.io.File(gramDir).listFiles().map(_.getName).sorted
    assert(deltas.toSeq == Seq("v0", "v1", "v2"), s"got ${deltas.toSeq}")
  }
}
