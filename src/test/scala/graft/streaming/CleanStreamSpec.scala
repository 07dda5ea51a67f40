package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** The ingest-time cleaning pipeline: stateless quality filter + PII
  * redaction must produce IDENTICAL output streamed (file source,
  * AvailableNow) and batch — over the real corpus plus planted PII.
  */
class CleanStreamSpec extends SparkSpec {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("streamed clean == batch clean over the corpus, PII redacted") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", concat($"text",
        lit(" mail bob@x.io at 10.0.0.1 or +1-555-0000")).as("text"))
    val staged = tmpDir("clean-stage")
    docs.write.mode("overwrite").parquet(staged)

    val stream = spark.readStream
      .schema(spark.read.parquet(staged).schema).parquet(staged)
    val q = StreamingJobs.cleanDocumentStream(stream)
      .writeStream.format("memory").queryName("clean_stream")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("clean_stream")
    val batch = StreamingJobs.cleanDocumentStream(spark.read.parquet(staged))
    assert(streamed.count() > 0)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    // redaction applied: no raw PII survives in the cleaned text
    val dirty = streamed.filter(
      col("text").contains("bob@x.io") || col("text").contains("10.0.0.1") ||
        col("text").contains("+1-555-0000")).count()
    assert(dirty == 0)
    assert(streamed.filter(col("text").contains("[EMAIL]")).count() == streamed.count())
  }

  test("streamingNovelDocs: stream-static anti join passes only unseen content") {
    import org.apache.spark.sql.functions._
    val corpus = Tables.load(spark, dir, "documents")
    // corpus fingerprints = first 400 docs; stream = docs 350-499, so
    // 350-399 are already-known content and 400-499 are novel
    val known = corpus.filter($"doc_id" < 400).select(md5($"text").as("fp")).distinct()
    val staged = tmpDir("novel-stage")
    corpus.filter($"doc_id" >= 350).select($"doc_id", $"text")
      .write.mode("overwrite").parquet(staged)

    val stream = spark.readStream
      .schema(spark.read.parquet(staged).schema).parquet(staged)
    val q = StreamingJobs.streamingNovelDocs(stream, known)
      .writeStream.format("memory").queryName("novel_stream")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("novel_stream").select($"doc_id").as[Long].collect().sorted
    // exact-dup planted docs in 400-499 whose text already appears below
    // 400 are correctly dropped too — compute the expectation from data
    val expected = corpus.filter($"doc_id" >= 350).as("s")
      .join(known, md5($"s.text") === known("fp"), "left_anti")
      .select($"doc_id").as[Long].collect().sorted
    assert(got.sameElements(expected))
    assert(got.forall(_ >= 400)) // nothing below 400 can be novel
    assert(got.nonEmpty)
  }
}
