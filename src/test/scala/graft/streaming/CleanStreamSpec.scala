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
}
