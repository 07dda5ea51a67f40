package graft.core

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Round-15 ADVICE (medium): csv option defaults were asymmetric across
  * the graftmanifest paths — the batch READ injected `header=true` but
  * the batch/streaming WRITERS wrote headerless and the streaming source
  * read with no defaults. A csv table written and read through
  * `format("graftmanifest")` consumed its first data row as a header;
  * connector-written (header-bearing) csv ingested each file's header
  * line as a data row. Now [[FormatDefaults]] is the one definition all
  * four paths apply.
  */
class ManifestCsvDefaultsSpec extends SparkSpec {
  import spark.implicits._

  test("csv batch round-trip: write and read agree on headers — no row lost, no header-as-data") {
    val root = tmpDir("gm-csv-batch") + "/t"
    Seq((1, "a"), (2, "b")).toDF("id", "v")
      .write.format("graftmanifest").option("format", "csv").save(root)
    Seq((3, "c")).toDF("id", "v")
      .write.format("graftmanifest").option("format", "csv")
      .mode(SaveMode.Append).save(root)
    val got = spark.read.format("graftmanifest").option("format", "csv").load(root)
      .as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "a", 2 -> "b", 3 -> "c"),
      s"csv round-trip lost or fabricated rows: $got")
  }

  test("csv streaming sink output is readable back with the same defaults") {
    val root = tmpDir("gm-csv-sink") + "/t"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Int, String)]
    val q = mem.toDF().toDF("id", "v").writeStream.format("graftmanifest")
      .option("path", root).option("format", "csv")
      .option("checkpointLocation", tmpDir("gm-csv-sink-ckpt"))
      .outputMode("append").start()
    try {
      mem.addData((1, "a"), (2, "b")); q.processAllAvailable()
      mem.addData((3, "c")); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.format("graftmanifest").option("format", "csv").load(root)
      .as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "a", 2 -> "b", 3 -> "c"), s"sink/read header mismatch: $got")
  }

  test("csv streaming source does not ingest header lines as data rows") {
    val root = tmpDir("gm-csv-src") + "/t"
    Seq((1, "a")).toDF("id", "v")
      .write.format("graftmanifest").option("format", "csv").save(root)
    val q = spark.readStream.format("graftmanifest").option("format", "csv").load(root)
      .writeStream.format("memory").queryName("gmcsv").outputMode("append").start()
    try {
      q.processAllAvailable()
      Seq((2, "b")).toDF("id", "v")
        .write.format("graftmanifest").option("format", "csv")
        .mode(SaveMode.Append).save(root)
      q.processAllAvailable()
      val seen = spark.table("gmcsv").as[(Int, String)].collect().toSet
      assert(seen == Set(1 -> "a", 2 -> "b"),
        s"streaming csv read drifted from batch semantics: $seen")
    } finally q.stop()
  }
}
