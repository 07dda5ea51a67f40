package graft.operators
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Ad-hoc q83 stage timing (not part of the library surface). */
object ProfileQ83 {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    Tables.load(spark, dir, "documents").count()
    val docs = Tables.load(spark, dir, "documents")
    val cleaned = graft.streaming.StreamingJobs.cleanDocumentStream(docs, 5, 0.5)
    time("cleaned.count")(cleaned.count())
    val canonical = cleaned
      .withColumn("fp", md5(col("text")))
      .withColumn("canonical_id",
        min(col("doc_id")).over(org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .filter(col("doc_id") === col("canonical_id"))
      .drop("fp", "canonical_id")
    time("exact dedup count")(canonical.count())
    // localCheckpoint contract: profiling-only main (retry = re-run);
    // the catalog q83 path rides the durable pairListPin instead
    val pairs = time("capped pairs (cold)")(
      TextDedup.cappedPairs(spark, dir).select(col("a_id"), col("b_id")).localCheckpoint())
    val clusters = time("cc")(TextDedup.connectedComponents(pairs))
    time("full corpus")(TrainingPipeline.buildCorpus(spark, dir).count())
    time("funnel")(TrainingPipeline.funnel(spark, dir).count())
    spark.stop()
  }
}
