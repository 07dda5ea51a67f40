package graft.operators
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Ad-hoc fine-grained q83 stage timing (not part of the library
  * surface): times each sub-chain of buildCorpus separately to localize
  * regressions.
  */
object ProfileQ83b {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import spark.implicits._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    Tables.load(spark, dir, "documents").count()
    val docs = Tables.load(spark, dir, "documents")
    val cleaned = graft.streaming.StreamingJobs.cleanDocumentStream(docs, 5, 0.5)
    val canonical = cleaned
      .withColumn("fp", md5(col("text")))
      .withColumn("canonical_id",
        min(col("doc_id")).over(org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .filter(col("doc_id") === col("canonical_id"))
      .drop("fp", "canonical_id")
    time("canonical.count")(canonical.count())
    val pairs = time("cappedPairs eval1")(
      TextDedup.cappedPairs(spark, dir).select(col("a_id"), col("b_id")))
    time("pairs count (leg1)")(pairs.count())
    time("pairs count (leg2, cached?)")(pairs.count())
    val clusters = time("cc (incl union x2)")(TextDedup.connectedComponents(pairs))
    val nearDeduped = canonical
      .join(clusters, canonical("doc_id") === clusters("id"), "left")
      .withColumn("cluster", coalesce(col("comp"), col("doc_id")))
      .withColumn("min_surviving",
        min(col("doc_id")).over(org.apache.spark.sql.expressions.Window.partitionBy(col("cluster"))))
      .filter(col("doc_id") === col("min_surviving"))
      .drop("id", "comp", "cluster", "min_surviving")
    time("nearDeduped.count")(nearDeduped.count())
    val rate = Seq("en" -> 0.5, "de" -> 0.8, "fr" -> 0.8, "es" -> 0.8, "zh" -> 0.9)
      .foldLeft(lit(0.5)) { case (acc, (l, r)) => when(col("lang") === l, lit(r)).otherwise(acc) }
    val bucket = pmod(TextPrims.hash64(concat(lit("tp:"), col("doc_id").cast("string"))), lit(10000))
    val sampled = nearDeduped.filter(bucket < rate * 10000)
    val sbucket = pmod(TextPrims.hash64(concat(lit("split:"), col("doc_id").cast("string"))), lit(10))
    val split = sampled.withColumn("split",
      when(sbucket < 8, "train").when(sbucket === 8, "val").otherwise("test"))
    val withTokens = split.withColumn("tokens", size(TextPrims.words(col("text"))).cast("long"))
    time("nearDeduped.count again")(nearDeduped.count())
    time("sampled.count")(sampled.count())
    time("sampled.count again")(sampled.count())
    time("filter w/o hash")(nearDeduped.filter(col("doc_id") % 2 === 0).count())
    time("filter hash only")(nearDeduped.filter(bucket < 9999).count())
    time("hash on checkpointed base") {
      // deliberate: this timing MEASURES localCheckpoint (profiling-only)
      val ck = nearDeduped.localCheckpoint()
      ck.filter(bucket < rate * 10000).count()
    }
    val packed = time("packTokensBy build")(
      PipelineOps.packTokensBy(withTokens, Seq("split"), 2048L))
    time("packed.count")(packed.count())
    time("corpus orderBy count")(
      packed.select(col("doc_id"), col("lang"), col("split"), col("pack_id"), col("tokens"), col("text"))
        .orderBy(col("doc_id")).count())
    spark.stop()
  }
}
