package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import TextPrims._

/** End-to-end training-corpus builder — the integration of the operator
  * catalog into the job a user actually runs: raw documents → quality/
  * repetition filter → PII redaction → exact dedup (canonical per
  * content hash) → near-dedup (MinHash/LSH pairs → connected
  * components, canonical per cluster) → stratified sampling → split
  * assignment → per-split token packing. Every stage is one of the
  * oracle-gated operators (q71/q72/q19/q21/q70/q74/q68/q73); this
  * object only composes them, so its scale story is the sum of its
  * parts — no new shuffles beyond the stages themselves, and the
  * pipeline is hash-deterministic end to end (no rand() anywhere: two
  * runs give byte-identical corpora, the property a resumable 100 TB
  * build needs).
  */
object TrainingPipeline {

  private val MinWords = 5
  private val MaxTopWordFrac = 0.5
  private val StratRates = Seq("en" -> 0.5, "de" -> 0.8, "fr" -> 0.8, "es" -> 0.8, "zh" -> 0.9)
  private val StratDefault = 0.5
  private val PackBudget = 2048L

  /** The final corpus: (doc_id, lang, split, pack_id, tokens, text). */
  def buildCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")

    // 1. quality/repetition filter + PII redaction (map-only; the same
    //    columns the streaming ingest path runs)
    val cleaned = graft.streaming.StreamingJobs
      .cleanDocumentStream(docs, MinWords, MaxTopWordFrac)

    // 2. exact dedup: canonical = min doc_id per content fingerprint
    val canonical = cleaned
      .withColumn("fp", md5($"text"))
      .withColumn("canonical_id",
        min($"doc_id").over(org.apache.spark.sql.expressions.Window.partitionBy($"fp")))
      .filter($"doc_id" === $"canonical_id")
      .drop("fp", "canonical_id")

    // 3. near-dedup: LSH candidate pairs → clusters → keep, per cluster,
    //    the smallest doc_id that SURVIVED steps 1-2 — not the raw
    //    cluster label: the raw min may have been filtered out earlier,
    //    and "keep comp == doc_id" would then drop the whole cluster's
    //    content from the corpus.
    val pairs = TextDedup.dedupMinhashLsh(spark, dir).select($"a_id", $"b_id")
    val clusters = TextDedup.connectedComponents(pairs)
    val nearDeduped = canonical
      .join(clusters, canonical("doc_id") === clusters("id"), "left")
      .withColumn("cluster", coalesce($"comp", $"doc_id"))
      .withColumn("min_surviving",
        min($"doc_id").over(org.apache.spark.sql.expressions.Window.partitionBy($"cluster")))
      .filter($"doc_id" === $"min_surviving")
      .drop("id", "comp", "cluster", "min_surviving")

    // 4. stratified sampling (map-only hash threshold per lang)
    val rate = StratRates.foldLeft(lit(StratDefault)) {
      case (acc, (l, r)) => when($"lang" === l, lit(r)).otherwise(acc)
    }
    val bucket = pmod(hash64(concat(lit("tp:"), $"doc_id".cast("string"))), lit(10000))
    val sampled = nearDeduped.filter(bucket < rate * 10000)

    // 5. split assignment (80/10/10 hash buckets)
    val sbucket = pmod(hash64(concat(lit("split:"), $"doc_id".cast("string"))), lit(10))
    val split = sampled.withColumn("split",
      when(sbucket < 8, "train").when(sbucket === 8, "val").otherwise("test"))

    // 6. per-split token packing (strata never share a pack)
    val withTokens = split.withColumn("tokens", size(words($"text")).cast("long"))
    PipelineOps.packTokensBy(withTokens, Seq("split"), PackBudget)
      .select($"doc_id", $"lang", $"split", $"pack_id", $"tokens", $"text")
      .orderBy($"doc_id")
  }

  /** Stage-by-stage funnel audit: how many documents survive each
    * stage. Rows-only by design (the stages themselves are the
    * oracle-gated operators).
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val cleaned = graft.streaming.StreamingJobs
      .cleanDocumentStream(docs, MinWords, MaxTopWordFrac)
    val corpus = buildCorpus(spark, dir).cache() // consumed twice below
    val out = Seq(
      ("0_raw", docs.count()),
      ("1_cleaned", cleaned.count()),
      ("2_corpus", corpus.count()),
      ("3_packs", corpus.select($"split", $"pack_id").distinct().count()),
    ).toDF("stage", "n_docs")
    corpus.unpersist()
    out
  }

  /** q83 is rows-only by design: the pipeline composes operators that
    * are each individually oracle-gated (q71/q72/q19/q21/q70/q74/q68/
    * q73); the integration property (determinism, dedup, packing) is
    * asserted in TrainingPipelineSpec.
    */
  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q83_training_funnel" -> (funnel _),
  )

  val oracles: Map[String, String] = Map.empty
}
