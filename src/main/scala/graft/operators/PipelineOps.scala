package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import TextPrims._

/** Pipeline-governance operators for a training-data build: column
  * profiling, deterministic sampling, split assignment, and benchmark
  * decontamination. Sampling/splits use the shared md5 hash family so
  * assignment is reproducible across runs AND engines (no rand()) —
  * the property a 100 TB pipeline needs for resumability and audits.
  */
object PipelineOps {

  /** Data-quality profile of the orders table: per-column null counts,
    * ranges, and constraint-violation counts in ONE scan (map-side
    * partial aggregation, no shuffle beyond the single global agg).
    */
  def dataQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when($"o_custkey".isNull, 1).otherwise(0)).as("null_custkey"),
        sum(when($"o_totalprice".isNull, 1).otherwise(0)).as("null_totalprice"),
        sum(when($"o_totalprice" <= 0, 1).otherwise(0)).as("nonpositive_price"),
        round(min($"o_totalprice"), 2).as("min_price"),
        round(max($"o_totalprice"), 2).as("max_price"),
        countDistinct($"o_orderstatus").as("n_statuses"),
        sum(when(!$"o_orderpriority".rlike("^[1-5]-"), 1).otherwise(0)).as("bad_priority"))
  }

  private val oracleQuality =
    """SELECT count(*) AS n_rows,
      |  sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_custkey,
      |  sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_totalprice,
      |  sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)::BIGINT AS nonpositive_price,
      |  round(min(o_totalprice), 2) AS min_price,
      |  round(max(o_totalprice), 2) AS max_price,
      |  count(DISTINCT o_orderstatus) AS n_statuses,
      |  sum(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END)::BIGINT
      |    AS bad_priority
      |FROM orders""".stripMargin

  /** Deterministic 10% stratified sample: hash-bucket membership
    * (`hash64(doc_id) % 10 == 0`), reproducible across runs/engines —
    * never `rand()`.
    */
  def deterministicSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .filter(pmod(hash64($"doc_id".cast("string")), lit(10)) === 0)
      .select($"doc_id", $"lang", $"n_chars")
      .orderBy($"doc_id")
  }

  private def oracleSample =
    s"""SELECT doc_id, lang, n_chars FROM documents
       |WHERE ${hash64Sql("CAST(doc_id AS VARCHAR)")} % 10 = 0
       |ORDER BY doc_id""".stripMargin

  /** Train/val/test split assignment (80/10/10) from the same hash
    * family, with per-(lang, split) counts — the audit view.
    */
  def splitAssignment(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucket = pmod(hash64(concat(lit("split:"), $"doc_id".cast("string"))), lit(10))
    Tables.load(spark, dir, "documents")
      .withColumn("split",
        when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test"))
      .groupBy($"lang", $"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
      .orderBy($"lang", $"split")
  }

  private def oracleSplit = {
    val bucket = s"""${hash64Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 10"""
    s"""SELECT lang,
       |  CASE WHEN $bucket < 8 THEN 'train' WHEN $bucket = 8 THEN 'val'
       |       ELSE 'test' END AS split,
       |  count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
       |FROM documents GROUP BY 1, 2 ORDER BY lang, split""".stripMargin
  }

  /** Benchmark decontamination: training docs sharing word-3-gram
    * shingles with the eval set (doc_id < 20 stands in for the held-out
    * benchmark). The eval shingle set is tiny → broadcast; the train
    * side streams once. Output: contaminated docs with overlap counts.
    */
  def decontamination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", words($"text").as("w"))
      .filter(size($"w") >= 3)
      .select($"doc_id", explode(array_distinct(shingles3($"w"))).as("s"))
    val evalShingles = docs.filter($"doc_id" < 20).select($"s").distinct()
    val train = docs.filter($"doc_id" >= 20)
    train.join(broadcast(evalShingles), Seq("s"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_overlap"))
      .filter($"n_overlap" >= 5)
      .orderBy($"doc_id")
  }

  private def oracleDecontamination =
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(${shingles3Sql("string_split(text, ' ')")}) AS s
       |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
       |d AS (SELECT DISTINCT doc_id, s FROM sh),
       |ev AS (SELECT DISTINCT s FROM d WHERE doc_id < 20)
       |SELECT doc_id, count(*) AS n_overlap
       |FROM d JOIN ev USING (s)
       |WHERE doc_id >= 20
       |GROUP BY doc_id HAVING count(*) >= 5 ORDER BY doc_id""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q66_data_quality" -> (dataQuality _),
    "q67_deterministic_sample" -> (deterministicSample _),
    "q68_split_assignment" -> (splitAssignment _),
    "q69_decontamination" -> (decontamination _),
  )

  val oracles: Map[String, String] = Map(
    "q66_data_quality" -> oracleQuality,
    "q67_deterministic_sample" -> oracleSample,
    "q68_split_assignment" -> oracleSplit,
    "q69_decontamination" -> oracleDecontamination,
  )
}
