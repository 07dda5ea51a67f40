package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one entry per implemented operator from SURVEY.md §2;
  * `oracleSql` holds DuckDB-runnable ANSI SQL equivalents (same column
  * names, same ordering) for the driver's correctness gate.
  *
  * Scale fencing: every catalog entry is designed for the 100 TB shape
  * (bounded pair expansion, banding/bucketing, broadcast small sides)
  * — with no exceptions since round 9: the uncapped exact-jaccard
  * demo that used to ship as fenced q20 is now a spec-only anchor
  * (`TextDedup.dedupNgramJaccard`; see its scaladoc). Production
  * near-dedup is q61 (df-capped Jaccard), q21 (MinHash LSH), or q90
  * (df-capped containment).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.aggGroupBy(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.entries ++ TextDedup.entries ++ TextAnalysis.entries ++
      Similarity.entries ++ ExtendedRelational.entries ++
      ExtendedFunctions.entries ++ PipelineOps.entries ++
      TrainingPipeline.entries ++ CorpusOps.entries ++
      SpanOps.entries ++ graft.multimodal.Multimodal.entries ++
      SketchOps.entries ++ StorageOps.entries ++ CatalogOps.entries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ TextDedup.oracles ++ TextAnalysis.oracles ++
      Similarity.oracles ++ ExtendedRelational.oracles ++
      ExtendedFunctions.oracles ++ PipelineOps.oracles ++
      TrainingPipeline.oracles ++ CorpusOps.oracles ++
      SpanOps.oracles ++ graft.multimodal.Multimodal.oracles ++
      SketchOps.oracles ++ StorageOps.oracles ++ CatalogOps.oracles
}
