package graft

import org.apache.spark.sql.SparkSession

/** Session entry point for library users: the recommended configuration
  * in one place — AQE (with skew-join handling), sensible shuffle
  * parallelism, UTC, the graft SQL functions and optimizer rule.
  *
  * {{{
  *   val spark = GraftSession.builder(cores = 32).getOrCreate()
  *   // or on an existing session:
  *   GraftSession.install(spark)
  * }}}
  */
object GraftSession {

  /** Cluster-agnostic defaults; override any of them afterwards. */
  def builder(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", math.max(cores, 2).toString)
      // 256 MB scan splits: fewer, fatter tasks at the 100 TB end
      .config("spark.sql.files.maxPartitionBytes", (256L * 1024 * 1024).toString)
      .withExtensions(new functions.GraftExtensions)

  /** Install graft's SQL functions, optimizer rule, and planner
    * strategy into a live session (extensions only apply at
    * construction time).
    */
  def install(spark: SparkSession): SparkSession = {
    functions.GraftExtensions.register(spark)
    if (!spark.experimental.extraOptimizations.contains(functions.LevenshteinPrefilterRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ functions.LevenshteinPrefilterRule
    plans.TopKWindowRewriteRule.install(spark) // rewrite rule + strategy
    spark
  }
}
