package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LevenshteinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("kitten", "sitting"), ("abc", "abcdefghij"), ("same", "same"),
    ("a", "aaaaaaaaaaaaaaaa"),
  ).toDF("a", "b")

  test("rule adds the sound length-difference pre-filter and preserves results") {
    // parquet-backed: a LocalRelation would be constant-folded before
    // the rule ever sees the filter
    val dir = tmpDir("lev-base")
    df.write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    val q = src.filter(levenshtein($"a", $"b") <= 3)
    val before = q.collect().toSet

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ LevenshteinPrefilterRule
    try {
      val q2 = src.filter(levenshtein($"a", $"b") <= 3)
      val plan = q2.queryExecution.optimizedPlan.toString
      assert(plan.contains("abs(") && plan.contains("length("),
        s"pre-filter missing from:\n$plan")
      assert(q2.collect().toSet == before) // semantics unchanged
      // idempotent: the guard isn't stacked on reanalysis
      val occurrences = "abs\\(".r.findAllIn(
        q2.queryExecution.optimizedPlan.toString).size
      assert(occurrences == 1, s"guard duplicated:\n${q2.queryExecution.optimizedPlan}")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == LevenshteinPrefilterRule)
    }
  }

  test("pre-filter is pushable: lands in the parquet scan when columns come from a table") {
    val dir = tmpDir("lev-push")
    df.write.mode("overwrite").parquet(dir)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ LevenshteinPrefilterRule
    try {
      val q = spark.read.parquet(dir).filter(levenshtein($"a", lit("kitten")) < 3)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      // the abs(length(a) - 6) <= 3 conjunct exists as a data filter
      assert(plan.contains("abs(") && plan.contains("length("), plan)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == LevenshteinPrefilterRule)
    }
  }
}
