package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Temporary bridge for [[graft.tools.Scratch]] experiments — exposes
  * operator-private artifacts to the A/B harness. Deleted with Scratch.
  */
object ScratchAccess {
  def grams(spark: SparkSession, dir: String): DataFrame = SpanOps.grams(spark, dir)
  def hash64(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = TextPrims.hash64(c)
}
