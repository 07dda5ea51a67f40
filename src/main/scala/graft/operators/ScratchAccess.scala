package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Temporary bridge for [[graft.tools.Scratch]] experiments — exposes
  * operator-private artifacts to the A/B harness. Deleted with Scratch.
  */
object ScratchAccess {
  def grams(spark: SparkSession, dir: String): DataFrame = SpanOps.grams(spark, dir)
  def hash64(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = TextPrims.hash64(c)

  def snmCandNoDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text")
      .filter(size(split($"text", " ")) >= 3)
      .select($"doc_id", substring($"text", 1, 256).as("skey"),
        substring_index($"text", " ", 1).as("blk"))
    val win = Window.partitionBy($"blk").orderBy($"skey", $"doc_id")
    val nbrs = docs.select(
      ($"doc_id" +: (1 to 4).map(k => lead($"doc_id", k).over(win).as(s"n$k"))): _*)
    nbrs
      .select($"doc_id".as("x"), explode(array((1 to 4).map(k => col(s"n$k")): _*)).as("y"))
      .filter($"y".isNotNull)
      .select(least($"x", $"y").as("a_id"), greatest($"x", $"y").as("b_id"))
  }

  def snmNoDistinct(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    TextDedup.verifyJaccardAccess(snmCandNoDistinct(spark, dir), spark, dir)
      .filter(col("jaccard") >= 0.8)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }
}
