package graft.core

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** MERGE INTO semantics on non-transactional file targets — the full
  * upsert surface (S28/S29/P11: chunked UPDATE, `ON DUPLICATE KEY
  * UPDATE` with expressions like `GREATEST(VALUES(x), x)`, delete-
  * matched) as one rewrite:
  *
  * {{{
  *   MergeInto(conn, "t", keys = Seq("id"))
  *     .whenMatchedUpdate(Map("v" -> (source, target) => greatest(source("v"), target("v"))))
  *     .whenNotMatchedInsert()
  *     .run(sourceDf)
  * }}}
  *
  * On a transactional format (Delta/Iceberg) the same call maps to a
  * native MERGE with file-level pruning; here it is a deterministic
  * read-join-rewrite: target LEFT-ANTI source = untouched rows,
  * target JOIN source = matched (updated or deleted), source LEFT-ANTI
  * target = inserts.
  */
final case class MergeInto(
    target: Connector,
    index: String,
    keys: Seq[String],
    updateExprs: Map[String, (DataFrame, DataFrame) => Column] = Map.empty,
    deleteMatched: Boolean = false,
    insertNotMatched: Boolean = false,
) {
  require(keys.nonEmpty, "MERGE needs key columns")

  /** Matched rows: each listed column replaced by expr(source, target);
    * unlisted columns keep the target value.
    */
  def whenMatchedUpdate(exprs: Map[String, (DataFrame, DataFrame) => Column]): MergeInto =
    copy(updateExprs = exprs, deleteMatched = false)

  /** Matched rows are removed. */
  def whenMatchedDelete(): MergeInto = copy(deleteMatched = true, updateExprs = Map.empty)

  /** Unmatched source rows are inserted. */
  def whenNotMatchedInsert(): MergeInto = copy(insertNotMatched = true)

  def run(source: DataFrame): Unit = {
    val spark = source.sparkSession
    val tgt = target.read(spark, index)
    require(keys.forall(tgt.columns.contains), s"target lacks key cols $keys")

    val srcKeys = source.select(keys.map(source.apply): _*).dropDuplicates(keys)
    val untouched = tgt.join(srcKeys, keys, "left_anti")

    val matched: DataFrame =
      if (deleteMatched) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], tgt.schema)
      else {
        val joined = tgt.alias("t").join(source.alias("s"), keys, "inner")
        val outCols = tgt.columns.toSeq.map { c =>
          updateExprs.get(c) match {
            case Some(f) => f(source, tgt).as(c)
            case None if keys.contains(c) => col(s"t.$c").as(c)
            case None => col(s"t.$c").as(c)
          }
        }
        joined.select(outCols: _*)
      }

    val inserted: DataFrame =
      if (!insertNotMatched) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], tgt.schema)
      else source.join(tgt.select(keys.map(tgt.apply): _*).dropDuplicates(keys), keys, "left_anti")
        .select(tgt.columns.filter(source.columns.contains).map(col): _*)

    val result = untouched
      .unionByName(matched, allowMissingColumns = true)
      .unionByName(inserted, allowMissingColumns = true)
    // stage: the result plan reads the target location — overwriting it
    // in place would clobber its own input partitions mid-job
    val tmp = java.nio.file.Files.createTempDirectory("graft-merge-").resolve(index).toString
    result.write.mode(SaveMode.Overwrite).parquet(tmp)
    target.write(spark.read.parquet(tmp), index, WriteMode.Overwrite)
  }
}
