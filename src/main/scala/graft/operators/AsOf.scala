package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General as-of join (the q37 union-and-fill pattern as a reusable
  * operator): for each left row, the latest right row with
  * `rightTime <= leftTime`, matched within `keys`.
  *
  * ONE shuffle on the key + ONE sort over the merged timeline — no
  * per-row probe amplification, which is what makes it hold at 100 TB
  * (the join-then-filter alternative materializes |left| × |right-per-
  * key| intermediates before pruning).
  *
  * Right-side payload columns are carried through `last(_, ignoreNulls)`
  * over the time-ordered union; ties between a left and right row at
  * the same instant resolve right-first (inclusive as-of, DuckDB ASOF
  * semantics).
  */
object AsOf {

  def join(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      key: String, // shared key column name on both sides
      rightPayload: Seq[String],
      inner: Boolean = true,
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!rightPayload.contains(leftTime) && !leftCols.intersect(rightPayload).nonEmpty,
      "right payload column names must not collide with left columns")

    val rTagged = right.select(
      (col(key).as("__k") +: col(rightTime).as("__t") +: lit(0).as("__side") +:
        rightPayload.map(col) ++: leftCols.filterNot(_ == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val lTagged = left.select(
      (col(key).as("__k") +: col(leftTime).as("__t") +: lit(1).as("__side") +:
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++:
        leftCols.filterNot(_ == key).map(col)): _*)

    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rTagged.unionByName(lTagged)
      .select((col("__k") +: col("__t") +: col("__side") +:
        leftCols.filterNot(_ == key).map(col) ++:
        rightPayload.map(c => last(col(c), ignoreNulls = true).over(w).as(c))): _*)

    val out = filled.filter(col("__side") === 1)
      .withColumnRenamed("__k", key)
      .drop("__t", "__side")
    if (inner) out.filter(rightPayload.map(c => col(c).isNotNull).reduce(_ || _)) else out
  }
}
