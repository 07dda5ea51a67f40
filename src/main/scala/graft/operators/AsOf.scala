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
  * The WHOLE right row rides through `last(_, ignoreNulls)` as one
  * nullable struct (null on left rows, never null on right rows), so a
  * matched right row with a null payload stays the match — no back-fill
  * from an older row — and inner-ness is decided by the match marker,
  * not payload nullability (DuckDB ASOF semantics for nullable
  * payloads). Ties between a left and right row at the same instant
  * resolve right-first (inclusive as-of).
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
    // Null on left rows, non-null on every right row (struct() itself is
    // never null), so last(ignoreNulls) lands on the latest RIGHT ROW —
    // not the latest non-null payload value.
    val rightRow = when(col("__side") === 0,
      struct(rightPayload.map(col): _*))
    val filled = rTagged.unionByName(lTagged)
      .select((col("__k") +: col("__t") +: col("__side") +:
        leftCols.filterNot(_ == key).map(col) :+
        last(rightRow, ignoreNulls = true).over(w).as("__r")): _*)

    val out = filled.filter(col("__side") === 1)
      .select((col("__k").as(key) +: col("__r").as("__r") +:
        leftCols.filterNot(_ == key).map(col)): _*)
    val matched = if (inner) out.filter(col("__r").isNotNull) else out
    matched
      .select((key +: leftCols.filterNot(_ == key)).map(col) ++:
        rightPayload.map(c => col("__r").getField(c).as(c)): _*)
  }
}
