package graft.core

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Per-row transform surface — the `format_data(dict) -> dict` analog
  * (P3, `d22d/task.py:113-117`; example transform `example.py:28-33`:
  * rename `user_id→uuid`, add `time`, add constant `tag`).
  *
  * Declarative steps compile to `Column` expressions so Catalyst keeps
  * pushdown/pruning/codegen; the row-lambda escape hatch exists for
  * genuinely imperative logic but breaks whole-stage codegen — prefer
  * steps.
  */
sealed trait TransformStep
object TransformStep {
  final case class Rename(from: String, to: String) extends TransformStep
  final case class Add(name: String, expr: Column) extends TransformStep
  final case class Drop(names: Seq[String]) extends TransformStep
  final case class Keep(names: Seq[String]) extends TransformStep
  /** Falsy `format_data` return = row drop (`d22d/task.py:116-117`) —
    * declaratively, a filter. */
  final case class Filter(pred: Column) extends TransformStep
  final case class WithColumn(name: String, expr: Column) extends TransformStep
}

final case class Transform(steps: Seq[TransformStep] = Nil) {
  import TransformStep._

  def rename(from: String, to: String): Transform = copy(steps :+ Rename(from, to))
  def add(name: String, expr: Column): Transform = copy(steps :+ Add(name, expr))
  def drop(names: String*): Transform = copy(steps :+ Drop(names))
  def keep(names: String*): Transform = copy(steps :+ Keep(names))
  def filter(pred: Column): Transform = copy(steps :+ Filter(pred))
  def withColumn(name: String, expr: Column): Transform = copy(steps :+ WithColumn(name, expr))

  def apply(df: DataFrame): DataFrame = steps.foldLeft(df) {
    case (d, Rename(f, t))    => d.withColumnRenamed(f, t)
    case (d, Add(n, e))       => d.withColumn(n, e)
    case (d, WithColumn(n, e)) => d.withColumn(n, e)
    case (d, Drop(ns))        => d.drop(ns: _*)
    case (d, Keep(ns))        => d.select(ns.map(col): _*)
    case (d, Filter(p))       => d.filter(p)
  }
}

object Transform {
  val identity: Transform = Transform()

  /** Imperative escape hatch: map over `Row`s with an explicit output
    * schema; returning null drops the row (falsy-`format_data` parity).
    * Not codegen'd — use only when Column expressions can't express it.
    */
  def rowLambda(df: DataFrame, out: StructType)(f: Row => Row): DataFrame =
    df.mapPartitions(_.map(f).filter(_ != null))(Encoders.row(out))

  /** `format_value` (P10, `d22d/task.py:23-28`): integral float → long.
    * Numeric inputs only (ANSI mode rejects non-numeric strings).
    */
  def integralFloatToLong(c: Column): Column =
    when(c.isNotNull && c === floor(c), c.cast(LongType))

  /** `format_value` string leg: strip. */
  def normString(c: Column): Column = trim(c.cast(StringType))

  /** Join-key coercion (`d22d/task.py:257,262`): stringified + trimmed,
    * with integral floats collapsed so 3.0 and 3 meet as "3". Done on
    * the string representation (regex) so it is type-agnostic and
    * ANSI-safe — no numeric cast that would throw on 'b111'.
    */
  def joinKey(c: Column): Column =
    regexp_replace(trim(c.cast(StringType)), "^(-?\\d+)\\.0+$", "$1")
}
