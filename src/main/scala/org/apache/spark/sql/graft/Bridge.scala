package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ↔ Column bridge. Spark 4's Column is a Connect-neutral
  * wrapper and the converters live behind `private[sql]`; this shim is
  * the single sanctioned crossing point for graft's native expressions
  * (the same pattern every Spark extension library uses).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Serializable Hadoop conf wrapper (private[spark] upstream) — needed
    * to ship the driver's FS config to DSv2 partition readers.
    */
  def serializableConf(conf: org.apache.hadoop.conf.Configuration): SerializableHadoopConf =
    new SerializableHadoopConf(new org.apache.spark.util.SerializableConfiguration(conf))
}

final class SerializableHadoopConf(
    private val inner: org.apache.spark.util.SerializableConfiguration) extends Serializable {
  def value: org.apache.hadoop.conf.Configuration = inner.value
}
