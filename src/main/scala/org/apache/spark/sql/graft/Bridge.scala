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

  /** `Dataset.ofRows` for a custom logical plan (private[sql] upstream) —
    * the entry point for graft's custom operators ([[graft.plans]]).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Clone a session: same SparkContext/shared state, PRIVATE SQLConf
    * copy (private[sql] upstream). The sanctioned way to scope a conf
    * change (e.g. parquet outputTimestampType for one generation
    * write) without racing concurrent writers on the shared session —
    * the round-16 merge soak caught exactly that race corrupting an
    * unrelated writer's timestamp encoding.
    */
  def cloneSession(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** Drain the context's listener bus (private[spark] upstream) —
    * deterministic synchronization for listener-counting specs, which
    * otherwise need a fixed sleep that undercounts on a loaded box
    * (round-18 ADVICE).
    */
  def waitListenerBusEmpty(sc: org.apache.spark.SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)

  /** Interpreted ordering for a data type (private[sql] upstream). */
  def interpretedOrdering(dt: org.apache.spark.sql.types.DataType): Ordering[Any] =
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(dt)

  /** Serializable Hadoop conf wrapper (private[spark] upstream) — needed
    * to ship the driver's FS config to DSv2 partition readers.
    */
  def serializableConf(conf: org.apache.hadoop.conf.Configuration): SerializableHadoopConf =
    new SerializableHadoopConf(new org.apache.spark.util.SerializableConfiguration(conf))

  /** Re-tag a batch plan's rows as a STREAMING DataFrame (private[sql]
    * upstream) — what `Source.getBatch` must return; the exact call
    * Spark's own FileStreamSource makes.
    */
  def asStreamingFrame(spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame,
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(
        df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
          .queryExecution.toRdd, schema, isStreaming = true)

  /** The inverse: re-plan a streaming micro-batch's rows as a BATCH
    * frame a `Sink.addBatch` can hand to ordinary writers — what
    * Delta's sink does with the incoming Dataset.
    */
  def asBatchFrame(spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(classic.queryExecution.toRdd, classic.schema,
        isStreaming = false)
  }
}

final class SerializableHadoopConf(
    private val inner: org.apache.spark.util.SerializableConfiguration) extends Serializable {
  def value: org.apache.hadoop.conf.Configuration = inner.value
}
