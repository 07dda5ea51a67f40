package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Progress/metrics surface — the P2 analog of the reference's per-window
  * ETA log lines, rebuilt on the listener bus: every completed write
  * action reports rows written + wall time, pulled from the executed
  * plan's SQL metrics (no extra count() scan, no driver-side loop).
  */
final class ProgressListener extends QueryExecutionListener {

  final case class Report(action: String, rowsWritten: Option[Long], wallNs: Long)

  private val reports = new ConcurrentLinkedQueue[Report]()

  def all: Seq[Report] = reports.iterator().asScala.toSeq
  def clear(): Unit = reports.clear()

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    // "numOutputRows"/"number of output rows" on the sink node covers
    // file writes; fall back to any written-rows metric present.
    val rows = qe.executedPlan.collectFirst {
      case p if p.metrics.contains("numOutputRows") => p.metrics("numOutputRows").value
    }
    reports.add(Report(funcName, rows, durationNs))
  }

  override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
    reports.add(Report(s"$funcName:FAILED(${e.getClass.getSimpleName})", None, 0L))
}

object ProgressListener {
  /** Attach a fresh listener to the session and return it. */
  def attach(spark: SparkSession): ProgressListener = {
    val l = new ProgressListener
    spark.listenerManager.register(l)
    l
  }
}
