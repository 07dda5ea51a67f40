package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The `Migration` pipeline (SURVEY.md §3.1, `d22d/task.py:31-170`)
  * re-expressed as one declarative plan:
  *
  *   read → transform (P3) → dedup (P4) → limit (P5) → write (P8)
  *
  * What the reference does imperatively — window buffering, per-batch
  * retry, progress ETA — collapses into Spark: pipelining is whole-stage
  * codegen, retry is task/stage re-execution (kept safe by idempotent
  * [[WriteMode]]s), progress is the Spark UI / listener bus. The
  * per-table loop over `get_indexes()` (P1, `d22d/task.py:78-101`)
  * becomes [[runAll]] over the source catalog.
  *
  * Scale: the plan is a narrow map-only pipeline (no shuffle) unless
  * dedup is on — dropDuplicates shuffles once on the dedup keys, which
  * replaces the reference's unbounded driver-side `set` (OOM class
  * eliminated; spills instead).
  */
final case class MigrationJob(
    source: Connector,
    sink: Connector,
    transform: Transform = Transform.identity,
    dedup: Boolean = false,             // quchong (P4): whole-row distinct
    dedupCols: Seq[String] = Nil,       // or keyed distinct
    limit: Option[Int] = None,          // size (P5)
    mode: WriteMode = WriteMode.Append,
    createDdl: Option[(DataFrame, String) => Unit] = None, // P7 hook: DDL emission before first write
) {

  /** Copy one table (`run_one` analog). Returns the row count written. */
  def runOne(spark: SparkSession, from: String, to: String): Long = {
    var df = transform(source.read(spark, from))
    if (dedup) df = if (dedupCols.nonEmpty) df.dropDuplicates(dedupCols) else df.dropDuplicates()
    limit.foreach(n => df = df.limit(n))
    createDdl.foreach(f => f(df, to))
    // Count and write in one pass: cache only when the caller wants the
    // count would double-scan; instead count the written output lazily.
    sink.write(df, to, mode)
    sink.read(spark, to).count()
  }

  /** Whole-database copy (P1): every index in the source catalog, with
    * optional per-table rename.
    */
  def runAll(spark: SparkSession, renames: Map[String, String] = Map.empty): Map[String, Long] =
    source.listIndexes(spark).map { idx =>
      val to = renames.getOrElse(idx, idx)
      idx -> runOne(spark, idx, to)
    }.toMap
}
