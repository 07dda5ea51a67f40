package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable materialization pins — the cluster-safe replacement for
  * `localCheckpoint()` at the points where downstream consumers must
  * read ONE materialization of a plan whose physical layout is not a
  * pure function of its input (sampled range-partition boundaries,
  * iterative model fits), and where that materialization must survive
  * executor loss.
  *
  * `localCheckpoint` truncates lineage and stores its blocks on
  * executors with NO replication: on a real cluster a lost executor
  * makes the pinned RDD unrecoverable mid-job — Spark cannot
  * recompute past a truncated lineage, so a 100 TB corpus build dies
  * hours in. Until round 9 the operators papered over this with a
  * scaladoc note ("on a cluster, persist to reliable storage
  * instead"); this object makes the contract code. [[shared]] writes
  * the frame ONCE per (session, name) to parquet under
  * `target/graft-layout/pins` — the same artifact root
  * [[graft.operators.StorageOps]] uses for its layouts, which on a
  * cluster is a path on the shared filesystem (HDFS/S3) — and hands
  * every consumer the re-read. Recomputation after ANY failure
  * re-reads identical bytes, so pinned partition ids, pair lists and
  * model rows cannot drift or vanish mid-job, and repeated calls in
  * one session (Bench iterations, multi-consumer funnels) reuse the
  * artifact instead of re-deriving it (the `fitMemo` /
  * `warmSharedCaches` discipline).
  *
  * Derived columns that are deterministic functions of stored columns
  * (hash keys, window ranks recomputed downstream) survive the
  * round-trip by construction; anything layout-dependent
  * (`spark_partition_id()`) must be computed BEFORE the pin so it is
  * stored as data — exactly what the global-numbering operators do.
  */
object Pin {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Corpus-dir tag for pin names, same scheme as StorageOps layouts. */
  def tag(dir: String): String = java.lang.Integer.toHexString(dir.hashCode)

  /** The parquet re-read of `df`, written once per (session, `name`).
    * `name` must identify the logical input (include [[tag]] of the
    * corpus dir); the input plan must be value-deterministic so that a
    * late rebuild (fresh JVM, same dir) produces the same rows.
    */
  def shared(spark: SparkSession, name: String)(df: => DataFrame): DataFrame =
    memo.computeIfAbsent((spark, name), _ => {
      val path = s"target/graft-layout/pins/$name"
      df.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    })

  /** True iff the artifact for (session, name) has been built this JVM
    * — spec hook. */
  private[graft] def isBuilt(spark: SparkSession, name: String): Boolean =
    memo.containsKey((spark, name))
}
