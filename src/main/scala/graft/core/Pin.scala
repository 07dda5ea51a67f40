package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable materialization pins — the cluster-safe replacement for
  * `localCheckpoint()` at the points where two consumers must read the
  * SAME materialization of a plan whose physical layout is not a pure
  * function of its input (sampled range-partition boundaries,
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
  * The on-disk path carries a session-unique component alongside the
  * caller's name: the memo is keyed by (session, name), and a second
  * session in the same JVM (or a concurrent JVM) building the same
  * name must NOT `mode(overwrite)` a directory another session's
  * memoized DataFrame still lazily reads — each session gets its own
  * artifact directory, so the one-materialization contract holds per
  * session by construction. Stale directories from past JVMs are
  * pruned lazily (older than [[PruneAfterMs]]) the first time a JVM
  * pins anything; active sessions' pins are always younger than that.
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

  /** Prune pin dirs untouched for this long — generously above any
    * single run's lifetime, so concurrent JVMs never reap each other.
    */
  private val PruneAfterMs: Long = 24L * 3600 * 1000

  private val Root = "target/graft-layout/pins"

  private lazy val pruneOnce: Unit = {
    val root = new java.io.File(Root)
    val cutoff = System.currentTimeMillis() - PruneAfterMs
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.lastModified() < cutoff)
      .foreach { d =>
        def rec(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rec)
          f.delete(): Unit
        }
        rec(d)
      }
  }

  /** Corpus-dir tag for artifact names — the ONE rendering of the
    * scheme (StorageOps layouts, SketchOps rollups and the tools call
    * this too).
    */
  def tag(dir: String): String = java.lang.Integer.toHexString(dir.hashCode)

  /** The artifact directory for (session, name). */
  private[graft] def pathOf(spark: SparkSession, name: String): java.io.File =
    new java.io.File(
      s"$Root/$name-s${java.lang.Integer.toHexString(System.identityHashCode(spark))}")

  /** The parquet re-read of `df`, written once per (session, `name`).
    * `name` must identify the logical input AND every parameter the
    * pinned rows depend on (corpus-dir [[tag]], seeds, budgets); the
    * input plan must be value-deterministic so that a late rebuild
    * (fresh session, same dir) produces the same rows.
    */
  def shared(spark: SparkSession, name: String)(df: => DataFrame): DataFrame =
    memo.computeIfAbsent((spark, name), _ => {
      pruneOnce
      val path = pathOf(spark, name).getPath
      df.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    })

  /** True iff the artifact for (session, name) has been built this JVM
    * — spec hook. */
  private[graft] def isBuilt(spark: SparkSession, name: String): Boolean =
    memo.containsKey((spark, name))
}
