package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Table-maintenance utilities for file-backed stores — the ops layer a
  * long-running pipeline needs. Every incremental append (streaming
  * micro-batches, daily ingests, keyed-upsert rewrites) fragments a
  * parquet directory; at 100 TB scan setup cost and listing pressure
  * grow with FILE COUNT, not bytes, so periodic compaction is part of
  * the write path's contract, not an afterthought.
  */
object Maintenance {

  /** Write a Hive-partitioned parquet table with write-side alignment:
    * the frame is repartitioned ON the partition columns first, so each
    * output directory is written by the task(s) owning that key —
    * without this, every task writes a file into every partition value
    * it sees, and a 1000-task job over 100 partitions fragments into
    * up to 100,000 files. One shuffle buys file counts proportional to
    * partition values, and reads get partition PRUNING (the scan skips
    * non-matching directories entirely — asserted in PlanQualitySpec):
    * the cheapest 100 TB lever there is, because pruned bytes are
    * never listed, opened, or decoded at all.
    */
  def writePartitioned(
      df: org.apache.spark.sql.DataFrame,
      path: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "writePartitioned needs partition columns")
    df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Rewrite the parquet directory at `path` into ≈`targetBytes` files.
    *
    * - Sizing: output partition count = ceil(current bytes /
    *   targetBytes) — parquet re-encodes on write, so sizes are an
    *   estimate from current on-disk bytes (documented heuristic, the
    *   same one table formats' OPTIMIZE uses).
    * - `coalesce`, not `repartition`: partition merging without an
    *   exchange — the rewrite is a scan + write, zero shuffles.
    * - Staging: written ONCE to a same-filesystem sibling, then two
    *   atomic renames swap it in (the FileConnector.mergeRewrite
    *   discipline). The data is never in a mixed state, but a crash in
    *   the instant BETWEEN the two renames leaves nothing at `path`
    *   (the old data parked intact at `<path>.old-<stamp>`); the next
    *   compactParquet call detects that state and restores the parked
    *   directory before proceeding, so recovery is automatic — rerun.
    *
    * Returns (filesBefore, filesAfter) for the caller's audit log.
    */
  def compactParquet(
      spark: SparkSession,
      path: String,
      targetBytes: Long = 128L << 20): (Int, Int) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      // crash-between-renames recovery: restore the newest parked copy
      val parent = p.getParent
      val parked =
        if (parent == null || !fs.exists(parent)) Nil
        else fs.listStatus(parent).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith(p.getName + ".old-"))
      require(parked.nonEmpty, s"compactParquet: no data files under $path")
      val newest = parked.maxBy(_.getModificationTime).getPath
      if (!fs.rename(newest, p))
        throw new java.io.IOException(s"compact: could not restore parked $newest to $p")
      // the crash also orphaned the staging copy of that run — drop it,
      // or every crash permanently doubles the table's disk footprint
      fs.listStatus(p.getParent).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(p.getName + ".compact-"))
        .foreach(s => fs.delete(s.getPath, true))
    }
    def dataFiles(dir: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(dir).toSeq.filter(_.isFile)
        .filterNot { s =>
          val n = s.getPath.getName
          n.startsWith("_") || n.startsWith(".")
        }
    // a Hive-partitioned layout (dt=.../part-*.parquet) must be
    // compacted per partition directory — rewriting it flat through
    // this path would destroy the partitioning and mis-size the output
    val subDirs = fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("."))
    require(subDirs.isEmpty,
      s"compactParquet: $path has partition subdirectories " +
        s"(${subDirs.take(3).map(_.getPath.getName).mkString(", ")}…) — " +
        "compact each partition directory individually")
    val before = dataFiles(p)
    require(before.nonEmpty, s"compactParquet: no data files under $path")
    // a crash DURING a previous staging write (path still present)
    // leaves `<path>.compact-*` siblings behind — sweep them here too,
    // not only in the crash-between-renames branch, or they live forever
    if (p.getParent != null && fs.exists(p.getParent))
      fs.listStatus(p.getParent).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(p.getName + ".compact-"))
        .foreach(s => fs.delete(s.getPath, true))
    val totalBytes = before.map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val staging = p.suffix(s".compact-$stamp")
    val retired = p.suffix(s".old-$stamp")
    spark.read.parquet(path).coalesce(n)
      .write.mode("overwrite").parquet(staging.toString)
    if (!fs.rename(p, retired))
      throw new java.io.IOException(s"compact: could not retire $p")
    if (!fs.rename(staging, p)) { // roll back before failing
      fs.rename(retired, p)
      throw new java.io.IOException(s"compact: could not swap in $staging")
    }
    fs.delete(retired, true)
    (before.size, dataFiles(p).size)
  }
}
