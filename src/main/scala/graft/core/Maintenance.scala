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

  /** Read a table maintained by [[compactParquet]]: resolves the
    * manifest pointer when one exists, else a plain directory read.
    * Callers must come through here (not `spark.read.parquet(path)`)
    * once a table has been compacted — the live file set is named by
    * the manifest, not by directory shape.
    */
  def readTable(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame =
    ManifestTable.read(spark, path)

  /** Rewrite the live file set of the table at `path` into
    * ≈`targetBytes` files.
    *
    * - Sizing: output file count = ceil(current bytes / targetBytes) —
    *   parquet re-encodes on write, so sizes are an estimate from
    *   current on-disk bytes (documented heuristic, the same one table
    *   formats' OPTIMIZE uses).
    * - `coalesce`, not `repartition`: partition merging without an
    *   exchange — the rewrite is a scan + write, zero shuffles.
    * - Commit: the rewrite lands in a fresh `g-*` generation directory
    *   and goes live via ONE [[ManifestTable]] pointer commit — data
    *   directories are never renamed (round 12; the previous
    *   two-rename swap was atomic on HDFS but a non-atomic O(data)
    *   copy window on S3-family stores, where `rename` does not
    *   exist — `ObjectStoreCommitSpec` demonstrates the torn state
    *   the old discipline left there). A plain directory is ADOPTED
    *   in place on first touch (commit 1 references its existing
    *   files; zero data movement); superseded files are gc'd after
    *   commit with a reader-grace history window. A crash at ANY
    *   point leaves either the old or the new file set live — never a
    *   mix, on any store that has atomic single-object creation.
    *
    * Returns (filesBefore, filesAfter) for the caller's audit log.
    */
  def compactParquet(
      spark: SparkSession,
      path: String,
      targetBytes: Long = 128L << 20): (Int, Int) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a Hive-partitioned layout (dt=.../part-*.parquet) must be
    // compacted per partition directory — rewriting it flat through
    // this path would destroy the partitioning and mis-size the output
    if (ManifestTable.resolve(fs, p).isEmpty) {
      val subDirs = fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && !s.getPath.getName.startsWith(".") &&
          !s.getPath.getName.startsWith("_"))
      require(subDirs.isEmpty,
        s"compactParquet: $path has partition subdirectories " +
          s"(${subDirs.take(3).map(_.getPath.getName).mkString(", ")}…) — " +
          "compact each partition directory individually")
    }
    val manifest = ManifestTable.adoptIfPlain(fs, p, partCol = "")
    val entry = manifest.entries.find(_.part == "").getOrElse(
      throw new IllegalStateException(s"compactParquet: empty manifest at $path"))
    val livePaths = ManifestTable.entryPaths(p, entry)
    val liveFiles = livePaths.flatMap { lp =>
      val st = fs.getFileStatus(lp)
      if (st.isFile) Seq(st)
      else fs.listStatus(lp).toSeq.filter(_.isFile).filterNot { s =>
        val n = s.getPath.getName
        n.startsWith("_") || n.startsWith(".")
      }
    }
    require(liveFiles.nonEmpty, s"compactParquet: no data files under $path")
    val totalBytes = liveFiles.map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val gen = ManifestTable.GenPrefix + java.util.UUID.randomUUID().toString.take(8)
    val genPath = new Path(p, gen)
    // a COLUMN-MAPPED table compacts by field id with the current
    // logical names, and the rewritten files carry the ids again — an
    // id-less compaction generation would null-fill every mapped read
    // (round-18 ADVICE); unmapped tables keep the inferred-schema path
    val src =
      if (manifest.cols.isEmpty)
        spark.read.parquet(liveFiles.map(_.getPath.toString): _*)
      else {
        ManifestColumns.ensureReadConf(spark)
        spark.read.schema(ManifestColumns.schemaOf(manifest.cols))
          .parquet(liveFiles.map(_.getPath.toString): _*)
      }
    val out =
      if (manifest.cols.isEmpty) src.coalesce(n)
      else {
        val stamped = ManifestColumns.stamp(src.coalesce(n), manifest.cols, partCol = "")
        val ws = org.apache.spark.sql.graft.Bridge.cloneSession(spark)
        ws.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
        org.apache.spark.sql.graft.Bridge.ofRows(ws, stamped.queryExecution.analyzed)
      }
    out.write.mode("error").parquet(genPath.toString)
    fs.delete(new Path(genPath, "_SUCCESS"), false)
    ManifestTable.commit(fs, p, partCol = "",
      Map("" -> Some(ManifestEntry("", gen, Nil,
        ManifestTable.fileStats(fs, genPath,
          ManifestTable.resolve(fs, p).map(_.statsCols).getOrElse(Nil))))))
    ManifestTable.gc(fs, p)
    val after = fs.listStatus(genPath).count(_.isFile)
    (liveFiles.size, after)
  }
}
