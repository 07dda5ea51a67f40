package graft.sources.v2

import graft.core.{ManifestEntry, ManifestTable}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => LegacyOffset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType

/** Manifested tables as a Structured Streaming SOURCE (round 14):
  * each micro-batch is the set of manifest entries that appeared since
  * the last processed commit — the commit log IS the changelog, so
  * incremental ingestion needs no file-listing diffs, no modification
  * times, and no reprocessing: one `resolve` names the new state, and
  * generation immutability guarantees the files behind an entry never
  * change after their commit.
  *
  * {{{
  *   spark.readStream.format("graftmanifest").load("/data/feed")
  * }}}
  *
  * Offsets are commit sequence numbers. Contract:
  *   - APPEND-ONLY tables (the connector/ManifestWrite append path,
  *     where every commit adds entries and retires none). A commit
  *     that RETIRES an entry (overwrite, upsert, compaction, erasure)
  *     fails the stream loudly — silently re-reading rewritten data
  *     would double-count and silently skipping it would drop rows;
  *     the user picks a semantics by restarting from scratch, exactly
  *     Delta's streaming-source stance without ignoreChanges.
  *   - the gc history window must cover stream lag: diffing seq A→B
  *     needs commit A's file, and `ManifestTable.gc(keepCommits)`
  *     retires old pointers. A gc'd start offset fails naming the
  *     retained versions and the knob, never guessing.
  *
  * Scale contract: getOffset is one `_commits` listing + one small
  * read; a batch reads exactly the newly committed generations'
  * bytes. State is the offset alone — Spark's checkpoint carries it.
  */
final class GraftManifestSource(
    spark: SparkSession,
    path: String,
    format: String,
    options: Map[String, String],
    override val schema: StructType,
) extends Source {

  private val rootPath = new Path(path)
  private def fs: FileSystem =
    rootPath.getFileSystem(spark.sessionState.newHadoopConf())

  private def seqOf(o: LegacyOffset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  private def manifestAt(seq: Long) =
    ManifestTable.resolveAt(fs, rootPath, seq).getOrElse(
      throw new IllegalStateException(
        s"graftmanifest stream at $path: commit $seq is no longer retained " +
          s"(retained: [${ManifestTable.versions(fs, rootPath).mkString(", ")}]) — " +
          "the stream lagged past the gc history window; gc streamed tables " +
          "with keepCommits covering the worst-case lag, or restart the stream"))

  override def getOffset: Option[LegacyOffset] =
    ManifestTable.resolve(fs, rootPath).map(m => LongOffset(m.seq))

  override def getBatch(start: Option[LegacyOffset], end: LegacyOffset): DataFrame = {
    val endM = manifestAt(seqOf(end))
    val startEntries: Map[String, ManifestEntry] = start match {
      case None => Map.empty
      case Some(s) => manifestAt(seqOf(s)).entries.map(e => e.part -> e).toMap
    }
    // append-only = every start entry survives IDENTICALLY (an
    // overwrite/upsert reuses the "" part key with a NEW dir, so a
    // name-set diff alone would miss it — compare whole entries)
    val endByPart = endM.entries.map(e => e.part -> e).toMap
    val retired = startEntries.collect {
      case (p, e) if !endByPart.get(p).contains(e) => p
    }
    if (retired.nonEmpty)
      throw new IllegalStateException(
        s"graftmanifest stream at $path: commits ${start.map(seqOf)}..${seqOf(end)} " +
          s"RETIRED or rewrote entries [${retired.toSeq.sorted.take(5).mkString(", ")}] — " +
          "this source streams APPEND-ONLY tables; an overwrite/upsert/compaction " +
          "rewrote data mid-stream, restart the stream against the new state")
    val added: Seq[ManifestEntry] = endM.entries.filterNot(e => startEntries.contains(e.part))
    val paths = added.flatMap(e => ManifestTable.entryPaths(rootPath, e)).map(_.toString)
    val batch =
      if (paths.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else spark.read.format(format).schema(schema).options(options).load(paths: _*)
    // the engine asserts isStreaming on what getBatch returns — re-tag
    // the batch rows the way FileStreamSource does
    org.apache.spark.sql.graft.Bridge.asStreamingFrame(spark, batch, schema)
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftManifestSource[$path]"
}
