package graft.sources.v2

import graft.core.{ManifestFileIndex, ManifestWrite}
import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** `spark.read.format("graftmanifest")` — manifested tables as a
  * first-class source, for users who address tables by path/SQL rather
  * than through [[graft.core.ManifestTable]] directly:
  *
  * {{{
  *   spark.read.format("graftmanifest")
  *     .option("partCol", "day")              // "" / absent = unpartitioned
  *     .option("parts", "2024-01-01,2024-01-02")  // optional resolve-time pruning
  *     .option("versionAsOf", "7")            // optional time travel (retained window)
  *     .load("/data/events-layout")
  *
  *   // SQL access:
  *   CREATE TEMPORARY VIEW events_live
  *   USING graftmanifest OPTIONS (path '/data/events-layout', partCol 'day')
  * }}}
  *
  * Architecture note: this is deliberately a [[RelationProvider]]
  * returning a `HadoopFsRelation` over [[ManifestFileIndex]] — the
  * discipline Delta's own `DeltaDataSource` uses — rather than a
  * from-scratch DSv2 `Table`: plugging the live file set into the
  * native file-source seam buys the whole parquet scan stack
  * (vectorized reader, whole-stage codegen, `PruneFileSourcePartitions`
  * partition pruning, pushed data filters, accurate stats for
  * broadcast planning) instead of re-implementing it behind a
  * `PartitionReaderFactory`. The plan shows ONE `FileScan` node
  * regardless of how many generations the manifest carries.
  *
  * `format` option (parquet default, csv/json accepted) selects the
  * data-file format for tables written by [[graft.core.FileConnector]];
  * remaining options pass through to the file format.
  */
class GraftManifestDataSource extends RelationProvider
    with CreatableRelationProvider with StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {

  /** `df.writeStream.format("graftmanifest")` — one generation + one
    * pointer commit per micro-batch, exactly-once via the batch id in
    * the generation name ([[GraftManifestSink]]). Append and Complete
    * output modes; partitioned sinks are refused (a partition maps to
    * one manifest entry — partitioned maintenance is batch territory).
    */
  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    val (path, format, passThrough) = streamParams(parameters)
    require(partitionColumns.isEmpty,
      "graftmanifest sink: partitionBy is not supported — a partition maps to one " +
        "manifest entry; write unpartitioned and maintain partitions in batch")
    require(outputMode == OutputMode.Append() || outputMode == OutputMode.Complete(),
      s"graftmanifest sink: unsupported output mode $outputMode (Append|Complete)")
    new GraftManifestSink(sqlContext.sparkSession, path, format, passThrough,
      complete = outputMode == OutputMode.Complete())
  }

  private def streamParams(parameters: Map[String, String]): (String, String, Map[String, String]) = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graftmanifest: missing path"))
    require(parameters.getOrElse("partCol", "").isEmpty,
      "graftmanifest streaming reads APPEND-ONLY tables; partitioned manifest " +
        "tables are maintained by partition REWRITE and cannot stream — " +
        "read them in batch")
    (path, parameters.getOrElse("format", "parquet"),
      parameters -- Seq("path", "partCol", "parts", "format", "versionAsOf",
        "mergeSchema", "mergeSchemaAllowMissing", "readChangeFeed"))
  }

  /** `spark.readStream.format("graftmanifest").load(path)` — each
    * micro-batch is the entries newly committed since the last offset
    * ([[GraftManifestSource]]; append-only contract, offsets = commit
    * seqs).
    */
  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val (path, format, passThrough) = streamParams(parameters)
    // mergeSchema here widens the STARTING schema to the union of the
    // live generations; the stream then reads every batch with that
    // fixed schema (absent columns null by-name), the standard
    // streaming stance — columns added after start need a restart
    val mergeSchema = parameters.get("mergeSchema").exists(_.trim.toBoolean)
    val allowMissing = parameters.get("mergeSchemaAllowMissing").exists(_.trim.toBoolean)
    val inferred = schema.getOrElse(
      ManifestFileIndex.relation(sqlContext.sparkSession, path, "", None,
        format, passThrough, mergeSchema = mergeSchema,
        mergeSchemaAllowMissing = allowMissing).schema)
    // change-feed mode (round 16): the stream's rows are change rows —
    // data columns + Delta-vocabulary _change_type + _commit_version
    val cdf = parameters.get("readChangeFeed").exists(_.trim.toBoolean)
    val resolved = if (!cdf) inferred else StructType(
      graft.core.ManifestChanges.withChangeType(inferred).fields :+
        org.apache.spark.sql.types.StructField(
          graft.core.ManifestChanges.CommitVersionCol,
          org.apache.spark.sql.types.LongType, nullable = true))
    (shortName(), resolved)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val (path, format, passThrough) = streamParams(parameters)
    // column-mapped tables stream with their logical (field-id) schema
    graft.core.ManifestColumns.ensureReadConf(sqlContext.sparkSession)
    val resolved = sourceSchema(sqlContext, schema, providerName, parameters)._2
    new GraftManifestSource(sqlContext.sparkSession, path, format, passThrough, resolved,
      cdf = parameters.get("readChangeFeed").exists(_.trim.toBoolean))
  }

  override def shortName(): String = "graftmanifest"

  /** `df.write.format("graftmanifest").mode(…).save(path)` — every mode
    * lands as an immutable generation + one pointer commit
    * ([[ManifestWrite]]): overwrite flips complete states with an
    * optimistic retire set, append (unpartitioned) is a pure additive
    * entry, and a crash at any step leaves the previous state live.
    */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graftmanifest: missing path"))
    val partCol = parameters.getOrElse("partCol", "")
    val format = parameters.getOrElse("format", "parquet")
    val passThrough = parameters -- Seq("path", "partCol", "parts", "format", "mergeSchema")
    ManifestWrite.write(data, path, partCol, mode, format, passThrough)
    // SaveIntoDataSourceCommand discards the returned relation — a
    // schema-only stub avoids re-probing footers after every write
    // (and avoids tripping the read path's drift guard when THIS
    // append is the legitimate schema evolution a future
    // mergeSchema=true read will merge)
    val sqlCtx = sqlContext
    new BaseRelation {
      override def sqlContext: SQLContext = sqlCtx
      override def schema: StructType = data.schema
    }
  }

  override def createRelation(
      sqlContext: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graftmanifest: missing path"))
    // `history=true` (round 15): the retained commit log as a tiny
    // DataFrame (version / is_current / sizes / row counts, newest
    // first) — the DESCRIBE-HISTORY surface; versionAsOf accepts any
    // listed version
    if (parameters.get("history").exists(_.trim.toBoolean)) {
      val df = graft.core.ManifestTable.history(sqlContext.sparkSession, path)
      val sqlCtx = sqlContext
      return new BaseRelation with org.apache.spark.sql.sources.TableScan {
        override def sqlContext: SQLContext = sqlCtx
        override def schema: StructType = df.schema
        override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
          df.rdd
      }
    }
    // `readChangeFeed=true` (round 16): the table's row-level change
    // feed over [startingVersion, endingVersion] (defaults: the whole
    // retained window) — data columns + _change_type + _commit_version,
    // the Delta table_changes surface ([[graft.core.ManifestChanges]])
    if (parameters.get("readChangeFeed").exists(_.trim.toBoolean)) {
      val spark = sqlContext.sparkSession
      val rootPath = new org.apache.hadoop.fs.Path(path)
      val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
      val fmt = parameters.getOrElse("format", "parquet")
      val pass = parameters -- Seq("path", "partCol", "parts", "format",
        "readChangeFeed", "startingVersion", "endingVersion")
      // default start = the OLDEST RETAINED valid version, not 1: on
      // any table whose first commit has been gc'd (the steady state)
      // a plain option-only read should serve the retained window, not
      // throw the retention error (round-16 ADVICE). An EXPLICIT
      // startingVersion past retention still fails loudly.
      val start = parameters.get("startingVersion").map(_.trim.toLong).getOrElse(
        graft.core.ManifestTable.versions(fs, rootPath).minOption.getOrElse(1L))
      val end = parameters.get("endingVersion").map(_.trim.toLong).getOrElse(
        graft.core.ManifestTable.resolve(fs, rootPath).map(_.seq).getOrElse(
          throw new IllegalArgumentException(
            s"graftmanifest readChangeFeed: no manifested table at $path")))
      val df = graft.core.ManifestChanges.between(spark, path, start, end, fmt, pass)
      val sqlCtx = sqlContext
      return new BaseRelation with org.apache.spark.sql.sources.TableScan {
        override def sqlContext: SQLContext = sqlCtx
        override def schema: StructType = df.schema
        override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
          df.rdd
      }
    }
    val partCol = parameters.getOrElse("partCol", "")
    val parts = parameters.get("parts")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val format = parameters.getOrElse("format", "parquet")
    // time travel within the gc-retained history window (round 14):
    // versionAsOf names a commit seq; retained versions are
    // ManifestTable.versions — the error lists them on a miss.
    // timestampAsOf (round 16): epoch millis or an ISO-8601 instant,
    // resolved to the newest retained commit at-or-before it by store
    // mtime (the Delta discipline and its documented approximation)
    val tsAsOf = parameters.get("timestampAsOf").map { raw =>
      val t = raw.trim
      val millis = t.toLongOption.getOrElse(
        try java.time.Instant.parse(t).toEpochMilli
        catch { case _: java.time.format.DateTimeParseException =>
          throw new IllegalArgumentException(
            s"graftmanifest timestampAsOf: '$t' is neither epoch millis nor an " +
              "ISO-8601 instant (e.g. 2026-08-16T12:00:00Z)")
        })
      val rootPath = new org.apache.hadoop.fs.Path(path)
      val fs = rootPath.getFileSystem(
        sqlContext.sparkSession.sessionState.newHadoopConf())
      graft.core.ManifestTable.versionAt(fs, rootPath, millis).getOrElse(
        throw new IllegalArgumentException(
          s"graftmanifest timestampAsOf: no retained commit at or before $t " +
            s"(retained versions: ${graft.core.ManifestTable.versions(fs, rootPath)
              .mkString(", ")}) — the instant precedes the gc-retained history"))
    }
    val asOf = parameters.get("versionAsOf").map(_.trim.toLong).orElse(tsAsOf)
    require(parameters.get("versionAsOf").isEmpty || tsAsOf.isEmpty,
      "graftmanifest: versionAsOf and timestampAsOf are mutually exclusive")
    // additive cross-generation evolution, opt-in (round 15) — same
    // option name users know from spark.sql.parquet.mergeSchema
    val mergeSchema = parameters.get("mergeSchema").exists(_.trim.toBoolean)
    // explicit opt-out of the rename/drop chain contract (round 16):
    // read the union with missing columns as null
    val allowMissing = parameters.get("mergeSchemaAllowMissing").exists(_.trim.toBoolean)
    val passThrough = parameters --
      Seq("path", "partCol", "parts", "format", "versionAsOf", "timestampAsOf",
        "mergeSchema", "mergeSchemaAllowMissing")
    val df = ManifestFileIndex.relation(
      sqlContext.sparkSession, path, partCol, parts, format, passThrough, asOf,
      mergeSchema, allowMissing)
    // unwrap the relation the builder just planned — DataSource v1 will
    // re-wrap it in a fresh LogicalRelation with its own attribute ids
    df.queryExecution.analyzed.collectFirst {
      case LogicalRelation(rel, _, _, _, _) => rel
    }.getOrElse(throw new IllegalStateException(
      "graftmanifest: relation builder produced an unexpected plan shape"))
  }
}
