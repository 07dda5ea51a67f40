package graft.sources

import graft.core.{Connector, SchemaInfer, WriteMode}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets

/** Emulated document/KV stores. No ES/Mongo server exists in this
  * environment (SURVEY §7.4 risk 5), so these reproduce the reference's
  * connector SEMANTICS — `_id` synthesis, keyed bulk upsert, mapping
  * emission, rename-and-append collections — over parquet directories
  * with the same option surface, swappable for the real
  * `elasticsearch-spark` / `mongo-spark` connectors on a live cluster.
  */

/** Elasticsearch-style connector (S6-S9):
  *  - `_id` synthesis on write: joined pk values (`-`-separated), else an
  *    existing `_id` column, else md5 of the whole row (the reference
  *    concatenates truncated values — same role: deterministic content id);
  *  - bulk write = upsert by `_id` (new wins), the ES index semantics;
  *  - `create_index` analog emits the mapping JSON sidecar from the
  *    schema ([[SchemaInfer.toEsMapping]]).
  */
final case class EsConnector(
    name: String,
    root: String,
    pks: Map[String, Seq[String]] = Map.empty,
) extends Connector {
  private def pathFor(index: String): String = s"$root/$index"

  def read(spark: SparkSession, index: String): DataFrame =
    spark.read.parquet(pathFor(index))

  /** ES query-DSL analog: the caller's filter/projection — pushdown is
    * Catalyst's job; this mirrors `get_data((index, query))`.
    */
  def search(spark: SparkSession, index: String, query: DataFrame => DataFrame): DataFrame =
    query(read(spark, index))

  def write(df: DataFrame, index: String, mode: WriteMode): Unit = {
    val keyed = withId(df, pks.getOrElse(index, Nil))
    val target = pathFor(index)
    val fs = new Path(target).getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new Path(target))
    mode match {
      case WriteMode.Overwrite => // drop & recreate, even over an existing index
        keyed.write.mode(SaveMode.Overwrite).parquet(target)
      case _ if !exists =>
        keyed.write.mode(SaveMode.Overwrite).parquet(target)
      case _ => // bulk index = upsert by _id, new doc wins
        val existing = read(df.sparkSession, index)
        val survivors = existing.join(keyed.select("_id"), Seq("_id"), "left_anti")
        val out = keyed.unionByName(survivors, allowMissingColumns = true)
        // Single write to a same-FS sibling, then swap (the plan reads
        // the target, so in-place overwrite would clobber its own input).
        val staging = new Path(target + ".stage-" + java.util.UUID.randomUUID().toString.take(8))
        out.write.mode(SaveMode.Overwrite).parquet(staging.toString)
        fs.delete(new Path(target), true)
        fs.rename(staging, new Path(target))
        ()
    }
    writeMapping(df, index)
  }

  private def withId(df: DataFrame, keys: Seq[String]): DataFrame =
    if (keys.nonEmpty)
      df.withColumn("_id", concat_ws("-", keys.map(k => col(k).cast("string")): _*))
    else if (df.columns.contains("_id")) df
    else df.withColumn("_id", md5(concat_ws("", df.columns.map(c => col(c).cast("string")): _*)))

  /** Mapping sidecar — the `create_index` DDL analog. */
  private def writeMapping(df: DataFrame, index: String): Unit = {
    val mapping = SchemaInfer.toEsMapping(df.schema)
    val out = new Path(pathFor(index), "_mapping.json")
    val fs = out.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val os = fs.create(out, true)
    try os.write(mapping.getBytes(StandardCharsets.UTF_8)) finally os.close()
  }

  def readMapping(spark: SparkSession, index: String): String = {
    val p = new Path(pathFor(index), "_mapping.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  def listIndexes(spark: SparkSession): Seq[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName).sorted
  }
}

/** MongoDB-style connector (S18): collections of schemaless docs.
  * Reference semantics: scan drops the store's `_id`; "create" renames
  * any existing collection to a timestamped `_bak` and starts fresh
  * (dedup impossible in the reference's Mongo path — rename-and-append);
  * plain saves append.
  */
final case class MongoConnector(name: String, root: String) extends Connector {
  private def pathFor(index: String): String = s"$root/$index"

  def read(spark: SparkSession, index: String): DataFrame = {
    val df = spark.read.parquet(pathFor(index))
    if (df.columns.contains("_id")) df.drop("_id") else df
  }

  def write(df: DataFrame, index: String, mode: WriteMode): Unit = {
    val spark = df.sparkSession
    val target = new Path(pathFor(index))
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    mode match {
      case WriteMode.Overwrite =>
        // rename-and-append semantics: back up the live collection
        if (fs.exists(target)) {
          val bak = new Path(s"${pathFor(index)}_bak_${System.currentTimeMillis()}")
          fs.rename(target, bak)
        }
        df.write.mode(SaveMode.Overwrite).parquet(target.toString)
      case _ =>
        df.write.mode(SaveMode.Append).parquet(target.toString)
    }
  }

  def listIndexes(spark: SparkSession): Seq[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).filterNot(_.contains("_bak_")).sorted
  }
}
