package graft.multimodal

import graft.Tables
import graft.operators.TextPrims._
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decode/feature-extract/frame-sample as
  * per-partition batch operators.
  *
  * The decode step is STUBBED (no image/audio codecs in this
  * environment): [[StubDecoder]] derives deterministic pseudo-features
  * from the bytes. Everything AROUND the stub is real and tested — the
  * media schema, the `mapPartitions` batch shape (one decoder instance
  * per partition, streamed iterator, no per-row setup), the row
  * expansion for frame sampling, and the partitioning story (decode is
  * map-only; feature tables shuffle only on later joins/aggs).
  */
object Multimodal {

  /** A decoded media feature row. */
  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long,
      content_md5: String, width: Long, height: Long, n_frames: Long)

  /** Decoder contract: bytes → features. A real implementation wraps an
    * image/audio library; constructed once per partition (codec contexts
    * are expensive), called per row.
    */
  trait Decoder extends Serializable {
    def decode(docId: Long, mediaType: String, content: Array[Byte]): MediaFeatures
  }

  /** Deterministic stand-in for the codec: features are arithmetic on
    * the payload so the DuckDB oracle can replay them. A real decoder
    * would parse the container header instead — same signature, same
    * plan shape.
    */
  object StubDecoder extends Decoder {
    def decode(docId: Long, mediaType: String, content: Array[Byte]): MediaFeatures = {
      val n = content.length.toLong
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(content).map(b => f"$b%02x").mkString
      MediaFeatures(docId, mediaType, n, hex,
        width = 64 + n % 576,
        height = 64 + (n * 7) % 416,
        n_frames = if (mediaType == "video") 1 + n % 16 else 1)
    }
  }

  /** The media table: documents' text bytes standing in for media
    * payloads, media_type assigned deterministically. In production this
    * is `spark.read.format("binaryFile")` or a parquet table with a
    * binary column — identical schema from here on.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(
        $"doc_id",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          ($"doc_id" % 3 + 1).cast("int")).as("media_type"),
        $"text".cast("binary").as("content"))
  }

  /** Feature extraction: one decoder per partition, streamed batch —
    * the `mapInPandas`-equivalent batch shape in Scala. Map-only plan:
    * no shuffle, parallelism = input file splits.
    */
  def extractFeatures(spark: SparkSession, dir: String, decoder: Decoder = StubDecoder): DataFrame = {
    val enc = Encoders.product[MediaFeatures]
    mediaTable(spark, dir)
      .mapPartitions { rows: Iterator[Row] =>
        // decoder init happens here, once per partition
        val d = decoder
        rows.map { r =>
          d.decode(r.getAs[Long]("doc_id"), r.getAs[String]("media_type"),
            r.getAs[Array[Byte]]("content"))
        }
      }(enc)
      .orderBy(col("doc_id"))
      .toDF()
  }

  /** Frame sampling: video rows expand to one row per sampled frame
    * (every 4th pseudo-frame), non-video rows pass through with frame 0.
    * Row expansion via explode — distributed, no driver loop; frame
    * payload hash stands in for the decoded frame.
    */
  def sampleFrames(spark: SparkSession, dir: String, decoder: Decoder = StubDecoder): DataFrame = {
    val feats = extractFeatures(spark, dir, decoder)
    feats
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("n_frames") - 1, lit(4L))))
      .select(
        col("doc_id"), col("media_type"), col("frame_idx"),
        hash64(concat_ws(":", col("content_md5"), col("frame_idx"))).as("frame_hash"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  private def oracleFeatures: String =
    """SELECT doc_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  octet_length(text::BLOB)::BIGINT AS n_bytes,
      |  md5(text) AS content_md5,
      |  64 + octet_length(text::BLOB) % 576 AS width,
      |  64 + (octet_length(text::BLOB) * 7) % 416 AS height,
      |  CASE WHEN doc_id % 3 = 2 THEN 1 + octet_length(text::BLOB) % 16 ELSE 1 END AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  private def oracleFrames: String =
    s"""WITH f AS (
       |  SELECT doc_id,
       |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       |    md5(text) AS content_md5,
       |    CASE WHEN doc_id % 3 = 2 THEN 1 + octet_length(text::BLOB) % 16 ELSE 1 END AS n_frames
       |  FROM documents),
       |fr AS (
       |  SELECT doc_id, media_type, content_md5,
       |    unnest(generate_series(0, n_frames - 1, 4))::BIGINT AS frame_idx
       |  FROM f)
       |SELECT doc_id, media_type, frame_idx,
       |  ${hash64Sql("content_md5 || ':' || frame_idx")} AS frame_hash
       |FROM fr ORDER BY doc_id, frame_idx""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_multimodal_features" -> ((s: SparkSession, d: String) => extractFeatures(s, d)),
    "q46_frame_sample" -> ((s: SparkSession, d: String) => sampleFrames(s, d)),
  )

  val oracles: Map[String, String] = Map(
    "q45_multimodal_features" -> oracleFeatures,
    "q46_frame_sample" -> oracleFrames,
  )
}
