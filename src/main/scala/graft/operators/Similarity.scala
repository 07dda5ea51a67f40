package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextPrims._

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-d).
  *
  * Two paths:
  *  - brute-force cosine top-k: broadcast the (small) query set, scan the
  *    corpus once, per-query top-k via window. At 100 TB the corpus side
  *    streams (one scan, no shuffle of the corpus) — correct baseline and
  *    exact.
  *  - LSH-bucketed ANN: deterministic random-hyperplane signatures (md5
  *    -derived planes, shared constants embedded in both the Spark plan
  *    and the oracle SQL), candidates meet on the bucket id — an
  *    equi-join, the IVF/LSH scale path.
  *
  * Cosine math is double-accumulated in array order on both engines
  * (bit-exact parity, see [[TextPrims.cosineD]]).
  */
object Similarity {

  private val NumQueries = 10
  private val TopK = 5
  private val Planes = 6 // 2^6 = 64 buckets over ~500 vectors
  private val Dim = 64
  private val AnnTopK = 3

  /** Deterministic pseudo-random hyperplanes from the shared md5 hash:
    * component (j, i) = hash64("plane:j:i") % 2001 - 1000. Computed once
    * on the driver and embedded as literals in BOTH the Spark plan and
    * the generated oracle SQL, so the two engines share the planes by
    * construction.
    */
  private[operators] lazy val hyperplanes: Array[Array[Long]] = {
    val mdPool = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(Planes, Dim) { (j, i) =>
      val hex = mdPool.digest(s"plane:$j:$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
    }
  }

  private def queriesDf(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))

  private def corpusDf(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") >= NumQueries)
      .select(col("vec_id").as("c_id"), col("embedding").as("ce"))

  /** Native fused cosine ([[graft.functions.CosineSimilarity]]): one
    * codegen'd loop per pair, bit-equal to the composed zip_with/
    * aggregate formula (FunctionsSpec proves it) and to the oracle.
    */
  private def pairCosine: org.apache.spark.sql.Column =
    graft.functions.CosineSimilarity(col("qe"), col("ce"))

  /** Exact ANN baseline: 10 broadcast queries × corpus scan, top-5 per
    * query by cosine. Plan: BroadcastNestedLoopJoin over the tiny query
    * set — corpus is scanned once and never shuffled; only k rows per
    * query survive to the window.
    */
  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val scored = corpusDf(spark, dir)
      .crossJoin(broadcast(queriesDf(spark, dir)))
      .withColumn("cos", pairCosine)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("c_id"), round(col("cos"), 6).as("cosine"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  private def oracleTopK: String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < $NumQueries),
       |c AS (SELECT vec_id AS c_id, embedding AS ce FROM embeddings WHERE vec_id >= $NumQueries),
       |s AS (SELECT q_id, c_id, ${cosineSql("qe", "ce")} AS cos FROM q, c),
       |r AS (SELECT q_id, c_id, cos,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank FROM s)
       |SELECT q_id, c_id, round(cos, 6) AS cosine, rank FROM r
       |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin

  /** Sign-bit bucket id from the shared hyperplanes, as a Column. */
  private def bucketCol(embCol: String): Column = {
    val bits = (0 until Planes).map { j =>
      val plane = hyperplanes(j).mkString("array(", "D, ", "D)")
      val dot = s"aggregate(zip_with($embCol, $plane, (x, v) -> cast(x as double) * v), 0D, (a, v) -> a + v)"
      expr(s"CASE WHEN $dot >= 0 THEN ${1L << j} ELSE 0 END")
    }
    bits.reduce(_ + _)
  }

  private def bucketSql(embCol: String): String = {
    val bits = (0 until Planes).map { j =>
      val plane = hyperplanes(j).mkString("[", ", ", "]")
      val dot = s"list_sum(list_transform(list_zip($embCol, $plane), p -> p[1]::DOUBLE * p[2]::DOUBLE))"
      s"CASE WHEN $dot >= 0 THEN ${1L << j} ELSE 0 END"
    }
    bits.mkString("(", " + ", ")")
  }

  /** LSH ANN: queries meet only corpus vectors in their hyperplane
    * bucket (equi-join on the bucket id — the shuffle is keyed, never
    * all-pairs), then exact cosine re-ranks the bucket candidates.
    * Recall < 1 by construction; the oracle replays the same buckets so
    * the result is still deterministic and exactly checkable.
    */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val q = queriesDf(spark, dir).withColumn("qb", bucketCol("qe"))
    val c = corpusDf(spark, dir).withColumn("cb", bucketCol("ce"))
    val scored = c.join(broadcast(q), col("qb") === col("cb"))
      .withColumn("cos", pairCosine)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= AnnTopK)
      .select(col("q_id"), col("c_id"), round(col("cos"), 6).as("cosine"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  private def oracleAnnLsh: String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe, ${bucketSql("embedding")} AS qb
       |           FROM embeddings WHERE vec_id < $NumQueries),
       |c AS (SELECT vec_id AS c_id, embedding AS ce, ${bucketSql("embedding")} AS cb
       |      FROM embeddings WHERE vec_id >= $NumQueries),
       |s AS (SELECT q_id, c_id, ${cosineSql("qe", "ce")} AS cos FROM q JOIN c ON qb = cb),
       |r AS (SELECT q_id, c_id, cos,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank FROM s)
       |SELECT q_id, c_id, round(cos, 6) AS cosine, rank FROM r
       |WHERE rank <= $AnnTopK ORDER BY q_id, rank""".stripMargin

  /** Centroid stats per label — the IVF coarse-quantizer build step
    * (k-means assign pass with given assignments): mean vector per label
    * via per-dimension aggregation. One shuffle on the 10-value label.
    */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perDim = Tables.load(spark, dir, "embeddings")
      .select($"label", posexplode($"embedding").as(Seq("dim", "v")))
      .groupBy($"label", $"dim")
      .agg(avg($"v".cast("double")).as("mean_v"))
    perDim.groupBy($"label")
      .agg(
        count(lit(1)).as("dims"),
        round(sum(abs($"mean_v")), 6).as("l1_norm"),
        round(sqrt(sum($"mean_v" * $"mean_v")), 6).as("l2_norm"))
      .orderBy($"label")
  }

  private def oracleCentroids: String =
    """WITH perdim AS (
      |  SELECT label, dim, avg(v::DOUBLE) AS mean_v FROM (
      |    SELECT label, unnest(embedding) AS v,
      |           unnest(generate_series(1, len(embedding))) AS dim
      |    FROM embeddings)
      |  GROUP BY label, dim)
      |SELECT label, count(*) AS dims,
      |  round(sum(abs(mean_v)), 6) AS l1_norm,
      |  round(sqrt(sum(mean_v * mean_v)), 6) AS l2_norm
      |FROM perdim GROUP BY label ORDER BY label""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_cosine_topk" -> (cosineTopK _),
    "q30_ann_lsh" -> (annLsh _),
    "q31_label_centroids" -> (labelCentroids _),
  )

  val oracles: Map[String, String] = Map(
    "q29_cosine_topk" -> oracleTopK,
    "q30_ann_lsh" -> oracleAnnLsh,
    "q31_label_centroids" -> oracleCentroids,
  )
}
