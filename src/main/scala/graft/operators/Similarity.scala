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
      // codegen'd DotProduct, not the boxed HOF form — same cast/
      // multiply/accumulate order (see the expression's scaladoc)
      val dot = graft.functions.DotProduct(col(embCol), expr(plane))
      when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
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

  private val IvfTopK = 3

  /** IVF-style ANN: coarse quantizer = per-label mean vectors (the
    * "train" pass a real IVF runs k-means for); each query probes ONLY
    * its nearest centroid's posting list, then exact cosine re-ranks
    * inside it. Corpus scan cost per query drops from n to n/k — the
    * complement of the hyperplane-LSH path in [[annLsh]].
    *
    * Determinism across engines: centroid assignment is an argmax whose
    * best-vs-second gaps (≥0.002 on this corpus) dwarf the ~1e-15
    * cross-engine float-summation jitter in the per-dim averages; the
    * final cosines are over raw vectors (bit-exact parity).
    */
  /** The IVF coarse-quantizer centroids as a durable artifact — the
    * "train" output a real IVF stores next to its posting lists
    * (round 19: q62 and q105 each re-ran the posexplode + two
    * aggregations per call; the model is built once at ingest).
    * Identical values: the pin materializes the exact plan it
    * replaces.
    */
  private[operators] def ivfCentroidsPin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.core.Pin.shared(spark, s"ivf-cents-${graft.core.Pin.tag(dir)}")(
      Tables.load(spark, dir, "embeddings")
        .select($"label", posexplode($"embedding").as(Seq("dim", "v")))
        .groupBy($"label", $"dim").agg(avg($"v".cast("double")).as("m"))
        .groupBy($"label")
        .agg(array_sort(collect_list(struct($"dim", $"m"))).as("dm"))
        .select($"label".as("c_label"), expr("transform(dm, x -> x.m)").as("cvec")))
  }

  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val centroids = ivfCentroidsPin(spark, dir)
    val q = queriesDf(spark, dir)
    // nearest centroid per query (centroids are tiny → broadcast)
    val qcRanked = q.crossJoin(broadcast(centroids))
      .withColumn("ccos", expr(
        "aggregate(zip_with(qe, cvec, (x, v) -> cast(x as double) * v), 0D, (a, v) -> a + v)") /
        (normD("qe") * expr("sqrt(aggregate(cvec, 0D, (a, v) -> a + v * v))")))
    val wc = Window.partitionBy(col("q_id")).orderBy(col("ccos").desc, col("c_label"))
    val assigned = qcRanked.withColumn("crn", row_number().over(wc))
      .filter(col("crn") === 1)
      .select(col("q_id"), col("qe"), col("c_label"))
    // probe only the assigned label's vectors
    val corpus = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") >= NumQueries)
      .select(col("vec_id").as("c_id"), col("label"), col("embedding").as("ce"))
    val scored = corpus.join(broadcast(assigned), col("label") === col("c_label"))
      .withColumn("cos", graft.functions.CosineSimilarity(col("qe"), col("ce")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= IvfTopK)
      .select(col("q_id"), col("label"), col("c_id"), round(col("cos"), 6).as("cosine"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  private def oracleAnnIvf: String =
    s"""WITH perdim AS (
       |  SELECT label, dim, avg(v::DOUBLE) AS m FROM (
       |    SELECT label, unnest(embedding) AS v,
       |           unnest(generate_series(1, len(embedding))) AS dim
       |    FROM embeddings) GROUP BY label, dim),
       |cent AS (SELECT label AS c_label, list(m ORDER BY dim) AS cvec FROM perdim GROUP BY label),
       |q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < $NumQueries),
       |qc AS (
       |  SELECT q_id, qe, c_label,
       |    (list_sum(list_transform(list_zip(qe, cvec), p -> p[1]::DOUBLE * p[2])) /
       |     (sqrt(list_sum(list_transform(qe, x -> x::DOUBLE * x::DOUBLE))) *
       |      sqrt(list_sum(list_transform(cvec, x -> x * x))))) AS ccos
       |  FROM q, cent),
       |assigned AS (
       |  SELECT q_id, qe, c_label FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY ccos DESC, c_label) AS crn
       |    FROM qc) WHERE crn = 1),
       |scored AS (
       |  SELECT a.q_id, c.label, c.vec_id AS c_id, ${cosineSql("a.qe", "c.embedding")} AS cos
       |  FROM assigned a JOIN embeddings c
       |    ON c.label = a.c_label AND c.vec_id >= $NumQueries),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
       |       FROM scored)
       |SELECT q_id, label, c_id, round(cos, 6) AS cosine, rank FROM rk
       |WHERE rank <= $IvfTopK ORDER BY q_id, rank""".stripMargin

  // ----------------------------------------------------------- q77 bm25

  private val Bm25K1 = 1.2
  private val Bm25B = 0.75
  private val Bm25Query = Seq("table", "join", "query")

  /** BM25 retrieval scoring of the whole corpus against a fixed query
    * term set — the lexical leg of a hybrid (BM25 + dense-vector)
    * retrieval stack. Shapes: doc lengths are a map-only projection;
    * term frequencies come from an explode filtered to the query terms
    * BEFORE the aggregation (so the shuffle carries only query-term
    * hits, not the whole token stream); corpus stats (N, avgdl) are a
    * broadcast 1-row cross join; document frequencies per term are a
    * tiny broadcast join. Nothing scales with corpus² — at 100 TB this
    * is one filtered scan plus keyed aggs.
    */
  def bm25Score(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val dl = docs.select($"doc_id", size(words($"text")).cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n"), avg($"dl").as("avgdl"))
    val tf = docs.select($"doc_id", explode(words($"text")).as("w"))
      .filter($"w".isin(Bm25Query: _*))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy($"w").agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(df), "w").join(dl, "doc_id").crossJoin(broadcast(stats))
      .withColumn("idf", log(($"n" - $"df" + 0.5) / ($"df" + 0.5) + 1.0))
      .withColumn("s",
        $"idf" * $"tf" * (lit(Bm25K1) + 1.0) /
          ($"tf" + lit(Bm25K1) * (lit(1.0) - lit(Bm25B) + lit(Bm25B) * $"dl" / $"avgdl")))
      .groupBy($"doc_id").agg(round(sum($"s"), 6).as("bm25"))
      .orderBy($"doc_id")
  }

  private def oracleBm25: String = {
    val terms = Bm25Query.map(t => s"'$t'").mkString(", ")
    s"""WITH dl AS (
       |  SELECT doc_id, len(string_split(text, ' '))::DOUBLE AS dl FROM documents),
       |stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
       |toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |tf AS (
       |  SELECT doc_id, w, count(*)::DOUBLE AS tf FROM toks
       |  WHERE w IN ($terms) GROUP BY 1, 2),
       |df AS (SELECT w, count(*)::DOUBLE AS df FROM tf GROUP BY w),
       |scored AS (
       |  SELECT tf.doc_id,
       |    ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
       |      * tf.tf * ($Bm25K1 + 1.0)
       |      / (tf.tf + $Bm25K1 * (1.0 - $Bm25B + $Bm25B * dl.dl / s.avgdl)) AS sc
       |  FROM tf JOIN df ON df.w = tf.w JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN stats s)
       |SELECT doc_id, round(sum(sc), 6) AS bm25 FROM scored
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q77_bm25_score" -> (bm25Score _),
    "q62_ann_ivf" -> (annIvf _),
    "q29_cosine_topk" -> (cosineTopK _),
    "q30_ann_lsh" -> (annLsh _),
    "q31_label_centroids" -> (labelCentroids _),
  )

  val oracles: Map[String, String] = Map(
    "q77_bm25_score" -> oracleBm25,
    "q62_ann_ivf" -> oracleAnnIvf,
    "q29_cosine_topk" -> oracleTopK,
    "q30_ann_lsh" -> oracleAnnLsh,
    "q31_label_centroids" -> oracleCentroids,
  )
}
