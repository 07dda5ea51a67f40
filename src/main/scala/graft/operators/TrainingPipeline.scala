package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import TextPrims._

/** End-to-end training-corpus builder — the integration of the operator
  * catalog into the job a user actually runs: raw documents → quality/
  * repetition filter → PII redaction → exact dedup (canonical per
  * content hash) → near-dedup (df-capped Jaccard pairs → connected
  * components, canonical per cluster) → stratified sampling → split
  * assignment → per-split token packing. Every stage is one of the
  * oracle-gated operators (q71/q72/q19/q61/q70/q74/q68/q73); this
  * object only composes them, so its scale story is the sum of its
  * parts — no new shuffles beyond the stages themselves, and the
  * pipeline is hash-deterministic end to end (no rand() anywhere: two
  * runs give byte-identical corpora, the property a resumable 100 TB
  * build needs).
  */
object TrainingPipeline {

  private val MinWords = 5
  private val MaxTopWordFrac = 0.5
  private val StratRates = Seq("en" -> 0.5, "de" -> 0.8, "fr" -> 0.8, "es" -> 0.8, "zh" -> 0.9)
  private val StratDefault = 0.5
  private val PackBudget = 2048L

  /** The final corpus: (doc_id, lang, split, pack_id, tokens, text). */
  def buildCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")

    // 1. quality/repetition filter + PII redaction (map-only; the same
    //    columns the streaming ingest path runs)
    val cleaned = graft.streaming.StreamingJobs
      .cleanDocumentStream(docs, MinWords, MaxTopWordFrac)

    // 2. exact dedup: canonical = min doc_id per content fingerprint
    val canonical = cleaned
      .withColumn("fp", md5($"text"))
      .withColumn("canonical_id",
        min($"doc_id").over(org.apache.spark.sql.expressions.Window.partitionBy($"fp")))
      .filter($"doc_id" === $"canonical_id")
      .drop("fp", "canonical_id")

    // 3. near-dedup: candidate pairs → clusters → keep, per cluster,
    //    the smallest doc_id that SURVIVED steps 1-2 — not the raw
    //    cluster label: the raw min may have been filtered out earlier,
    //    and "keep comp == doc_id" would then drop the whole cluster's
    //    content from the corpus. Pairs come from the SHARED df-capped
    //    Jaccard cache (the q61/q70/q109/q111 plan): in a session that
    //    already ran any of those, this stage is a cache read — and the
    //    df-cap is the documented production scale shape (vs the
    //    round-4 LSH pipeline here, which re-derived signatures+bands
    //    for ~2s of redundant work per funnel run).
    //    The pair list is pinned durably BEFORE connectedComponents: its
    //    edges union (src→dst + dst→src) would otherwise evaluate the
    //    whole pair pipeline twice — and a localCheckpoint here would
    //    die with an executor on a real cluster (Pin.shared scaladoc).
    val pairs = TextDedup.pairListPin(spark, dir)
    val clusters = TextDedup.connectedComponents(pairs,
      loopName = s"cc-pairs-${graft.core.Pin.tag(dir)}")
    val nearDeduped = canonical
      .join(clusters, canonical("doc_id") === clusters("id"), "left")
      .withColumn("cluster", coalesce($"comp", $"doc_id"))
      .withColumn("min_surviving",
        min($"doc_id").over(org.apache.spark.sql.expressions.Window.partitionBy($"cluster")))
      .filter($"doc_id" === $"min_surviving")
      .drop("id", "comp", "cluster", "min_surviving")

    // 4. stratified sampling (map-only hash threshold per lang)
    val rate = StratRates.foldLeft(lit(StratDefault)) {
      case (acc, (l, r)) => when($"lang" === l, lit(r)).otherwise(acc)
    }
    val bucket = pmod(hash64(concat(lit("tp:"), $"doc_id".cast("string"))), lit(10000))
    val sampled = nearDeduped.filter(bucket < rate * 10000)

    // 5. split assignment — the ONE shared 80/10/10 rule (q68/q124)
    val split = sampled.withColumn("split", PipelineOps.splitCol)

    // 6. per-split token packing (strata never share a pack)
    val withTokens = split.withColumn("tokens", size(words($"text")).cast("long"))
    PipelineOps.packTokensBy(withTokens, Seq("split"), PackBudget,
        pin = s"pack-corpus-${graft.core.Pin.tag(dir)}")
      .select($"doc_id", $"lang", $"split", $"pack_id", $"tokens", $"text")
      .orderBy($"doc_id")
  }

  /** Stage-by-stage funnel audit: how many documents survive each
    * stage. Rows-only by design (the stages themselves are the
    * oracle-gated operators).
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    // cache()d: the stage-1 count materializes it, and buildCorpus's
    // internal cleaned sub-plan is the IDENTICAL analyzed plan, so
    // Spark's cache-manager plan-dedup serves it from this entry
    // instead of re-running the quality-filter scan
    val cleaned = graft.streaming.StreamingJobs
      .cleanDocumentStream(docs, MinWords, MaxTopWordFrac).cache()
    // Overlap independent jobs (optimization round 18, guide §2.6):
    // buildCorpus does driver-side eager work at CONSTRUCTION time
    // (union-find over the pinned pair list, the pack-offset collect —
    // measured ~1.2 s of the funnel's ~3 s), and the raw count touches
    // nothing the other stages write, so both run on a side thread
    // while this thread counts the cleaned stage. The counts are pure
    // reads — overlap changes wall time, never a value. Stage 2/3 stay
    // sequential: the corpus count fills the cache stage 3 reads.
    implicit val ec: scala.concurrent.ExecutionContext = overlapPool
    val corpusFut = scala.concurrent.Future { buildCorpus(spark, dir) }
    val rawFut = scala.concurrent.Future { docs.count() }
    val n1 = cleaned.count()
    val corpus = scala.concurrent.Await
      .result(corpusFut, scala.concurrent.duration.Duration.Inf).cache()
    val n2 = corpus.count()
    val n3 = corpus.select($"split", $"pack_id").distinct().count()
    val n0 = scala.concurrent.Await
      .result(rawFut, scala.concurrent.duration.Duration.Inf)
    val out = Seq(
      ("0_raw", n0),
      ("1_cleaned", n1),
      ("2_corpus", n2),
      ("3_packs", n3),
    ).toDF("stage", "n_docs").orderBy($"stage")
    corpus.unpersist()
    cleaned.unpersist()
    out
  }

  /** Shared 2-thread job-overlap pool (round-18 ADVICE: the funnel
    * created and tore down a fresh pool per invocation). Daemon threads
    * — the pool must never hold the JVM open; it only ever submits
    * Spark actions whose results the caller awaits.
    */
  private lazy val overlapPool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(2,
        (r: Runnable) => {
          val t = new Thread(r, "graft-funnel-overlap")
          t.setDaemon(true)
          t
        }))

  /** q83 oracle: the whole pipeline replayed in DuckDB by composing the
    * stage oracles as CTEs (the q105 pattern) — cleaning = the q71
    * filter + q72 redaction, exact dedup on the redacted text, near-dup
    * clusters = the q61 df-capped Jaccard pairs fed into the q70
    * recursive component walk, then the q74 hash sampler, q68 split
    * buckets and the q73 exclusive-cumsum packing, all over the shared
    * md5 hash family so every stage is value-exact across engines.
    */
  private def oracleFunnel: String = {
    val w = "string_split(text, ' ')"
    val topCnt = s"list_max(list_transform(list_distinct($w), x -> len(list_filter($w, y -> y = x))))"
    val redacted = s"regexp_replace(regexp_replace(regexp_replace(text, " +
      s"'${PipelineOps.EmailRe}', '[EMAIL]', 'g'), '${PipelineOps.IpRe}', '[IP]', 'g'), " +
      s"'${PipelineOps.PhoneRe}', '[PHONE]', 'g')"
    val rate = StratRates.reverse.foldLeft(StratDefault.toString) {
      case (acc, (l, r)) => s"CASE WHEN lang = '$l' THEN $r ELSE $acc END"
    }
    val sampBucket = s"${hash64Sql("'tp:' || CAST(doc_id AS VARCHAR)")} % 10000"
    val rtoks = "len(string_split(rtext, ' '))"
    s"""WITH RECURSIVE ${TextDedup.cappedDupSql},
       |edges AS (
       |  SELECT a_id AS src, b_id AS dst FROM dup
       |  UNION ALL SELECT b_id, a_id FROM dup),
       |walk(id, comp) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT e.dst, w2.comp FROM walk w2 JOIN edges e ON e.src = w2.id),
       |lab AS (SELECT id, min(comp) AS comp FROM walk GROUP BY id),
       |cleaned AS (
       |  SELECT doc_id, lang, $redacted AS rtext
       |  FROM documents
       |  WHERE len($w) >= $MinWords
       |    AND $topCnt::DOUBLE / len($w) <= $MaxTopWordFrac),
       |canon AS (
       |  SELECT doc_id, lang, rtext FROM (
       |    SELECT doc_id, lang, rtext,
       |      min(doc_id) OVER (PARTITION BY md5(rtext)) AS cid
       |    FROM cleaned) WHERE doc_id = cid),
       |nd AS (
       |  SELECT c.doc_id, c.lang, c.rtext,
       |    coalesce(l.comp, c.doc_id) AS cluster
       |  FROM canon c LEFT JOIN lab l ON l.id = c.doc_id),
       |survive AS (
       |  SELECT doc_id, lang, rtext FROM (
       |    SELECT doc_id, lang, rtext,
       |      min(doc_id) OVER (PARTITION BY cluster) AS m
       |    FROM nd) WHERE doc_id = m),
       |samp AS (
       |  SELECT * FROM survive WHERE $sampBucket < ($rate) * 10000),
       |spl AS (
       |  SELECT doc_id, rtext, ${PipelineOps.splitCaseSql} AS split
       |  FROM samp),
       |packed AS (
       |  SELECT split,
       |    CAST(floor((sum($rtoks) OVER (PARTITION BY split ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - $rtoks)
       |      / $PackBudget.0) AS BIGINT) AS pack_id
       |  FROM spl)
       |SELECT stage, n_docs FROM (
       |  SELECT '0_raw' AS stage, count(*)::BIGINT AS n_docs FROM documents
       |  UNION ALL SELECT '1_cleaned', count(*)::BIGINT FROM cleaned
       |  UNION ALL SELECT '2_corpus', count(*)::BIGINT FROM samp
       |  UNION ALL SELECT '3_packs', count(*)::BIGINT FROM
       |    (SELECT DISTINCT split, pack_id FROM packed))
       |ORDER BY stage""".stripMargin
  }

  // ------------------------- q144/q145: training ORDER (after packing)

  /** The epoch seed baked into the q144/q145 catalog entries — a
    * parameter in the API, pinned here so the oracle can replay it.
    */
  private val EpochSeed = 42

  /** Seed-keyed shuffle position for `idCol`: md5 of "id:seed" (both
    * engines produce identical lowercase hex, the q19 fingerprint
    * precedent), tie-broken by id. A hash key instead of RNG state is
    * what makes the shuffle REPRODUCIBLE and resumable: any worker
    * can recompute any document's position from (id, seed) alone —
    * no driver-held permutation, no RNG sequence coupling position
    * to visit order.
    */
  private def shuffleKey(idCol: org.apache.spark.sql.Column, seed: Int) =
    md5(concat(idCol.cast("string"), lit(s":$seed")))

  /** Dense global rank of `df` under the total order `key` (which
    * must be duplicate-free), WITHOUT the single-partition Window a
    * bare `row_number() OVER (ORDER BY …)` plans — that shape funnels
    * the whole table through one task, the exact anti-pattern
    * PlanQualitySpec polices elsewhere. Distributed shape instead:
    * range-repartition + sort by the key (the same exchange a global
    * sort uses), per-partition `row_number` keyed by the partition id
    * (parallel), plus a broadcast O(numPartitions) offsets table
    * (cumulative counts — ITS window is single-partition over ~32
    * rows, the bounded-small case). Positions depend only on the
    * total order, not on where the sampled range boundaries fall, so
    * the output is deterministic. [[graft.core.Pin.shared]] pins ONE
    * boundary assignment for both consumers — range boundaries are
    * sampled per materialization, and the offsets must join the exact
    * partitioning they were counted under (the q73 `packTokensBy`
    * precedent). The pin is a parquet artifact on reliable storage,
    * not a `localCheckpoint`: `__pid` is computed BEFORE the write and
    * stored as data, so a lost executor (which would have destroyed
    * unreplicated checkpoint blocks and failed the job) just re-reads
    * the same bytes — the 100 TB durability contract is code here,
    * not a caller-facing comment.
    */
  private def withGlobalPos(df: DataFrame, pinName: String,
      key: Seq[org.apache.spark.sql.Column], out: String): DataFrame = {
    val sorted = graft.core.Pin.shared(df.sparkSession, pinName)(
      df.repartitionByRange(key: _*).sortWithinPartitions(key: _*)
        .withColumn("__pid", spark_partition_id()))
    val tiny = org.apache.spark.sql.expressions.Window
      .orderBy(col("__pid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = sorted.groupBy(col("__pid")).count()
      .select(col("__pid"),
        coalesce(sum(col("count")).over(tiny), lit(0L)).as("__offset"))
    val perPart = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(key: _*)
    sorted.join(broadcast(offsets), "__pid")
      .withColumn(out,
        (col("__offset") + row_number().over(perPart)).cast("long"))
      .drop("__pid", "__offset")
  }

  /** q144: deterministic epoch shuffle — the training-order step that
    * follows packing in every LLM data pipeline (a fresh document
    * order per epoch, reproducible across re-runs and resumable after
    * failures). Positions come from [[withGlobalPos]] over the hash
    * key — a range-partitioned parallel numbering, not a
    * single-partition window — and at 100 TB the same query with
    * `shuffle_pos % numShards` assigns output shards instead of
    * materializing one ordered file. A new epoch is a new seed,
    * nothing else.
    */
  def epochShuffle(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withGlobalPos(
      Tables.load(spark, dir, "documents").select($"doc_id", $"source"),
      s"pos-q144-s$EpochSeed-${graft.core.Pin.tag(dir)}",
      Seq(shuffleKey($"doc_id", EpochSeed), $"doc_id"), "shuffle_pos")
      .select($"doc_id", $"source", $"shuffle_pos")
      .orderBy($"shuffle_pos")
  }

  private def oracleEpochShuffle: String =
    s"""SELECT doc_id, source,
       |  row_number() OVER (
       |    ORDER BY md5(doc_id || ':$EpochSeed'), doc_id)::BIGINT
       |    AS shuffle_pos
       |FROM documents ORDER BY shuffle_pos""".stripMargin

  /** q145: source-interleaved training order — shuffle WITHIN each
    * source, then round-robin across sources by per-source rank. The
    * uniform global shuffle (q144) lets a large source dominate long
    * stretches of an epoch; interleaving pins the mixing rate so
    * every window of the training stream carries every source — the
    * curriculum/mixture discipline between q88's mixture weights and
    * the packing step. The per-source rank is a KEYED window
    * (parallel by construction); the global interleave position is
    * [[withGlobalPos]] over (rank, source) — no single-partition
    * window anywhere, no driver state, reproducible from (id, seed).
    */
  def sourceInterleave(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perSource = org.apache.spark.sql.expressions.Window
      .partitionBy($"source")
      .orderBy(shuffleKey($"doc_id", EpochSeed), $"doc_id")
    val ranked = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"source")
      .withColumn("source_rank", row_number().over(perSource).cast("long"))
    withGlobalPos(ranked, s"pos-q145-s$EpochSeed-${graft.core.Pin.tag(dir)}",
      Seq($"source_rank", $"source"), "global_pos")
      .select($"doc_id", $"source", $"source_rank", $"global_pos")
      .orderBy($"global_pos")
  }

  private def oracleSourceInterleave: String =
    s"""WITH ranked AS (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY md5(doc_id || ':$EpochSeed'), doc_id)::BIGINT
       |      AS source_rank
       |  FROM documents)
       |SELECT doc_id, source, source_rank,
       |  row_number() OVER (ORDER BY source_rank, source)::BIGINT
       |    AS global_pos
       |FROM ranked ORDER BY global_pos""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q83_training_funnel" -> (funnel _),
    "q144_epoch_shuffle" -> (epochShuffle _),
    "q145_source_interleave" -> (sourceInterleave _),
  )

  val oracles: Map[String, String] = Map(
    "q83_training_funnel" -> oracleFunnel,
    "q144_epoch_shuffle" -> oracleEpochShuffle,
    "q145_source_interleave" -> oracleSourceInterleave,
  )
}
