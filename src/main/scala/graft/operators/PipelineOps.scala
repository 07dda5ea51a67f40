package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import TextPrims._

/** Pipeline-governance operators for a training-data build: column
  * profiling, deterministic sampling, split assignment, and benchmark
  * decontamination. Sampling/splits use the shared md5 hash family so
  * assignment is reproducible across runs AND engines (no rand()) —
  * the property a 100 TB pipeline needs for resumability and audits.
  */
object PipelineOps {

  /** Data-quality profile of the orders table: per-column null counts,
    * ranges, and constraint-violation counts in ONE scan (map-side
    * partial aggregation, no shuffle beyond the single global agg).
    */
  def dataQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when($"o_custkey".isNull, 1).otherwise(0)).as("null_custkey"),
        sum(when($"o_totalprice".isNull, 1).otherwise(0)).as("null_totalprice"),
        sum(when($"o_totalprice" <= 0, 1).otherwise(0)).as("nonpositive_price"),
        round(min($"o_totalprice"), 2).as("min_price"),
        round(max($"o_totalprice"), 2).as("max_price"),
        countDistinct($"o_orderstatus").as("n_statuses"),
        sum(when(!$"o_orderpriority".rlike("^[1-5]-"), 1).otherwise(0)).as("bad_priority"))
  }

  private val oracleQuality =
    """SELECT count(*) AS n_rows,
      |  sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_custkey,
      |  sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_totalprice,
      |  sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)::BIGINT AS nonpositive_price,
      |  round(min(o_totalprice), 2) AS min_price,
      |  round(max(o_totalprice), 2) AS max_price,
      |  count(DISTINCT o_orderstatus) AS n_statuses,
      |  sum(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END)::BIGINT
      |    AS bad_priority
      |FROM orders""".stripMargin

  /** Deterministic 10% stratified sample: hash-bucket membership
    * (`hash64(doc_id) % 10 == 0`), reproducible across runs/engines —
    * never `rand()`.
    */
  def deterministicSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .filter(pmod(hash64($"doc_id".cast("string")), lit(10)) === 0)
      .select($"doc_id", $"lang", $"n_chars")
      .orderBy($"doc_id")
  }

  private def oracleSample =
    s"""SELECT doc_id, lang, n_chars FROM documents
       |WHERE ${hash64Sql("CAST(doc_id AS VARCHAR)")} % 10 = 0
       |ORDER BY doc_id""".stripMargin

  /** Train/val/test split assignment (80/10/10) from the same hash
    * family, with per-(lang, split) counts — the audit view.
    */
  /** The ONE split-assignment rule (deterministic hash bucket 80/10/10)
    * shared by q68's report, q124's leakage audit and both oracles.
    */
  private[operators] def splitCol: org.apache.spark.sql.Column = {
    val bucket = pmod(hash64(concat(lit("split:"), col("doc_id").cast("string"))), lit(10))
    when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test")
  }

  private[operators] def splitCaseSql: String = {
    val bucket = s"""${hash64Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 10"""
    s"CASE WHEN $bucket < 8 THEN 'train' WHEN $bucket = 8 THEN 'val' ELSE 'test' END"
  }

  def splitAssignment(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .withColumn("split", splitCol)
      .groupBy($"lang", $"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
      .orderBy($"lang", $"split")
  }

  private def oracleSplit =
    s"""SELECT lang, $splitCaseSql AS split,
       |  count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
       |FROM documents GROUP BY 1, 2 ORDER BY lang, split""".stripMargin

  // ----------------------------------------------- q124 split leakage

  /** Cross-split leakage audit (q124): near-duplicate pairs that
    * STRADDLE the q68 train/val/test boundary — the reason dedup must
    * precede splitting: a test doc with a train near-twin is a leaked
    * eval. Rides the shared df-capped pair pipeline (q61's cached
    * table — duplicate-density-bound, so the leaked list is small at
    * any corpus size) joined twice against the split assignment (the
    * pair side is tiny → AQE broadcasts it; the split side streams).
    * `drop_id` is the actionable column: the train-side member to
    * remove (NULL for a val↔test pair — both eval splits, needs a
    * human call). Both the pair SQL and the split rule render from
    * their single shared definitions, so the audit cannot drift from
    * what q61/q68 actually compute.
    */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sp = Tables.load(spark, dir, "documents")
      .select($"doc_id", splitCol.as("split"))
    val sa = sp.select($"doc_id".as("a_id"), $"split".as("split_a"))
    val sb = sp.select($"doc_id".as("b_id"), $"split".as("split_b"))
    TextDedup.cappedPairs(spark, dir)
      .join(sa, "a_id").join(sb, "b_id")
      .filter($"split_a" =!= $"split_b")
      .select($"a_id", $"b_id", round($"jaccard", 4).as("jaccard"),
        $"split_a", $"split_b",
        when($"split_a" === "train", $"a_id")
          .when($"split_b" === "train", $"b_id").as("drop_id"))
      .orderBy($"a_id", $"b_id")
  }

  private def oracleSplitLeakage: String =
    s"""WITH ${TextDedup.cappedDupSql},
       |sp AS (SELECT doc_id, $splitCaseSql AS split FROM documents)
       |SELECT d.a_id, d.b_id, round(d.jaccard, 4) AS jaccard,
       |  sa.split AS split_a, sb.split AS split_b,
       |  CASE WHEN sa.split = 'train' THEN d.a_id
       |       WHEN sb.split = 'train' THEN d.b_id END AS drop_id
       |FROM dup d
       |JOIN sp sa ON sa.doc_id = d.a_id
       |JOIN sp sb ON sb.doc_id = d.b_id
       |WHERE sa.split <> sb.split
       |ORDER BY d.a_id, d.b_id""".stripMargin

  /** Benchmark decontamination: training docs sharing word-3-gram
    * shingles with the eval set (doc_id < 20 stands in for the held-out
    * benchmark). The eval shingle set is tiny → broadcast; the train
    * side streams once. Output: contaminated docs with overlap counts.
    */
  def decontamination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", words($"text").as("w"))
      .filter(size($"w") >= 3)
      .select($"doc_id", explode(array_distinct(shingles3($"w"))).as("s"))
    // the shared durable eval-shingle artifact (round 19) — identical
    // rows to the inline distinct this replaces
    val evalShingles = TextDedup.evalShinglePin(spark, dir)
    val train = docs.filter($"doc_id" >= 20)
    train.join(broadcast(evalShingles), Seq("s"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_overlap"))
      .filter($"n_overlap" >= 5)
      .orderBy($"doc_id")
  }

  private def oracleDecontamination =
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(${shingles3Sql("string_split(text, ' ')")}) AS s
       |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
       |d AS (SELECT DISTINCT doc_id, s FROM sh),
       |ev AS (SELECT DISTINCT s FROM d WHERE doc_id < 20)
       |SELECT doc_id, count(*) AS n_overlap
       |FROM d JOIN ev USING (s)
       |WHERE doc_id >= 20
       |GROUP BY doc_id HAVING count(*) >= 5 ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- q72 PII

  /** PII patterns — character classes only (no lookahead), so Java
    * regex (Spark) and RE2 (DuckDB) agree on every match.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IpRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhoneRe = "\\+[0-9]-[0-9]{3}-[0-9]{4}"

  /** Redact all three PII classes in a text column (email → [EMAIL],
    * IPv4 → [IP], phone → [PHONE]) — reusable library surface; the q72
    * query demonstrates it corpus-wide.
    */
  def redactPii(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(t, lit(EmailRe), lit("[EMAIL]")),
        lit(IpRe), lit("[IP]")),
      lit(PhoneRe), lit("[PHONE]"))

  def piiCounts(t: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] = Seq(
    regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
    regexp_count(t, lit(IpRe)).cast("long").as("n_ips"),
    regexp_count(t, lit(PhoneRe)).cast("long").as("n_phones"))

  /** PII detection + redaction: email / IPv4 / phone regex counts and a
    * fully-redacted text column. Map-only (regexes are codegen'd string
    * expressions — no UDF), so it scales as a pure scan. The synthetic
    * corpus carries no natural PII, so the query plants deterministic
    * PII derived from corpus fields (same construction in the oracle) —
    * the detection/redaction machinery is value-checked end to end;
    * on real data the same columns run over raw `text`. Patterns stick
    * to character classes (no lookahead) so Java regex and RE2 agree.
    */
  def piiScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pii = concat($"text", lit(" contact "), $"source", lit("@example.com via 10.0."),
      pmod($"doc_id", lit(256)).cast("string"), lit(".7 or +1-555-"),
      lpad(pmod($"doc_id", lit(10000)).cast("string"), 4, "0"))
    Tables.load(spark, dir, "documents")
      .select($"doc_id", pii.as("t"))
      .select($"doc_id" +: piiCounts($"t") :+ redactPii($"t").as("redacted"): _*)
      .orderBy($"doc_id")
  }

  private def oraclePii = {
    val t = "text || ' contact ' || source || '@example.com via 10.0.' || " +
      "CAST(doc_id % 256 AS VARCHAR) || '.7 or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    s"""WITH p AS (SELECT doc_id, $t AS t FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(t, '$EmailRe')) AS n_emails,
       |  len(regexp_extract_all(t, '$IpRe')) AS n_ips,
       |  len(regexp_extract_all(t, '$PhoneRe')) AS n_phones,
       |  regexp_replace(regexp_replace(regexp_replace(t,
       |    '$EmailRe', '[EMAIL]', 'g'), '$IpRe', '[IP]', 'g'),
       |    '$PhoneRe', '[PHONE]', 'g') AS redacted
       |FROM p ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------- q73 packing

  private val PackBudget = 2048L

  /** Token-budget packing: assign documents (in deterministic doc_id
    * order) to fixed-budget training chunks — pack_id = exclusive
    * running token count ÷ budget. The running sum is NOT a global
    * single-partition window (the classic scale-killer): range-partition
    * on the pack order, windowed sum WITHIN each partition, then each
    * partition's total (one row per partition) is collected, prefix-
    * summed on the driver, and broadcast back as offsets — the textbook
    * two-phase distributed prefix sum. [[graft.core.Pin.shared]] pins
    * the partitioning durably (pid stored as data in a parquet
    * artifact) so the offsets join the same data they were computed
    * from, and executor loss re-reads instead of failing the job.
    */
  /** Generalized two-phase packing core: assign `pack_id` within each
    * stratum (empty `strata` = one global sequence) from the exclusive
    * running sum of `tokens` in doc_id order. Range-partitioned on
    * (strata, doc_id); per-(partition, stratum) totals — one row each —
    * are collected, prefix-summed per stratum on the driver, and
    * broadcast back. Strata never share a pack (a training batch must
    * not straddle a train/val split).
    */
  def packTokensBy(df: DataFrame, strata: Seq[String], budget: Long,
      keepCum: Boolean = false, pin: String = ""): DataFrame = {
    import df.sparkSession.implicits._
    val stratCols = strata.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((col("pid") +: stratCols): _*).orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val staged = df
      .repartitionByRange(8, (stratCols :+ $"doc_id"): _*)
      .withColumn("pid", spark_partition_id())
      .withColumn("cum_in", sum($"tokens").over(w))
    // callers that name the pin get the durable artifact; the empty
    // default keeps ad-hoc/library use working (localCheckpoint is
    // still a correct pin on a healthy cluster, just not loss-durable).
    // The effective name carries every parameter the staged rows
    // depend on (budget is in cum thresholds via pack_id downstream —
    // but strata shape the partitioning itself), so two calls with
    // different strata can never alias one artifact.
    val local =
      if (pin.nonEmpty)
        graft.core.Pin.shared(df.sparkSession,
          s"$pin-${if (strata.isEmpty) "flat" else strata.mkString("_")}")(staged)
      else staged.localCheckpoint()
    val totals = local.groupBy((col("pid") +: stratCols): _*)
      .agg(max($"cum_in").as("psum"))
      .orderBy((stratCols :+ col("pid")): _*).collect() // one row per (partition, stratum)
    var prevKey: Seq[Any] = null
    var acc = 0L
    val offsets = totals.map { r =>
      val key = strata.indices.map(i => r.get(i + 1))
      if (key != prevKey) { acc = 0L; prevKey = key }
      val o = Row.fromSeq(r.get(0) +: key :+ acc)
      acc += r.getLong(strata.length + 1)
      o
    }.toSeq
    val offSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("pid", org.apache.spark.sql.types.IntegerType) +:
        strata.map(s => df.schema(s)) :+
        org.apache.spark.sql.types.StructField("offset", org.apache.spark.sql.types.LongType))
    val offsetsDf = df.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(offsets).asJava),
      offSchema)
    val out = local.join(broadcast(offsetsDf), "pid" +: strata)
      .withColumn("cum_excl", $"offset" + $"cum_in" - $"tokens")
      .withColumn("pack_id", floor($"cum_excl" / lit(budget.toDouble)).cast("long"))
      .drop("pid", "cum_in", "offset")
    // cum_excl (each doc's exclusive global token offset) is what the
    // q123 audit needs to see pack-boundary straddling
    if (keepCum) out else out.drop("cum_excl")
  }

  def tokenPacking(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.load(spark, dir, "documents")
      .select($"doc_id", size(words($"text")).cast("long").as("tokens"))
    packTokensBy(toks, Nil, PackBudget,
        pin = s"pack-global-${graft.core.Pin.tag(dir)}")
      .select($"doc_id", $"tokens", $"pack_id")
      .orderBy($"doc_id")
  }

  private def oraclePacking =
    s"""SELECT doc_id, len(string_split(text, ' '))::BIGINT AS tokens,
       |  CAST(floor((sum(len(string_split(text, ' '))) OVER
       |    (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    - len(string_split(text, ' '))) / $PackBudget.0) AS BIGINT) AS pack_id
       |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ q123 packing audit

  /** Packing-efficiency audit (q123): per training chunk of the q73
    * packing — document count, token mass, fill fraction against the
    * budget, and the SPILL (tokens past the chunk's budget window,
    * carried by the boundary-straddling document; q73 assigns each doc
    * to the pack where it STARTS, so a pack's mass can exceed its
    * window). The report a pipeline owner reads to size `PackBudget`:
    * systematic spill → documents long relative to the budget,
    * fill ≪ 1 on the tail pack is expected. One keyed agg over the
    * packing output — pack count ∝ corpus tokens / budget, and the
    * packing itself is the q73 two-phase prefix sum (no global
    * window).
    */
  def packingAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.load(spark, dir, "documents")
      .select($"doc_id", size(words($"text")).cast("long").as("tokens"))
    // same staged plan as q73 ⇒ same pin name: q73 and this audit
    // share one artifact instead of materializing twice
    packTokensBy(toks, Nil, PackBudget, keepCum = true,
        pin = s"pack-global-${graft.core.Pin.tag(dir)}")
      .groupBy($"pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum($"tokens").as("tokens"),
        max($"cum_excl" + $"tokens").as("end_cum"))
      .select($"pack_id", $"n_docs", $"tokens",
        round($"tokens" / lit(PackBudget.toDouble), 4).as("fill_pct"),
        greatest(lit(0L), $"end_cum" - ($"pack_id" + 1) * PackBudget).as("spill"))
      .orderBy($"pack_id")
  }

  private def oraclePackingAudit: String = {
    val tok = "len(string_split(text, ' '))"
    s"""WITH t AS (
       |  SELECT doc_id, $tok::BIGINT AS tokens,
       |    (sum($tok) OVER (ORDER BY doc_id
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - $tok)::BIGINT
       |      AS cum_excl
       |  FROM documents),
       |p AS (
       |  SELECT CAST(floor(cum_excl / $PackBudget.0) AS BIGINT) AS pack_id,
       |    tokens, cum_excl FROM t)
       |SELECT pack_id, count(*)::BIGINT AS n_docs, sum(tokens)::BIGINT AS tokens,
       |  round(sum(tokens) / $PackBudget.0, 4) AS fill_pct,
       |  greatest(0, max(cum_excl + tokens) - (pack_id + 1) * $PackBudget)::BIGINT AS spill
       |FROM p GROUP BY pack_id ORDER BY pack_id""".stripMargin
  }

  // --------------------------------------------------- q125 PSI drift

  /** Population-stability-index drift audit (q125): the standard
    * production check that a column's distribution hasn't shifted —
    * here `o_totalprice`, comparing the first 70% of the order time
    * range (the "reference" window that trained the bins) against the
    * rest. Bins are the reference's deciles (exact `percentile`, the
    * q103 cross-engine pair with `quantile_cont`, cuts rounded to 6
    * before comparison so interpolation ulp can't flip a bin); rates
    * are add-one smoothed over the 10 bins so an empty current bin
    * stays finite; per-bin PSI terms are (p−q)·ln(p/q) ≥ 0 — the
    * consumer sums them against the usual 0.1/0.25 thresholds. Scale
    * shape: three scans — time bounds for the cut, reference deciles,
    * and the binning pass (the deciles cannot fold into the bounds
    * scan: their population depends on the cut) — then a 10-ary keyed
    * agg, everything model-sized broadcast. Same shape at 100 TB.
    */
  /** Decile-bin assignment given the 9 rounded cut columns c1..c9 —
    * shared by q125 and the streaming monitor
    * ([[graft.streaming.StreamingJobs.psiDriftStream]]).
    */
  private[graft] def psiBin(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (1 to 9).map(i => when(x > col(s"c$i"), 1).otherwise(0)).reduce(_ + _).cast("long")

  /** Add-one-smoothed rate over 10 bins. */
  private[graft] def psiRate(n: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (coalesce(n, lit(0L)) + 1.0) / (t + 10)

  /** One PSI summand: (p − q)·ln(p/q). */
  private[graft] def psiTerm(p: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (p - q) * log(p / q)

  /** The 9 reference deciles as one aggregated row (c1..c9, each
    * rounded to 6 pre-comparison — see [[psiDrift]]'s parity note).
    */
  private[graft] def psiCuts(ref: DataFrame, x: String): DataFrame =
    // one array-percentile aggregate instead of nine scalar ones
    // (optimization round 18): the scalar form buffered the full value
    // multiset once PER DECILE — nine identical sort buffers per
    // partition; the array form keeps one and emits all nine cuts.
    // Same Spark `percentile` interpolation, so values are identical.
    ref.agg(percentile(col(x),
        array((1 to 9).map(i => lit(i / 10.0)): _*)).as("cs"))
      .select((1 to 9).map(i =>
        round(element_at(col("cs"), i), 6).as(s"c$i")): _*)

  def psiDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.load(spark, dir, "orders")
      // orders carries TIMESTAMP_NTZ; the session is pinned UTC, so the
      // cast to instant-typed timestamp is lossless and matches epoch_us
      .select($"o_totalprice".as("x"),
        unix_micros($"o_orderdate".cast("timestamp")).as("ts_us"))
    val cut = o.agg(expr("min(ts_us) + div((max(ts_us) - min(ts_us)) * 7, 10)").as("cut_us"))
    val w = o.crossJoin(broadcast(cut))
    val cuts = psiCuts(w.filter($"ts_us" <= $"cut_us"), "x")
    val binned = w.crossJoin(broadcast(cuts))
      .withColumn("pop", when($"ts_us" <= $"cut_us", "ref").otherwise("cur"))
      .withColumn("bin", psiBin($"x"))
    val cnt = binned.groupBy($"bin").agg(
      sum(when($"pop" === "ref", 1L).otherwise(0L)).as("ref_n"),
      sum(when($"pop" === "cur", 1L).otherwise(0L)).as("cur_n"))
    val tot = cnt.agg(sum($"ref_n").as("rt"), sum($"cur_n").as("ct"))
    val rr = psiRate($"ref_n", $"rt")
    val cr = psiRate($"cur_n", $"ct")
    spark.range(10).select($"id".as("bin"))
      .join(cnt, Seq("bin"), "left")
      .crossJoin(broadcast(tot))
      .select($"bin",
        coalesce($"ref_n", lit(0L)).as("ref_n"),
        coalesce($"cur_n", lit(0L)).as("cur_n"),
        round(rr, 6).as("ref_rate"), round(cr, 6).as("cur_rate"),
        round(psiTerm(rr, cr), 6).as("psi_term"))
      .orderBy($"bin")
  }

  private def oraclePsiDrift: String = {
    val cutsSel = (1 to 9).map(i =>
      s"round(quantile_cont(x, 0.${i}), 6) AS c$i").mkString(", ")
    val binExpr = (1 to 9).map(i => s"(x > c.c$i)::INT").mkString(" + ")
    s"""WITH o AS (
       |  SELECT o_totalprice AS x, epoch_us(o_orderdate) AS ts_us FROM orders),
       |b AS (SELECT min(ts_us) + ((max(ts_us) - min(ts_us)) * 7) // 10 AS cut_us FROM o),
       |c AS (SELECT $cutsSel FROM o, b WHERE ts_us <= cut_us),
       |p AS (
       |  SELECT CASE WHEN ts_us <= b.cut_us THEN 'ref' ELSE 'cur' END AS pop,
       |    ($binExpr)::BIGINT AS bin
       |  FROM o, b, c),
       |cnt AS (
       |  SELECT bin,
       |    count(*) FILTER (WHERE pop = 'ref') AS ref_n,
       |    count(*) FILTER (WHERE pop = 'cur') AS cur_n
       |  FROM p GROUP BY bin),
       |tot AS (SELECT sum(ref_n) AS rt, sum(cur_n) AS ct FROM cnt),
       |gs AS (SELECT unnest(generate_series(0, 9)) AS bin)
       |SELECT gs.bin,
       |  coalesce(cnt.ref_n, 0)::BIGINT AS ref_n,
       |  coalesce(cnt.cur_n, 0)::BIGINT AS cur_n,
       |  round((coalesce(cnt.ref_n, 0) + 1.0) / (tot.rt + 10), 6) AS ref_rate,
       |  round((coalesce(cnt.cur_n, 0) + 1.0) / (tot.ct + 10), 6) AS cur_rate,
       |  round(((coalesce(cnt.ref_n, 0) + 1.0) / (tot.rt + 10) -
       |         (coalesce(cnt.cur_n, 0) + 1.0) / (tot.ct + 10)) *
       |        ln(((coalesce(cnt.ref_n, 0) + 1.0) / (tot.rt + 10)) /
       |           ((coalesce(cnt.cur_n, 0) + 1.0) / (tot.ct + 10))), 6) AS psi_term
       |FROM gs LEFT JOIN cnt ON cnt.bin = gs.bin CROSS JOIN tot
       |ORDER BY gs.bin""".stripMargin
  }

  // ---------------------------------------------------- q74 stratified

  private val StratRates = Seq("en" -> 0.2, "de" -> 0.5, "fr" -> 0.5, "es" -> 0.5, "zh" -> 0.8)
  private val StratDefault = 0.1

  /** Stratified deterministic sampling, the no-shuffle formulation:
    * keep a row iff its hash bucket (0..9999) falls under the stratum's
    * rate — a map-only filter, vs the rank-per-stratum formulation
    * whose per-group sort is a shuffle. Rates rebalance the corpus
    * (downsample the dominant language, keep rare ones). Output is the
    * per-stratum audit: total, kept, target rate.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rate = StratRates.foldLeft(lit(StratDefault)) {
      case (acc, (l, r)) => when($"lang" === l, lit(r)).otherwise(acc)
    }
    val bucket = pmod(hash64(concat(lit("strat:"), $"doc_id".cast("string"))), lit(10000))
    Tables.load(spark, dir, "documents")
      .withColumn("kept", (bucket < rate * 10000).cast("long"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_total"), sum($"kept").as("n_kept"),
        max(rate).as("target_rate"))
      .orderBy($"lang")
  }

  private def oracleStratified = {
    val rate = StratRates.reverse.foldLeft(StratDefault.toString) {
      case (acc, (l, r)) => s"CASE WHEN lang = '$l' THEN $r ELSE $acc END"
    }
    val bucket = s"${hash64Sql("'strat:' || CAST(doc_id AS VARCHAR)")} % 10000"
    s"""SELECT lang, count(*) AS n_total,
       |  sum(CASE WHEN $bucket < ($rate) * 10000 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       |  max($rate) AS target_rate
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  }

  // -------------------------------------------------- q84 k-anonymity

  private val KAnon = 5L

  /** K-anonymous aggregate release (q84): publish (segment, nation)
    * cell counts only where the cell holds ≥ k individuals; all
    * smaller cells collapse into one `__suppressed__` rollup row, so
    * the release never exposes a group small enough to re-identify.
    * One agg shuffle + a tiny driver-free conditional union — the
    * shape is identical at any scale.
    */
  def kAnonymousRelease(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.load(spark, dir, "customer")
      .groupBy($"c_mktsegment".as("seg"), $"c_nationkey".cast("string").as("nat"))
      .agg(count(lit(1)).as("n"))
    val released = cells.filter($"n" >= KAnon).select($"seg", $"nat", $"n")
    val suppressed = cells.filter($"n" < KAnon)
      .agg(sum($"n").as("n")).filter($"n".isNotNull)
      .select(lit("__suppressed__").as("seg"), lit("*").as("nat"), $"n")
    released.union(suppressed).orderBy($"seg", $"nat")
  }

  private def oracleKAnon: String =
    s"""WITH cells AS (
       |  SELECT c_mktsegment AS seg, CAST(c_nationkey AS VARCHAR) AS nat,
       |    count(*) AS n
       |  FROM customer GROUP BY 1, 2)
       |SELECT seg, nat, n FROM cells WHERE n >= $KAnon
       |UNION ALL
       |SELECT '__suppressed__' AS seg, '*' AS nat, sum(n)::BIGINT AS n
       |FROM cells WHERE n < $KAnon HAVING sum(n) IS NOT NULL
       |ORDER BY seg, nat""".stripMargin

  // ---------------------------------------- q85 per-stratum top-N sample

  private val SampleN = 20

  /** Deterministic per-stratum fixed-SIZE sample (q85): exactly N docs
    * per language, chosen by smallest deterministic hash — the
    * fixed-count companion to q74's fixed-RATE sampler, built on the
    * custom [[graft.plans.TopKPerKey]] operator (bounded heap per
    * stratum; no per-stratum sort, no rand()). The sort key appends
    * the doc id to the hash, so selection is total-ordered and
    * engine-independent even under hash collisions.
    */
  def stratifiedTopNSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"lang",
        concat(lpad(hash64(concat(lit("smp:"), $"doc_id".cast("string"))).cast("string"), 20, "0"),
          lit(":"), lpad($"doc_id".cast("string"), 10, "0")).as("score"))
    graft.plans.TopKPerKey(scored, Seq("lang"), $"score", SampleN, descending = false)
      .select($"lang", $"doc_id")
      .orderBy($"lang", $"doc_id")
  }

  private def oracleTopNSample: String = {
    val score = s"lpad(CAST(${hash64Sql("'smp:' || CAST(doc_id AS VARCHAR)")} AS VARCHAR), 20, '0') " +
      "|| ':' || lpad(CAST(doc_id AS VARCHAR), 10, '0')"
    s"""WITH scored AS (
       |  SELECT doc_id, lang, $score AS score FROM documents),
       |ranked AS (
       |  SELECT lang, doc_id,
       |    row_number() OVER (PARTITION BY lang ORDER BY score) AS rn
       |  FROM scored)
       |SELECT lang, doc_id FROM ranked WHERE rn <= $SampleN
       |ORDER BY lang, doc_id""".stripMargin
  }

  /** q137: SCHEMA-DRIVEN column profiler — the generic form of q66's
    * hand-written profile. The aggregate list is generated from
    * `df.schema` (null count, exact distinct, min/max rendered as
    * strings, per column), so the same operator profiles ANY table a
    * connector lands — the "first look at an unknown source" step
    * every migration starts with (the reference infers types from one
    * probe row, `d22d/utils/db/__init__.py:428-474`; this profiles
    * every row of every column in one scan, which is what that
    * inference actually needed). One `agg` pass: Catalyst plans the N
    * DISTINCT aggregates via a single Expand(×N) over the scan — one
    * job, map-side partials, no driver loop. `exact = false` swaps
    * exact distinct for `approx_count_distinct` (HLL), dropping the
    * Expand entirely — the 100 TB default, where ±2% cardinality is
    * the profiling answer anyway; the catalog entry keeps `exact` so
    * the value oracle can pin it.
    */
  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val cols = df.schema.fields.map(_.name).toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"__nulls_$c"),
        (if (exact) countDistinct(col(c))
        else approx_count_distinct(col(c))).as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val structs = cols.map { c =>
      struct(lit(c).as("column_name"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__distinct_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    one.select(explode(array(structs: _*)).as("p"))
      .select("p.*").orderBy("column_name")
  }

  def columnProfile(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.load(spark, dir, "documents"))

  private def oracleColumnProfile: String = {
    val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
    cols.map { c =>
      s"""SELECT '$c' AS column_name,
         |  (count(*) - count($c))::BIGINT AS n_nulls,
         |  count(DISTINCT $c)::BIGINT AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_value,
         |  CAST(max($c) AS VARCHAR) AS max_value
         |FROM documents""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q137_column_profile" -> (columnProfile _),
    "q84_k_anonymous_release" -> (kAnonymousRelease _),
    "q85_stratified_topn" -> (stratifiedTopNSample _),
    "q72_pii_scan" -> (piiScan _),
    "q73_token_packing" -> (tokenPacking _),
    "q123_packing_audit" -> (packingAudit _),
    "q124_split_leakage" -> (splitLeakage _),
    "q125_psi_drift" -> (psiDrift _),
    "q74_stratified_sample" -> (stratifiedSample _),
    "q66_data_quality" -> (dataQuality _),
    "q67_deterministic_sample" -> (deterministicSample _),
    "q68_split_assignment" -> (splitAssignment _),
    "q69_decontamination" -> (decontamination _),
  )

  val oracles: Map[String, String] = Map(
    "q137_column_profile" -> oracleColumnProfile,
    "q84_k_anonymous_release" -> oracleKAnon,
    "q85_stratified_topn" -> oracleTopNSample,
    "q72_pii_scan" -> oraclePii,
    "q73_token_packing" -> oraclePacking,
    "q123_packing_audit" -> oraclePackingAudit,
    "q124_split_leakage" -> oracleSplitLeakage,
    "q125_psi_drift" -> oraclePsiDrift,
    "q74_stratified_sample" -> oracleStratified,
    "q66_data_quality" -> oracleQuality,
    "q67_deterministic_sample" -> oracleSample,
    "q68_split_assignment" -> oracleSplit,
    "q69_decontamination" -> oracleDecontamination,
  )
}
