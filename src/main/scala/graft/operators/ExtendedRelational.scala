package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational surface beyond the reference's own operators (SURVEY §2.3
  * lists what it lacks: window functions, set ops in-engine, grouping
  * sets, as-of/range joins, sketches). These complete the engine into a
  * general analytics surface, each with a DuckDB oracle.
  *
  * Parity traps handled here: `events.ts` is ns-precision in DuckDB but
  * µs in Spark → every oracle casts `ts` to µs `TIMESTAMP` first;
  * DuckDB `sum(INTEGER)` yields HUGEINT → cast to BIGINT; ORDER BY null
  * placement is explicit on both sides (Spark defaults NULLS FIRST asc,
  * DuckDB NULLS LAST).
  */
object ExtendedRelational {

  /** Event view with µs timestamps on the DuckDB side. Floor-divides the
    * ns epoch (CAST TIMESTAMP_NS→TIMESTAMP rounds, Spark truncates —
    * off-by-1µs on ~half the rows).
    */
  private val eventsUsSql =
    "SELECT event_id, user_id, event_type, value, props, " +
      "make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events"

  /** Left-semi join: customers having orders (EXISTS pushup — no
    * payload columns from the right side cross the shuffle).
    */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** Left-anti join: customers who never placed an URGENT order (the
    * filter is pushed below the join build side).
    */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val customer = Tables.load(spark, dir, "customer")
    val urgent = Tables.load(spark, dir, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
    customer.join(urgent, customer("c_custkey") === urgent("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** ROLLUP aggregation: (status, priority) → status → grand total. One
    * shuffle; Spark expands grouping sets map-side.
    */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
  }

  /** GROUPING SETS: independent status and priority subtotals in one
    * pass over the data (vs two scans for two group-bys).
    */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("graft_orders_gs")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  count(1) AS n, round(sum(o_totalprice), 2) AS total
        |FROM graft_orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** Running/window analytics per customer: cumulative spend, previous
    * order gap, sequence rank. Single shuffle on o_custkey; all four
    * window functions share one sort.
    */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "orders")
      .select(
        $"o_custkey", $"o_orderkey", $"o_orderdate".cast("date").as("o_date"),
        row_number().over(w).cast("long").as("seq"),
        round(sum($"o_totalprice").over(wRun), 2).as("running_spend"),
        datediff($"o_orderdate", lag($"o_orderdate", 1).over(w)).cast("long").as("days_since_prev"))
      .orderBy($"o_custkey", $"seq")
  }

  /** As-of join: each event matched to the user's most recent order at
    * event time. Implemented with the union-and-fill pattern: tag both
    * streams, one sort per user over the merged timeline, `last(...,
    * ignoreNulls)` carries the latest order forward. ONE shuffle + ONE
    * sort total, no per-event probe blowup — at 100 TB this beats the
    * join-then-filter plan (which materializes |events| × |orders/user|
    * intermediates). Orders are pre-deduped to one per (cust, date)
    * (max orderkey) to make the match deterministic.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val od = Tables.load(spark, dir, "orders")
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("o_orderkey"))
      .select($"o_custkey".as("user_id"), $"o_orderdate", $"o_orderkey")
    val events = Tables.load(spark, dir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type")
    AsOf.join(events, od, "ts", "o_orderdate", "user_id",
        rightPayload = Seq("o_orderkey", "o_orderdate"))
      .select($"event_id", $"user_id", $"event_type",
        $"o_orderkey", $"o_orderdate".cast("date").as("o_date"))
      .orderBy($"event_id")
  }

  private def oracleAsof: String =
    s"""WITH od AS (
       |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
       |  FROM orders GROUP BY 1, 2),
       |e AS ($eventsUsSql)
       |SELECT e.event_id, e.user_id, e.event_type, o.o_orderkey,
       |  CAST(o.o_orderdate AS DATE) AS o_date
       |FROM e ASOF JOIN od o
       |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
       |ORDER BY e.event_id""".stripMargin

  /** Range (interval) join: purchases within 5 minutes of a view by
    * the same user — funnel attribution, joined on (user, TIME
    * BUCKET) rather than user alone. A user-keyed join's per-key cost
    * is |views_u| × |purchases_u|: the round-9 sf10 sweep measured
    * exactly that blowup (371× wall at 100× data — the fixture grows
    * events-per-user, so the quadratic term dominates; any real
    * power-user/bot key does the same at 100 TB). The standard
    * interval-join discipline (Flink's interval join, range-bucketed
    * warehouse joins) bins time into window-width buckets: a matching
    * purchase in (t1, t1+5min] can only live in the view's bucket or
    * the one after, so the purchase side explodes to its bucket and
    * its predecessor (constant 2×) and the join equi-keys on
    * (user_id, bucket) with the exact range predicate evaluated on
    * the survivors. Each true pair matches exactly once (the two
    * exploded bucket values are distinct), so no dedup step — and
    * per-key work collapses from the pair product to matched
    * density. Re-measured at sf10: 100.2 s → 2.4 s, ratio 371× → ~9×
    * at 100× data. Bucket arithmetic is integral micros `div` (the
    * Tables.load idiom) — float division would drift at epoch
    * magnitudes.
    */
  def rangeJoinFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.load(spark, dir, "events")
    val bucketMicros = 300000000L // the window width: 5 min in micros
    val v = events.filter($"event_type" === "view")
      .select($"user_id", $"ts".as("t1"),
        expr(s"unix_micros(ts) div $bucketMicros").as("vb"))
    val p = events.filter($"event_type" === "purchase")
      .select($"user_id".as("u2"), $"ts".as("t2"),
        expr(s"unix_micros(ts) div $bucketMicros").as("pb"))
      .withColumn("b", explode(array($"pb", $"pb" - 1)))
    v.join(p, $"user_id" === $"u2" && $"vb" === $"b" && $"t2" > $"t1" &&
        $"t2" <= $"t1" + expr("INTERVAL 5 MINUTES"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy($"user_id")
  }

  private def oracleRangeJoin: String =
    s"""WITH e AS ($eventsUsSql)
       |SELECT v.user_id, count(*) AS n_pairs
       |FROM e v JOIN e p
       |  ON v.user_id = p.user_id AND p.ts > v.ts
       |  AND p.ts <= v.ts + INTERVAL 5 MINUTE
       |WHERE v.event_type = 'view' AND p.event_type = 'purchase'
       |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Pivot: daily event counts, event types to columns. Explicit pivot
    * values → single pass, no extra distinct-values job.
    */
  def pivotDaily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.load(spark, dir, "events")
      .select(date_trunc("day", $"ts").cast("date").as("day"), $"event_type")
      .groupBy($"day").pivot("event_type", EventTypes).agg(count(lit(1)))
    EventTypes.foldLeft(base) { (df, t) => df.withColumnRenamed(t, s"n_$t") }
      .na.fill(0L, EventTypes.map(t => s"n_$t"))
      .orderBy($"day")
  }

  private def oraclePivot: String = {
    val cols = EventTypes
      .map(t => s"count(*) FILTER (event_type = '$t') AS n_$t").mkString(",\n  ")
    s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       |  $cols
       |FROM events GROUP BY 1 ORDER BY day""".stripMargin
  }

  /** Exact percentiles per group (Spark `percentile` == DuckDB
    * `quantile_cont`, linear interpolation — verified bit-equal).
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // one array-percentile buffer per group instead of three scalar
    // ones (optimization round 18, the psiCuts rewrite): same Spark
    // `percentile` interpolation, values identical.
    Tables.load(spark, dir, "orders")
      .groupBy($"o_orderstatus")
      .agg(percentile($"o_totalprice",
        array(lit(0.25), lit(0.5), lit(0.75))).as("ps"))
      .select($"o_orderstatus",
        round(element_at($"ps", 1), 4).as("p25"),
        round(element_at($"ps", 2), 4).as("p50"),
        round(element_at($"ps", 3), 4).as("p75"))
      .orderBy($"o_orderstatus")
  }

  private def oraclePercentiles: String =
    """SELECT o_orderstatus,
      |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
      |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Histogram: fixed-width buckets over l_quantity (map-side bucketing
    * then one low-cardinality shuffle).
    */
  def histogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .select(floor($"l_quantity" / 5.0).cast("long").as("bucket"), $"l_quantity")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
        round(min($"l_quantity"), 2).as("lo"),
        round(max($"l_quantity"), 2).as("hi"))
      .orderBy($"bucket")
  }

  private def oracleHistogram: String =
    """SELECT floor(l_quantity / 5.0)::BIGINT AS bucket, count(*) AS n,
      |  round(min(l_quantity), 2) AS lo, round(max(l_quantity), 2) AS hi
      |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Sessionization (gaps-and-islands): session break at >30 min
    * inactivity; per-session event count and µs duration. The batch
    * shape of the streaming session-window operator — one shuffle on
    * user_id, two window passes over one sort.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "events")
      .withColumn("prev", lag($"ts", 1).over(w))
      .withColumn("new_sess",
        when($"prev".isNull || unix_micros($"ts") - unix_micros($"prev") > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .withColumn("sess_id", sum($"new_sess").over(wRun).cast("long"))
      .groupBy($"user_id", $"sess_id")
      .agg(count(lit(1)).as("n_events"),
        (max(unix_micros($"ts")) - min(unix_micros($"ts"))).as("dur_us"))
      .orderBy($"user_id", $"sess_id")
  }

  private def oracleSessionize: String =
    s"""WITH e AS ($eventsUsSql),
       |l AS (SELECT user_id, event_id, ts,
       |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |      FROM e),
       |s AS (SELECT *, CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
       |        THEN 1 ELSE 0 END AS new_sess FROM l),
       |c AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |        ROWS UNBOUNDED PRECEDING)::BIGINT AS sess_id FROM s)
       |SELECT user_id, sess_id, count(*) AS n_events,
       |  (epoch_us(max(ts)) - epoch_us(min(ts)))::BIGINT AS dur_us
       |FROM c GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin

  /** The built-in `session_window` operator in batch mode — same 30-min
    * gap semantics as the streaming session job and the q42
    * gaps-and-islands formulation (session_window treats a gap of
    * exactly 30:00.000000 as a new session — half-open window — hence
    * `>=` in the oracle's break condition).
    */
  def sessionWindowBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", unix_micros($"w.start").as("sess_start_us"), $"n_events")
      .orderBy($"user_id", $"sess_start_us")
  }

  private def oracleSessionWindow: String =
    s"""WITH e AS ($eventsUsSql),
       |l AS (SELECT user_id, event_id, ts,
       |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |      FROM e),
       |s AS (SELECT *, CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE
       |        THEN 1 ELSE 0 END AS new_sess FROM l),
       |c AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |        ROWS UNBOUNDED PRECEDING)::BIGINT AS sess_id FROM s)
       |SELECT user_id, epoch_us(min(ts))::BIGINT AS sess_start_us, count(*) AS n_events
       |FROM c GROUP BY user_id, sess_id ORDER BY user_id, sess_start_us""".stripMargin

  /** Sketch aggregates: HyperLogLog distinct + t-digest-style approximate
    * percentile. The sketch VALUES differ across engines by design, so
    * they cannot be hash-compared directly; instead the query emits the
    * exact companions (value-oracled) plus in-engine error-bound flags —
    * |approx − exact| / exact within the sketch's advertised bound
    * (HLL default rsd 0.05 → 0.1 ≈ 2σ; percentile accuracy 1000 → rank
    * slop n/1000 → 0.05 on this distribution). The oracle asserts the
    * flags are literally TRUE: a sketch drifting out of bound turns the
    * row red. The exact percentile companion uses l_quantity (integral
    * doubles), where cont-interpolation midpoints are exactly
    * representable, so Spark `percentile` == DuckDB `quantile_cont`
    * bit-for-bit. Tighter per-value assertions live in
    * ExtendedRelationalSpec.
    */
  def approxSketches(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .agg(
        countDistinct($"l_partkey").as("exact_parts"),
        countDistinct($"l_orderkey").as("exact_orders"),
        expr("percentile(l_quantity, 0.5)").as("exact_p50_qty"),
        approx_count_distinct($"l_partkey").as("ap"),
        approx_count_distinct($"l_orderkey").as("ao"),
        approx_percentile($"l_quantity", lit(0.5), lit(1000)).as("ap50"))
      .select($"exact_parts", $"exact_orders", round($"exact_p50_qty", 2).as("exact_p50_qty"),
        (abs($"ap" - $"exact_parts") / $"exact_parts" <= 0.1).as("hll_parts_ok"),
        (abs($"ao" - $"exact_orders") / $"exact_orders" <= 0.1).as("hll_orders_ok"),
        (abs($"ap50" - $"exact_p50_qty") / $"exact_p50_qty" <= 0.05).as("pctl_p50_ok"))
  }

  private def oracleApproxSketches: String =
    """SELECT count(DISTINCT l_partkey) AS exact_parts,
      |  count(DISTINCT l_orderkey) AS exact_orders,
      |  round(quantile_cont(l_quantity, 0.5), 2) AS exact_p50_qty,
      |  TRUE AS hll_parts_ok, TRUE AS hll_orders_ok, TRUE AS pctl_p50_ok
      |FROM lineitem""".stripMargin

  /** CDC apply (S28/P11's end state): fold an ordered change stream into
    * final table state — last writer wins per key, `error` events act as
    * deletes. One shuffle + one sort per key; the MERGE-INTO batch shape.
    */
  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    Tables.load(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"event_type" =!= "error") // last op wins; delete drops the key
      .select($"user_id", $"event_id".as("last_event_id"),
        $"event_type".as("last_op"), round($"value", 4).as("value"))
      .orderBy($"user_id")
  }

  private def oracleCdc: String =
    s"""WITH e AS ($eventsUsSql),
       |r AS (SELECT *, row_number() OVER (
       |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM e)
       |SELECT user_id, event_id AS last_event_id, event_type AS last_op,
       |  round(value, 4) AS value
       |FROM r WHERE rn = 1 AND event_type <> 'error'
       |ORDER BY user_id""".stripMargin

  /** Point-in-time reconstruction (q110): the time-travel read over a
    * CDC stream — per-key state AS OF each of three snapshot instants
    * (quartiles of the observed time range, derived deterministically
    * from the data on both engines). The as-of list is O(1) and rides
    * a broadcast; per instant the state is "last non-error op wins"
    * exactly as q60 defines it, so one keyed (instant, user) window
    * shuffle reconstructs all snapshots in a single pass — the batch
    * equivalent of replaying a binlog to three checkpoints without
    * replaying it three times.
    */
  def pointInTime(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.load(spark, dir, "events")
    val asofs = e.agg(unix_micros(min($"ts")).as("lo"), unix_micros(max($"ts")).as("hi"))
      .select(explode(array(lit(1), lit(2), lit(3))).as("k"), $"lo", $"hi")
      .select($"k".cast("long").as("k"), expr("lo + div((hi - lo) * k, 4)").as("as_of_us"))
    val w = Window.partitionBy($"k", $"user_id").orderBy($"ts".desc, $"event_id".desc)
    e.crossJoin(broadcast(asofs))
      .filter(unix_micros($"ts") <= $"as_of_us")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"event_type" =!= "error")
      .select($"k", $"as_of_us", $"user_id", $"event_id".as("last_event_id"),
        $"event_type".as("last_op"), round($"value", 4).as("value"))
      .orderBy($"k", $"user_id")
  }

  private def oraclePointInTime: String =
    s"""WITH e AS ($eventsUsSql),
       |b AS (SELECT epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi FROM e),
       |a AS (
       |  SELECT k, lo + (hi - lo) * k // 4 AS as_of_us
       |  FROM b CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)),
       |f AS (SELECT a.k, a.as_of_us, e.* FROM e JOIN a ON epoch_us(e.ts) <= a.as_of_us),
       |r AS (SELECT *, row_number() OVER (
       |        PARTITION BY k, user_id ORDER BY ts DESC, event_id DESC) AS rn FROM f)
       |SELECT k::BIGINT AS k, as_of_us, user_id, event_id AS last_event_id,
       |  event_type AS last_op, round(value, 4) AS value
       |FROM r WHERE rn = 1 AND event_type <> 'error'
       |ORDER BY k, user_id""".stripMargin

  /** SCD2 effective-dated dimension reconstruction (q115): fold the CDC
    * event stream into a slowly-changing-dimension type-2 history — one
    * version row per change, with [valid_from, valid_to) intervals
    * derived in ONE keyed window pass (valid_to = lead(ts) over the
    * key's op sequence; NULL = open-ended). `error` ops are deletes: the
    * tombstone's timestamp closes the predecessor's interval but emits
    * no version row, so a deleted key has no current version — the same
    * delete semantics as q60/q110. An as-of lookup (the mid-range
    * instant, derived deterministically from the data as q110 does) is
    * demonstrated in the same result via the half-open interval
    * predicate — the standard SCD2 point query, here a broadcast scalar
    * against the history. Scale shape: exactly one shuffle (the per-key
    * window); version ordering ties break on event_id so the history is
    * total-ordered and engine-independent.
    */
  /** The version-derivation core shared by q115 and the q116
    * incremental apply: every op's timestamp participates in interval
    * closing (lead over ALL ops — that is how a tombstone closes its
    * predecessor), but version numbers count only NON-delete ops (a
    * running conditional sum in the same window pass), so they are
    * reconstructible incrementally — a key's next version = its
    * all-time version-row count, something a stored SCD2 table knows
    * without replaying tombstones.
    */
  private[graft] def scd2Versions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("valid_from_us"), col("event_id"))
    events.select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value"), 4).as("value"),
        unix_micros(col("ts")).as("valid_from_us"))
      .withColumn("version",
        sum(when(col("event_type") =!= "error", 1L).otherwise(0L)).over(w))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .filter(col("event_type") =!= "error")
      .select(col("user_id"), col("version"), col("event_id"),
        col("event_type").as("op"), col("value"),
        col("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
  }

  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.load(spark, dir, "events")
    val asof = e.agg(expr("(unix_micros(min(ts)) + unix_micros(max(ts))) div 2").as("asof_us"))
    scd2Versions(e)
      .crossJoin(broadcast(asof))
      .select($"user_id", $"version", $"event_id", $"op", $"value",
        $"valid_from_us", $"valid_to_us", $"is_current",
        ($"valid_from_us" <= $"asof_us" &&
          ($"valid_to_us".isNull || $"valid_to_us" > $"asof_us")).as("asof_hit"))
      .orderBy($"user_id", $"version")
  }

  /** Shared CTE body rendering [[scd2Versions]] over CTE `e` (the µs
    * event view): yields `v` with the q115/q116 version columns.
    */
  private def scd2VersionsSql: String =
    """v AS (
      |  SELECT user_id, event_id, event_type, round(value, 4) AS value,
      |    epoch_us(ts) AS valid_from_us,
      |    sum(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END) OVER
      |      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version,
      |    lead(epoch_us(ts)) OVER w AS valid_to_us
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))""".stripMargin

  private def oracleScd2: String =
    s"""WITH e AS ($eventsUsSql),
       |b AS (SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS asof_us FROM e),
       |$scd2VersionsSql
       |SELECT user_id, version::BIGINT AS version, event_id, event_type AS op, value,
       |  valid_from_us, valid_to_us,
       |  valid_to_us IS NULL AS is_current,
       |  (valid_from_us <= b.asof_us AND
       |    (valid_to_us IS NULL OR valid_to_us > b.asof_us)) AS asof_hit
       |FROM v CROSS JOIN b WHERE event_type <> 'error'
       |ORDER BY user_id, version""".stripMargin

  /** Incremental SCD2 apply (q116): merge a new CDC batch into an
    * existing SCD2 table WITHOUT rebuilding untouched keys — the
    * operational companion to q115's batch derivation. The stored
    * history (here rebuilt from the first 70% of the time range as a
    * stand-in; on a cluster it is a table) splits three ways:
    * untouched keys pass through an anti-join byte-identical; touched
    * keys get their open interval closed at their first batch event's
    * instant (any op type — that is how a tombstone closes, exactly as
    * `lead` over all ops does in the rebuild); new version rows come
    * from one window pass over the batch alone, numbered from the
    * key's stored max version (valid because q115 versions count only
    * non-delete ops — a stored table knows its next version number
    * without replaying tombstones). Cost ∝ batch size + touched-key
    * history, never corpus size. The ORACLE is the full rebuild over
    * all events: incremental apply ≡ rebuild is value-hash-proven,
    * the property that makes an incremental maintenance path safe to
    * trust at 100 TB.
    */
  def scd2Apply(spark: SparkSession, dir: String): DataFrame =
    scd2ApplyEvents(Tables.load(spark, dir, "events"), 7, 10)

  /** [[scd2Apply]]'s core over an arbitrary event frame and cutoff
    * fraction (numerator/denominator of the time range) — parameterized
    * so the property spec can drive it with random streams and cuts.
    */
  private[operators] def scd2ApplyEvents(e: DataFrame, cutNum: Int, cutDen: Int): DataFrame = {
    import e.sparkSession.implicits._
    val cut = e.agg(expr(
      s"unix_micros(min(ts)) + div((unix_micros(max(ts)) - unix_micros(min(ts))) * $cutNum, $cutDen)")
      .as("cut_us"))
    val withCut = e.withColumn("ts_us", unix_micros($"ts")).crossJoin(broadcast(cut))
    val old = withCut.filter($"ts_us" <= $"cut_us")
    val batch = withCut.filter($"ts_us" > $"cut_us")
    val hist = scd2Versions(old.select(e.columns.map(col): _*)) // the "stored" table
    scd2Merge(hist, batch)
  }

  /** The (stored history, CDC batch) merge core of q116, factored so the
    * streaming apply ([[graft.streaming.StreamingJobs.scd2ApplyStream]])
    * can drive it per micro-batch with the stored SCD2 table as state.
    * `hist` carries [[scd2Versions]] columns; `batch` carries raw CDC
    * events plus `ts_us`. Assumes batch events land at-or-after the
    * touched keys' open intervals (per-key commit order — what a CDC
    * stream delivers); a late event needs the rebuild path.
    */
  private[graft] def scd2Merge(hist: DataFrame, batch: DataFrame): DataFrame = {
    import hist.sparkSession.implicits._
    val touched = batch.select($"user_id").distinct()
    // every batch-derived side (touched keys, per-key first-instant and
    // base-version lookups) is batch-sized — broadcast them so the
    // stored history streams through the anti/semi joins un-shuffled,
    // the shape that keeps apply cost ∝ batch at 100 TB
    val untouched = hist.join(broadcast(touched), Seq("user_id"), "left_anti")
    val histT = hist.join(broadcast(touched), Seq("user_id"), "left_semi")
    val firstNew = batch.groupBy($"user_id")
      .agg(min(struct($"ts_us", $"event_id")).as("fn"))
      .select($"user_id", $"fn.ts_us".as("first_new_us"))
    val baseV = histT.groupBy($"user_id").agg(max($"version").as("base_v"))
    val closedOld = histT.join(broadcast(firstNew), "user_id")
      .withColumn("valid_to_us",
        when($"is_current", $"first_new_us").otherwise($"valid_to_us"))
      .withColumn("is_current", $"valid_to_us".isNull)
      .select(hist.columns.map(col): _*)
    val wB = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val newRows = batch
      .withColumn("vinc", sum(when($"event_type" =!= "error", 1L).otherwise(0L)).over(wB))
      .withColumn("valid_to_us", lead($"ts_us", 1).over(wB))
      .filter($"event_type" =!= "error")
      .join(broadcast(baseV), Seq("user_id"), "left")
      .select($"user_id", (coalesce($"base_v", lit(0L)) + $"vinc").as("version"),
        $"event_id", $"event_type".as("op"), round($"value", 4).as("value"),
        $"ts_us".as("valid_from_us"), $"valid_to_us",
        $"valid_to_us".isNull.as("is_current"))
    untouched.union(closedOld).union(newRows).orderBy($"user_id", $"version")
  }

  private def oracleScd2Apply: String =
    s"""WITH e AS ($eventsUsSql),
       |$scd2VersionsSql
       |SELECT user_id, version::BIGINT AS version, event_id, event_type AS op, value,
       |  valid_from_us, valid_to_us, valid_to_us IS NULL AS is_current
       |FROM v WHERE event_type <> 'error'
       |ORDER BY user_id, version""".stripMargin

  /** Referential-integrity audit (q112): orphan rates for every FK
    * edge of the schema (lineitem→orders, orders→customer,
    * customer→nation, events→customer) — the post-migration
    * verification a data-movement engine owes its users alongside the
    * q108 row diff. Each edge is one left-anti join against the
    * distinct parent key set (parent sides are dimension-sized →
    * broadcast; the fact side never shuffles), aggregated to a
    * one-row-per-edge report.
    */
  def refIntegrity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // one pass per edge: left join against the distinct parent keys and
    // count total + misses in the same agg (a count() + anti-join count()
    // formulation would scan every child table twice, eagerly)
    def edge(name: String, child: DataFrame, fk: String,
             parent: DataFrame, pk: String): DataFrame =
      child.select(col(fk).as("k"))
        .join(broadcast(parent.select(col(pk).as("k"), lit(1).as("__hit")).distinct()),
          Seq("k"), "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("n_orphan"))
        .select(lit(name).as("fk_edge"), col("n_child"), col("n_orphan"))
    val edges = Seq(
      edge("lineitem.l_orderkey->orders", Tables.load(spark, dir, "lineitem"),
        "l_orderkey", Tables.load(spark, dir, "orders"), "o_orderkey"),
      edge("orders.o_custkey->customer", Tables.load(spark, dir, "orders"),
        "o_custkey", Tables.load(spark, dir, "customer"), "c_custkey"),
      edge("customer.c_nationkey->nation", Tables.load(spark, dir, "customer"),
        "c_nationkey", Tables.load(spark, dir, "nation"), "n_nationkey"),
      edge("events.user_id->customer", Tables.load(spark, dir, "events"),
        "user_id", Tables.load(spark, dir, "customer"), "c_custkey"))
    edges.reduce(_.unionAll(_))
      .select($"fk_edge", $"n_child", $"n_orphan",
        round($"n_orphan" / $"n_child", 6).as("orphan_rate"))
      .orderBy($"fk_edge")
  }

  private def oracleRefIntegrity: String = {
    def edge(name: String, child: String, fk: String, parent: String, pk: String) =
      s"""SELECT '$name' AS fk_edge,
         |  (SELECT count(*) FROM $child)::BIGINT AS n_child,
         |  (SELECT count(*) FROM $child c
         |   WHERE NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pk = c.$fk))::BIGINT AS n_orphan""".stripMargin
    val edges = Seq(
      edge("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      edge("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      edge("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      edge("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
    ).mkString("\nUNION ALL\n")
    s"""SELECT fk_edge, n_child, n_orphan,
       |  round(n_orphan::DOUBLE / n_child, 6) AS orphan_rate
       |FROM ($edges)
       |ORDER BY fk_edge""".stripMargin
  }

  /** Daily event-count anomaly detection (q114): the q103 median/MAD
    * robust-z machinery applied to the per-type daily time series —
    * spike/outage detection over pipeline telemetry. Two exact
    * percentile passes over an already-aggregated (type, day) table
    * (O(types × days) rows — the expensive part is the one daily
    * rollup shuffle, same as q15), stats broadcast back, map-side
    * flagging. Degenerate MAD=0 series yield NULL z via nullif.
    */
  def eventAnomalies(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.load(spark, dir, "events")
      .groupBy(date_trunc("day", $"ts").cast("date").as("day"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val med = daily.groupBy($"event_type")
      .agg(percentile($"n", lit(0.5)).as("med"))
    val stats = daily.join(broadcast(med), "event_type")
      .withColumn("adev", abs($"n" - $"med"))
      .groupBy($"event_type")
      .agg(max($"med").as("med"), percentile($"adev", lit(0.5)).as("mad"))
    val z = ($"n" - $"med") / (lit(1.4826) * nullif($"mad", lit(0.0)))
    daily.join(broadcast(stats), "event_type")
      .select($"event_type", $"day", $"n",
        round($"med", 4).as("med"), round($"mad", 4).as("mad"),
        round(z, 4).as("robust_z"),
        (z > 3.0).as("is_spike"))
      .orderBy($"event_type", $"day")
  }

  private def oracleEventAnomalies: String =
    s"""WITH e AS ($eventsUsSql),
       |daily AS (
       |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, count(*) AS n
       |  FROM e GROUP BY 1, 2),
       |med AS (
       |  SELECT event_type, quantile_cont(n, 0.5) AS med FROM daily GROUP BY event_type),
       |stats AS (
       |  SELECT d.event_type, max(m.med) AS med,
       |    quantile_cont(abs(d.n - m.med), 0.5) AS mad
       |  FROM daily d JOIN med m ON m.event_type = d.event_type GROUP BY d.event_type)
       |SELECT d.event_type, d.day, d.n::BIGINT AS n,
       |  round(s.med, 4) AS med, round(s.mad, 4) AS mad,
       |  round((d.n - s.med) / (1.4826 * nullif(s.mad, 0)), 4) AS robust_z,
       |  (d.n - s.med) / (1.4826 * nullif(s.mad, 0)) > 3.0 AS is_spike
       |FROM daily d JOIN stats s ON s.event_type = d.event_type
       |ORDER BY d.event_type, d.day""".stripMargin

  /** Salted skew join (q80): the [[SkewJoin.saltedJoin]] lever run as
    * an oracle-gated query — events (the skew-prone fact) joined to
    * customer over (key, salt), then aggregated by segment. The oracle
    * is the PLAIN join: salting must be invisible in the result, and
    * the value-exact compare proves it (no row loss, no duplication,
    * salt column dropped).
    */
  def saltedJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val customer = Tables.load(spark, dir, "customer")
    SkewJoin.saltedJoin(events, customer, "user_id", "c_custkey", salts = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("c_mktsegment"))
  }

  private def oracleSalted: String =
    """SELECT c_mktsegment, count(*) AS n_events,
      |  round(sum(value), 2) AS total_value
      |FROM events JOIN customer ON c_custkey = user_id
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Top-k per key via the custom [[graft.plans.TopKPerKey]] physical
    * operator (q82): bounded heap per key instead of Exchange + full
    * Sort + Window — O(n log k), no sort buffer. The oracle is the
    * window formulation, proving the custom operator's semantics
    * value-exactly (output compared as (key, value) rows, which ties
    * cannot perturb).
    */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    graft.plans.TopKPerKey(orders, Seq("o_custkey"), col("o_totalprice"), 3)
      .select(col("o_custkey"), round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("o_custkey"), col("price").desc)
  }

  private def oracleTopOrders: String =
    """SELECT o_custkey, round(o_totalprice, 2) AS price FROM (
      |  SELECT o_custkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, price DESC""".stripMargin

  /** Rank-with-ties top-k (q127): the `rank() <= k` idiom — keep the
    * top k rows per key AND every row tied with the k-th — spelled as
    * the plain window ON PURPOSE: [[graft.plans.TopKWindowRewriteRule]]
    * rewrites it onto [[graft.plans.TopKPerKeyNode]] in keep-ties mode
    * (bounded heap + threshold-tie buffer under the window), so map
    * tasks ship ≤ k + ties rows per key instead of whole partitions
    * through a sort. Here: the most recent orders per priority class —
    * order dates are coarse (≈1 order/priority/date at sf0.01, dozens
    * at sf1+), so the tie tail is REAL and grows with scale, exactly
    * the case where `row_number` would silently drop same-day orders.
    * The `coalesce` to a sentinel date makes the order expression
    * non-nullable — rank mode requires it (all nulls tie, so a bounded
    * null completion can't reproduce `rank <= k`); on this data the
    * coalesce is an identity. rank() is int32 in Spark → cast BIGINT
    * both sides.
    */
  def latestOrdersPerPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.load(spark, dir, "orders")
    // the sentinel must be a LITERAL of the column's exact type
    // (timestamp_ntz): a cast would be fallible → nullable, and the
    // nullability guard would (correctly) refuse the rank rewrite
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy(coalesce($"o_orderdate",
        lit(java.time.LocalDateTime.of(1900, 1, 1, 0, 0))).desc)
    orders.withColumn("rk", rank().over(w))
      .filter($"rk" <= 3)
      .select($"o_orderpriority", $"o_orderkey", $"o_orderdate",
        $"rk".cast("long").as("rk"))
      .orderBy($"o_orderpriority", $"rk", $"o_orderkey")
  }

  private def oracleLatestOrders: String =
    """SELECT o_orderpriority, o_orderkey, o_orderdate, rk FROM (
      |  SELECT o_orderpriority, o_orderkey, o_orderdate,
      |    CAST(rank() OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate DESC) AS BIGINT) AS rk
      |  FROM orders) t
      |WHERE rk <= 3 ORDER BY o_orderpriority, rk, o_orderkey""".stripMargin

  /** Dense-rank top-k (q129): ALL orders from the 2 most recent
    * DISTINCT order dates per priority — the "top-k value classes"
    * idiom `dense_rank() <= k`, auto-rewritten onto
    * [[graft.plans.TopKPerKeyNode]]'s DENSE mode (a bounded heap of k
    * distinct values, each carrying its whole row class, so map tasks
    * ship only the rows of locally-top-k values instead of whole
    * partitions through a sort). `rank` (q127) would cut a date class
    * in half when the newest date alone exceeds k rows; dense_rank is
    * the form that means "the last k DAYS", not "the last k orders".
    * Same non-nullable sentinel requirement as q127.
    */
  def latestDatesPerPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy(coalesce($"o_orderdate",
        lit(java.time.LocalDateTime.of(1900, 1, 1, 0, 0))).desc)
    orders.withColumn("dr", dense_rank().over(w))
      .filter($"dr" <= 2)
      .select($"o_orderpriority", $"o_orderkey", $"o_orderdate",
        $"dr".cast("long").as("dr"))
      .orderBy($"o_orderpriority", $"dr", $"o_orderkey")
  }

  private def oracleLatestDates: String =
    """SELECT o_orderpriority, o_orderkey, o_orderdate, dr FROM (
      |  SELECT o_orderpriority, o_orderkey, o_orderdate,
      |    CAST(dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate DESC) AS BIGINT) AS dr
      |  FROM orders) t
      |WHERE dr <= 2 ORDER BY o_orderpriority, dr, o_orderkey""".stripMargin

  /** Unpivot / melt (q107): the wide daily matrix from [[pivotDaily]]
    * stacked back to long (day, event_type, n) form — the inverse
    * reshape every reporting pipeline needs in both directions. Spark
    * side uses the native `unpivot` (STACK) operator on the q39 result,
    * dropping zero-count cells so the round trip reproduces exactly the
    * observed (day, type) pairs; map-side only on top of q39's agg.
    */
  def unpivotDaily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pivotDaily(spark, dir)
      .unpivot(Array($"day"), EventTypes.map(t => col(s"n_$t")).toArray,
        "event_type", "n")
      .withColumn("event_type", expr("substring(event_type, 3)"))
      .filter($"n" > 0)
      .orderBy($"day", $"event_type")
  }

  private def oracleUnpivot: String =
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |  event_type, count(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  /** Snapshot diff (q108): the verification operator a migration engine
    * owes its users — given two keyed snapshots, classify every key as
    * added / removed / changed by comparing a deterministic row
    * fingerprint, full-outer-joined on the key (one shuffle each side,
    * nothing row²). Here the two snapshots are derived views of
    * `orders` (old = keys with hash%10 ∉ {2}; new = keys with hash%10 ∉
    * {0}, prices bumped on hash%10 = 1), so both engines build
    * byte-identical inputs; the fingerprint hashes only
    * stably-rendered columns (strings and a cents-scaled BIGINT — no
    * float-to-string formatting anywhere).
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.load(spark, dir, "orders")
    val slot = pmod($"o_orderkey", lit(10))
    // decimal, not double: double→long CASt truncates in Spark but
    // rounds in DuckDB; decimal(18,2)*100 is exact in both engines
    def fp(price: org.apache.spark.sql.Column) = md5(concat_ws("|",
      $"o_orderstatus", $"o_orderpriority",
      (price.cast("decimal(18,2)") * 100).cast("long").cast("string")))
    val old = orders.filter(slot =!= 2)
      .select($"o_orderkey", fp($"o_totalprice").as("fp_old"))
    val neu = orders.filter(slot =!= 0)
      .select($"o_orderkey",
        fp(when(slot === 1, $"o_totalprice" + 1.0).otherwise($"o_totalprice")).as("fp_new"))
    old.join(neu, Seq("o_orderkey"), "full_outer")
      .withColumn("change",
        when($"fp_old".isNull, "added")
          .when($"fp_new".isNull, "removed")
          .when($"fp_old" =!= $"fp_new", "changed")
          .otherwise("same"))
      .filter($"change" =!= "same")
      .select($"o_orderkey", $"change")
      .orderBy($"o_orderkey")
  }

  private def oracleSnapshotDiff: String =
    """WITH o AS (
      |  SELECT o_orderkey, o_orderkey % 10 AS slot, o_orderstatus,
      |         o_orderpriority, o_totalprice
      |  FROM orders),
      |old AS (
      |  SELECT o_orderkey, md5(o_orderstatus || '|' || o_orderpriority || '|' ||
      |    CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR)) AS fp_old
      |  FROM o WHERE slot <> 2),
      |neu AS (
      |  SELECT o_orderkey, md5(o_orderstatus || '|' || o_orderpriority || '|' ||
      |    CAST(CAST(CAST((CASE WHEN slot = 1 THEN o_totalprice + 1.0 ELSE o_totalprice END) AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR)) AS fp_new
      |  FROM o WHERE slot <> 0)
      |SELECT coalesce(old.o_orderkey, neu.o_orderkey) AS o_orderkey,
      |  CASE WHEN old.o_orderkey IS NULL THEN 'added'
      |       WHEN neu.o_orderkey IS NULL THEN 'removed'
      |       WHEN fp_old <> fp_new THEN 'changed'
      |       ELSE 'same' END AS change
      |FROM old FULL OUTER JOIN neu ON neu.o_orderkey = old.o_orderkey
      |WHERE (CASE WHEN old.o_orderkey IS NULL THEN 'added'
      |       WHEN neu.o_orderkey IS NULL THEN 'removed'
      |       WHEN fp_old <> fp_new THEN 'changed'
      |       ELSE 'same' END) <> 'same'
      |ORDER BY o_orderkey""".stripMargin

  /** Weekly retention cohorts (q106): users grouped by first-active
    * week; the (cohort, week-offset) matrix of distinct active users
    * with retention rates — the standard product-analytics rollup. Two
    * keyed aggs (per-user cohort, then per-cell distinct count) and a
    * broadcast-sized cohort-size join; nothing is user², and the
    * distinct count shuffles on (cohort, offset, user) exactly once.
    * Week truncation lands on Monday in both engines.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
      .select($"user_id", date_trunc("week", $"ts").cast("date").as("wk"))
    val cohort = ev.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
    val matrix = ev.join(cohort, "user_id")
      .withColumn("offset_wk", floor(datediff($"wk", $"cohort_wk") / 7).cast("long"))
      .groupBy($"cohort_wk", $"offset_wk")
      .agg(countDistinct($"user_id").as("n_active"))
    val sizes = cohort.groupBy($"cohort_wk").agg(count(lit(1)).as("cohort_n"))
    matrix.join(sizes, "cohort_wk")
      .select($"cohort_wk", $"offset_wk", $"n_active", $"cohort_n",
        round($"n_active" / $"cohort_n", 6).as("retention"))
      .orderBy($"cohort_wk", $"offset_wk")
  }

  private def oracleRetention: String =
    """WITH e AS (
      |  SELECT user_id,
      |    date_trunc('week', make_timestamp(epoch_ns(ts) // 1000))::DATE AS wk
      |  FROM events),
      |c AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id),
      |j AS (
      |  SELECT e.user_id, c.cohort_wk, (e.wk - c.cohort_wk) // 7 AS offset_wk
      |  FROM e JOIN c USING (user_id)),
      |m AS (
      |  SELECT cohort_wk, offset_wk, count(DISTINCT user_id) AS n_active
      |  FROM j GROUP BY cohort_wk, offset_wk),
      |s AS (SELECT cohort_wk, count(*) AS cohort_n FROM c GROUP BY cohort_wk)
      |SELECT m.cohort_wk, m.offset_wk::BIGINT AS offset_wk,
      |  m.n_active::BIGINT AS n_active, s.cohort_n::BIGINT AS cohort_n,
      |  round(m.n_active::DOUBLE / s.cohort_n, 6) AS retention
      |FROM m JOIN s ON s.cohort_wk = m.cohort_wk
      |ORDER BY m.cohort_wk, m.offset_wk""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q106_retention_cohorts" -> (retentionCohorts _),
    "q107_unpivot_daily" -> (unpivotDaily _),
    "q108_snapshot_diff" -> (snapshotDiff _),
    "q110_point_in_time" -> (pointInTime _),
    "q115_scd2_history" -> (scd2History _),
    "q116_scd2_apply" -> (scd2Apply _),
    "q112_ref_integrity" -> (refIntegrity _),
    "q114_event_anomalies" -> (eventAnomalies _),
    "q82_topk_per_key" -> (topOrdersPerCustomer _),
    "q127_topk_rank_ties" -> (latestOrdersPerPriority _),
    "q129_topk_dense_rank" -> (latestDatesPerPriority _),
    "q80_salted_join" -> (saltedJoinAgg _),
    "q60_cdc_apply" -> (cdcApply _),
    "q32_semi_join" -> (semiJoin _),
    "q33_anti_join" -> (antiJoin _),
    "q34_rollup" -> (rollupAgg _),
    "q35_grouping_sets" -> (groupingSets _),
    "q36_window_running" -> (windowRunning _),
    "q37_asof_join" -> (asofJoin _),
    "q38_range_join_funnel" -> (rangeJoinFunnel _),
    "q39_pivot_daily" -> (pivotDaily _),
    "q40_percentiles" -> (percentiles _),
    "q41_histogram" -> (histogram _),
    "q42_sessionize" -> (sessionize _),
    "q43_approx_sketches" -> (approxSketches _),
    "q44_session_window" -> (sessionWindowBatch _),
  )

  val oracles: Map[String, String] = Map(
    "q106_retention_cohorts" -> oracleRetention,
    "q107_unpivot_daily" -> oracleUnpivot,
    "q108_snapshot_diff" -> oracleSnapshotDiff,
    "q110_point_in_time" -> oraclePointInTime,
    "q115_scd2_history" -> oracleScd2,
    "q116_scd2_apply" -> oracleScd2Apply,
    "q112_ref_integrity" -> oracleRefIntegrity,
    "q114_event_anomalies" -> oracleEventAnomalies,
    "q82_topk_per_key" -> oracleTopOrders,
    "q127_topk_rank_ties" -> oracleLatestOrders,
    "q129_topk_dense_rank" -> oracleLatestDates,
    "q80_salted_join" -> oracleSalted,
    "q60_cdc_apply" -> oracleCdc,
    "q32_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q33_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q34_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q35_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q36_window_running" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        |  row_number() OVER w AS seq,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS UNBOUNDED PRECEDING), 2) AS running_spend,
        |  date_diff('day', lag(o_orderdate) OVER w, o_orderdate)::BIGINT AS days_since_prev
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, seq""".stripMargin,
    "q37_asof_join" -> oracleAsof,
    "q38_range_join_funnel" -> oracleRangeJoin,
    "q39_pivot_daily" -> oraclePivot,
    "q40_percentiles" -> oraclePercentiles,
    "q41_histogram" -> oracleHistogram,
    "q42_sessionize" -> oracleSessionize,
    "q43_approx_sketches" -> oracleApproxSketches,
    "q44_session_window" -> oracleSessionWindow,
  )
}
