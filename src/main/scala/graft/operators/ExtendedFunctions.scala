package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar/analytic function coverage beyond the reference (§2.3 lists
  * its thin scalar surface — trim/md5/json/epoch). Everything here is a
  * map-only Column pipeline or a single-shuffle analytic, each with an
  * exact DuckDB oracle.
  */
object ExtendedFunctions {

  /** String-function battery over customer names. */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .select(
        $"c_custkey",
        upper($"c_mktsegment").as("seg_up"),
        lpad($"c_custkey".cast("string"), 6, "0").as("key_pad"),
        translate($"c_name", "#0", "-x").as("name_tr"),
        reverse($"c_mktsegment").as("seg_rev"),
        repeat(substring($"c_mktsegment", 1, 2), 2).as("seg_rep"),
        element_at(split($"c_name", "#"), 2).as("name_num"))
      .orderBy($"c_custkey")
  }

  private val oracleStringFuncs =
    """SELECT c_custkey,
      |  upper(c_mktsegment) AS seg_up,
      |  lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS key_pad,
      |  translate(c_name, '#0', '-x') AS name_tr,
      |  reverse(c_mktsegment) AS seg_rev,
      |  repeat(substr(c_mktsegment, 1, 2), 2) AS seg_rep,
      |  split_part(c_name, '#', 2) AS name_num
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Regex extraction: numeric id out of the name, verified against the
    * key (a data-quality assertion as a query).
    */
  def regexpExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .select(
        $"c_custkey",
        regexp_extract($"c_name", "([0-9]+)$", 1).cast("long").as("extracted"),
        (regexp_extract($"c_name", "([0-9]+)$", 1).cast("long") === $"c_custkey").as("id_matches"))
      .orderBy($"c_custkey")
  }

  private val oracleRegexpExtract =
    """SELECT c_custkey,
      |  CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS extracted,
      |  CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) = c_custkey AS id_matches
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Edit-distance fuzzy matching (the dedup-adjacent string metric):
    * same-brand part pairs with small key distance, scored by
    * levenshtein on names. The brand block + key-window keeps the pair
    * space linear (the blocking pattern every fuzzy-join needs at scale).
    */
  def fuzzyLevenshtein(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.load(spark, dir, "part").select($"p_partkey", $"p_name", $"p_brand")
    // Blocking must be IN the equi-key: brand alone leaves ~(n/brands)²
    // levenshtein evals. A key-bucket join key (a-side exploded to its
    // bucket and the next, since b-a ≤ 2 can cross one boundary) makes
    // the join selective; brand/range/distance filter the tiny bucket
    // pairs after.
    val a = p.toDF("a_key", "a_name", "brand")
      .withColumn("bucket", explode(array(floor($"a_key" / 4), floor($"a_key" / 4) + 1)))
    val b = p.toDF("b_key", "b_name", "brand2")
      .withColumn("bucket2", floor($"b_key" / 4))
    a.join(b, $"bucket" === $"bucket2" && $"brand" === $"brand2" &&
        $"a_key" < $"b_key" && $"b_key" - $"a_key" <= 2)
      .select($"a_key", $"b_key", $"brand",
        levenshtein($"a_name", $"b_name").cast("long").as("dist"))
      .filter($"dist" <= 6)
      .orderBy($"a_key", $"b_key")
  }

  private val oracleFuzzy =
    """SELECT a.p_partkey AS a_key, b.p_partkey AS b_key, a.p_brand AS brand,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      |FROM part a JOIN part b
      |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      |  AND b.p_partkey - a.p_partkey <= 2
      |WHERE levenshtein(a.p_name, b.p_name) <= 6
      |ORDER BY a_key, b_key""".stripMargin

  /** Distribution analytics: quartile bucket, percent_rank, cume_dist
    * per order status — one shuffle, one sort, three functions.
    */
  def windowStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderstatus").orderBy($"o_totalprice", $"o_orderkey")
    Tables.load(spark, dir, "orders")
      .select(
        $"o_orderstatus", $"o_orderkey",
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy($"o_orderstatus", $"o_orderkey")
  }

  private val oracleWindowStats =
    """SELECT o_orderstatus, o_orderkey,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderstatus, o_orderkey""".stripMargin

  /** RANGE frame over event time: 30-day trailing spend per customer —
    * the moving-window aggregate (frame bounds in value space, not rows).
    */
  def rangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val days30 = 30L * 24 * 3600
    val w = Window.partitionBy($"o_custkey")
      .orderBy(unix_timestamp($"o_orderdate"))
      .rangeBetween(-days30, 0)
    Tables.load(spark, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_orderdate".cast("date").as("o_date"),
        round(sum($"o_totalprice").over(w), 2).as("trailing_30d"))
      .orderBy($"o_custkey", $"o_date", $"o_orderkey")
  }

  private val oracleRangeFrame =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
      |  round(sum(o_totalprice) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate
      |    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW), 2) AS trailing_30d
      |FROM orders ORDER BY o_custkey, o_date, o_orderkey""".stripMargin

  /** Sorted array aggregation rendered as a string (engine-portable
    * array compare).
    */
  def arrayAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "supplier")
      .groupBy($"s_nationkey")
      .agg(
        count(lit(1)).as("n"),
        concat_ws(",", sort_array(collect_list($"s_suppkey"))).as("supp_keys"))
      .orderBy($"s_nationkey")
  }

  private val oracleArrayAgg =
    """SELECT s_nationkey, count(*) AS n,
      |  array_to_string(list_sort(list(s_suppkey)), ',') AS supp_keys
      |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  /** Struct → JSON rendering (no nulls: Spark omits null fields,
    * DuckDB keeps them — documented divergence avoided by contract).
    */
  def structJson(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "nation")
      .select($"n_nationkey",
        to_json(struct($"n_name".as("name"), $"n_regionkey".as("region"))).as("doc"))
      .orderBy($"n_nationkey")
  }

  private val oracleStructJson =
    """SELECT n_nationkey,
      |  to_json(struct_pack(name := n_name, region := n_regionkey)) AS doc
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** Conditional aggregation: FILTER-style metrics in one pass. */
  def conditionalAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .groupBy($"o_orderstatus")
      .agg(
        count(when($"o_orderpriority" === "1-URGENT", 1)).as("n_urgent"),
        count(when($"o_totalprice" > 300000, 1)).as("n_big"),
        round(sum(when($"o_orderpriority" === "1-URGENT", $"o_totalprice").otherwise(0.0)), 2)
          .as("urgent_total"))
      .orderBy($"o_orderstatus")
  }

  private val oracleConditionalAgg =
    """SELECT o_orderstatus,
      |  count(*) FILTER (o_orderpriority = '1-URGENT') AS n_urgent,
      |  count(*) FILTER (o_totalprice > 300000) AS n_big,
      |  round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END), 2)
      |    AS urgent_total
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Correlated scalar subquery — Catalyst decorrelates it into a join;
    * the same SQL text runs on both engines.
    */
  def correlatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "customer").createOrReplaceTempView("graft_cust_sub")
    Tables.load(spark, dir, "orders").createOrReplaceTempView("graft_ord_sub")
    spark.sql(
      """SELECT c_custkey, c_mktsegment
        |FROM graft_cust_sub c
        |WHERE c_acctbal > (SELECT avg(o_totalprice) * 0.02 FROM graft_ord_sub o
        |                   WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  private val oracleCorrelated =
    """SELECT c_custkey, c_mktsegment
      |FROM customer c
      |WHERE c_acctbal > (SELECT avg(o_totalprice) * 0.02 FROM orders o
      |                   WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** TPC-H Q5-shaped multi-join: revenue per nation for one region —
    * the bench workhorse. Join order: broadcast the region→nation→
    * supplier dim chain, shuffle lineitem⨝orders once on the order key.
    */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val region = Tables.load(spark, dir, "region").filter($"r_name" === "ASIA")
    val nation = Tables.load(spark, dir, "nation")
    val supplier = Tables.load(spark, dir, "supplier")
    val orders = Tables.load(spark, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp"))
    val lineitem = Tables.load(spark, dir, "lineitem")
    lineitem
      .join(broadcast(supplier), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .join(orders, $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"revenue".desc, $"n_name")
  }

  private val oracleRevenue =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** Bitwise ops on keys (hash-partitioning arithmetic surface). */
  def bitwiseOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "nation")
      .select($"n_nationkey",
        ($"n_nationkey".bitwiseXOR($"n_regionkey")).cast("long").as("xor_v"),
        ($"n_nationkey".bitwiseAND(lit(7))).cast("long").as("and_v"),
        ($"n_nationkey".bitwiseOR(lit(16))).cast("long").as("or_v"),
        shiftleft($"n_nationkey", 2).cast("long").as("shl_v"))
      .orderBy($"n_nationkey")
  }

  private val oracleBitwise =
    """SELECT n_nationkey,
      |  CAST(xor(n_nationkey, n_regionkey) AS BIGINT) AS xor_v,
      |  CAST(n_nationkey & 7 AS BIGINT) AS and_v,
      |  CAST(n_nationkey | 16 AS BIGINT) AS or_v,
      |  CAST(n_nationkey << 2 AS BIGINT) AS shl_v
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): rows with
    * null keys MATCH each other — the semantics keyed dedup pipelines
    * need when null is a real key value.
    */
  def nullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.load(spark, dir, "orders")
      .select($"o_orderkey",
        when($"o_orderpriority" === "1-URGENT", $"o_orderpriority").as("prio"))
    val pri = Seq(("1-URGENT", 1L), (null.asInstanceOf[String], 0L)).toDF("p", "weight")
    orders.join(broadcast(pri), orders("prio") <=> pri("p"))
      .groupBy($"weight")
      .agg(count(lit(1)).as("n"))
      .orderBy($"weight")
  }

  private val oracleNullSafeJoin =
    """WITH o AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN o_orderpriority END AS prio
      |  FROM orders),
      |pri AS (SELECT * FROM (VALUES ('1-URGENT', 1), (NULL, 0)) t(p, weight))
      |SELECT weight::BIGINT AS weight, count(*) AS n
      |FROM o JOIN pri ON o.prio IS NOT DISTINCT FROM pri.p
      |GROUP BY 1 ORDER BY weight""".stripMargin

  /** Schema-full JSON parsing (`from_json` with a declared struct, vs
    * q14's path extraction): parse, validate, aggregate.
    */
  def fromJsonParse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .select($"event_type",
        from_json($"props", org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).as("p"))
      .select($"event_type", $"p.k".as("k"), $"p".isNotNull.as("parsed"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(when($"parsed", 1).otherwise(0)).as("n_parsed"),
        min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  private val oracleFromJson =
    """SELECT event_type, count(*) AS n,
      |  sum(CASE WHEN props IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_parsed,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Calendar rollup: month + quarter buckets (dow/week conventions
    * diverge across engines; month/quarter are safe).
    */
  def calendarRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .groupBy(
        year($"o_orderdate").cast("long").as("y"),
        quarter($"o_orderdate").cast("long").as("q"),
        month($"o_orderdate").cast("long").as("m"))
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
      .orderBy($"y", $"q", $"m")
  }

  private val oracleCalendar =
    """SELECT year(o_orderdate)::BIGINT AS y, quarter(o_orderdate)::BIGINT AS q,
      |  month(o_orderdate)::BIGINT AS m,
      |  count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY 1, 2, 3 ORDER BY y, q, m""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q63_null_safe_join" -> (nullSafeJoin _),
    "q64_from_json" -> (fromJsonParse _),
    "q65_calendar_rollup" -> (calendarRollup _),
    "q47_string_funcs" -> (stringFuncs _),
    "q48_regexp_extract" -> (regexpExtract _),
    "q49_fuzzy_levenshtein" -> (fuzzyLevenshtein _),
    "q50_window_stats" -> (windowStats _),
    "q51_range_frame" -> (rangeFrame _),
    "q52_array_agg" -> (arrayAgg _),
    "q53_struct_json" -> (structJson _),
    "q54_conditional_agg" -> (conditionalAgg _),
    "q55_correlated_subquery" -> (correlatedSubquery _),
    "q56_revenue_by_nation" -> (revenueByNation _),
    "q57_bitwise_ops" -> (bitwiseOps _),
  )

  val oracles: Map[String, String] = Map(
    "q63_null_safe_join" -> oracleNullSafeJoin,
    "q64_from_json" -> oracleFromJson,
    "q65_calendar_rollup" -> oracleCalendar,
    "q47_string_funcs" -> oracleStringFuncs,
    "q48_regexp_extract" -> oracleRegexpExtract,
    "q49_fuzzy_levenshtein" -> oracleFuzzy,
    "q50_window_stats" -> oracleWindowStats,
    "q51_range_frame" -> oracleRangeFrame,
    "q52_array_agg" -> oracleArrayAgg,
    "q53_struct_json" -> oracleStructJson,
    "q54_conditional_agg" -> oracleConditionalAgg,
    "q55_correlated_subquery" -> oracleCorrelated,
    "q56_revenue_by_nation" -> oracleRevenue,
    "q57_bitwise_ops" -> oracleBitwise,
  )
}
