package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface of the reference, re-expressed Spark-first.
  *
  * Each entry is a named query over the driver corpus with a DuckDB
  * oracle (see [[graft.SparkEntry.oracleSql]]). Coverage follows
  * SURVEY.md §2: scan/projection (S1, `d22d/utils/db/myutils.py:875-878`),
  * filters (`myutils.py:894-921`), the P9 merge join
  * (`d22d/task.py:183-328`), dedup P4 (`d22d/task.py:118-122`), limit P5,
  * count P6/S5, sorts/limits and set-op surface (§2.3).
  *
  * Scale notes: dimension joins are explicitly `broadcast()` (no shuffle
  * of the fact side); aggregations rely on partial map-side combine; all
  * filters/projections are Catalyst-pushed to the parquet scan.
  */
object RelationalQueries {

  /** S1/S26 projection + predicate: both pushed to the parquet scan by
    * Catalyst (verify via PushedFilters/ReadSchema in explain).
    */
  def scanProject(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .filter($"l_quantity" > 45.0)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** TPC-H Q1-style pricing summary: partial (map-side) aggregation then a
    * single hash-shuffle on the two low-cardinality group keys — the shape
    * that scales linearly to 100 TB. Aggregates rounded for oracle parity.
    */
  def aggGroupBy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Sort + top-k (§2.3 sorts/limits; `myutils.py:884-888`). Spark plans
    * this as TakeOrderedAndProject — no global sort, only a per-partition
    * top-k then a k-way merge on the driver. O(k) memory at any scale.
    */
  def topkSort(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
  }

  /** P5 client-side `size` limit (`d22d/task.py:138-139`), made
    * deterministic with an order.
    */
  def limitDet(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
      .limit(5)
  }

  /** S5/P6 count pushdown (`d22d/utils/db/__init__.py:398-402`): Spark
    * answers this from parquet footer row counts (no data scan).
    */
  def countStar(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem").agg(count(lit(1)).as("cnt"))

  /** P4 dedup (`d22d/task.py:118-122`): whole-row distinct. The reference
    * keeps a driver-side set of stringified rows; here it is a hash
    * aggregate that spills and scales.
    */
  def dedupDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .select($"l_returnflag", $"l_linestatus")
      .dropDuplicates()
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** P9 merge join (`d22d/task.py:183-328`): left-outer equi-join with
    * both keys coerced to string (`d22d/task.py:257,262`). The reference
    * materializes all of side 2 in driver memory; here the small side is
    * an explicit `broadcast` — same hash-join shape, but bounded by
    * executor memory and falls back to shuffle join automatically when
    * the build side is large.
    */
  def mergeLeftJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    orders.join(
        broadcast(customer),
        orders("o_custkey").cast("string") === customer("c_custkey").cast("string"),
        "left")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"c_name", $"c_mktsegment")
      .orderBy($"o_orderkey")
  }

  /** P9 full-outer variant (the README-documented semantics,
    * `README.md:285-307`): nation ⨝ supplier leaves unmatched rows on
    * both sides visible. Full-outer cannot broadcast — sort-merge join
    * on the key, which is the correct plan at scale too.
    */
  def mergeFullJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nation = Tables.load(spark, dir, "nation")
    val supplier = Tables.load(spark, dir, "supplier")
    nation.join(supplier, nation("n_nationkey") === supplier("s_nationkey"), "full")
      .select($"n_nationkey", $"n_name", $"s_suppkey", $"s_name")
      .orderBy(asc_nulls_first("n_nationkey"), asc_nulls_first("s_suppkey"))
  }

  /** P9 column-overwrite semantics (`d22d/task.py:322-328`): on column
    * conflict the right side wins, falling back to the left for unmatched
    * rows — exactly `coalesce(right, left)` after a left join.
    */
  def mergeOverwrite(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nation = Tables.load(spark, dir, "nation")
    val supplier = Tables.load(spark, dir, "supplier")
      .withColumnRenamed("s_name", "name")
    val left = nation.withColumnRenamed("n_name", "name")
    left.join(broadcast(supplier), left("n_nationkey") === supplier("s_nationkey"), "left")
      .select(
        left("n_nationkey"),
        coalesce(supplier("name"), left("name")).as("merged_name"),
        supplier("s_suppkey"))
      .orderBy(asc_nulls_first("n_nationkey"), asc_nulls_first("s_suppkey"))
  }

  /** TPC-H Q3-style shipping priority: two joins + group + top-k. The
    * customer dim is broadcast; orders⨝lineitem shuffles on the order key
    * once and the aggregation reuses that partitioning.
    */
  def topRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val customer = Tables.load(spark, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING")
    val orders = Tables.load(spark, dir, "orders")
      .filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val lineitem = Tables.load(spark, dir, "lineitem")
      .filter($"l_shipdate" > lit("1996-01-01").cast("timestamp"))
    lineitem
      .join(orders, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(customer), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate".cast("date").as("o_date"))
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
      .select($"l_orderkey", $"revenue", $"o_date")
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  /** Top-1-per-group via window `row_number` (§2.3 top-k-per-group; the
    * reference's ES top-hits size-1-by-recency, `myutils.py:510-521`).
    */
  def latestOrderPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    Tables.load(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate".cast("date").as("o_date"), $"o_totalprice")
      .orderBy($"o_custkey")
  }

  /** Set operations (§2.3: recognized by the reference's tokenizer,
    * `sqlfileextra.py:14`, executed here): nations with both customers and
    * suppliers (INTERSECT) vs customer-only nations (EXCEPT), tagged and
    * unioned.
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val custNations = Tables.load(spark, dir, "customer").select($"c_nationkey".as("k"))
    val suppNations = Tables.load(spark, dir, "supplier").select($"s_nationkey".as("k"))
    val both = custNations.intersect(suppNations).withColumn("tag", lit("both"))
    val custOnly = custNations.except(suppNations).withColumn("tag", lit("cust_only"))
    both.unionByName(custOnly).select($"tag", $"k").orderBy($"tag", $"k")
  }

  /** Scalar-function surface (§2.3: trim/md5/concat/len;
    * `utils/utils.py:365-375` md5, `task.py:23-28` format_value): includes
    * the ES `_id` synthesis `concat_ws` (`d22d/utils/db/__init__.py:125`)
    * and the integral-float→int normalization as a typed CASE.
    */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .select(
        $"c_custkey",
        md5(trim($"c_name")).as("name_md5"),
        concat_ws("-", $"c_custkey".cast("string"), $"c_mktsegment").as("es_id"),
        lower($"c_mktsegment").as("seg_lower"),
        length($"c_name").cast("long").as("name_len"),
        when($"c_acctbal" === floor($"c_acctbal"), $"c_acctbal".cast("long")).as("acctbal_int"))
      .orderBy($"c_custkey")
  }

  /** JSON handling (§2.3 json scalar surface: `to_json`/`from_json`
    * analogs): extract a typed field from the `events.props` JSON column
    * and aggregate.
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .select($"event_type", get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"))
      .orderBy($"event_type")
  }

  /** Event-time daily rollup — the batch shape of the streaming windowed
    * aggregation (tumbling 1-day window).
    */
  def eventsDaily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy(date_trunc("day", $"ts").cast("date").as("day"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      .orderBy($"day", $"event_type")
  }

  /** Upsert/keep-latest emulation (S28/S29/P11: `INSERT … ON DUPLICATE KEY
    * UPDATE`, `mysqlmodel.py:285-302`): the final state of a keyed table
    * after applying the event stream in timestamp order.
    */
  def latestEventPerUser(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    Tables.load(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"event_type", $"value")
      .orderBy($"user_id")
  }

  /** Predicate surface: IN-list + equality (the `_select2` equality
    * builder, `myutils.py:894-921`, and `condition` pushdown,
    * `db/__init__.py:374`). Both predicates reach the parquet scan.
    */
  def filterInList(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH") && $"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  /** Exact distinct counts (§2.3 aggregations — the reference delegates
    * these to the backing store; Spark computes them with partial
    * aggregation).
    */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        countDistinct($"l_orderkey").as("n_orders"))
  }

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_project" -> (scanProject _),
    "q02_agg_groupby" -> (aggGroupBy _),
    "q03_topk_sort" -> (topkSort _),
    "q04_limit" -> (limitDet _),
    "q05_count_star" -> (countStar _),
    "q06_dedup_distinct" -> (dedupDistinct _),
    "q07_merge_left_join" -> (mergeLeftJoin _),
    "q08_merge_full_join" -> (mergeFullJoin _),
    "q09_merge_overwrite" -> (mergeOverwrite _),
    "q10_top_revenue" -> (topRevenue _),
    "q11_latest_order_per_cust" -> (latestOrderPerCustomer _),
    "q12_set_ops" -> (setOps _),
    "q13_scalar_funcs" -> (scalarFuncs _),
    "q14_json_extract" -> (jsonExtract _),
    "q15_events_daily" -> (eventsDaily _),
    "q16_latest_event_per_user" -> (latestEventPerUser _),
    "q17_filter_in" -> (filterInList _),
    "q18_distinct_counts" -> (distinctCounts _),
  )

  val oracles: Map[String, String] = Map(
    "q01_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 45.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_topk_sort" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q04_limit" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |ORDER BY c_custkey LIMIT 5""".stripMargin,
    "q05_count_star" -> "SELECT count(*) AS cnt FROM lineitem",
    "q06_dedup_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q07_merge_left_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment
        |FROM orders LEFT JOIN customer
        |  ON CAST(o_custkey AS VARCHAR) = CAST(c_custkey AS VARCHAR)
        |ORDER BY o_orderkey""".stripMargin,
    "q08_merge_full_join" ->
      """SELECT n_nationkey, n_name, s_suppkey, s_name
        |FROM nation FULL JOIN supplier ON n_nationkey = s_nationkey
        |ORDER BY n_nationkey NULLS FIRST, s_suppkey NULLS FIRST""".stripMargin,
    "q09_merge_overwrite" ->
      """SELECT n_nationkey, coalesce(s_name, n_name) AS merged_name, s_suppkey
        |FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
        |ORDER BY n_nationkey NULLS FIRST, s_suppkey NULLS FIRST""".stripMargin,
    "q10_top_revenue" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  CAST(o_orderdate AS DATE) AS o_date
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-01-01'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q11_latest_order_per_cust" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date, o_totalprice
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q12_set_ops" ->
      """SELECT 'both' AS tag, k FROM
        |  (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier) a
        |UNION ALL
        |SELECT 'cust_only' AS tag, k FROM
        |  (SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier) b
        |ORDER BY tag, k""".stripMargin,
    "q13_scalar_funcs" ->
      """SELECT c_custkey,
        |  md5(trim(c_name)) AS name_md5,
        |  concat_ws('-', CAST(c_custkey AS VARCHAR), c_mktsegment) AS es_id,
        |  lower(c_mktsegment) AS seg_lower,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  CASE WHEN c_acctbal = floor(c_acctbal) THEN CAST(c_acctbal AS BIGINT) END AS acctbal_int
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q14_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q15_events_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "q16_latest_event_per_user" ->
      """SELECT user_id, event_id, event_type, value
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q17_filter_in" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus = 'F'
        |ORDER BY o_orderkey""".stripMargin,
    "q18_distinct_counts" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin,
  )
}
