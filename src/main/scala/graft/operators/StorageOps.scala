package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators (round 9): co-located BUCKETED joins —
  * the one shuffle-elimination lever that works across JOBS, not just
  * across stages of one plan.
  *
  * Every fact-fact equi-join in the catalog (q10, q56, q80…) pays a
  * full shuffle of both sides every run, because parquet files carry
  * no partitioning contract. Writing both tables bucketed BY THE JOIN
  * KEY moves that shuffle to write time, ONCE: every subsequent join
  * on the key reads both sides already hash-partitioned
  * (`FileSourceScanExec` reports `HashPartitioning(key, n)`), and the
  * sort-merge join plans with ZERO Exchange under it. At 100 TB this
  * is the difference between re-shuffling 100 TB per analytics run
  * and re-shuffling it once per ingest — the standard warehouse
  * discipline (Hive/Spark bucketing; Iceberg/Delta call it the same
  * thing). `PlanQualitySpec` asserts the shape: no
  * ShuffleExchangeExec anywhere below the join when both sides are
  * bucketed, and one present when the same join reads the raw
  * parquet.
  *
  * The bucketed copies are a session-shared build (the
  * `warmSharedCaches` discipline): first use writes them under
  * `target/graft-bucketed/<tag>/`, Bench's warm-up pre-builds so
  * per-query numbers measure the steady state a real deployment
  * lives in.
  *
  * Reference coverage: the reference re-reads its MySQL/ES sources
  * per job with no layout control (SURVEY §2.1 S1-S9); this is the
  * Spark-native capability it has no analog for.
  */
object StorageOps {

  /** Buckets in each co-located table. 16 at the driver SFs keeps
    * every bucket a real multi-row file; production picks
    * data-size/target-file-size (e.g. 2048 at 100 TB) — the plan
    * shape is bucket-count-independent as long as the two sides
    * MATCH (Spark refuses co-located reads across mismatched counts).
    */
  private val NumBuckets = 16

  private val built = scala.collection.mutable.Set.empty[String]

  private def tag(dir: String): String =
    java.lang.Integer.toHexString(dir.hashCode)

  /** Table names of the bucketed (lineitem, orders) copies for `dir`,
    * building them on first use in this JVM. Synchronized: concurrent
    * first-touch from parallel specs must build once.
    */
  def ensureBucketed(spark: SparkSession, dir: String): (String, String) =
    synchronized {
      val t = tag(dir)
      val li = s"graft_bkt_lineitem_$t"
      val ord = s"graft_bkt_orders_$t"
      if (!built.contains(t) || !spark.catalog.tableExists(li)) {
        val base = s"target/graft-bucketed/$t"
        // repartition by the bucket key first: each task then owns
        // whole buckets, so every bucket lands in ONE file — the
        // layout that keeps bucketed reads one-split-per-bucket.
        Tables.load(spark, dir, "lineitem")
          .repartition(NumBuckets, col("l_orderkey"))
          .write.mode("overwrite")
          .option("path", s"$base/lineitem")
          .bucketBy(NumBuckets, "l_orderkey").sortBy("l_orderkey")
          .format("parquet").saveAsTable(li)
        Tables.load(spark, dir, "orders")
          .repartition(NumBuckets, col("o_orderkey"))
          .write.mode("overwrite")
          .option("path", s"$base/orders")
          .bucketBy(NumBuckets, "o_orderkey").sortBy("o_orderkey")
          .format("parquet").saveAsTable(ord)
        built += t
      }
      (li, ord)
    }

  /** Bench warm-up hook — see [[graft.Bench]]'s shared-cache pass. */
  def warmBucketed(spark: SparkSession, dir: String): Unit =
    ensureBucketed(spark, dir)

  /** Revenue by priority over the co-located join (q131): lineitem ⋈
    * orders on the bucket key, then a priority rollup. The `merge`
    * hint pins the sort-merge strategy the bucketed layout serves (at
    * driver SFs AQE would otherwise broadcast 60k-row orders and the
    * plan under test would vanish; at 100 TB both sides are fact
    * tables and SMJ is what the optimizer picks unhinted). The only
    * Exchange in the whole plan is the 5-group rollup above the join.
    */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (li, ord) = ensureBucketed(spark, dir)
    spark.table(li).hint("merge")
      .join(spark.table(ord), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"o_orderpriority")
  }

  /** The SAME logical join over the raw parquet — the control both
    * PlanQualitySpec (must contain the shuffle bucketing removes) and
    * the bench comparison read against q131.
    */
  def unbucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem").hint("merge")
      .join(Tables.load(spark, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"o_orderpriority")
  }

  private def oracleBucketedJoin: String =
    """SELECT o_orderpriority,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*)::BIGINT AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q131_bucketed_join" -> (bucketedJoin _),
  )

  val oracles: Map[String, String] = Map(
    "q131_bucketed_join" -> oracleBucketedJoin,
  )
}
