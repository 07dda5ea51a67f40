package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator surface of the reference, re-expressed Spark-first.
  *
  * Each entry is a named query over the driver corpus with a DuckDB
  * oracle (see [[graft.SparkEntry.oracleSql]]). Coverage follows
  * SURVEY.md §2: scan/projection (S1, `d22d/utils/db/myutils.py:875-878`),
  * filters (`myutils.py:894-921`), the P9 merge join
  * (`d22d/task.py:183-328`), dedup P4, limit P5, count P6/S5, sorts and
  * set-op surface (§2.3).
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
}
