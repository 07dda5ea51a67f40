package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Micro-bench: custom TopKPerKey exec vs the window formulation on the
  * same input — the measurement backing the q82 operator's claim.
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.TopKBench"
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // amplify lineitem ×8 (≈4.8M rows at sf0.1) so the reduce-side cost
    // dominates scheduling noise; keys = l_suppkey (~1k keys, thousands
    // of rows each — the regime where sort-vs-heap diverges)
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_suppkey"), col("l_extendedprice"))
      .crossJoin(spark.range(8))
      .localCheckpoint()
    li.count() // materialize input out of both measurements

    def time(tag: String)(f: => Long): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      println(f"$tag%-10s min=${times.map(_._1).min}%.3fs rows=${times.head._2}")
    }
    time("custom") {
      graft.plans.TopKPerKey(li, Seq("l_suppkey"), col("l_extendedprice"), 3).count()
    }
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_extendedprice").desc)
    time("window") {
      li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).count()
    }
    // q85-shaped composite STRING order expression: md5-derived zero-padded
    // score — the regime where the generated order projection (vs
    // interpreted eval) matters most
    val score = concat(
      lpad(graft.operators.TextPrims.hash64(col("l_extendedprice").cast("string"))
        .cast("string"), 20, "0"),
      lit(":"), lpad(col("l_extendedprice").cast("string"), 12, "0"))
    time("custom-str") {
      graft.plans.TopKPerKey(li, Seq("l_suppkey"), score, 3, descending = false).count()
    }
    val ws = Window.partitionBy(col("l_suppkey")).orderBy(score.asc)
    time("window-str") {
      li.withColumn("rn", row_number().over(ws)).filter(col("rn") <= 3).count()
    }
    spark.stop()
  }
}
