package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Experiment harness #3: q125 percentile formulations. */
object Scratch3 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val o = graft.Tables.load(spark, sfDir, "orders")
      .select($"o_totalprice".as("x"),
        unix_micros($"o_orderdate".cast("timestamp")).as("ts_us"))
    val cut = o.agg(expr("min(ts_us) + div((max(ts_us) - min(ts_us)) * 7, 10)").as("cut_us"))
    val w = o.crossJoin(broadcast(cut))
    val ref = w.filter($"ts_us" <= $"cut_us")

    def cuts9(r: DataFrame): DataFrame =
      r.agg(round(percentile($"x", lit(0.1)), 6).as("c1"),
        (2 to 9).map(i => round(percentile($"x", lit(i / 10.0)), 6).as(s"c$i")): _*)
    def cutsArr(r: DataFrame): DataFrame =
      r.agg(percentile($"x", array((1 to 9).map(i => lit(i / 10.0)): _*)).as("cs"))
        .select((1 to 9).map(i => round(element_at($"cs", i), 6).as(s"c$i")): _*)

    Scratch.time("psiCuts 9 scalar percentiles", iters) { cuts9(ref).count() }
    Scratch.time("psiCuts array percentile", iters) { cutsArr(ref).count() }

    def full(cutsFn: DataFrame => DataFrame): DataFrame = {
      val cuts = cutsFn(ref)
      val binned = w.crossJoin(broadcast(cuts))
        .withColumn("pop", when($"ts_us" <= $"cut_us", "ref").otherwise("cur"))
        .withColumn("bin",
          (1 to 9).map(i => when($"x" > col(s"c$i"), 1).otherwise(0)).reduce(_ + _).cast("long"))
      binned.groupBy($"bin").agg(
        sum(when($"pop" === "ref", 1L).otherwise(0L)).as("ref_n"),
        sum(when($"pop" === "cur", 1L).otherwise(0L)).as("cur_n"))
    }
    Scratch.time("q125-ish full (9 scalar)", iters) { full(cuts9).count() }
    Scratch.time("q125-ish full (array)", iters) { full(cutsArr).count() }
    val a = cuts9(ref).collect().map(_.toSeq).toSeq
    val b = cutsArr(ref).collect().map(_.toSeq).toSeq
    println(s"[scratch] cuts equal: ${a == b}")
    spark.stop()
  }
}
