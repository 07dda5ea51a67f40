package graft.tools

import org.apache.spark.sql.SparkSession

/** Experiment harness #5: q97 with and without the candidate distinct. */
object Scratch5 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Scratch.time("q97 current", iters) {
      graft.operators.TextDedup.dedupSnm(spark, sfDir).count()
    }
    Scratch.time("q97 no-distinct", iters) {
      graft.operators.ScratchAccess.snmNoDistinct(spark, sfDir).count()
    }
    val a = graft.operators.TextDedup.dedupSnm(spark, sfDir).collect().map(_.toSeq).toSeq
    val b = graft.operators.ScratchAccess.snmNoDistinct(spark, sfDir).collect().map(_.toSeq).toSeq
    println(s"[scratch] q97 variants equal: ${a == b}")
    // duplicate-pair audit: the window pairs must be unique pre-distinct
    val dups = graft.operators.ScratchAccess.snmCandNoDistinct(spark, sfDir)
      .groupBy("a_id", "b_id").count().filter("count > 1").count()
    println(s"[scratch] q97 candidate duplicate pairs: $dups")
    spark.stop()
  }
}
