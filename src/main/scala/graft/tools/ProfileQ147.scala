package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage timer for the q147 two-stage ANN — which stage pays what at
  * a given SF (the ProfileQ70/ProfileQ83 discipline). This is the
  * tool that localized the round-9 findings: the candidate stage was
  * ~1.5 s warm while the full query paid ~37 s — the re-rank's
  * quantize/dot expressions were higher-order functions
  * (CodegenFallback, boxed per element), which drove the pinned int8
  * store + the native Int8Cosine/SquaredDistance expressions.
  */
object ProfileQ147 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile-q147] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // cold = artifact builds (PQ fit, codes, int8 store); warm = steady state
    time("cold full")(graft.operators.CorpusOps.annTwoStage(spark, dir).collect())
    (1 to 2).foreach { i =>
      time(s"warm full $i")(graft.operators.CorpusOps.annTwoStage(spark, dir).collect())
    }
    time("warm candidates only")(
      graft.operators.CorpusOps.twoStageCandidates(spark, dir).count())
    spark.stop()
  }
}
