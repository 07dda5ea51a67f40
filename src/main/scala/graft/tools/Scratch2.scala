package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Experiment harness #2: q83 funnel stage costs. */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.load(spark, sfDir, "documents")
    Scratch.time("docs.count", iters) { docs.count() }
    val cleaned = graft.streaming.StreamingJobs
      .cleanDocumentStream(docs, 5, 0.3)
    Scratch.time("cleaned.count (serial scan)", iters) { cleaned.count() }
    val cleanedR = graft.streaming.StreamingJobs
      .cleanDocumentStream(docs.repartition(cpus.toInt), 5, 0.3)
    Scratch.time("cleaned.count (repartitioned)", iters) { cleanedR.count() }
    val corpus = graft.operators.TrainingPipeline.buildCorpus(spark, sfDir)
    Scratch.time("corpus.count", iters) { corpus.count() }
    Scratch.time("packs distinct", iters) {
      corpus.select(col("split"), col("pack_id")).distinct().count()
    }
    Scratch.time("q83 funnel full", iters) {
      graft.operators.TrainingPipeline.funnel(spark, sfDir).count()
    }

    // replica with per-action timing (same structure as funnel)
    import spark.implicits._
    (1 to iters).foreach { it =>
      val t0 = System.nanoTime()
      val cleanedF = graft.streaming.StreamingJobs
        .cleanDocumentStream(docs, 5, 0.5).cache()
      val corpusF = graft.operators.TrainingPipeline.buildCorpus(spark, sfDir).cache()
      def lap(l: String, t: Long): Long = {
        val now = System.nanoTime(); println(f"[scratch]   funnel[$it] $l: ${(now - t) / 1e9}%.3f"); now
      }
      var t = t0
      val n0 = docs.count(); t = lap("raw count", t)
      val n1 = cleanedF.count(); t = lap("cleaned count", t)
      val n2 = corpusF.count(); t = lap("corpus count", t)
      val n3 = corpusF.select($"split", $"pack_id").distinct().count(); t = lap("packs", t)
      val out = Seq(("0_raw", n0), ("1_cleaned", n1), ("2_corpus", n2), ("3_packs", n3))
        .toDF("stage", "n_docs").orderBy($"stage")
      out.count(); t = lap("out", t)
      corpusF.unpersist(); cleanedF.unpersist()
      println(f"[scratch]   funnel[$it] TOTAL ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
