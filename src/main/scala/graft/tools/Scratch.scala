package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway A/B harness for optimization experiments — times labelled
  * sub-pipelines and alternative formulations against each other on a
  * bench-shaped session. Not part of the library surface; contents
  * change per experiment.
  *
  * Usage: runMain graft.tools.Scratch <sfDir> [iters]
  */
object Scratch {
  def time(label: String, iters: Int)(f: => Long): Unit = {
    val ts = (1 to iters).map { _ =>
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      (s, n)
    }
    println(f"[scratch] $label%-40s min ${ts.map(_._1).min}%.3f s  (${ts.head._2} rows)")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select($"doc_id", split($"text", " ").as("w")).filter(size($"w") >= 2)
    val bg = docs.select($"doc_id", explode(expr(
      "transform(sequence(1, size(w) - 1), i -> struct(element_at(w, i) as w1, element_at(w, i + 1) as w2))"
    )).as("b")).select($"doc_id", $"b.w1".as("w1"), $"b.w2".as("w2"))

    time("bg explode only", iters) { bg.count() }

    val docsR = graft.Tables.load(spark, sfDir, "documents")
      .repartition(cpus.toInt)
      .select($"doc_id", split($"text", " ").as("w")).filter(size($"w") >= 2)
    val bgR = docsR.select($"doc_id", explode(expr(
      "transform(sequence(1, size(w) - 1), i -> struct(element_at(w, i) as w1, element_at(w, i + 1) as w2))"
    )).as("b")).select($"doc_id", $"b.w1".as("w1"), $"b.w2".as("w2"))
    time("bg explode repartitioned", iters) { bgR.count() }

    def q81(bgIn: DataFrame): DataFrame = {
      val c2 = bgIn.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
      val c1 = bgIn.groupBy($"w1").agg(count(lit(1)).as("c1"))
      val vocab = bgIn.select($"w1").union(bgIn.select($"w2")).agg(countDistinct($"w1").as("v"))
      val scored = bgIn.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
        .crossJoin(broadcast(vocab))
        .withColumn("lp", log(($"c2" + 1.0) / ($"c1" + $"v")))
      scored.groupBy($"doc_id")
        .agg(round(avg($"lp"), 6).as("avg_logprob"),
          round(exp(-avg($"lp")), 4).as("perplexity"))
        .orderBy($"doc_id")
    }
    time("q81 full (current)", iters) { q81(bg).count() }

    // Variant: c1 and vocab derived from c2 (no extra explode branches);
    // instance join unchanged so the per-doc avg is over the same rows.
    def q81b(bgIn: DataFrame): DataFrame = {
      val c2 = bgIn.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
      val c1 = c2.groupBy($"w1").agg(sum($"c2").as("c1"))
      val vocab = c2.select($"w1").union(c2.select($"w2").toDF("w1"))
        .agg(countDistinct($"w1").as("v"))
      val scored = bgIn.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
        .crossJoin(broadcast(vocab))
        .withColumn("lp", log(($"c2" + 1.0) / ($"c1" + $"v")))
      scored.groupBy($"doc_id")
        .agg(round(avg($"lp"), 6).as("avg_logprob"),
          round(exp(-avg($"lp")), 4).as("perplexity"))
        .orderBy($"doc_id")
    }
    time("q81 c1/vocab from c2", iters) { q81b(bg).count() }

    // q92 variants
    val grams = graft.operators.ScratchAccess.grams(spark, sfDir).select($"doc_id", $"gram")
    def q92cur(): DataFrame = {
      val docsPerGram = grams.groupBy($"gram").agg(countDistinct($"doc_id").as("nd"))
      grams.join(docsPerGram, "gram")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when($"nd" >= 2, 1L).otherwise(0L)).as("n_dup"))
        .select($"doc_id", $"n_grams", $"n_dup",
          round($"n_dup" / $"n_grams", 6).as("dup_frac"))
        .orderBy($"doc_id")
    }
    // nd >= 2  ⟺  the gram's doc ids are not all equal — min/max partial
    // agg instead of a two-stage count-distinct expansion.
    def q92minmax(): DataFrame = {
      val dup = grams.groupBy($"gram")
        .agg((min($"doc_id") =!= max($"doc_id")).as("multi"))
      grams.join(dup, "gram")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when($"multi", 1L).otherwise(0L)).as("n_dup"))
        .select($"doc_id", $"n_grams", $"n_dup",
          round($"n_dup" / $"n_grams", 6).as("dup_frac"))
        .orderBy($"doc_id")
    }
    time("q92 current", iters) { q92cur().count() }
    time("q92 minmax", iters) { q92minmax().count() }
    // value equality
    val a = q92cur().collect().map(_.toSeq).toSeq
    val b = q92minmax().collect().map(_.toSeq).toSeq
    println(s"[scratch] q92 variants equal: ${a == b}")
    val a81 = q81(bg).collect().map(_.toSeq).toSeq
    val b81 = q81b(bg).collect().map(_.toSeq).toSeq
    println(s"[scratch] q81 variants equal: ${a81 == b81}")

    spark.stop()
  }
}
