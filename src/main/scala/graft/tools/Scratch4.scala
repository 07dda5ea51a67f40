package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Experiment harness #4: q79 simhash-pairs formulations. */
object Scratch4 {
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

    val SimhashBits = 32
    val SimhashBandBits = 8
    val SimhashMaxHamming = 3
    val SimhashBucketCap = 50

    def simhashOf(): DataFrame = {
      val wds = graft.Tables.load(spark, sfDir, "documents")
        .select($"doc_id", explode(array_distinct(split($"text", " "))).as("w"))
        .withColumn("h", graft.operators.ScratchAccess.hash64($"w"))
      val bitSums = wds.groupBy($"doc_id").agg(
        sum(when(shiftright($"h", 0).bitwiseAND(1) === 1, 1).otherwise(-1)).as("s0"),
        (1 until SimhashBits).map(j =>
          sum(when(shiftright($"h", j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$j")): _*)
      val sim = (0 until SimhashBits).map(j =>
        when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _)
      bitSums.select($"doc_id", sim.as("simhash"))
    }

    def pairs(sim: DataFrame): DataFrame = {
      val banded = sim.select(col("doc_id"), col("simhash"), explode(array(
        (0 until 32 / SimhashBandBits).map(b => struct(
          lit(b).as("band"),
          shiftright(col("simhash"), b * SimhashBandBits)
            .bitwiseAND((1 << SimhashBandBits) - 1).as("bval"))): _*)).as("bb"))
        .select(col("doc_id"), col("simhash"),
          col("bb.band").as("band"), col("bb.bval").as("bval"))
      val cool = banded.groupBy(col("band"), col("bval"))
        .agg(count(lit(1)).as("bn")).filter(col("bn") <= SimhashBucketCap)
        .select(col("band"), col("bval"))
      val capped = banded.join(cool, Seq("band", "bval"), "left_semi")
        .select(col("doc_id"), col("simhash"), col("band"), col("bval"))
      val a = capped.toDF("a_id", "sim_a", "band", "bval")
      val b = capped.toDF("b_id", "sim_b", "band2", "bval2")
      a.join(b, col("band") === col("band2") && col("bval") === col("bval2") &&
          col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
        .distinct()
        .filter(col("hamming") <= SimhashMaxHamming)
        .orderBy(col("a_id"), col("b_id"))
    }

    Scratch.time("q79 current (sorted sim)", iters) {
      pairs(simhashOf().orderBy($"doc_id")).count()
    }
    Scratch.time("q79 unsorted sim", iters) { pairs(simhashOf()).count() }
    Scratch.time("q79 cached sim", iters) {
      val sim = simhashOf().cache()
      try pairs(sim).count() finally { sim.unpersist(false); () }
    }
    val x = pairs(simhashOf().orderBy($"doc_id")).collect().map(_.toSeq).toSeq
    val y = pairs(simhashOf()).collect().map(_.toSeq).toSeq
    println(s"[scratch] q79 variants equal: ${x == y}")
    spark.stop()
  }
}
