package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Randomized CDC fuzz (round 16): over random tables and random
  * chains of captured merges / appends, the change feed must satisfy
  * its DEFINING invariant — applying `between(v0+1, latest)` to the
  * snapshot at v0 reproduces the live table exactly — and a replica
  * maintained purely through [[ManifestChanges.replicate]] must equal
  * the source after every chain. Structural properties ride along:
  * every change row carries one of the four Delta change types, and
  * version attribution stays inside the chain's window. Deterministic
  * seeds so a failure reproduces; the chain recipe is printed on
  * failure.
  */
class ManifestChangesPropSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp = tmpDir("manifest-changes-fuzz")

  private def asSet(df: DataFrame): Set[String] = df.collect().map(_.toString).toSet

  test("randomized chains: snapshot + feed == live; replica == source; types/versions well-formed") {
    val Chains = 10
    (1 to Chains).foreach { iter =>
      val rnd = new scala.util.Random(7000 + iter)
      val partitioned = rnd.nextBoolean()
      val partCol = if (partitioned) "day" else ""
      val root = s"$tmp/fz$iter/t"
      val dst = s"$tmp/fz$iter/replica"
      val n = 20 + rnd.nextInt(60)
      val days = 2 + rnd.nextInt(3)
      val recipe = new StringBuilder(s"seed=${7000 + iter} n=$n part=$partitioned days=$days")

      def baseDf = {
        val d = spark.range(0, n).select(
          col("id"), (col("id") * 3).as("v"),
          date_add(lit("2024-06-01").cast("date"), (col("id") % days).cast("int")).as("day"))
        if (partitioned) d else d.drop("day")
      }
      ManifestWrite.write(
        if (partitioned) baseDf.repartitionByRange(3, col("id")) else baseDf,
        root, partCol, SaveMode.Overwrite)
      val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
      val v0 = ManifestTable.resolve(fs, new Path(root)).get.seq
      val readLive = () =>
        if (partitioned) ManifestTable.read(spark, root, partCol = "day")
        else ManifestTable.read(spark, root)
      val beforeRows = readLive().collect().toSeq
      val beforeDf = spark.createDataFrame(
        spark.sparkContext.parallelize(beforeRows), readLive().schema)

      // replica seeded at v0 — the chain below is what catch-up must replay
      ManifestChanges.replicate(spark, root, dst, Seq("id"), partCol)

      def merge() = ManifestMerge(root, Seq("id"), partCol).withKeepCommits(64)
      val ops = 2 + rnd.nextInt(3)
      (1 to ops).foreach { op =>
        rnd.nextInt(4) match {
          case 0 => // captured update over a random key range; 25% to null
            val lo = rnd.nextInt(n + 10)
            val w = 1 + rnd.nextInt(15)
            val toNull = rnd.nextInt(4) == 0
            recipe ++= s" upd[$lo,${lo + w})${if (toNull) "->null" else ""}"
            val nv = if (toNull) lit(null).cast("long") else lit(rnd.nextLong() % 1000)
            merge().whenMatchedUpdate(Map("v" -> ((_, _) => nv)))
              .withChangeFeed()
              .run(spark.range(lo, lo + w).toDF("id")): Unit
          case 1 => // captured delete over a random key range
            val lo = rnd.nextInt(n + 10)
            val w = 1 + rnd.nextInt(10)
            recipe ++= s" del[$lo,${lo + w})"
            merge().whenMatchedDelete()
              .withChangeFeed()
              .run(spark.range(lo, lo + w).toDF("id")): Unit
          case 2 => // captured insert of fresh keys
            val lo = 100000L * op
            val w = 1 + rnd.nextInt(10)
            recipe ++= s" ins[$lo,${lo + w})"
            val src0 = spark.range(lo, lo + w).select(
              col("id"), (col("id") + 1).as("v"),
              date_add(lit("2024-06-01").cast("date"), (col("id") % days).cast("int")).as("day"))
            merge().whenNotMatchedInsert()
              .withChangeFeed()
              .run(if (partitioned) src0 else src0.drop("day")): Unit
          case 3 => // additive path: plain append (unpartitioned only —
            // partitioned appends are refused by contract); feed
            // synthesizes these inserts from the manifest diff
            if (partitioned) {
              recipe ++= " (skip-append)"
            } else {
              val lo = 200000L * op
              recipe ++= s" app[$lo,${lo + 5})"
              spark.range(lo, lo + 5).select(col("id"), lit(-7L).as("v"))
                .write.format("graftmanifest").mode(SaveMode.Append).save(root)
            }
        }
      }

      val latest = ManifestTable.resolve(fs, new Path(root)).get.seq
      val feed = ManifestChanges.between(spark, root, v0 + 1, latest).cache()
      try {
        // structural: the four types only, versions inside the window
        val types = feed.select("_change_type").distinct()
          .as[String].collect().toSet
        assert(types.subsetOf(Set("insert", "update_preimage", "update_postimage", "delete")),
          s"$recipe: unexpected change types $types")
        val vs = feed.select("_commit_version").distinct().as[Long].collect()
        assert(vs.forall(v => v > v0 && v <= latest), s"$recipe: versions $vs outside ($v0, $latest]")
        // the defining invariant
        val applied = ManifestChanges.applyChanges(beforeDf, feed, Seq("id"))
        assert(asSet(applied) == asSet(readLive()), s"$recipe: snapshot+feed != live")
      } finally { feed.unpersist(); () }
      // replica catch-up purely from the feed
      ManifestChanges.replicate(spark, root, dst, Seq("id"), partCol)
      val dstRead =
        if (partitioned) ManifestTable.read(spark, dst, partCol = "day")
        else ManifestTable.read(spark, dst)
      assert(asSet(dstRead) == asSet(readLive()), s"$recipe: replica != source")
    }
  }
}
