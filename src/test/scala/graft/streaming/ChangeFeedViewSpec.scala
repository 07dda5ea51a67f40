package graft.streaming

import graft.SparkSpec
import graft.core.ManifestMerge
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Continuous MV maintenance from the change data feed (round 16):
  * the view must track the live table's rollup exactly through
  * appends, captured update/delete merges, key disappearance, and a
  * stream restart — at delta cost, with the versioned-snapshot replay
  * discipline.
  */
class ChangeFeedViewSpec extends SparkSpec {
  import spark.implicits._

  private def rollup(root: String) =
    spark.read.format("graftmanifest").load(root)
      .groupBy($"k").agg(count(lit(1)).as("n_rows"), sum($"m").as("sum_m"))

  private def viewSet(viewDir: String): Set[(String, Long, Long)] =
    StreamingJobs.readMaterializedView(spark, viewDir)
      .as[(String, Long, Long)].collect().toSet

  private def liveSet(root: String): Set[(String, Long, Long)] =
    rollup(root).as[(String, Long, Long)].collect().toSet

  test("view tracks appends, captured merges, and key disappearance exactly; survives restart") {
    val base = tmpDir("cdf-view")
    val root = s"$base/t"
    val viewDir = s"$base/view"
    val ckpt = s"$base/ckpt"
    Seq((1L, "k1", 10L), (2L, "k1", 7L), (3L, "k2", 20L))
      .toDF("id", "k", "m").write.format("graftmanifest").save(root)

    def start() = StreamingJobs.changeFeedViewMaintenance(
      spark, root, viewDir, "k", "m", ckpt)

    val q = start()
    try {
      q.processAllAvailable()
      assert(viewSet(viewDir) == Set(("k1", 2L, 17L), ("k2", 1L, 20L)))
      // append: new key + growth of an existing one
      Seq((4L, "k3", 1L), (5L, "k1", 3L)).toDF("id", "k", "m")
        .write.format("graftmanifest").mode(SaveMode.Append).save(root)
      q.processAllAvailable()
      assert(viewSet(viewDir) == liveSet(root))
      assert(viewSet(viewDir) == Set(("k1", 3L, 20L), ("k2", 1L, 20L), ("k3", 1L, 1L)))
      // captured update merge: id 1's measure 10 -> 100
      ManifestMerge(root, Seq("id"), partCol = "")
        .whenMatchedUpdate(Map("m" -> ((s, _) => s("nm"))))
        .withChangeFeed()
        .run(Seq((1L, 100L)).toDF("id", "nm"))
      q.processAllAvailable()
      assert(viewSet(viewDir) == liveSet(root))
      assert(viewSet(viewDir).contains(("k1", 3L, 110L)))
      // captured delete merge: k2's only row leaves -> the key drops out
      ManifestMerge(root, Seq("id"), partCol = "")
        .whenMatchedDelete()
        .withChangeFeed()
        .run(Seq(Tuple1(3L)).toDF("id"))
      q.processAllAvailable()
      assert(viewSet(viewDir) == liveSet(root))
      assert(!viewSet(viewDir).exists(_._1 == "k2"))
    } finally q.stop()

    // restart on the same checkpoint: the next batch applies only NEW
    // commits against the committed predecessor snapshot
    Seq((6L, "k2", 9L)).toDF("id", "k", "m")
      .write.format("graftmanifest").mode(SaveMode.Append).save(root)
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(viewSet(viewDir) == liveSet(root))
      assert(viewSet(viewDir).contains(("k2", 1L, 9L)))
    } finally q2.stop()
  }
}
