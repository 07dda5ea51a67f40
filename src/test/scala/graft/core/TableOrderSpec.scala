package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Sort order as a TABLE PROPERTY (round-18 verdict task 7): the
  * declared clustering lives in the manifest header, survives
  * unrelated commits, and every partition rewrite (compaction,
  * erasure) re-applies it — so envelope skipping survives maintenance
  * without operator discipline.
  */
class TableOrderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp = tmpDir("table-order")
  private var n = 0
  private def freshRoot(): String = { n += 1; s"$tmp/t$n" }
  private def fs = new Path(tmp).getFileSystem(spark.sessionState.newHadoopConf())

  /** A day-partitioned table whose rows are SHUFFLED within each day
    * (hash-scattered ts), so only a re-sort can make envelopes tight.
    */
  private def build(root: String): Unit =
    ManifestWrite.write(
      spark.range(0, 4000).select(
        // scatter: iterate ids in a hashed order so natural file order
        // carries no ts clustering
        (col("id") * 2654435761L % 4000).as("ts"),
        (col("id") % 97).as("k"),
        concat(lit("d"), col("id") % 2).as("day")),
      root, "day", SaveMode.Overwrite)

  private def tsEnvelopes(root: String, part: String): Seq[(Long, Long)] = {
    val m = ManifestTable.resolve(fs, new Path(root)).get
    m.entries.filter(_.part == part).flatMap(_.allStats).flatMap(st =>
      st.cols.find(_.col == "ts").flatMap(c =>
        for { mn <- c.min; mx <- c.max } yield (mn.toLong, mx.toLong)))
  }

  test("sort: persisted, survives commits, compaction re-sorts, files disjoint") {
    val root = freshRoot()
    build(root)
    TableOrder.set(spark, root, "sort:ts")
    assert(ManifestTable.resolve(fs, new Path(root)).get.order == "sort:ts")
    // an unrelated commit (a merge) CARRIES the property
    ManifestMerge(root, Seq("ts"))
      .whenMatchedUpdate(Map("k" -> ((_, _) => lit(-5L))))
      .run(Seq(1L).toDF("ts")): Unit
    assert(ManifestTable.resolve(fs, new Path(root)).get.order == "sort:ts")
    // compaction applies the property: 4 files per partition with
    // DISJOINT ts ranges
    graft.operators.StorageOps.compactDays(spark, root, Seq("d0", "d1"),
      filesPerPartition = 4)
    assert(ManifestTable.resolve(fs, new Path(root)).get.order == "sort:ts")
    val envs = tsEnvelopes(root, "d0").sortBy(_._1)
    assert(envs.size >= 3, s"expected >=3 enveloped files, got $envs")
    envs.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"file ts ranges overlap after ordered compaction: $envs")
      case _ => ()
    }
    // skipping fires: a narrow ts range selects a strict subset of files
    val idx = new ManifestFileIndex(spark, new Path(root), "day")
    val all = idx.listFiles(Nil, Nil).map(_.files.length).sum
    val lo = envs.head._2 // inside the first file's range only
    val few = idx.listFiles(Nil, Seq(
      org.apache.spark.sql.catalyst.expressions.LessThan(
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "ts", org.apache.spark.sql.types.LongType)(),
        org.apache.spark.sql.catalyst.expressions.Literal(lo, org.apache.spark.sql.types.LongType))))
      .map(_.files.length).sum
    assert(few < all, s"skipping did not fire: $few of $all files")
    // values stay exact across the ordered compaction
    val df = ManifestFileIndex.relation(spark, root, "day")
    assert(df.count() == 4000)
    assert(df.filter(col("k") === -5L).count() == 1)
  }

  test("zorder: both dimensions' envelopes tighten; values exact") {
    val root = freshRoot()
    build(root)
    TableOrder.set(spark, root, "zorder:ts,k")
    graft.operators.StorageOps.compactDays(spark, root, Seq("d0"),
      filesPerPartition = 8)
    val m = ManifestTable.resolve(fs, new Path(root)).get
    def widths(colName: String): Seq[Long] =
      m.entries.filter(_.part == "d0").flatMap(_.allStats).flatMap(st =>
        st.cols.find(_.col == colName).flatMap(c =>
          for { mn <- c.min; mx <- c.max } yield mx.toLong - mn.toLong))
    val full = 4000L
    val tsW = widths("ts")
    val kW = widths("k")
    assert(tsW.nonEmpty && kW.nonEmpty)
    // a z-curve bounds BOTH dims per file: average envelope strictly
    // narrower than the whole domain on each
    assert(tsW.sum / tsW.size < full * 3 / 4, s"ts envelopes not tightened: $tsW")
    assert(kW.sum / kW.size < 97 * 3 / 4, s"k envelopes not tightened: $kW")
    val df = ManifestFileIndex.relation(spark, root, "day")
    assert(df.filter(col("day") === "d0").count() == 2000)
    assert(df.agg(sum("ts")).head().getLong(0) ==
      (0 until 4000).map(i => i * 2654435761L % 4000).sum)
  }

  test("refusals: unknown kind, partition column, unmapped-unknown column") {
    val root = freshRoot()
    build(root)
    intercept[IllegalArgumentException] { TableOrder.set(spark, root, "cluster:ts") }
    intercept[IllegalArgumentException] { TableOrder.set(spark, root, "sort:day") }
    intercept[IllegalArgumentException] { TableOrder.set(spark, root, "nope") }
    intercept[IllegalArgumentException] { TableOrder.set(spark, root, "sort:missing") }
    intercept[IllegalArgumentException] { TableOrder.set(spark, root, "zorder:ts") }
    // clearing works
    TableOrder.set(spark, root, "sort:ts")
    TableOrder.set(spark, root, "")
    assert(ManifestTable.resolve(fs, new Path(root)).get.order == "")
  }
}
