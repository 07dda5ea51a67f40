package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Segment-level stats pruning (round-18 verdict task 2 — the Iceberg
  * manifest-list column-summary tier): each `~seg` commit line carries
  * the bucket's AGGREGATE envelope, and a data-filtered read of a
  * segmented column-mapped table evaluates pushed filters against the
  * aggregates FIRST, fetching only the surviving buckets — plus exact
  * bucket mapping for partition-equality filters. Conservatism is the
  * only correctness property: pruned and unpruned reads must agree on
  * every row.
  */
class ManifestSegmentAggSpec extends SparkSpec {

  private lazy val tmp = tmpDir("seg-agg")
  private var n = 0
  private def freshRoot(): String = { n += 1; s"$tmp/t$n" }
  private def fs = new Path(tmp).getFileSystem(spark.sessionState.newHadoopConf())

  private def withThresholds[A](f: => A): A = {
    val (s0, f0, t0) = (ManifestTable.SegmentizeBytes,
      ManifestTable.SegmentizeFloor, ManifestTable.SegmentTargetBytes)
    ManifestTable.SegmentizeBytes = 1500
    ManifestTable.SegmentizeFloor = 400
    ManifestTable.SegmentTargetBytes = 700
    try f finally {
      ManifestTable.SegmentizeBytes = s0
      ManifestTable.SegmentizeFloor = f0
      ManifestTable.SegmentTargetBytes = t0
    }
  }

  /** A mapped, day-partitioned, SEGMENTED table: 48 partitions, and a
    * `grp` column equal to the partition's segment bucket — the
    * partition-correlated-column shape (one tenant per bucket) where
    * aggregate envelopes are selective. `id` is globally scattered so
    * its envelope proves the conservative keep-everything case.
    */
  private def buildTable(): (String, Manifest) = withThresholds {
    val root = freshRoot()
    val parts = (0 until 48).map(i => f"2024-d$i%02d")
    // discover the bucket count this size lands on by building once
    val df0 = spark.range(0, 48 * 20).select(
      col("id"),
      (col("id") % 48).cast("int").as("pidx"))
    val withDay = df0.withColumn("day",
      concat(lit("2024-d"), lpad(col("pidx").cast("string"), 2, "0")))
    ManifestWrite.write(withDay.select(col("id"), lit(0).as("grp"), col("day")),
      root, "day", SaveMode.Overwrite)
    var m = ManifestTable.resolve(fs, new Path(root)).get
    assert(m.segRefs.nonEmpty, "table must be segmented at these thresholds")
    assert(m.cols.nonEmpty, "table must be column-mapped")
    // rebuild with grp = the partition's bucket id (now that the
    // bucket count is known); one retry in case the count shifts with
    // the slightly different entry bytes
    var attempts = 0
    while (attempts < 3) {
      attempts += 1
      val b = m.segRefs.head.of
      val grp = udf((day: String) =>
        math.floorMod(ManifestTable.frozenStringHash(day), b))
      ManifestWrite.write(
        withDay.select(col("id"), grp(col("day")).as("grp"), col("day")),
        root, "day", SaveMode.Overwrite)
      m = ManifestTable.resolve(fs, new Path(root)).get
      assert(m.segRefs.nonEmpty)
      if (m.segRefs.head.of == b) attempts = 99
    }
    assert(attempts == 99, "bucket count failed to converge across rebuilds")
    assert(m.segRefs.size > 1, s"need >1 bucket, got ${m.segRefs.size}")
    assert(m.segRefs.forall(_.agg.isDefined), "every segment must carry an aggregate")
    val _ = parts
    (root, m)
  }

  test("partition-equality filter fetches exactly its hash bucket") {
    val (root, m) = buildTable()
    ManifestTable.segmentCacheClear()
    val base = ManifestTable.segmentFetches.sum()
    val df = ManifestFileIndex.relation(spark, root, "day")
      .filter(col("day") === "2024-d07")
    val got = df.agg(sum("id")).head().getLong(0)
    val fetched = ManifestTable.segmentFetches.sum() - base
    assert(fetched <= 1, s"expected ≤1 bucket fetch of ${m.segRefs.size}, got $fetched")
    val expect = (0 until 48 * 20).filter(_ % 48 == 7).map(_.toLong).sum
    assert(got == expect)
  }

  test("data filter on a bucket-correlated column prunes to the matching buckets") {
    val (root, m) = buildTable()
    val target = m.segRefs.map(_.bucket).max // an existing bucket id
    ManifestTable.segmentCacheClear()
    val base = ManifestTable.segmentFetches.sum()
    val df = ManifestFileIndex.relation(spark, root, "day")
      .filter(col("grp") === target)
    val cnt = df.count()
    val fetched = ManifestTable.segmentFetches.sum() - base
    assert(fetched < m.segRefs.size,
      s"expected < ${m.segRefs.size} bucket fetches, got $fetched")
    assert(cnt > 0)
    // parity: the pruned read equals the full read, row for row
    ManifestTable.segmentCacheClear()
    val full = ManifestFileIndex.relation(spark, root, "day")
      .collect().map(_.toString).sorted
    ManifestTable.segmentCacheClear()
    val lazyAll = ManifestFileIndex.relation(spark, root, "day")
      .filter(col("grp") >= 0).collect().map(_.toString).sorted
    assert(full.toSeq == lazyAll.toSeq, "pruning changed results")
  }

  test("conservatism: scattered-column filters keep every needed bucket; values exact") {
    val (root, _) = buildTable()
    // `id` is scattered across all buckets — aggregates prove nothing,
    // every bucket is (correctly) kept and values match exactly
    val df = ManifestFileIndex.relation(spark, root, "day")
    val picked = df.filter(col("id") % 97 === 0).agg(sum("id")).head().getLong(0)
    val expect = (0 until 48 * 20).filter(_ % 97 == 0).map(_.toLong).sum
    assert(picked == expect)
    // full-scan aggregate over the lazy index
    assert(df.count() == 48 * 20)
    assert(df.agg(sum("id")).head().getLong(0) == (0 until 48 * 20).map(_.toLong).sum)
  }

  test("metadata aggregates and history still see the complete table in lazy mode") {
    val (root, _) = buildTable()
    val df = ManifestFileIndex.relation(spark, root, "day")
    // count(*) goes through the metadata-aggregate path on a clean table
    assert(df.count() == 48 * 20)
    assert(df.select(min("day"), max("day")).head().toSeq ==
      Seq("2024-d00", "2024-d47"))
    val hist = ManifestTable.history(spark, root)
    val cur = hist.filter(col("is_current")).head()
    assert(cur.getAs[Long]("row_count") == 48 * 20)
    // segment-tier observability (round-18 task 6): segment count and
    // metadata bytes are user-visible per version
    val m = ManifestTable.resolve(fs, new Path(root)).get
    assert(cur.getAs[Int]("n_segments") == m.segRefs.size)
    assert(cur.getAs[Long]("segment_bytes") == m.segRefs.map(_.bytes).sum)
    assert(cur.getAs[Int]("n_segments") > 1)
  }

  test("merge and time travel keep working on an agg-segmented table") {
    val (root, _) = buildTable()
    val v0 = ManifestTable.resolve(fs, new Path(root)).get.seq
    ManifestMerge(root, Seq("id"))
      .whenMatchedUpdate(Map("grp" -> ((_, _) => lit(-1))))
      .run(spark.range(0, 10).select(col("id"))): Unit
    val df = ManifestFileIndex.relation(spark, root, "day")
    assert(df.filter(col("grp") === -1).count() == 10)
    assert(df.count() == 48 * 20)
    val old = ManifestFileIndex.relation(spark, root, "day", asOfSeq = Some(v0))
    assert(old.filter(col("grp") === -1).count() == 0)
  }
}
