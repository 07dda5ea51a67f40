package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 verdict task 6: PRICE the manifest read path.
  *
  * [[graft.core.ManifestTable.read]] unions one scan leg per live
  * generation group with a per-group `basePath`. q135/q142 exercise it
  * at a handful of partitions; this tool measures the overhead at a
  * realistic maintenance shape — 30+ day partitions where EVERY
  * partition has been independently compacted (worst case: one
  * generation group per partition, the maximum leg count the
  * gc-bounded window allows), against the identical data in one plain
  * `partitionBy` directory.
  *
  * Three reads are timed (min-of-N wall seconds, full-scan agg +
  * 3-partition selective agg each):
  *   - `plain`      : native `spark.read.parquet(root)`
  *   - `manifested` : ManifestTable.read at max legs (P groups)
  *   - `consolidated`: the same table after ONE whole-table
  *     compaction — every partition in a single generation, the
  *     1-leg shape periodic consolidation restores (ManifestChurnSpec
  *     holds the bound at 23 legs / 74 partitions).
  *
  * Usage: runMain graft.tools.ManifestReadBench <sfDir> [partitions] [iters]
  * Prints one JSON line; quoted in SCALING.md §12.
  */
object ManifestReadBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val parts = args.lift(1).map(_.toInt).getOrElse(36)
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.core.ManifestTable

    val work = java.nio.file.Files.createTempDirectory("manifest-read-bench").toString
    val events = graft.Tables.load(spark, sfDir, "events")
      .withColumn("day", date_add(lit("2024-01-01").cast("date"),
        pmod(col("event_id"), lit(parts)).cast("int")))
    val plainDir = s"$work/plain"
    val manifDir = s"$work/manifested"
    val consDir = s"$work/consolidated"
    events.repartition(col("day")).write.partitionBy("day").parquet(plainDir)
    Seq(manifDir, consDir).foreach(d =>
      events.repartition(col("day")).write.partitionBy("day").parquet(d))
    val days = (0 until parts).map(i =>
      java.time.LocalDate.parse("2024-01-01").plusDays(i).toString)

    // churn every partition INDIVIDUALLY: one generation group per
    // partition — the maximum leg count a gc-bounded table reaches
    days.foreach(d => graft.operators.StorageOps.compactDays(spark, manifDir, Seq(d)))
    // consolidated twin: one whole-table compaction, single group
    graft.operators.StorageOps.compactDays(spark, consDir, days)

    val fs = new Path(manifDir).getFileSystem(spark.sessionState.newHadoopConf())
    def legs(dir: String): Int = ManifestTable.resolve(fs, new Path(dir)).get
      .entries.map(_.dir.split('/').head).distinct.size
    require(legs(manifDir) == parts, s"expected $parts legs, got ${legs(manifDir)}")
    require(legs(consDir) == 1, s"expected 1 leg, got ${legs(consDir)}")

    val sel = days.take(3).toSet
    def fullScan(df: org.apache.spark.sql.DataFrame): Unit =
      { df.agg(sum("value"), count(lit(1))).head(); () }
    def time(f: () => Unit): Double =
      (1 to iters).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.min
    def scenario(tag: String, full: () => Unit, selective: () => Unit): Seq[(String, Double)] = {
      full(); selective() // warm (file listing caches, JIT)
      Seq(s"${tag}_full_sec" -> time(full), s"${tag}_sel3_sec" -> time(selective))
    }

    val results =
      scenario("plain",
        () => fullScan(spark.read.parquet(plainDir)),
        () => fullScan(spark.read.parquet(plainDir)
          .filter(col("day").cast("string").isin(sel.toSeq.sorted: _*)))) ++
      // the legacy union-leg read, priced for contrast (round 14: no
      // longer the production path)
      scenario("manifested_union",
        () => fullScan(ManifestTable.read(spark, manifDir, None, partCol = "day")),
        () => fullScan(ManifestTable.read(spark, manifDir, Some(sel), partCol = "day"))) ++
      // the production path since round 14: ManifestFileIndex single scan
      scenario("manifested",
        () => fullScan(graft.operators.StorageOps.readDayLayout(spark, manifDir)),
        () => fullScan(graft.operators.StorageOps.readDayLayout(spark, manifDir, Some(sel)))) ++
      scenario("consolidated",
        () => fullScan(graft.operators.StorageOps.readDayLayout(spark, consDir)),
        () => fullScan(graft.operators.StorageOps.readDayLayout(spark, consDir, Some(sel))))

    // resolve cost alone (driver-side, no scan)
    val rt = (1 to 50).map { _ =>
      val t0 = System.nanoTime()
      ManifestTable.resolve(fs, new Path(manifDir))
      (System.nanoTime() - t0) / 1e6
    }
    // full index construction (round 15): resolve + the scan's whole
    // FileStatus set. Stats-bearing manifests synthesize it with zero
    // filesystem listing calls, so the 36-generation table and the
    // 1-generation twin must cost the SAME — the row that proves
    // resolve cost is flat in file/generation count.
    def indexMs(dir: String): Double = (1 to 20).map { _ =>
      val t0 = System.nanoTime()
      val idx = new graft.core.ManifestFileIndex(spark, new Path(dir), "day")
      require(idx.sizeInBytes > 0)
      (System.nanoTime() - t0) / 1e6
    }.min
    // data-skipping evaluator overhead (round 15): listFiles now runs
    // ManifestSkipping.mayMatch per file against the pushed data
    // filters. Price the WORST case — every file evaluated, none
    // skippable (this fixture's per-file ts envelopes all span the
    // whole month, since partitioning is by event_id) — at max
    // fragmentation, vs the same listFiles with no data filter.
    val skipMs = {
      import org.apache.spark.sql.catalyst.expressions._
      import org.apache.spark.sql.types._
      val idx = new graft.core.ManifestFileIndex(spark, new Path(manifDir), "day")
      val ts = AttributeReference("ts", TimestampType)()
      val lo = Literal(1704844800000000L, TimestampType) // 2024-01-10 UTC µs
      val hi = Literal(1705449600000000L, TimestampType) // 2024-01-17 UTC µs
      val filters = Seq(GreaterThanOrEqual(ts, lo), LessThan(ts, hi))
      def timeList(fs: Seq[Expression]): Double = (1 to 20).map { _ =>
        val t0 = System.nanoTime()
        require(idx.listFiles(Nil, fs).nonEmpty)
        (System.nanoTime() - t0) / 1e6
      }.min
      (timeList(Nil), timeList(filters))
    }
    // metadata-aggregate pricing (round 15): count(*) answered from
    // the manifest (ManifestMetadataAggRule → LocalRelation, zero
    // tasks) vs the same count through the legacy scanning read.
    graft.plans.ManifestMetadataAgg.ensure(spark)
    def timeMs(f: () => Unit, n: Int = 10): Double = (1 to n).map { _ =>
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e6
    }.min
    val countMeta = timeMs(() =>
      { graft.operators.StorageOps.readDayLayout(spark, manifDir).count(); () })
    val countScan = timeMs(() =>
      { ManifestTable.read(spark, manifDir, None, partCol = "day").count(); () })

    // merge selectivity (round 16): touched-file count must track the
    // SOURCE's key width, not the table's file count — the whole point
    // of envelope-pruned MERGE at 100 TB. Fresh key-range-bucketed
    // copy per width so earlier merges don't reshape the file set.
    val mergeRows = Seq(10L, 100L, 1000L).map { width =>
      val dir = java.nio.file.Files.createTempDirectory(s"mrb-merge-$width").toString + "/t"
      val ev = graft.Tables.load(spark, sfDir, "events")
        .withColumn("day", org.apache.spark.sql.functions.to_date(col("ts")))
      graft.core.ManifestWrite.write(
        ev.repartitionByRange(8, col("event_id")), dir, "day",
        org.apache.spark.sql.SaveMode.Overwrite)
      val res = graft.core.ManifestMerge(dir, Seq("event_id"))
        .whenMatchedUpdate(Map("value" -> ((s, _) => s("nv"))))
        .run(spark.range(0, width).select(
          col("id").as("event_id"), org.apache.spark.sql.functions.lit(-1.0).as("nv")))
      width -> res
    }

    // change-feed pricing (round 16): consuming one captured merge's
    // delta via the CDF record vs the naive alternative — a two-sided
    // exceptAll diff of the snapshots. The feed is O(changed rows);
    // the diff shuffles the whole table TWICE. This gap is the reason
    // CDF exists; at 100 TB the diff is simply not runnable.
    val cdf = {
      def buildTwin(): String = {
        val dir = java.nio.file.Files.createTempDirectory("mrb-cdf").toString + "/t"
        val ev = graft.Tables.load(spark, sfDir, "events")
          .withColumn("day", org.apache.spark.sql.functions.to_date(col("ts")))
        graft.core.ManifestWrite.write(
          ev.repartitionByRange(8, col("event_id")), dir, "day",
          org.apache.spark.sql.SaveMode.Overwrite)
        dir
      }
      def mergeOnce(dir: String, capture: Boolean): Double = {
        val m = graft.core.ManifestMerge(dir, Seq("event_id"))
          .whenMatchedUpdate(Map("value" -> ((s, _) => s("nv"))))
        val t0 = System.nanoTime()
        (if (capture) m.withChangeFeed() else m)
          .run(spark.range(0, 1000).select(
            col("id").as("event_id"), org.apache.spark.sql.functions.lit(-2.0).as("nv")))
        (System.nanoTime() - t0) / 1e9
      }
      // capture overhead: the SAME 1000-key update on fresh twins, with
      // and without the record job — min-of-2, fresh table each run so
      // earlier merges don't reshape the file set
      val mergePlainSec = (1 to 2).map(_ => mergeOnce(buildTwin(), capture = false)).min
      val dir = buildTwin()
      val fsd = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
      val preSeq = ManifestTable.resolve(fsd, new Path(dir)).get.seq
      val mergeCdfSec = math.min(mergeOnce(buildTwin(), capture = true),
        mergeOnce(dir, capture = true))
      val postSeq = ManifestTable.resolve(fsd, new Path(dir)).get.seq
      val feedRows = graft.core.ManifestChanges
        .between(spark, dir, postSeq, postSeq).count()
      val feedMs = timeMs(() => {
        graft.core.ManifestChanges.between(spark, dir, postSeq, postSeq).count(); ()
      })
      val diffMs = timeMs(() => {
        val now = graft.operators.StorageOps.readDayLayout(spark, dir)
        val old = graft.core.ManifestFileIndex.relation(
          spark, dir, "day", asOfSeq = Some(preSeq))
        require(now.exceptAll(old).count() + old.exceptAll(now).count() > 0)
      }, n = 3)
      (feedRows, feedMs, diffMs, mergePlainSec, mergeCdfSec)
    }

    // segmented-commit pricing (round 17): commit COST must stay flat
    // as the table's file count grows 100x — the point of segment
    // files (the round-16 format serialized every live entry into
    // every commit, O(table) bytes, shedding envelopes table-wide at
    // 8 MB and going unreadable past the 16 MB cap). Synthetic
    // stats-bearing tables at three sizes, each priced on ONE-part
    // update commits (the steady-state shape), min-of-3.
    val segRows = {
      import graft.core.{ColStat, FileStat, ManifestEntry}
      def entry(p: String, files: Int) = ManifestEntry(p, s"day=$p", Nil,
        (0 until files).map(i => FileStat(f"part-$i%05d.parquet", 1000L + i, 500L + i,
          Seq(ColStat("event_id", 'i', Some((i * 100).toString),
            Some((i * 100 + 99).toString), 0L),
            ColStat("ts", 't', Some("1700000000000000"), Some("1700000086400000"), 0L)))))
      Seq(20, 200, 2000).map { partsN =>
        val dir = new Path(
          java.nio.file.Files.createTempDirectory(s"mrb-seg-$partsN").toString, "t")
        val sfs = dir.getFileSystem(spark.sessionState.newHadoopConf())
        val updates: Map[String, Option[ManifestEntry]] =
          (0 until partsN).map(i => f"d$i%04d" -> Some(entry(f"d$i%04d", 50))).toMap
        ManifestTable.commit(sfs, dir, "day", updates)
        val ms = (1 to 3).map { k =>
          val t0 = System.nanoTime()
          ManifestTable.commit(sfs, dir, "day",
            Map(f"d${k}%04d" -> Some(entry(f"d${k}%04d", 50))))
          (System.nanoTime() - t0) / 1e6
        }.min
        val m = ManifestTable.resolve(sfs, dir).get
        val cBytes = sfs.getFileStatus(new Path(new Path(dir,
          ManifestTable.CommitsDir), f"${m.seq}%020d")).getLen
        (partsN * 50, ms, cBytes, m.segRefs.size)
      }
    }

    // segment-aggregate pruning (round 18): a partition-equality read
    // of a segmented MAPPED table maps the value straight to its hash
    // bucket — metadata cost O(1) buckets instead of O(all); priced on
    // the 2000-part synthetic (128-bucket) shape. Data-filter pruning
    // via the aggregate envelopes is also measured with a key range
    // confined to few partitions — hash bucketing scatters partitions,
    // so the honest number is "fetched ≤ total" with the win coming
    // from partition-correlated columns (SCALING documents the trade).
    val segPrune = {
      import graft.core.{ColMapEntry, ColStat, FileStat, ManifestEntry, ManifestFileIndex}
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
      import org.apache.spark.sql.types.{LongType, StringType, TimestampType}
      import org.apache.spark.unsafe.types.UTF8String
      def entry(p: String, pIdx: Int, files: Int) = ManifestEntry(p, s"day=$p", Nil,
        (0 until files).map(i => FileStat(f"part-$i%05d.parquet", 1000L + i, 500L + i,
          Seq(ColStat("event_id", 'i', Some((pIdx * 10000 + i * 100).toString),
            Some((pIdx * 10000 + i * 100 + 99).toString), 0L)))))
      val dir = new Path(
        java.nio.file.Files.createTempDirectory("mrb-segprune").toString, "t")
      val sfs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val cols = Seq(ColMapEntry(1, "event_id", LongType.json),
        ColMapEntry(2, "ts", TimestampType.json))
      ManifestTable.commit(sfs, dir, "day",
        (0 until 2000).map(i => f"d$i%04d" -> Some(entry(f"d$i%04d", i, 50))).toMap,
        cols = Some(cols))
      val m = ManifestTable.resolve(sfs, dir).get
      val dayAttr = AttributeReference("day", StringType, nullable = false)()
      def run(filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
          data: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = {
        graft.core.ManifestTable.segmentCacheClear()
        val f0 = graft.core.ManifestTable.segmentFetches.sum()
        val t0 = System.nanoTime()
        val idx = new ManifestFileIndex(spark, dir, "day")
        val n = idx.listFiles(filters, data).map(_.files.length).sum
        val ms = (System.nanoTime() - t0) / 1e6
        (graft.core.ManifestTable.segmentFetches.sum() - f0, ms, n)
      }
      val (fAll, msAll, _) = run(Nil, Nil)
      val (fEq, msEq, nEq) = run(Seq(EqualTo(dayAttr,
        Literal(UTF8String.fromString("d0042"), StringType))), Nil)
      require(nEq == 50, s"partition-equality read returned $nEq files")
      val idAttr = AttributeReference("event_id", LongType)()
      val (fPoint, msPoint, _) = run(Nil, Seq(EqualTo(idAttr, Literal(421234L, LongType))))
      Seq(
        "segprune_buckets" -> m.segRefs.size.toString,
        "segprune_fetch_all" -> fAll.toString,
        "segprune_fetch_all_ms" -> f"$msAll%.3f",
        "segprune_fetch_day_eq" -> fEq.toString,
        "segprune_fetch_day_eq_ms" -> f"$msEq%.3f",
        "segprune_fetch_id_point" -> fPoint.toString,
        "segprune_fetch_id_point_ms" -> f"$msPoint%.3f")
    }

    val rows = spark.read.parquet(plainDir).count()
    val json = (Seq(
      "tool" -> "\"manifest-read-bench\"",
      "sf" -> s""""$sfDir"""",
      "partitions" -> parts.toString,
      "rows" -> rows.toString,
      "legs_manifested" -> legs(manifDir).toString,
      "iters" -> iters.toString,
      "resolve_ms_min" -> f"${rt.min}%.3f",
      "index_build_ms_manifested" -> f"${indexMs(manifDir)}%.3f",
      "index_build_ms_consolidated" -> f"${indexMs(consDir)}%.3f",
      "listfiles_ms_unfiltered" -> f"${skipMs._1}%.3f",
      "listfiles_ms_skip_eval" -> f"${skipMs._2}%.3f",
      "count_metadata_ms" -> f"$countMeta%.3f",
      "count_scan_ms" -> f"$countScan%.3f",
      "cdf_feed_rows" -> cdf._1.toString,
      "cdf_feed_ms" -> f"${cdf._2}%.3f",
      "cdf_snapshot_diff_ms" -> f"${cdf._3}%.3f",
      "merge_1000key_plain_sec" -> f"${cdf._4}%.3f",
      "merge_1000key_capture_sec" -> f"${cdf._5}%.3f") ++
      mergeRows.flatMap { case (w, r) => Seq(
        s"merge_w${w}_total_files" -> r.totalFiles.toString,
        s"merge_w${w}_candidates" -> r.candidateFiles.toString,
        s"merge_w${w}_touched" -> r.touchedFiles.toString) } ++
      segRows.flatMap { case (files, ms, cBytes, buckets) => Seq(
        s"seg_f${files}_commit_ms" -> f"$ms%.3f",
        s"seg_f${files}_commit_bytes" -> cBytes.toString,
        s"seg_f${files}_buckets" -> buckets.toString) } ++
      segPrune ++
      results.map { case (k, v) => k -> f"$v%.3f" })
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(json)
    spark.stop()
  }
}
