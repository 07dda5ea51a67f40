package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Evidence for the q134-q137 storage/profiling tier:
  *   - partition pruning: the 7-day rollup's scan must LIST 7 of the
  *     30 `day=` directories (file-listing-time pruning, not a
  *     post-read filter);
  *   - compaction: the ingest-fragmented layout folds ≥4× in file
  *     count while the ROW SET is bit-identical in both directions;
  *   - sort-order row-group skipping: footer min/max envelopes on the
  *     sorted layout exclude ~all row groups for a one-month window,
  *     while the round-robin control (same writer, same data) can
  *     exclude none — the layout, not the writer, prunes;
  *   - schema-driven profiler: generated aggregates agree with
  *     directly-computed per-column answers; the approx variant drops
  *     the multi-DISTINCT Expand from the plan.
  */
class StorageLayoutSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
    case q: QueryStageExec => scansOf(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case other =>
      (other.children ++ other.subqueries).flatMap(scansOf)
  }

  test("q134 partition pruning: scan lists exactly the 7 filtered day= partitions") {
    val df = StorageOps.partitionPrunedRollup(spark, dir)
    df.collect() // finalize the adaptive plan before inspecting it
    val scans = scansOf(df.queryExecution.executedPlan)
      .filter(_.partitionFilters.nonEmpty)
    assert(scans.nonEmpty, "no partition-filtered scan in q134's plan")
    val nSelected = scans.head.selectedPartitions.partitionCount
    assert(nSelected == 7, s"expected 7 pruned partitions, scan lists $nSelected")
    val (_, comp) = StorageOps.ensureEventLayouts(spark, dir)
    val totalDays = new java.io.File(comp).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("day="))
    assert(totalDays == 30, s"fixture should span 30 days, found $totalDays")
  }

  test("q135 compaction: ≥4x file fold, one file per partition, row set identical") {
    val (frag, comp) = StorageOps.ensureEventLayouts(spark, dir)
    val nFrag = StorageOps.parquetFileCount(spark, frag)
    val nComp = StorageOps.parquetFileCount(spark, comp)
    assert(nComp == 30, s"compacted layout should hold 1 file/day=30, found $nComp")
    assert(nFrag >= 4 * nComp, s"ingest fixture not fragmented: $nFrag vs $nComp")
    val a = spark.read.parquet(frag)
    val b = spark.read.parquet(comp).select(a.columns.map(col).toSeq: _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "compaction changed the row set")
    // and the layouts carry exactly the source rows (day derivation aside)
    val src = Tables.load(spark, dir, "events")
    assert(b.drop("day").exceptAll(src).isEmpty &&
      src.exceptAll(b.drop("day")).isEmpty,
      "compacted layout diverged from the source table")
  }

  test("incremental compaction rewrites only the target partitions via a manifest commit") {
    val (frag, _) = StorageOps.ensureEventLayouts(spark, dir)
    // work on a private copy — the shared layout must stay fragmented
    val work = tmpDir("graft-compact-incr")
    val src = new java.io.File(frag)
    def copyTree(from: java.io.File, to: java.io.File): Unit = {
      to.mkdirs()
      from.listFiles().foreach { f =>
        val t = new java.io.File(to, f.getName)
        if (f.isDirectory) copyTree(f, t)
        else java.nio.file.Files.copy(f.toPath, t.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    copyTree(src, new java.io.File(work))
    // the LIVE file set per partition, resolved through the manifest
    // (falls back to the plain day= dir before adoption)
    def liveFiles(day: String): Seq[(String, Long)] = {
      val root = new org.apache.hadoop.fs.Path(work)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      val dirPath = graft.core.ManifestTable.resolve(fs, root) match {
        case Some(m) =>
          val e = m.entries.find(_.part == day).getOrElse(
            fail(s"day=$day missing from manifest"))
          graft.core.ManifestTable.entryPaths(root, e).head
        case None => new org.apache.hadoop.fs.Path(root, s"day=$day")
      }
      fs.listStatus(dirPath).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(s => s.getPath.toString.stripPrefix(root.toString) -> s.getLen).sorted
    }
    // materialize BEFORE state now — the compaction replaces the live
    // set, so a lazy frame would re-list a state that no longer exists
    def snapshot(): Seq[String] =
      StorageOps.readDayLayout(spark, work).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val beforeSnap = snapshot()
    val untouchedBefore = liveFiles("2024-01-05")
    val targetBefore = liveFiles("2024-01-10").size
    assert(targetBefore > 1, "fixture day should start fragmented")

    StorageOps.compactDays(spark, work, Seq("2024-01-10", "2024-01-11"))

    assert(liveFiles("2024-01-10").size == 1 && liveFiles("2024-01-11").size == 1,
      "target partitions not folded to one file")
    // untouched partitions are carried BY REFERENCE: same absolute
    // files, same sizes — never rewritten, never moved
    assert(liveFiles("2024-01-05") == untouchedBefore,
      "untouched partition's files changed")
    assert(!new java.io.File(work).listFiles().exists(_.getName.contains(".tmp")),
      "staging dirs left behind")
    assert(snapshot() == beforeSnap,
      "incremental compaction changed the row set")
    // partition pruning survives the manifest read: selecting one day
    // resolves (and scans) exactly that partition's files
    val oneDay = StorageOps.readDayLayout(spark, work, Some(Set("2024-01-10")))
    assert(oneDay.inputFiles.length == 1, oneDay.inputFiles.mkString(", "))
    // plan shape (round 14): the manifest feeds ONE native FileScan
    // through ManifestFileIndex regardless of generation count — the
    // per-generation union legs (2 here: adopted + this rewrite) are
    // gone along with their fixed driver cost
    val legs = scansOf(StorageOps.readDayLayout(spark, work)
      .queryExecution.executedPlan).size
    assert(legs == 1, s"expected ONE single-scan leg, plan has $legs")
  }

  test("round 14: an interleaved erasure cannot be resurrected by a concurrent compaction") {
    val work = tmpDir("graft-erase-race") + "/t"
    spark.range(0, 100).select(
      (col("id") % 10).as("user_id"), col("id").as("event_id"),
      lit("2024-01-01").cast("date").as("day"))
      .repartition(4)
      .write.partitionBy("day").parquet(work)
    // the erasure of user 3 lands INSIDE the compaction's stale window:
    // after the compaction wrote its generation (from pre-erase files),
    // before its conditional commit. The pre-round-14 unconditional
    // commit would rewrite the victims back in and overwrite the
    // erasure's entry — the resurrection anomaly.
    val fired = new java.util.concurrent.atomic.AtomicInteger(0)
    StorageOps.beforeRewriteCommit = () =>
      if (fired.incrementAndGet() == 1) { StorageOps.eraseUsers(spark, work, Seq(3L)); () }
    try StorageOps.compactDays(spark, work, Seq("2024-01-01"))
    finally StorageOps.beforeRewriteCommit = () => ()
    // compaction attempt 1 + the erasure's own rewrite + the retry
    assert(fired.get() == 3, s"expected exactly one stale retry, hook fired ${fired.get()}")
    val live = StorageOps.readDayLayout(spark, work)
    assert(live.filter(col("user_id") === 3).count() == 0,
      "erased rows RESURRECTED by the concurrent compaction — lost update")
    assert(live.count() == 90, "compaction lost unrelated rows")
    // and the surviving partition really is compacted
    assert(StorageOps.readDayLayout(spark, work, Some(Set("2024-01-01")))
      .inputFiles.length == 1, "retry abandoned the compaction goal")
  }

  test("q136 row-group skipping: sorted footers exclude the window, control cannot") {
    val (sorted, control) = StorageOps.ensureSortedLineitem(spark, dir)
    def micros(iso: String): Long =
      java.time.LocalDate.parse(iso).atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.toEpochMilli * 1000L
    val (lo, hi) = (micros("1998-03-01"), micros("1998-04-01"))
    val (totS, ovS) = StorageOps.rowGroupOverlap(spark, sorted, "l_shipdate", lo, hi)
    val (totC, ovC) = StorageOps.rowGroupOverlap(spark, control, "l_shipdate", lo, hi)
    assert(totS >= 16 && totC >= 16, s"expected ≥16 row groups, got $totS / $totC")
    assert(ovS <= totS / 8,
      s"sorted layout should skip ≥7/8 of row groups: $ovS of $totS overlap")
    assert(ovC == totC,
      s"round-robin control must be unskippable, but $ovC of $totC overlap")
    // the predicate actually reaches the parquet reader
    val plan = StorageOps.sortedScanWindow(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      s"shipdate predicate not pushed:\n$plan")
  }

  test("q138 DPP: runtime dim filter becomes a partition filter, 7 of 30 days listed") {
    val df = StorageOps.dppRollup(spark, dir)
    df.collect() // DPP resolves at execution; finalize before inspecting
    val factScans = scansOf(df.queryExecution.executedPlan)
      .filter(_.partitionFilters.nonEmpty)
    assert(factScans.nonEmpty, "no partition-filtered scan in q138's plan")
    val scan = factScans.head
    assert(scan.partitionFilters.mkString(";").toLowerCase
      .contains("dynamicpruning"),
      s"partition filter is not dynamic: ${scan.partitionFilters}")
    // selectedPartitions is the STATIC listing (30 days); the runtime
    // filter prunes in dynamicallySelectedPartitions, reported through
    // the scan's numPartitions metric — the listing execution read
    val n = scan.metrics("numPartitions").value
    assert(n == 7, s"expected the 7 audit-day partitions, scan lists $n")
    assert(scan.selectedPartitions.partitionCount == 30,
      "static listing should still see all 30 days — the pruning is runtime-only")
    // and the values equal the literal-predicate equivalent
    val expected = StorageOps.partitionPrunedRollup(spark, dir) // shape probe only
    assert(df.columns.toSeq == expected.columns.toSeq)
  }

  test("q139 bloom join: might_contain pushed to the fact side, parent session untouched") {
    val before = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val df = StorageOps.bloomFilteredJoin(spark, dir)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"no runtime bloom filter in q139's plan:\n$plan")
    // and it actually FILTERS: the might_contain Filter must emit far
    // fewer rows than the fact scan feeds it (the whole point is
    // dropping non-joiners before the shuffle)
    def collectPlans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        collectPlans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectPlans(q.plan)
      case other => other +: (other.children ++ other.subqueries).flatMap(collectPlans)
    }
    val bloomFilters = collectPlans(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FilterExec
        if f.condition.toString.contains("might_contain") => f
    }
    assert(bloomFilters.nonEmpty, "no might_contain FilterExec found")
    val bf = bloomFilters.head
    val out = bf.metrics("numOutputRows").value
    val in = collectPlans(bf.child).collectFirst {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.getOrElse(0L)
    assert(in > 0 && out < in / 2,
      s"bloom filter barely filters: $out of $in fact rows survive")
    // correctness: must equal the same join in the plain session
    import spark.implicits._
    val control = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders")
        .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 150000.0),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        round(sum($"l_extendedprice"), 2).as("revenue"))
      .orderBy($"l_returnflag").collect()
    assert(rows.toSeq == control.toSeq, "bloom-filtered join changed the result")
    assert(spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold") == before,
      "q139 leaked its scoped conf into the parent session")
  }

  test("q140 z-order: row groups skip on BOTH dims where the 1-D sort covers one") {
    val zpath = StorageOps.ensureZorderLineitem(spark, dir)
    val (sorted, _) = StorageOps.ensureSortedLineitem(spark, dir)
    def micros(iso: String): Long =
      java.time.LocalDate.parse(iso).atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.toEpochMilli * 1000L
    val (dLo, dHi) = (micros("1996-01-01"), micros("1996-07-01"))
    // date dimension: both layouts skip (z partially, 1-D near-totally)
    val (totZ, ovZd) = StorageOps.rowGroupOverlap(spark, zpath, "l_shipdate", dLo, dHi)
    val (totS, ovSd) = StorageOps.rowGroupOverlap(spark, sorted, "l_shipdate", dLo, dHi)
    assert(totZ >= 16 && totS >= 16, s"expected ≥16 row groups, got $totZ / $totS")
    assert(ovZd < totZ, s"z-layout date envelopes skip nothing: $ovZd of $totZ")
    assert(ovSd <= totS / 4, s"1-D sorted layout should skip the quarter: $ovSd of $totS")
    // key dimension: ONLY the z-layout can skip — this is the claim
    val (_, ovZk) = StorageOps.rowGroupOverlap(spark, zpath, "l_suppkey", 0L, 2L)
    val (_, ovSk) = StorageOps.rowGroupOverlap(spark, sorted, "l_suppkey", 0L, 2L)
    assert(ovSk >= (totS * 9) / 10,
      s"1-D date sort should be helpless on suppkey, yet skips: $ovSk of $totS overlap")
    assert(ovZk <= (totZ * 3) / 4,
      s"z-layout should bound suppkey envelopes: $ovZk of $totZ overlap")
    assert(ovZk < ovSk, "z-layout not better than 1-D sort on the second dim")
    // the two-dim predicate reaches the reader
    val plan = StorageOps.zorderScanWindow(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_suppkey") &&
      plan.contains("l_shipdate"), s"predicates not pushed:\n$plan")
    // and the layout rewrite preserved the row set
    val a = spark.read.parquet(zpath)
    val src = Tables.load(spark, dir, "lineitem")
    assert(a.exceptAll(src).isEmpty && src.exceptAll(a).isEmpty,
      "z-order rewrite changed the row set")
  }

  test("q142 erase: only victim partitions rewritten, victims gone, rest byte-identical") {
    import spark.implicits._
    // synthetic layout where the victim lives in exactly 2 of 30 days —
    // the targeted-rewrite claim needs a victim with a FOOTPRINT
    val work = tmpDir("graft-erase") + "/layout"
    val base = Tables.load(spark, dir, "events")
      .filter($"user_id" =!= 9999L)
      .withColumn("day", to_date($"ts"))
    val victims = base.filter($"day".isin("2024-01-02", "2024-01-20"))
      .limit(40).withColumn("user_id", lit(9999L))
    base.unionByName(victims).repartition(col("day"))
      .write.partitionBy("day").parquet(work)
    // the LIVE per-partition file set through the manifest (identity
    // check: untouched partitions must resolve to the SAME absolute
    // files with the same bytes — carried by reference, not copied)
    def files(): Map[String, Seq[(String, Long)]] = {
      val root = new org.apache.hadoop.fs.Path(work)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      val entries = graft.core.ManifestTable.resolve(fs, root) match {
        case Some(m) => m.entries.map(e =>
          e.part -> graft.core.ManifestTable.entryPaths(root, e).head)
        case None => new java.io.File(work).listFiles().toSeq
          .filter(_.getName.startsWith("day=")).map(d =>
            d.getName.stripPrefix("day=") ->
              new org.apache.hadoop.fs.Path(root, d.getName))
      }
      entries.map { case (part, dirPath) =>
        part -> fs.listStatus(dirPath).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(s => s.getPath.toString -> s.getLen).sorted
      }.toMap
    }
    val before = files()
    val keepSnap = spark.read.parquet(work).filter($"user_id" =!= 9999L)
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

    val touched = StorageOps.eraseUsers(spark, work, Seq(9999L))

    assert(touched.sorted == Seq("2024-01-02", "2024-01-20"),
      s"erase rewrote the wrong partitions: $touched")
    val after = files()
    (before.keySet -- touched).foreach { d =>
      assert(after(d) == before(d), s"untouched partition $d changed")
    }
    def live() = StorageOps.readDayLayout(spark, work)
    assert(live().filter($"user_id" === 9999L).count() == 0,
      "victim rows survived the erase")
    val got = live()
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(got == keepSnap, "erase changed non-victim rows")
    assert(!new java.io.File(work).listFiles().exists(_.getName.contains(".tmp")),
      "staging dirs left behind")
    // idempotent: a re-run finds nothing to rewrite
    assert(StorageOps.eraseUsers(spark, work, Seq(9999L)).isEmpty,
      "re-run rewrote partitions that are already clean")
  }

  test("q143 bloom index: bitsets reject absent keys where zone maps cannot skip") {
    val (bloom, control) = StorageOps.ensureBloomLineitem(spark, dir)
    // zone maps are provably useless here: every row group's key
    // envelope overlaps any point in the domain (round-robin layout)
    // (≥3/4, not all: a random ~190-row slice of the key domain can
    // land its min just above a small probe key)
    val (totRG, ovRG) = StorageOps.rowGroupOverlap(spark, bloom, "l_orderkey", 19L, 20L)
    assert(totRG >= 16 && ovRG >= (totRG * 3) / 4,
      s"unsorted layout should have near-all-overlapping envelopes: $ovRG of $totRG")
    // the control twin carries no bloom index at all
    val (totC, idxC, _) = StorageOps.bloomAdmitCount(spark, control, "l_orderkey", 19L)
    assert(totC == totRG && idxC == 0,
      s"control should be index-free: $idxC of $totC indexed")
    // every row group indexed; an absent key is rejected (almost)
    // everywhere — that rejection IS the row-group skip
    val (tot, idx, admitAbsent) =
      StorageOps.bloomAdmitCount(spark, bloom, "l_orderkey", 999999941L)
    assert(idx == tot, s"bloom index missing from $idx of $tot row groups")
    assert(admitAbsent <= math.max(1, tot / 8),
      s"absent key admitted by $admitAbsent of $tot bitsets — index is not selective")
    // present keys are admitted somewhere (no false negatives)
    StorageOps.LookupKeys.foreach { k =>
      val (_, _, admit) = StorageOps.bloomAdmitCount(spark, bloom, "l_orderkey", k)
      assert(admit >= 1, s"key $k present in the data but rejected by every bitset")
    }
    // the predicate reaches the reader, and values match the control
    val df = StorageOps.bloomPointLookup(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_orderkey"),
      s"IN predicate not pushed:\n$plan")
    import spark.implicits._
    val viaControl = spark.read.parquet(control)
      .filter($"l_orderkey".isin(StorageOps.LookupKeys: _*))
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n_items"), round(sum($"l_quantity"), 2).as("sum_qty"))
      .orderBy($"l_orderkey").collect()
    assert(df.collect().toSeq == viaControl.toSeq,
      "bloom-indexed read diverged from the index-free control")
  }

  test("q137 profiler: generated aggregates match direct per-column answers") {
    val docs = Tables.load(spark, dir, "documents")
    val prof = PipelineOps.profile(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.keySet == docs.columns.toSet)
    for (c <- docs.columns) {
      val row = prof(c)
      assert(row.getLong(1) == docs.filter(col(c).isNull).count(),
        s"null count mismatch for $c")
      assert(row.getLong(2) == docs.select(c).na.drop().distinct().count(),
        s"distinct mismatch for $c")
      val mn = docs.agg(min(col(c)).cast("string")).head.getString(0)
      val mx = docs.agg(max(col(c)).cast("string")).head.getString(0)
      assert(row.getString(3) == mn && row.getString(4) == mx,
        s"min/max mismatch for $c")
    }
  }

  test("q137 approx mode: Expand leaves the plan, estimates stay within 10%") {
    val docs = Tables.load(spark, dir, "documents")
    val exactPlan = PipelineOps.profile(docs)
      .queryExecution.executedPlan.toString
    val approx = PipelineOps.profile(docs, exact = false)
    val approxPlan = approx.queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "exact multi-DISTINCT profile should plan via Expand")
    assert(!approxPlan.contains("Expand"),
      "approx profile must not need the Expand blow-up")
    val est = approx.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val truth = PipelineOps.profile(docs).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    for ((c, t) <- truth)
      assert(math.abs(est(c) - t) <= math.max(2L, (t * 0.10).toLong),
        s"approx distinct for $c: ${est(c)} vs exact $t")
  }
}
