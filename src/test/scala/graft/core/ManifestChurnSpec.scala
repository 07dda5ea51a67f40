package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Round-13 verdict task 2: manifest ENDURANCE. One day-partitioned
  * table on copy-rename (S3A-semantics) storage, 200+ interleaved
  * compact / erase / append-commit cycles with gc at the production
  * grace window ([[ManifestTable.KeepCommits]]) and concurrent readers
  * resolving + reading throughout. Per cycle the spec asserts:
  *
  *   - live-read correctness: the full table content equals the
  *     tracked expected state, value-exact, every cycle;
  *   - bounded history: every on-disk `g-*` directory is named by one
  *     of the KeepCommits kept commits — debris is bounded by the
  *     grace window, not by churn count;
  *   - bounded scan legs: periodic consolidation (compacting the
  *     appended tail) keeps the newest manifest's generation-group
  *     count — one scan leg each — under a fixed cap;
  *   - `_commits/` stays flat: retirement keeps the listing at
  *     ≤ KeepCommits(+1 in-flight) files forever, so resolve cost
  *     cannot grow with 200 cycles of history.
  *
  * The second test documents the Delta-VACUUM caveat empirically: a
  * reader plan resolved against an old commit survives ONE rewrite
  * under the production window, and breaks only when gc is forced
  * below the window — the contract every snapshot table format ships,
  * proven here rather than claimed.
  *
  * Measured resolve/cycle costs land in `target/churn_metrics.json`
  * (quoted in SCALING.md §13).
  */
class ManifestChurnSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("memfs://shared/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def freshStore(): Unit = {
    MemFsStore.clear()
    MemFsStore.renameAsCopy = true
    spark.sparkContext.hadoopConfiguration
      .set("fs.memfs.impl", classOf[MemFs].getName)
  }

  test("200+ compact/erase/append cycles under concurrent readers: value-exact, bounded history, flat commit listing") {
    freshStore()
    val root = "memfs://shared/churn/events"
    val rootPath = new Path(root)

    // expected state the churn maintains: day -> (user_id -> amount)
    val expected = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Map[Long, Long]]
    var nextUser = 1L
    def seedDay(day: String, n: Int): Seq[(Long, Long)] = {
      val rows = (1 to n).map { _ =>
        val u = nextUser; nextUser += 1; (u, u * 10)
      }
      expected(day) = scala.collection.mutable.Map(rows: _*)
      rows
    }
    val baseDays = (1 to 6).map(i => f"2024-01-$i%02d")
    val seed = baseDays.flatMap(d => seedDay(d, 30).map { case (u, a) => (u, a, d) })
    seed.toDF("user_id", "amount", "day")
      .repartition(2).write.partitionBy("day").parquet(root)

    def liveDf = graft.operators.StorageOps.readDayLayout(spark, root)
    def collectState(): Map[String, Map[Long, Long]] =
      liveDf.select($"day".cast("string"), $"user_id", $"amount")
        .collect().groupBy(_.getString(0))
        .map { case (d, rs) => d -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    def expectedState(): Map[String, Map[Long, Long]] =
      expected.map { case (d, m) => d -> m.toMap }.toMap

    // concurrent readers: resolve + full count in a loop for the whole
    // churn. Every observed count must be a state the writer published
    // at SOME point (accumulate-only: a reader iteration may span
    // several writer cycles — single-writer value-exactness is pinned
    // by the per-cycle collectState, not by the readers).
    val validCounts = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    validCounts.add(expected.values.map(_.size).sum.toLong)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readerFail = new java.util.concurrent.atomic.AtomicReference[String](null)
    val readerIters = new java.util.concurrent.atomic.AtomicLong(0)
    val windowMisses = new java.util.concurrent.atomic.AtomicLong(0)
    val readers = (1 to 2).map { _ =>
      new Thread(() => {
        while (!stop.get() && readerFail.get() == null) {
          try {
            val n = liveDf.count()
            if (!validCounts.contains(n))
              readerFail.compareAndSet(null, s"reader saw count $n never published")
            readerIters.incrementAndGet()
          } catch {
            // a reader slower than the KeepCommits grace window can
            // lose its files to gc — Delta's documented VACUUM caveat
            // (second test). Must be RARE; a wrong VALUE never.
            case _: Throwable => windowMisses.incrementAndGet()
          }
          // paced, not spinning: unthrottled readers monopolize the 4
          // local cores and triple the wall without probing anything new
          Thread.sleep(300)
        }
      }, "churn-reader")
    }
    readers.foreach(_.start())

    val cycles = 204
    var appendSeq = 0
    val unconsolidated = scala.collection.mutable.ArrayBuffer.empty[String]
    val eraseCandidates = scala.collection.mutable.Queue.empty[Long]
    val resolveNanos = scala.collection.mutable.ArrayBuffer.empty[Long]
    val cycleMillis = scala.collection.mutable.ArrayBuffer.empty[Long]
    val commitListSizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    var legsMax = 0
    // generations named by the newest commit, one cycle ago (the other
    // half of the KeepCommits=2 grace window)
    var prevKeptGens = Set.empty[String]

    (1 to cycles).foreach { i =>
      val t0 = System.nanoTime()
      val preCount = expected.values.map(_.size).sum.toLong
      if (unconsolidated.size >= 5) {
        // CONSOLIDATE the appended tail into one generation — the
        // production lever that keeps scan legs bounded under churn
        graft.operators.StorageOps.compactDays(spark, root, unconsolidated.toSeq)
        unconsolidated.clear()
      } else i % 3 match {
        case 1 => // COMPACT one rotating base day — content must not move
          val day = baseDays((i / 3) % baseDays.size)
          graft.operators.StorageOps.compactDays(spark, root, Seq(day))
        case 2 => // ERASE one user — exactly one known row disappears.
          // Round-robin across days so no partition ever empties (an
          // emptied partition is dropped from the manifest — correct,
          // but the compact rotation needs its base days present)
          if (eraseCandidates.isEmpty) {
            val byDay = expected.toSeq.sortBy(_._1).map(_._2.keys.toSeq.sorted)
            val maxLen = byDay.map(_.size).max
            eraseCandidates ++= (0 until maxLen)
              .flatMap(k => byDay.flatMap(_.lift(k))).take(80)
          }
          val u = eraseCandidates.dequeue()
          validCounts.add(preCount - expected.values.count(_.contains(u)))
          graft.operators.StorageOps.eraseUsers(spark, root, Seq(u))
          expected.values.foreach(_.remove(u))
          ()
        case _ => // APPEND-COMMIT a new mini partition via the raw protocol
          appendSeq += 1
          // a real date (partition inference types `day` as DATE from
          // the base partitions), in 2025 so it never collides
          val day = f"2025-${(appendSeq - 1) / 28 + 1}%02d-${(appendSeq - 1) % 28 + 1}%02d"
          val rows = seedDay(day, 5)
          validCounts.add(preCount + rows.size)
          val gen = ManifestTable.GenPrefix + java.util.UUID.randomUUID().toString.take(8)
          val outDir = s"$gen/day=$day"
          rows.toDF("user_id", "amount").coalesce(1)
            .write.mode("error").parquet(s"$root/$outDir")
          fs.delete(new Path(s"$root/$outDir/_SUCCESS"), false)
          ManifestTable.commit(fs, rootPath, "day",
            Map(day -> Some(ManifestEntry(day, outDir, Nil))))
          ManifestTable.gc(fs, rootPath)
          unconsolidated += day
          ()
      }

      // live-read correctness EVERY cycle, value-exact
      val got = collectState()
      val want = expectedState()
      assert(got == want, {
        val days = (got.keySet ++ want.keySet).filter(d => got.get(d) != want.get(d))
        s"cycle $i diverged on days $days"
      })

      // bounded history + flat listing
      val rt0 = System.nanoTime()
      val m = ManifestTable.resolve(fs, rootPath).get
      resolveNanos += System.nanoTime() - rt0
      val keptGens = m.entries.map(_.dir.split('/').head).filter(_.nonEmpty).toSet
      val legs = m.entries.map(_.dir.split('/').head).distinct.size
      legsMax = math.max(legsMax, legs)
      assert(legs <= 30, s"cycle $i: scan legs unbounded ($legs) — consolidation broken?")
      val commitList = fs.listStatus(new Path(rootPath, ManifestTable.CommitsDir)).length
      commitListSizes += commitList
      assert(commitList <= ManifestTable.KeepCommits + 1, // +1: a commit may be landing
        s"cycle $i: _commits listing grew to $commitList")
      // every on-disk generation is named by the newest or the
      // previous kept commit — crash-free churn leaves no other debris
      val onDisk = fs.listStatus(rootPath).map(_.getPath.getName)
        .filter(_.startsWith(ManifestTable.GenPrefix)).toSet
      val stray = onDisk -- keptGens -- prevKeptGens
      assert(stray.isEmpty, s"cycle $i: unreferenced generations survived gc: $stray")
      prevKeptGens = keptGens
      cycleMillis += (System.nanoTime() - t0) / 1000000
    }

    stop.set(true); readers.foreach(_.join(20000))
    assert(readerFail.get() == null, String.valueOf(readerFail.get()))
    assert(readerIters.get() >= 20, s"readers barely ran: ${readerIters.get()}")
    // window misses (Delta-VACUUM caveat) must be rare, never systematic
    assert(windowMisses.get() <= math.max(3, readerIters.get() / 10),
      s"${windowMisses.get()} window misses in ${readerIters.get()} reads")

    // resolve cost must stay flat-in-churn: compare deciles; partition
    // count grew 6 -> ~70 (manifest bytes ~12x), allow that plus noise,
    // never churn-linear growth
    val dec = math.max(1, resolveNanos.size / 10)
    val firstAvg = resolveNanos.take(dec).sum.toDouble / dec
    val lastAvg = resolveNanos.takeRight(dec).sum.toDouble / dec
    val parts = ManifestTable.resolve(fs, rootPath).get.entries.size
    assert(lastAvg <= math.max(firstAvg * 48, 20e6),
      f"resolve cost grew superlinearly: ${firstAvg / 1e6}%.2f ms -> ${lastAvg / 1e6}%.2f ms")
    val metrics = Map(
      "cycles" -> cycles.toString,
      "final_partitions" -> parts.toString,
      "reader_iterations" -> readerIters.get().toString,
      "reader_window_misses" -> windowMisses.get().toString,
      "resolve_ms_first_decile" -> f"${firstAvg / 1e6}%.3f",
      "resolve_ms_last_decile" -> f"${lastAvg / 1e6}%.3f",
      "commit_listing_max" -> commitListSizes.max.toString,
      "scan_legs_max" -> legsMax.toString,
      "cycle_ms_median" -> cycleMillis.sorted.apply(cycleMillis.size / 2).toString)
    val json = metrics.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.write(java.nio.file.Paths.get("target/churn_metrics.json"),
      json.getBytes("UTF-8"))
    info(s"churn metrics: $json")
    MemFsStore.clear()
  }

  test("reader-during-gc at low grace: one rewrite under the production window is safe; gc below the window breaks the stale plan (Delta-VACUUM caveat, empirically)") {
    freshStore()
    val root = "memfs://shared/churn/vacuum"
    val days = Seq("2024-03-01", "2024-03-02")
    days.zipWithIndex.flatMap { case (d, di) =>
      (1 to 20).map(i => (di * 100L + i, i * 2L, d))
    }.toDF("user_id", "amount", "day")
      .repartition(2).write.partitionBy("day").parquet(root)

    // actions that must READ BYTES are what the gc window protects;
    // count() is no longer one of them (ManifestMetadataAggRule
    // answers it from the plan's own resolved snapshot, zero file
    // opens — registered here so the outcome is suite-order-proof)
    graft.plans.ManifestMetadataAgg.ensure(spark)
    def scanSum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(org.apache.spark.sql.functions.sum("amount")).head().getLong(0)

    // plan a reader against the CURRENT commit, execute once
    graft.operators.StorageOps.compactDays(spark, root, Seq(days.head))
    val stalePlan = graft.operators.StorageOps.readDayLayout(spark, root)
    assert(scanSum(stalePlan) == 840L) // the plan's file list is now pinned

    // ONE rewrite + production gc: the stale plan still executes —
    // KeepCommits=2 keeps its generation alive (the grace window)
    graft.operators.StorageOps.compactDays(spark, root, Seq(days.head))
    assert(scanSum(stalePlan) == 840L,
      "production grace window failed to protect a one-rewrite-old reader")

    // a SECOND rewrite plus gc forced below the window retires the
    // stale plan's files. A METADATA action still answers — exactly,
    // from the stale plan's own snapshot — because it never touches
    // the retired bytes…
    graft.operators.StorageOps.compactDays(spark, root, Seq(days.head))
    ManifestTable.gc(fs, new Path(root), keepCommits = 1, orphanRetentionMs = 0L)
    assert(stalePlan.count() == 40,
      "a metadata-answered count should survive below-window gc (snapshot-exact)")
    // …while any byte-reading action breaks: the same caveat Delta
    // documents for VACUUM with retention shorter than the
    // longest-running query; the mitigation is the window (readers
    // never coordinate with gc on any snapshot table format).
    val broke =
      try { scanSum(stalePlan); false }
      catch { case _: Throwable => true }
    assert(broke, "expected the below-window gc to break the stale SCAN " +
      "(if this starts passing, the read path began re-resolving per action — " +
      "update the caveat doc)")
    // fresh resolves are untouched throughout
    assert(graft.operators.StorageOps.readDayLayout(spark, root).count() == 40)
    MemFsStore.clear()
  }
}
