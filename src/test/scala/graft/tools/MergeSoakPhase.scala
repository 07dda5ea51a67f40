package graft.tools

import graft.core.{ManifestChanges, ManifestFileIndex, ManifestMerge, ManifestWrite, ManifestTable}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level MERGE [[SoakPhase]] (round 16): every iteration runs a
  * keyed, envelope-pruned merge against ONE day-partitioned manifested
  * table while [[KillSoak]] SIGKILLs the executors running its
  * find-touched scan and rewrite jobs — and a CONCURRENT READER
  * snapshots the table mid-merge, asserting atomicity: the 20-key
  * update window must read at ONE value (some committed iteration's),
  * never a torn mix, and the row count must never waver.
  *
  * Every third iteration additionally exercises delete+insert: a
  * 5-key delete merge followed by a not-matched insert merge that
  * restores the keys — the row count must be back to base at the
  * iteration's green check.
  *
  * All merges are CHANGE-CAPTURED (round 16): after each update the
  * newest commit's feed ([[ManifestChanges.between]]) must be the
  * exact delta — 20 `update_postimage` rows at this iteration's value
  * — and after each delete+insert round the insert commit's feed must
  * be the 5 restored rows. A kill mid-capture must never land a
  * commit whose feed disagrees with its data.
  */
final class MergeSoakPhase extends SoakPhase {

  def name: String = "merge"

  private val Rows = 300L
  private val WinLo = 100L
  private val WinHi = 120L // exclusive
  private val DelLo = 200L
  private val DelHi = 205L // exclusive

  def run(spark: SparkSession, stop: () => Boolean): (Int, Int) = {
    val root = java.nio.file.Files.createTempDirectory("soak-merge").toString + "/t"
    val base = spark.range(0, Rows).select(
      col("id"),
      lit(0L).as("v"),
      date_add(lit("2024-09-01").cast("date"), (col("id") % 3).cast("int")).as("day"))
    ManifestWrite.write(base.repartitionByRange(4, col("id")), root, "day", SaveMode.Overwrite)
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

    @volatile var readerTorn: String = null
    @volatile var reading = true
    val reader = new Thread(() => {
      while (reading) {
        try {
          val rows = ManifestFileIndex.relation(spark, root, "day")
            .filter(col("id") >= WinLo && col("id") < WinHi)
            .select("v").collect().map(_.getLong(0)).toSeq
          // atomic flip: the whole window reads ONE committed value
          if (rows.nonEmpty && rows.distinct.size != 1)
            readerTorn = s"window read mixed values ${rows.distinct.sorted}"
        } catch {
          case _: Throwable => () // a read racing gc/kill may fail; only TORN data is a finding
        }
        Thread.sleep(50)
      }
    }, "soak-merge-reader")
    reader.setDaemon(true)
    reader.start()

    var it = 0
    var green = 0
    while (!stop()) {
      it += 1
      val v = it.toLong
      try {
        // the newest commit's captured feed, filtered to one change type
        def feedAt(kind: String): Set[(Long, Long)] = {
          val latest = ManifestTable.resolve(fs, new Path(root)).get.seq
          ManifestChanges.between(spark, root, latest, latest)
            .filter(col("_change_type") === kind)
            .select("id", "v").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
        }
        def updateOnce(): Unit = {
          ManifestMerge(root, Seq("id"))
            .whenMatchedUpdate(Map("v" -> ((s, _) => s("nv"))))
            .withChangeFeed()
            .run(spark.range(WinLo, WinHi).select(col("id"), lit(v).as("nv")))
          ()
        }
        // a kill can abort the merge past task retries — the update is
        // idempotent by key+value, one serial re-run converges
        try updateOnce() catch { case _: Throwable => updateOnce() }
        // CDF green: the commit's feed IS the delta (kill-retried read)
        val wantPost = (WinLo until WinHi).map(i => (i, v)).toSet
        def postOk(): Boolean = feedAt("update_postimage") == wantPost
        val cdfUpdateOk = try postOk() catch { case _: Throwable => postOk() }
        var cdfInsertOk = true
        if (it % 3 == 0) {
          def deleteOnce(): Unit = {
            ManifestMerge(root, Seq("id")).whenMatchedDelete()
              .withChangeFeed()
              .run(spark.range(DelLo, DelHi).select(col("id")))
            ()
          }
          def insertOnce(): Unit = {
            ManifestMerge(root, Seq("id")).whenNotMatchedInsert()
              .withChangeFeed()
              .run(spark.range(DelLo, DelHi).select(
                col("id"), lit(v).as("v"),
                date_add(lit("2024-09-01").cast("date"), (col("id") % 3).cast("int")).as("day")))
            ()
          }
          try deleteOnce() catch { case _: Throwable => deleteOnce() }
          try insertOnce() catch { case _: Throwable => insertOnce() }
          val wantIns = (DelLo until DelHi).map(i => (i, v)).toSet
          def insOk(): Boolean = feedAt("insert") == wantIns
          cdfInsertOk = try insOk() catch { case _: Throwable => insOk() }
        }
        // green check: committed window value, full row count, reader
        // clean, and the captured feed exact
        val df = ManifestFileIndex.relation(spark, root, "day")
        val winVals = df.filter(col("id") >= WinLo && col("id") < WinHi)
          .select("v").collect().map(_.getLong(0)).toSet
        val n = df.count()
        if (readerTorn != null) {
          println(s"[soak] merge iteration $it READER TORN: $readerTorn")
        } else if (winVals == Set(v) && n == Rows && cdfUpdateOk && cdfInsertOk) green += 1
        else println(s"[soak] merge iteration $it DIVERGED: window=$winVals count=$n " +
          s"cdfUpdate=$cdfUpdateOk cdfInsert=$cdfInsertOk (want $v/$Rows)")
      } catch { case e: Throwable =>
        println(s"[soak] merge iteration $it failed outright: ${e.getMessage}")
      }
    }
    reading = false
    // make staleness visible if the table wedged: resolve must still work
    try { ManifestTable.resolve(fs, new Path(root)); () } catch { case _: Throwable => () }
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rec)
      f.delete(): Unit
    }
    rec(new java.io.File(root).getParentFile)
    (it, green)
  }
}
