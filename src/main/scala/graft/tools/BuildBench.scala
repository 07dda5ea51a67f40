package graft.tools

import org.apache.spark.sql.SparkSession

/** Write-time cost of the storage/runtime tier (SCALING §7): times
  * every layout/artifact BUILD the query bench amortizes away —
  * ingest-shaped fragmented copy + compaction, range-sorted rewrite,
  * bucketed tables, audit dim, z-order rewrite, erased layout, parquet
  * bloom copy, incremental-rollup base. The query-side SCALING tables
  * price reads; this prices the other half of the tier's bet (pay at
  * write time, win per job), so the amortization claim gets a
  * break-even job count instead of hand-waving.
  *
  * Usage: `runMain graft.tools.BuildBench <sfDir>` — deletes that
  * dir's layout tag under target/graft-layout (and its bucketed
  * tables) first, so every build runs COLD in this JVM, then prints
  * one JSON line of per-build seconds.
  */
object BuildBench {

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete(): Unit
  }

  def main(args: Array[String]): Unit = {
    val dir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val t = graft.core.Pin.tag(dir)
    val layoutRoot = new java.io.File(s"target/graft-layout/$t")
    if (layoutRoot.exists()) deleteRec(layoutRoot)
    Seq(s"graft_bkt_lineitem_$t", s"graft_bkt_orders_$t")
      .foreach(tb => spark.sql(s"DROP TABLE IF EXISTS $tb"))

    def time[T](body: => T): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    import graft.operators.{SketchOps, StorageOps}
    // ensureErasedLayout builds the event layouts if missing, so the
    // event-layout line must run first to keep costs attributed
    val builds = Seq(
      "events_ingest_and_compact" -> (() => StorageOps.ensureEventLayouts(spark, dir)),
      "lineitem_sorted_rewrite" -> (() => StorageOps.ensureSortedLineitem(spark, dir)),
      "bucketed_tables" -> (() => StorageOps.ensureBucketed(spark, dir)),
      "audit_dim" -> (() => StorageOps.ensureAuditDim(spark, dir)),
      "lineitem_zorder_rewrite" -> (() => StorageOps.ensureZorderLineitem(spark, dir)),
      "events_erased_copy" -> (() => StorageOps.ensureErasedLayout(spark, dir)),
      "lineitem_bloom_copy" -> (() => StorageOps.ensureBloomLineitem(spark, dir)),
      "rollup_base" -> (() => SketchOps.ensureBaseRollup(spark, dir)),
    )
    val timed = builds.map { case (name, b) => name -> time(b()) }
    val total = timed.map(_._2).sum

    // A/B read phase (min-of-3): the per-JOB saving each layout buys,
    // measured as the same logical query over the layout vs the
    // raw/control twin — build_cost / (raw − layout) = break-even jobs
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def minOf3(body: => Unit): Double = (1 to 3).map(_ => time(body)).min
    val (frag, comp) = StorageOps.ensureEventLayouts(spark, dir)
    val (sorted, control) = StorageOps.ensureSortedLineitem(spark, dir)
    def dayWindow(path: String): Unit = {
      spark.read.parquet(path)
        .filter($"day" >= lit("2024-01-10").cast("date") &&
          $"day" <= lit("2024-01-20").cast("date"))
        .groupBy($"event_type").agg(count(lit(1))).collect(): Unit
    }
    def shipWindow(path: String): Unit = {
      spark.read.parquet(path)
        .filter($"l_shipdate" >= lit("1998-03-01").cast("timestamp") &&
          $"l_shipdate" < lit("1998-04-01").cast("timestamp"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)), round(sum($"l_extendedprice"), 2)).collect(): Unit
    }
    val ab = Seq(
      "read_join_bucketed" -> minOf3(StorageOps.bucketedJoin(spark, dir).collect(): Unit),
      "read_join_raw" -> minOf3(StorageOps.unbucketedJoin(spark, dir).collect(): Unit),
      "read_window_sorted" -> minOf3(shipWindow(sorted)),
      "read_window_roundrobin" -> minOf3(shipWindow(control)),
      "read_daywindow_compacted" -> minOf3(dayWindow(comp)),
      "read_daywindow_fragmented" -> minOf3(dayWindow(frag)),
    )
    val json = (timed.map { case (n, s) => s""""$n":${f"$s%.3f"}""" } ++
      ab.map { case (n, s) => s""""$n":${f"$s%.3f"}""" })
      .mkString("{", ",", s""","total_build":${f"$total%.3f"},"sf":"$dir"}""")
    println(json)
    spark.stop()
  }
}
