package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query timing without [[graft.Bench]]'s full shared-cache
  * warm-up — the A/B tool for plan work on queries that don't read
  * the session caches (Bench remains the canonical record: its
  * warm-up IS the steady state for the cache-sharing families).
  *
  * Usage: runMain graft.tools.TimeQuery <sfDir> <queryName> [iters]
  * Prints one line per iteration and a min line, Bench-style seconds.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val (sfDir, name, iters) = args match {
      case Array(d, n) => (d, n, 3)
      case Array(d, n, i) => (d, n, i.toInt)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    val times = (1 to iters).map { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[time-query] iter $i: $s%.3f s ($n rows)")
      s
    }
    println(f"[time-query] $name min-of-$iters: ${times.min}%.3f s")
    spark.stop()
  }
}
