package graft.tools

import org.apache.spark.sql.SparkSession

/** Maintenance entry point for the pin store lifecycle (round-14
  * verdict task 6): runs [[graft.core.Pin.gc]] against the session's
  * pin root and prints one JSON line — dirs before/after, bytes
  * reclaimed — so the store's growth across rounds is a measured,
  * sweepable fact. Args: `[maxAgeHours]` (default 24, the same window
  * the lazy first-pin prune uses; pass a smaller window only on roots
  * no concurrent JVM shares).
  */
object PinSweep {
  def main(args: Array[String]): Unit = {
    val maxAgeHours = args.headOption.map(_.toDouble).getOrElse(24.0)
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[2]").config("spark.sql.shuffle.partitions", "2")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (fs, root) = {
      val raw = new org.apache.hadoop.fs.Path(
        spark.conf.get(graft.core.Pin.RootConfKey, "target/graft-layout/pins"))
      val f = raw.getFileSystem(spark.sessionState.newHadoopConf())
      (f, f.makeQualified(raw))
    }
    def dirCount: Int =
      if (fs.exists(root)) fs.listStatus(root).count(_.isDirectory) else 0
    val before = dirCount
    val swept = graft.core.Pin.gc(spark, (maxAgeHours * 3600 * 1000).toLong)
    println(s"""{"pin_root":"$root","max_age_hours":$maxAgeHours,""" +
      s""""dirs_before":$before,"dirs_after":$dirCount,"reclaimed_bytes":$swept}""")
    spark.stop()
  }
}
