package graft.tools

import graft.core.{FileConnector, WriteMode}
import org.apache.spark.sql.SparkSession

/** The optimistic-upsert [[SoakPhase]] (round 14): two concurrent
  * writers Replace-upsert disjoint key sets into ONE manifested table
  * every iteration while [[KillSoak]] SIGKILLs the executors running
  * their merge scans and generation writes. The table lives on the
  * host-shared local filesystem with `commit=manifest` (the NFS-share
  * knob), so every executor JVM reads/writes the same files and the
  * driver's conditional pointer commits arbitrate the race for real.
  *
  * Per iteration: both writers run concurrently (each may lose the
  * optimistic race and re-derive; a kill mid-job costs Spark task
  * retries, and a write that still fails is re-run once — Replace is
  * idempotent by key); then the table is read back and must hold
  * EXACTLY base + both writers' rows at this iteration's values —
  * a lost update, a resurrected older value, or a torn state all read
  * as a non-green iteration.
  */
final class UpsertSoakPhase extends SoakPhase {

  def name: String = "upsert"

  def run(spark: SparkSession, stop: () => Boolean): (Int, Int) = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("soak-upsert").toString
    val c = FileConnector("soakup", root, "parquet", Map("commit" -> "manifest"))
    c.write(Seq((0, "base")).toDF("id", "v"), "t", WriteMode.Overwrite)
    var it = 0
    var green = 0
    while (!stop()) {
      it += 1
      val tag = s"i$it"
      def batch(w: Int) =
        Seq((w * 10, s"$tag-w$w"), (w * 10 + 1, s"$tag-w${w}b")).toDF("id", "v")
      try {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
        val failed = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
        (1 to 2).foreach { w =>
          pool.execute { () =>
            try c.write(batch(w), "t", WriteMode.Replace(Seq("id")))
            catch { case _: Throwable => failed.add(w); () }
          }
        }
        pool.shutdown()
        if (!pool.awaitTermination(180, java.util.concurrent.TimeUnit.SECONDS))
          sys.error("upsert writers wedged past 180 s")
        // a kill can abort a whole job past task retries — Replace is
        // idempotent per key, so one serial re-run converges
        failed.forEach(w => c.write(batch(w), "t", WriteMode.Replace(Seq("id"))))
        val got = c.read(spark, "t").as[(Int, String)].collect().toMap
        val want = Map(0 -> "base") ++
          (1 to 2).flatMap(w => Seq(w * 10 -> s"$tag-w$w", w * 10 + 1 -> s"$tag-w${w}b"))
        if (got == want) green += 1
        else println(s"[soak] upsert iteration $it DIVERGED: got $got")
      } catch { case e: Throwable =>
        println(s"[soak] upsert iteration $it failed outright: ${e.getMessage}")
      }
    }
    // reap the table tree — a long soak writes hundreds of generations
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rec)
      f.delete(): Unit
    }
    rec(new java.io.File(root))
    (it, green)
  }
}
