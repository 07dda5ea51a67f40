package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.{col, lit}

/** Round-15 ADVICE (high): a failure AFTER a successful conditional
  * commit — most plausibly a transient IOException out of
  * `ManifestTable.gc` — used to land in the catch-all's "did the table
  * advance?" staleness test, and it always answers yes there, because
  * OUR OWN commit is what advanced the seq. The handler then deleted
  * the generation the just-committed live manifest references: a
  * transient post-commit error became silent data loss and a
  * permanently bricked table (every subsequent read fails on missing
  * files). The fix makes commit success terminal: the handler first
  * checks whether the LIVE manifest references this attempt's
  * generation, and treats that as success.
  */
class PostCommitFailureSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("memfs://shared/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def freshStore(sub: String): FileConnector = {
    MemFsStore.clear()
    MemFsStore.renameAsCopy = true
    spark.sparkContext.hadoopConfiguration
      .set("fs.memfs.impl", classOf[MemFs].getName)
    FileConnector("obj", s"memfs://shared/$sub", "parquet")
  }

  test("upsert: a post-commit failure reads as SUCCESS — the committed generation survives") {
    val c = freshStore("pc1")
    c.write(Seq((1, "old"), (2, "keep")).toDF("id", "v"), "t", WriteMode.Overwrite)
    val fired = new java.util.concurrent.atomic.AtomicInteger(0)
    FileConnector.afterUpsertCommit = () => {
      fired.incrementAndGet()
      throw new java.io.IOException("injected transient post-commit failure (gc shape)")
    }
    // must NOT throw: the commit landed before the injected failure
    try c.write(Seq((1, "new"), (3, "add")).toDF("id", "v"), "t", WriteMode.Replace(Seq("id")))
    finally FileConnector.afterUpsertCommit = () => ()
    assert(fired.get() == 1,
      s"post-commit failure was retried into ${fired.get()} full upsert attempts")
    // the merged state is live and every referenced file exists
    assert(c.read(spark, "t").as[(Int, String)].collect().toMap ==
      Map(1 -> "new", 2 -> "keep", 3 -> "add"),
      "post-commit failure dropped the committed upsert")
    val root = new Path(c.pathFor("t"))
    val live = ManifestTable.resolve(fs, root).get
    live.entries.flatMap(e => ManifestTable.entryPaths(root, e)).foreach(p =>
      assert(fs.exists(p), s"live manifest references deleted path $p — table bricked"))
  }

  test("partition rewrite: a post-commit failure reads as SUCCESS — no bricked layout") {
    val work = tmpDir("graft-postcommit-rw") + "/t"
    spark.range(0, 100).select(
      (col("id") % 10).as("user_id"), col("id").as("event_id"),
      lit("2024-01-01").cast("date").as("day"))
      .repartition(4)
      .write.partitionBy("day").parquet(work)
    val fired = new java.util.concurrent.atomic.AtomicInteger(0)
    graft.operators.StorageOps.afterRewriteCommit = () => {
      fired.incrementAndGet()
      throw new java.io.IOException("injected transient post-commit failure (gc shape)")
    }
    try graft.operators.StorageOps.eraseUsers(spark, work, Seq(3L))
    finally graft.operators.StorageOps.afterRewriteCommit = () => ()
    assert(fired.get() == 1, s"post-commit failure retried ${fired.get()} rewrites")
    val live = graft.operators.StorageOps.readDayLayout(spark, work)
    assert(live.filter(col("user_id") === 3).count() == 0, "erasure lost")
    assert(live.count() == 90, "rewrite lost unrelated rows — layout bricked or torn")
  }

  test("Complete-mode sink: a post-commit gc-window failure must not fail the landed batch (round 16)") {
    import graft.sources.v2.{GraftManifestSink, GraftManifestSource}
    val _ = classOf[GraftManifestSource] // package anchor
    val root = tmpDir("graft-postcommit-sink") + "/t"
    val sink = new GraftManifestSink(spark, root, "parquet", Map.empty, complete = true)
    sink.addBatch(0, Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val fired = new java.util.concurrent.atomic.AtomicInteger(0)
    GraftManifestSink.afterCompleteCommit = () => {
      fired.incrementAndGet()
      throw new java.io.IOException("injected transient post-commit failure (gc shape)")
    }
    // must NOT throw: the retire-all pointer flip already landed
    try sink.addBatch(1, Seq((9, "z")).toDF("id", "v"))
    finally GraftManifestSink.afterCompleteCommit = () => ()
    assert(fired.get() == 1, s"post-commit failure replayed into ${fired.get()} commits")
    assert(spark.read.format("graftmanifest").load(root)
      .as[(Int, String)].collect().toMap == Map(9 -> "z"),
      "complete-mode batch lost or doubled after post-commit failure")
  }

  test("a GENUINE pre-commit failure still propagates (no advance, nothing swallowed)") {
    val c = freshStore("pc2")
    c.write(Seq((1, "a")).toDF("id", "v"), "t", WriteMode.Overwrite)
    FileConnector.beforeUpsertCommit = () =>
      throw new java.io.IOException("injected pre-commit failure")
    val e = try intercept[java.io.IOException] {
      c.write(Seq((1, "b")).toDF("id", "v"), "t", WriteMode.Replace(Seq("id")))
    } finally FileConnector.beforeUpsertCommit = () => ()
    assert(e.getMessage.contains("injected pre-commit failure"))
    // old state intact
    assert(c.read(spark, "t").as[(Int, String)].collect().toMap == Map(1 -> "a"))
  }
}
