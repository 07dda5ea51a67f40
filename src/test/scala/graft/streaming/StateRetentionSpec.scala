package graft.streaming

import graft.SparkSpec
import graft.functions.MGState
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Retention/compaction for the versioned-snapshot state discipline:
  * long-running streams must not accumulate one version dir per
  * micro-batch forever, and pruning must be INVISIBLE to results —
  * the retained run's outputs must equal the keep-everything run's,
  * because reads only ever need the latest committed predecessor
  * (snapshot state) or a union containing every gram (delta state,
  * where a compacted full snapshot subsumes the pruned tail).
  */
class StateRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def versionDirs(dir: String): Seq[String] = {
    val f = new java.io.File(dir)
    if (!f.exists()) Seq.empty
    else f.listFiles().map(_.getName).filter(_.startsWith("v")).toSeq.sorted
  }

  test("snapshot pruning: retained MG stream keeps bounded dirs, same final state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batches = (0 until 4).map { b =>
      List.fill(20)("HEAVY") ++ (1 to 60).map(i => "w" + ((i + b * 11) % 40))
    }
    def run(retain: Option[Int], tag: String): (Seq[String], MGState) = {
      val stateDir = tmpDir(s"mg-ret-$tag") + "/state"
      val ckpt = tmpDir(s"mg-ret-ckpt-$tag")
      val mem = MemoryStream[String]
      val q = retain match {
        case Some(r) => StreamingJobs.heavyHittersStream(
          mem.toDF().toDF("item"), 8, stateDir, ckpt, retainVersions = r)
        case None => StreamingJobs.heavyHittersStream( // the DEFAULT path
          mem.toDF().toDF("item"), 8, stateDir, ckpt)
      }
      try batches.foreach { it => mem.addData(it); q.processAllAvailable() }
      finally q.stop()
      val dirs = versionDirs(stateDir)
      (dirs, spark.read.parquet(s"$stateDir/${dirs.last}").as[MGState].head())
    }
    val (allDirs, fullState) = run(Some(Int.MaxValue), "all")
    val (prunedDirs, prunedState) = run(Some(1), "pruned")
    assert(allDirs == Seq("v0", "v1", "v2", "v3"), s"got $allDirs")
    // prune runs at batch START: batch 3 kept v2, then wrote v3
    assert(prunedDirs == Seq("v2", "v3"),
      s"retain=1 must leave predecessor + self, got $prunedDirs")
    assert(prunedState == fullState,
      "pruning must not change the folded sketch — reads use only the latest predecessor")
    // the DEFAULT must be bounded — a caller who configures nothing
    // must not accrete one snapshot per micro-batch forever
    val (defaultDirs, defaultState) = run(None, "default")
    assert(defaultDirs == Seq("v1", "v2", "v3"),
      s"default retention must keep ${StreamingJobs.DefaultRetainVersions} " +
        s"predecessors + self, got $defaultDirs")
    assert(defaultState == fullState,
      "default pruning must not change the folded sketch")
  }

  test("retainVersions < 1 fails loudly instead of silently retaining one version") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stateDir = tmpDir("mg-ret-zero") + "/state"
    val ckpt = tmpDir("mg-ret-zero-ckpt")
    val mem = MemoryStream[String]
    val q = StreamingJobs.heavyHittersStream(
      mem.toDF().toDF("item"), 8, stateDir, ckpt, retainVersions = 0)
    try {
      mem.addData(List("a", "b", "a"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("retainVersions")),
        s"the failure must name the invalid knob, got: ${messages(e)}")
    } finally q.stop()
  }

  test("delta compaction: span scrub with compactEvery prunes behind the full snapshot, same spans") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mk = (i: Int) => (1 to 10).map(j => s"t${i}_$j").mkString(" ")
    // batch b re-sends one doc from EVERY earlier batch (so spans in
    // batch b depend on grams from the oldest deltas — a prune that
    // lost content would change the result) plus one fresh doc
    val batches = (0 until 5).map { b =>
      (0 until b).map(e => (100L * b + e, mk(e))) :+ (100L * b + 99, mk(b))
    }
    def run(compactEvery: Int, tag: String): (String, Seq[String], Map[Long, Set[(Long, Long, Long, Long)]]) = {
      val gramDir = tmpDir(s"scrub-comp-$tag") + "/grams"
      val spansDir = tmpDir(s"scrub-comp-spans-$tag") + "/spans"
      val ckpt = tmpDir(s"scrub-comp-ckpt-$tag")
      val mem = MemoryStream[(Long, String)]
      val q = StreamingJobs.incrementalSpanScrub(
        mem.toDF().toDF("doc_id", "text"), gramDir, spansDir, ckpt,
        compactEvery = compactEvery)
      try batches.foreach { docs => mem.addData(docs); q.processAllAvailable() }
      finally q.stop()
      val spans = (0 until 5).map { b =>
        b.toLong -> spark.read.parquet(s"$spansDir/v$b")
          .select($"doc_id", $"span_start", $"span_end", $"span_words")
          .as[(Long, Long, Long, Long)].collect().toSet
      }.toMap
      (gramDir, versionDirs(gramDir), spans)
    }
    val (_, allDirs, allSpans) = run(0, "all")
    val (compGramDir, compDirs, compSpans) = run(2, "comp")
    assert(allDirs == Seq("v0", "v1", "v2", "v3", "v4"), s"got $allDirs")
    // v2 and v4 are full snapshots (batchId % 2 == 0, batchId > 0);
    // batch 3 pruned behind v2 (deleting v0, v1), batch 4 ran before
    // its own compaction could be pruned by a successor → v2..v4 stay
    assert(compDirs == Seq("v2", "v3", "v4"),
      s"pruner must drop deltas behind the newest full snapshot, got $compDirs")
    assert(new java.io.File(s"$compGramDir/v2/_FULL").exists(),
      "compaction batch must mark its version as a full snapshot")
    assert(compSpans == allSpans,
      "compaction must not change any batch's spans — the snapshot subsumes the pruned tail")
    // every batch after the seed found its cross-batch repeats
    assert((1 until 5).forall(b => compSpans(b.toLong).nonEmpty),
      s"re-sent docs must span against older batches: $compSpans")
  }
}
