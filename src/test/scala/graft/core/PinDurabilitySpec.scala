package graft.core

import graft.SparkSpec
import graft.operators.TrainingPipeline
import org.apache.spark.sql.DataFrame

/** Round-9 durability contract (VERDICT r8 task 1): the global-
  * numbering / model pins must survive loss of every executor-held
  * block. `localCheckpoint` could not (truncated lineage + unreplicated
  * blocks ⇒ unrecoverable); [[Pin.shared]] writes a parquet artifact,
  * so killing ALL cached/checkpointed state and re-deriving must give
  * byte-identical output — proven here by doing exactly that.
  */
class PinDurabilitySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def collectRows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString)

  /** Simulate cluster-wide loss of every executor-held block: drop all
    * cached Datasets AND every persistent RDD (which is where
    * localCheckpoint blocks live — with the old pinning this nuked the
    * lineage irrecoverably).
    */
  private def killAllExecutorState(): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
  }

  test("q144/q145 pins are durable artifacts: no executor-pinned lineage, byte-identical re-derive after total block loss") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val first = collectRows(TrainingPipeline.epochShuffle(spark, dir))
    assert(first.nonEmpty)
    // the numbering's pin lives on disk, not in executor memory: its
    // evaluation registered no new persistent RDDs…
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.isEmpty, s"q144 pinned executor-memory RDDs: $added")
    // …and the artifact is on (what on a cluster is reliable) storage,
    // in this session's own directory (seed is part of the name: a new
    // epoch must never alias a prior epoch's pinned partitioning)
    val art = Pin.pathOf(spark, s"pos-q144-s42-${Pin.tag(dir)}")
    assert(new java.io.File(art, "_SUCCESS").exists(), s"missing pin artifact $art")

    // total executor-state loss, then re-derive THROUGH the same frames
    killAllExecutorState()
    assert(collectRows(TrainingPipeline.epochShuffle(spark, dir)) == first)

    // and a fresh derivation (new plan objects) is also byte-identical
    assert(collectRows(TrainingPipeline.epochShuffle(spark, dir)) == first)

    val inter1 = collectRows(TrainingPipeline.sourceInterleave(spark, dir))
    killAllExecutorState()
    assert(collectRows(TrainingPipeline.sourceInterleave(spark, dir)) == inter1)
  }

  test("q105/q109 survive total executor-state loss (the class the round-10 kill-soak caught)") {
    // the soak found q105's ground-truth localCheckpoint dying with a
    // killed executor; this is the in-process twin that would have
    // caught it in the wall — unpersisting a localCheckpointed RDD
    // removes its only blocks, so surviving THIS requires the durable
    // pin (or intact lineage), exactly like surviving a real kill
    val recall = collectRows(graft.operators.CorpusOps.annRecall(spark, dir))
    assert(recall.nonEmpty)
    killAllExecutorState()
    assert(collectRows(graft.operators.CorpusOps.annRecall(spark, dir)) == recall)
    val tri = collectRows(graft.operators.TextDedup.dupTriangles(spark, dir))
    killAllExecutorState()
    assert(collectRows(graft.operators.TextDedup.dupTriangles(spark, dir)) == tri)
  }

  test("distributed CC loop survives total executor-state loss EVERY round (durable round pins)") {
    import spark.implicits._
    // a path graph: min label propagates one hop per round, so 8 nodes
    // force a genuinely multi-round loop (not a 1-round trivial case)
    val pairs = (1L to 7L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val undisturbed = graft.operators.TextDedup
      .connectedComponents(pairs, smallGraphMax = -1L, loopName = "spec-cc-loss")
      .orderBy("id").collect().toSeq.map(_.toString)
    assert(undisturbed == (1L to 8L).map(i => s"[$i,1]"))

    // fresh loop name → fresh round artifacts; nuke all executor state
    // before every round — with per-round localCheckpoint this was an
    // unrecoverable-lineage failure, with durable pins each round
    // recomputes from the previous round's parquet
    val disturbed = graft.operators.TextDedup.connectedComponents(
        pairs, smallGraphMax = -1L, loopName = "spec-cc-loss2",
        onRound = _ => killAllExecutorState())
      .orderBy("id").collect().toSeq.map(_.toString)
    assert(disturbed == undisturbed)
  }

  test("CC loop retry fast-forwards from mid-loop artifacts; retired rounds stay retired (bounded pin dir)") {
    import spark.implicits._
    val pairs = (1L to 7L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val loop = "spec-cc-resume"
    val reclaimedBefore = Pin.reclaimedBytes
    // poison round 3: the operator dies mid-loop with rounds 1-3 pinned
    val boom = intercept[RuntimeException] {
      graft.operators.TextDedup.connectedComponents(
        pairs, smallGraphMax = -1L, loopName = loop,
        onRound = r => if (r == 3) sys.error("simulated mid-loop job failure"))
    }
    assert(boom.getMessage.contains("simulated mid-loop job failure"))
    assert(Pin.isBuilt(spark, s"$loop-round3") && !Pin.isBuilt(spark, s"$loop-round4"))
    // retention already retired rounds ≤ 1 as the head advanced (keep
    // two): disk is bounded at two live rounds, reclaim is reported
    assert(!Pin.pathOf(spark, s"$loop-round0").exists(), "round0 should be retired")
    assert(!Pin.pathOf(spark, s"$loop-round1").exists(), "round1 should be retired")
    assert(Pin.reclaimedBytes > reclaimedBefore, "retention reclaimed no bytes")
    val survivors = (2 to 3).map(r => Pin.pathOf(spark, s"$loop-round$r"))
    survivors.foreach(d => assert(d.exists(), s"retained round missing: $d"))
    val stamps = survivors.map(d => d.listFiles().map(f => (f.getName, f.lastModified())).toSet)

    // the retry resumes: retained rounds are memoized re-reads
    // (artifact files untouched UP TO the resume point — after it,
    // continued progress retires them too, by design), RETIRED rounds
    // replay from the recorded convergence with zero IO and are NOT
    // rebuilt on disk, only rounds 4+ are computed, output is right
    @volatile var stampsAtResume: Seq[Set[(String, Long)]] = null
    val labels = graft.operators.TextDedup
      .connectedComponents(pairs, smallGraphMax = -1L, loopName = loop,
        onRound = r => if (r == 3 && stampsAtResume == null)
          stampsAtResume = survivors.map(d =>
            Option(d.listFiles()).map(_.map(f => (f.getName, f.lastModified())).toSet)
              .getOrElse(Set.empty)))
      .orderBy("id").collect().toSeq.map(_.toString)
    assert(labels == (1L to 8L).map(i => s"[$i,1]"))
    assert(stampsAtResume == stamps,
      "retry rewrote retained round artifacts before the resume point")
    assert(!Pin.pathOf(spark, s"$loop-round0").exists() &&
      !Pin.pathOf(spark, s"$loop-round1").exists(),
      "retry rebuilt retired rounds it should have replayed from the record")
    // after completion THIS SESSION's pin dirs for the loop stay
    // bounded: at most the final two rounds exist (prior JVMs' stale
    // dirs carry other session UUIDs and are the 24h pruner's job)
    val edgesDir = Pin.pathOf(spark, s"$loop-edges")
    val sid = edgesDir.getName.substring(edgesDir.getName.lastIndexOf("-s"))
    val roundDirs = edgesDir.getParentFile.listFiles()
      .filter(f => f.getName.startsWith(s"$loop-round") && f.getName.endsWith(sid))
      .map(_.getName).toSeq
    assert(roundDirs.size <= 2, s"unbounded round dirs for this session: $roundDirs")
  }

  test("distributed TextRank matches the driver path and survives executor-state loss every iteration") {
    val driverPath = graft.operators.TextAnalysis.textrankKeywords(spark, dir)
      .collect().toSeq.map(_.toString)
    val distributed = graft.operators.TextAnalysis.textrankKeywords(
        spark, dir, smallEdgeMax = -1L, onRound = _ => killAllExecutorState())
      .collect().toSeq.map(_.toString)
    assert(distributed == driverPath)
    // round-11 retention: the loop retires rounds ≤ i−2 as it goes, so
    // THIS SESSION's round dirs for the loop are bounded at two
    val edgesDir = Pin.pathOf(spark, s"textrank-${Pin.tag(dir)}-edges")
    val sid = edgesDir.getName.substring(edgesDir.getName.lastIndexOf("-s"))
    val roundDirs = edgesDir.getParentFile.listFiles()
      .filter(f => f.getName.startsWith(s"textrank-${Pin.tag(dir)}-round") &&
        f.getName.endsWith(sid))
      .map(_.getName).toSeq
    assert(roundDirs.size <= 2, s"unbounded TextRank round dirs: $roundDirs")
  }

  test("sessions get distinct pin directories (UUID component, not identityHashCode)") {
    import spark.implicits._
    val other = spark.newSession()
    val name = s"spec-pin-iso-${Pin.tag(dir)}"
    // distinct directories BEFORE anything is written — isolation is
    // structural, so one session's mode(overwrite) can never delete a
    // directory another session's memoized frame still lazily reads
    assert(Pin.pathOf(spark, name).getPath != Pin.pathOf(other, name).getPath)
    val a = Pin.shared(spark, name)(Seq((1L, "a")).toDF("id", "v"))
    val b = Pin.shared(other, name)(Seq((2L, "b")).toDF("id", "v"))
    assert(collectRows(a) == Seq("[1,a]") && collectRows(b) == Seq("[2,b]"))
  }

  test("Pin.shared memoizes per (session, name): second call reuses the artifact without rewriting") {
    import spark.implicits._
    val name = s"spec-pin-${Pin.tag(dir)}"
    val a = Pin.shared(spark, name)(Seq((1L, "x"), (2L, "y")).toDF("id", "v"))
    val path = Pin.pathOf(spark, name)
    val stamps = path.listFiles().map(f => (f.getName, f.lastModified())).toSet
    val b = Pin.shared(spark, name)(sys.error("must not re-evaluate the input plan"))
    assert(a eq b)
    assert(path.listFiles().map(f => (f.getName, f.lastModified())).toSet == stamps)
    assert(collectRows(b).sorted == Seq("[1,x]", "[2,y]"))
  }
}
