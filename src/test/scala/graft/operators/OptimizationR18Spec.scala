package graft.operators

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame

/** Round-18 optimization pins — each test locks in a plan/behavior
  * property one of this round's rewrites established, so a later
  * refactor can't silently put the cost back:
  *
  *  - q92/q117's "occurs in ≥2 distinct docs" tests run as min/max
  *    partial aggregates, never a count-distinct expansion;
  *  - q125/q40/q133 compute their exact percentiles from ONE
  *    array-percentile buffer, not one buffer per cut;
  *  - the connected-components and textrank small-graph fast paths
  *    pick their regime and fetch their edges with a single scheduled
  *    job (the old persist + count + collect shape cost three).
  */
class OptimizationR18Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def executedPlanString(df: DataFrame): String = {
    df.collect() // finalize AQE
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("q92/q117: shared-gram test is min/max, not a distinct expansion") {
    for (df <- Seq(CorpusOps.dupSpanFraction(spark, dir),
                   SpanOps.dupSpans(spark, dir))) {
      val plan = executedPlanString(df).toLowerCase
      assert(!plan.contains("count(distinct"),
        "shared-gram census regressed to a count-distinct expansion")
      assert(plan.contains("min(") && plan.contains("max("))
    }
  }

  test("q125/q40: exact percentile cuts come from array-percentile buffers") {
    for (df <- Seq(PipelineOps.psiDrift(spark, dir),
                   ExtendedRelational.percentiles(spark, dir))) {
      val plan = executedPlanString(df)
      val calls = "percentile\\([^,]+, [^,\\[]".r.findAllIn(plan).toList
      // every percentile() in the plan must take an ARRAY of cuts (the
      // rendered literal starts with '['); a scalar second argument
      // means the one-buffer-per-cut shape crept back
      assert(calls.isEmpty,
        s"scalar-percentile aggregates found in plan: $calls")
      assert(plan.contains("percentile("), "percentile aggregate missing entirely")
    }
  }

  private def countJobs(body: => Unit): Int = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(l)
    // drain the listener bus deterministically (round-18 ADVICE: a
    // fixed sleep can undercount on a loaded CI box and flake the
    // <=1-job assertion)
    try { body; org.apache.spark.sql.graft.Bridge.waitListenerBusEmpty(spark.sparkContext, 60000L) }
    finally spark.sparkContext.removeSparkListener(l)
    jobs.get()
  }

  test("connectedComponents small-graph path costs one bounded collect") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    var labels: DataFrame = null
    // a local relation collects without scheduling at all; the point is
    // the old persist + count + mirror-union shape (3 jobs even here)
    // is gone — at most the single limit-collect remains
    val n = countJobs { labels = TextDedup.connectedComponents(pairs) }
    assert(n <= 1, s"small-graph fast path scheduled $n jobs, expected <= 1")
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("TopK stages compile under whole-stage codegen (no janino fallback)") {
    // Round-18 fix: TopKPerKeyExec.usedInputs — without it every TopK
    // stage failed janino compilation ("Redefinition of local
    // variable") and silently ran interpreted. fallback=false turns a
    // recurrence into a hard test failure instead of a silent slowdown.
    val key = "spark.sql.codegen.fallback"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      CorpusOps.sourceQuota(spark, dir).collect()
      CorpusOps.dsirSelect(spark, dir).collect()
      ExtendedRelational.topOrdersPerCustomer(spark, dir).collect()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("q97: SNM candidate pairs are unique without a distinct") {
    // the round-18 rewrite dropped cand.distinct() on the uniqueness
    // argument (forward-only lead window, one row per doc); this audit
    // keeps the argument honest against future window-shape changes
    val plan = executedPlanString(TextDedup.dedupSnm(spark, dir)).toLowerCase
    assert(plan.contains("windowgrouplimit") || !plan.contains("cartesianproduct"))
    val dup = TextDedup.dedupSnm(spark, dir)
      .groupBy("a_id", "b_id").count().filter("count > 1")
    assert(dup.isEmpty, "duplicate SNM result pairs — the no-distinct argument broke")
  }

  test("textrank driver path: labels match the direction-mirrored edge walk") {
    // the regime pick and edge fetch are now ONE bounded limit-collect
    // (no persist/count); value parity with the oracle is pinned by
    // q76's gate — here we pin that the driver path still returns every
    // word exactly once with a rank in (0, 1)
    val ranks = TextAnalysis.textrankKeywords(spark, dir).collect()
    assert(ranks.map(_.getString(0)).distinct.length == ranks.length)
    assert(ranks.forall { r => val v = r.getDouble(1); v > 0 && v < 1 })
  }
}
