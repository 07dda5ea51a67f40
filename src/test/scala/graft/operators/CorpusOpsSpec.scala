package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q86 k-means: every vector assigned to exactly one of k clusters, nonneg distances") {
    val out = CorpusOps.kmeansClusters(spark, dir).cache()
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(out.count() == n)
    assert(out.select($"vec_id").distinct().count() == n)
    val clusters = out.select($"cluster").distinct().as[Long].collect().sorted
    assert(clusters.forall(c => c >= 0 && c < 4) && clusters.length >= 2)
    assert(out.filter($"dist2" < 0).isEmpty)
    // init vectors stay closest to their own cluster's evolution rarely
    // guaranteed — but every cluster must be nonempty enough to have
    // pulled at least its seed vector somewhere
    out.unpersist()
  }

  test("scale-adaptive k: floors at the oracle model through driver SFs, then n/target") {
    // every driver SF (≤ 2000 vectors) must reproduce the static K=4
    // oracle model — that is what keeps q86/q113/q120 value-exact
    assert(Seq(0L, 500L, 2000L).map(CorpusOps.adaptiveK) == Seq(4, 4, 4))
    // past the floor, mean cluster size stays ~constant: 10x data, 10x k
    assert(CorpusOps.adaptiveK(20000L) == 40)
    assert(CorpusOps.adaptiveK(200000L) == 400)
    assert(CorpusOps.adaptiveK(Long.MaxValue) == 65536, "defensive cap")
  }

  test("q87 chunking: stride/size arithmetic and full coverage, map-only plan") {
    val out = CorpusOps.docChunks(spark, dir)
    val byDoc = out.groupBy($"doc_id")
      .agg(count(lit(1)).as("chunks"), sum($"chunk_words").as("w_total"),
        max($"chunk_words").as("maxw"))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
    val joined = byDoc.join(docs, "doc_id").cache()
    // chunk count = floor((n-1)/stride)+1 (stride 15); no chunk exceeds
    // the window size; total chunked words ≥ n (full coverage + overlap)
    assert(joined.filter($"chunks" =!= (floor(($"n" - 1) / 15) + 1)).isEmpty)
    assert(joined.filter($"maxw" > 20).isEmpty)
    assert(joined.filter($"w_total" < $"n").isEmpty)
    joined.unpersist()
    // no aggregation/join exchange in the chunk generation itself
    val plan = CorpusOps.docChunks(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), s"generator missing:\n$plan")
  }

  test("q88 mixture: tempered shares sum to 1 and upweight low-resource langs") {
    val rows = CorpusOps.mixtureWeights(spark, dir)
      .select($"lang", $"p", $"q", $"sample_weight")
      .as[(String, Double, Double, Double)].collect()
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    val en = rows.find(_._1 == "en").get
    for (r <- rows if r._1 != "en") {
      assert(r._2 < en._2, s"corpus shape changed: ${r._1} outnumbers en")
      assert(r._4 > en._4, s"low-resource ${r._1} not upweighted vs en")
    }
    // temperature α=0.5: weight = p^(α-1)/Z → monotone decreasing in p
    val sorted = rows.sortBy(_._2)
    assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-_).toSeq)
  }

  test("q89 int8 ANN: quantized cosine tracks exact cosine within quantization error") {
    val rows = CorpusOps.annInt8(spark, dir)
      .select($"int8_cosine", $"exact_cosine")
      .as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    // 64-dim int8: worst-case per-component error 0.5/127 → cosine error
    // well under 0.02 empirically; assert a loose but meaningful bound
    for ((i8, ex) <- rows) assert(math.abs(i8 - ex) < 0.02, s"quant error $i8 vs $ex")
  }

  test("q90 containment: is asymmetric, bounded by 1, and ≥ the pair's jaccard") {
    val cont = CorpusOps.containmentDedup(spark, dir)
      .select($"doc_id", $"container_id", $"containment")
      .as[(Long, Long, Double)].collect()
    assert(cont.forall(r => r._3 > 0 && r._3 <= 1.0))
    val jac = TextDedup.dedupNgramJaccard(spark, dir)
      .select($"a_id", $"b_id", $"jaccard").as[(Long, Long, Double)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    for ((d, c, v) <- cont) {
      val j = jac.get((math.min(d, c), math.max(d, c)))
      j.foreach(jv => assert(v >= jv - 1e-9, s"containment $v < jaccard $jv for ($d,$c)"))
    }
  }

  test("q92 dup-span: fractions bounded; exact-duplicate docs score 1.0") {
    val out = CorpusOps.dupSpanFraction(spark, dir).cache()
    assert(out.filter($"dup_frac" < 0 || $"dup_frac" > 1).isEmpty)
    assert(out.filter($"n_dup" > $"n_grams").isEmpty)
    // a doc whose full text occurs in another doc shares every 5-gram
    val dupDocs = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy(md5($"text")).agg(collect_list($"doc_id").as("ids"), count(lit(1)).as("c"))
      .filter($"c" >= 2)
      .select(explode($"ids").as("doc_id"))
    val n = dupDocs.count()
    if (n > 0) {
      val wrong = out.join(dupDocs, "doc_id").filter($"dup_frac" < 1.0)
      assert(wrong.isEmpty, "exact duplicate doc with dup_frac < 1")
    }
    out.unpersist()
  }

  test("q93 embedding QA: one row per dimension, coherent stats") {
    val out = CorpusOps.embeddingQa(spark, dir).cache()
    assert(out.count() == 64)
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(out.filter($"n" =!= nVecs).isEmpty)
    assert(out.filter($"min_v" > $"mean_v" || $"mean_v" > $"max_v").isEmpty)
    assert(out.filter($"std_v" <= 0).isEmpty)
    out.unpersist()
  }

  test("q94 weighted sample: exactly N docs, higher-quality docs oversampled") {
    val out = CorpusOps.weightedSample(spark, dir).cache()
    assert(out.count() == 100)
    assert(out.select($"doc_id").distinct().count() == 100)
    // A-ES keys are ln(u)/w with u ∈ (0,1], w > 0 → all ≤ 0
    assert(out.filter($"samp_key" > 0).isEmpty)
    // hash-deterministic: a second run selects the identical set
    val again = CorpusOps.weightedSample(spark, dir).select($"doc_id")
      .as[Long].collect().sorted
    assert(out.select($"doc_id").as[Long].collect().sorted.sameElements(again))
    out.unpersist()
  }

  test("q95 source quota: at most K per source, keeps the best-scoring docs") {
    val out = CorpusOps.sourceQuota(spark, dir).cache()
    assert(out.groupBy($"source").count().filter($"count" > 10).isEmpty)
    // kept min quality per source ≥ max quality among that source's dropped docs
    val all = CorpusOps.qualityClassifier(spark, dir)
      .join(spark.read.parquet(s"$dir/documents.parquet").select($"doc_id", $"source"), "doc_id")
    val dropped = all.join(out.select($"doc_id"), Seq("doc_id"), "left_anti")
    val keptMin = out.groupBy($"source").agg(min($"quality").as("kmin"))
    val dropMax = dropped.groupBy($"source").agg(max($"quality").as("dmax"))
    val bad = keptMin.join(dropMax, "source").filter($"dmax" > $"kmin")
    assert(bad.isEmpty, "a dropped doc outscores a kept doc in the same source")
    out.unpersist()
  }

  test("q96 bloom decontam: exact result (bloom is prefilter only); sketch visible in plan") {
    val out = CorpusOps.bloomDecontam(spark, dir)
    // Recompute the same overlap exactly, no bloom anywhere: the sketch
    // must not change the answer (false positives die in the verify
    // join; false negatives are impossible for a Bloom filter).
    val sh = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", split($"text", " ").as("w"))
      .filter(size($"w") >= 3)
      .select($"doc_id", explode(array_distinct(expr(
        "transform(sequence(1, size(w) - 2), i -> concat_ws(' ', w[i-1], w[i], w[i+1]))"))).as("s"))
    val ev = sh.filter($"doc_id" < 20).select($"s").distinct()
    val exact = sh.filter($"doc_id" >= 20).join(ev, "s")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_overlap"))
      .filter($"n_overlap" >= 3)
      .as[(Long, Long)].collect().toSet
    assert(out.as[(Long, Long)].collect().toSet == exact)
    // the prefilter must actually be in the executed plan
    val plan = CorpusOps.bloomDecontam(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom prefilter missing:\n$plan")
  }

  test("q99 source overlap: ordered pairs, bounded jaccard, common <= min side") {
    val out = CorpusOps.sourceOverlap(spark, dir).cache()
    val nSources = spark.read.parquet(s"$dir/documents.parquet")
      .select($"source").distinct().count()
    assert(out.count() <= nSources * (nSources - 1) / 2)
    assert(out.filter($"a_source" >= $"b_source").isEmpty)
    assert(out.filter($"jaccard" <= 0 || $"jaccard" > 1).isEmpty)
    assert(out.filter($"n_common" > least($"n_a", $"n_b")).isEmpty)
    out.unpersist()
  }

  test("q100 length deciles: 10 per lang, balanced counts, monotone ranges") {
    val out = CorpusOps.lengthDeciles(spark, dir).cache()
    val perLang = out.groupBy($"lang").agg(
      count(lit(1)).as("k"), max($"n_docs").as("mx"), min($"n_docs").as("mn"))
    assert(perLang.filter($"k" =!= 10).isEmpty)
    assert(perLang.filter($"mx" - $"mn" > 1).isEmpty, "ntile buckets must differ by at most 1")
    // decile ranges are non-overlapping and ordered within a lang
    val rows = out.select($"lang", $"decile", $"min_chars", $"max_chars")
      .as[(String, Long, Long, Long)].collect().groupBy(_._1)
    for ((_, ds) <- rows; Array(lo, hi) <- ds.sortBy(_._2).sliding(2).map(_.toArray))
      assert(lo._4 <= hi._3, s"decile ranges overlap: $lo vs $hi")
    out.unpersist()
  }

  test("q101 PQ ANN: 3 ranked rows per query, ADC monotone with rank, dists nonneg") {
    val out = CorpusOps.pqAnn(spark, dir).cache()
    val perQ = out.groupBy($"q_id").agg(count(lit(1)).as("k"),
      max($"rank").as("mr"), min($"rank").as("nr"))
    assert(perQ.filter($"k" =!= 3 || $"mr" =!= 3 || $"nr" =!= 1).isEmpty)
    assert(out.filter($"pq_dist2" < 0 || $"exact_dist2" < 0).isEmpty)
    // within a query, ADC distance is non-decreasing in rank by construction
    val rows = out.select($"q_id", $"rank", $"pq_dist2")
      .as[(Long, Long, Double)].collect().groupBy(_._1)
    for ((_, rs) <- rows) {
      val sorted = rs.sortBy(_._2).map(_._3)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    }
    // quantization is coarse (K=4) but ADC must stay in the ballpark of
    // the exact distance for the selected neighbors
    assert(out.filter($"pq_dist2" > $"exact_dist2" * 3 + 1.0).isEmpty)
    out.unpersist()
  }

  test("q102 source KL: nonnegative (Gibbs), one row per source, counts consistent") {
    val out = CorpusOps.sourceKl(spark, dir).cache()
    val nSources = spark.read.parquet(s"$dir/documents.parquet")
      .select($"source").distinct().count()
    assert(out.count() == nSources)
    // KL(p_s || p) >= 0 always (within rounding granularity)
    assert(out.filter($"kl_bits" < -1e-6).isEmpty)
    assert(out.filter($"n_distinct" > $"n_words").isEmpty)
    val totalWords = spark.read.parquet(s"$dir/documents.parquet")
      .select(size(split($"text", " ")).cast("long").as("n"))
      .agg(sum($"n")).as[Long].collect()(0)
    assert(out.agg(sum($"n_words")).as[Long].collect()(0) == totalWords)
    out.unpersist()
  }

  test("q103 robust outliers: median inside [min,max], z sign tracks deviation, flag = |z|>3") {
    val out = CorpusOps.robustOutliers(spark, dir).cache()
    assert(out.count() == 500)
    val perLang = out.groupBy($"lang").agg(
      min($"n_chars").as("mn"), max($"n_chars").as("mx"), max($"med").as("md"))
    assert(perLang.filter($"md" < $"mn" || $"md" > $"mx").isEmpty)
    assert(out.filter($"mad" < 0).isEmpty)
    // sign consistency and flag definition
    assert(out.filter($"robust_z".isNotNull &&
      (($"n_chars" > $"med" && $"robust_z" < 0) || ($"n_chars" < $"med" && $"robust_z" > 0))).isEmpty)
    // flag is defined on the unrounded z; compare away from the boundary
    assert(out.filter($"robust_z".isNotNull && abs(abs($"robust_z") - 3.0) > 0.001 &&
      ($"is_outlier" =!= (abs($"robust_z") > 3.0))).isEmpty)
    out.unpersist()
  }

  test("q104 zipf slope: negative slope (frequency decreases with rank), one row per source") {
    val out = CorpusOps.zipfSlope(spark, dir).cache()
    val nSources = spark.read.parquet(s"$dir/documents.parquet")
      .select($"source").distinct().count()
    assert(out.count() == nSources)
    // frequency is non-increasing in rank by construction → OLS slope < 0
    assert(out.filter($"slope" >= 0).isEmpty)
    assert(out.filter($"n_vocab" < 2).isEmpty, "degenerate vocab breaks the fit")
    out.unpersist()
  }

  test("q105 ANN recall: 4 methods x every query, recall in [0,1], n_hits <= 3") {
    val out = CorpusOps.annRecall(spark, dir).cache()
    assert(out.count() == 40)
    assert(out.select($"method").distinct().count() == 4)
    assert(out.filter($"recall" < 0 || $"recall" > 1).isEmpty)
    assert(out.filter($"n_hits" > 3 || $"n_hits" < 0).isEmpty)
    // recall is rounded to 6 decimals, so 1/3*3 reconstructs to ±2e-6
    assert(out.filter(abs($"recall" * 3 - $"n_hits") > 2e-6).isEmpty)
    // the point of the two-stage composition: pruning 32 candidates and
    // re-ranking them exactly must not be WORSE than the plain PQ top-3
    val mean = out.groupBy($"method").agg(avg($"recall").as("r"))
      .as[(String, Double)].collect().toMap
    assert(mean("two_stage") >= mean("pq"),
      s"two-stage recall ${mean("two_stage")} below plain PQ ${mean("pq")}")
    out.unpersist()
  }

  test("q147 two-stage ANN: 3 per query, int8 cosine exact vs full recompute, descending per query") {
    val out = CorpusOps.annTwoStage(spark, dir).cache()
    val queries = out.select($"q_id").distinct().count()
    assert(out.count() == queries * 3)
    assert(out.filter($"rank" < 1 || $"rank" > 3).isEmpty)
    // re-rank scores are EXACT int8 cosines: recompute from raw
    // embeddings for every returned pair and compare bit-for-bit (at
    // 6-decimal display rounding)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", expr(
        """transform(embedding, x -> cast(floor(cast(x as double) *
          |(127.0D / array_max(transform(embedding, y -> abs(cast(y as double))))) + 0.5D) as bigint))""".stripMargin)
        .as("qv"))
    def idot(a: String, b: String) =
      expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0L, (acc, t) -> acc + t)")
    val re = out
      .join(e.select($"vec_id".as("q_id"), $"qv"), "q_id")
      .join(e.select($"vec_id".as("c_id"), $"qv".as("cv")), "c_id")
      .withColumn("icos2", round(idot("qv", "cv").cast("double") /
        (sqrt(idot("qv", "qv").cast("double")) * sqrt(idot("cv", "cv").cast("double"))), 6))
    assert(re.filter($"int8_cosine" =!= $"icos2").isEmpty,
      "two-stage scores diverge from the exact int8 recompute")
    // ranks follow cosine descending (ties broken by c_id ascending)
    val rows = out.select($"q_id", $"rank", $"int8_cosine", $"c_id")
      .as[(Long, Long, Double, Long)].collect().groupBy(_._1)
    rows.values.foreach { g =>
      val sorted = g.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 > b._3 || (a._3 == b._3 && a._4 < b._4))
        case _ =>
      }
    }
    // plan shape: candidate list broadcasts into the re-rank join; the
    // pairing never goes corpus × corpus
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in q147 plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast in q147 re-rank:\n$plan")
    out.unpersist()
  }

  test("q113 cluster quality: sizes sum to corpus, inertia consistent with q86 distances") {
    val out = CorpusOps.clusterQuality(spark, dir).cache()
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(out.agg(sum($"n_vecs")).as[Long].collect()(0) == n)
    assert(out.filter($"inertia" < 0 || $"min_other_centroid_d2" <= 0).isEmpty)
    // inertia per cluster equals the sum of q86's per-vector dist2
    val fromQ86 = CorpusOps.kmeansClusters(spark, dir)
      .groupBy($"cluster").agg(sum($"dist2").as("s"))
      .as[(Long, Double)].collect().toMap
    for ((c, i) <- out.select($"cluster", $"inertia").as[(Long, Double)].collect())
      assert(math.abs(fromQ86(c) - i) < 1e-2, s"cluster $c inertia $i vs q86 ${fromQ86(c)}")
    out.unpersist()
  }

  test("q91 quality classifier: keep flag consistent with score, features bounded") {
    val out = CorpusOps.qualityClassifier(spark, dir).cache()
    assert(out.filter(($"quality" >= 0.5) =!= $"keep").isEmpty)
    assert(out.filter($"quality" <= 0 || $"quality" >= 1).isEmpty)
    assert(out.filter($"top_word_frac" > 1 || $"distinct_ratio" > 1).isEmpty)
    assert(out.filter($"avg_word_len" <= 0).isEmpty)
    out.unpersist()
  }
}
