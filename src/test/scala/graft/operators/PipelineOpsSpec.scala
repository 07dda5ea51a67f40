package graft.operators

import graft.SparkSpec

/** Sanity specs for the data-pipeline operator suite on sf0.001 (the
  * value-exact gate is the DuckDB oracle at sf0.01; these check shape
  * invariants fast).
  */
class PipelineOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("dedup_exact covers every document exactly once") {
    val df = TextDedup.dedupExact(spark, dir)
    assert(df.count() == 500)
    assert(df.select("doc_id").distinct().count() == 500)
  }

  test("ngram jaccard pairs are ordered, thresholded, and symmetric-free") {
    val rows = TextDedup.dedupNgramJaccard(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getDouble(2) >= 0.8))
  }

  test("minhash-LSH candidates are a subset of exact-jaccard pairs at its threshold") {
    // dedupNgramJaccard is the SPEC-ONLY exact-semantics anchor since
    // round 9 (demoted from catalog q20): the uncapped exact jaccard
    // every approximate method is pinned against, here and in the q97
    // test below — containment AND value identity, the full regression
    // the old q20 oracle row carried.
    val lsh = TextDedup.dedupMinhashLsh(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(lsh.nonEmpty)
    // every LSH-verified pair has true jaccard >= 0.7 by construction
    val exact = TextDedup.dedupNgramJaccard(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // pairs at >= 0.8 should essentially all be recalled by 4x4 banding
    assert((exact.keySet -- lsh.keySet).isEmpty, "LSH missed high-jaccard pairs")
    // and each surviving pair carries the IDENTICAL exact jaccard
    for ((p, j) <- lsh if exact.contains(p))
      assert(exact(p) == j, s"LSH pair $p jaccard $j != exact ${exact(p)}")
  }

  test("q148 dup-cluster weights: every doc once, cluster mass = 1, singletons at full weight") {
    val w = TextDedup.dupClusterWeights(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(w.length == 500 && w.map(_._1).distinct.length == 500)
    // weight is exactly 1/cluster_size (6-dp rounded)
    w.foreach { case (_, _, n, wt) =>
      assert(n >= 1 && math.abs(wt - BigDecimal(1.0 / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) == 0.0)
    }
    // each cluster's total contribution ≈ one unique document
    w.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.map(_._3).distinct.length == 1, s"cluster $c size disagrees")
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, s"cluster $c mass != 1")
    }
    // consistent with q70: same cluster labels
    val cl = TextDedup.dedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    w.foreach { case (d, c, _, _) => assert(cl(d) == c) }
    // clusters with real duplicates exist in the fixture, and their
    // members are downweighted
    assert(w.exists(r => r._3 > 1 && r._4 < 1.0))
  }

  test("q97 SNM pairs are a thresholded subset of exact-jaccard pairs, candidates O(n*W)") {
    val snm = TextDedup.dedupSnm(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(snm.nonEmpty)
    assert(snm.values.forall(_ >= 0.8))
    val exact = TextDedup.dedupNgramJaccard(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // every SNM pair is a true >= 0.8 pair with the identical jaccard
    for ((p, j) <- snm) assert(exact.get(p).contains(j), s"SNM pair $p not in exact set")
    // sort-blocking bound: candidates (hence results) can never exceed n*W
    assert(snm.size <= 500 * 4)
  }

  test("q98 entropy: bounded by log2(alphabet), zero for constant docs, exact on a hand case") {
    val rows = TextAnalysis.textEntropy(spark, dir)
      .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    for ((ce, we, k) <- rows) {
      assert(ce >= 0 && we >= 0)
      assert(ce <= math.log(k.toDouble) / math.log(2) + 1e-9,
        s"char entropy $ce exceeds log2($k)")
    }
    // hand case: "ab ab" → chars [a,b,' ',a,b]: p(a)=p(b)=2/5, p(' ')=1/5
    val expected = -(2 * (2.0 / 5) * (math.log(2.0 / 5) / math.log(2))
      + (1.0 / 5) * (math.log(1.0 / 5) / math.log(2)))
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val one = Seq("ab ab").toDF("text")
      .select(expr(
        """-aggregate(
          |  transform(array_sort(array_distinct(regexp_extract_all(text, '.', 0))),
          |    c -> (cast(size(filter(regexp_extract_all(text, '.', 0), x -> x = c)) as double) / length(text))
          |         * log2(cast(size(filter(regexp_extract_all(text, '.', 0), x -> x = c)) as double) / length(text))),
          |  0D, (a, v) -> a + v)""".stripMargin).as("e"))
      .collect()(0).getDouble(0)
    assert(math.abs(one - expected) < 1e-9)
    // word entropy of a constant-word doc is 0 by the same formula on ws
  }

  test("q109 triangles: strictly ordered vertices, every edge is a capped-jaccard pair") {
    val tris = TextDedup.dupTriangles(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tris.forall { case (a, b, c) => a < b && b < c })
    val pairs = TextDedup.dedupNgramJaccardCapped(spark, dir)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((a, b, c) <- tris) {
      assert(pairs((a, b)) && pairs((b, c)) && pairs((a, c)),
        s"triangle ($a,$b,$c) has a missing edge")
    }
  }

  test("q111 source dup rates: bounded rates, totals reconcile with q19 and the pair set") {
    val out = TextDedup.sourceDupRates(spark, dir).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      assert(r.getAs[Long]("n_exact_dup") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_near_dup") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("exact_rate") >= 0 && r.getAs[Double]("exact_rate") <= 1)
    }
    val totalExact = out.map(_.getAs[Long]("n_exact_dup")).sum
    val q19Dups = TextDedup.dedupExact(spark, dir)
      .filter("is_dup").count()
    assert(totalExact == q19Dups, "per-source exact dups must sum to the corpus total")
  }

  test("simhash emits one 32-bit fingerprint per doc") {
    val rows = TextDedup.textSimhash(spark, dir).collect()
    assert(rows.length == 500)
    assert(rows.forall { r =>
      val s = r.getLong(1); s >= 0 && s < (1L << 32)
    })
  }

  test("cosine top-k: k rows per query, ranks 1..k, descending cosine") {
    val rows = Similarity.cosineTopK(spark, dir).collect()
    assert(rows.length == 50) // 10 queries × 5
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.forall(_._2.map(_.getLong(3)).sorted.toSeq == (1L to 5L)))
    assert(byQuery.forall { case (_, rs) =>
      val cs = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      cs.zip(cs.tail).forall { case (a, b) => a >= b }
    })
  }

  test("ann-lsh results are a subset of each query's bucket, ranked") {
    val rows = Similarity.annLsh(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) <= 3))
  }

  test("lang-id: zh detected by CJK range only on this latin corpus → no zh predictions") {
    val df = TextAnalysis.langId(spark, dir)
    assert(df.filter(df("pred_lang") === "zh").count() == 0)
    assert(df.count() == 500)
  }

  test("token counts are positive and est_bpe tracks length/4") {
    val rows = TextAnalysis.tokenCount(spark, dir).collect()
    assert(rows.forall(r => r.getLong(1) > 0 && r.getLong(2) > 0 && r.getLong(3) > 0))
  }

  test("deterministic sample: identical across runs, roughly 10%") {
    val a = PipelineOps.deterministicSample(spark, dir).collect().map(_.getLong(0)).toSeq
    val b = PipelineOps.deterministicSample(spark, dir).collect().map(_.getLong(0)).toSeq
    assert(a == b) // no rand(): byte-identical reruns
    assert(a.length > 20 && a.length < 100) // ~10% of 500
  }

  test("split assignment partitions every document exactly once") {
    val splits = PipelineOps.splitAssignment(spark, dir)
    val total = splits.agg(org.apache.spark.sql.functions.sum("n_docs")).head().getLong(0)
    assert(total == 500)
    val names = splits.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(names == Set("train", "val", "test"))
  }

  test("decontamination flags only train docs, by eval overlap") {
    val rows = PipelineOps.decontamination(spark, dir).collect()
    assert(rows.forall(_.getLong(0) >= 20)) // eval ids never flagged
    assert(rows.forall(_.getLong(1) >= 5))
  }
}
