package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("corpus build: deterministic, deduped, PII-free, packs within splits") {
    val corpus = TrainingPipeline.buildCorpus(spark, dir).cache()
    val n = corpus.count()
    assert(n > 0)

    // deterministic end-to-end: a second build is byte-identical
    val again = TrainingPipeline.buildCorpus(spark, dir)
    assert(corpus.exceptAll(again).isEmpty && again.exceptAll(corpus).isEmpty)

    // exact-dup free: content hashes unique
    assert(corpus.select(md5($"text")).distinct().count() == n)

    // PII redacted (the cleaner plants nothing here, but no raw email
    // pattern may survive in any text)
    assert(corpus.filter($"text".rlike(PipelineOps.EmailRe)).count() == 0)

    // splits partition the corpus; packs never straddle splits (pack_id
    // is per-split by construction — check each (split, pack) has one split)
    val splits = corpus.select($"split").distinct().as[String].collect().sorted
    assert(splits.forall(Set("train", "val", "test")))

    // pack budget: every pack's exclusive start < budget boundary —
    // equivalently, within a split ordered by doc_id the cumulative sum
    // maps to floor(cum_excl / 2048)
    val byDoc = corpus.select($"split", $"doc_id", $"tokens", $"pack_id")
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2))
    byDoc.foreach { case (_, rows) =>
      var cum = 0L
      rows.foreach { case (_, _, tokens, pack) =>
        assert(pack == cum / 2048L, s"pack $pack != ${cum / 2048L}")
        cum += tokens
      }
    }
    corpus.unpersist()
    ()
  }

  test("funnel reports monotone survivor counts") {
    val f = TrainingPipeline.funnel(spark, dir)
      .as[(String, Long)].collect().sortBy(_._1)
    val m = f.toMap
    assert(m("0_raw") >= m("1_cleaned"))
    assert(m("1_cleaned") >= m("2_corpus"))
    assert(m("2_corpus") > 0)
    assert(m("3_packs") > 0 && m("3_packs") <= m("2_corpus"))
  }
}
