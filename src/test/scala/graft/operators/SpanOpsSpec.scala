package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q117 spans: disjoint, length-consistent, >= threshold, only in docs q92 flags") {
    val spans = SpanOps.dupSpans(spark, dir).cache()
    // length arithmetic + threshold
    assert(spans.filter($"span_words" =!= ($"span_end" - $"span_start" + 1)).isEmpty)
    assert(spans.filter($"span_words" < 8).isEmpty)
    assert(spans.count() > 0)
    // spans within a doc are disjoint AND non-adjacent (maximal): the
    // next span starts at least 2 past the previous end
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"span_start")
    val overlaps = spans
      .withColumn("prev_end", lag($"span_end", 1).over(w))
      .filter($"prev_end".isNotNull && $"span_start" <= $"prev_end" + 1)
    assert(overlaps.isEmpty)
    // every doc with a span has duplicated grams per q92's census
    val flagged = CorpusOps.dupSpanFraction(spark, dir)
      .filter($"n_dup" > 0).select($"doc_id")
    assert(spans.select($"doc_id").distinct()
      .join(flagged, Seq("doc_id"), "left_anti").isEmpty)
    spans.unpersist()
  }

  test("q118 scrub audit: covers all docs, kept+dup=tokens, agrees with q117 spans") {
    val audit = SpanOps.spanScrub(spark, dir).cache()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(audit.count() == nDocs)
    assert(audit.filter($"kept_tokens" + $"dup_tokens" =!= $"tokens").isEmpty)
    assert(audit.filter($"scrub_frac" < 0 || $"scrub_frac" > 1).isEmpty)
    // dup_tokens is exactly the per-doc sum of q117's spans (disjointness
    // makes this sum exact — no double counting)
    val fromSpans = SpanOps.dupSpans(spark, dir)
      .groupBy($"doc_id").agg(sum($"span_words").as("s"))
    val mismatch = audit.filter($"dup_tokens" > 0)
      .join(fromSpans, "doc_id")
      .filter($"dup_tokens" =!= $"s")
    assert(mismatch.isEmpty)
    audit.unpersist()
  }

  test("q119 contamination spans: train docs only, positions inside the doc") {
    val spans = SpanOps.contaminationSpans(spark, dir).cache()
    assert(spans.count() > 0)
    assert(spans.filter($"doc_id" < 20).isEmpty)
    val lens = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
    assert(spans.join(lens, "doc_id")
      .filter($"span_start" < 1 || $"span_end" > $"n").isEmpty)
    spans.unpersist()
  }

  test("q146 repetition scrub: order-preserving, duplicate-free, idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = SpanOps.repetitionScrub(spark, dir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, u) = (r.getAs[Long]("n_sentences"), r.getAs[Long]("n_unique"))
      assert(u <= n && u >= 1, s"counts inconsistent: $r")
      val sentences = r.getAs[String]("scrubbed").split("\\. ").toSeq
      assert(sentences.length == u.toInt,
        s"rebuilt text holds ${sentences.length} sentences, expected $u")
      assert(sentences.distinct.length == sentences.length,
        s"duplicates survived the scrub for doc ${r.get(0)}")
    }
    // idempotent: scrubbing the scrubbed corpus changes nothing
    val scrubbedDocs = out.select($"doc_id", $"scrubbed".as("text"))
    val redir = tmpDir("rescrub")
    scrubbedDocs.write.mode("overwrite").parquet(s"$redir/documents.parquet")
    val again = SpanOps.repetitionScrub(spark, redir)
      .select($"doc_id", $"scrubbed").as[(Long, String)].collect().toMap
    val once = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("scrubbed")).toMap
    assert(again == once, "scrub is not idempotent")
    // and order preservation: each doc's first sentence survives first
    val firsts = graft.Tables.load(spark, dir, "documents")
      .select($"doc_id", split($"text", "\\. ").getItem(0).as("s0"))
      .as[(Long, String)].collect().toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("scrubbed").startsWith(firsts(id).take(20)),
        s"doc $id lost its leading sentence")
    }
  }

  test("span plans: no cartesian product, windows partitioned by doc") {
    for (q <- Seq(SpanOps.dupSpans _, SpanOps.contaminationSpans _)) {
      val plan = q(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
    }
  }
}
