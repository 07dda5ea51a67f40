package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The sketch-rollup family (q130/q132/q133) + the bucketed join
  * (q131): every audit flag must be TRUE (that is the oracle's
  * contract), the exact companions must equal independently-derived
  * ground truth, and — so the audits are not vacuously green — the
  * sketches must actually be in ESTIMATION territory where the spec
  * says they are.
  */
class SketchOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private val dir01 = "/root/testdata/sf0.1"

  test("q130: flags true, exact distinct matches, rollup covers every day") {
    val rows = SketchOps.hllDistinctRollup(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("daily_merge_ok"), s"merge est out of bound: $r")
      assert(r.getAs[Boolean]("direct_ok"), s"direct est out of bound: $r")
    }
    import spark.implicits._
    val exact = graft.Tables.load(spark, dir, "events")
      .groupBy($"event_type")
      .agg(count_distinct($"user_id").as("u"), count(lit(1)).as("n"),
        count_distinct(date_trunc("day", $"ts")).as("d"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    rows.foreach { r =>
      val (u, n, d) = exact(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("exact_users") == u)
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Long]("n_days") == d)
    }
  }

  test("q130: merging daily sketches loses nothing vs a direct sketch (coupon regime)") {
    // below 2^14 distinct the HLL sketch is still coupon-exact, so the
    // daily-merged and direct estimates must agree EXACTLY — a stronger
    // invariant than the 5% production bound, available only at test SF.
    import spark.implicits._
    val ev = graft.Tables.load(spark, dir, "events")
    val merged = ev
      .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
      .agg(hll_sketch_agg($"user_id", lit(14)).as("sk"))
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("m"))
    val direct = ev.groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", lit(14))).as("d"))
    merged.join(direct, "event_type").collect().foreach { r =>
      assert(r.getAs[Long]("m") == r.getAs[Long]("d"), s"coupon merge drift: $r")
    }
  }

  test("q132: flags true and exact columns agree with q99's exact overlap") {
    val out = SketchOps.thetaVocabOverlap(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("union_est_ok"), s"union est out of bound: $r")
      assert(r.getAs[Boolean]("inter_est_ok"), s"intersection est out of bound: $r")
    }
    // q99 publishes only pairs with n_common > 0; on those the exact
    // companion columns must match row-for-row.
    val q99 = CorpusOps.sourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_common"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))).toMap
    val covered = out.filter(r => r.getAs[Long]("n_common") > 0)
    assert(covered.nonEmpty)
    covered.foreach { r =>
      val k = (r.getAs[String]("a_source"), r.getAs[String]("b_source"))
      assert(q99.contains(k), s"pair $k missing from q99")
      val (c, a, b) = q99(k)
      assert(r.getAs[Long]("n_common") == c && r.getAs[Long]("n_a") == a &&
        r.getAs[Long]("n_b") == b, s"exact companion drift at $k")
    }
  }

  test("q132: theta sketches are genuinely estimating at sf0.1 (audit not vacuous)") {
    // every per-source vocabulary must exceed the 2^12 nominal entries,
    // otherwise the sketch is in exact mode and the bound check proves
    // nothing about estimation. sf0.1 is the smallest driver SF where
    // vocabularies (~10k/source) cross that line.
    val out = SketchOps.thetaVocabOverlap(spark, dir01).collect()
    val minVocab = out.map(r => math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))).min
    assert(minVocab > (1 << 12), s"vocab $minVocab <= 4096: theta audit vacuous at sf0.1")
    out.foreach { r =>
      assert(r.getAs[Boolean]("union_est_ok") && r.getAs[Boolean]("inter_est_ok"),
        s"estimation-mode bound violated: $r")
    }
  }

  test("q133: flags true and exact quantiles match a plain-Scala percentile") {
    val Array(r) = SketchOps.kllQuantileRollup(spark, dir).collect()
    assert(r.getAs[Boolean]("rank_p50_ok") && r.getAs[Boolean]("rank_p90_ok") &&
      r.getAs[Boolean]("rank_p99_ok"))
    val qty = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_quantity")).collect().map(_.getDouble(0)).sorted
    assert(r.getAs[Long]("n_rows") == qty.length)
    def pct(p: Double): Double = { // exact-percentile interpolation (Spark/DuckDB cont)
      val pos = p * (qty.length - 1)
      val lo = pos.toInt
      val frac = pos - lo
      val v = if (lo + 1 < qty.length) qty(lo) * (1 - frac) + qty(lo + 1) * frac else qty(lo)
      math.rint(v * 100) / 100
    }
    assert(r.getAs[Double]("exact_p50") == pct(0.5))
    assert(r.getAs[Double]("exact_p90") == pct(0.9))
    assert(r.getAs[Double]("exact_p99") == pct(0.99))
  }

  test("q131: bucketed join result equals the raw-parquet control") {
    val a = StorageOps.bucketedJoin(spark, dir).collect()
    val b = StorageOps.unbucketedJoin(spark, dir).collect()
    assert(a.toSeq == b.toSeq, s"bucketed/raw drift:\n${a.toSeq}\nvs\n${b.toSeq}")
    assert(a.nonEmpty)
  }

  test("q131: the bucketed layout removes the join-key shuffle the raw plan pays") {
    val bucketed = StorageOps.bucketedJoin(spark, dir)
    bucketed.collect()
    val bp = bucketed.queryExecution.executedPlan.toString
    assert(bp.contains("SortMergeJoin"), s"expected SMJ:\n$bp")
    assert(bp.contains("Bucketed: true"), s"scans not bucketed:\n$bp")
    assert(!bp.contains("Exchange hashpartitioning(l_orderkey") &&
      !bp.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles its keys:\n$bp")
    val raw = StorageOps.unbucketedJoin(spark, dir)
    raw.collect()
    val rp = raw.queryExecution.executedPlan.toString
    assert(rp.contains("Exchange hashpartitioning(l_orderkey") ||
      rp.contains("Exchange hashpartitioning(o_orderkey"),
      s"control lost its shuffle — the comparison is vacuous:\n$rp")
  }

  test("q141: base+delta merge equals full recompute; closed days never rescanned") {
    import spark.implicits._
    val rows = SketchOps.incrementalRollup(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("merged_ok"),
      s"merged sketch estimate out of bound: $r"))
    val full = graft.Tables.load(spark, dir, "events")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("s"),
        count_distinct($"user_id").as("u"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(rows.map(_.getString(0)).toSet == full.keySet)
    rows.foreach { r =>
      val (n, s, u) = full(r.getString(0))
      assert(r.getAs[Long]("n_events") == n, s"count drift: $r")
      assert(r.getAs[Double]("sum_value") == s, s"sum drift: $r")
      assert(r.getAs[Long]("exact_users") == u, s"distinct drift: $r")
    }
    // the artifact really is a stored summary, not a view over history:
    // per-group sketch bytes on disk, and the apply's only events scan
    // carries the pushed delta-boundary predicate
    val basePath = SketchOps.ensureBaseRollup(spark, dir)
    val base = spark.read.parquet(basePath)
    assert(base.columns.toSet == Set("event_type", "n_events", "sum_value", "sk"))
    assert(base.filter($"sk".isNull).count() == 0, "base artifact missing sketches")
    val plan = SketchOps.incrementalRollup(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("2024-01-30"),
      s"delta boundary not visible in any scan predicate:\n$plan")
  }
}
