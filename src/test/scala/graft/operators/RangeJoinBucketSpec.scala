package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q38's bucketed interval join ≡ the naive user-keyed formulation —
  * on the corpus AND on a boundary fixture that pins every edge the
  * bucketing could get wrong: a pair exactly at the +5 min limit
  * (inclusive, crosses a bucket edge from a bucket-aligned view),
  * one just past it, equal timestamps (excluded by the strict lower
  * bound), purchases before views, and same-bucket vs
  * adjacent-bucket matches. Each true pair must also be counted
  * exactly ONCE (the explode produces two distinct bucket values, so
  * a double-count would show as n_pairs inflation).
  */
class RangeJoinBucketSpec extends SparkSpec {
  import spark.implicits._

  private def naive(events: org.apache.spark.sql.DataFrame) = {
    val v = events.filter($"event_type" === "view").select($"user_id", $"ts".as("t1"))
    val p = events.filter($"event_type" === "purchase")
      .select($"user_id".as("u2"), $"ts".as("t2"))
    v.join(p, $"user_id" === $"u2" && $"t2" > $"t1" &&
        $"t2" <= $"t1" + expr("INTERVAL 5 MINUTES"))
      .groupBy($"user_id").agg(count(lit(1)).as("n_pairs"))
      .orderBy($"user_id")
  }

  test("bucketed q38 equals the naive pair product on the corpus") {
    val dir = "/root/testdata/sf0.001"
    val got = ExtendedRelational.rangeJoinFunnel(spark, dir).collect().toSeq
    val want = naive(graft.Tables.load(spark, dir, "events")).collect().toSeq
    assert(got == want, s"bucketed != naive:\n$got\nvs\n$want")
  }

  test("boundary fixture: inclusive +5min edge, strict lower bound, bucket edges") {
    val base = 1700000100000000L // micros, bucket-aligned (mult of 3e8)
    assert(base % 300000000L == 0L)
    def ts(micros: Long) = timestamp_micros(lit(micros))
    val rows = Seq(
      // u1: purchase exactly +5min from a bucket-ALIGNED view —
      // inclusive edge, lands 2 buckets away from the view's start?
      // no: view at bucket k start, purchase at k+1 start — adjacent
      (1L, "view", base),
      (1L, "purchase", base + 300000000L), // == +5min: MATCH (<=)
      (1L, "purchase", base + 300000001L), // one micro past: no match
      // u2: equal timestamps — strict > excludes
      (2L, "view", base + 50L),
      (2L, "purchase", base + 50L),
      // u2: purchase BEFORE the view — excluded
      (2L, "purchase", base - 1000000L),
      // u3: same-bucket match (tight)
      (3L, "view", base + 10000000L),
      (3L, "purchase", base + 10000001L),
      // u3: adjacent-bucket match (view late in bucket, purchase
      // early in the next)
      (3L, "view", base + 299999999L),
      (3L, "purchase", base + 300000002L),
      // u4: two views share one purchase — two pairs
      (4L, "view", base + 1000000L),
      (4L, "view", base + 2000000L),
      (4L, "purchase", base + 3000000L)
    )
    val df = rows.toDF("user_id", "event_type", "us")
      .select($"user_id", $"event_type", timestamp_micros($"us").as("ts"))
    // route the fixture through the SAME operator body via a temp
    // parquet dir shaped like the corpus
    val dir = tmpDir("rjb")
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = ExtendedRelational.rangeJoinFunnel(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = naive(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"bucketed $got != naive $want")
    // u3's three: both tight pairs plus the early view reaching the
    // late purchase at delta ~290 s — still inside the 5-min window
    assert(got == Map(1L -> 1L, 3L -> 3L, 4L -> 2L),
      s"boundary semantics drifted: $got")
  }
}
