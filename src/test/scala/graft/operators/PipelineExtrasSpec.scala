package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: chain, triangle, and isolated pairs resolve to min-id labels") {
    // components: {1,2,3,4,5} (a path), {10,11,12} (a triangle), {20,21}
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L),
    ).toDF("a_id", "b_id")
    val labels = TextDedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(labels(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(labels(_) == 10L))
    assert(Seq(20L, 21L).forall(labels(_) == 20L))
    assert(labels.size == 10)
    // the distributed hash-min loop (forced past the union-find
    // fast path) must produce the identical labeling
    val distributed = TextDedup.connectedComponents(pairs, smallGraphMax = -1L)
      .as[(Long, Long)].collect().toMap
    assert(distributed == labels)
  }

  test("connectedComponents: a 300-deep chain converges distributed (pointer-halving fallback)") {
    // diameter 299: plain hash-min walks one hop per round and would
    // blow the 25-round assertion; the halving fallback (round 8+)
    // doubles propagation distance per round → ~8 + log2(300) rounds
    val pairs = (1L until 300L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    var rounds = 0
    val labels = TextDedup.connectedComponents(pairs, smallGraphMax = -1L,
        loopName = "spec-cc-deep", onRound = r => rounds = r + 1)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == 300 && labels.values.forall(_ == 1L))
    assert(rounds <= 20, s"took $rounds rounds — halving not engaging")
    // and the driver union-find agrees exactly
    val local = TextDedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(local == labels)
  }

  test("redactPii / piiCounts on genuine PII text") {
    val df = Seq(
      ("mail me at jane.doe+spam@sub.example.co.uk or bob@x.io",
        2L, 0L, 0L),
      ("server 192.168.0.1 and 10.255.3.77 up, call +1-555-0123", 0L, 2L, 1L),
      ("nothing sensitive here", 0L, 0L, 0L),
    ).toDF("t", "e", "i", "p")
    val cols = Seq(PipelineOps.redactPii($"t").as("r"), $"e", $"i", $"p") ++
      PipelineOps.piiCounts($"t")
    val got = df.select(cols: _*).collect()
    got.foreach { r =>
      assert(r.getAs[Long]("n_emails") == r.getAs[Long]("e"))
      assert(r.getAs[Long]("n_ips") == r.getAs[Long]("i"))
      assert(r.getAs[Long]("n_phones") == r.getAs[Long]("p"))
    }
    val redacted = got.map(_.getAs[String]("r"))
    assert(redacted(0) == "mail me at [EMAIL] or [EMAIL]")
    assert(redacted(1) == "server [IP] and [IP] up, call [PHONE]")
    assert(redacted(2) == "nothing sensitive here")
  }

  test("tokenPacking: packs are contiguous, budget-aligned, and cover every doc") {
    val out = PipelineOps.tokenPacking(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // doc order ascending, pack ids non-decreasing, and each pack's
    // exclusive start offset is below (pack_id+1) * budget
    var cum = 0L
    var lastPack = 0L
    out.foreach { case (_, tokens, pack) =>
      assert(pack >= lastPack)
      assert(pack == cum / 2048L, s"pack $pack != ${cum / 2048L}")
      cum += tokens
      lastPack = pack
    }
  }

  test("q43 sketches: HLL and approx-percentile stay within advertised error of exact companions") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val exactParts = li.select($"l_partkey").distinct().count()
    val exactOrders = li.select($"l_orderkey").distinct().count()
    val exactP50 = li.selectExpr("percentile(l_quantity, 0.5) AS p").as[Double].head()
    val approx = li.select(
      approx_count_distinct($"l_partkey").as("ap"),
      approx_count_distinct($"l_orderkey").as("ao"),
      approx_percentile($"l_quantity", lit(0.5), lit(1000)).as("ap50"))
      .head()
    // HLL default rsd = 0.05; assert 2σ. accuracy-1000 percentile: rank
    // slop n/1000 → ±0.05 on this value distribution.
    assert(math.abs(approx.getAs[Long]("ap") - exactParts).toDouble / exactParts <= 0.1)
    assert(math.abs(approx.getAs[Long]("ao") - exactOrders).toDouble / exactOrders <= 0.1)
    assert(math.abs(approx.getAs[Double]("ap50") - exactP50) / exactP50 <= 0.05)
    // and the oracled flags come out TRUE (what the driver hash-compares)
    val flags = ExtendedRelational.approxSketches(spark, dir)
      .select($"hll_parts_ok", $"hll_orders_ok", $"pctl_p50_ok")
      .head()
    assert(flags.getBoolean(0) && flags.getBoolean(1) && flags.getBoolean(2))
  }
}
