package graft.functions

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property checks for the mergeable Misra–Gries sketch. The q122
  * oracle only asserts the theorem FLAGS; this spec is where the
  * theorems themselves are exercised against exact counts, under
  * random data, random skew, and random PARTITIONINGS (partition count
  * drives how much work lands in merge() vs reduce()).
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private val M = 8

  /** (exact counts, sketch state) for a stream at a partition count. */
  private def run(items: Seq[String], parts: Int): (Map[String, Long], (Map[String, Long], Long, Long)) = {
    val df = items.toDF("g").repartition(parts)
    val row = df.agg(MisraGriesAgg.column(M)($"g").as("sk")).select("sk.*").head()
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    (exact, (row.getAs[Map[String, Long]]("counts"), row.getAs[Long]("err"), row.getAs[Long]("n")))
  }

  private def assertInvariants(exact: Map[String, Long], sk: (Map[String, Long], Long, Long), label: String): Unit = {
    val (counts, err, n) = sk
    assert(n == exact.values.sum, s"$label: n mismatch")
    assert(counts.size <= M, s"$label: more than $M counters kept")
    // two-sided per-item guarantee, including absent items (est = 0)
    for ((g, t) <- exact) {
      val est = counts.getOrElse(g, 0L)
      assert(est <= t && est + err >= t,
        s"$label: bounds violated for '$g': est=$est exact=$t err=$err")
    }
    // no phantom items: every counter corresponds to a real arrival
    for ((g, est) <- counts)
      assert(exact.contains(g) && est > 0, s"$label: phantom counter '$g'=$est")
    // decrement-mass invariant: err·(m+1) ≤ n − Σ counters
    assert(err * (M + 1) <= n - counts.values.sum,
      s"$label: mass bound violated: err=$err n=$n kept=${counts.values.sum}")
  }

  test("MG bounds hold for random streams across partitionings (reduce- and merge-heavy)") {
    for (seed <- 1 to 5) {
      val gen = Gen.listOfN(400,
        Gen.frequency(3 -> Gen.oneOf((1 to 40).map("w" + _)), 1 -> Gen.oneOf("hot1", "hot2")))
      val items = gen.apply(Gen.Parameters.default, Seed(7000L + seed)).get
      for (parts <- Seq(1, 3, 16)) { // 1 = pure reduce; 16 = merge-dominated
        val (exact, sk) = run(items, parts)
        assertInvariants(exact, sk, s"seed=$seed parts=$parts")
      }
    }
  }

  test("items above n/(m+1) are guaranteed present, whatever the order or partitioning") {
    // 120 of one item out of 400 total >> 400/9 — must survive any run
    val items = scala.util.Random.shuffle(
      List.fill(120)("HEAVY") ++ (1 to 280).map(i => "t" + (i % 70)))
    for (parts <- Seq(1, 4, 16)) {
      val (exact, sk) = run(items, parts)
      assertInvariants(exact, sk, s"skew parts=$parts")
      val (counts, err, _) = sk
      assert(counts.contains("HEAVY") && counts("HEAVY") >= exact("HEAVY") - err,
        s"guaranteed heavy hitter evicted at parts=$parts: $counts err=$err")
    }
  }

  test("null items are ignored, not stored as null map keys") {
    val df = Seq("a", null, "a", null, "b").toDF("g")
    val row = df.agg(MisraGriesAgg.column(M)($"g").as("sk")).select("sk.*").head()
    assert(row.getAs[Long]("n") == 3, "nulls must not count toward n")
    assert(row.getAs[Map[String, Long]]("counts") == Map("a" -> 2L, "b" -> 1L))
  }

  test("vocab wider than m forces live decrement and merge-shrink paths") {
    val items = (1 to 300).map(i => "v" + (i % 50)) // 50 distinct >> m=8
    val (exact, sk) = run(items, 8)
    assertInvariants(exact, sk, "wide-vocab")
    assert(sk._2 > 0, "expected a live decrement path (err > 0) when vocab >> m")
  }
}
