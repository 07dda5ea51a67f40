package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized parity for the window-top-k rewrite: for random data
  * (ties, nulls, skewed keys), random k and both directions, the
  * rewritten plan must select exactly the rows the plain window
  * selects — compared as per-key MULTISETS of order values (under
  * ties, row identity is arbitrary in BOTH plans, but the multiset of
  * selected order values is deterministic; null-order rows compare by
  * count). Ground truth is re-derived in PLAIN SCALA — an in-session
  * "control" query is impossible: constant folding canonicalizes any
  * `rn + 0 <= k` dodge back to the literal pattern before the rule
  * runs, so the control gets rewritten too (verified: it does).
  */
class TopKWindowRewritePropSpec extends SparkSpec {
  import spark.implicits._

  TopKWindowRewriteRule.install(spark)

  private val rowGen: Gen[(Long, String, Option[Long])] = for {
    id <- Gen.chooseNum(1L, 100000L)
    key <- Gen.frequency(5 -> Gen.oneOf("a", "b"), 2 -> Gen.oneOf("c", "d", "e"))
    score <- Gen.frequency(
      6 -> Gen.chooseNum(0L, 8L).map(Some(_)), // small domain → heavy ties
      1 -> Gen.const(None))
  } yield (id, key, score)

  test("rewritten selection == window selection for random data, k, direction") {
    for (seed <- 1 to 6) {
      val raw = Gen.listOfN(120, rowGen)
        .apply(Gen.Parameters.default, Seed(9100L + seed)).get
        .zipWithIndex.map { case ((_, k, s), ix) => (ix.toLong + 1, k, s) } // unique ids
      val k = 1 + seed % 4
      val desc = seed % 2 == 0
      val df = raw.map { case (id, key, s) =>
        (id, key, s.map(Long.box).orNull.asInstanceOf[java.lang.Long])
      }.toDF("id", "key", "score")
      val ord = if (desc) $"score".desc else $"score".asc_nulls_last
      val w = Window.partitionBy($"key").orderBy(ord)
      val q = df.withColumn("rn", row_number().over(w)).filter($"rn" <= k)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"seed=$seed: rewrite did not fire:\n$plan")

      val got: Map[String, Seq[Option[Long]]] =
        q.collect().groupBy(_.getString(1)).map { case (key, rs) =>
          key -> rs.map(r => if (r.isNullAt(2)) None else Some(r.getLong(2)))
            .toSeq.sortBy(_.getOrElse(Long.MinValue))
        }
      // plain-Scala window semantics: non-nulls in order, nulls last
      val want: Map[String, Seq[Option[Long]]] =
        raw.groupBy(_._2).map { case (key, rs) =>
          val nonNull = rs.flatMap(_._3).sorted
          val ordered = if (desc) nonNull.reverse else nonNull
          val sel = ordered.map(Option(_)) ++
            Seq.fill(rs.count(_._3.isEmpty))(None: Option[Long])
          key -> sel.take(k).sortBy(_.getOrElse(Long.MinValue))
        }
      assert(got == want,
        s"seed=$seed k=$k desc=$desc: selected order-value multisets differ:\n$got\nvs\n$want")
      // ranks must be 1..count per key in both
      assert(q.groupBy($"key").agg(max($"rn").as("m"), count(lit(1)).as("c"))
        .filter($"m" =!= $"c").count() == 0, s"seed=$seed: rn not dense 1..c")
    }
  }

  test("rank keep-ties selection == window rank selection for random heavy-tie data") {
    // rank mode requires a NON-NULLABLE order column (all nulls tie);
    // a 0..5 value domain over 150 rows per ~5 keys guarantees the
    // threshold value is duplicated — the case the tie buffer (and its
    // eviction re-admission) exists for
    for (seed <- 1 to 6) {
      val raw = Gen.listOfN(150, rowGen)
        .apply(Gen.Parameters.default, Seed(4700L + seed)).get
        .zipWithIndex.map { case ((_, k, s), ix) =>
          (ix.toLong + 1, k, s.getOrElse(0L) % 6) } // dense ties, no nulls
      val k = 1 + seed % 4
      val desc = seed % 2 == 0
      val df = raw.toDF("id", "key", "score")
      val ord = if (desc) $"score".desc else $"score".asc
      val q = df.withColumn("rk",
          rank().over(Window.partitionBy($"key").orderBy(ord)))
        .filter($"rk" <= k)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKeyTies"), s"seed=$seed: rank rewrite did not fire:\n$plan")
      // (value, rank) multisets are deterministic under rank: rank
      // depends only on strictly-better counts, never tie order
      val got: Map[String, Seq[(Long, Int)]] =
        q.collect().groupBy(_.getString(1)).map { case (key, rs) =>
          key -> rs.map(r => (r.getLong(2), r.getInt(3))).toSeq.sorted
        }
      val want: Map[String, Seq[(Long, Int)]] =
        raw.groupBy(_._2).flatMap { case (key, rs) =>
          val vals = rs.map(_._3)
          def better(v: Long) = if (desc) vals.count(_ > v) else vals.count(_ < v)
          val sel = vals.collect { case v if better(v) < k => (v, better(v) + 1) }
          if (sel.isEmpty) None else Some(key -> sel.sorted)
        }
      assert(got == want,
        s"seed=$seed k=$k desc=$desc: rank selections differ:\n$got\nvs\n$want")
    }
  }

  test("dense selection == window dense_rank selection for random heavy-tie data") {
    // tiny value domain → each kept rank is a CLASS of many rows; the
    // (value, dense_rank) pairs and the full row set are deterministic
    for (seed <- 1 to 6) {
      val raw = Gen.listOfN(130, rowGen)
        .apply(Gen.Parameters.default, Seed(6200L + seed)).get
        .zipWithIndex.map { case ((_, k, s), ix) =>
          (ix.toLong + 1, k, s.getOrElse(0L) % 5) }
      val k = 1 + seed % 3
      val desc = seed % 2 == 0
      val df = raw.toDF("id", "key", "score")
      val ord = if (desc) $"score".desc else $"score".asc
      val q = df.withColumn("dr",
          dense_rank().over(Window.partitionBy($"key").orderBy(ord)))
        .filter($"dr" <= k)
      assert(q.queryExecution.executedPlan.toString.contains("TopKPerKeyDense"),
        s"seed=$seed: dense rewrite did not fire")
      val got = q.collect().map(r => (r.getString(1), r.getLong(0), r.getInt(3))).toSet
      val want = raw.groupBy(_._2).flatMap { case (key, rs) =>
        val distinct = rs.map(_._3).distinct.sorted
        val ranked = (if (desc) distinct.reverse else distinct).take(k).zipWithIndex.toMap
        rs.collect { case (id, _, v) if ranked.contains(v) => (key, id, ranked(v) + 1) }
      }.toSet
      assert(got == want,
        s"seed=$seed k=$k desc=$desc: dense selections differ:\n" +
          s"${got.diff(want)}\nvs\n${want.diff(got)}")
    }
  }

  test("multi-column struct-key selection == window selection for random heavy-tie data") {
    // two same-direction order columns, first from a tiny domain so the
    // tie-break column genuinely decides; ids unique → total order, so
    // the comparison can be exact row sets (no multiset hedging), and
    // rank must agree with row_number
    for (seed <- 1 to 6) {
      val raw = Gen.listOfN(140, rowGen)
        .apply(Gen.Parameters.default, Seed(8400L + seed)).get
        .zipWithIndex.map { case ((_, k, s), ix) =>
          (ix.toLong + 1, k, s.getOrElse(0L) % 4) }
      val k = 1 + seed % 4
      val desc = seed % 2 == 0
      val df = raw.toDF("id", "key", "score")
      val w =
        if (desc) Window.partitionBy($"key").orderBy($"score".desc, $"id".desc)
        else Window.partitionBy($"key").orderBy($"score".asc, $"id".asc)
      val q = df.withColumn("rn", row_number().over(w)).filter($"rn" <= k)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"seed=$seed: multi-order rewrite did not fire:\n$plan")
      val got = q.collect().map(r => (r.getString(1), r.getLong(0), r.getInt(3))).toSet
      val want = raw.groupBy(_._2).flatMap { case (key, rs) =>
        val sorted =
          if (desc) rs.sortBy(t => (-t._3, -t._1)) else rs.sortBy(t => (t._3, t._1))
        sorted.take(k).zipWithIndex.map { case (t, ix) => (key, t._1, ix + 1) }
      }.toSet
      assert(got == want,
        s"seed=$seed k=$k desc=$desc: multi-order selections differ:\n" +
          s"${got.diff(want)}\nvs\n${want.diff(got)}")
      val qr = df.withColumn("rk", rank().over(w)).filter($"rk" <= k)
      assert(qr.queryExecution.executedPlan.toString.contains("TopKPerKeyTies"),
        s"seed=$seed: multi-order rank rewrite did not fire")
      val gotR = qr.collect().map(r => (r.getString(1), r.getLong(0), r.getInt(3))).toSet
      assert(gotR == want, s"seed=$seed: unique tuples — rank must equal row_number")
    }
  }

  test("MIXED-direction struct-key selection == window selection for random heavy-tie data") {
    // `score DESC, id ASC` (and the mirror): the against-the-grain id
    // flips via bitwise NOT inside the struct key; ids unique → total
    // order → exact row sets, and rank must agree with row_number
    for (seed <- 1 to 6) {
      val raw = Gen.listOfN(140, rowGen)
        .apply(Gen.Parameters.default, Seed(5300L + seed)).get
        .zipWithIndex.map { case ((_, k, s), ix) =>
          (ix.toLong + 1, k, s.getOrElse(0L) % 4) }
      val k = 1 + seed % 4
      val descFirst = seed % 2 == 0
      val df = raw.toDF("id", "key", "score")
      val w =
        if (descFirst) Window.partitionBy($"key").orderBy($"score".desc, $"id".asc)
        else Window.partitionBy($"key").orderBy($"score".asc, $"id".desc)
      val q = df.withColumn("rn", row_number().over(w)).filter($"rn" <= k)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"seed=$seed: mixed-order rewrite did not fire:\n$plan")
      val got = q.collect().map(r => (r.getString(1), r.getLong(0), r.getInt(3))).toSet
      val want = raw.groupBy(_._2).flatMap { case (key, rs) =>
        val sorted =
          if (descFirst) rs.sortBy(t => (-t._3, t._1)) else rs.sortBy(t => (t._3, -t._1))
        sorted.take(k).zipWithIndex.map { case (t, ix) => (key, t._1, ix + 1) }
      }.toSet
      assert(got == want,
        s"seed=$seed k=$k descFirst=$descFirst: mixed-order selections differ:\n" +
          s"${got.diff(want)}\nvs\n${want.diff(got)}")
      val qr = df.withColumn("rk", rank().over(w)).filter($"rk" <= k)
      assert(qr.queryExecution.executedPlan.toString.contains("TopKPerKeyTies"),
        s"seed=$seed: mixed-order rank rewrite did not fire")
      val gotR = qr.collect().map(r => (r.getString(1), r.getLong(0), r.getInt(3))).toSet
      assert(gotR == want, s"seed=$seed: unique tuples — rank must equal row_number")
    }
  }
}
