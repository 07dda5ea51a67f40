package graft.merge

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property fuzz for the P9 merge join against an executable Scala
  * model: generated left/right tables with overlapping and disjoint
  * keys, duplicate keys on the right (row multiplication), null
  * values in common columns (coalesce must fall back per CELL), and
  * keys that only match through the string-coercion rule
  * (`Transform.joinKey`: trim + strip a trailing ".0+" off integral
  * decimals — "7" merges with "7.0"). The q07-q09 oracles pin three
  * fixed shapes; the model pins the CONTRACT over 80 generated pairs
  * per join type.
  */
class MergeJobPropSpec extends SparkSpec {
  import spark.implicits._

  // keys drawn from a small space (forces matches), rendered in forms
  // the coercion must unify — plus some that must NOT unify
  private val key: Gen[String] = Gen.frequency(
    4 -> Gen.chooseNum(0, 6).map(_.toString),
    2 -> Gen.chooseNum(0, 6).map(k => s"$k.0"),
    2 -> Gen.chooseNum(0, 6).map(k => s" $k "), // trimmed
    1 -> Gen.chooseNum(0, 6).map(k => s"$k.5"), // NOT integral — stays distinct
    1 -> Gen.const("x"),
  )

  private val cell: Gen[String] = Gen.frequency(
    4 -> Gen.alphaNumStr.map(_.take(6)),
    1 -> Gen.const(null),
  )

  private def tableGen(n: Int): Gen[List[(String, String, String)]] =
    Gen.listOfN(n, Gen.zip(key, cell, cell).map { case (k, a, b) => (k, a, b) })

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** The spec's own rendering of Transform.joinKey. */
  private def jk(s: String): String =
    if (s == null) null
    else {
      val t = s.trim
      val m = "^(-?\\d+)\\.0+$".r
      t match { case m(i) => i; case _ => t }
    }

  /** Executable model of MergeJob.merge for (k, lv, shared) ⋈ (k, rv, shared):
    * left cols (k, lv, c) then right-only (rv); c resolves right-over-
    * left per cell; left join keeps unmatched left; full adds unmatched
    * right. Output tuples ordered like the real column order.
    */
  private def model(
      left: Seq[(String, String, String)], right: Seq[(String, String, String)],
      full: Boolean): Seq[(String, String, String, String)] = {
    val rIndex = right.groupBy(r => jk(r._1))
    val fromLeft = left.flatMap { case (lk, lv, lc) =>
      rIndex.get(jk(lk)) match {
        case Some(rs) => rs.map { case (rk, rv, rc) =>
          // common cols: k and c resolve right-over-left (coalesce)
          (Option(rk).getOrElse(lk), lv, Option(rc).getOrElse(lc), rv)
        }
        case None => Seq((lk, lv, lc, null))
      }
    }
    val lKeys = left.map(l => jk(l._1)).toSet
    val fromRight =
      if (!full) Nil
      else right.filterNot(r => lKeys(jk(r._1))).map { case (rk, rv, rc) =>
        (rk, null, rc, rv)
      }
    fromLeft ++ fromRight
  }

  private def run(left: Seq[(String, String, String)],
      right: Seq[(String, String, String)], joinType: String): Seq[(String, String, String, String)] = {
    val l = left.toDF("k", "lv", "c")
    val r = right.toDF("k", "rv", "c")
    MergeJob.merge(l, r, "k", "k", joinType)
      .select($"k", $"lv", $"c", $"rv")
      .as[(String, String, String, String)].collect().toSeq
  }

  test("80 generated merges match the executable model (left and full, dup keys, coercion, nulls)") {
    (1 to 40).foreach { i =>
      val left = sample(tableGen(6), 8800L + i).distinctBy(_._1) // unique left keys: dup-left ordering is not contractual
      val right = sample(tableGen(5), 9900L + i)
      Seq("left", "full").foreach { jt =>
        val got = run(left, right, jt).sortBy(t => (s"${t._1}", s"${t._2}", s"${t._3}", s"${t._4}"))
        val want = model(left, right, jt == "full")
          .sortBy(t => (s"${t._1}", s"${t._2}", s"${t._3}", s"${t._4}"))
        assert(got == want,
          s"seed $i ($jt)\n  left:  $left\n  right: $right\n  got:  $got\n  want: $want")
      }
    }
  }

  test("broadcast hint changes the plan, never the rows") {
    // render-sort: tuple Ordering NPEs on null cells
    def srt(xs: Seq[(String, String, String, String)]) = xs.sortBy(_.toString)
    val left = sample(tableGen(8), 777L)
    val right = sample(tableGen(5), 778L)
    val plain = srt(run(left, right, "left"))
    val l = left.toDF("k", "lv", "c"); val r = right.toDF("k", "rv", "c")
    val hinted = srt(MergeJob.merge(l, r, "k", "k", "left", broadcastRight = true)
      .select($"k", $"lv", $"c", $"rv")
      .as[(String, String, String, String)].collect().toSeq)
    assert(hinted == plain)
  }
}
