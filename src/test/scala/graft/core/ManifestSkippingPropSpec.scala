package graft.core

import graft.SparkSpec
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Arbitrary}
import org.scalacheck.rng.Seed

/** Property fuzz for the skipping evaluator's ONE safety property:
  * `mayMatch == false` must imply NO row of the file satisfies the
  * filters — judged against catalyst's own interpreted evaluation as
  * ground truth, over random rows, random (possibly truncated,
  * possibly degraded) envelopes derived from those rows, and random
  * filter trees from the handled grammar. A second monotonicity
  * property pins the degradation direction: losing information
  * (bounds, null counts, whole columns, the row count) may only turn
  * skips into keeps, never keeps into skips. Deterministic seeds so
  * failures reproduce.
  */
class ManifestSkippingPropSpec extends SparkSpec {

  private val idAttr = AttributeReference("id", LongType, nullable = true)()
  private val sAttr = AttributeReference("s", StringType, nullable = true)()

  private type Row2 = (Option[Long], Option[String])

  // strings with truncation pressure: long shared prefixes, unicode,
  // near-boundary mutations
  private val strGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.const("shared-prefix-0123456789-ABCDEFGH"),
    Gen.alphaNumStr.map(s => "shared-prefix-0123456789-" + s.take(8)),
    Gen.const("新闻-prefix-very-long-unicode-例子-tail"),
    Gen.const(""), Gen.const("zzz"), Gen.const("emoji 😀 suffix that is long"),
  )

  private val rowGen: Gen[Row2] = for {
    id <- Gen.option(Gen.chooseNum(-50L, 50L))
    s <- Gen.option(strGen)
  } yield (id, s)

  /** Exact stats of the generated rows, through the SAME truncation
    * the writer applies.
    */
  private def statsOf(rows: List[Row2]): (Long, Seq[ColStat]) = {
    val ids = rows.flatMap(_._1)
    val ss = rows.flatMap(_._2)
    val idStat = ColStat("id", 'i',
      ids.minOption.map(_.toString), ids.maxOption.map(_.toString),
      rows.count(_._1.isEmpty).toLong)
    val sStat = ColStat("s", 's',
      ss.minOption(Ordering.fromLessThan[String](ParquetStats.cmpUtf8(_, _) < 0))
        .map(ParquetStats.truncateMin),
      ss.maxOption(Ordering.fromLessThan[String](ParquetStats.cmpUtf8(_, _) < 0))
        .flatMap(ParquetStats.truncateMax),
      rows.count(_._2.isEmpty).toLong)
    (rows.size.toLong, Seq(idStat, sStat))
  }

  /** Random information loss — each step may only widen the envelope. */
  private def degrade(rc: Long, cols: Seq[ColStat], g: Gen.Parameters,
      seed: Seed): (Long, Seq[ColStat]) = {
    val picks = Gen.listOfN(cols.size * 4 + 1, Arbitrary.arbBool.arbitrary)
      .apply(g, seed).get
    var i = -1
    def next(): Boolean = { i += 1; picks(i) }
    val rc2 = if (next()) rc else -1L
    val cols2 = cols.flatMap { c =>
      if (next()) None // drop the whole column
      else Some(c.copy(
        min = if (next()) None else c.min,
        max = if (next()) None else c.max,
        nullCount = if (next()) -1L else c.nullCount))
    }
    (rc2, cols2)
  }

  private def litL(v: Long) = Literal(v, LongType)
  private def litS(v: String) = Literal(UTF8String.fromString(v), StringType)

  /** Filter-tree generator over exactly the handled grammar, with
    * literals biased toward the data's range and its boundaries.
    */
  private def exprGen(rows: List[Row2]): Gen[Expression] = {
    val idPool: Seq[Long] = (rows.flatMap(_._1) ++ Seq(-51L, 0L, 51L, 100L)).distinct
    val sPool: Seq[String] = (rows.flatMap(_._2) ++
      Seq("", "a", "shared-prefix-0123456789", "shared-prefix-0123456789-X",
        "zzzz", "新闻", "￿")).distinct
    val idLit = Gen.oneOf(idPool).map(litL)
    val sLit = Gen.oneOf(sPool).map(litS)
    val leaf: Gen[Expression] = Gen.oneOf(
      idLit.map(l => EqualTo(idAttr, l)),
      idLit.map(l => EqualTo(l, idAttr)),
      idLit.map(l => EqualNullSafe(idAttr, l)),
      Gen.const(EqualNullSafe(idAttr, Literal(null, LongType))),
      idLit.map(l => GreaterThan(idAttr, l)),
      idLit.map(l => GreaterThanOrEqual(idAttr, l)),
      idLit.map(l => LessThan(idAttr, l)),
      idLit.map(l => LessThanOrEqual(idAttr, l)),
      idLit.map(l => LessThan(l, idAttr)),
      Gen.listOfN(3, idLit).map(ls => In(idAttr, ls)),
      Gen.listOfN(3, Gen.oneOf(idPool)).map(vs => InSet(idAttr, vs.toSet)),
      Gen.const(IsNull(idAttr)), Gen.const(IsNotNull(idAttr)),
      sLit.map(l => EqualTo(sAttr, l)),
      sLit.map(l => GreaterThan(sAttr, l)),
      sLit.map(l => LessThanOrEqual(sAttr, l)),
      sLit.map(l => StartsWith(sAttr, l)),
      Gen.const(IsNull(sAttr)), Gen.const(IsNotNull(sAttr)),
    )
    def tree(depth: Int): Gen[Expression] =
      if (depth == 0) leaf
      else Gen.frequency(
        4 -> leaf,
        2 -> Gen.zip(tree(depth - 1), tree(depth - 1)).map { case (a, b) => And(a, b) },
        2 -> Gen.zip(tree(depth - 1), tree(depth - 1)).map { case (a, b) => Or(a, b) },
        1 -> tree(depth - 1).map(Not),
      )
    tree(2)
  }

  /** Ground truth: catalyst's interpreted evaluation of the filter
    * over the actual row — exactly what the scan's post-skip Filter
    * would compute (null result = row dropped, like Filter).
    */
  private def satisfies(e: Expression, row: Row2): Boolean = {
    val bound = e.transform {
      case a: AttributeReference if a.name == "id" =>
        BoundReference(0, LongType, nullable = true)
      case a: AttributeReference if a.name == "s" =>
        BoundReference(1, StringType, nullable = true)
    }
    val internal = InternalRow(
      row._1.map(Long.box).orNull,
      row._2.map(UTF8String.fromString).orNull)
    val pred = Predicate.createInterpreted(bound)
    pred.initialize(0)
    pred.eval(internal)
  }

  test("conservatism: a skip verdict implies zero satisfying rows — 400 random (rows, envelope, filters) cases") {
    val params = Gen.Parameters.default
    var skips = 0
    (1 to 400).foreach { i =>
      val seed = Seed(1000L + i)
      val rows = Gen.resize(12, Gen.listOf(rowGen)).apply(params, seed).get
      val (rc, cols) = statsOf(rows)
      val filters = Gen.resize(3, Gen.nonEmptyListOf(exprGen(rows)))
        .apply(params, seed.next).get.take(3)
      val may = ManifestSkipping.mayMatch(filters, rc, cols)
      if (!may) {
        skips += 1
        val survivors = rows.filter(r => filters.forall(f => satisfies(f, r)))
        assert(survivors.isEmpty,
          s"case $i: FALSE SKIP — filters=${filters.mkString(" AND ")} " +
            s"stats=($rc, $cols) surviving rows=$survivors")
      }
    }
    // the fuzz must actually exercise the skip side to prove anything
    assert(skips > 40, s"only $skips/400 cases skipped — generator too timid to test the property")
  }

  test("serialize/deserialize round-trips hostile envelopes exactly — 200 random manifests") {
    val params = Gen.Parameters.default
    val hostile: Gen[String] = Gen.oneOf(
      Gen.const(""), Gen.const("\t"), Gen.const("a\nb"), Gen.const("#,;|"),
      Gen.const("rc:"), Gen.const("新闻 😀 ￿"), Gen.const("\u0000\u0001\u0002"),
      Gen.alphaNumStr.map(_.take(30)), strGen)
    val colGen: Gen[ColStat] = for {
      name <- Gen.oneOf(Gen.alphaNumStr.map("c" + _.take(8)), hostile.map("h" + _))
      tag <- Gen.oneOf('i', 'f', 's', 'd', 't', 'b')
      mn <- Gen.option(hostile) // string payloads stress the b64 layer
      mx <- Gen.option(hostile)
      nc <- Gen.oneOf(Gen.const(-1L), Gen.chooseNum(0L, 1000L))
    } yield ColStat(name, tag,
      // numeric tags carry canonical numerics; only 's' carries raw text
      if (tag == 's') mn else mn.map(_ => "42"),
      if (tag == 's') mx else mx.map(_ => "99"), nc)
    (1 to 200).foreach { i =>
      val seed = Seed(5000L + i)
      val cols = Gen.resize(5, Gen.listOf(colGen)).apply(params, seed).get
      val rc = Gen.oneOf(Gen.const(-1L), Gen.chooseNum(0L, 1e6.toLong))
        .apply(params, seed.next).get
      val m = Manifest(i.toLong, "day", Seq(ManifestEntry(
        "2024-01-01", "g-x/day=2024-01-01", Nil,
        Seq(FileStat("part-0.parquet", 123L, rc, cols)))))
      val back = ManifestTable.deserialize(ManifestTable.serialize(m))
      assert(back.contains(m), s"case $i: round-trip drift for cols=$cols rc=$rc")
    }
  }

  // ---- float columns: signed zeros, extremes, and random envelopes ----

  private val fAttr = AttributeReference("f", DoubleType, nullable = true)()

  private val dblGen: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-5.0, 5.0),
    Gen.oneOf(0.0d, -0.0d, 1.0d, -1.0d, 0.5d, -0.5d,
      Double.MinPositiveValue, -Double.MinPositiveValue,
      Double.MaxValue, Double.MinValue))

  /** Writer-faithful float envelope: per-value min/max with the
    * collection-time signed-zero widening ParquetStats.boundsOf
    * applies (zero min → -0.0, zero max → +0.0).
    */
  private def floatStatsOf(rows: List[Option[Double]], widen: Boolean): (Long, Seq[ColStat]) = {
    val vs = rows.flatten
    val mn0 = vs.minOption
    val mx0 = vs.maxOption
    val mn = if (widen) mn0.map(d => if (d == 0.0d) -0.0d else d) else mn0
    val mx = if (widen) mx0.map(d => if (d == 0.0d) 0.0d else d) else mx0
    (rows.size.toLong, Seq(ColStat("f", 'f',
      mn.map(_.toString), mx.map(_.toString), rows.count(_.isEmpty).toLong)))
  }

  private def litD(v: Double) = Literal(v, DoubleType)

  private def floatExprGen(rows: List[Option[Double]]): Gen[Expression] = {
    val pool: Seq[Double] = (rows.flatten ++
      Seq(0.0d, -0.0d, 1.0d, -1.0d, 6.0d, -6.0d, Double.NaN)).distinct
    val lit = Gen.oneOf(pool).map(litD)
    Gen.oneOf(
      lit.map(l => EqualTo(fAttr, l)),
      lit.map(l => EqualTo(l, fAttr)),
      lit.map(l => EqualNullSafe(fAttr, l)),
      lit.map(l => GreaterThan(fAttr, l)),
      lit.map(l => GreaterThanOrEqual(fAttr, l)),
      lit.map(l => LessThan(fAttr, l)),
      lit.map(l => LessThanOrEqual(fAttr, l)),
      Gen.listOfN(3, lit).map(ls => In(fAttr, ls)),
      Gen.const(IsNull(fAttr)), Gen.const(IsNotNull(fAttr)),
    )
  }

  private def floatSatisfies(e: Expression, row: Option[Double]): Boolean = {
    val bound = e.transform {
      case a: AttributeReference if a.name == "f" =>
        BoundReference(0, DoubleType, nullable = true)
    }
    val pred = Predicate.createInterpreted(bound)
    pred.initialize(0)
    pred.eval(InternalRow(row.map(Double.box).orNull))
  }

  test("float conservatism incl. signed zeros — 400 cases, widened AND legacy (unwidened) envelopes") {
    val params = Gen.Parameters.default
    var skips = 0
    (1 to 400).foreach { i =>
      val seed = Seed(13000L + i)
      val rows = Gen.resize(10, Gen.listOf(Gen.option(dblGen))).apply(params, seed).get
      // i odd: writer-widened envelope (post-fix collection); i even:
      // legacy envelope exactly as a pre-fix manifest recorded it —
      // cmp's zero canonicalization must keep BOTH conservative
      val (rc, cols) = floatStatsOf(rows, widen = i % 2 == 1)
      val filters = Gen.resize(3, Gen.nonEmptyListOf(floatExprGen(rows)))
        .apply(params, seed.next).get.take(3)
      val may = ManifestSkipping.mayMatch(filters, rc, cols)
      if (!may) {
        skips += 1
        val survivors = rows.filter(r => filters.forall(f => floatSatisfies(f, r)))
        assert(survivors.isEmpty,
          s"case $i: FALSE SKIP — filters=${filters.mkString(" AND ")} " +
            s"stats=($rc, $cols) surviving rows=$survivors")
      }
    }
    assert(skips > 40, s"only $skips/400 cases skipped — generator too timid to test the property")
  }

  test("signed-zero regressions: +0.0-only file must NOT be skipped for -0.0 predicates (both envelope vintages)") {
    // the exact ADVICE scenario: all values +0.0
    for (widen <- Seq(true, false)) {
      val (rc, cols) = floatStatsOf(List(Some(0.0d), Some(0.0d)), widen)
      for (f <- Seq[Expression](
        EqualTo(fAttr, litD(-0.0d)),
        LessThanOrEqual(fAttr, litD(-0.0d)),
        GreaterThanOrEqual(fAttr, litD(-0.0d)),
        EqualNullSafe(fAttr, litD(-0.0d)))) {
        assert(ManifestSkipping.mayMatch(Seq(f), rc, cols),
          s"widen=$widen filter=$f falsely skipped a +0.0 file for a -0.0 literal")
      }
      // and symmetrically: -0.0-only file vs +0.0 literals
      val (rc2, cols2) = floatStatsOf(List(Some(-0.0d)), widen)
      for (f <- Seq[Expression](
        EqualTo(fAttr, litD(0.0d)),
        LessThanOrEqual(fAttr, litD(0.0d)),
        GreaterThanOrEqual(fAttr, litD(0.0d)))) {
        assert(ManifestSkipping.mayMatch(Seq(f), rc2, cols2),
          s"widen=$widen filter=$f falsely skipped a -0.0 file for a +0.0 literal")
      }
    }
    // sanity: skipping still fires where it should
    val (rc3, cols3) = floatStatsOf(List(Some(1.0d), Some(2.0d)), widen = true)
    assert(!ManifestSkipping.mayMatch(Seq(EqualTo(fAttr, litD(5.0d))), rc3, cols3))
    assert(!ManifestSkipping.mayMatch(Seq(LessThan(fAttr, litD(0.0d))), rc3, cols3))
  }

  test("monotonicity: losing envelope information never turns a keep into a skip — 400 cases") {
    val params = Gen.Parameters.default
    var flips = 0
    (1 to 400).foreach { i =>
      val seed = Seed(9000L + i)
      val rows = Gen.resize(12, Gen.listOf(rowGen)).apply(params, seed).get
      val (rc, cols) = statsOf(rows)
      val (rc2, cols2) = degrade(rc, cols, params, seed.next)
      val filters = Gen.resize(3, Gen.nonEmptyListOf(exprGen(rows)))
        .apply(params, seed.next.next).get.take(3)
      val full = ManifestSkipping.mayMatch(filters, rc, cols)
      val degraded = ManifestSkipping.mayMatch(filters, rc2, cols2)
      if (full && !degraded) {
        flips += 1
        assert(false,
          s"case $i: degradation turned keep into SKIP — filters=$filters " +
            s"full=($rc, $cols) degraded=($rc2, $cols2)")
      }
    }
    assert(flips == 0)
  }
}
