package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property fuzz for the P10 normalization surface: the q13 oracle
  * pins fixed shapes; these properties pin the CONTRACTS —
  * [[Normalize.rowFingerprint]] must be collision-free under framing
  * attacks (values containing the separator, the null marker, or the
  * escape char must never alias a different row), secureFilename's
  * output must always be a safe name, and the ClickHouse clamp must
  * match its scalar model on generated timestamps.
  */
class NormalizePropSpec extends SparkSpec {
  import spark.implicits._

  private val hostile: Gen[String] = Gen.frequency(
    4 -> Gen.listOf(Gen.frequency(
      5 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('\u0000', '\u0001', '\\'),
      1 -> Gen.oneOf('/', ' ', '.', '_', '-', '\'', '"', ';', '新', '☂'),
    )).map(_.mkString),
    1 -> Gen.const(null),
    1 -> Gen.const(""),
  )

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("rowFingerprint: 400 generated hostile rows — distinct rows never collide, equal rows always do") {
    val rows = (1 to 400).map(i =>
      (sample(hostile, 100L + i), sample(hostile, 5000L + i), sample(hostile, 9000L + i)))
    val df = rows.toDF("a", "b", "c")
      .withColumn("fp", Normalize.rowFingerprint(Seq(col("a"), col("b"), col("c"))))
    val collected = df.as[(String, String, String, String)].collect()
    // same row content ⇒ same fp (determinism), different content ⇒ different fp
    val byRow = collected.groupBy(t => (t._1, t._2, t._3)).view.mapValues(_.map(_._4).distinct)
    assert(byRow.values.forall(_.size == 1), "same row produced different fingerprints")
    val byFp = collected.groupBy(_._4).view.mapValues(_.map(t => (t._1, t._2, t._3)).distinct)
    val collisions = byFp.filter(_._2.size > 1)
    assert(collisions.isEmpty, s"fingerprint collision: $collisions")
  }

  test("rowFingerprint: framing attacks cannot alias rows") {
    // every pair differs only in where the framing-sensitive char sits
    val attacks = Seq(
      (("a\u0001b", "c"), ("a", "b\u0001c")), // separator migration
      ((null: String, "x"), ("\u0000", "x")),  // NULL vs literal null-marker
      (("a\\", "b"), ("a", "\\b")),           // escape-char migration
      (("a\u0001", "b"), ("a\\1", "b")),      // escaped sep vs literal backslash-1
      (("", "ab"), ("ab", "")),               // empty-field migration
    )
    attacks.foreach { case ((a1, b1), (a2, b2)) =>
      val fps = Seq((a1, b1), (a2, b2)).toDF("a", "b")
        .select(Normalize.rowFingerprint(Seq(col("a"), col("b"))).as("fp"))
        .as[String].collect()
      assert(fps(0) != fps(1), s"alias: ($a1,$b1) vs ($a2,$b2)")
    }
  }

  test("secureFilename: output is always a safe name") {
    val safe = "^[A-Za-z0-9\\u4e00-\\u9fff._-]*$".r
    val outs = (1 to 200).map(i => sample(hostile, 300L + i)).filter(_ != null)
      .toDF("s").select(Normalize.secureFilename(col("s")).as("o")).as[String].collect()
    outs.foreach { o =>
      assert(safe.findFirstIn(o).isDefined, s"unsafe chars in '$o'")
      assert(!o.contains("__"), s"uncollapsed underscores in '$o'")
      assert(!o.startsWith(".") && !o.startsWith("_") &&
        !o.endsWith(".") && !o.endsWith("_"), s"untrimmed edge in '$o'")
      assert(!o.contains("/") && !o.contains("\\"), s"path separator in '$o'")
    }
  }

  test("clampClickHouseDateTime matches its scalar model on generated instants") {
    val lo = java.sql.Timestamp.valueOf("1971-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("2106-01-01 00:00:00")
    val gen = Gen.frequency(
      5 -> Gen.chooseNum(-5000000000000L, 5000000000000L), // wide span around the window
      1 -> Gen.const(lo.getTime), 1 -> Gen.const(hi.getTime),
      1 -> Gen.const(lo.getTime - 1), 1 -> Gen.const(hi.getTime + 1),
    ).map(new java.sql.Timestamp(_))
    val ts = (1 to 100).map(i => Tuple1(sample(gen, 800L + i))) :+ Tuple1(null.asInstanceOf[java.sql.Timestamp])
    val got = ts.toDF("t").select(Normalize.clampClickHouseDateTime(col("t")).as("c"))
      .as[Option[java.sql.Timestamp]].collect()
    val want = ts.map(_._1).map {
      case null => None
      case t if t.before(lo) || t.after(hi) => Some(lo)
      case t => Some(t)
    }
    assert(got.toSeq == want)
  }
}
