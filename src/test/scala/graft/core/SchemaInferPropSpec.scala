package graft.core

import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz for the §1.2 inference matrix: the goldens pin the
  * reference's known shapes; these properties pin the INVARIANTS that
  * make auto-created target tables safe for arbitrary samples —
  * soundness (the unified column type accepts every sampled value),
  * row-order insensitivity of per-column types, and width-ladder
  * correctness (the emitted SQL type brackets the sampled extremes).
  */
class SchemaInferPropSpec extends AnyFunSuite {

  private val scalar: Gen[Any] = Gen.frequency(
    3 -> Gen.alphaNumStr.map(_.take(20)),
    2 -> Gen.const(null),
    2 -> Gen.chooseNum(Long.MinValue, Long.MaxValue).map(Long.box),
    2 -> Gen.chooseNum(-1e12, 1e12).map(Double.box),
    1 -> Gen.oneOf(true, false).map(Boolean.box),
    1 -> Gen.chooseNum(0L, 4102444800000L).map(new java.sql.Timestamp(_)),
    1 -> Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray),
    1 -> Gen.chooseNum(-1e6, 1e6).map(d => BigDecimal(math.rint(d * 100) / 100)),
  )

  private val value: Gen[Any] = Gen.frequency(
    8 -> scalar,
    1 -> Gen.listOfN(3, scalar).map(_.toSeq),
    1 -> Gen.mapOfN(2, Gen.zip(Gen.alphaNumStr.map("k" + _.take(4)), scalar)),
  )

  private val sampleRows: Gen[Seq[Map[String, Any]]] = for {
    nCols <- Gen.chooseNum(1, 6)
    cols = (1 to nCols).map(i => s"c$i")
    nRows <- Gen.chooseNum(1, 15)
    rows <- Gen.listOfN(nRows, Gen.sequence[Seq[(String, Any)], (String, Any)](
      cols.map(c => value.map(v => c -> v))))
  } yield rows.map(_.toMap)

  private def gen[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** Soundness: can `v` live in a column typed `t` without data loss
    * beyond the documented coercions (numerics widen to double/decimal;
    * anything can fall back to text)?
    */
  private def fits(v: Any, t: DataType): Boolean = (v, t) match {
    case (null, _) => true // all columns nullable
    case (_, StringType) => true // text fallback accepts everything
    case (_, DoubleType) =>
      // decimal→double is the documented coercion when a sample mixes
      // exact and float numerics (reference parity: Python floats)
      SchemaInfer.typeOf(v) match {
        case LongType | DoubleType | _: DecimalType => true
        case _ => false
      }
    case (_, _: DecimalType) => SchemaInfer.typeOf(v) match {
      case LongType | _: DecimalType => true
      case _ => false
    }
    case (_, at: ArrayType) => v match {
      case s: Seq[_] => s.forall(fits(_, at.elementType))
      case _ => false
    }
    case (_, mt: MapType) => v match {
      case m: Map[_, _] => m.values.forall(fits(_, mt.valueType))
      case _ => false
    }
    case _ => SchemaInfer.typeOf(v) == t
  }

  test("200 generated samples: inferred schema is sound for every sampled value") {
    (1 to 200).foreach { k =>
      val rows = gen(sampleRows, 6100L + k)
      val schema = SchemaInfer.infer(rows)
      assert(schema.fields.forall(_.nullable), s"seed ${6100L + k}: non-nullable field")
      schema.fields.foreach { f =>
        rows.flatMap(_.get(f.name)).foreach { v =>
          assert(fits(v, f.dataType),
            s"seed ${6100L + k}: value $v (${SchemaInfer.typeOf(v)}) does not fit ${f.name}: ${f.dataType}")
        }
      }
    }
  }

  test("row order never changes a column's inferred type") {
    (1 to 50).foreach { k =>
      val rows = gen(sampleRows, 7300L + k)
      val a = SchemaInfer.infer(rows).fields.map(f => f.name -> f.dataType).toMap
      val b = SchemaInfer.infer(rows.reverse).fields.map(f => f.name -> f.dataType).toMap
      assert(a == b, s"seed ${7300L + k}")
    }
  }

  test("int width ladder brackets the value and is monotonic") {
    val cuts = Seq(0L, 1L, 127L, 128L, 32767L, 32768L, 2147483647L, 2147483648L, Long.MaxValue)
    val order = Seq("tinyint", "smallint", "int", "bigint")
    cuts.foreach { v =>
      val t = SchemaInfer.mysqlIntType(v)
      val expected =
        if (v < 128L) "tinyint" else if (v < 32768L) "smallint"
        else if (v < 2147483648L) "int" else "bigint"
      assert(t == expected, s"$v -> $t")
    }
    // monotonic: a wider maxAbs never yields a narrower type
    val ladder = (0 until 63).map(i => SchemaInfer.mysqlIntType(1L << i)).map(order.indexOf)
    assert(ladder == ladder.sorted, s"ladder not monotonic: $ladder")
  }

  test("string width ladder always fits the sampled max length") {
    Seq(0, 1, 10, 255, 256, 65535, 65536, 16777215, 16777216).foreach { len =>
      val t = SchemaInfer.mysqlStrType(len, isPk = false)
      val cap: Long = t match {
        case s if s.startsWith("varchar(") =>
          s.stripPrefix("varchar(").stripSuffix(")").toLong
        case "text" => 65535L
        case "mediumtext" => 16777215L
        case "longtext" => 4294967295L
      }
      assert(cap >= len, s"len=$len got $t (cap $cap)")
    }
  }
}
