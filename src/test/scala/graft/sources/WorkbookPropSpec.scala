package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz for the two hand-built workbook formats — XLSX
  * (zip + XML + shared strings) and XLS (CFB container + BIFF8 records
  * + SST/CONTINUE fragmentation). Generates hostile tables and
  * round-trips `workbookBytes`/`xlsBytes` → `parseWorkbook`, requiring
  * every cell back exactly under each format's DOCUMENTED typing:
  * numbers as their text rendering, booleans as true/false, nulls as
  * absent cells (trailing nulls trim; an all-null BIFF row has no
  * record to carry it). Long multi-KB strings force the SST across
  * CONTINUE record boundaries — the hardest path in the BIFF reader.
  * Deterministic seeds so failures reproduce.
  */
class WorkbookPropSpec extends AnyFunSuite {

  private val hostileChar: Gen[Char] = Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('<', '>', '&', '"', '\''),
    2 -> Gen.oneOf('\t', '\n', '\r', ' '),
    1 -> Gen.oneOf('\u0001', '\u001A'), // control chars: xlsx scrubs, xls keeps
    1 -> Gen.oneOf('新', 'é', 'ß', '☂'),
  )

  private val hostileString: Gen[String] = Gen.frequency(
    6 -> Gen.listOf(hostileChar).map(_.mkString),
    1 -> Gen.const("emoji 😀🚀"),
    1 -> Gen.const("  leading and trailing  "),
    1 -> Gen.const(""),
    // multi-KB strings push the XLS shared-string table across
    // SST→CONTINUE fragment boundaries (records cap at 8224 bytes)
    1 -> Gen.listOfN(3000, Gen.alphaNumChar).map(_.mkString),
    1 -> Gen.listOfN(1500, Gen.oneOf('新', 'ß', 'a')).map(_.mkString), // wide chars
  )

  private val cell: Gen[Any] = Gen.frequency(
    4 -> hostileString,
    1 -> Gen.const(null),
    1 -> Gen.chooseNum(Long.MinValue, Long.MaxValue).map(Long.box),
    1 -> Gen.chooseNum(-1e9, 1e9).map(Double.box),
    1 -> Gen.oneOf(true, false).map(Boolean.box),
  )

  private val table: Gen[(Seq[String], Seq[Seq[Any]])] = for {
    nCols <- Gen.chooseNum(1, 6)
    header = (1 to nCols).map(i => s"c$i")
    nRows <- Gen.chooseNum(0, 30)
    rows <- Gen.listOfN(nRows, Gen.listOfN(nCols, cell))
  } yield (header, rows.map(_.toSeq))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // the XLS number path writes every number as an IEEE double and
  // renders integral doubles without the trailing .0 — the parser's
  // renderNum contract, mirrored here
  private def numText(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def xlsxExpected(v: Any): String = v match {
    case null => null
    case b: java.lang.Boolean => if (b) "true" else "false"
    case n: java.lang.Number => n.toString
    case s => s.toString.map(c =>
      if (c < ' ' && c != '\t' && c != '\n' && c != '\r') ' ' else c) // illegal-XML scrub
  }

  private def xlsExpected(v: Any): String = v match {
    case null => null
    case b: java.lang.Boolean => if (b) "true" else "false"
    case n: java.lang.Number => numText(n.doubleValue()) // BIFF numbers are doubles
    case s => s.toString
  }

  private def trimTrailingNulls(row: Seq[String]): Seq[String] =
    row.reverse.dropWhile(_ == null).reverse

  test("XLSX: 120 generated hostile tables round-trip write→parse exactly (multi-sheet rollover)") {
    (1 to 120).foreach { k =>
      val (header, rows) = sample(table, 3300L + k)
      val bytes = XlsxSource.workbookBytes(header, rows.iterator, rolloverRows = 7)
      val (gotHeader, gotRows) = XlsxSource.parseWorkbook(bytes)
      assert(gotHeader == header, s"seed ${3300L + k}")
      val want = rows.map(r => trimTrailingNulls(r.map(xlsxExpected)))
      assert(gotRows.size == want.size, s"seed ${3300L + k}: ${gotRows.size} != ${want.size}")
      gotRows.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        assert(g == w, s"seed ${3300L + k} row $i:\n  got:  $g\n  want: $w")
      }
    }
  }

  test("XLS: 120 generated hostile tables round-trip write→parse exactly (SST CONTINUE stress)") {
    (1 to 120).foreach { k =>
      val (header, rows) = sample(table, 5500L + k)
      val bytes = XlsSource.xlsBytes(header, rows.iterator, rolloverRows = 7)
      val (gotHeader, gotRows) = XlsSource.parseWorkbook(bytes)
      assert(gotHeader == header, s"seed ${5500L + k}")
      // a BIFF row with no cell records does not exist in the stream —
      // all-null rows drop out (documented format quirk)
      val want = rows.map(r => trimTrailingNulls(r.map(xlsExpected)))
        .filter(_.nonEmpty)
      assert(gotRows.size == want.size, s"seed ${5500L + k}: ${gotRows.size} != ${want.size}")
      gotRows.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        assert(g == w, s"seed ${5500L + k} row $i:\n  got:  $g\n  want: $w")
      }
    }
  }

  test("carriage return in a cell survives the XLSX round-trip byte-identical") {
    val rows = Seq(Seq[Any]("a\rb", "x\r\ny", "\r"))
    val (_, got) = XlsxSource.parseWorkbook(
      XlsxSource.workbookBytes(Seq("c1", "c2", "c3"), rows.iterator, 100))
    assert(got == Seq(Seq("a\rb", "x\r\ny", "\r")))
  }
}
