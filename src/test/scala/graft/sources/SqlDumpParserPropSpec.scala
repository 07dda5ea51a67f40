package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz for the `.sql` dump sink↔scan pair (round-10 verdict
  * task 5): the golden fixtures pin known shapes; this spec generates
  * hundreds of hostile INSERT statements — escapes × NULL × hex blobs ×
  * multi-row VALUES × emoji × nested parens × control chars — renders
  * them with [[SqlDumpParser.renderInsert]] and requires
  * [[SqlDumpParser.parseInsert]] to recover table, columns, row count
  * and every value exactly (modulo the parser's documented
  * stringly-typed surface: numbers/blobs/bits come back as their
  * literal text, NULL as null). Deterministic seeds so any failure
  * reproduces.
  */
class SqlDumpParserPropSpec extends AnyFunSuite {

  // ---- generators ------------------------------------------------

  /** Characters chosen to hit every escape branch and every state
    * transition in the tuple parser: quote doubling vs backslash
    * escapes, NUL/ctrl-Z, separators that only matter outside quotes,
    * raw unicode incl. an astral (surrogate-pair) code point.
    */
  private val hostileChar: Gen[Char] = Gen.frequency(
    5 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('\'', '\\', '"', '`'),
    2 -> Gen.oneOf('(', ')', ',', ';'),
    2 -> Gen.oneOf('\n', '\r', '\t', ' ', '\u0000', '\u001A', '\b'),
    1 -> Gen.oneOf('新', '闻', 'é', 'ß', '☂'),
    1 -> Gen.choose(' ', '~'),
  )

  private val hostileString: Gen[String] = Gen.frequency(
    6 -> Gen.listOf(hostileChar).map(_.mkString),
    1 -> Gen.const("emoji 😀🚀"), // astral pairs
    1 -> Gen.const("NULL"),       // the literal word, quoted ≠ SQL NULL
    1 -> Gen.const("(nested, (deep)), 'quoted'"),
    1 -> Gen.const("0x41FF"),     // hex-looking TEXT must stay a string
    1 -> Gen.const(""),
  )

  private val value: Gen[Any] = Gen.frequency(
    4 -> hostileString,
    1 -> Gen.const(null),
    1 -> Gen.chooseNum(Long.MinValue, Long.MaxValue).map(Long.box),
    1 -> Gen.chooseNum(-1e12, 1e12).map(Double.box),
    1 -> Gen.oneOf(true, false).map(Boolean.box),
    1 -> Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray),
    1 -> Gen.chooseNum(0L, 4102444800000L).map(new java.sql.Timestamp(_)),
  )

  /** What the stringly-typed scan surface must return for a rendered
    * value — the documented contract, not an approximation.
    */
  private def expectedParsed(v: Any): String = v match {
    case null => null
    case b: Array[Byte] => "0x" + b.map(x => f"$x%02X").mkString
    case t: java.sql.Timestamp => t.toString.stripSuffix(".0")
    case b: java.lang.Boolean => if (b) "1" else "0"
    case n: java.lang.Number => n.toString
    case s => s.toString
  }

  private val statement: Gen[(String, Seq[String], Seq[Seq[Any]], String)] = for {
    table <- Gen.oneOf("t1", "my_table", "UserEvents")
    nCols <- Gen.chooseNum(1, 8)
    cols = (1 to nCols).map(i => s"c$i")
    nRows <- Gen.chooseNum(1, 10)
    rows <- Gen.listOfN(nRows, Gen.listOfN(nCols, value))
    mode <- Gen.oneOf("INSERT", "INSERT IGNORE", "REPLACE")
  } yield (table, cols, rows.map(_.toSeq), mode)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // ---- properties ------------------------------------------------

  test("250 generated hostile statements round-trip render→parse exactly") {
    var checked = 0
    (1 to 250).foreach { k =>
      val (table, cols, rows, mode) = sample(statement, 7700L + k)
      val sql = SqlDumpParser.renderInsert(table, cols, rows, mode)
      val parsed = SqlDumpParser.parseInsert(sql)
        .getOrElse(fail(s"seed ${7700L + k}: statement did not parse: $sql"))
      assert(parsed.table == table, s"seed ${7700L + k}")
      assert(parsed.columns.contains(cols), s"seed ${7700L + k}")
      assert(parsed.rows.size == rows.size,
        s"seed ${7700L + k}: row count ${parsed.rows.size} != ${rows.size} for $sql")
      parsed.rows.zip(rows).zipWithIndex.foreach { case ((got, want), r) =>
        assert(got == want.map(expectedParsed),
          s"seed ${7700L + k} row $r diverged\n  sql: $sql\n  got: $got\n  want: ${want.map(expectedParsed)}")
      }
      checked += 1
    }
    assert(checked == 250)
  }

  test("ON DUPLICATE KEY UPDATE suffix does not perturb the parsed rows") {
    (1 to 25).foreach { k =>
      val (table, cols, rows, _) = sample(statement, 9900L + k)
      val sql = SqlDumpParser.renderInsert(table, cols, rows, "INSERT",
        onDupUpdate = Some(cols.map(c => s"`$c`=VALUES(`$c`)").mkString(", ")))
      val parsed = SqlDumpParser.parseInsert(sql).getOrElse(fail(s"no parse: $sql"))
      assert(parsed.rows.map(_.size).forall(_ == cols.size))
      assert(parsed.rows.size == rows.size)
      assert(parsed.rows == rows.map(_.map(expectedParsed)))
    }
  }

  test("mixed-statement dump text: inserts recovered row-exact amid non-insert noise") {
    val (table, cols, rows, _) = sample(statement, 4242L)
    val sql = SqlDumpParser.renderInsert(table, cols, rows)
    val noise = Seq(
      "-- MySQL dump 10.13",
      "SET NAMES utf8mb4;",
      "LOCK TABLES `t1` WRITE;",
      "DROP TABLE IF EXISTS `t1`;",
      "UNLOCK TABLES;")
    assert(noise.forall(SqlDumpParser.parseInsert(_).isEmpty))
    assert(SqlDumpParser.parseInsert(sql).map(_.rows.size).contains(rows.size))
  }
}
