package graft.core

import graft.SparkSpec
import scala.util.Random

/** Executes the MySQL upsert dialect for real — as real as this offline
  * sandbox allows (no MySQL server, no H2 jar in the cache; see
  * [[MySqlMiniExec]]'s doc for why that path is closed). The generated
  * MySQL SQL text is run through an independent interpreter of MySQL's
  * documented duplicate-key algorithm, and its end state is
  * cross-checked against the genuinely executed Derby MERGE path
  * (`JdbcConnector.write` over real JDBC) on identical input streams:
  * if the generator's quoting, clause order, bind order, or semantics
  * were wrong for MySQL, the two databases would disagree.
  */
class MySqlDialectExecSpec extends SparkSpec {
  import spark.implicits._
  import JdbcUpsert.MySql

  private val cols = Seq("id", "v", "score")
  private val pks = Seq("id")

  /** Run a batch through the generated parameterized MySQL statement
    * (one execution per row, params permuted by `Prepared.bind` exactly
    * as `JdbcExec` binds a PreparedStatement).
    */
  private def applyMySql(t: MySqlMiniExec.Table, rows: Seq[Seq[Any]], newWins: Boolean): Unit = {
    val p = JdbcUpsert.prepared(MySql, "t", cols, pks, newWins)
    rows.foreach(r => MySqlMiniExec.execute(t, p.sql, p.bind.map(r)))
  }

  test("MySQL INSERT IGNORE / ON DUPLICATE KEY UPDATE execute with the documented semantics") {
    val t = new MySqlMiniExec.Table(cols, pks)
    applyMySql(t, Seq(Seq(1, "old", 10), Seq(2, "keep", 20)), newWins = true)
    // ignore: existing rows win
    applyMySql(t, Seq(Seq(1, "new", 99), Seq(3, "add", 30)), newWins = false)
    assert(t.snapshot.sortBy(_.head.toString) ==
      Seq(Seq(1, "old", 10), Seq(2, "keep", 20), Seq(3, "add", 30)))
    // replace: new rows win
    applyMySql(t, Seq(Seq(1, "replaced", 11), Seq(4, "more", 40)), newWins = true)
    assert(t.snapshot.sortBy(_.head.toString) ==
      Seq(Seq(1, "replaced", 11), Seq(2, "keep", 20), Seq(3, "add", 30), Seq(4, "more", 40)))
  }

  test("ON DUPLICATE KEY UPDATE with GREATEST(VALUES(x), x) keeps the high-water mark") {
    // the P11 arbitrary-expression surface (d22d/model/mysqlmodel.py:285-302):
    // seen-count accumulates, score keeps its maximum across conflicting writes
    val t = new MySqlMiniExec.Table(Seq("id", "seen", "score"), Seq("id"))
    def upsert(rows: Seq[Seq[Any]]): Unit = {
      val sql = JdbcUpsert.upsertWithExprSql("t", Seq("id", "seen", "score"), rows,
        "`seen` = `seen` + VALUES(`seen`), `score` = GREATEST(VALUES(`score`), `score`)")
      MySqlMiniExec.execute(t, sql)
    }
    upsert(Seq(Seq(1, 1, 50), Seq(2, 1, 80)))
    upsert(Seq(Seq(1, 1, 70), Seq(2, 1, 60), Seq(3, 1, 10)))
    upsert(Seq(Seq(1, 1, 65)))
    assert(t.snapshot.sortBy(_.head.toString).map(_.map(_.toString)) ==
      Seq(Seq("1", "3", "70"), Seq("2", "2", "80"), Seq("3", "1", "10")))
    // NULL semantics: GREATEST with a NULL argument is NULL (MySQL rule)
    upsert(Seq(Seq(3, 1, null)))
    assert(t.rows(Seq(3)).toSeq == Seq(3, BigDecimal(2), null))
  }

  test("literal-statement family: MySQL escaping round-trips through execution") {
    val t = new MySqlMiniExec.Table(Seq("id", "v"), Seq("id"))
    val nasty = "it's a \\ backslash\nand a newlinenul\u0000and\u001Asub"
    MySqlMiniExec.execute(t,
      JdbcUpsert.insertIgnoreSql(MySql, "t", Seq("id", "v"), Seq(Seq(1, nasty)), Seq("id")))
    assert(t.rows(Seq(BigDecimal(1))).toSeq == Seq(BigDecimal(1), nasty))
    // second ignore write must not clobber
    MySqlMiniExec.execute(t,
      JdbcUpsert.insertIgnoreSql(MySql, "t", Seq("id", "v"), Seq(Seq(1, "other")), Seq("id")))
    assert(t.rows(Seq(BigDecimal(1)))(1) == nasty)
    // upsertSql (new wins) rewrites through VALUES()
    MySqlMiniExec.execute(t,
      JdbcUpsert.upsertSql(MySql, "t", Seq("id", "v"), Seq(Seq(1, "winner")), Seq("id")))
    assert(t.rows(Seq(BigDecimal(1)))(1) == "winner")
  }

  test("cross-check: MySQL-dialect execution == executed Derby MERGE over random streams") {
    val url = s"jdbc:derby:${tmpDir("graft-derby-xcheck")}/db;create=true"
    JdbcExec.execute(url,
      "CREATE TABLE xc (id INT NOT NULL PRIMARY KEY, v VARCHAR(64), score INT)", Map.empty)
    val derby = JdbcConnector("derby", url)
    val mysql = new MySqlMiniExec.Table(cols, pks)

    val rnd = new Random(20260813)
    (1 to 12).foreach { _ =>
      val newWins = rnd.nextBoolean()
      // small key space forces frequent conflicts ACROSS batches;
      // within a batch keys are unique, because the production Spark
      // write applies a partitioned batch in no defined row order —
      // intra-batch last-writer-wins is not a semantic either engine
      // promises (the interpreter-only tests above cover multi-row
      // statements with intra-statement conflicts)
      val batch = rnd.shuffle((0 to 5).toList).take(rnd.nextInt(5) + 1).map { k =>
        Seq(k, if (rnd.nextInt(5) == 0) null else rnd.alphanumeric.take(4).mkString,
          rnd.nextInt(100))
      }
      // MySQL path: generated dialect SQL through the interpreter
      applyMySql(mysql, batch, newWins)
      // Derby path: the actual JDBC write used in production
      val df = batch.map { case Seq(id, v, s) =>
        (id.asInstanceOf[Int], Option(v).map(_.toString), s.asInstanceOf[Int])
      }.toDF("id", "v", "score")
      derby.write(df, "xc",
        if (newWins) WriteMode.Replace(pks) else WriteMode.InsertIgnore(pks))
    }

    val derbyState = derby.read(spark, "xc").collect()
      .map(r => (r.getInt(0), Option(r.getString(1)).getOrElse("∅"), r.getInt(2)))
      .toSeq.sorted
    val mysqlState = mysql.snapshot
      .map(r => (r.head.toString.toInt, Option(r(1)).map(_.toString).getOrElse("∅"),
        r(2).toString.toInt))
      .sorted
    assert(mysqlState == derbyState)
    assert(derbyState.nonEmpty)
  }
}
