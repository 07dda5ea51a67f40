package graft.core

import graft.sources.SqlDumpParser

/** Dialect-aware upsert statement generation (S2/S29/P11: the
  * reference's `INSERT IGNORE` / `REPLACE` / `ON DUPLICATE KEY UPDATE`
  * write modes — `d22d/utils/db/__init__.py:700-711`,
  * `d22d/model/mysqlmodel.py:285-302` — plus the PostgreSQL
  * `ON CONFLICT` equivalents and an ANSI `MERGE` form for databases
  * with neither, e.g. Derby/DB2).
  *
  * Two families:
  *   - [[insertIgnoreSql]]/[[upsertSql]] render full literal statements
  *     (the dump-sink path and human-readable goldens);
  *   - [[prepared]] renders a one-row parameterized statement with `?`
  *     placeholders plus the bind order — the execution path used by
  *     `JdbcConnector.write` via `foreachPartition` +
  *     `PreparedStatement.addBatch` (value conversion never touches SQL
  *     text, so injection/escaping is the driver's problem, not ours).
  *
  * Identifier quoting and string escaping are dialect-aware: MySQL
  * backtick-quotes identifiers and backslash-escapes strings; PostgreSQL
  * (and ANSI) double-quote identifiers and double embedded single quotes
  * (`standard_conforming_strings`: backslash is literal).
  */
object JdbcUpsert {

  sealed trait Dialect
  case object MySql extends Dialect
  case object Postgres extends Dialect
  /** ANSI `MERGE INTO` dialect (Derby, DB2; close to SQL:2003). */
  case object Ansi extends Dialect

  def quote(dialect: Dialect, c: String): String = dialect match {
    case MySql => s"`$c`"
    case _     => "\"" + c.replace("\"", "\"\"") + "\""
  }

  /** PostgreSQL string-literal escaping: double single quotes; NUL is
    * not representable in PG text values at all, so it is dropped.
    */
  def pgEscapeString(v: String): String =
    v.replace("\u0000", "").replace("'", "''")

  /** Render one value as a literal in the given dialect. MySQL rendering
    * is shared with the dump sink ([[SqlDumpParser.renderValue]]).
    */
  def renderValue(dialect: Dialect, v: Any): String = dialect match {
    case MySql => SqlDumpParser.renderValue(v)
    case _ => v match {
      case null               => "NULL"
      case b: Array[Byte]     => "'\\x" + b.map(x => f"$x%02X").mkString + "'" // PG bytea hex
      case n: java.lang.Number => n.toString
      case b: java.lang.Boolean => if (b) "TRUE" else "FALSE"
      case t: java.sql.Timestamp => "'" + t.toString.stripSuffix(".0") + "'"
      case d: java.sql.Date   => "'" + d.toString + "'"
      case s                  => "'" + pgEscapeString(s.toString) + "'"
    }
  }

  private def renderRows(dialect: Dialect, rows: Seq[Seq[Any]]): String =
    rows.map(_.map(renderValue(dialect, _)).mkString("(", ", ", ")")).mkString(", ")

  /** Ignore-on-conflict insert for a batch of rows (existing rows win). */
  def insertIgnoreSql(dialect: Dialect, table: String, cols: Seq[String],
                      rows: Seq[Seq[Any]], pks: Seq[String]): String = dialect match {
    case MySql =>
      SqlDumpParser.renderInsert(table, cols, rows, "INSERT IGNORE")
    case d =>
      val q = quote(d, _: String)
      s"INSERT INTO ${q(table)} (${cols.map(q).mkString(", ")}) VALUES " +
        renderRows(d, rows) +
        s" ON CONFLICT (${pks.map(q).mkString(", ")}) DO NOTHING;"
  }

  /** Replace-on-conflict (new row wins). */
  def upsertSql(dialect: Dialect, table: String, cols: Seq[String],
                rows: Seq[Seq[Any]], pks: Seq[String]): String = dialect match {
    case MySql =>
      val updates = cols.filterNot(pks.contains)
        .map(c => s"`$c` = VALUES(`$c`)").mkString(", ")
      SqlDumpParser.renderInsert(table, cols, rows, "INSERT", Some(updates))
    case d =>
      val q = quote(d, _: String)
      val updates = cols.filterNot(pks.contains)
        .map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")
      s"INSERT INTO ${q(table)} (${cols.map(q).mkString(", ")}) VALUES " +
        renderRows(d, rows) +
        s" ON CONFLICT (${pks.map(q).mkString(", ")}) DO UPDATE SET $updates;"
  }

  /** Arbitrary conflict-update expressions (P11: e.g.
    * `x = GREATEST(VALUES(x), x)`). MySQL-only surface in the reference.
    */
  def upsertWithExprSql(table: String, cols: Seq[String], rows: Seq[Seq[Any]],
                        updateExpr: String): String =
    SqlDumpParser.renderInsert(table, cols, rows, "INSERT", Some(updateExpr))

  // ---- execution path: one-row parameterized statements ----

  /** A parameterized statement: `sql` with `?` placeholders and, for each
    * placeholder in order, the index into the row's column list to bind.
    */
  final case class Prepared(sql: String, bind: Seq[Int])

  /** One-row upsert statement for `PreparedStatement` batching.
    * `newWins = false` → INSERT IGNORE semantics (existing rows win);
    * `newWins = true`  → REPLACE / ON DUPLICATE KEY UPDATE (new rows win).
    *
    * Partition re-execution under Spark task retry is safe by
    * construction: re-applying either statement is idempotent
    * (SURVEY.md §7.4 risk 4).
    */
  def prepared(dialect: Dialect, table: String, cols: Seq[String],
               pks: Seq[String], newWins: Boolean): Prepared = {
    require(pks.nonEmpty, "upsert needs pk columns")
    require(pks.forall(cols.contains), s"pks ${pks.filterNot(cols.contains)} not in columns")
    val q = quote(dialect, _: String)
    val colIdx = cols.zipWithIndex.toMap
    val nonPk = cols.filterNot(pks.contains)
    val colList = cols.map(q).mkString(", ")
    val placeholders = cols.map(_ => "?").mkString(", ")
    dialect match {
      case MySql if !newWins =>
        Prepared(s"INSERT IGNORE INTO ${q(table)} ($colList) VALUES ($placeholders)",
          cols.indices)
      case MySql =>
        // All-pk rows have nothing to update: ignore is the same semantic.
        if (nonPk.isEmpty) prepared(dialect, table, cols, pks, newWins = false)
        else {
          val updates = nonPk.map(c => s"${q(c)} = VALUES(${q(c)})").mkString(", ")
          Prepared(s"INSERT INTO ${q(table)} ($colList) VALUES ($placeholders)" +
            s" ON DUPLICATE KEY UPDATE $updates", cols.indices)
        }
      case Postgres =>
        val conflict =
          if (!newWins || nonPk.isEmpty) "DO NOTHING"
          else "DO UPDATE SET " + nonPk.map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")
        Prepared(s"INSERT INTO ${q(table)} ($colList) VALUES ($placeholders)" +
          s" ON CONFLICT (${pks.map(q).mkString(", ")}) $conflict", cols.indices)
      case Ansi =>
        // SQL:2003 MERGE against the one-row dummy table (Derby/DB2's
        // SYSIBM.SYSDUMMY1): match on pk params, update non-pks when
        // matched (replace mode only), insert the full row otherwise.
        val t = q(table)
        val on = pks.map(c => s"$t.${q(c)} = ?").mkString(" AND ")
        val whenMatched =
          if (newWins && nonPk.nonEmpty)
            " WHEN MATCHED THEN UPDATE SET " + nonPk.map(c => s"${q(c)} = ?").mkString(", ")
          else ""
        val sql = s"MERGE INTO $t USING SYSIBM.SYSDUMMY1 ON $on" + whenMatched +
          s" WHEN NOT MATCHED THEN INSERT ($colList) VALUES ($placeholders)"
        val bind = pks.map(colIdx) ++
          (if (newWins && nonPk.nonEmpty) nonPk.map(colIdx) else Nil) ++
          cols.indices
        Prepared(sql, bind)
    }
  }

  /** Pick a dialect from a JDBC URL; ANSI MERGE is the fallback. */
  def dialectFor(url: String): Dialect =
    if (url.startsWith("jdbc:mysql")) MySql
    else if (url.startsWith("jdbc:postgresql")) Postgres
    else Ansi
}
