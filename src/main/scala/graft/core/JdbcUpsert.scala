package graft.core

import graft.sources.SqlDumpParser

/** Dialect-aware upsert statement generation (S2/S29/P11: the
  * reference's `INSERT IGNORE` / `REPLACE` / `ON DUPLICATE KEY UPDATE`
  * write modes, plus the PostgreSQL `ON CONFLICT` equivalents).
  *
  * Spark's JDBC writer only appends/overwrites; keyed idempotent writes
  * need dialect SQL executed per batch (`foreachPartition` +
  * `PreparedStatement` on a real database). This object is that SQL —
  * value rendering and escaping shared with the dump sink
  * ([[SqlDumpParser.renderValue]]).
  */
object JdbcUpsert {

  sealed trait Dialect
  case object MySql extends Dialect
  case object Postgres extends Dialect

  /** Ignore-on-conflict insert for a batch of rows. */
  def insertIgnoreSql(dialect: Dialect, table: String, cols: Seq[String],
                      rows: Seq[Seq[Any]], pks: Seq[String]): String = dialect match {
    case MySql =>
      SqlDumpParser.renderInsert(table, cols, rows, "INSERT IGNORE")
    case Postgres =>
      val base = SqlDumpParser.renderInsert(table, cols, rows, "INSERT").stripSuffix(";")
      s"""$base ON CONFLICT (${pks.map(quote).mkString(", ")}) DO NOTHING;"""
  }

  /** Replace-on-conflict (new row wins). */
  def upsertSql(dialect: Dialect, table: String, cols: Seq[String],
                rows: Seq[Seq[Any]], pks: Seq[String]): String = dialect match {
    case MySql =>
      val updates = cols.filterNot(pks.contains)
        .map(c => s"${quote(c)} = VALUES(${quote(c)})").mkString(", ")
      SqlDumpParser.renderInsert(table, cols, rows, "INSERT", Some(updates))
    case Postgres =>
      val base = SqlDumpParser.renderInsert(table, cols, rows, "INSERT").stripSuffix(";")
      val updates = cols.filterNot(pks.contains)
        .map(c => s"${quote(c)} = EXCLUDED.${quote(c)}").mkString(", ")
      s"""$base ON CONFLICT (${pks.map(quote).mkString(", ")}) DO UPDATE SET $updates;"""
  }

  /** Arbitrary conflict-update expressions (P11: e.g.
    * `x = GREATEST(VALUES(x), x)`).
    */
  def upsertWithExprSql(table: String, cols: Seq[String], rows: Seq[Seq[Any]],
                        updateExpr: String): String =
    SqlDumpParser.renderInsert(table, cols, rows, "INSERT", Some(updateExpr))

  private def quote(c: String): String = s"`$c`"
}
