package graft.core

import scala.collection.mutable

/** Test-scope executor for the MySQL upsert dialect.
  *
  * Why this exists: the sandbox has no MySQL server and no H2 jar in the
  * offline cache (H2's `MODE=MySQL` would execute `INSERT IGNORE` /
  * `ON DUPLICATE KEY UPDATE` for real — it simply isn't obtainable
  * here), so the MySQL branch of [[JdbcUpsert]] could only ever be
  * golden-tested as SQL *text*. This interpreter closes most of that
  * gap: it parses the exact SQL strings the generator emits (both the
  * `?`-parameterized execution form and the literal multi-row form) and
  * executes them against an in-memory keyed table following MySQL's
  * documented duplicate-key algorithm
  * (dev.mysql.com/doc/refman/8.0/en/insert-on-duplicate.html):
  *
  *   - a row whose primary key exists triggers IGNORE (no-op) or the
  *     update list, otherwise it inserts;
  *   - `VALUES(col)` inside the update list refers to the value the
  *     INSERT *would have* written; a bare column reference reads the
  *     current row;
  *   - assignments apply left-to-right and later assignments see the
  *     effect of earlier ones (MySQL's non-standard UPDATE visibility);
  *   - `GREATEST`/`LEAST` return NULL when any argument is NULL.
  *
  * The point is independence: this file shares no statement-building
  * code with [[JdbcUpsert]] — it consumes the generated SQL as text, so
  * a mis-rendered statement (wrong quoting, wrong clause order, wrong
  * bind order) fails here even though both sides live in this repo. The
  * spec then cross-checks the interpreter's end state against the
  * genuinely executed Derby MERGE path on identical input streams
  * ([[JdbcUpsertExecSpec]]), so MySQL-dialect semantics and real-JDBC
  * semantics are proven equivalent, not just both plausible.
  */
object MySqlMiniExec {

  /** A keyed table: insertion-ordered pk → row values (in `cols` order). */
  final class Table(val cols: Seq[String], val pks: Seq[String]) {
    require(pks.forall(cols.contains), "pk not in cols")
    private val colIdx = cols.zipWithIndex.toMap
    val rows: mutable.LinkedHashMap[Seq[Any], mutable.ArrayBuffer[Any]] =
      mutable.LinkedHashMap.empty
    def pkOf(row: Seq[Any]): Seq[Any] = pks.map(p => row(colIdx(p)))
    def snapshot: Seq[Seq[Any]] = rows.values.map(_.toSeq).toSeq
    def idx(c: String): Int = colIdx.getOrElse(c,
      throw new IllegalArgumentException(s"unknown column `$c` (have ${cols.mkString(",")})"))
  }

  // ---- lexer ----------------------------------------------------------

  private sealed trait Tok
  private final case class TIdent(s: String) extends Tok   // bare or `quoted`
  private final case class TNum(v: BigDecimal) extends Tok
  private final case class TStr(s: String) extends Tok
  private final case class TSym(c: Char) extends Tok       // ( ) , = + - ? ;
  private case object TNull extends Tok

  /** MySQL-rules tokenizer: backtick identifiers, single-quoted strings
    * with backslash escapes (the dialect's escaping — `standard_
    * conforming_strings` off), decimal numbers, and the few symbols the
    * upsert grammar uses. Keywords stay TIdent (matched case-insensitively).
    */
  private def lex(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0; val n = sql.length
    while (i < n) {
      val c = sql(i)
      if (c.isWhitespace) i += 1
      else if (c == '`') {
        val j = sql.indexOf('`', i + 1)
        require(j > 0, s"unterminated identifier at $i")
        out += TIdent(sql.substring(i + 1, j)); i = j + 1
      } else if (c == '\'') {
        val sb = new StringBuilder; i += 1
        var done = false
        while (!done) {
          require(i < n, "unterminated string")
          sql(i) match {
            case '\\' if i + 1 < n =>
              sb += (sql(i + 1) match {
                case 'n' => '\n'; case 'r' => '\r'; case 't' => '\t'
                case '0' => '\u0000'; case 'Z' => '\u001A'; case other => other
              }); i += 2
            case '\'' if i + 1 < n && sql(i + 1) == '\'' => sb += '\''; i += 2
            case '\'' => done = true; i += 1
            case ch => sb += ch; i += 1
          }
        }
        out += TStr(sb.toString)
      } else if (c.isDigit || (c == '-' && i + 1 < n && sql(i + 1).isDigit)) {
        val j0 = i; i += 1
        while (i < n && (sql(i).isDigit || sql(i) == '.' || sql(i) == 'e' ||
          sql(i) == 'E' || ((sql(i) == '-' || sql(i) == '+') && "eE".contains(sql(i - 1))))) i += 1
        out += TNum(BigDecimal(sql.substring(j0, i)))
      } else if (c.isLetter || c == '_') {
        val j0 = i
        while (i < n && (sql(i).isLetterOrDigit || sql(i) == '_')) i += 1
        val w = sql.substring(j0, i)
        out += (if (w.equalsIgnoreCase("NULL")) TNull else TIdent(w))
      } else if ("(),=+-?;".contains(c)) { out += TSym(c); i += 1 }
      else throw new IllegalArgumentException(s"unexpected char '$c' at $i in: $sql")
    }
    out.result()
  }

  // ---- parser ---------------------------------------------------------

  private sealed trait Expr
  private final case class Lit(v: Any) extends Expr
  private final case class ColRef(c: String) extends Expr
  private final case class ValuesRef(c: String) extends Expr
  private final case class Param(n: Int) extends Expr // nth `?` in the statement
  private final case class Fn(name: String, args: Seq[Expr]) extends Expr
  private final case class Add(l: Expr, r: Expr, plus: Boolean) extends Expr

  private final case class Stmt(
      ignore: Boolean, table: String, cols: Seq[String],
      rows: Seq[Seq[Expr]], updates: Seq[(String, Expr)])

  private final class P(toks: Vector[Tok], sql: String) {
    private var i = 0
    private var params = 0
    def fail(msg: String) = throw new IllegalArgumentException(s"$msg at token $i in: $sql")
    def peek: Option[Tok] = if (i < toks.length) Some(toks(i)) else None
    def next(): Tok = { val t = toks(i); i += 1; t }
    def ident(): String = next() match { case TIdent(s) => s; case t => fail(s"expected identifier, got $t") }
    def kw(w: String): Unit = next() match {
      case TIdent(s) if s.equalsIgnoreCase(w) => ()
      case t => fail(s"expected $w, got $t")
    }
    def tryKw(w: String): Boolean = peek match {
      case Some(TIdent(s)) if s.equalsIgnoreCase(w) => i += 1; true
      case _ => false
    }
    def sym(c: Char): Unit = next() match {
      case TSym(`c`) => (); case t => fail(s"expected '$c', got $t")
    }
    def trySym(c: Char): Boolean = peek match {
      case Some(TSym(`c`)) => i += 1; true
      case _ => false
    }

    def expr(): Expr = {
      var l = factor()
      var cont = true
      while (cont) peek match {
        case Some(TSym('+')) => i += 1; l = Add(l, factor(), plus = true)
        case Some(TSym('-')) => i += 1; l = Add(l, factor(), plus = false)
        case _ => cont = false
      }
      l
    }
    private def factor(): Expr = next() match {
      case TNum(v) => Lit(v)
      case TStr(s) => Lit(s)
      case TNull => Lit(null)
      case TSym('?') => params += 1; Param(params - 1)
      case TSym('(') => val e = expr(); sym(')'); e
      case TIdent(f) if peek.contains(TSym('(')) =>
        i += 1
        if (f.equalsIgnoreCase("VALUES")) { val c = ident(); sym(')'); ValuesRef(c) }
        else {
          val args = Seq.newBuilder[Expr]
          if (!trySym(')')) {
            args += expr()
            while (trySym(',')) args += expr()
            sym(')')
          }
          Fn(f.toUpperCase, args.result())
        }
      case TIdent(c) => ColRef(c)
      case t => fail(s"unexpected $t in expression")
    }

    def statement(): Stmt = {
      kw("INSERT")
      val ignore = tryKw("IGNORE")
      kw("INTO")
      val table = ident()
      sym('(')
      val cols = Seq.newBuilder[String]
      cols += ident()
      while (trySym(',')) cols += ident()
      sym(')')
      kw("VALUES")
      val rows = Seq.newBuilder[Seq[Expr]]
      def tuple(): Seq[Expr] = {
        sym('(')
        val vs = Seq.newBuilder[Expr]
        vs += expr()
        while (trySym(',')) vs += expr()
        sym(')')
        vs.result()
      }
      rows += tuple()
      while (trySym(',')) rows += tuple()
      val updates = Seq.newBuilder[(String, Expr)]
      if (tryKw("ON")) {
        kw("DUPLICATE"); kw("KEY"); kw("UPDATE")
        def assign(): Unit = { val c = ident(); sym('='); updates += (c -> expr()) }
        assign()
        while (trySym(',')) assign()
      }
      trySym(';')
      peek.foreach(t => fail(s"trailing token $t"))
      Stmt(ignore, table, cols.result(), rows.result(), updates.result())
    }
  }

  // ---- evaluation -----------------------------------------------------

  private def num(v: Any): BigDecimal = v match {
    case b: BigDecimal => b
    case n: java.lang.Number => BigDecimal(n.toString)
    case s: String => BigDecimal(s)
    case other => throw new IllegalArgumentException(s"not numeric: $other")
  }

  private def eval(e: Expr, current: Seq[Any], fresh: Seq[Any], t: Table,
                   params: Seq[Any]): Any = e match {
    case Lit(v) => v
    case Param(n) => params(n)
    case ColRef(c) => current(t.idx(c))
    case ValuesRef(c) => fresh(t.idx(c))
    case Add(l, r, plus) =>
      val (a, b) = (eval(l, current, fresh, t, params), eval(r, current, fresh, t, params))
      if (a == null || b == null) null else if (plus) num(a) + num(b) else num(a) - num(b)
    case Fn(name, args) =>
      val vs = args.map(eval(_, current, fresh, t, params))
      name match {
        // MySQL: GREATEST/LEAST are NULL if ANY argument is NULL
        case "GREATEST" => if (vs.contains(null)) null else vs.map(num).max
        case "LEAST" => if (vs.contains(null)) null else vs.map(num).min
        case "COALESCE" => vs.find(_ != null).orNull
        case other => throw new IllegalArgumentException(s"unsupported function $other")
      }
  }

  /** Execute one generated MySQL statement against `t`. For the
    * `?`-parameterized one-row form, `params` carries the bound values
    * in placeholder order (i.e. already permuted by `Prepared.bind`);
    * literal multi-row statements take no params.
    */
  def execute(t: Table, sql: String, params: Seq[Any] = Nil): Unit = {
    val st = new P(lex(sql), sql).statement()
    require(st.cols == t.cols,
      s"column list ${st.cols} != table ${t.cols}") // generator writes full column lists
    st.rows.foreach { rowExprs =>
      // VALUES()/column refs are illegal in the VALUES tuple itself for
      // this grammar — only literals and params appear there
      val fresh = rowExprs.map(eval(_, Seq.empty, Seq.empty, t, params))
      val pk = t.pkOf(fresh)
      t.rows.get(pk) match {
        case None => t.rows(pk) = mutable.ArrayBuffer(fresh: _*)
        case Some(_) if st.ignore => ()
        case Some(cur) =>
          require(st.updates.nonEmpty,
            s"duplicate key $pk on plain INSERT (MySQL would raise ER_DUP_ENTRY)")
          // left-to-right, later assignments see earlier ones (MySQL rule)
          st.updates.foreach { case (c, e) =>
            cur(t.idx(c)) = eval(e, cur.toSeq, fresh, t, params)
          }
      }
    }
  }
}
