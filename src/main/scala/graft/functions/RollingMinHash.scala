package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: minimum Rabin–Karp polynomial hash over
  * all `window`-byte substrings of a string — the winnowing-style
  * content fingerprint (q27) in ONE O(n) pass.
  *
  * Hash of a window = Σ byte(i+j) * base^(window-1-j); rolled forward as
  * `h' = (h - leadByte * base^(window-1)) * base + nextByte`. With the
  * default (window=8, base=31) and ASCII input the value is ≤ ~3.5e12,
  * so plain Long arithmetic is EXACT (no modulus) and the DuckDB oracle
  * can replay it verbatim with `ord()` + integer literals
  * ([[RollingMinHash.duckDbSql]]).
  *
  * Replaces the md5-per-window formulation (~400 md5 calls per
  * document, the round-1 bench's slowest query) with ~n adds/multiplies
  * inside whole-stage codegen.
  *
  * Bytes, not codepoints: callers must pass ASCII-normalized text (q27
  * normalizes to `[a-z0-9 ]` first); on multi-byte UTF-8 the hash is
  * still deterministic but no longer matches `ord()`-based oracles.
  */
case class RollingMinHash(child: Expression, window: Int, base: Long)
    extends UnaryExpression {

  require(window >= 1 && window <= 16, "window must be in [1, 16]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_min_hash requires string, got $t")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rolling_min_hash"

  private lazy val topPow: Long = {
    var p = 1L; var j = 1
    while (j < window) { p *= base; j += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < window) null
    else {
      var h = 0L
      var i = 0
      while (i < window) { h = h * base + (bytes(i) & 0xFFL); i += 1 }
      var min = h
      while (i < n) {
        h = (h - (bytes(i - window) & 0xFFL) * topPow) * base + (bytes(i) & 0xFFL)
        if (h < min) min = h
        i += 1
      }
      min
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val min = ctx.freshName("min")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $s.getBytes();
         |int $n = $bytes.length;
         |if ($n < $window) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $h = 0L;
         |  int $i = 0;
         |  for (; $i < $window; $i++) { $h = $h * ${base}L + ($bytes[$i] & 0xFFL); }
         |  long $min = $h;
         |  for (; $i < $n; $i++) {
         |    $h = ($h - ($bytes[$i - $window] & 0xFFL) * ${topPow}L) * ${base}L + ($bytes[$i] & 0xFFL);
         |    if ($h < $min) $min = $h;
         |  }
         |  ${ev.value} = $min;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingMinHash {
  val DefaultWindow = 8
  val DefaultBase = 31L

  /** Column-API entry point. */
  def apply(c: Column, window: Int = DefaultWindow, base: Long = DefaultBase): Column =
    Bridge.column(RollingMinHash(Bridge.expression(c), window, base))

  /** The identical computation as DuckDB SQL over `expr` (a string
    * column of ASCII text): min over explicit per-window polynomials —
    * O(n·w) instead of O(n), but it is the ORACLE side; exactness is
    * what matters. `ord()` = byte value for ASCII.
    */
  def duckDbSql(expr: String, window: Int = DefaultWindow, base: Long = DefaultBase): String = {
    val pows = Iterator.iterate(1L)(_ * base).take(window).toArray // base^0 .. base^(w-1)
    val terms = (0 until window).map { j =>
      val pow = pows(window - 1 - j)
      if (pow == 1L) s"ord(substr($expr, i + $j, 1))"
      else s"ord(substr($expr, i + $j, 1)) * ${pow}::BIGINT"
    }
    s"list_min(list_transform(generate_series(1, length($expr) - ${window - 1}), " +
      s"i -> ${terms.mkString(" + ")}))"
  }
}
