package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: cosine of two INTEGER (int8-quantized,
  * stored as bigint) vectors in one fused pass — exact long
  * accumulation of the dot and both squared norms, one double division
  * at the end. Replaces the composed `aggregate(zip_with(...))`
  * formulation in the q89/q147 hot path: higher-order functions are
  * CodegenFallback (per-element boxed lambda evaluation — measured
  * ~36 s for one 190k × 64-dim corpus pass at sf10), while this
  * expression stays inside whole-stage codegen as a primitive loop.
  *
  * Value contract: bit-identical to
  * `aggregate(zip_with(a,b,(x,y)->x*y),0L,(s,t)->s+t)::double /
  * (sqrt(idot(a,a)::double) * sqrt(idot(b,b)::double))` — the sums are
  * exact longs in both forms, so the only doubles are the final three
  * conversions and the division, in the same order. Swapping it into
  * the oracle-gated q89/q147 cannot change results (the q105 recall
  * audit and both oracles pin this).
  */
case class Int8Cosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_int8_cosine requires (array<bigint>, array<bigint>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  // always nullable: the null semantics above can produce NULL even
  // from non-nullable children (length mismatch / null elements), and
  // a non-nullable contract would let codegen constant-fold ev.isNull
  override def nullable: Boolean = true
  override def prettyName: String = "graft_int8_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // HOF-parity null semantics (see DotProduct): mismatch/null -> NULL
    if (n != y.numElements()) return null
    var dot = 0L; var nx = 0L; var ny = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getLong(i)
      val yi = y.getLong(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot.toDouble / (math.sqrt(nx.toDouble) * math.sqrt(ny.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |long $dot = 0L; long $nx = 0L; long $ny = 0L;
         |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |  else {
         |    long $xi = $a.getLong($i);
         |    long $yi = $b.getLong($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |}
         |${ev.value} = (double) $dot /
         |  (java.lang.Math.sqrt((double) $nx) * java.lang.Math.sqrt((double) $ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Int8Cosine {
  /** Column-API entry point: `int8cos(colA, colB)`. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(Int8Cosine(Bridge.expression(a), Bridge.expression(b)))
}
