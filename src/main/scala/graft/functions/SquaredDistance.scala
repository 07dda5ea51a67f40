package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: squared L2 distance of two double
  * vectors — Σ(xᵢ−yᵢ)², double-accumulated in array order. The
  * k-means/PQ assignment hot loop: as the composed
  * `aggregate(zip_with(a,b,(x,y)->(x-y)*(x-y)),0D,+)` higher-order
  * expression it is CodegenFallback (boxed per-element lambdas —
  * at sf10 the n×k candidate pass paid minutes in it); this form is a
  * primitive loop inside whole-stage codegen.
  *
  * Value contract: identical operation order to the HOF form and to
  * the DuckDB `list_sum(list_transform(list_zip(...)))` oracle
  * rendering — element-order accumulation, one subtraction/multiply
  * per element — so swapping it under the oracle-gated q86/q101/q120/
  * q147 family cannot change results.
  */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_sqdist requires (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  // always nullable: the null semantics above can produce NULL even
  // from non-nullable children (length mismatch / null elements), and
  // a non-nullable contract would let codegen constant-fold ev.isNull
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // HOF-parity null semantics (see DotProduct): mismatch/null -> NULL
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |double $acc = 0.0;
         |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |  else {
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SquaredDistance {
  /** Column-API entry point: `sqdist(colA, colB)`. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(SquaredDistance(Bridge.expression(a), Bridge.expression(b)))
}
