package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Native Catalyst expression: Jaccard similarity of two string arrays
  * treated as sets — |A∩B| / |A∪B| — in one pass over each array with
  * a single hash set, `doGenCode` included so it stays inside
  * whole-stage codegen. Value-identical to the composed
  * `size(array_intersect(a,b)) / size(array_union(a,b))` formulation
  * for arrays of non-null elements (asserted bit-for-bit over corpus
  * shingles in FunctionsSpec). Two deliberate divergences: null
  * ELEMENTS are ignored here but count as a set member in
  * array_intersect/union, and two empty arrays yield 0.0 here vs
  * null (0/0) there — check both before swapping it into an
  * oracle-gated query over data where those cases occur.
  *
  * Use it on the CANDIDATE side of dedup — per-pair shingle arrays
  * after LSH blocking (q21's verify join is the at-scale shape; this
  * is the fused scalar for when pairs already carry their arrays).
  */
case class ArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_jaccard requires (array<string>, array<string>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i < x.numElements()) {
      if (!x.isNullAt(i)) setA.add(x.getUTF8String(i).copy())
      i += 1
    }
    val setB = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var inter = 0L
    i = 0
    while (i < y.numElements()) {
      if (!y.isNullAt(i)) {
        val v = y.getUTF8String(i).copy()
        if (setB.add(v) && setA.contains(v)) inter += 1
      }
      i += 1
    }
    val union = setA.size.toLong + setB.size.toLong - inter
    if (union == 0L) 0.0 else inter.toDouble / union.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val setA = ctx.freshName("setA")
      val setB = ctx.freshName("setB")
      val inter = ctx.freshName("inter")
      val union = ctx.freshName("union")
      val v = ctx.freshName("v")
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      s"""
         |java.util.HashSet<$utf8> $setA = new java.util.HashSet<$utf8>();
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) $setA.add($a.getUTF8String($i).copy());
         |}
         |java.util.HashSet<$utf8> $setB = new java.util.HashSet<$utf8>();
         |long $inter = 0L;
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  if (!$b.isNullAt($i)) {
         |    $utf8 $v = $b.getUTF8String($i).copy();
         |    if ($setB.add($v) && $setA.contains($v)) $inter++;
         |  }
         |}
         |long $union = (long) $setA.size() + (long) $setB.size() - $inter;
         |${ev.value} = $union == 0L ? 0.0 : (double) $inter / (double) $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayJaccard {
  /** Column-API entry point: `jaccard(colA, colB)`. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(ArrayJaccard(Bridge.expression(a), Bridge.expression(b)))
}
