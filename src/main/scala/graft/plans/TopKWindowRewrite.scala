package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: the standard per-key top-k idiom —
  *
  *   `row_number().over(Window.partitionBy(keys).orderBy(ord))`
  *   then `filter(rn <= k)`  (or the same thing spelled in SQL)
  *
  * — plans as Exchange + full per-partition SORT + WindowExec, with
  * every input row surviving to the filter. This rule rewrites the
  * pattern to run [[TopKPerKeyNode]] UNDER the window:
  *
  *   Filter(rn ≤ k, Window(rn, TopKPerKeyNode(keys, ord, k)))
  *
  * The heap operator bounds each map task's output to k rows per key
  * BEFORE the shuffle (something the window alone fundamentally
  * cannot), and the surviving Window then sorts/ranks only ≤ k rows
  * per key — so the rewrite preserves the full output schema
  * (`rn` included) while the heavy lifting moves to the O(n log k)
  * no-sort operator. This strictly beats Spark's own
  * `InferWindowGroupLimit` (whose `WindowGroupLimitExec` still sorts
  * every input partition); when that rule has already fired, the
  * inserted [[WindowGroupLimit]] node is recognized and replaced.
  *
  * Soundness:
  *  - `row_number` rewrites to the plain heap; `rank` rewrites to the
  *    heap's KEEP-TIES mode ([[TopKCollector]]): rank counts only
  *    strictly-better rows, so `rank <= k` keeps every row tied with
  *    the k-th best value — the collector buffers threshold-tied rows
  *    (and re-admits an evicted duplicate of a surviving threshold)
  *    so the surviving set is exactly the filter's, and the window
  *    above recomputes identical rank values because rank depends
  *    only on values, never tie order. `dense_rank` rewrites to the
  *    DENSE mode: a bounded heap of the k best DISTINCT values, each
  *    carrying every row that bears it — dense_rank counts distinct
  *    better values, so `dense_rank <= k` keeps exactly the rows of
  *    the top-k value classes; the partial phase is sound because a
  *    value with < k distinct betters globally has < k distinct
  *    betters in every slice;
  *  - MULTI-column orderings rewrite when every column sorts the SAME
  *    direction and is non-nullable: the tuple ordering is then
  *    exactly the natural ordering of a struct of the columns
  *    (lexicographic field-by-field), so the heap compares one struct
  *    value per row. Mixed directions stay windows (a struct can't
  *    flip one field), and multi-column null semantics are beyond the
  *    keep-nulls completion's model;
  *  - only a LITERAL integer upper bound on the rank column counts
  *    (`rn <= k`, `rn < k`, `k >= rn`, `rn = k`); other conjuncts and
  *    other uses of `rn` are untouched — the window recomputes `rn`
  *    over exactly the surviving top-k rows, so every downstream
  *    reference sees the same values (under ties both the original
  *    and rewritten plans pick an arbitrary valid assignment; that
  *    nondeterminism is the window's, not the rewrite's);
  *  - a NULLABLE order column is rewritten only under NULLS LAST
  *    (the default for DESC): the heap keeps null-order rows aside
  *    and fills trailing slots with them ([[TopKCollector]] keep-nulls
  *    mode) — under NULLS FIRST null rows outrank everything and a
  *    top-k heap over non-nulls would be wrong, so the rewrite skips.
  *    In RANK mode a nullable order column skips entirely: all nulls
  *    are mutually tied, so when any null surfaces (non-null count
  *    < k) EVERY null row has rank ≤ k and the bounded keep-nulls
  *    completion would under-produce;
  *  - empty partitionSpec (global ranking) is skipped: the final heap
  *    would hash every row to one key — Spark's own sort-based limit
  *    handles that shape better.
  */
object TopKWindowRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Above this bound the heap's O(k) per-key arrays stop being a win
    * over the sort the window pays anyway — and a `rn <= 50_000_000`
    * "cap-at-N" idiom must not allocate 50M-slot arrays per key. Same
    * role as Spark's `windowGroupLimitThreshold` guard.
    */
  private val MaxRewriteK = 10000

  /** Smallest literal upper bound the conjuncts place on `rn`.
    * Arithmetic in Long: `rn < Int.MinValue` must yield a (rejected)
    * non-positive bound, not wrap around to Int.MaxValue.
    */
  private def upperBound(conjuncts: Seq[Expression], rn: Attribute): Option[Long] = {
    val ks = conjuncts.collect {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => k.toLong
      case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => k.toLong - 1
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => k.toLong
      case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => k.toLong - 1
      case EqualTo(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => k.toLong
      case EqualTo(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => k.toLong
    }
    ks.reduceOption(_ min _)
  }

  private def sameSpec(ps: Seq[Expression], os: Seq[SortOrder],
      partSpec: Seq[Expression], orderExpr: Expression): Boolean =
    ps.length == partSpec.length &&
      ps.zip(partSpec).forall { case (x, y) => x.semanticEquals(y) } &&
      orderKey(os).exists(_.semanticEquals(orderExpr))

  /** The single expression whose natural ordering equals the window's
    * (same-direction) multi-column sort: the column itself for one
    * order, a struct for several — struct comparison is lexicographic
    * field-by-field, which IS the tuple ordering when every field
    * sorts the same way. None when directions are mixed (a struct
    * can't flip one field) — those windows stay unrewritten.
    */
  private[plans] def orderKey(os: Seq[SortOrder]): Option[Expression] = os match {
    case Seq(one) => Some(one.child)
    case many if many.nonEmpty && many.map(_.direction).distinct.size == 1 =>
      Some(CreateStruct(many.map(_.child)))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(rankFn, _), _)),
          partSpec, orderSpec, wchild, _))
        if partSpec.nonEmpty && orderSpec.nonEmpty &&
          orderSpec.forall(_.child.deterministic) &&
          orderKey(orderSpec).isDefined &&
          (rankFn match {
            // single nullable order rewrites under NULLS LAST via the
            // keep-nulls completion; MULTI-column null semantics (a
            // null in one field, orderings per field) are beyond the
            // completion's model, so multi requires non-nullable
            case _: RowNumber =>
              if (orderSpec.size == 1)
                !orderSpec.head.child.nullable || orderSpec.head.nullOrdering == NullsLast
              else orderSpec.forall(!_.child.nullable)
            case _: Rank => orderSpec.forall(!_.child.nullable) // all nulls tie: bounded completion can't hold them
            case _: DenseRank =>
              orderSpec.forall(!_.child.nullable) && // nulls are one dense class: same refusal
                // multi-column dense compares struct VALUES by bytes:
                // a -0.0 inside a field would phantom a distinct class
                // (ordering says equal, byte-equality says not) — the
                // single-column path normalizes zeros, structs can't
                (orderSpec.size == 1 || !orderSpec.exists(so =>
                  so.child.dataType == org.apache.spark.sql.types.DoubleType ||
                    so.child.dataType == org.apache.spark.sql.types.FloatType))
            case _ => false
          }) =>
      val ties = rankFn.isInstanceOf[Rank]
      val dense = rankFn.isInstanceOf[DenseRank]
      val orderExpr = orderKey(orderSpec).get
      val dir = orderSpec.head.direction
      // InferWindowGroupLimit may have fired first (it runs before
      // injected extension rules' fixpoint in some orders, after the
      // experimental-methods batch in others): its sort-based limit
      // node is subsumed by the heap operator — replace it
      val base = wchild match {
        case WindowGroupLimit(ps, os, _, _, inner)
            if sameSpec(ps, os, partSpec, orderExpr) => inner
        case other => other
      }
      val already = base match {
        case t: TopKPerKeyNode =>
          t.order.semanticEquals(orderExpr) &&
            sameSpec(t.keys, orderSpec, partSpec, orderExpr) &&
            t.keepTies == ties && t.keepDense == dense
        case _ => false
      }
      upperBound(splitConjunctivePredicates(cond), alias.toAttribute) match {
        case Some(k) if k > 0 && k <= MaxRewriteK && !already =>
          f.copy(child = w.copy(child = TopKPerKeyNode(
            partSpec, orderExpr, k.toInt, dir == Descending, base,
            keepNulls = orderSpec.size == 1 && orderSpec.head.child.nullable && !ties && !dense,
            keepTies = ties,
            keepDense = dense)))
        case _ => f
      }
  }

  /** Arm the rewrite (and the strategy that plans its node) on a LIVE
    * session — extensions only apply at session construction; this
    * covers notebooks/REPLs, mirroring [[TopKPerKey.apply]]'s strategy
    * arming. Idempotent.
    */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(TopKWindowRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKWindowRewriteRule
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
  }
}
