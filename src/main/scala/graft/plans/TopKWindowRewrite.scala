package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

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
  *  - MULTI-column orderings rewrite when every column is
  *    non-nullable: the tuple ordering is the natural ordering of a
  *    struct of the columns (lexicographic field-by-field). MIXED
  *    directions rewrite too when every against-the-grain column's
  *    type admits a strictly order-REVERSING, equality-preserving
  *    value transform ([[flipped]]): integral/date/timestamp via
  *    bitwise NOT (`~x = -x-1`, a monotone-decreasing bijection on
  *    two's complement — no MinValue overflow), decimal via negation
  *    (symmetric range), float/double via a (notNaN, -x) struct that
  *    pins NaN to the flipped extreme, boolean via NOT. Strings and
  *    nested types have no such transform and legitimately refuse.
  *    Multi-column null semantics stay beyond the keep-nulls
  *    completion's model (non-nullable required);
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

  /** dense mode keys a map by value equals()/bytes; the single-column
    * float path normalizes -0.0 at ownership ([[TopKCollector]]), but
    * a float nested ANYWHERE inside a struct-typed order value — a
    * user-written struct expression or the multi-column struct key —
    * cannot be normalized in place, so -0.0 vs 0.0 would phantom a
    * distinct rank class (the ordering calls them equal, the map key
    * does not). Refuse every shape except a bare top-level
    * float/double column (the normalized path) or float-free types.
    */
  private def denseFloatSafe(os: Seq[SortOrder]): Boolean = {
    def hasFloat(t: DataType): Boolean = t match {
      case DoubleType | FloatType => true
      case s: StructType => s.fields.exists(f => hasFloat(f.dataType))
      case a: ArrayType => hasFloat(a.elementType)
      case m: MapType => hasFloat(m.keyType) || hasFloat(m.valueType)
      case _ => false
    }
    if (os.size == 1) {
      val t = os.head.child.dataType
      t == DoubleType || t == FloatType || !hasFloat(t)
    } else os.forall(so => !hasFloat(so.child.dataType))
  }

  /** A strictly order-REVERSING, equality-preserving transform of `e`,
    * when its type admits one: ascending order of `flipped(e)` equals
    * descending order of `e` (and vice versa — a reversing bijection
    * works in both directions). This is what lets a mixed-direction
    * multi-column ordering still become ONE struct key: the
    * against-the-grain fields flip inside the struct.
    *
    *  - integral/date/timestamp: bitwise NOT. `~x = -x-1` is a
    *    monotone-decreasing bijection on two's-complement — unlike
    *    negation it cannot overflow at MinValue, stays the same
    *    physical type, and costs one instruction in codegen. Dates
    *    and timestamps pass through their lossless integer views
    *    (`unix_date` days / `unix_micros`) first — lossless matters:
    *    a truncating view would invent ties the window doesn't have.
    *  - decimal: negation (a decimal's range is symmetric in its
    *    digits, so `-x` cannot overflow).
    *  - float/double: NaN sorts ABOVE +Infinity and survives negation
    *    unchanged, so plain `-x` would leave NaN at the wrong end; a
    *    `(NOT isnan(x), -x)` struct pins NaN rows to the flipped
    *    extreme (`false` sorts first ascending, last descending).
    *    `-0.0 ↔ 0.0` under negation is harmless: the ordering already
    *    treats them as one value.
    *  - boolean: NOT (`false < true`).
    *  - strings, binary, nested types: no reversing transform exists
    *    that the heap's ordering can evaluate — refuse (None), the
    *    window stays.
    */
  private def flipped(e: Expression): Option[Expression] = e.dataType match {
    case BooleanType => Some(Not(e))
    case ByteType | ShortType | IntegerType | LongType => Some(BitwiseNot(e))
    case _: DecimalType => Some(UnaryMinus(e))
    case DateType => Some(BitwiseNot(UnixDate(e)))
    case TimestampType => Some(BitwiseNot(UnixMicros(e)))
    case FloatType =>
      Some(CreateStruct(Seq(Not(IsNaN(e)), If(IsNaN(e), Literal(0.0f), UnaryMinus(e)))))
    case DoubleType =>
      Some(CreateStruct(Seq(Not(IsNaN(e)), If(IsNaN(e), Literal(0.0), UnaryMinus(e)))))
    case _ => None
  }

  /** The single expression whose natural ordering equals the window's
    * multi-column sort: the column itself for one order, a struct for
    * several — struct comparison is lexicographic field-by-field,
    * which IS the tuple ordering once every field sorts the HEAD
    * column's direction. Against-the-grain fields are [[flipped]]
    * inside the struct; None when any such field's type has no
    * reversing transform — those windows stay unrewritten.
    */
  private[plans] def orderKey(os: Seq[SortOrder]): Option[Expression] = os match {
    case Seq(one) => Some(one.child)
    case many if many.nonEmpty =>
      val canonical = many.head.direction
      val fields = many.map { so =>
        if (so.direction == canonical) Some(so.child) else flipped(so.child)
      }
      if (fields.forall(_.isDefined)) Some(CreateStruct(fields.map(_.get)))
      else None
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
                denseFloatSafe(orderSpec)
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
