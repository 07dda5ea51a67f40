package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: a `levenshtein(a, b) <= k` predicate gains the sound
  * cheap pre-filter `abs(length(a) - length(b)) <= k` (the length
  * difference lower-bounds edit distance). The added conjunct is a pure
  * column predicate, so later Catalyst passes can push it through joins
  * down to scans — rows whose lengths already differ too much never
  * reach the O(len²) levenshtein kernel.
  *
  * Injected via [[GraftExtensions]] (`injectOptimizerRule`). Tagged to
  * avoid re-adding the conjunct on every optimizer fixpoint iteration.
  */
object LevenshteinPrefilterRule extends Rule[LogicalPlan] {

  private def boundOf(e: Expression): Option[(Expression, Expression, Expression)] = e match {
    case LessThanOrEqual(Levenshtein(a, b, None), k @ Literal(_, IntegerType)) => Some((a, b, k))
    case LessThan(Levenshtein(a, b, None), k @ Literal(_, IntegerType)) => Some((a, b, k))
    case _ => None
  }

  private def prefilter(a: Expression, b: Expression, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)

  /** True if the cheap bound for this (a,b,k) is already present. */
  private def alreadyGuarded(cond: Expression, a: Expression, b: Expression, k: Expression): Boolean = {
    val guard = prefilter(a, b, k)
    cond.exists(_.semanticEquals(guard))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val bounds = cond.collect {
        case e if boundOf(e).isDefined => boundOf(e).get
      }.filterNot { case (a, b, k) => alreadyGuarded(cond, a, b, k) }
      if (bounds.isEmpty) f
      else {
        val guards = bounds.map { case (a, b, k) => prefilter(a, b, k) }
        Filter(guards.foldLeft(cond)(And(_, _)), child)
      }
  }
}
