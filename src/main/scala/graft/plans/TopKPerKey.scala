package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.Bridge
import scala.collection.mutable

/** Custom whole-operator plan: top-k rows per key WITHOUT a sort.
  *
  * The DataFrame-expressible formulation —
  * `row_number().over(Window.partitionBy(keys).orderBy(order))` then
  * `filter(rn <= k)` — plans as Exchange + FULL SORT of every
  * partition + WindowExec, i.e. O(n log n) per partition and the whole
  * input materialized through the sort, when only k rows per key
  * survive. That inefficiency is structural (Catalyst has no per-key
  * top-k operator to plan into), which makes this the textbook case
  * for the custom-operator escape hatch: a logical node
  * ([[TopKPerKeyNode]]), a planner strategy ([[TopKPerKeyStrategy]]),
  * and a physical operator ([[TopKPerKeyExec]]) that keeps one bounded
  * heap per key — O(n log k) time, O(#keys × k) memory, no sort
  * buffer, spill never needed for the data (only the heaps).
  *
  * Planned TWO-PHASE like partial aggregation: a map-side pass bounds
  * the shuffle to ≤ k rows per (key, input partition) — something the
  * window formulation fundamentally cannot do (row_number needs every
  * row of the partition on one reducer) — then the final exec declares
  * `ClusteredDistribution(keys)`, so Catalyst still owns the shuffle
  * (and AQE still coalesces it). Registration: the
  * [[TopKPerKey.apply]] API arms `spark.experimental.extraStrategies`
  * on the live session; session builders can instead inject
  * [[TopKPerKeyStrategy]] via `GraftExtensions`.
  */
final case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Expression,
    k: Int,
    descending: Boolean,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, desc, child) =>
      // two-phase, like partial aggregation: a map-side pass bounds the
      // SHUFFLE to ≤ k rows per (key, input partition) — sound because
      // per-key top-k of a union is contained in the union of per-slice
      // top-k's — then the final pass runs on the clustered data
      val partial = TopKPerKeyExec(keys, order, k, desc, planLater(child), partial = true)
      TopKPerKeyExec(keys, order, k, desc, partial) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Expression,
    k: Int,
    descending: Boolean,
    child: SparkPlan,
    partial: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val orderExpr = order
    val childOutput = child.output
    val desc = descending
    val limit = k
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val boundOrder = BindReferences.bindReference(orderExpr, childOutput)
      val base = Bridge.interpretedOrdering(orderExpr.dataType)
      // heap head must be the WORST kept row (the eviction candidate):
      // for top-k-largest that's the smallest value, so reverse
      val heapOrd: Ordering[(Any, InternalRow)] = {
        val v = if (desc) base.reverse else base
        Ordering.by[(Any, InternalRow), Any](_._1)(v)
      }
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[(Any, InternalRow)]]
      it.foreach { row =>
        val key = keyProj(row)
        // copy the projected key ONLY on first sight — getOrElseUpdate's
        // key argument is strict, so key.copy() there would allocate
        // per input row
        var heap = heaps.getOrElse(key, null)
        if (heap == null) {
          heap = mutable.PriorityQueue.empty(heapOrd)
          heaps.put(key.copy(), heap)
        }
        val v = boundOrder.eval(row)
        if (v != null) {
          // eval of a string/binary/struct over an unsafe row returns a
          // view into the REUSED row buffer — copy before storing in
          // the heap or the kept values mutate as the iterator advances
          def owned: Any = v match {
            case u: org.apache.spark.unsafe.types.UTF8String => u.copy()
            case b: Array[Byte] => b.clone()
            case r: InternalRow => r.copy()
            case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
            case other => other
          }
          if (heap.size < limit) heap.enqueue((owned, row.copy()))
          else if (heapOrd.lt((v, row), heap.head)) { // beats the worst kept
            heap.dequeue(); heap.enqueue((owned, row.copy()))
          }
        }
      }
      // emit best→worst per key (dequeue yields worst-first; reverse)
      heaps.iterator.flatMap { case (_, heap) =>
        val drained = mutable.ArrayBuffer.empty[InternalRow]
        while (heap.nonEmpty) drained += heap.dequeue()._2
        drained.reverseIterator
      }
    }, preservesPartitioning = true)
  }
}

object TopKPerKey {

  /** Top-k rows per key by `order` (largest first when `descending`).
    * Rows with a NULL order value are EXCLUDED — unlike `row_number`
    * over a NULLS-LAST ordering, which still ranks null rows into
    * remaining slots; a key whose rows are all null-ordered yields no
    * output. (q82's oracle column is non-null, so the window oracle
    * stays value-exact there; on nullable columns filter nulls first
    * if window parity matters.) The order expression is projected to a temp
    * column first and the node is built on already-RESOLVED attribute
    * references — a custom logical node cannot rely on the analyzer to
    * unwrap Spark 4's ColumnNodeExpression wrappers inside unknown
    * plan types.
    */
  def apply(df: DataFrame, keyCols: Seq[String], orderCol: Column, k: Int,
      descending: Boolean = true): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    // collision-proof temp name: an input column of the same name would
    // otherwise be overwritten and then dropped
    val tmp = "__graft_topk_order_" + java.util.UUID.randomUUID().toString.take(8)
    val analyzed = df.withColumn(tmp, orderCol).queryExecution.analyzed
    val out = analyzed.output
    def attr(n: String): Attribute = out.filter(_.name == n) match {
      case Seq(one) => one
      case Seq() => throw new IllegalArgumentException(
        s"topKPerKey: no column '$n' in ${out.map(_.name)}")
      case many => throw new IllegalArgumentException(
        s"topKPerKey: ambiguous column '$n' (${many.size} matches) — rename inputs first")
    }
    Bridge.ofRows(spark,
      TopKPerKeyNode(keyCols.map(attr), attr(tmp), k, descending, analyzed))
      .drop(tmp)
  }
}
