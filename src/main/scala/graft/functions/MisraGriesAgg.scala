package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters summary state: at most `m` counters, the
  * total decrement mass applied so far (`err`), and the stream length
  * (`n`). Immutable-map state so the Catalyst product encoder handles
  * the partial-aggregation buffer unchanged.
  */
case class MGState(counts: Map[String, Long], err: Long, n: Long)

/** One-pass MERGEABLE Misra–Gries heavy-hitters sketch (Misra & Gries
  * 1982; mergeability per Agarwal et al. 2013, "Mergeable summaries"):
  * ≤ `m` counters summarize any stream, with the two-sided guarantee
  *
  *   true(w) − err  ≤  est(w)  ≤  true(w)        (est = 0 when absent)
  *
  * and the decrement mass bounded by `err · (m+1) ≤ n − Σ counters` —
  * every decrement step removes the same amount from ≥ m+1 items'
  * mass at once (the overflowing insert pays alongside the m stored
  * counters; on merge the (m+1)-th largest is subtracted from ≥ m+1
  * entries). Consequently every item with true frequency > n/(m+1) is
  * GUARANTEED to survive in the sketch.
  *
  * This is the aggregate that replaces a full `groupBy(item).count`
  * when only the frequent tail matters: O(m) state per partition, one
  * scan, partial aggregation and the shuffle carry sketches — at
  * 100 TB the exact groupBy shuffles the whole item domain, the
  * sketch shuffles `m` counters per map task. The estimates it yields
  * are processing-order-dependent (any MG implementation's are), so
  * consumers must publish order-independent facts — the guarantee
  * flags and guaranteed-present items — not raw estimates; see
  * `TextAnalysis.heavyHitters` (q122) for the audit-shaped consumer.
  */
class MisraGriesAgg(m: Int) extends Aggregator[String, MGState, MGState] {
  require(m > 0, "m must be positive")

  override def zero: MGState = MGState(Map.empty, 0L, 0L)

  override def reduce(buf: MGState, g: String): MGState = {
    // null items are not part of the stream (a null map key would also
    // be rejected by the Catalyst map encoder at the shuffle boundary)
    if (g == null) return buf
    val c = buf.counts
    c.get(g) match {
      case Some(v) => buf.copy(counts = c.updated(g, v + 1), n = buf.n + 1)
      case None if c.size < m =>
        buf.copy(counts = c.updated(g, 1L), n = buf.n + 1)
      case None =>
        // overflow: the classic decrement-all-by-one step — the new
        // item's single occurrence cancels against one unit of every
        // stored counter (m+1 items each lose 1 → err grows by 1)
        val dec = c.iterator.collect { case (k, v) if v > 1 => (k, v - 1) }.toMap
        MGState(dec, buf.err + 1, buf.n + 1)
    }
  }

  override def merge(a: MGState, b: MGState): MGState =
    MisraGriesAgg.mergeStates(a, b, m)

  override def finish(buf: MGState): MGState = buf

  override def bufferEncoder: Encoder[MGState] = ExpressionEncoder[MGState]()
  override def outputEncoder: Encoder[MGState] = ExpressionEncoder[MGState]()
}

object MisraGriesAgg {
  /** `mg_sketch(itemCol)` as an aggregate Column yielding a
    * `struct(counts MAP, err BIGINT, n BIGINT)` row.
    */
  def column(m: Int)(items: Column): Column =
    udaf(new MisraGriesAgg(m), Encoders.STRING).apply(items)

  /** The ONE mergeable-summary merge, shared by the aggregate's
    * shuffle-side combine and the streaming job's batch-into-state
    * fold ([[graft.streaming.StreamingJobs.heavyHittersStream]]) —
    * a second definition would be a second (subtly different) sketch.
    */
  def mergeStates(a: MGState, b: MGState, m: Int): MGState = {
    val combined = b.counts.foldLeft(a.counts) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    val base = MGState(combined, a.err + b.err, a.n + b.n)
    if (combined.size <= m) base
    else {
      // shrink back to m: subtract the (m+1)-th largest counter value
      // from every entry — ≥ m+1 entries lose the full v, so the
      // err·(m+1) ≤ n − Σ mass bound is preserved through merges
      val v = combined.valuesIterator.toArray.sortBy(-_).apply(m)
      val cut = combined.iterator.collect { case (k, c) if c > v => (k, c - v) }.toMap
      MGState(cut, base.err + v, base.n)
    }
  }
}
