package graft.plans

import graft.core.{ColStat, ManifestEntry, ManifestFileIndex, ParquetStats}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

/** Metadata-only aggregates over manifested tables (round 15): a
  * filterless global `count(*)` / `count(col)` / `min(col)` /
  * `max(col)` whose child is a manifest-backed scan is answered from
  * the manifest's recorded per-file stats ([[graft.core.FileStat]] row
  * counts, [[ColStat]] envelopes, partition keys) — the plan collapses
  * to a [[LocalRelation]]: zero tasks, zero file opens. This is the
  * Iceberg/Delta "metadata query" discipline; on a 100 TB table the
  * same `count(*)` otherwise launches a scan stage that opens every
  * file (one S3 GET per footer just to read row counts the commit
  * file already holds).
  *
  * Strictly answerable-or-bail — the rule rewrites ONLY when the
  * manifest can give the EXACT answer Spark's execution would:
  *   - grouping must be empty OR exactly the partition column
  *     (round 16: `count(*)/min/max … GROUP BY day` — the
  *     Iceberg/Delta "partitions" metadata table — answers one row
  *     per live entry from entry keys + recorded row counts; an
  *     all-empty entry produces NO group, exactly like the scan);
  *     no Filter anywhere below the aggregate except partition-only
  *     ones (only attribute-passing Projects), no DISTINCT, no FILTER
  *     clause;
  *   - every selected entry stats-bearing, every file with a row
  *     count;
  *   - `count(col)` needs every file's null count for `col`;
  *   - `min/max(col)` on data columns only for exactly-recorded
  *     domains (integral, date, micros-timestamp, boolean) — string
  *     envelopes are TRUNCATED and float envelopes NaN-blind, so both
  *     bail; files provably all-null (or empty) contribute nothing;
  *     zero contributing rows yields SQL's null;
  *   - `min/max(partCol)` answers from entry keys (exact, any type
  *     incl. strings), counting only entries with live rows.
  * Anything else falls through to the ordinary scan untouched —
  * `ManifestMetadataAggSpec` proves both directions value-identical.
  *
  * Registered via [[graft.functions.GraftExtensions]] or per-session
  * with [[ManifestMetadataAgg.ensure]].
  */
object ManifestMetadataAggRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(Nil, aggExprs, child, _) =>
      indexOf(child).flatMap { case (idx, partFilters) =>
        answer(agg, aggExprs, idx, partFilters, grouped = false)
      }.getOrElse(agg)
    // GROUP BY exactly the partition column (round-16 verdict task 2):
    // one output row per selected entry with live rows — the
    // Iceberg/Delta "partitions" metadata table, answered from entry
    // keys + recorded per-file stats with zero tasks
    case agg @ Aggregate(Seq(g: AttributeReference), aggExprs, child, _) =>
      indexOf(child).flatMap { case (idx, partFilters) =>
        if (idx.partColName.nonEmpty && g.name == idx.partColName)
          answer(agg, aggExprs, idx, partFilters, grouped = true)
        else None
      }.getOrElse(agg)
  }

  /** The manifest index under attribute-only projections and
    * PARTITION-ONLY filters (returned for exact evaluation against
    * entry keys — `count(*) WHERE day BETWEEN …` is still a metadata
    * fact: a partition predicate selects whole entries, never splits
    * one). None the moment anything else (a data-column or
    * non-deterministic filter, an expression Project, a join…) sits
    * in between — those change the row set in ways entry keys can't
    * express.
    */
  private def indexOf(plan: LogicalPlan): Option[(ManifestFileIndex, Seq[Expression])] =
    plan match {
      case Project(projs, c) if projs.forall(_.isInstanceOf[AttributeReference]) =>
        indexOf(c)
      case Filter(cond, c) if cond.deterministic =>
        indexOf(c).filter { case (idx, _) =>
          idx.partColName.nonEmpty &&
            cond.references.nonEmpty &&
            cond.references.forall(_.name == idx.partColName) &&
            // subqueries (IN (SELECT …), scalar subqueries) reference
            // only the partition column at THIS level but carry a whole
            // child plan that interpreted Predicate cannot evaluate —
            // and this rule runs before RewriteSubquery, so the
            // Unevaluable would throw mid-optimization. Bail to the
            // ordinary scan, which plans the subquery normally.
            !cond.exists(_.isInstanceOf[PlanExpression[_]])
        }.map { case (idx, fs) => (idx, fs :+ cond) }
      case lr: LogicalRelation => lr.relation match {
        case fsr: HadoopFsRelation => fsr.location match {
          case idx: ManifestFileIndex => Some((idx, Nil))
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }

  private def answer(agg: Aggregate, aggExprs: Seq[NamedExpression],
      idx: ManifestFileIndex, partFilters: Seq[Expression],
      grouped: Boolean): Option[LogicalPlan] = {
    // STRUCTURAL pre-gate before any metadata is touched (round 18):
    // `selectedEntries` below materializes the COMPLETE entry set —
    // on a lazily-resolved segmented table that is a fetch of every
    // bucket, so an aggregate this rule can never answer (sum, avg,
    // distinct, filtered) must bail BEFORE it, not after
    val answerable = aggExprs.forall(_.collect {
      case ae: AggregateExpression => ae
    }.forall(ae => !ae.isDistinct && ae.filter.isEmpty &&
      (ae.aggregateFunction match {
        case _: Count | _: Min | _: Max => true
        case _ => false
      })))
    if (!answerable) return None
    // partition-only filters select whole entries — evaluated with
    // catalyst's own interpreted predicate against each entry key, the
    // SAME evaluation the scan's partition pruning would apply, so the
    // metadata answer matches the scan's row set exactly. Filter
    // semantics: a null predicate result drops the row; partition
    // values are never null, so binding non-nullable is faithful.
    val entries = {
      val all = idx.selectedEntries
      if (partFilters.isEmpty) all
      else {
        val bound = partFilters.reduce(org.apache.spark.sql.catalyst.expressions.And)
          .transform {
            case a: AttributeReference if a.name == idx.partColName =>
              BoundReference(0, idx.partType, nullable = false)
          }
        // anything non-literal/non-bound left over (a subquery, an
        // outer reference) is not evaluable here — bail
        if (bound.references.nonEmpty) return None
        // belt-and-braces: any predicate shape interpreted evaluation
        // rejects (an Unevaluable that slipped past the structural
        // guards) falls through to the scan instead of failing the
        // whole optimization batch
        try {
          val pred = Predicate.createInterpreted(bound)
          pred.initialize(0)
          all.filter(e => pred.eval(
            org.apache.spark.sql.catalyst.InternalRow(idx.partValueInternal(e.part))))
        } catch {
          case scala.util.control.NonFatal(_) => return None
        }
      }
    }
    if (entries.isEmpty || entries.exists(_.allStats.isEmpty)) return None
    if (entries.flatMap(_.allStats).exists(_.rowCount < 0)) return None
    // EXACT name matches throughout: the aggregate's attributes carry
    // the relation schema's casing, which equals the manifest's
    // partition-column name and the parquet field names the envelopes
    // recorded — case-folding here could answer `x` from a distinct
    // column `X` under spark.sql.caseSensitive=true (wrong values,
    // zero tasks, no error)
    val isPartCol: String => Boolean = n =>
      idx.partColName.nonEmpty && n == idx.partColName

    /** Exactly-recorded domains only: the envelope IS the true
      * min/max. Strings are truncated (inexact), floats NaN-blind
      * (Spark orders NaN greatest; parquet stats exclude it) — both
      * bail.
      */
    def exactTagFor(dt: DataType): Option[Char] = dt match {
      case ByteType | ShortType | IntegerType | LongType => Some('i')
      case DateType => Some('d')
      case TimestampType => Some('t')
      case BooleanType => Some('b')
      case _ => None
    }

    def decode(tag: Char, dt: DataType, v: String): Any = dt match {
      case ByteType => v.toByte
      case ShortType => v.toShort
      case IntegerType | DateType => v.toInt
      case LongType | TimestampType => v.toLong
      case BooleanType => v.toBoolean
      case _ => throw new IllegalStateException(s"unreachable: $tag/$dt")
    }

    /** One output row's values over `groupEntries` — the whole selected
      * set for a global aggregate, ONE entry for a GROUP BY partCol
      * group (`groupPart` = its exact key). None the moment any
      * expression is not exactly answerable.
      */
    def rowFor(groupEntries: Seq[ManifestEntry],
        groupPart: Option[String]): Option[Seq[Any]] = {
      val files = groupEntries.flatMap(_.allStats)
      val totalRows = files.map(_.rowCount).sum

      def colStats(name: String): Option[Seq[(Long, ColStat)]] = {
        val per = files.map { f =>
          f.cols.find(_.col == name).map(c => f.rowCount -> c)
        }
        if (per.exists(_.isEmpty)) None else Some(per.flatten)
      }

      def nonNullCount(a: AttributeReference): Option[Long] =
        if (isPartCol(a.name)) Some(totalRows) // partition values are never null
        else colStats(a.name).flatMap { cs =>
          if (cs.exists(_._2.nullCount < 0)) None
          else Some(cs.map { case (rc, c) => rc - c.nullCount }.sum)
        }

      /** min (asc=true) or max over the recorded envelopes; Some(null)
        * is SQL's answer for zero contributing rows.
        */
      def extremum(a: AttributeReference, asc: Boolean): Option[Any] =
        if (isPartCol(a.name)) groupPart match {
          case Some(p) => Some(idx.partValueInternal(p)) // within a group the key IS the extremum
          case None =>
            // entry keys are exact partition values; only entries with
            // live rows contribute (a schema-only empty file holds none)
            val live = groupEntries.filter(_.allStats.map(_.rowCount).sum > 0).map(_.part)
            if (live.isEmpty) Some(null)
            else {
              val ord: Ordering[String] = idx.partType match {
                case StringType =>
                  Ordering.fromLessThan((a, b) => ParquetStats.cmpUtf8(a, b) < 0)
                case _ => Ordering.by((s: String) =>
                  idx.partType match {
                    case IntegerType => s.toInt.toLong
                    case LongType => s.toLong
                    case _ => java.time.LocalDate.parse(s).toEpochDay
                  })
              }
              Some(idx.partValueInternal(if (asc) live.min(ord) else live.max(ord)))
            }
        } else exactTagFor(a.dataType).flatMap { tag =>
          colStats(a.name).flatMap { cs =>
            val contributing = cs.filter { case (rc, c) =>
              rc > 0 && !(c.nullCount == rc) // skip empty and provably-all-null
            }
            if (contributing.exists { case (_, c) =>
              c.tag != tag || c.min.isEmpty || c.max.isEmpty }) None
            else if (contributing.isEmpty) Some(null)
            else {
              val bounds = contributing.map { case (_, c) =>
                if (asc) c.min.get else c.max.get }
              val best = bounds.reduce((x, y) =>
                if (ParquetStats.cmp(tag, x, y) < 0 == asc) x else y)
              Some(decode(tag, a.dataType, best))
            }
          }
        }

      val values = aggExprs.map {
        // the grouping column itself (bare or aliased) in the output
        case a: AttributeReference if groupPart.isDefined && isPartCol(a.name) =>
          idx.partValueInternal(groupPart.get)
        case Alias(a: AttributeReference, _) if groupPart.isDefined && isPartCol(a.name) =>
          idx.partValueInternal(groupPart.get)
        case Alias(ae: AggregateExpression, _)
            if !ae.isDistinct && ae.filter.isEmpty =>
          ae.aggregateFunction match {
            case Count(Seq(l: Literal)) if l.value != null => totalRows
            case Count(Seq(a: AttributeReference)) =>
              nonNullCount(a).getOrElse(return None)
            case Min(a: AttributeReference) => extremum(a, asc = true).getOrElse(return None)
            case Max(a: AttributeReference) => extremum(a, asc = false).getOrElse(return None)
            case _ => return None
          }
        case _ => return None
      }
      Some(values)
    }

    if (!grouped)
      rowFor(entries, None).map(vs =>
        LocalRelation(agg.output, Seq(InternalRow.fromSeq(vs))))
    else {
      // one row per entry with live rows — an all-empty (schema-only)
      // partition produces NO group, exactly like the scan
      val live = entries.filter(_.allStats.map(_.rowCount).sum > 0)
      val rows = live.map(e => rowFor(Seq(e), Some(e.part)).getOrElse(return None))
      Some(LocalRelation(agg.output, rows.map(InternalRow.fromSeq)))
    }
  }
}

/** Session registration for the metadata-aggregate rule (same live
  * hook discipline as [[TopKWindowRewriteRule]]).
  */
object ManifestMetadataAgg {
  def ensure(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(ManifestMetadataAggRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ManifestMetadataAggRule
}
