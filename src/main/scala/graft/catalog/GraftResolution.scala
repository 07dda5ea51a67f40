package graft.catalog

import graft.core.ManifestMerge
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, ExprId, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.Bridge

/** The analyzer glue that makes [[GraftCatalog]] tables first-class SQL
  * objects (round-18 verdict task 1) — injected by
  * [[graft.functions.GraftExtensions]] as a resolution rule, the same
  * architecture Delta's extension uses:
  *
  *  - '''Reads''': `DataSourceV2Relation(GraftTable)` is replaced by
  *    the SINGLE-SCAN v1 plan ([[graft.core.ManifestFileIndex]]) under
  *    a projection that preserves the relation's attribute ids — so
  *    everything already referencing those attributes keeps resolving,
  *    and the planned query carries the exact pushdown / partition
  *    pruning / manifest skipping / metadata-aggregate behavior of the
  *    path-based surface (PlanQualitySpec-asserted). An EMPTY table
  *    (freshly created) reads as a zero-row local relation with the
  *    declared schema.
  *  - '''MERGE INTO''': a resolved [[MergeIntoTable]] whose target is
  *    a graft table is lowered onto the row-level
  *    [[graft.core.ManifestMerge]] engine. Supported shape (the
  *    reference's whole upsert surface, S28/S29/P11): equi-key ON
  *    conjunction, one unconditional matched action (UPDATE SET … /
  *    DELETE), one unconditional NOT MATCHED INSERT; WHEN NOT MATCHED
  *    BY SOURCE and per-action conditions are refused loudly (the
  *    path to them is condition pushdown into the engine, not silent
  *    approximation).
  *
  * Relations that are the TARGET of row-level commands (merge, delete,
  * update) stay v2 — the commands' own machinery (this rule's merge
  * lowering, [[GraftTable]]'s `SupportsDelete`) needs the table
  * identity; only read-side relations convert.
  */
final case class GraftResolution(spark: SparkSession) extends Rule[LogicalPlan] {

  private def graftRel(p: LogicalPlan): Option[DataSourceV2Relation] =
    p.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] => r
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // row-level-command targets keep their v2 identity (reference set,
    // rebuilt per pass — cheap: one traversal)
    val keep = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.foreach {
      case m: MergeIntoTable => graftRel(m.targetTable).foreach(keep.add(_): Unit)
      case d: DeleteFromTable => graftRel(d.table).foreach(keep.add(_): Unit)
      case u: UpdateTable => graftRel(u.table).foreach(keep.add(_): Unit)
      case _ => ()
    }
    plan.resolveOperatorsUp {
      case m: MergeIntoTable if m.resolved && graftRel(m.targetTable).isDefined =>
        lowerMerge(m)
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftTable] && !keep.contains(r) =>
        convertRead(r)
    }
  }

  /** The v2 relation as the v1 single-scan plan, output ids preserved. */
  private def convertRead(r: DataSourceV2Relation): LogicalPlan = {
    val t = r.table.asInstanceOf[GraftTable]
    t.readFrame match {
      case None => LocalRelation(r.output)
      case Some(df) =>
        val v1 = df.queryExecution.analyzed
        val byName = v1.output.map(a => a.name -> a).toMap
        val projections: Seq[NamedExpression] = r.output.map { o =>
          val src = byName.getOrElse(o.name, throw new IllegalStateException(
            s"${t.name()}: catalog schema column '${o.name}' missing from the " +
              s"manifest scan (${v1.output.map(_.name).mkString(", ")})"))
          Alias(src, o.name)(exprId = o.exprId, qualifier = o.qualifier,
            explicitMetadata = Some(o.metadata))
        }
        Project(projections, v1)
    }
  }

  private def fail(msg: String): Nothing =
    throw new UnsupportedOperationException(s"graft MERGE INTO: $msg")

  private def lowerMerge(m: MergeIntoTable): LogicalPlan = {
    val rel = graftRel(m.targetTable).get
    val t = rel.table.asInstanceOf[GraftTable]
    require(t.asOf.isEmpty, s"${t.name()}: cannot MERGE into a time-travel snapshot")
    if (m.notMatchedBySourceActions.nonEmpty)
      fail("WHEN NOT MATCHED BY SOURCE is not supported — express it as a " +
        "second MERGE or a partition rewrite")
    if (m.withSchemaEvolution) fail("WITH SCHEMA EVOLUTION is not supported")

    val tgtIds: Set[ExprId] = m.targetTable.outputSet.map(_.exprId).toSet
    val srcIds: Set[ExprId] = m.sourceTable.outputSet.map(_.exprId).toSet
    val resolver = spark.sessionState.conf.resolver

    // ---- ON: a conjunction of same-named target/source equi-keys
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    val keys: Seq[String] = conjuncts(m.mergeCondition).map {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        val pair =
          if (tgtIds.contains(a.exprId) && srcIds.contains(b.exprId)) Some((a, b))
          else if (tgtIds.contains(b.exprId) && srcIds.contains(a.exprId)) Some((b, a))
          else None
        val (ta, sa) = pair.getOrElse(
          fail(s"ON clause term $a = $b must compare a target column to a source column"))
        if (!resolver(ta.name, sa.name))
          fail(s"ON keys must share a column name (the merge engine joins by name); " +
            s"got target '${ta.name}' = source '${sa.name}' — alias the source column")
        ta.name
      case other =>
        fail(s"ON clause must be a conjunction of target.k = source.k equalities, got $other")
    }

    // ---- matched action (≤1, unconditional)
    if (m.matchedActions.size > 1)
      fail("at most one WHEN MATCHED action is supported")
    var deleteMatched = false
    var updateSets = Map.empty[String, Expression]
    m.matchedActions.headOption.foreach {
      case d: DeleteAction =>
        if (d.condition.isDefined) fail("conditional WHEN MATCHED AND … is not supported")
        deleteMatched = true
      case u: UpdateAction =>
        if (u.condition.isDefined) fail("conditional WHEN MATCHED AND … is not supported")
        u.assignments.foreach { a =>
          val name = a.key match {
            case attr: AttributeReference => attr.name
            case k => fail(s"UPDATE SET target $k must be a top-level column")
          }
          // identity assignments guaranteed by the ON equality are
          // dropped (the UPDATE SET * expansion assigns keys too);
          // anything else touching a key or the partition column is a
          // row-identity/location change a file-local rewrite cannot do
          val identityFromSource = a.value match {
            case v: AttributeReference =>
              srcIds.contains(v.exprId) && resolver(v.name, name)
            case _ => false
          }
          val selfAssign = a.value match {
            case v: AttributeReference =>
              tgtIds.contains(v.exprId) && resolver(v.name, name)
            case _ => false
          }
          val isKey = keys.exists(resolver(_, name))
          if (selfAssign || (isKey && identityFromSource)) ()
          else if (isKey)
            fail(s"UPDATE may not reassign key column '$name'")
          else if (resolver(name, t.partCol) && !(identityFromSource && isKey))
            fail(s"UPDATE may not reassign the partition column '$name' (a row cannot " +
              "move partitions in a file-local rewrite) — include it in the ON keys " +
              "or drop it from SET")
          else updateSets += name -> a.value
        }
      case other => fail(s"unsupported WHEN MATCHED action $other")
    }

    // ---- not-matched insert (≤1, unconditional)
    if (m.notMatchedActions.size > 1)
      fail("at most one WHEN NOT MATCHED action is supported")
    val insertSets: Option[Map[String, Expression]] =
      m.notMatchedActions.headOption.map {
        case i: InsertAction =>
          if (i.condition.isDefined)
            fail("conditional WHEN NOT MATCHED AND … is not supported")
          i.assignments.map { a =>
            val name = a.key match {
              case attr: AttributeReference => attr.name
              case k => fail(s"INSERT target $k must be a top-level column")
            }
            val badRefs = a.value.references.filter(ref => tgtIds.contains(ref.exprId))
            if (badRefs.nonEmpty)
              fail(s"INSERT VALUES for '$name' references target columns " +
                s"(${badRefs.map(_.name).mkString(", ")}) — NOT MATCHED rows have no target")
            name -> a.value
          }.toMap
        case other => fail(s"unsupported WHEN NOT MATCHED action $other")
      }

    GraftMergeIntoCommand(t.root, t.partCol, keys, m.sourceTable,
      updateSets, deleteMatched, insertSets, srcIds, tgtIds)
  }
}

/** The lowered MERGE as a runnable command: executes
  * [[graft.core.ManifestMerge]] with the SQL actions' expressions
  * rebound — at run time, by name — onto the engine's pinned source /
  * touched-target frames.
  */
final case class GraftMergeIntoCommand(
    root: String,
    partCol: String,
    keys: Seq[String],
    source: LogicalPlan,
    updateSets: Map[String, Expression],
    deleteMatched: Boolean,
    insertSets: Option[Map[String, Expression]],
    srcIds: Set[ExprId],
    tgtIds: Set[ExprId],
) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val srcDf = Bridge.ofRows(session, source)
    def rebind2(e: Expression): (DataFrame, DataFrame) => Column = (s, t) =>
      Bridge.column(e.transform {
        case a: AttributeReference if srcIds.contains(a.exprId) =>
          Bridge.expression(s.col(a.name))
        case a: AttributeReference if tgtIds.contains(a.exprId) =>
          Bridge.expression(t.col(a.name))
      })
    def rebind1(e: Expression): DataFrame => Column = s =>
      Bridge.column(e.transform {
        case a: AttributeReference if srcIds.contains(a.exprId) =>
          Bridge.expression(s.col(a.name))
      })
    var merge = ManifestMerge(root, keys, partCol)
    if (deleteMatched) merge = merge.whenMatchedDelete()
    else if (updateSets.nonEmpty)
      merge = merge.whenMatchedUpdate(updateSets.map { case (c, e) => c -> rebind2(e) })
    insertSets.foreach(is =>
      merge = merge.whenNotMatchedInsert(is.map { case (c, e) => c -> rebind1(e) }))
    merge.run(srcDf): Unit
    Seq.empty
  }
}
