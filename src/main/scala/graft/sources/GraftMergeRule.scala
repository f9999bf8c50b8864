package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.operators.MergeInto

/** SQL `MERGE INTO` over a graft table — the analysis-time half:
  * Spark's analyzer fully resolves a [[MergeIntoTable]] (stars
  * expanded to per-column assignments by name, conditions typed)
  * regardless of the target's capabilities, but EXECUTES it only for
  * SupportsRowLevelOperations tables; everything else dies in
  * CheckAnalysis. This rule intercepts the resolved statement in the
  * post-hoc window — the public Delta shape (Delta's
  * PreprocessTableMerge → MergeIntoCommand does exactly this) — and
  * replaces it with a runnable command over the engine
  * ([[graft.operators.MergeInto]]).
  *
  * MUST be injected BEFORE [[GraftRelationRule]]: the relation rule
  * rewrites every graft V2 relation to the manifest V1 plan, which
  * would erase the GraftTable marker from the merge TARGET. The
  * SOURCE side gets that same rewrite here explicitly (the command is
  * a leaf — later rules never descend into it). */
case class GraftMergeRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable if m.resolved =>
      unwrapGraft(m.targetTable) match {
        case Some(t) => convert(m, t)
        case None => plan
      }
    // SQL UPDATE — same interception window, same engine family: a
    // file-granular copy-on-write through MergeInto.update
    case u: UpdateTable if u.resolved =>
      unwrapGraft(u.table) match {
        case Some(t) =>
          require(t.versionAsOf.isEmpty,
            "cannot UPDATE a time-travel (versionAsOf) read")
          u.condition.foreach(c => require(
            c.find(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]).isEmpty,
            "UPDATE with a subquery condition is not supported — " +
              "materialize the subquery and use the MERGE upsert shape, " +
              "or the Scala APIs"))
          val targetCols = u.table.output.map(_.name).toSet
          val assigns = u.assignments.map { a =>
            a.key match {
              case k: AttributeReference if targetCols(k.name) =>
                k.name -> a.value
              case other => throw new UnsupportedOperationException(
                s"UPDATE assignment to $other is not supported — " +
                  "top-level columns only")
            }
          }.toMap
          GraftUpdateCommand(t.dir, u.table.output, u.condition, assigns)
        case None => plan
      }
    case _ => plan
  }

  private def unwrapGraft(p: LogicalPlan): Option[GraftTable] = p match {
    case s: SubqueryAlias => unwrapGraft(s.child)
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
      Some(r.table.asInstanceOf[GraftTable])
    case _ => None
  }

  private def convert(m: MergeIntoTable, t: GraftTable): LogicalPlan = {
    require(t.versionAsOf.isEmpty,
      "cannot MERGE INTO a time-travel (versionAsOf) read")
    // WITH SCHEMA EVOLUTION: by the time this post-hoc rule sees the
    // statement, ResolveMergeIntoSchemaEvolution has already widened
    // the TABLE through the catalog (AUTOMATIC_SCHEMA_EVOLUTION ->
    // alterTable AddColumn/UpdateColumnType -> Snapshots.evolveSchema)
    // and re-resolved the target relation against the new schema —
    // nothing left to do here; assignments to columns that STILL
    // don't exist (no catalog ident to evolve through) fail below.
    require(m.mergeCondition.find(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]).isEmpty,
      "MERGE with a subquery in the ON condition is not supported — " +
        "materialize it into the USING source instead")
    val targetCols = m.targetTable.output.map(_.name).toSet
    def assignMap(as: Seq[Assignment]): Map[String, Expression] =
      as.map { a =>
        a.key match {
          case k: AttributeReference if targetCols(k.name) => k.name -> a.value
          case k: AttributeReference => throw new UnsupportedOperationException(
            s"MERGE assignment targets unknown column ${k.name} — the " +
              "target schema is fixed (no schema evolution through MERGE)")
          case other => throw new UnsupportedOperationException(
            s"MERGE assignment to $other is not supported — top-level " +
              "columns only (no nested-field assignment)")
        }
      }.toMap
    def toAct(a: MergeAction): MergeInto.Act = a match {
      case UpdateAction(c, as, _) =>
        MergeInto.Act(c, MergeInto.Update, assignMap(as))
      case DeleteAction(c) => MergeInto.Act(c, MergeInto.Delete, Map.empty)
      case InsertAction(c, as) =>
        MergeInto.Act(c, MergeInto.Insert, assignMap(as))
      case other => throw new UnsupportedOperationException(
        s"unsupported MERGE action ${other.getClass.getSimpleName}")
    }
    GraftMergeCommand(t.dir, m.targetTable.output,
      GraftRelationRule(spark).apply(m.sourceTable), m.mergeCondition,
      m.matchedActions.map(toAct), m.notMatchedActions.map(toAct),
      m.notMatchedBySourceActions.map(toAct))
  }
}

/** The runnable MERGE: everything is already resolved (the engine
  * re-binds the table read onto `targetOutput`'s attribute ids), so
  * this is a leaf to the analyzer/optimizer — the inner plans show up
  * in EXPLAIN via innerChildren only. */
case class GraftMergeCommand(
    dir: String,
    targetOutput: Seq[Attribute],
    source: LogicalPlan,
    condition: Expression,
    matched: Seq[MergeInto.Act],
    notMatched: Seq[MergeInto.Act],
    notMatchedBySource: Seq[MergeInto.Act]) extends LeafRunnableCommand {

  override def innerChildren: Seq[QueryPlan[_]] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    MergeInto.run(spark, dir, targetOutput, source, condition,
      matched, notMatched, notMatchedBySource)
    Nil
  }
}

/** The runnable UPDATE (see [[GraftMergeRule]]'s UpdateTable case). */
case class GraftUpdateCommand(
    dir: String,
    targetOutput: Seq[Attribute],
    condition: Option[Expression],
    assigns: Map[String, Expression]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    MergeInto.update(spark, dir, targetOutput, condition, assigns)
    Nil
  }
}
