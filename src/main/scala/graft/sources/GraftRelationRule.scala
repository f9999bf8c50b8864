package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan, Project, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.operators.NamedTables

/** The resolution rule that makes NAMED graft reads plan as the
  * Scala API's plans (the analysis-time half of the public Delta
  * pattern — Delta swaps its V2 relation for the TahoeFileIndex V1
  * relation the same way): every resolved
  * [[DataSourceV2Relation]] over a [[GraftTable]] is replaced by the
  * layout-dispatched manifest read ([[NamedTables.readNamed]] — the
  * statistics-bearing HadoopFsRelation with data skipping, DV
  * filtering and rename mapping), aliased back onto the relation's
  * own output attribute ids so nothing downstream re-resolves.
  *
  * WRITE commands keep their relation: `INSERT INTO` needs the V2
  * relation as its target (the V1 write fallback runs through
  * [[GraftTable.newWriteBuilder]]) — only the QUERY side of a write
  * is rewritten, so `INSERT INTO t SELECT ... FROM t2` reads t2
  * through the manifest relation while t stays the write target.
  *
  * Still no custom plan node (the SURVEY §3 stance): the rewrite
  * emits a plain Project over the same LogicalRelation every Scala
  * read builds — Catalyst's optimizer sees ordinary relations with
  * real statistics (a named fact⋈dim join broadcasts off the
  * manifest byte sum with no hint).
  */
case class GraftRelationRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case w: V2WriteCommand =>
      val nq = apply(w.query)
      if (nq eq w.query) w else w.withNewQuery(nq)
    // DELETE FROM keeps its V2 relation too (not a V2WriteCommand —
    // it is its own UnaryCommand): the SupportsDelete planning needs
    // the table node intact
    case d: DeleteFromTable => d
    case _ => plan.resolveOperators {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        val t = r.table.asInstanceOf[GraftTable]
        val read = NamedTables.readNamed(spark, t.dir, t.versionAsOf)
        val child = read.queryExecution.analyzed
        val byName = child.output.map(a => a.name -> a).toMap
        Project(r.output.map { o =>
          val a = byName.getOrElse(o.name, throw new IllegalStateException(
            s"graft table ${t.dir} read surface lost column ${o.name} — " +
              "was the table rewritten under this query?"))
          Alias(a, o.name)(exprId = o.exprId)
        }, child)
    }
  }
}
