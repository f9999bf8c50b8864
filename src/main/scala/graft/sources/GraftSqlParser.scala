package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType, StructType}

import graft.operators.{MaintenanceRunner, Snapshots}

/** The maintenance SQL statements — the administration half of the
  * catalog surface, in the public Delta shape (Delta's DeltaSqlParser
  * wraps the session parser the same way; `injectParser` chains it in
  * front of Spark's own grammar):
  *
  *  - `OPTIMIZE <table>` — layout-dispatched COMPACTION
  *    ([[graft.operators.MaintenanceRunner.compactOne]]: z / hash /
  *    width / flat, never guessed); a no-op when nothing is
  *    fragmented. Data rewrite only — never destructive.
  *  - `VACUUM <table> [RETAIN n VERSIONS]` — VERSION-retention
  *    vacuum ([[graft.operators.Snapshots.retentionVacuum]], the
  *    same arithmetic `prop:retainversions` maintenance runs,
  *    exactly-once-ledger clamp included). The format's ONE
  *    destructive operation, so there is no silent default: RETAIN
  *    must be given, or the table must carry a `retainversions`
  *    property. The concurrent-writer staged-file guard stays on
  *    (`spark.graft.vacuum.retainMs`, default 7 days — set 0 only
  *    under exclusive access, the [[Snapshots.vacuum]] contract).
  *  - `DESCRIBE HISTORY <table>` — one row per committed version
  *    with manifest-only metrics (the `graft_history` TVF frame:
  *    version, ts, files, rows, bytes, dead_rows, batch).
  *
  * Targets: a multipart identifier (`cat.db.t`, resolved through the
  * session's catalogs to a [[GraftTable]]) or a quoted path
  * (`VACUUM '/data/tbl'` — the Delta path shape). Everything that
  * does not match these three statements falls through to the
  * delegate VERBATIM — one regex probe per statement, zero cost on
  * the normal SQL path. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case VacuumRe(rawTarget, retain) =>
      GraftVacuumCommand(targetOf(rawTarget, delegate),
        Option(retain).map(_.toLong))
    case OptimizeRe(rawTarget) =>
      GraftOptimizeCommand(targetOf(rawTarget, delegate))
    case HistoryRe(rawTarget) =>
      GraftHistoryCommand(targetOf(rawTarget, delegate))
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  /** Anchored, case-insensitive statement shapes. The target is lazy
    * (`.+?`) so a trailing RETAIN clause never folds into it; a
    * trailing `;` is tolerated like Spark's own grammar does. */
  private val VacuumRe =
    """(?is)\s*VACUUM\s+(.+?)(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*;?\s*""".r
  private val OptimizeRe = """(?is)\s*OPTIMIZE\s+(.+?)\s*;?\s*""".r
  private val HistoryRe =
    """(?is)\s*DESC(?:RIBE)?\s+HISTORY\s+(.+?)\s*;?\s*""".r

  /** A quoted target is a PATH; anything else parses as a multipart
    * identifier through the delegate (backticks and all). */
  private def targetOf(raw: String, delegate: ParserInterface)
      : Either[String, Seq[String]] = {
    val t = raw.trim
    if (t.length >= 2 &&
        ((t.head == '\'' && t.last == '\'') ||
         (t.head == '"' && t.last == '"')))
      Left(t.substring(1, t.length - 1))
    else Right(delegate.parseMultipartIdentifier(t))
  }

  /** Conf key: the vacuum mtime guard for SQL VACUUM (ms a staged
    * file must have sat unreferenced before deletion — protects a
    * CONCURRENT writer's not-yet-committed files). */
  val VacuumRetainMsKey = "spark.graft.vacuum.retainMs"

  private[sources] def resolveDir(spark: SparkSession,
                                  target: Either[String, Seq[String]])
      : String = target match {
    case Left(path) => path
    case Right(parts) =>
      org.apache.spark.sql.graftext.CatalogBridge
        .loadTable(spark, parts) match {
        case g: GraftTable => g.dir
        case other => throw new UnsupportedOperationException(
          s"${parts.mkString(".")} is not a graft table (got " +
            s"${other.getClass.getSimpleName}) — OPTIMIZE / VACUUM / " +
            "DESCRIBE HISTORY apply to graft tables only")
      }
  }
}

/** `VACUUM t [RETAIN n VERSIONS]`: keep the newest n versions, drop
  * the rest and sweep their unreferenced files. Refuses without an
  * explicit or table-declared retention — destructive operations
  * never guess. */
case class GraftVacuumCommand(target: Either[String, Seq[String]],
                              retain: Option[Long])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("kept_from_version", LongType)(),
    AttributeReference("versions_dropped", LongType)(),
    AttributeReference("files_deleted", LongType)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.resolveDir(spark, target)
    val head = Snapshots.latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no snapshots"))
    val n = retain.orElse(
      Snapshots.propsAt(spark, dir, head).get("retainversions")
        .flatMap(s => scala.util.Try(s.toLong).toOption).filter(_ >= 1))
      .getOrElse(throw new IllegalArgumentException(
        "VACUUM needs an explicit RETAIN n VERSIONS clause or a " +
          "retainversions table property — the format's one destructive " +
          "operation never assumes a default retention"))
    val retainMs = spark.conf.getOption(GraftSqlParser.VacuumRetainMsKey)
      .map(_.toLong).getOrElse(Snapshots.DefaultRetainMs)
    val (from, dropped, deleted) =
      Snapshots.retentionVacuum(spark, dir, n, retainMs)
    Seq(Row(from.getOrElse(Snapshots.versions(spark, dir).head),
      dropped, deleted))
  }
}

/** `OPTIMIZE t`: the layout's own compaction, one commit when
  * anything was fragmented, a commit-free no-op otherwise. */
case class GraftOptimizeCommand(target: Either[String, Seq[String]])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("layout", StringType)(),
    AttributeReference("version_before", LongType)(),
    AttributeReference("version_after", LongType)(),
    AttributeReference("compacted", BooleanType)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.resolveDir(spark, target)
    val (layout, before, after) = MaintenanceRunner.compactOne(spark, dir)
    Seq(Row(layout, before, after, after != before))
  }
}

/** `DESCRIBE HISTORY t`: the `graft_history` frame as a statement —
  * identifier-addressed instead of path-addressed, same manifest-only
  * metrics. */
case class GraftHistoryCommand(target: Either[String, Seq[String]])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("ts", LongType)(),
    AttributeReference("files", LongType)(),
    AttributeReference("rows", LongType)(),
    AttributeReference("bytes", LongType)(),
    AttributeReference("dead_rows", LongType)(),
    AttributeReference("batch", LongType)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.resolveDir(spark, target)
    graft.functions.TableFunctions.history(spark, dir).collect().toSeq
  }
}
