package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Snapshots

/** The TABLE-VALUED SQL surface over the snapshot format — the piece
  * that puts the table layer where a 100 TB engine's users actually
  * live (SQL notebooks), without any custom parser or plan node:
  * Spark's own `injectTableFunction` hook binds a name to a
  * LogicalPlan builder, and the plans these build are exactly the
  * Scala API's (the manifest-statistics relation, DV-filtered,
  * rename-mapped — one code path, two surfaces):
  *
  *  - `graft_table('/dir')` — the table's latest version;
  *  - `graft_table('/dir', v)` — TIME TRAVEL to version v;
  *  - `graft_changes('/dir', vOld, vNew)` — the row-level change feed
  *    between two versions ([[Snapshots.diff]] semantics: exact
  *    multiset, `_change` ∈ insert/delete, deletion-vector deltas
  *    included);
  *  - `graft_history('/dir')` — one row per committed version with
  *    manifest-only metrics (ts — the commit wall time behind
  *    TIMESTAMP AS OF — files, rows, bytes, dead_rows, batch) — the
  *    DESCRIBE HISTORY shape, zero data opens (also reachable as the
  *    `DESCRIBE HISTORY` statement on named tables —
  *    [[graft.sources.GraftSqlParser]]).
  *
  * Arguments must be literals (they select the TABLE — there is no
  * row context yet when a FROM-clause relation resolves). Deployment
  * is the same `spark.sql.extensions=graft.GraftExtensions` conf as
  * the scalar suite.
  */
object TableFunctions {

  private def litOf(e: Expression, what: String): Any = {
    require(e.foldable,
      s"$what must be a literal (table-valued arguments select the table)")
    e.eval(null)
  }

  private def strArg(e: Expression, what: String): String =
    litOf(e, what) match {
      case u: UTF8String => u.toString
      case other => throw new IllegalArgumentException(
        s"$what must be a string literal, got: $other")
    }

  private def longArg(e: Expression, what: String): Long =
    litOf(e, what) match {
      case i: java.lang.Integer => i.longValue
      case l: java.lang.Long => l.longValue
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got: $other")
    }

  private def plan(df: DataFrame): LogicalPlan = df.queryExecution.logical

  /** The `graft_history` frame: manifest-only, one row per committed
    * version — rows is null for stats-less versions, dead_rows counts
    * deletion-vector positions, batch is the exactly-once ledger id
    * (carried headers included). */
  private[graft] def history(spark: SparkSession, dir: String): DataFrame = {
    val data = Snapshots.versions(spark, dir).map { v =>
      val files = Snapshots.files(spark, dir, v)
      (v,
        Snapshots.commitTsAt(spark, dir, v) // the #ts line (r13; null
          .map(java.lang.Long.valueOf).orNull, // for pre-stamp history)
        files.size.toLong,
        Snapshots.rowCountAt(spark, dir, v)
          .map(java.lang.Long.valueOf).orNull,
        Snapshots.sizeAt(spark, dir, v),
        Snapshots.deadRowsAt(spark, dir, v), // line-carried: no sidecar opens
        Snapshots.batchAt(spark, dir, v)
          .map(java.lang.Long.valueOf).orNull)
    }
    import spark.implicits._
    data.toDF("version", "ts", "files", "rows", "bytes", "dead_rows", "batch")
  }

  private def fn(name: String, usage: String,
                 builder: Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier(name),
    new ExpressionInfo("graft.functions.TableFunctions", null, name, usage,
      ""),
    builder)

  private def builders: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] = Seq(
    fn("graft_table",
      "graft_table(dir[, version]) - reads a graft snapshot table " +
        "(latest, or time travel to `version`)",
      args => {
        val spark = SparkSession.active
        args match {
          case Seq(d) => plan(Snapshots.read(spark, strArg(d, "dir")))
          case Seq(d, v) => plan(Snapshots.readAt(spark, strArg(d, "dir"),
            longArg(v, "version")))
          case _ => throw new IllegalArgumentException(
            "graft_table takes (dir) or (dir, version)")
        }
      }),
    fn("graft_changes",
      "graft_changes(dir, vOld, vNew) - row-level changes between two " +
        "versions (_change = insert/delete, exact multiset)",
      args => {
        val spark = SparkSession.active
        args match {
          case Seq(d, a, b) => plan(Snapshots.diff(spark, strArg(d, "dir"),
            longArg(a, "vOld"), longArg(b, "vNew")))
          case _ => throw new IllegalArgumentException(
            "graft_changes takes (dir, vOld, vNew)")
        }
      }),
    fn("graft_history",
      "graft_history(dir) - one row per committed version with " +
        "manifest-only metrics (files, rows, bytes, dead_rows, batch)",
      args => {
        val spark = SparkSession.active
        args match {
          case Seq(d) => plan(history(spark, strArg(d, "dir")))
          case _ => throw new IllegalArgumentException(
            "graft_history takes (dir)")
        }
      }))

  def injectInto(ext: SparkSessionExtensions): Unit =
    builders.foreach(ext.injectTableFunction)

  /** Late-bind into an existing session (the specs' path — one
    * SparkContext per JVM; withExtensions is verified standalone by
    * tools.ExtCheck). */
  def registerBuilders(spark: SparkSession): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    builders.foreach { case (id, info, b) =>
      cs.sessionState.tableFunctionRegistry.registerFunction(id, info, b)
    }
  }
}
