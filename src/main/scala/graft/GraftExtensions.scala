package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{GeoFunctions, TableFunctions, TextFunctions}

/** Spark session extension entry point: makes every graft SQL
  * function (st_* geometry suite) available cluster-wide without any
  * driver-side register() call:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Registration goes through the injected-function hook, so the
  * functions exist in every session derived from the extended
  * builder — the deployment shape a shared 1000-executor cluster
  * needs (no per-notebook setup).
  *
  * NOTE on architecture (SURVEY.md §3): the engine deliberately has no
  * custom LogicalPlan/Strategy — every operator composes Catalyst
  * built-ins plus narrow extensions (these functions, the codegen'd
  * native expressions, and ONE expression-level optimizer rule,
  * [[org.apache.spark.sql.graftext.LevenshteinThresholdRule]]),
  * which keeps the whole surface inside the optimizer's reach.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GeoFunctions.injectInto(ext)
    TextFunctions.injectInto(ext)
    // the table layer's SQL surface: graft_table / graft_changes /
    // graft_history table-valued functions (builders return the SAME
    // logical plans the Scala API builds — still no custom plan node)
    TableFunctions.injectInto(ext)
    // expression-level optimizer rule (no new plan nodes — the §3
    // stance holds): naive levenshtein bounds get the banded
    // early-exit threshold form automatically
    ext.injectOptimizerRule(_ =>
      org.apache.spark.sql.graftext.LevenshteinThresholdRule)
    // SQL MERGE INTO: the resolved MergeIntoTable over a GraftTable
    // becomes a runnable command over the engine (the Delta
    // PreprocessTableMerge shape). MUST run BEFORE GraftRelationRule —
    // the relation swap would erase the GraftTable marker from the
    // merge target (post-hoc rules run in injection order)
    ext.injectPostHocResolutionRule(session =>
      graft.sources.GraftMergeRule(session))
    // the maintenance SQL statements (OPTIMIZE / VACUUM / DESCRIBE
    // HISTORY — the Delta DeltaSqlParser shape): one regex probe per
    // statement, everything else delegates to Spark's own grammar
    ext.injectParser((_, delegate) =>
      new graft.sources.GraftSqlParser(delegate))
    // the NAMED-table surface (format("graft") / GraftCatalog —
    // Delta's deployment shape): resolved V2 relations over
    // GraftTable swap to the SAME manifest-statistics V1 plans the
    // Scala API builds (skipping, DV filtering, rename mapping and
    // broadcast-off-manifest-stats included)
    ext.injectPostHocResolutionRule(session =>
      graft.sources.GraftRelationRule(session))
  }
}
