package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints — the Deequ-style validation
  * suite (public AWS research: "Automating Large-Scale Data Quality
  * Verification", Schelter et al. VLDB 2018) a warehouse runs
  * against every ingest batch before publishing it. Beyond-reference
  * component: SURVEY §2.F's ops/versioning family (checksums q118,
  * snapshot diff q120, profiler q111) gains the GATE that decides
  * whether a batch ships at all.
  *
  * Every constraint reduces to an exact integer VIOLATION COUNT
  * (null rows for NotNull, non-null duplicates for Unique,
  * out-of-bound non-nulls for InRange, out-of-set non-nulls for
  * OneOf — null handling pinned per constraint, spec'd), so the
  * whole report is oracle-replayable; `passed` = violations == 0.
  *
  * Scale shape (the Deequ discipline): ALL constraints evaluate in
  * ONE aggregate over ONE scan — each contributes one or two agg
  * expressions to a single wide row, exploded to the report shape
  * afterwards (the q111 profiler pattern). A 100 TB batch pays one
  * pass regardless of how many constraints the suite carries;
  * count-distinct for Unique is the only Expand-shaped term and
  * rides the same pass.
  */
object Constraints {

  sealed trait Constraint {
    def column: String
    def label: String
  }
  /** Violated by NULL rows. */
  case class NotNull(column: String) extends Constraint {
    val label = s"not_null:$column"
  }
  /** Violated by non-null values occurring more than once (each extra
    * occurrence counts — violations = count(col) − countDistinct(col)). */
  case class Unique(column: String) extends Constraint {
    val label = s"unique:$column"
  }
  /** Violated by non-null values outside [lo, hi] (nulls are
    * NotNull's business). */
  case class InRange(column: String, lo: Double, hi: Double) extends Constraint {
    val label = s"in_range:$column"
  }
  /** Violated by non-null values outside the allowed set. */
  case class OneOf(column: String, values: Seq[String]) extends Constraint {
    val label = s"one_of:$column"
  }

  private def violationExpr(c: Constraint): Column = c match {
    case NotNull(col0) =>
      sum(when(col(col0).isNull, 1L).otherwise(0L))
    case Unique(col0) =>
      count(col(col0)) - countDistinct(col(col0))
    case InRange(col0, lo, hi) =>
      sum(when(col(col0).isNotNull &&
        (col(col0) < lit(lo) || col(col0) > lit(hi)), 1L).otherwise(0L))
    case OneOf(col0, values) =>
      sum(when(col(col0).isNotNull && !col(col0).isin(values: _*), 1L)
        .otherwise(0L))
  }

  /** Evaluate the suite in one pass.
    * @return (constraint, column_name, violations, n_rows, passed),
    *         one row per constraint, violations exact integers */
  def check(df: DataFrame, cs: Seq[Constraint]): DataFrame = {
    require(cs.nonEmpty, "constraint suite must be non-empty")
    require(cs.map(_.label).distinct.size == cs.size,
      s"duplicate constraint labels: ${cs.map(_.label)}")
    val aggExprs = count(lit(1)).as("__n") +:
      cs.zipWithIndex.map { case (c, i) =>
        coalesce(violationExpr(c), lit(0L)).as(s"__v$i")
      }
    val wide = df.agg(aggExprs.head, aggExprs.tail: _*)
    wide.select(explode(array(cs.zipWithIndex.map { case (c, i) =>
        struct(
          lit(c.label).as("constraint"),
          lit(c.column).as("column_name"),
          col(s"__v$i").as("violations"),
          col("__n").as("n_rows"),
          (col(s"__v$i") === 0L).as("passed"))
      }: _*)).as("r"))
      .select(col("r.*"))
  }

  /** Referential-integrity constraint — the CROSS-TABLE member the
    * single-pass suite structurally can't express: violations =
    * non-null values of `column` absent from the reference column
    * (null references in the target are ignored, matching the SQL
    * `NOT IN (... WHERE ref IS NOT NULL)` reading — a null can't
    * vouch for anything). One left join against the DISTINCT
    * reference key set (broadcast when the key set allows,
    * co-partitioned shuffle at scale — either way the fact table
    * moves at most once) folded straight into the report row. Same
    * output shape as [[check]], so reports union. */
  def checkRef(df: DataFrame, column: String, ref: DataFrame,
               refColumn: String): DataFrame = {
    val r = ref.select(col(refColumn).as("__r"))
      .filter(col("__r").isNotNull).distinct()
    df.select(col(column).as("__v"))
      .join(r, col("__v") === col("__r"), "left")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__v").isNotNull && col("__r").isNull, 1L)
          .otherwise(0L)).as("__viol"))
      .select(
        lit(s"ref:$column->$refColumn").as("constraint"),
        lit(column).as("column_name"),
        coalesce(col("__viol"), lit(0L)).as("violations"),
        col("__n").as("n_rows"),
        (coalesce(col("__viol"), lit(0L)) === 0L).as("passed"))
  }
}
