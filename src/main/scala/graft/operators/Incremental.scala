package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental rollup maintenance — the materialized-view update
  * step a warehouse runs per ingest batch (beyond-reference, SURVEY
  * §2.F warehouse analytics): keep per-key PARTIAL STATES
  * (count / exact decimal sum / min / max / HLL NDV sketch), and on
  * each new batch merge states instead of recomputing the world.
  * Every surface is a commutative monoid — counts and sums add,
  * min/max fold, HLL sketches union — so merge order and batch
  * boundaries cannot change the result; that identity (merged over
  * any split == one-shot recompute) is exactly what q147 gates and
  * IncrementalSpec property-tests.
  *
  * The NDV leg is the honest part: exact distinct counts do NOT
  * merge from partials (that impossibility is why sketches exist),
  * so the maintained state carries a Datasketches HLL sketch
  * (Spark's hll_sketch_agg / hll_union_agg) whose estimate lands
  * under the q131 envelope discipline — exact NDV hash-gated from a
  * full recompute, the sketch as an ndv_ok boolean.
  *
  * Scale shape: each batch's state is one partial-agg shuffle over
  * THAT BATCH only; the merge shuffles state rows (keys × batches —
  * rollup-sized, not corpus-sized). A 100 TB table maintained daily
  * never rescans history; that is the operator's entire point.
  */
object Incremental {

  /** One batch's partial rollup state per key. */
  def rollupState(df: DataFrame, keyCols: Seq[String], valCol: String,
                  ndvCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n_rows"),
      sum(col(valCol).cast(DecimalType(18, 6))).as("sum_v"),
      min(col(valCol)).as("min_v"),
      max(col(valCol)).as("max_v"),
      hll_sketch_agg(col(ndvCol)).as("ndv_sketch"))

  /** Merge partial states (any count, any order) into the rollup a
    * full recompute would produce, with the sketch collapsed to its
    * estimate. */
  def mergeStates(parts: Seq[DataFrame], keyCols: Seq[String]): DataFrame = {
    require(parts.nonEmpty, "mergeStates: need at least one partial state")
    parts.reduce(_.unionByName(_))
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"),
        hll_sketch_estimate(hll_union_agg(col("ndv_sketch"))).as("ndv_est"))
  }
}
