package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Streaming incremental rollup — the unbounded counterpart of
  * [[graft.operators.Incremental]] (q147): Spark's stateful
  * streaming aggregation IS the state-merge loop, run by the engine
  * per micro-batch instead of by an orchestrated job per ingest
  * batch. Each key's state carries exactly q147's surfaces — count,
  * exact decimal sum, min, max, and an approximate-distinct estimate
  * (HLL++ here: the streaming aggregate needs a MERGEABLE internal
  * state, which approx_count_distinct's is) — and the spec
  * reconciles the fully-drained stream against the one-shot batch
  * recompute on every exact surface, with the NDV under the q131
  * envelope.
  *
  * State bound: one row of a few longs + one sketch per GROUP KEY
  * (event types here) — rollup-sized, not corpus-sized; no watermark
  * is needed because keys are low-cardinality dimensions, the same
  * reason a batch rollup table is small. For unbounded key spaces
  * (per-user rollups) add event-time bucketing to the key and a
  * watermark — the q60 window discipline.
  */
object RollupStream {

  /** Works on batch AND streaming frames (the slidingAgg pattern):
    * the spec runs it both ways and reconciles. */
  def rollup(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_v"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"),
        approx_count_distinct(col("user_id")).as("ndv_est"))
}
