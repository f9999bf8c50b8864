package graft

import org.apache.spark.sql.DataFrame

/** Plan hygiene helpers for iterative DataFrame loops. */
object PlanUtil {

  /** Materialize a DataFrame and sever BOTH its lineage and its
    * inherited statistics.
    *
    * `localCheckpoint()` truncates lineage but PRESERVES the origin
    * plan's estimated statistics. In an iterative loop (Dorling force
    * steps, connected-components rounds) iteration k+1's join plan
    * multiplies iteration k's inherited sizeInBytes estimates, so the
    * estimate's BigInt WIDTH grows geometrically with the iteration
    * count and driver-side planning stalls inside BigInteger
    * arithmetic (observed: Toom-Cook multiplies on million-bit
    * integers by iteration ~30, hanging the 100-iteration default
    * entirely). Rewrapping the materialized RDD as a fresh scan
    * resets the estimate to the flat default each round, keeping
    * planning O(1) per iteration at any iteration count; the data is
    * computed exactly once either way.
    */
  def checkpointFlat(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }
}
