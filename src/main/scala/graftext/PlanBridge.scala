package org.apache.spark.sql.graftext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** LogicalPlan → DataFrame for builders OUTSIDE the sql package tree
  * (the classic `Dataset.ofRows` factory is package-private; this
  * package sits inside it — same pattern as
  * [[FunctionInjection.columnOf]]). Used by the MERGE INTO engine to
  * re-enter the DataFrame API from analyzer-captured plans. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** RDD[InternalRow] → DataFrame (the foreachBatch/StreamBatch
    * factory) — what an executor-side custom reader needs to land its
    * rows as a plain batch frame. */
  def internalFrame(spark: SparkSession,
                    rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
                    schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
