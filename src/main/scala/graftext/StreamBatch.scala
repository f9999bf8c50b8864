package org.apache.spark.sql.graftext

import org.apache.spark.sql.DataFrame

/** Re-wrap a streaming microbatch frame as a PLAIN batch frame — what
  * Spark's own foreachBatch does before handing the user their
  * DataFrame (`internalCreateDataFrame(toRdd, schema)`): the V1
  * [[org.apache.spark.sql.execution.streaming.Sink.addBatch]] frame
  * is planned against streaming-tagged sources, and the batch-side
  * work a merge sink runs (joins against the existing table,
  * aggregates for bucket planning) would be refused on a streaming
  * plan. The RDD re-executes the already-planned incremental batch
  * per action — same cost model as foreachBatch. */
object StreamBatch {
  def rebatch(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
