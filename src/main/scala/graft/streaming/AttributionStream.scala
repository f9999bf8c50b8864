package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming event attribution — the unbounded counterpart of the
  * batch range join (queries.Events.q66 / TemporalJoin.rangeJoin):
  * every purchase joined to the views by the same user within the
  * preceding `windowMinutes`, as a watermarked stream-stream interval
  * join.
  *
  * Spark-native state story: the event-time range predicate plus the
  * two watermarks let the engine bound join state — a view's row can
  * only match purchases up to `windowMinutes` later, so state older
  * than watermark + window is evicted. Without the time-range
  * condition a stream-stream join would have to hold BOTH streams
  * forever; this shape is the one that runs indefinitely at crawl
  * scale.
  */
object AttributionStream {

  /** @param views     streaming frame: user_id, ts (timestamp), value
    * @param purchases streaming frame: user_id, ts, event_id
    * @param windowMinutes attribution lookback (view at or before the
    *                      purchase, within this many minutes)
    * @param watermark  max event-time lateness on both streams
    * @return purchase_id, user_id, pts, vts, view_value — one row per
    *         attributed (purchase, view) pair (inner: unattributed
    *         purchases don't emit; count them downstream if needed)
    */
  def attributedPairs(views: DataFrame, purchases: DataFrame,
                      windowMinutes: Int = 60,
                      watermark: String = "2 hours"): DataFrame = {
    // an inverted BETWEEN range would run forever emitting nothing
    require(windowMinutes > 0, s"windowMinutes must be positive, got $windowMinutes")
    val v = views
      .select(col("user_id").as("v_user"), col("ts").as("vts"),
        col("value").as("view_value"))
      .withWatermark("vts", watermark)
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("pts"),
        col("event_id").as("purchase_id"))
      .withWatermark("pts", watermark)
    p.join(v, expr(
        s"""p_user = v_user AND
           |vts BETWEEN pts - INTERVAL $windowMinutes MINUTES AND pts""".stripMargin))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("pts"), col("vts"), col("view_value"))
  }
}
