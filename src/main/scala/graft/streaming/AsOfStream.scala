package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of join (SURVEY.md §8 item 5): the unbounded
  * counterpart of TemporalJoin.asOfJoin(backward, tolerance) via
  * `flatMapGroupsWithState` — the batch merge-as-of shape needs a
  * global per-key sort and cannot stream.
  *
  * Semantics: for every left row, the latest right row at or before
  * it by the same key within `lookbackMs`, emitted once the event-time
  * WATERMARK passes the left timestamp (only then can no earlier
  * right row still arrive — the same finality rule SessionizeStream
  * uses to close sessions). Right rows sharing a timestamp collapse
  * to the max payload, mirroring the batch operator's deterministic
  * tie rule.
  *
  * The lookback is what BOUNDS STATE: a right row older than
  * (watermark - lookback) can never match a future left (future lefts
  * have ts > watermark), so it evicts. Without a lookback the latest
  * right per key would have to live forever — the same reason Spark's
  * own stream-stream joins demand a time-range constraint. State per
  * key is O(events within the lateness + lookback window), not
  * history.
  */
object AsOfStream {

  /** Tagged union row: left rows carry `lid` (their id), right rows
    * carry `v` (their payload). */
  case class Row(user_id: Long, ts: java.sql.Timestamp, left: Boolean,
                 lid: Long, v: Double)
  case class St(lefts: List[(Long, Long)], rights: List[(Long, Double)])
  case class Out(lid: Long, user_id: Long, lts_ms: Long,
                 matched_ms: Option[Long], view_value: Option[Double])

  /** Process one key's arrivals against buffered state; emits every
    * left row the watermark has finalized. Pure function —
    * unit-testable without a stream. */
  def updateUser(lookbackMs: Long)(userId: Long, rows: Iterator[Row],
                                   state: GroupState[St]): Iterator[Out] = {
    val arr = rows.toSeq
    val prev = state.getOption.getOrElse(St(Nil, Nil))
    val wm = state.getCurrentWatermarkMs()
    val rights = (prev.rights ++
      arr.filterNot(_.left).map(r => (r.ts.getTime, r.v))).sortBy(_._1)
    val lefts = prev.lefts ++ arr.filter(_.left).map(r => (r.ts.getTime, r.lid))

    // STRICTLY below the watermark: Spark admits late rows with event
    // time exactly equal to the watermark, so a right at rts == lts ==
    // wm could still arrive — a left at the boundary stays pending one
    // more trigger.
    val (fin, pend) = lefts.partition(_._1 < wm)
    val out = fin.sortBy(l => (l._1, l._2)).map { case (lts, lid) =>
      val cands = rights.filter(r => r._1 <= lts && lts - r._1 <= lookbackMs)
      if (cands.isEmpty) Out(lid, userId, lts, None, None)
      else {
        val mts = cands.map(_._1).max
        // max payload among equal-ts rights == the batch max-struct
        // collapse (single payload field)
        Out(lid, userId, lts, Some(mts),
          Some(cands.filter(_._1 == mts).map(_._2).max))
      }
    }

    // rights strictly older than (watermark - lookback) cannot match
    // any pending or future left (pending lefts have lts >= wm, so the
    // earliest right they can use is wm - lookback) — evict
    val keepRights = rights.filter(_._1 >= wm - lookbackMs)
    if (pend.isEmpty && keepRights.isEmpty) {
      if (state.exists) state.remove()
    } else {
      state.update(St(pend, keepRights))
      // wake when the watermark can finalize the earliest pending
      // left, or (rights only) when the last right expires
      val wake =
        if (pend.nonEmpty) pend.map(_._1).min + 1
        else keepRights.map(_._1).max + lookbackMs + 1
      state.setTimeoutTimestamp(math.max(wake, wm + 1))
    }
    out.iterator
  }

  /** Wire the stateful as-of onto a tagged frame (columns user_id,
    * ts (timestamp, watermarked by the caller), left, lid, v).
    * Returns finalized matches. */
  def matches(tagged: DataFrame, lookbackMs: Long): Dataset[Out] = {
    implicit val rowEnc = Encoders.product[Row]
    implicit val stEnc = Encoders.product[St]
    implicit val outEnc = Encoders.product[Out]
    tagged
      .select(col("user_id"), col("ts"), col("left"), col("lid"), col("v"))
      .as[Row]
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(updateUser(lookbackMs))
  }
}
