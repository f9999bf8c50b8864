package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming interval-union coverage — q115's unbounded counterpart
  * (live session/usage metering: how much wall-clock has each user's
  * activity covered, as it happens): per user, overlapping event
  * intervals merge into ISLANDS, and an island is emitted exactly
  * once when the event-time watermark proves it can no longer grow.
  *
  * Finality: an event admitted in the future has ts >= wm (strictly
  * later rows are dropped by the watermark), so an open island whose
  * END sits strictly below the watermark can never be merged into
  * again (a future event with ts >= wm > end STARTS a new island
  * under the batch rule "new island when ts > running max end") —
  * emit and forget it. Events themselves fold only once they are
  * final (`ts < wm`, the AsOfStream strict rule), buffered until
  * then, so out-of-order arrivals inside the lateness window land in
  * the right island.
  *
  * State per user = the lateness-window buffer + ONE open island —
  * bounded by lateness and interval length, never by stream history
  * (the CapStream discipline). Emitted islands reconcile bit-for-bit
  * with the batch q115 fold over the finalized prefix (spec).
  */
object CoverageStream {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, eid: Long, dur_ms: Long)
  case class St(pending: List[(Long, Long, Long)], open: Option[(Long, Long)])
  case class Island(user_id: Long, start_ms: Long, end_ms: Long, covered_ms: Long)

  /** Fold one user's arrivals; emits every island the watermark has
    * sealed. Pure function — unit-testable without a stream. */
  def updateUser(userId: Long, rows: Iterator[Ev],
                 state: GroupState[St]): Iterator[Island] = {
    val wm = state.getCurrentWatermarkMs()
    val prev = state.getOption.getOrElse(St(Nil, None))
    val all = prev.pending ++
      rows.map(e => (e.ts.getTime, e.eid, e.dur_ms))
    // strict < wm: a row AT the watermark can still arrive (the
    // AsOfStream boundary rule) — it stays pending one more trigger
    val (ripe, pend) = all.partition(_._1 < wm)
    var open = prev.open
    val out = Seq.newBuilder[Island]
    // (ts, eid) total fold order — the batch q115 tie order
    ripe.sortBy(t => (t._1, t._2)).foreach { case (s0, _, d) =>
      val e0 = s0 + d
      open match {
        case Some((s, e)) if s0 <= e => open = Some((s, math.max(e, e0)))
        case Some((s, e)) =>
          out += Island(userId, s, e, e - s)
          open = Some((s0, e0))
        case None => open = Some((s0, e0))
      }
    }
    open match {
      case Some((s, e)) if e < wm =>
        out += Island(userId, s, e, e - s)
        open = None
      case _ => ()
    }
    if (pend.isEmpty && open.isEmpty) {
      if (state.exists) state.remove()
    } else {
      state.update(St(pend, open))
      // wake when the earliest pending event ripens, or when the
      // watermark can seal the open island
      val wake = (pend.map(_._1 + 1) ++ open.map(_._2 + 1).toList).min
      state.setTimeoutTimestamp(math.max(wake, wm + 1))
    }
    out.result().iterator
  }

  /** Wire onto a frame with (user_id, ts watermarked by the caller,
    * eid, dur_ms). Returns sealed islands, exactly once each. */
  def islands(events: DataFrame): Dataset[Island] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val stEnc = Encoders.product[St]
    implicit val outEnc = Encoders.product[Island]
    events
      .select(col("user_id"), col("ts"), col("eid"), col("dur_ms"))
      .as[Ev]
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(updateUser)
  }
}
