package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-type transitions: the unbounded counterpart of the
  * q108 batch aggregate — per user, each event paired with its
  * successor in (ts, event_id) order, emitted at PAIR granularity so
  * the consumer rolls counts however it likes (the batch gate's
  * groupBy is one aggregate over this stream).
  *
  * Finality: a pair (e₁, e₂) is emitted once the watermark passes
  * e₂ STRICTLY (`ts < wm`, the AsOfStream rule — Spark still admits
  * rows with event time == watermark, so an event could yet land
  * between the two while wm == e₂.ts). Only then is e₂ provably e₁'s
  * successor: any later-arriving event between them would carry
  * ts ≤ e₂.ts < wm and be dropped at admission.
  *
  * State per user: the pending (not-yet-final) events — bounded by
  * the lateness window, NOT stream length — plus ONE finalized tail
  * event that seeds the next pair (kept without timeout by design,
  * the CapStream discipline: a successor may arrive arbitrarily
  * later, and one (ts, id, type) tuple per user is the floor any
  * transition chain needs).
  */
object TransitionStream {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                event_type: String)
  case class St(last: Option[(Long, Long, String)],
                pend: List[(Long, Long, String)])
  case class Out(user_id: Long, from_id: Long, to_id: Long,
                 from_type: String, to_type: String)

  /** Process one user's arrivals; emits every transition whose
    * successor the watermark finalized. Pure function —
    * unit-testable without a stream. */
  def updateUser(userId: Long, rows: Iterator[Ev],
                 state: GroupState[St]): Iterator[Out] = {
    val prev = state.getOption.getOrElse(St(None, Nil))
    val wm = state.getCurrentWatermarkMs()
    val all = prev.pend ++
      rows.map(e => (e.ts.getTime, e.event_id, e.event_type))
    val (fin, pend) = all.partition(_._1 < wm)
    val chain = fin.sortBy(e => (e._1, e._2))
    val out = (prev.last.toList ++ chain).sliding(2).collect {
      case Seq((_, fid, ft), (_, tid, tt)) => Out(userId, fid, tid, ft, tt)
    }.toList
    val last = chain.lastOption.orElse(prev.last)
    if (last.isEmpty && pend.isEmpty) {
      if (state.exists) state.remove()
    } else {
      state.update(St(last, pend.sortBy(e => (e._1, e._2))))
      // wake when the earliest pending event can finalize; a user
      // with only a tail event sleeps until a new arrival
      if (pend.nonEmpty)
        state.setTimeoutTimestamp(math.max(pend.map(_._1).min + 1, wm + 1))
    }
    out.iterator
  }

  /** Wire the stateful transition chain onto an events frame
    * (columns user_id, ts — watermarked by the caller — event_id,
    * event_type). Returns finalized pairs. */
  def transitions(events: DataFrame): Dataset[Out] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val stEnc = Encoders.product[St]
    implicit val outEnc = Encoders.product[Out]
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Ev]
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(updateUser)
  }
}
