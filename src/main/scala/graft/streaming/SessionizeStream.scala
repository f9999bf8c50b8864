package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization (SURVEY.md §2.F lib):
  * `flatMapGroupsWithState` keyed by user, closing a session after 30
  * minutes of inactivity — the custom-state counterpart of the
  * batch window-function sessionizer (queries.Events.q61).
  *
  * State per user is O(1) (current session bounds only); an event-time
  * timeout evicts idle users, so state size tracks ACTIVE users, not
  * history — the property that matters on an unbounded 100 TB stream.
  */
object SessionizeStream {

  val GapMs: Long = 30L * 60 * 1000

  case class Event(user_id: Long, ts: java.sql.Timestamp)
  case class SessionState(start_ms: Long, last_ms: Long, n_events: Int)
  case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long, n_events: Int)

  /** Process one user's new events against running session state;
    * emits every CLOSED session. Pure function — unit-testable without
    * a stream. */
  def updateUser(userId: Long, events: Iterator[Event],
                 state: GroupState[SessionState]): Iterator[SessionOut] = {
    val sorted = events.toSeq.map(e => e.ts.getTime).sorted
    var cur = state.getOption
    val closed = Seq.newBuilder[SessionOut]
    if (state.hasTimedOut) {
      cur.foreach(s => closed += SessionOut(userId, s.start_ms, s.last_ms, s.n_events))
      cur = None
      state.remove()
    }
    sorted.foreach { tsMs =>
      cur match {
        case Some(s) if tsMs - s.last_ms <= GapMs =>
          cur = Some(s.copy(last_ms = tsMs, n_events = s.n_events + 1))
        case Some(s) =>
          closed += SessionOut(userId, s.start_ms, s.last_ms, s.n_events)
          cur = Some(SessionState(tsMs, tsMs, 1))
        case None =>
          cur = Some(SessionState(tsMs, tsMs, 1))
      }
    }
    cur.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.last_ms + GapMs)
    }
    closed.result().iterator
  }

  /** Wire the stateful sessionizer onto an event frame (streaming or
    * batch-as-stream). Returns closed sessions. */
  def sessions(events: DataFrame): Dataset[SessionOut] = {
    implicit val eventEnc = Encoders.product[Event]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[SessionOut]
    events
      .select(col("user_id"), col("ts"))
      .as[Event]
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateUser)
  }

  /** Run against the events parquet replayed as a stream; returns the
    * closed sessions collected through a memory sink. */
  def runToMemory(spark: SparkSession, dir: String,
                  queryName: String = "sessions_out"): DataFrame = {
    val stream = EventStreams.readEventStream(spark, dir)
      .withWatermark("ts", "2 hours")   // kept through sessions(): the
                                        // ts column survives projection
    val q = sessions(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
  }
}
