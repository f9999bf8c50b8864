package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters via sharded SpaceSaving (Metwally et al.
  * 2005, the classic bounded-memory top-k summary) — the streaming
  * counterpart of the batch q83 exact-top-k + CMS envelope: a live
  * vocabulary dashboard over an unbounded token stream with state
  * that NEVER grows past nShards × k counters.
  *
  * SpaceSaving per shard: a tracked token increments its counter; an
  * untracked token either takes a free slot (count 1, err 0) or
  * evicts the MINIMUM counter and inherits its count (+1) with
  * err = the evicted count. Guarantees (per shard, N = shard's
  * token arrivals): every token with true count > N/k is tracked,
  * and each tracked count overestimates its true count by ≤ its err
  * (≤ the shard's min counter). With k ≥ the shard's distinct
  * tokens, counts are EXACT — the spec's reconciliation-with-batch
  * pin.
  *
  * Scale shape: tokens shard by the PORTABLE md5 fold of the token
  * (stateless, engine-replayable — the q94 gate style), so each
  * shard summarizes a disjoint substream and the global heavy
  * hitters are simply the top of the UNION of shard summaries (a
  * token lives in exactly one shard — no cross-shard merge error).
  * nShards spreads state and per-batch work over the cluster;
  * determinism inside a batch comes from the ascending event-id
  * fold order (the CapStream discipline). No timeout: a lifetime
  * summary must remember its counters (windowed variants compose a
  * window-keyed shard column).
  */
object TopKStream {

  case class Tok(shard: Int, token: String, eid: Long)
  case class Counter(token: String, count: Long, err: Long)
  case class ShardState(counters: Seq[Counter])
  case class Summary(shard: Int, token: String, count: Long, err: Long)

  /** Fold one shard's new arrivals into its SpaceSaving summary.
    * Eviction picks the minimum (count, token) — a total order, so
    * the summary is a pure function of the arrival order. Pure
    * function of (arrivals, state) — unit-testable without a
    * stream. */
  def updateShard(k: Int)(shard: Int, toks: Iterator[Tok],
                          state: GroupState[ShardState]): Iterator[Summary] = {
    var m: Map[String, (Long, Long)] = state.getOption
      .map(_.counters.map(c => c.token -> (c.count, c.err)).toMap)
      .getOrElse(Map.empty)
    // (eid, token) — a total order even under duplicate event ids,
    // so the summary never depends on partition arrival order
    toks.toSeq.sortBy(t => (t.eid, t.token)).foreach { t =>
      m.get(t.token) match {
        case Some((c, e)) => m = m.updated(t.token, (c + 1, e))
        case None if m.size < k => m = m.updated(t.token, (1L, 0L))
        case None =>
          val (evTok, (evCnt, _)) = m.minBy { case (tok, (c, _)) => (c, tok) }
          m = (m - evTok).updated(t.token, (evCnt + 1, evCnt))
      }
    }
    val counters = m.toSeq.map { case (t, (c, e)) => Counter(t, c, e) }
      .sortBy(c => (-c.count, c.token))
    state.update(ShardState(counters))
    counters.map(c => Summary(shard, c.token, c.count, c.err)).iterator
  }

  /** Wire the sharded summary onto a (streaming or batch-as-stream)
    * frame with `tokenCol` (string) and `idCol` (long, the arrival
    * order inside a batch). Emits each touched shard's FULL current
    * summary per micro-batch (Update-mode dashboard semantics). */
  def summaries(tokens: DataFrame, tokenCol: String, idCol: String,
                nShards: Int, k: Int): Dataset[Summary] = {
    require(nShards > 0 && k > 0, s"bad params: nShards=$nShards k=$k")
    implicit val tokEnc = Encoders.product[Tok]
    implicit val stateEnc = Encoders.product[ShardState]
    implicit val outEnc = Encoders.product[Summary]
    tokens
      // a null token has no identity to count — drop it BEFORE the
      // md5 shard (whose null would otherwise surface as an opaque
      // Dataset[Tok] conversion error; the Sampling.hashGate
      // null-discipline)
      .filter(col(tokenCol).isNotNull)
      .select(
        (conv(substring(md5(col(tokenCol)), 1, 15), 16, 10).cast("long") % nShards)
          .cast("int").as("shard"),
        col(tokenCol).cast("string").as("token"),
        col(idCol).cast("long").as("eid"))
      .as[Tok]
      .groupByKey(_.shard)(Encoders.scalaInt)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(updateShard(k))
  }
}
