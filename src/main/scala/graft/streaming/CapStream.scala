package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-domain admission cap (SURVEY.md §2.E/F bridge): the
  * crawl-INGEST counterpart of the batch [[graft.operators.Sampling
  * .capPerGroup]] — at most `cap` documents admitted per group over
  * the stream's lifetime.
  *
  * Semantics are deliberately DIFFERENT from batch and documented as
  * such: a stream cannot rank against rows it has not seen, so
  * admission is first-come (within one micro-batch, ascending id for
  * a deterministic tie order) — the policy a crawler actually wants
  * at ingest ("stop fetching example.com after N pages"). The batch
  * operator's uniform hash draw is the REPLACEMENT policy for
  * curation over a corpus at rest; the reconciliation invariant the
  * spec pins is the per-group admitted COUNT: min(cap, group size)
  * in both worlds.
  *
  * State is ONE int per group (admitted so far) — bounded by
  * distinct domains, not stream length; no timeout, because a
  * lifetime cap must remember saturated groups forever (evicting
  * would re-admit; callers wanting windowed caps compose a
  * window-keyed group column).
  */
object CapStream {

  case class Doc(grp: String, doc_id: Long)
  case class CapState(admitted: Int)
  case class Admitted(grp: String, doc_id: Long, admit_rank: Int)

  /** Admit one group's new arrivals against its running count. Pure
    * function — unit-testable without a stream. */
  def updateGroup(cap: Int)(grp: String, docs: Iterator[Doc],
                            state: GroupState[CapState]): Iterator[Admitted] = {
    var n = state.getOption.map(_.admitted).getOrElse(0)
    val out = Seq.newBuilder[Admitted]
    docs.toSeq.sortBy(_.doc_id).foreach { d =>
      if (n < cap) {
        n += 1
        out += Admitted(grp, d.doc_id, n)
      }
    }
    state.update(CapState(n))
    out.result().iterator
  }

  /** Wire the admission cap onto a (streaming or batch-as-stream)
    * frame with `groupCol` (string) and `idCol` (long). */
  def admitted(docs: DataFrame, groupCol: String, idCol: String,
               cap: Int): Dataset[Admitted] = {
    require(cap > 0, s"cap must be positive, got $cap")
    implicit val docEnc = Encoders.product[Doc]
    implicit val stateEnc = Encoders.product[CapState]
    implicit val outEnc = Encoders.product[Admitted]
    docs
      .select(coalesce(col(groupCol).cast("string"), lit("\u0000graft-null")).as("grp"),
        col(idCol).cast("long").as("doc_id"))
      .as[Doc]
      .groupByKey(_.grp)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(updateGroup(cap))
  }
}
