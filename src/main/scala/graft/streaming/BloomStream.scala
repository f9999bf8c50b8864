package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Bloom

/** Streaming Bloom admission (SURVEY.md §2.C/F bridge): first-sight
  * dedup over an UNBOUNDED stream in FIXED memory.
  *
  * [[DedupStream]] keys state by distinct signature, so its state
  * grows with unique content — the right trade inside a watermark
  * window. A lifetime "have I ever seen this?" filter cannot evict,
  * and exact state would grow forever; the production shape is a
  * Bloom bitmap: admit iff the key's bits are not all set, then set
  * them. Total state here is `buckets × mBitsPerBucket / 8` bytes —
  * CONSTANT in stream length and in distinct-key count, the
  * CapStream discipline taken to content dedup.
  *
  * The price is reversed from batch Bloom decontamination: a false
  * positive WRONGLY DROPS a novel document (rate (1-e^(-kn/m))^k as
  * the per-bucket filters fill — size m for the expected unique
  * volume, or rotate epoch-keyed filters). False negatives never
  * happen: an admitted key's bits are set, so its duplicates are
  * always dropped.
  *
  * Sharding: each key routes to ONE bucket by an independent salted
  * md5 draw, and all k of its bit positions live in that bucket's
  * bitmap, so the admit decision is bucket-local — exactly the shape
  * `flatMapGroupsWithState` scales: buckets spread over executors,
  * one bitmap each, no cross-key coordination. Within a micro-batch,
  * arrivals process in ascending id (the CapStream tie order), so a
  * batch replay with the same batch boundaries reconciles
  * bit-for-bit (spec-pinned); the bits themselves are the SAME
  * portable draws as batch [[Bloom]] (positionsJvm == bitPositions,
  * spec-pinned), with the bucket filter behaving as an independent
  * m-bit Bloom over the keys routed to it.
  */
object BloomStream {

  case class Doc(bucket: Int, doc_id: Long, key: String)
  case class BloomState(words: Array[Long])
  case class Admitted(doc_id: Long, bucket: Int)

  /** Decide one bucket's arrivals against its bitmap. Pure function —
    * unit-testable without a stream. */
  def updateBucket(mBits: Int, k: Int)(bucket: Int, docs: Iterator[Doc],
                                       state: GroupState[BloomState]): Iterator[Admitted] = {
    val words = state.getOption.map(_.words)
      .getOrElse(new Array[Long]((mBits + 63) / 64))
    val out = Seq.newBuilder[Admitted]
    docs.toSeq.sortBy(_.doc_id).foreach { d =>
      val ps = Bloom.positionsJvm(d.key, mBits, k)
      val seen = ps.forall(p => ((words((p / 64).toInt) >>> (p % 64).toInt) & 1L) == 1L)
      if (!seen) {
        ps.foreach(p => words((p / 64).toInt) |= 1L << (p % 64).toInt)
        out += Admitted(d.doc_id, bucket)
      }
    }
    state.update(BloomState(words))
    out.result().iterator
  }

  /** Wire the admission filter onto a (streaming or batch-as-stream)
    * frame: emit the first-sight rows, drop repeats (and the bounded
    * false-drop band). */
  def admitted(docs: DataFrame, idCol: String, keyCol: String,
               buckets: Int = 64, mBitsPerBucket: Int = 1 << 16,
               k: Int = 3): Dataset[Admitted] = {
    require(buckets > 0 && mBitsPerBucket > 0 && k > 0,
      s"bad params: buckets=$buckets m=$mBitsPerBucket k=$k")
    implicit val docEnc = Encoders.product[Doc]
    implicit val stateEnc = Encoders.product[BloomState]
    implicit val outEnc = Encoders.product[Admitted]
    val key = coalesce(col(keyCol).cast("string"), lit("\u0000graft-null"))
    docs
      .select(
        (conv(substring(md5(concat(lit("bloombucket:"), key)), 1, 15), 16, 10)
          .cast("long") % buckets).cast("int").as("bucket"),
        col(idCol).cast("long").as("doc_id"),
        key.as("key"))
      .as[Doc]
      .groupByKey(_.bucket)(Encoders.scalaInt)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(updateBucket(mBitsPerBucket, k))
  }
}
