package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming document dedup (SURVEY.md §2.C/F bridge): the
  * crawl-ingest counterpart of the batch dedup family.
  *
  * [[nearDedupStream]] drops any document whose 64-bit SimHash
  * signature was already seen within the watermark window. Signature
  * EQUALITY catches exact duplicates and template near-duplicates —
  * the identical-signature classes that dominate crawl streams (the
  * same classes the batch miners collapse first, where they measure
  * ~5 orders of magnitude of the pair volume). State is one key per
  * DISTINCT signature newer than the watermark, so it tracks unique
  * recent content, not stream length — bounded on an unbounded
  * stream.
  *
  * Deliberate scope: sub-threshold hamming variants (signature
  * differs by <= k bits) are NOT decided in-stream. Pigeonhole
  * matching would key state by (block, value) with each doc in
  * maxHamming+1 groups, and a drop decision needs coordination
  * ACROSS those groups plus an exact verify against the retained
  * doc — unbounded cross-key state, the wrong shape for
  * per-key streaming state. The supported pattern is this stream
  * filter for the identical-signature bulk, then periodic batch
  * reconciliation with Dedup.simhashDuplicates / dedupCorpus over
  * the survivors.
  */
object DedupStream {

  /** Drop docs whose signature already appeared within the watermark.
    * @param docs streaming frame with `idCol`, `textCol`, event-time
    *             `tsCol`; works on batch frames too (global dedup). */
  def nearDedupStream(docs: DataFrame, idCol: String, textCol: String,
                      tsCol: String, watermark: String = "2 hours"): DataFrame =
    docs
      .withColumn("__sig", Dedup.simhash(Dedup.wordSet(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__sig")
      .drop("__sig")
}
