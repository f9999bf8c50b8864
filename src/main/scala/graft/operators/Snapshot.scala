package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff (the dataset-versioning primitive: what
  * changed between release v1 and v2? — the audit a training-data
  * pipeline runs before re-ingesting a refreshed crawl, and the
  * other half of q118's integrity story: the checksum says THAT the
  * copies differ, the diff says WHERE).
  *
  * Scale shape: each side reduces map-side to (id, 60-bit payload
  * hash) BEFORE the join — the full-outer join then carries 16
  * bytes/row instead of document payloads (at 100 TB the difference
  * between a metadata-sized shuffle and re-shuffling the corpus).
  * The hash is the portable md5 fold, so an independent engine
  * reproduces every verdict bit-for-bit; a changed payload is missed
  * only on a 60-bit collision (2^-60 per doc).
  */
object Snapshot {

  /** Per-id status between two snapshots: `added` (only in new),
    * `removed` (only in old), `changed` (both, payload hash differs),
    * `unchanged`. Payload columns are folded in the given order with
    * a  separator; rows with null ids are dropped (an id-less
    * row cannot be tracked across versions). NULL payload cells fold
    * as an explicit sentinel -- concat_ws SKIPS nulls, which would
    * make ("a", null, "b") and ("a", "b", null) hash equal and hide
    * a real change. */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
           payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "snapshot diff needs payload columns")
    val cells = payloadCols.map(c =>
      coalesce(col(c).cast("string"), lit("graft-null")))
    def hashed(df: DataFrame, side: String) = df
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"),
        conv(substring(md5(concat_ws("", cells: _*)), 1, 15), 16, 10)
          .cast("long").as(side))
    hashed(oldDf, "h_old").join(hashed(newDf, "h_new"), Seq("id"), "full_outer")
      .select(col("id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") === col("h_new"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
