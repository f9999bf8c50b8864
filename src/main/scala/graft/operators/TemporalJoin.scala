package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-keyed joins Spark lacks as built-ins (SURVEY.md §2.F):
  * as-of (most recent match at or before each left timestamp) and
  * point-in-interval range joins. Both are declared against the
  * DataFrame API so Catalyst keeps pushdown/pruning freedom, and both
  * are single-shuffle plans — the naive formulations (a per-row
  * subquery, or an unbounded theta-join) degenerate to O(n*m) per key
  * and are exactly what these operators exist to avoid at 100 TB.
  */
object TemporalJoin {

  /** As-of join: for every left row, the single most recent right row
    * with `right.tsCol <= left.tsCol` (or the earliest `>=` when
    * `forward = true`) on the same `key`, within `tolerance` time
    * units when given.
    *
    * Plan shape — the distributed merge-as-of: both sides union into
    * one stream tagged by side, ONE shuffle on `key`, one in-partition
    * sort on (ts, side), and a running `last(..., ignoreNulls)` window
    * carries the latest right payload forward onto each left row. No
    * join node at all, so there is no per-key quadratic pair space —
    * cost is sort-merge-shaped at any key skew (a key's cost is its
    * row count, not left(key) x right(key)).
    *
    * Right rows are first collapsed to ONE row per (key, ts) — the
    * lexicographically greatest payload struct wins — because "the
    * most recent right row" is otherwise undefined when several right
    * rows share a timestamp, and an engine-dependent tie pick would
    * make results irreproducible (the DuckDB oracle collapses ties
    * the same way).
    *
    * @param left  any columns; must contain `key` and numeric `ltsCol`
    * @param right must contain `key` and numeric `rtsCol`; every other
    *              column is payload and appears (nullable) on the
    *              output. Payload names must not collide with left's.
    * @param tolerance max |left ts - matched ts| in ts units; matches
    *                  further away yield nulls (the left row is kept —
    *                  as-of is a LEFT join)
    * @return left.* ++ payload.* ++ matched_ts, one row per left row
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               ltsCol: String, rtsCol: String,
               forward: Boolean = false,
               tolerance: Option[Long] = None): DataFrame =
    asOfJoinBy(left, right, Seq(key), ltsCol, rtsCol, forward, tolerance)

  /** Multi-key as-of (merge_asof's by = [k1, k2, ...]): identical
    * semantics and plan shape, partitioned on the composite key. */
  def asOfJoinBy(left: DataFrame, right: DataFrame, keys: Seq[String],
                 ltsCol: String, rtsCol: String,
                 forward: Boolean = false,
                 tolerance: Option[Long] = None): DataFrame = {
    val (uni, payload) = asOfPrep(left, right, keys, ltsCol, rtsCol)
    // right rows (side 0) sort BEFORE left rows at an equal timestamp
    // in scan direction, so the match is inclusive on both directions
    val ord =
      if (forward) Seq(col("__ts").desc, col("__m").isNull.cast("int"))
      else Seq(col("__ts").asc, col("__m").isNull.cast("int"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = uni.withColumn("__last", last(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__m").isNull) // keep left rows only
    val dist =
      if (forward) col("__last.__mts") - col("__ts") else col("__ts") - col("__last.__mts")
    val inTol = tolerance.map(t => dist <= t).getOrElse(lit(true))
    // null left ts matches nothing (in forward mode DESC NULLS LAST
    // would otherwise hand it the globally-last right payload)
    val ok = col("__last").isNotNull && col("__ts").isNotNull && inTol
    asOfOut(matched, left, payload, ok, col("__last"))
  }

  /** Nearest-in-time as-of: the closest right row on EITHER side of
    * each left timestamp (distance ties prefer the earlier/backward
    * match). Same single shuffle as [[asOfJoin]] — the previous match
    * is a running `last` and the next match a reverse-frame `first`
    * over ONE ascending sort; no second shuffle, no join node. */
  def asOfJoinNearest(left: DataFrame, right: DataFrame, key: String,
                      ltsCol: String, rtsCol: String,
                      tolerance: Option[Long] = None): DataFrame =
    asOfJoinNearestBy(left, right, Seq(key), ltsCol, rtsCol, tolerance)

  /** Multi-key nearest as-of. */
  def asOfJoinNearestBy(left: DataFrame, right: DataFrame, keys: Seq[String],
                        ltsCol: String, rtsCol: String,
                        tolerance: Option[Long] = None): DataFrame = {
    val (uni, payload) = asOfPrep(left, right, keys, ltsCol, rtsCol)
    val base = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__m").isNull.cast("int"))
    val wPrev = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // an equal-ts right row sorts before the left row, so it lands in
    // the PREV frame with distance 0 — which always wins (or ties to
    // backward), keeping equal-ts matches inclusive
    val matched = uni
      .withColumn("__prev", last(col("__m"), ignoreNulls = true).over(wPrev))
      .withColumn("__next", first(col("__m"), ignoreNulls = true).over(wNext))
      .filter(col("__m").isNull)
    val dPrev = col("__ts") - col("__prev.__mts")
    val dNext = col("__next.__mts") - col("__ts")
    val pickPrev = col("__prev").isNotNull &&
      (col("__next").isNull || dPrev <= dNext)
    val best = when(pickPrev, col("__prev")).otherwise(col("__next"))
    val dist = when(pickPrev, dPrev).otherwise(dNext)
    val inTol = tolerance.map(t => dist <= t).getOrElse(lit(true))
    val ok = best.isNotNull && col("__ts").isNotNull && inTol
    asOfOut(matched.withColumn("__best", best), left, payload, ok, col("__best"))
  }

  /** Shared as-of setup: validation, right-side (key, ts) tie
    * collapse, and the tagged union (left rows carry __m = null). */
  private def asOfPrep(left: DataFrame, right: DataFrame, keys: Seq[String],
                       ltsCol: String, rtsCol: String): (DataFrame, Seq[String]) = {
    require(keys.nonEmpty, "at least one key column is required")
    val payload = right.columns.filterNot(c => keys.contains(c) || c == rtsCol).toSeq
    require(payload.nonEmpty, "right side needs at least one payload column")
    val collide = (payload.toSet + "matched_ts").intersect(left.columns.toSet)
    require(collide.isEmpty, s"payload/output columns collide with left: $collide")
    val internal = Seq("__ts", "__m", "__last", "__prev", "__next", "__best")
      .filter(left.columns.contains)
    require(internal.isEmpty, s"left may not use reserved working names: $internal")

    // one row per (key, ts): greatest payload struct (deterministic).
    // Null-ts right rows are dropped — "at or before null" is
    // undefined, and under ASC NULLS FIRST their non-null __m struct
    // would otherwise sort ahead of the whole partition and phantom-
    // match every early left row.
    val rOne = right.filter(col(rtsCol).isNotNull)
      .groupBy(keys.map(col) :+ col(rtsCol).cast("long").as("__ts"): _*)
      .agg(max(struct(payload.map(col): _*)).as("__p"))
      .select(keys.map(col) ++ Seq(col("__ts"),
        struct(col("__ts").as("__mts"), col("__p")).as("__m")): _*)
    val lSide = left.withColumn("__ts", col(ltsCol).cast("long"))
    (lSide.unionByName(rOne, allowMissingColumns = true), payload)
  }

  /** Shared as-of projection: left.* ++ payload (nulled unless ok) ++
    * matched_ts. */
  private def asOfOut(matched: DataFrame, left: DataFrame, payload: Seq[String],
                      ok: Column, m: Column): DataFrame =
    matched.select(
      left.columns.map(col) ++
        payload.map(p => when(ok, m.getField("__p").getField(p)).as(p)) :+
        when(ok, m.getField("__mts")).as("matched_ts"): _*)

  /** Point-in-interval range join: every (point, interval) pair on
    * the same `key` with `startCol <= point ts <= endCol`.
    *
    * Plan shape — bucketized equi-join: time is cut into
    * `bucketWidth`-sized buckets; a point lands in exactly one bucket
    * (so no post-join distinct is needed) while an interval explodes
    * to the few buckets it overlaps; the join is then a plain
    * shuffle on (key, bucket) with the exact containment predicate as
    * a cheap post-filter. An unbucketized `ts BETWEEN start AND end`
    * join has no equi-key beyond `key` and degenerates to per-key
    * all-pairs; here the pair space is bounded by genuine temporal
    * locality. Pick `bucketWidth` ~ the typical interval length:
    * explode factor stays O(1) and each bucket holds only
    * temporally-close rows.
    *
    * @param points    must contain `key` and numeric `ptsCol`
    * @param intervals must contain `key`, numeric `startCol`/`endCol`
    *                  (inclusive; rows with end < start drop out).
    *                  Non-key column names must not collide with
    *                  points'.
    * @return intervals.* ++ points.* (minus the duplicate key)
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
                ptsCol: String, startCol: String, endCol: String,
                bucketWidth: Long,
                maxBucketsPerInterval: Long = 100000L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val collide = intervals.columns.filterNot(_ == key).toSet
      .intersect(points.columns.filterNot(_ == key).toSet)
    require(collide.isEmpty, s"interval columns collide with points: $collide")
    // floor-division bucket ids (long division truncates toward zero —
    // wrong for negative timestamps, so use floor on doubles' cousin:
    // shift into the positive range via floordiv expression)
    def bucketOf(c: Column): Column = floor(c.cast("double") / bucketWidth).cast("long")
    val p = points.withColumn("__b", bucketOf(col(ptsCol)))
    // Fail LOUDLY on an interval exploding past the budget (a sentinel
    // end like Long.MaxValue, or start/end in the wrong unit): one such
    // row would otherwise build a billions-element sequence and kill
    // the job with an obscure sequence-length error or an executor OOM.
    val nb = bucketOf(col(endCol)) - bucketOf(col(startCol)) + 1
    val iv = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__nb",
        when(nb > maxBucketsPerInterval,
          raise_error(concat(lit(s"rangeJoin: interval spans more than " +
            s"$maxBucketsPerInterval buckets of $bucketWidth (start="),
            col(startCol), lit(", end="), col(endCol),
            lit(") — wrong unit or sentinel value?")))).otherwise(nb))
      .withColumn("__b",
        explode(sequence(bucketOf(col(startCol)),
          bucketOf(col(startCol)) + col("__nb") - 1)))
      .drop("__nb")
    iv.join(p, Seq(key, "__b"))
      .filter(col(ptsCol) >= col(startCol) && col(ptsCol) <= col(endCol))
      .drop("__b")
  }
}
