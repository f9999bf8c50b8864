package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and sequence packing for training-data
  * assembly (SURVEY.md §2.C/E adjacents): hash-gated row sampling
  * (reproducible across runs, engines and cluster sizes — no RNG, no
  * seed plumbing, no sort), per-stratum mixture sampling, and
  * concat-and-chunk token packing.
  */
object Sampling {

  private val Mod = 1000000L

  /** PORTABLE uniform [0, 1e6) hash of a key: fold 15 hex chars of
    * md5 into a 60-bit long, mod 1e6. Same engine-independence
    * rationale as Dedup.portableWordHash — DuckDB/Python reproduce
    * the gate bit-for-bit, so sampled sets are hash-checkable and a
    * re-run (any cluster size, any partitioning) samples the SAME
    * rows: sampling by coin flip would make every pipeline rerun a
    * different corpus. md5's low 60 bits are uniform, so
    * P(keep) = fraction to within 1e-6. A null key hashes as the
    * sentinel string below — md5(NULL) is NULL and filter(NULL <
    * thresh) would otherwise silently DROP null-id rows even at
    * fraction 1.0. */
  def hashGate(keyCol: Column): Column =
    conv(substring(md5(coalesce(keyCol.cast("string"), lit("\u0000graft-null"))),
      1, 15), 16, 10).cast("long") % Mod

  /** Deterministic Bernoulli sample: keep rows whose [[hashGate]]
    * falls under `fraction`. Map-side only — no shuffle, no state;
    * filters push down around it. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1], got $fraction")
    df.filter(hashGate(col(idCol)) < lit((fraction * Mod).toLong))
  }

  /** Stratified mixture sample: per-stratum keep fractions (the
    * training-mix weighting step — e.g. upsample curated sources,
    * downsample crawl). Strata absent from `fractions` keep
    * `defaultFraction` (including a null stratum). Map-side only; the
    * gate key mixes the stratum into the hash so a row kept at
    * fraction f in one stratum is an independent draw from the same
    * id in another. The key is LENGTH-PREFIXED — a plain
    * stratum:id concat would alias ("web:en", "7") with ("web",
    * "en:7") and couple their draws. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 1.0): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0 && f <= 1, s"fractions must be in [0,1], got $f"))
    val thresh = fractions.foldLeft(lit((defaultFraction * Mod).toLong)) {
      case (acc, (s, f)) => when(col(stratumCol) === s, lit((f * Mod).toLong)).otherwise(acc)
    }
    val st = coalesce(col(stratumCol).cast("string"), lit(""))
    df.filter(hashGate(concat(length(st), lit(":"), st, lit(":"),
      col(idCol).cast("string"))) < thresh)
  }

  /** Deterministic DISJOINT-AND-TOTAL split assignment — the
    * train/val/test carve every training run needs: one portable md5
    * draw per id (prefixed "split:" so it is independent of
    * [[hashSample]]'s draw on the same id) lands in the first split
    * whose cumulative weight threshold exceeds it. Every row gets
    * exactly one split (the last threshold is pinned to the gate
    * modulus, so floating-point rounding can never leave a row
    * unassigned), reruns assign identically on any engine/cluster,
    * and the FIRST split grows monotonically: raising its weight
    * only ADDS ids (existing members never leave — the threshold
    * only moves up), and a trailing split depends only on the sum of
    * the weights before it, so test stays fixed while train/val
    * trade mass. Middle splits are windows and shift with their
    * lower boundary — order the splits so the ones that must stay
    * stable sit first or last. Map-side only.
    * @param splits (name, weight) in priority order; weights sum to 1
    * @return df's columns + split */
  def splitAssign(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "splitAssign: no splits")
    splits.foreach { case (n, w) =>
      require(w >= 0 && w <= 1, s"splitAssign: weight $w of '$n' outside [0,1]") }
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"splitAssign: weights must sum to 1, got ${splits.map(_._2).sum}")
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.round(c * Mod))
    val th = cums.init :+ Mod // total by construction
    val g = hashGate(concat(lit("split:"), col(idCol).cast("string")))
    val assign = splits.map(_._1).zip(th).init
      .foldRight(lit(splits.last._1): Column) {
        case ((name, t), els) => when(g < t, name).otherwise(els)
      }
    df.withColumn("split", assign)
  }

  /** Per-row weighted sample: keep each row with probability
    * `weightCol` (clamped to [0, 1]) — quality-proportional corpus
    * downsampling, with the same deterministic portable gate as
    * [[hashSample]]: reruns keep the SAME rows, and raising a row's
    * weight can only move it from dropped to kept (the gate value is
    * fixed per id; only the threshold moves). Null weights drop. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String): DataFrame =
    df.filter(hashGate(col(idCol)) <
      (least(greatest(col(weightCol).cast("double"), lit(0.0)), lit(1.0)) * Mod)
        .cast("long"))

  /** Best-k rows per stratum under (`scoreCol` desc, `idCol` asc) —
    * the "keep the N highest-quality docs per source" curation step.
    * Ties on score break by id, so the kept set is deterministic.
    *
    * Plan shape: one rank window per stratum; Catalyst inserts a
    * WindowGroupLimit below the shuffle for rank-filter windows, so
    * each map task forwards only its local top-k — the shuffle
    * carries O(partitions * k) rows per stratum, not the stratum.
    * @return df.* ++ rank (1..k)
    */
  def topKPerStratum(df: DataFrame, stratumCol: String, scoreCol: String,
                     idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Per-group document cap: keep at most `cap` rows per `groupCol`
    * (the CommonCrawl-style per-domain cap that stops one host from
    * dominating the corpus). Which rows survive is a deterministic
    * UNIFORM draw, not a head-of-table artifact: rows rank by the
    * md5 hex of (group:id) — engine-portable, so the kept set is
    * reproducible on any engine/cluster/rerun, and independent of
    * input order. Ranking by the hex STRING (not a fold) keeps the
    * oracle a one-line `md5(...)` comparison.
    *
    * Plan shape: identical to [[topKPerStratum]] — a rank-filter
    * window that Catalyst plans with a map-side WindowGroupLimit, so
    * the shuffle carries O(partitions * cap) rows per group, never
    * the group. Skew-safe at any group cardinality.
    * @return df.* ++ cap_rank (1..cap, in hash order)
    */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val key = md5(concat_ws(":",
      coalesce(col(groupCol).cast("string"), lit("\u0000graft-null")),
      col(idCol).cast("string")))
    val w = Window.partitionBy(col(groupCol)).orderBy(key, col(idCol))
    df.withColumn("cap_rank", row_number().over(w)).filter(col("cap_rank") <= cap)
  }

  /** Temperature-based domain resampling — the multilingual /
    * data-mixing rule (mBERT, XLM-R, LLaMA-style mixes): group g with
    * corpus share p_g is kept at rate ∝ p_g^(alpha-1), normalized so
    * the rarest group keeps everything. alpha=1 reproduces the raw
    * mix; alpha→0 flattens toward uniform. Rows are then kept by the
    * same deterministic portable gate as [[stratifiedSample]] (and
    * with the SAME length-prefixed key, so a temperature mix and an
    * explicit-fraction mix of equal rates keep identical rows).
    *
    * Scale shape: one count aggregate at group cardinality, two
    * 1-row aggregates (total, max-rate) that Catalyst broadcasts,
    * and a broadcast join of the tiny rate table back onto the
    * corpus — the corpus itself never shuffles; the gate is
    * map-side.
    *
    * Engine-portability: at the default alpha=0.5 the rate is
    * computed as 1/sqrt(p) — division and sqrt are exactly rounded
    * under IEEE 754 in every engine, so rates (and therefore the
    * kept SET) are bit-reproducible and the q69 gate can state them.
    * Other alphas go through pow, which carries no such guarantee
    * (last-ulp platform variation) — fine for production, not for a
    * bit-exact oracle.
    *
    * @return df.* ++ n_docs (group count), rate (keep fraction)
    */
  def temperatureMix(df: DataFrame, groupCol: String, idCol: String,
                     alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val g = coalesce(col(groupCol).cast("string"), lit("\u0000graft-null"))
    val counts = df.groupBy(g.as("__grp")).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum(col("n_docs")).as("__n_total"))
    val p = col("n_docs").cast("double") / col("__n_total").cast("double")
    val boost = if (alpha == 0.5) lit(1.0) / sqrt(p) else pow(p, alpha - 1)
    val rTbl = counts.crossJoin(tot).withColumn("__r", boost)
    val rMax = rTbl.agg(max(col("__r")).as("__r_max"))
    val rates = rTbl.crossJoin(rMax)
      .select(col("__grp"), col("n_docs"), (col("__r") / col("__r_max")).as("rate"))
    val st = coalesce(col(groupCol).cast("string"), lit(""))
    df.join(broadcast(rates), g === col("__grp"))
      .filter(hashGate(concat(length(st), lit(":"), st, lit(":"),
        col(idCol).cast("string"))) < col("rate") * Mod)
      .drop("__grp")
  }

  /** Concat-and-chunk sequence packing: documents of one `streamCol`
    * stream are laid end-to-end in ascending `idCol` order and the
    * token axis is cut into `budget`-sized bins — the GPT-style packing
    * where a document may straddle a bin boundary and no token is
    * padded or dropped. Emits each doc's token offset and the bin
    * range it spans; a doc with more tokens than `budget` spans
    * several bins.
    *
    * Plan shape — TWO-PHASE DISTRIBUTED PREFIX SUM. The naive
    * formulation (one unbounded running-sum window per stream) sorts
    * each stream on a SINGLE reducer, so a lone logical corpus stream
    * caps parallelism at 1 regardless of cluster size. Instead each
    * stream is sharded into `bands` id-ranges by a MONOTONE band
    * function (band boundaries never interleave ids, so concatenation
    * order is untouched):
    *   1. per-(stream, band) token sums — a parallel partial
    *      aggregate, the stage that touches every row;
    *   2. a cumulative offset over the tiny (streams x bands) band
    *      table — the only sequential step, O(streams x bands) rows;
    *   3. offsets join back (broadcast) and an in-band running-sum
    *      window partitioned on (stream, band) finishes the offsets —
    *      parallelism = streams x bands, not streams.
    * Long addition is associative, so `start_tok` is bit-identical to
    * the single-window formulation at any `bands`. Band boundaries
    * are approximate per-stream id percentiles, so shard balance
    * holds under arbitrary id distributions (outliers, gaps,
    * clustering) — and since any monotone banding yields the same
    * output, the percentile sketch's approximation never touches
    * correctness, only balance.
    *
    * Non-integral `idCol` types (e.g. string ids) have no cheap
    * monotone band function and fall back to the per-stream window —
    * correct, but parallelism = streams; map such ids to a dense
    * integer first to scale a single stream.
    *
    * Zero-token docs are excluded (they occupy no token interval, so
    * bin membership is undefined for them). (`streamCol`, `idCol`)
    * must be UNIQUE per row — duplicate ids would make the running
    * offset's tie order (and therefore bin assignment) partition-
    * dependent, breaking the determinism this module guarantees.
    *
    * @param bands id-range shards per stream (>= 2); the per-stream
    *              parallelism of the token-sum stage
    * @return streamCol, idCol, n_tokens, start_tok (0-based offset),
    *         bin_first, bin_last (inclusive), n_bins
    */
  /** Deterministic training-order key: the portable 60-bit md5 fold
    * of "epoch:id". Sorting by (epoch_key, id) is a reproducible
    * pseudorandom permutation of the corpus — the shuffle-per-epoch
    * step of a training pipeline, identical on any engine, cluster
    * size or rerun (no RNG, no seed plumbing); different epochs give
    * independent orders. A global sort on the key is Spark's range
    * partition + per-partition sort — no single-reducer stage at any
    * scale. Null ids all share one key; tie-break on the id column
    * keeps even that case deterministic. */
  def epochKey(idCol: Column, epoch: Long): Column =
    conv(substring(md5(concat_ws(":", lit(epoch.toString), idCol.cast("string"))),
      1, 15), 16, 10).cast("long")

  /** Attach [[epochKey]] as `epoch_key` (callers sort by
    * (epoch_key, id) for the epoch's traversal order). */
  def epochOrder(df: DataFrame, idCol: String, epoch: Long): DataFrame =
    df.withColumn("epoch_key", epochKey(col(idCol), epoch))

  /** Explode [[packChunks]] output into per-(bin, doc) token slices —
    * the manifest a training data-loader consumes: for every bin a
    * doc touches, the doc-relative token range [tok_from, tok_to)
    * that falls inside it. Pure map-side projection (sequence +
    * clamp arithmetic over the already-computed offsets): no
    * shuffle, composes at any scale. Invariants (spec-pinned): per
    * doc the slices partition [0, n_tokens); per bin the slice
    * lengths sum to `budget` (except each stream's last bin).
    * @param packed output of [[packChunks]] (same budget!)
    * @return streamCol, bin, idCol, tok_from, tok_to (doc-relative,
    *         end-exclusive)
    */
  def binSlices(packed: DataFrame, idCol: String, streamCol: String,
                budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    packed
      .withColumn("bin", explode(sequence(col("bin_first"), col("bin_last"))))
      .withColumn("tok_from",
        greatest(col("bin") * budget - col("start_tok"), lit(0L)))
      .withColumn("tok_to",
        least((col("bin") + 1) * budget - col("start_tok"), col("n_tokens")))
      .select(col(streamCol), col("bin"), col(idCol), col("tok_from"), col("tok_to"))
  }

  def packChunks(df: DataFrame, idCol: String, tokenCol: String,
                 streamCol: String, budget: Long,
                 bands: Int = 64): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(bands >= 2, s"bands must be >= 2, got $bands")
    val base = df.filter(col(tokenCol) > 0)
      .select(col(streamCol), col(idCol), col(tokenCol).cast("long").as("n_tokens"))
    val integralId = df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val withStart =
      if (!integralId) {
        val w = Window.partitionBy(col(streamCol)).orderBy(col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        base.withColumn("start_tok", sum(col("n_tokens")).over(w) - col("n_tokens"))
      } else {
        // band boundaries = approximate per-stream id PERCENTILES of
        // a deterministic ~1% id-hash sample, so shard balance holds
        // under ANY id distribution (a min/max-range band would
        // collapse to one shard the moment a single outlier id
        // stretches the range), and the sketch only ever sees the
        // sample (a full-data sketch measured ~9 us/row — 20x the
        // whole operator). The band index — count of boundaries
        // strictly below the id — is monotone in id whatever the
        // boundaries are, and the two-phase sum is bit-identical
        // under every monotone banding, so neither the sampling nor
        // the sketch's approximation can touch output, only balance.
        // Streams too small to hit the sample get null boundaries ->
        // one band, which is exactly when sharding is irrelevant.
        val fractions = (1 until bands).map(_.toDouble / bands)
        val spans = base
          .filter(pmod(xxhash64(col(idCol).cast("long")), lit(100)) === 0)
          .groupBy(col(streamCol))
          .agg(percentile_approx(col(idCol).cast("long"),
            typedlit(fractions), lit(1000)).as("_bounds"))
        // NO forced broadcast on the side tables: at normal stream
        // cardinality they are KBs and Catalyst auto-broadcasts; at
        // pathological cardinality (millions of streams) a forced
        // broadcast of streams x bands rows would be the driver
        // hazard, while the fallback shuffle join already lands on
        // the (stream, band) partitioning the window needs anyway.
        val banded = base.join(spans, Seq(streamCol), "left")
          .withColumn("_band",
            coalesce(aggregate(col("_bounds"), lit(0L),
              (acc, b) => acc + when(col(idCol).cast("long") > b, 1L).otherwise(0L)),
              lit(0L)))
          .drop("_bounds")
        // phase 1: parallel per-shard sums
        val bandSums = banded.groupBy(col(streamCol), col("_band"))
          .agg(sum(col("n_tokens")).as("_band_sum"))
        // phase 2: sequential cumulation of the TINY shard table only
        val wBands = Window.partitionBy(col(streamCol)).orderBy(col("_band"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val bandOffs = bandSums
          .withColumn("_band_off", coalesce(sum(col("_band_sum")).over(wBands), lit(0L)))
          .select(col(streamCol), col("_band"), col("_band_off"))
        // phase 3: in-band running sum, sharded on (stream, band)
        val wIn = Window.partitionBy(col(streamCol), col("_band")).orderBy(col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        banded.join(bandOffs, Seq(streamCol, "_band"))
          .withColumn("start_tok",
            col("_band_off") + sum(col("n_tokens")).over(wIn) - col("n_tokens"))
      }
    withStart
      .withColumn("bin_first", floor(col("start_tok") / budget))
      .withColumn("bin_last", floor((col("start_tok") + col("n_tokens") - 1) / budget))
      .withColumn("n_bins", col("bin_last") - col("bin_first") + 1)
      .select(col(streamCol), col(idCol), col("n_tokens"), col("start_tok"),
        col("bin_first"), col("bin_last"), col("n_bins"))
  }
}
