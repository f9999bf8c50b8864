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
    * P(keep) = fraction to within 1e-6. */
  def hashGate(keyCol: Column): Column =
    conv(substring(md5(keyCol.cast("string")), 1, 15), 16, 10).cast("long") % Mod

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
    * `defaultFraction`. Map-side only; the gate key mixes the stratum
    * into the hash so a row kept at fraction f in one stratum is an
    * independent draw from the same id in another. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 1.0): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0 && f <= 1, s"fractions must be in [0,1], got $f"))
    val thresh = fractions.foldLeft(lit((defaultFraction * Mod).toLong)) {
      case (acc, (s, f)) => when(col(stratumCol) === s, lit((f * Mod).toLong)).otherwise(acc)
    }
    df.filter(hashGate(concat(col(stratumCol), lit(":"), col(idCol).cast("string"))) < thresh)
  }

  /** Concat-and-chunk sequence packing: documents of one `streamCol`
    * stream are laid end-to-end in (`orderCol`) order and the token
    * axis is cut into `budget`-sized bins — the GPT-style packing
    * where a document may straddle a bin boundary and no token is
    * padded or dropped. Emits each doc's token offset and the bin
    * range it spans; a doc with more tokens than `budget` spans
    * several bins.
    *
    * Plan shape: one window (shuffle on stream, in-partition sort on
    * order) — the running token offset is the whole computation.
    * Packing is inherently sequential PER STREAM, so parallelism =
    * number of streams: shard upstream (e.g. stream = (source, id
    * band)) to scale out; offsets within a stream are exact
    * regardless of sharding of OTHER streams.
    *
    * Zero-token docs are excluded (they occupy no token interval, so
    * bin membership is undefined for them).
    *
    * @return streamCol, idCol, n_tokens, start_tok (0-based offset),
    *         bin_first, bin_last (inclusive), n_bins
    */
  def packChunks(df: DataFrame, idCol: String, tokenCol: String,
                 streamCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col(streamCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(col(tokenCol) > 0)
      .withColumn("n_tokens", col(tokenCol).cast("long"))
      .withColumn("start_tok", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("bin_first", floor(col("start_tok") / budget))
      .withColumn("bin_last", floor((col("start_tok") + col("n_tokens") - 1) / budget))
      .withColumn("n_bins", col("bin_last") - col("bin_first") + 1)
      .select(col(streamCol), col(idCol), col("n_tokens"), col("start_tok"),
        col("bin_first"), col("bin_last"), col("n_bins"))
  }
}
