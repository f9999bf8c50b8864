package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.operators.{Incremental, Multimodal, TemporalJoin}
import graft.streaming.EventStreams

/** Blocks F/G — event analytics + multimodal binary columns
  * (SURVEY.md §2.F-G). The tumbling agg is the same function the
  * streaming path runs (graft.streaming.EventStreams).
  */
object Events {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_tumbling_agg" -> q60,
    "q61_sessionize" -> q61,
    "q62_user_funnel" -> q62,
    "q63_json_props" -> q63,
    "q64_approx_stats" -> q64,
    "q64x_sketch_bounds" -> q64x,
    "q65_asof_join" -> q65,
    "q66_range_join" -> q66,
    "q70_binary_meta" -> q70,
    "q71_media_pipeline" -> q71,
    "q89_png_pixels" -> q89,
    "q95_wav_meta" -> q95,
    "q97_wav_samples" -> q97,
    "q145_audio_bands" -> q145,
    "q148_image_dhash" -> q148,
    "q152_image_neardup" -> q152,
    "q101_jpeg_pixels" -> q101,
    "q102_image_features" -> q102,
    "q105_gif_pixels" -> q105,
    "q135_jpeg_color" -> q135,
    "q107_trailing_stats" -> q107,
    "q108_transitions" -> q108,
    "q109_sliding_agg" -> q109,
    "q112_zorder" -> q112,
    "q144_hilbert" -> q144,
    "q159_layout3" -> q159,
    "q115_interval_union" -> q115,
    "q116_scd2" -> q116,
    "q117_retention" -> q117,
    "q124_user_growth" -> q124,
    "q128_tiff_meta" -> q128,
    "q130_asof_nearest" -> q130,
    "q133_asof_forward" -> q133,
    "q147_incremental_rollup" -> q147,
    "q149_session_window" -> q149,
    "q154_volume_anomaly" -> q154
  )

  /** Incremental rollup maintenance (the materialized-view update
    * identity, gated): the events table split into 3 ingest batches
    * (event_id % 3 — the split dimension is arbitrary, that's the
    * point), each reduced to its per-type PARTIAL STATE
    * ([[Incremental.rollupState]]), then merged
    * ([[Incremental.mergeStates]]) — and the merged rollup must
    * equal a one-shot full recompute on every exact surface (count /
    * exact decimal sum / min / max), which is what the oracle
    * computes directly. The non-mergeable NDV travels as an HLL
    * sketch whose unioned estimate lands under the q131 envelope
    * (exact n_users hash-gated from a full recompute, sketch as
    * ndv_ok). */
  def q147(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val batches = (0 to 2).map(i =>
      Incremental.rollupState(e.filter(pmod(col("event_id"), lit(3)) === i),
        Seq("event_type"), "value", "user_id"))
    val merged = Incremental.mergeStates(batches, Seq("event_type"))
    val exact = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    merged.join(exact, "event_type")
      .select(col("event_type"), col("n_rows").as("n_events"),
        col("sum_v").cast("double").as("sum_value"),
        col("min_v").as("min_value"), col("max_v").as("max_value"),
        col("n_users"),
        (abs(col("ndv_est") - col("n_users")).cast("double") /
          col("n_users").cast("double") <= 0.15).as("ndv_ok"))
      .orderBy(col("event_type"))
  }

  /** NATIVE session windows (Spark's session_window — the declarative
    * sessionizer, Spark-first beside q61's lag/cumsum formulation and
    * SessionizeStream's stateful one): per (user, session) start,
    * end (= last event + gap) and event count under a 30-minute gap.
    * BOUNDARY SEMANTICS, established by EXPERIMENT (EventsSpec's
    * constructed boundary fixture — the gate corpus has no
    * exact-boundary gap, checked, so the hash cannot discriminate):
    * native sessions merge INCLUSIVELY — diff == gap merges, only
    * diff > gap splits, the same rule as q61 (an initially-assumed
    * strict rule was refuted by the fixture). The oracle replays
    * lag/cumsum with `> gap` opening a session. Timestamps gate as
    * epoch micros (the portable surface). */
  def q149(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("start_us"))
  }

  /** Ingest-volume anomaly detection by ROBUST integer statistics
    * (median/MAD — the outlier-insensitive pair; a mean/stddev alarm
    * is blind exactly when it matters, since the anomaly itself
    * drags the mean): per event type, daily counts flagged when
    * |n − median| > 3·MAD, with BOTH medians computed by
    * [[graft.operators.Profile.exactQuantilesBy]]'s integer
    * histogram rule (cum·2 ≥ N — no interpolation rule to diverge;
    * MAD = 0 degenerates to any-deviation-flags, the comparison's
    * natural behavior). The type×day surface is rollup-sized, so
    * the per-type windows stay histogram-bounded (the q113/q122
    * discipline); partial boundary days flag themselves naturally —
    * exactly what an ingest monitor wants. Oracle replays both
    * histogram medians and the flag arithmetic. */
  def q154(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_events"))
    val med = graft.operators.Profile
      .exactQuantilesBy(daily, "event_type", "n_events", 2)
      .select(col("event_type"), col("cut_value").as("med"))
    val dev = daily.join(med, "event_type")
      .withColumn("adev", abs(col("n_events") - col("med")))
    val mad = graft.operators.Profile
      .exactQuantilesBy(dev, "event_type", "adev", 2)
      .select(col("event_type"), col("cut_value").as("mad"))
    daily.join(med, "event_type").join(mad, "event_type")
      .withColumn("anomalous",
        abs(col("n_events") - col("med")) > lit(3L) * col("mad"))
      .select(col("event_type"), col("day"), col("n_events"), col("med"),
        col("mad"), col("anomalous"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Tumbling 1-hour window aggregation (shared with streaming). */
  def q60(spark: SparkSession, dir: String): DataFrame =
    EventStreams.tumblingAgg(Tables.events(spark, dir))
      .orderBy(col("window_start"), col("event_type"))

  /** Gap-based sessionization (30-minute inactivity): windowed lag
    * marks session starts, a running sum numbers sessions — one
    * shuffle on user_id covers both window passes. */
  def q61(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("gap_us", unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser)))
      .withColumn("is_new", when(col("gap_us").isNull || col("gap_us") > 30L * 60 * 1000000, 1).otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** Ordered funnel: first view -> first later click -> first later
    * purchase; per-stage user counts. Each stage is an aggregate then
    * a user-key join — all three joins co-partition on user_id. */
  def q62(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("vts"))
    val c = e.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") > col("vts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("cts"))
    val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts") > col("cts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("pts"))
    v.agg(count(lit(1)).as("n_view_users")).crossJoin(
      c.agg(count(lit(1)).as("n_click_users"))).crossJoin(
      p.agg(count(lit(1)).as("n_purchase_users")))
  }

  /** Semi-structured JSON column handling: extract typed fields from
    * the props payload (schema-on-read, no UDF). */
  def q63(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"), count(col("k")).as("n_with_k"))
      .orderBy(col("event_type"))

  /** Sketch aggregates: HyperLogLog distinct counts + quantile sketch.
    * Sketch internals are engine-specific => rows-only oracle;
    * EventsSpec pins accuracy against exact values. */
  def q64(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("approx_median_value"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** The hash-checkable half of q64: exact n_events / n_users ride
    * the same aggregate, and the sketch outputs are turned into
    * BOUNDS-CHECK booleans the oracle states as TRUE — the driver
    * gate then verifies the sketches' error envelope instead of
    * skipping the query entirely. The bounds are sized so TRUE is
    * ROBUST on fresh data, not just on this dataset: HLL's default
    * rsd is ~5% (1 sigma — exceeded ~32% of the time per group), so
    * ndv_ok allows 15% (~3 sigma); med_ok is tie-aware — under heavy
    * value ties the <=-rank of the true median legitimately exceeds
    * 0.55, so the check brackets the median's rank interval instead
    * (strictly-below fraction <= 0.55 AND at-or-below >= 0.45). */
  def q64x(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val agg = e.groupBy(col("event_type")).agg(
      count(lit(1)).as("n_events"),
      countDistinct(col("user_id")).as("n_users"),
      approx_count_distinct(col("user_id")).as("approx_users"),
      percentile_approx(col("value"), lit(0.5), lit(1000)).as("amed"))
    val medRank = e.join(agg.select(col("event_type"), col("amed")), "event_type")
      .groupBy(col("event_type"))
      .agg(
        (sum(when(col("value") < col("amed"), 1).otherwise(0)).cast("double") /
          count(lit(1)).cast("double")).as("frac_lt"),
        (sum(when(col("value") <= col("amed"), 1).otherwise(0)).cast("double") /
          count(lit(1)).cast("double")).as("frac_le"))
    agg.join(medRank, "event_type")
      .select(col("event_type"), col("n_events"), col("n_users"),
        (abs(col("approx_users") - col("n_users")).cast("double") /
          col("n_users").cast("double") <= 0.15).as("ndv_ok"),
        (col("frac_lt") <= 0.55 && col("frac_le") >= 0.45).as("med_ok"))
      .orderBy(col("event_type"))
  }

  /** As-of join: every click annotated with the most recent view at
    * or before it by the same user, within a 2-hour tolerance —
    * "which impression drove this interaction", the classic
    * event-attribution as-of. Single-shuffle merge-as-of (no join
    * node; see TemporalJoin.asOfJoin); views sharing a (user, ts) are
    * collapsed to the max value deterministically, and a latest-view
    * older than the tolerance nulls out (as-of is a LEFT join). */
  def q65(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("cts"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts")).as("vts"),
        col("value").as("view_value"))
    TemporalJoin.asOfJoin(clicks, views, "user_id", "cts", "vts",
        tolerance = Some(2L * 3600 * 1000000))
      // unmatched-left sentinels instead of nulls so the driver's
      // hash compare is engine-agnostic (the operator itself keeps
      // real nulls; both engine and oracle coalesce identically here)
      .select(col("user_id"), col("click_id"), col("cts"),
        coalesce(col("view_value"), lit(-1.0)).as("view_value"),
        coalesce(col("matched_ts"), lit(-1L)).as("matched_ts"))
      .orderBy(col("click_id"))
  }

  /** NEAREST-direction as-of (the q65 shape with the closest view on
    * EITHER side of each click, 1-hour tolerance; distance ties
    * prefer the backward match): gates the third as-of direction —
    * backward is q65, forward/nearest were spec-only until here.
    * Same single-shuffle merge, no join node. */
  def q130(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("cts"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts")).as("vts"),
        col("value").as("view_value"))
    TemporalJoin.asOfJoinNearest(clicks, views, "user_id", "cts", "vts",
        tolerance = Some(3600L * 1000000))
      .select(col("user_id"), col("click_id"), col("cts"),
        coalesce(col("view_value"), lit(-1.0)).as("view_value"),
        coalesce(col("matched_ts"), lit(-1L)).as("matched_ts"))
      .orderBy(col("click_id"))
  }

  /** FORWARD-direction as-of ("what happened next": the EARLIEST
    * view at-or-after each click, 2h tolerance) — with q65 (backward)
    * and q130 (nearest) this puts all three as-of directions under
    * the driver gate. Same single-shuffle merge; the forward scan is
    * the reversed sort of the same tagged union. */
  def q133(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("cts"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts")).as("vts"),
        col("value").as("view_value"))
    TemporalJoin.asOfJoin(clicks, views, "user_id", "cts", "vts",
        forward = true, tolerance = Some(2L * 3600 * 1000000))
      .select(col("user_id"), col("click_id"), col("cts"),
        coalesce(col("view_value"), lit(-1.0)).as("view_value"),
        coalesce(col("matched_ts"), lit(-1L)).as("matched_ts"))
      .orderBy(col("click_id"))
  }

  /** Range join: per purchase, the count and (order-independent
    * decimal) sum of view values in the preceding hour by the same
    * user — bucketized interval join (1-hour buckets), so the pair
    * space is bounded by temporal locality instead of per-user
    * all-pairs. Purchases with no preceding view keep a 0 count and
    * null sum. */
  def q66(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val hourUs = 3600L * 1000000
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("pts"))
      .withColumn("w_start", col("pts") - hourUs)
      .withColumn("w_end", col("pts"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts")).as("vts"),
        col("value").as("view_value"))
    val perPurchase = TemporalJoin.rangeJoin(views, purchases, "user_id",
        "vts", "w_start", "w_end", bucketWidth = hourUs)
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("view_value").cast("decimal(18,6)")).cast("double").as("s"))
    purchases.join(perPurchase, Seq("purchase_id"), "left")
      .select(col("purchase_id"), col("user_id"),
        coalesce(col("n"), lit(0L)).as("n_views_1h"),
        coalesce(col("s"), lit(-1.0)).as("sum_view_value"))
      .orderBy(col("purchase_id"))
  }

  /** Multimodal header decode (SURVEY.md §2.G): per-doc synthetic
    * payloads carrying REAL PNG/JPEG/GIF headers (dims closed-form in
    * doc_id, encoded in each format's genuine byte layout), decoded
    * by the batched partition-wise header parser. The oracle restates
    * the closed forms, so the parser's endian/marker-scan logic is
    * what the hash check actually exercises. */
  def q70(spark: SparkSession, dir: String): DataFrame = {
    val payloads = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"),
        Multimodal.syntheticMediaUdf(col("doc_id")).as("payload"))
    Multimodal.decodeBatch(payloads)
      .select(col("id").as("doc_id"), col("n_bytes"),
        col("width"), col("height"), col("format"))
      .orderBy(col("doc_id"))
  }

  /** TIFF header decode — the one raster format whose BYTE ORDER is
    * data-dependent ("II"/"MM" magic): synthetic single-IFD TIFFs
    * alternate endianness by id parity, and the gate checks the
    * decoder's endian-dispatched IFD walk (tag/type/inline-SHORT
    * reads) against pure arithmetic, including which endianness each
    * payload declared. */
  def q128(spark: SparkSession, dir: String): DataFrame = {
    val payloads = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"),
        Multimodal.syntheticTiffUdf(col("doc_id")).as("payload"))
    Multimodal.decodeBatch(payloads)
      .select(col("id").as("doc_id"), col("n_bytes"),
        col("width"), col("height"), col("format"))
      .orderBy(col("doc_id"))
  }

  /** Media pipeline over binary payloads: frame-sample (stride 2,
    * 64-byte frames) + stub-resize to 64x64 — per-doc frame counts
    * and sizes, all byte-arithmetic the oracle can restate. */
  def q71(spark: SparkSession, dir: String): DataFrame = {
    val payloads = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"), col("text").cast("binary").as("payload"))
    val frames = Multimodal.frameSampleBatch(payloads, stride = 2, frameBytes = 64)
      .groupBy(col("id")).agg(count(lit(1)).as("n_frames"))
    val resized = Multimodal.resizeBatch(payloads, w = 64, h = 64)
      .select(col("id"), length(col("payload")).cast("int").as("resized_len"))
    payloads.select(col("id"), length(col("payload")).cast("int").as("n_bytes"))
      .join(frames, "id").join(resized, "id")
      .select(col("id").as("doc_id"), col("n_bytes"), col("n_frames"), col("resized_len"))
      .orderBy(col("doc_id"))
  }

  /** PIXEL-truth PNG decode (SURVEY.md §2.G, the r5 verdict's "next
    * honest increment"): per-doc payloads are GENUINE baseline PNGs —
    * real zlib IDAT streams, real chunk CRCs, scanline filters
    * cycling through all five types, color type cycling
    * gray/RGB/RGBA — whose pixel content is closed-form in doc_id
    * (sample (x,y,c) = (3x+7y+11c+id) mod 256). The pipeline runs
    * decode → nearest-neighbor resize to 8x8 → RE-ENCODE → decode
    * again, and gates byte sums of both rasters; the oracle restates
    * the closed forms (including the resize's floor source mapping),
    * so inflate, unfiltering, CRC handling, resampling and the
    * encoder round-trip are all inside the hash check. */
  def q89(spark: SparkSession, dir: String): DataFrame = {
    val pixSum = udf((b: Array[Byte]) => {
      var s = 0L; var i = 0
      while (i < b.length) { s += (b(i) & 0xff); i += 1 }
      s
    })
    val payloads = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"),
        Multimodal.syntheticPngUdf(col("doc_id")).as("payload"))
    val dec = Multimodal.decodePixelsBatch(payloads)
      .select(col("id"), col("width"), col("height"), col("channels"),
        pixSum(col("pixels")).as("pix_sum"))
    val rz = Multimodal.decodePixelsBatch(
        Multimodal.resizeBatch(payloads, w = 8, h = 8))
      .select(col("id"), pixSum(col("pixels")).as("rz_sum"))
    dec.join(rz, "id")
      .select(col("id").as("doc_id"), col("width"), col("height"),
        col("channels"), col("pix_sum"), col("rz_sum"))
      .orderBy(col("doc_id"))
  }

  /** Perceptual image dHash over REAL decoded PNG pixels — the image
    * analogue of SimHash, tying block G to the dedup family (near-
    * identical images land at small hamming distance; the banded
    * hamming machinery applies unchanged): nearest-neighbor 9×8 luma
    * grid (floor source mapping — exact on any dims), BT.601 integer
    * luma, bit k = i·8+j iff right neighbor brighter; 64 bits split
    * into two 32-bit halves so the oracle's bit arithmetic stays
    * overflow-free. Same genuine-PNG fixture as q89, so inflate /
    * unfilter / color-type handling all sit inside the hash; the
    * oracle restates pixels, luma, grid and bits in closed form.
    * Scale-invariance (2× pixel replication) is spec-pinned — the
    * property that makes it a PERCEPTUAL hash. */
  def q148(spark: SparkSession, dir: String): DataFrame = {
    val payloads = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"),
        Multimodal.syntheticPngUdf(col("doc_id")).as("payload"))
    Multimodal.dhashBatch(payloads)
      .select(col("id").as("doc_id"), col("width"), col("height"),
        col("dhash_hi"), col("dhash_lo"))
      .orderBy(col("doc_id"))
  }

  /** IMAGE near-dup pairs by dHash hamming — q148 composed into the
    * dedup family's banded machinery ([[graft.operators.Dedup.hammingPairs]],
    * the simhash pigeonhole join extracted signature-generic): decode
    * PNGs → 64-bit dHash packed into one signature word → all pairs
    * within hamming 12, exactly once, exact distances. The synthetic
    * corpus plants REAL near-dups structurally (ids 75 apart share
    * dims/channels and differ by a constant luma shift, so their
    * comparison grids agree except at mod-256 wraps). Oracle:
    * closed-form hashes (the q148 replay) self-joined with part-wise
    * bit_count(xor) — the banding algorithm is the engine's
    * business, the oracle states the answer (the q32 discipline). */
  def q152(spark: SparkSession, dir: String): DataFrame = {
    val payloads = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"),
        Multimodal.syntheticPngUdf(col("doc_id")).as("payload"))
    val sigs = Multimodal.dhashBatch(payloads)
      // the dhashBatch contract: undecodable rows carry the width-0
      // zero-hash sentinel and MUST NOT enter the banding (they'd be
      // one giant hamming-0 clique); the gate corpus is all-decodable
      // so this filter drops nothing there
      .filter(col("width") > 0)
      .select(col("id"),
        array(shiftleft(col("dhash_hi"), 32).bitwiseOR(col("dhash_lo")))
          .as("sig"))
    graft.operators.Dedup.hammingPairsCollapsed(sigs, nWords = 1, maxHamming = 12)
      .orderBy(col("i"), col("j"))
  }

  /** REAL WAV (RIFF) header decode — the audio leg of block G: per-doc
    * payloads carry closed-form PCM parameters in the genuine
    * little-endian RIFF byte layout (fmt + zeroed data chunk); the
    * oracle restates the closed forms, so the chunk walk, endian
    * reads and the byte-rate/block-align consistency checks are what
    * the hash gate exercises. */
  def q95(spark: SparkSession, dir: String): DataFrame = {
    val payloads = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"),
        Multimodal.syntheticWavUdf(col("doc_id")).as("payload"))
    Multimodal.decodeWavBatch(payloads)
      .select(col("id").as("doc_id"), col("sample_rate"), col("channels"),
        col("bits"), col("data_bytes"), col("n_frames"))
      .orderBy(col("doc_id"))
  }

  /** REAL PCM16 sample decode + the integer DSP surfaces a
    * silence/quality filter runs (sum, energy, extrema, zero
    * crossings): synthetic mono WAVs carry a closed-form full-range
    * sawtooth in genuine little-endian int16 bytes, so the byte-level
    * sample decode is what the hash check exercises. */
  def q97(spark: SparkSession, dir: String): DataFrame = {
    val payloads = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"),
        Multimodal.syntheticWavPcm16Udf(col("doc_id")).as("payload"))
    Multimodal.decodePcm16Batch(payloads)
      .select(col("id").as("doc_id"), col("n_samples"), col("sum_s"),
        col("sum_sq"), col("min_s"), col("max_s"), col("n_zc"))
      .orderBy(col("doc_id"))
  }

  /** Haar filterbank band energies over the first 64 REAL decoded
    * PCM16 samples — the audio analogue of q102's image features
    * (the band-energy profile a silence/noise/bandwidth filter
    * thresholds on): 6 levels of unnormalized pairwise sum/diff
    * halving, E_k = Σ d_k² exact integers, plus the squared
    * approximation (frame sum). Same synthetic sawtooth fixture as
    * q97, so the byte-level WAV decode sits inside the hash; the
    * oracle replays the filterbank as 6 chained even/odd self-join
    * CTE rounds. The multiresolution identity tying these surfaces
    * to q97's sum_sq is spec-pinned (FormatsSpec). */
  def q145(spark: SparkSession, dir: String): DataFrame = {
    val payloads = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"),
        Multimodal.syntheticWavPcm16Udf(col("doc_id")).as("payload"))
    val h = Multimodal.decodeHaarBatch(payloads, frame = 64, levels = 6)
    h.select(
        (col("id").as("doc_id") +:
          (1 to 6).map(k => element_at(col("energies"), k).as(s"e$k"))) :+
          col("approx_sq"): _*)
      .orderBy(col("doc_id"))
  }

  /** REAL baseline-JPEG pixel decode, driver-gated: ImageIO (an
    * independent encoder) writes flat-block quality-1.0 grayscale
    * JPEGs whose DC-only spectra round-trip bit-exactly, so the
    * oracle restates the decoded pixels in closed form — the Huffman
    * stream, cross-block DC prediction, dequantization and IDCT are
    * what the hash check exercises (lossy-general parity vs ImageIO
    * is spec territory: ±1 gray level). */
  def q101(spark: SparkSession, dir: String): DataFrame = {
    val pixSum = udf((b: Array[Byte]) => {
      var s = 0L; var i = 0
      while (i < b.length) { s += (b(i) & 0xff); i += 1 }
      s
    })
    val pixMinMax = udf((b: Array[Byte]) => {
      var mn = 255; var mx = 0; var i = 0
      while (i < b.length) {
        val v = b(i) & 0xff
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      if (b.length == 0) (0, 0) else (mn, mx)
    })
    val payloads = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"),
        Multimodal.syntheticJpegGrayUdf(col("doc_id")).as("payload"))
    Multimodal.decodeJpegPixelsBatch(payloads)
      .select(col("id").as("doc_id"), col("width"), col("height"),
        pixSum(col("pixels")).as("pix_sum"),
        pixMinMax(col("pixels")).getField("_1").as("px_min"),
        pixMinMax(col("pixels")).getField("_2").as("px_max"))
      .orderBy(col("doc_id"))
  }

  /** REAL feature extraction on REAL decoded pixels: gradient
    * energies (blur/flat detector) and the 16-bin intensity histogram
    * over the PNG rasters — every surface an exact integer the
    * oracle restates from the generator formula; the normalized
    * float vector rides in spec territory (it composes with the ANN
    * operators). */
  def q102(spark: SparkSession, dir: String): DataFrame = {
    val payloads = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"),
        Multimodal.syntheticPngUdf(col("doc_id")).as("payload"))
    val feats = Multimodal.rasterFeatureBatch(payloads)
    feats.select(
      (Seq(col("id").as("doc_id"), col("n_px"), col("px_sum"), col("px_sq"),
        col("grad_x"), col("grad_y")) ++
        (0 until 16).map(b => element_at(col("bins"), b + 1).as(s"b$b"))): _*)
      .orderBy(col("doc_id"))
  }

  /** REAL GIF pixel decode — the LZW leg completing the pixel trio
    * (q89 PNG inflate, q101 JPEG Huffman+IDCT): payloads are genuine
    * GIFs written by the JDK's independent ImageIO encoder from
    * closed-form INDEXED content, decoded by this library's
    * variable-code-width LZW + palette mapping; per-channel sums and
    * extrema gate every RGB sample against the generator formulas
    * (palette layout free to differ — RGB content cannot). */
  def q105(spark: SparkSession, dir: String): DataFrame = {
    val chSum = udf((b: Array[Byte], c: Int) => {
      var s = 0L; var i = c
      while (i < b.length) { s += (b(i) & 0xff); i += 3 }
      s
    })
    val payloads = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"),
        Multimodal.syntheticGifUdf(col("doc_id")).as("payload"))
    Multimodal.decodeGifPixelsBatch(payloads)
      .select(col("id").as("doc_id"), col("width"), col("height"),
        col("channels"),
        chSum(col("pixels"), lit(0)).as("r_sum"),
        chSum(col("pixels"), lit(1)).as("g_sum"),
        chSum(col("pixels"), lit(2)).as("b_sum"))
      .orderBy(col("doc_id"))
  }

  /** COLOR baseline-JPEG pixel decode (4:2:0) — the r6 verdict's
    * "honest next increment" past q101's grayscale envelope: hand
    * built fixture bytes ([[graft.operators.Jpeg.synthColorBytes]])
    * carry DC-only flat blocks chosen directly in YCbCr space (the
    * one corner where the lossy format round-trips exactly), through
    * the full color path — interleaved 2×2+1+1 MCU walk, per
    * component DC predictors with a mid-scan restart reset, plane
    * edge clipping (a padding luma row, a half-clipped chroma row),
    * replication upsampling and the decoder's PINNED JFIF YCbCr→RGB
    * rounding, which the oracle restates formula-for-formula.
    * ImageIO parity (both decode directions) is spec territory
    * (JpegColorSpec) — conforming upsamplers differ at tile edges. */
  def q135(spark: SparkSession, dir: String): DataFrame = {
    val chSum = udf((b: Array[Byte], c: Int) => {
      var s = 0L; var i = c
      while (i < b.length) { s += (b(i) & 0xff); i += 3 }
      s
    })
    val chMin = udf((b: Array[Byte], c: Int) => {
      var m = 255; var i = c
      while (i < b.length) { m = math.min(m, b(i) & 0xff); i += 3 }
      m.toLong
    })
    val chMax = udf((b: Array[Byte], c: Int) => {
      var m = 0; var i = c
      while (i < b.length) { m = math.max(m, b(i) & 0xff); i += 3 }
      m.toLong
    })
    val payloads = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"),
        Multimodal.syntheticJpegColorUdf(col("doc_id")).as("payload"))
    Multimodal.decodeJpegPixelsBatch(payloads)
      .select(col("id").as("doc_id"), col("width"), col("height"),
        col("channels"),
        chSum(col("pixels"), lit(0)).as("r_sum"),
        chSum(col("pixels"), lit(1)).as("g_sum"),
        chSum(col("pixels"), lit(2)).as("b_sum"),
        chMin(col("pixels"), lit(0)).as("r_min"),
        chMax(col("pixels"), lit(2)).as("b_max"))
      .orderBy(col("doc_id"))
  }

  /** Per-event trailing-hour user velocity features: for EVERY event,
    * the count and (order-independent decimal) sum of the same user's
    * events in [ts - 1h, ts] — a RANGE frame over a micros order key,
    * one shuffle on user_id, no join. Complements q66: the window
    * frame wins when the output is one row per INPUT row (dense
    * feature materialization, frame state slides in O(1) per row);
    * q66's bucketized range join wins when the probe side is sparse
    * (few purchases against many views — the frame would pay for
    * rows nobody asked about). Peers at an equal timestamp are all
    * inside each other's frame (RANGE semantics), so ties need no
    * ordering beyond the key. */
  def q107(spark: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
      .rangeBetween(-hourUs, 0)
    Tables.events(spark, dir)
      .withColumn("tus", unix_micros(col("ts")))
      .withColumn("n_trail_1h", count(lit(1)).over(w))
      .withColumn("sum_trail_1h",
        sum(col("value").cast("decimal(18,6)")).over(w).cast("double"))
      .select(col("event_id"), col("user_id"), col("n_trail_1h"), col("sum_trail_1h"))
      .orderBy(col("event_id"))
  }

  /** Event-type transition counts (the behavior Markov chain): each
    * user's events in (ts, event_id) order — a total order, event_id
    * is unique — paired with their successor via lead(), then one
    * global aggregate over the 5x5 type-pair space. Map-side partial
    * aggregation collapses the shuffle to at most |types|^2 rows per
    * partition regardless of corpus size. */
  def q108(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Z-order layout keys (the lakehouse data-clustering primitive):
    * Morton-interleave the user dimension with the hour-index
    * dimension, so writing ORDER BY zkey co-locates rows close in
    * BOTH dimensions into the same files/row groups and min/max
    * pruning skips on either predicate. The key is the codegen'd
    * graftext.ZOrderKey (two branchless mask cascades per row); the
    * oracle replays the interleave bit-by-bit with an unnest over
    * the 16 bit positions. Gate includes the zkey ORDERING — the
    * layout itself — not just the key values. */
  def q112(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("x", pmod(col("user_id"), lit(65536L)))
      .withColumn("y", pmod(expr("unix_micros(ts) div 3600000000"), lit(65536L)))
    e.select(col("event_id"), col("x"), col("y"),
        org.apache.spark.sql.graftext.Bits.zorder(col("x"), col("y")).as("zkey"))
      .orderBy(col("zkey"), col("event_id"))
  }

  /** Hilbert-curve layout keys — q112's sibling on the SAME grid
    * (user × hour-index mod 2^16) with the strictly-better-locality
    * curve: consecutive Hilbert indices are always grid neighbors
    * (unit Manhattan step — spec-pinned; Z-order jumps at quadrant
    * seams), so row-group min/max boxes stay tighter at identical
    * sort cost (pruning measured head-to-head off real parquet
    * footers in BENCH.md). Key = codegen'd graftext.HilbertKey (16
    * branch-light reflect/transpose rounds per row); the oracle
    * replays the walk as 16 chained CTE rounds of the identical
    * integer CASE arithmetic — key values AND the layout ordering
    * both inside the hash. */
  def q144(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("x", pmod(col("user_id"), lit(65536L)))
      .withColumn("y", pmod(expr("unix_micros(ts) div 3600000000"), lit(65536L)))
    e.select(col("event_id"), col("x"), col("y"),
        org.apache.spark.sql.graftext.Bits.hilbert(col("x"), col("y")).as("hkey"))
      .orderBy(col("hkey"), col("event_id"))
  }

  /** 3-DIMENSIONAL layout keys (the r7 verdict's task #4 — real
    * lakehouse tables cluster on source × day × lang, not two dims):
    * q112/q144's grid extended by a third dimension (the md5-fold of
    * event_type — the portable categorical hash), both 48-bit keys
    * gated in one row: zkey3 = graftext.ZOrderKey3's d-way
    * interleave (bit i of dim j at 3i+j), hkey3 =
    * graftext.HilbertKey3's Skilling d-dim walk (inverse-undo
    * rounds, Gray encode, t-fold, MSB-first gather), both codegen'd
    * TernaryExpressions. The oracle replays the interleave as a bit
    * unnest and the Hilbert walk as 15 chained rounds of the
    * IDENTICAL integer CASE arithmetic (each round = the three
    * sequential axis steps nested) + the Gray/t-fold/gather tail —
    * key values AND the hkey3 layout order inside the hash.
    * Locality (unit-step bijection in all 3 dims) and 3-predicate
    * footer pruning are spec/BENCH territory (BitsSpec exhaustive
    * order-4 cube; ScaleStress layout3). */
  def q159(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("x", pmod(col("user_id"), lit(65536L)))
      .withColumn("y", pmod(expr("unix_micros(ts) div 3600000000"), lit(65536L)))
      .withColumn("z", pmod(
        conv(substring(md5(col("event_type")), 1, 15), 16, 10).cast("long"),
        lit(65536L)))
    e.select(col("event_id"), col("x"), col("y"), col("z"),
        org.apache.spark.sql.graftext.Bits.zorder3(col("x"), col("y"), col("z")).as("zkey3"),
        org.apache.spark.sql.graftext.Bits.hilbert3(col("x"), col("y"), col("z")).as("hkey3"))
      .orderBy(col("hkey3"), col("event_id"))
  }

  /** Sliding 1-hour/15-minute window counts per event type — the
    * batch leg of [[EventStreams.slidingAgg]] (the streaming spec
    * reconciles stream == batch on the same function). Each event
    * lands in exactly width/slide = 4 windows; Spark expands windows
    * BEFORE the aggregate, so the shuffle carries (4 x events) rows
    * collapsed by map-side partials to at most windows x types. */
  def q109(spark: SparkSession, dir: String): DataFrame =
    EventStreams.slidingAgg(Tables.events(spark, dir))
      .orderBy(col("window_start"), col("event_type"))

  /** Interval-union coverage per user (the islands-and-gaps
    * aggregate): each event spans [ts, ts + (1 + k%30) minutes) with
    * k from the JSON props — deterministic integer micros, so the
    * covered time is exact. A row starts a new island when it begins
    * AFTER the running max end of every earlier interval; islands
    * collapse in one per-user aggregate. The self-join-free sibling
    * of q66's range join: coverage needs NO pair space at all — one
    * shuffle on user_id, two window passes, per-user sequential
    * work bounded by that user's event count. */
  def q115(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val e = Tables.events(spark, dir)
      .withColumn("tus", unix_micros(col("ts")))
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("eus", col("tus") + (lit(1L) + pmod(col("k"), lit(30L))) * 60000000L)
    e.withColumn("prev_max_end",
        max(col("eus")).over(byUser.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("is_new",
        when(col("prev_max_end").isNull || col("tus") > col("prev_max_end"), 1L).otherwise(0L))
      .withColumn("island", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("tus")).as("s"), max(col("eus")).as("e"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("e") - col("s")).as("covered_us"))
      .orderBy(col("user_id"))
  }

  /** SCD2-style validity intervals: consecutive runs of the same
    * event_type per user collapse into [valid_from, valid_to) rows,
    * valid_to = the NEXT run's start (null while current) — the
    * change-data-capture snapshot build every warehouse dimension
    * load runs. lag() marks run starts, a running sum numbers runs,
    * one groupBy collapses them, lead() closes the intervals — all
    * on the single user_id shuffle. */
  def q116(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val byRun = Window.partitionBy(col("user_id")).orderBy(col("valid_from_us"))
    Tables.events(spark, dir)
      .withColumn("tus", unix_micros(col("ts")))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .withColumn("is_change",
        when(col("prev_type").isNull || col("prev_type") =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("run", sum(col("is_change")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("run"), col("event_type"))
      .agg(min(col("tus")).as("valid_from_us"), count(lit(1)).as("n_events"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(byRun))
      .select(col("user_id"), col("event_type"), col("valid_from_us"),
        col("valid_to_us"), col("n_events"))
      .orderBy(col("user_id"), col("valid_from_us"))
  }

  /** Cohort retention matrix: users cohorted by FIRST-ACTIVE epoch
    * day, then distinct-user counts per (cohort_day, day_offset) —
    * the day-N retention table every growth dashboard runs. Day
    * arithmetic stays on integer epoch days (unix_micros div
    * 86400e6): no calendar/timezone rule can diverge between
    * engines. Shape: one per-user min aggregate, one user-key join
    * back (co-partitioned), one count-distinct aggregate. */
  def q117(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
    val cohort = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    e.join(cohort, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Daily growth curve: active users, NEW users (first-ever-seen
    * that day), and the running cumulative distinct-user count —
    * computed as the prefix sum of new-user counts, which turns
    * "cumulative COUNT(DISTINCT)" (quadratic re-scan as a windowed
    * distinct) into one per-user min + a DAY-histogram-sized prefix
    * window (the q113 discipline: the global window orders days, not
    * rows). Integer epoch days, q117's calendar-free arithmetic. */
  def q124(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).filter(col("user_id").isNotNull)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
    val newPerDay = e.groupBy(col("user_id")).agg(min(col("day")).as("fday"))
      .groupBy(col("fday").as("day")).agg(count(lit(1)).as("n_new"))
    val activePerDay = e.groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("n_active"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    activePerDay.join(newPerDay, Seq("day"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("cum_users", sum(col("n_new")).over(w))
      .orderBy(col("day"))
  }

  /** q148/q152 shared replay: closed-form raster pixels → integer
    * luma on the 9×8 floor-mapped grid → dHash bits → the two
    * 32-bit halves. */
  private val sqlDhashCtes: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(4 + doc_id % 5 AS BIGINT) AS w,
      |    CAST(4 + (doc_id * 3) % 5 AS BIGINT) AS h,
      |    CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS ch
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, ch, i.g AS i, j.g AS j,
      |    (j.g * w) // 9 AS x, (i.g * h) // 8 AS y
      |  FROM d, unnest(generate_series(0, 7)) i(g),
      |       unnest(generate_series(0, 8)) j(g)),
      |lum AS (
      |  SELECT doc_id, i, j,
      |    CASE WHEN ch = 1 THEN (3 * x + 7 * y + doc_id) % 256
      |      ELSE (299 * ((3 * x + 7 * y + doc_id) % 256)
      |          + 587 * ((3 * x + 7 * y + 11 + doc_id) % 256)
      |          + 114 * ((3 * x + 7 * y + 22 + doc_id) % 256)) // 1000 END AS l
      |  FROM g),
      |b AS (
      |  SELECT a.doc_id, a.i, a.j, CASE WHEN n.l > a.l THEN 1 ELSE 0 END AS bit
      |  FROM lum a JOIN lum n
      |    ON a.doc_id = n.doc_id AND a.i = n.i AND n.j = a.j + 1
      |  WHERE a.j < 8),
      |hh AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN i * 8 + j >= 32
      |      THEN bit * (CAST(1 AS BIGINT) << (i * 8 + j - 32)) ELSE 0 END) AS BIGINT) AS dhash_hi,
      |    CAST(sum(CASE WHEN i * 8 + j < 32
      |      THEN bit * (CAST(1 AS BIGINT) << (i * 8 + j)) ELSE 0 END) AS BIGINT) AS dhash_lo
      |  FROM b GROUP BY doc_id)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // q128: every surface restated from the generator's closed form —
    // n_bytes is the fixed 38-byte single-IFD layout, dims are pure
    // arithmetic in id, format records the id-parity endianness.
    "q128_tiff_meta" ->
      """SELECT doc_id,
        |  CAST(38 AS INT) AS n_bytes,
        |  CAST(3 + doc_id % 9 AS INT) AS width,
        |  CAST(2 + (doc_id * 3) % 9 AS INT) AS height,
        |  CASE WHEN doc_id % 2 = 0 THEN 'tiff-le' ELSE 'tiff-be' END AS format
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q124_user_growth" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events WHERE user_id IS NOT NULL),
        |np AS (
        |  SELECT fday AS day, count(*) AS n_new FROM (
        |    SELECT user_id, min(day) AS fday FROM e GROUP BY user_id)
        |  GROUP BY fday),
        |ap AS (SELECT day, count(DISTINCT user_id) AS n_active FROM e GROUP BY day)
        |SELECT ap.day, ap.n_active,
        |  coalesce(np.n_new, 0) AS n_new,
        |  CAST(sum(coalesce(np.n_new, 0)) OVER (ORDER BY ap.day) AS BIGINT) AS cum_users
        |FROM ap LEFT JOIN np ON np.day = ap.day
        |ORDER BY ap.day""".stripMargin,
    // q115/q116: the same window recurrences stated in SQL — the
    // (ts, event_id) tie order is total, so the island/run numbering
    // is engine-independent.
    "q115_interval_union" ->
      """WITH iv AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus,
        |    epoch_us(ts) + (1 + (CAST(json_extract_string(props, '$.k') AS BIGINT) % 30)) * 60000000 AS eus
        |  FROM events),
        |marked AS (
        |  SELECT user_id, tus, eus,
        |    CASE WHEN max(eus) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |           OR tus > max(eus) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      THEN 1 ELSE 0 END AS is_new,
        |    event_id
        |  FROM iv),
        |numbered AS (
        |  SELECT user_id, tus, eus,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM marked),
        |islands AS (
        |  SELECT user_id, island, min(tus) AS s, max(eus) AS e
        |  FROM numbered GROUP BY user_id, island)
        |SELECT user_id, count(*) AS n_islands,
        |  CAST(sum(e - s) AS BIGINT) AS covered_us
        |FROM islands GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q116_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_type
        |  FROM events),
        |marked AS (
        |  SELECT user_id, event_id, event_type, tus,
        |    CASE WHEN prev_type IS NULL OR prev_type <> event_type THEN 1 ELSE 0 END AS is_change
        |  FROM e),
        |runs AS (
        |  SELECT user_id, event_type, tus,
        |    sum(is_change) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM marked),
        |collapsed AS (
        |  SELECT user_id, run, event_type,
        |    min(tus) AS valid_from_us, count(*) AS n_events
        |  FROM runs GROUP BY user_id, run, event_type)
        |SELECT user_id, event_type, valid_from_us,
        |  lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY valid_from_us) AS valid_to_us,
        |  n_events
        |FROM collapsed
        |ORDER BY user_id, valid_from_us""".stripMargin,
    "q117_retention" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |cohort AS (
        |  SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
        |SELECT c.cohort_day, e.day - c.cohort_day AS day_offset,
        |  count(DISTINCT e.user_id) AS n_users,
        |  count(*) AS n_events
        |FROM e JOIN cohort c USING (user_id)
        |GROUP BY c.cohort_day, day_offset
        |ORDER BY c.cohort_day, day_offset""".stripMargin,
    // q105: RGB sums restated from idx(x,y) = (x·3+y·7+id) % 256
    // through the closed-form palette — decode, LZW and palette
    // mapping all inside the hash check.
    "q105_gif_pixels" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(6 + doc_id % 7 AS BIGINT) AS w,
        |    CAST(6 + (doc_id * 3) % 7 AS BIGINT) AS h
        |  FROM documents),
        |px AS (
        |  SELECT d.doc_id, d.w, d.h,
        |    (x.g * 3 + y.g * 7 + d.doc_id) % 256 AS idx
        |  FROM d,
        |    unnest(generate_series(0, d.w - 1)) AS x(g),
        |    unnest(generate_series(0, d.h - 1)) AS y(g)),
        |s AS (
        |  SELECT doc_id,
        |    sum((idx * 5 + 1) % 256) AS r_sum,
        |    sum((idx * 7 + 2) % 256) AS g_sum,
        |    sum((idx * 11 + 3) % 256) AS b_sum
        |  FROM px GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |  3 AS channels,
        |  CAST(s.r_sum AS BIGINT) AS r_sum, CAST(s.g_sum AS BIGINT) AS g_sum,
        |  CAST(s.b_sum AS BIGINT) AS b_sum
        |FROM d JOIN s USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // q135: 12 luma blocks x 64 px each, flat, so sums weight the
    // block formulas by 64; the YCbCr->RGB restatement mirrors the
    // decoder's pinned arithmetic term-for-term (left-assoc double
    // ops + floor(v + 0.5) == Math.round), keeping IEEE parity.
    "q135_jpeg_color" ->
      """WITH blk AS MATERIALIZED (
        |  SELECT doc_id, bx.g AS bx, by.g AS by,
        |    16 + (13 * doc_id + 17 * (4 * by.g + bx.g)) % 200 AS yv,
        |    78 + (7 * doc_id + 29 * (2 * (by.g // 2) + (bx.g // 2))) % 100 AS cb,
        |    53 + (11 * doc_id + 31 * (2 * (by.g // 2) + (bx.g // 2))) % 150 AS cr
        |  FROM documents,
        |    unnest(generate_series(0, 3)) AS bx(g),
        |    unnest(generate_series(0, 2)) AS by(g)),
        |c AS (
        |  SELECT doc_id,
        |    least(255, greatest(0, CAST(floor(yv + 1.402 * (cr - 128) + 0.5) AS BIGINT))) AS r,
        |    least(255, greatest(0, CAST(floor(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5) AS BIGINT))) AS g,
        |    least(255, greatest(0, CAST(floor(yv + 1.772 * (cb - 128) + 0.5) AS BIGINT))) AS b
        |  FROM blk)
        |SELECT doc_id, CAST(32 AS INT) AS width, CAST(24 AS INT) AS height,
        |  3 AS channels,
        |  CAST(sum(r) * 64 AS BIGINT) AS r_sum,
        |  CAST(sum(g) * 64 AS BIGINT) AS g_sum,
        |  CAST(sum(b) * 64 AS BIGINT) AS b_sum,
        |  CAST(min(r) AS BIGINT) AS r_min,
        |  CAST(max(b) AS BIGINT) AS b_max
        |FROM c
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    // q102: every surface restated from the raster generator — the
    // gradient terms re-derive neighbor values from the formula
    // itself (no self-join), the histogram bins by v // 16.
    "q102_image_features" -> {
      val binCols = (0 until 16).map(b =>
        s"  CAST(sum(CASE WHEN v // 16 = $b THEN 1 ELSE 0 END) AS BIGINT) AS b$b")
        .mkString(",\n")
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CAST(4 + doc_id % 5 AS BIGINT) AS w,
         |    CAST(4 + (doc_id * 3) % 5 AS BIGINT) AS h,
         |    CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS BIGINT) AS ch
         |  FROM documents),
         |px AS MATERIALIZED (
         |  SELECT d.doc_id, d.w, d.h, x.g AS x, y.g AS y, c.g AS c,
         |    (x.g * 3 + y.g * 7 + c.g * 11 + d.doc_id) % 256 AS v
         |  FROM d,
         |    unnest(generate_series(0, d.w - 1)) AS x(g),
         |    unnest(generate_series(0, d.h - 1)) AS y(g),
         |    unnest(generate_series(0, d.ch - 1)) AS c(g))
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_px,
         |  CAST(sum(v) AS BIGINT) AS px_sum,
         |  CAST(sum(v * v) AS BIGINT) AS px_sq,
         |  CAST(sum(CASE WHEN x < w - 1 THEN
         |    abs(((x + 1) * 3 + y * 7 + c * 11 + doc_id) % 256 - v)
         |    ELSE 0 END) AS BIGINT) AS grad_x,
         |  CAST(sum(CASE WHEN y < h - 1 THEN
         |    abs((x * 3 + (y + 1) * 7 + c * 11 + doc_id) % 256 - v)
         |    ELSE 0 END) AS BIGINT) AS grad_y,
         |$binCols
         |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    // q101: the flat-block pattern restated cell by cell — each 8x8
    // block contributes 64x its closed-form value exactly (DC-only
    // spectrum under the all-ones quantizer).
    "q101_jpeg_pixels" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    1 + doc_id % 3 AS bw,
        |    1 + (doc_id // 3) % 3 AS bh
        |  FROM documents),
        |cells AS (
        |  SELECT d.doc_id, d.bw, d.bh,
        |    (bx.g * 31 + by.g * 17 + d.doc_id) % 256 AS g
        |  FROM d,
        |    unnest(generate_series(0, d.bw - 1)) AS bx(g),
        |    unnest(generate_series(0, d.bh - 1)) AS by(g))
        |SELECT doc_id,
        |  CAST(min(bw) * 8 AS INT) AS width,
        |  CAST(min(bh) * 8 AS INT) AS height,
        |  CAST(sum(g * 64) AS BIGINT) AS pix_sum,
        |  CAST(min(g) AS INT) AS px_min,
        |  CAST(max(g) AS INT) AS px_max
        |FROM cells GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q97: every sample restated by the generator formula; the lag
    // window reproduces the decoder's consecutive-sign crossing rule
    // (sign of zero is non-negative; the i=0 lag NULL contributes 0).
    "q97_wav_samples" ->
      """WITH d AS (
        |  SELECT doc_id, 200 + doc_id % 300 AS n FROM documents),
        |s AS (
        |  SELECT d.doc_id, i.g AS i,
        |    CAST((d.doc_id * 31 + i.g * 7919) % 65536 - 32768 AS BIGINT) AS s
        |  FROM d, unnest(generate_series(0, d.n - 1)) AS i(g)),
        |lagged AS (
        |  SELECT doc_id, i, s,
        |    lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        |  FROM s)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(s) AS BIGINT) AS sum_s,
        |  CAST(sum(s * s) AS BIGINT) AS sum_sq,
        |  CAST(min(s) AS INT) AS min_s,
        |  CAST(max(s) AS INT) AS max_s,
        |  CAST(sum(CASE WHEN (s < 0) <> (prev < 0) THEN 1 ELSE 0 END) AS BIGINT) AS n_zc
        |FROM lagged GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q145: the first-64-sample Haar filterbank replayed as 6 chained
    // even/odd self-join halving rounds over the closed-form sawtooth
    // (n >= 200 always, so every doc has a full frame).
    "q145_audio_bands" -> {
      val rounds = (1 to 6).map { k =>
        s"""l$k AS MATERIALIZED (
           |  SELECT e.doc_id, e.i // 2 AS i, e.a + o.a AS a, e.a - o.a AS d
           |  FROM l${k - 1} e JOIN l${k - 1} o
           |    ON e.doc_id = o.doc_id AND o.i = e.i + 1
           |  WHERE e.i % 2 = 0),
           |en$k AS MATERIALIZED (
           |  SELECT doc_id, CAST(sum(d * d) AS BIGINT) AS e FROM l$k GROUP BY doc_id)""".stripMargin
      }.mkString(",\n")
      val joins = (1 to 6).map(k => s"JOIN en$k ON d.doc_id = en$k.doc_id").mkString("\n")
      s"""WITH d AS (SELECT doc_id FROM documents),
         |l0 AS MATERIALIZED (
         |  SELECT d.doc_id, i.g AS i,
         |    CAST((d.doc_id * 31 + i.g * 7919) % 65536 - 32768 AS BIGINT) AS a
         |  FROM d, unnest(generate_series(0, 63)) AS i(g)),
         |$rounds,
         |ap AS MATERIALIZED (
         |  SELECT doc_id, CAST(a * a AS BIGINT) AS approx_sq FROM l6 WHERE i = 0)
         |SELECT d.doc_id, en1.e AS e1, en2.e AS e2, en3.e AS e3,
         |  en4.e AS e4, en5.e AS e5, en6.e AS e6, ap.approx_sq
         |FROM d
         |$joins
         |JOIN ap ON d.doc_id = ap.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },
    // q149: native session windows replayed as lag/cumsum with the
    // INCLUSIVE boundary (only diff > gap opens a new session —
    // Spark's rule as established by the EventsSpec fixture).
    "q149_session_window" ->
      """WITH o AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |l AS (
        |  SELECT user_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS news
        |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |s AS (
        |  SELECT user_id, us, sum(news) OVER (PARTITION BY user_id ORDER BY us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM l)
        |SELECT user_id, CAST(min(us) AS BIGINT) AS start_us,
        |  CAST(max(us) + 1800000000 AS BIGINT) AS end_us,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, start_us""".stripMargin,
    // q148: pixels, luma, the 9x8 floor-mapped grid and the bit pack
    // all restated in closed form (the q89 fixture's sample formula);
    // the engine's PNG decode chain is what the hash exercises.
    "q148_image_dhash" ->
      s"""$sqlDhashCtes
         |SELECT d.doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         |  hh.dhash_hi, hh.dhash_lo
         |FROM d JOIN hh USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    // q152: closed-form hashes self-joined with part-wise popcount —
    // the banding algorithm is the engine's business, the oracle
    // states the answer.
    "q152_image_neardup" ->
      s"""$sqlDhashCtes
         |SELECT a.doc_id AS i, b.doc_id AS j,
         |  CAST(bit_count(xor(a.dhash_hi, b.dhash_hi))
         |     + bit_count(xor(a.dhash_lo, b.dhash_lo)) AS INT) AS hamming
         |FROM hh a JOIN hh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.dhash_hi, b.dhash_hi))
         |    + bit_count(xor(a.dhash_lo, b.dhash_lo)) <= 12
         |ORDER BY i, j""".stripMargin,
    // q154: both robust statistics replayed as integer histogram
    // medians (cum*2 >= N), then the flag arithmetic.
    "q154_volume_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |h1 AS (SELECT event_type, n AS v, count(*) AS c FROM daily GROUP BY 1, 2),
        |c1 AS (SELECT event_type, v, sum(c) OVER (PARTITION BY event_type ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM h1),
        |t1 AS (SELECT event_type, count(*) AS nt FROM daily GROUP BY 1),
        |med AS (SELECT c1.event_type, CAST(min(v) AS BIGINT) AS med
        |  FROM c1 JOIN t1 USING (event_type) WHERE c1.cum * 2 >= t1.nt GROUP BY 1),
        |dev AS (SELECT d.event_type, abs(d.n - m.med) AS v
        |  FROM daily d JOIN med m USING (event_type)),
        |h2 AS (SELECT event_type, v, count(*) AS c FROM dev GROUP BY 1, 2),
        |c2 AS (SELECT event_type, v, sum(c) OVER (PARTITION BY event_type ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM h2),
        |t2 AS (SELECT event_type, count(*) AS nt FROM dev GROUP BY 1),
        |mad AS (SELECT c2.event_type, CAST(min(v) AS BIGINT) AS mad
        |  FROM c2 JOIN t2 USING (event_type) WHERE c2.cum * 2 >= t2.nt GROUP BY 1)
        |SELECT d.event_type, d.day, d.n AS n_events, m.med, md.mad,
        |  abs(d.n - m.med) > 3 * md.mad AS anomalous
        |FROM daily d JOIN med m USING (event_type) JOIN mad md USING (event_type)
        |ORDER BY d.event_type, d.day""".stripMargin,
    // q147: the maintenance identity — merged-over-batches must equal
    // this one-shot recompute on every exact surface; ndv_ok is the
    // q131 envelope convention (TRUE stated, exact n_users gated).
    "q147_incremental_rollup" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |  min(value) AS min_value, max(value) AS max_value,
        |  count(DISTINCT user_id) AS n_users, TRUE AS ndv_ok
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // q95: the synthetic PCM parameters restated in closed form.
    "q95_wav_meta" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(8000 + (doc_id % 5) * 4000 AS INT) AS sample_rate,
        |    CAST(1 + doc_id % 2 AS INT) AS channels,
        |    CAST(CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS INT) AS bits,
        |    CAST(100 + doc_id % 400 AS BIGINT) AS n_frames
        |  FROM documents)
        |SELECT doc_id, sample_rate, channels, bits,
        |  n_frames * channels * bits // 8 AS data_bytes, n_frames
        |FROM d ORDER BY doc_id""".stripMargin,
    // q89: both rasters restated in closed form — the decode side as
    // the generator formula, the resize side through the
    // nearest-neighbor floor source mapping.
    "q89_png_pixels" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(4 + doc_id % 5 AS BIGINT) AS w,
        |    CAST(4 + (doc_id * 3) % 5 AS BIGINT) AS h,
        |    CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS BIGINT) AS ch
        |  FROM documents),
        |pix AS (
        |  SELECT d.doc_id, sum((x.g*3 + y.g*7 + c.g*11 + d.doc_id) % 256) AS pix_sum
        |  FROM d,
        |    unnest(generate_series(0, d.w - 1)) AS x(g),
        |    unnest(generate_series(0, d.h - 1)) AS y(g),
        |    unnest(generate_series(0, d.ch - 1)) AS c(g)
        |  GROUP BY d.doc_id),
        |rz AS (
        |  SELECT d.doc_id,
        |    sum(((tx.g * d.w // 8)*3 + (ty.g * d.h // 8)*7 + c.g*11 + d.doc_id) % 256) AS rz_sum
        |  FROM d,
        |    unnest(generate_series(0, 7)) AS tx(g),
        |    unnest(generate_series(0, 7)) AS ty(g),
        |    unnest(generate_series(0, d.ch - 1)) AS c(g)
        |  GROUP BY d.doc_id)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |  CAST(d.ch AS INT) AS channels,
        |  CAST(p.pix_sum AS BIGINT) AS pix_sum, CAST(r.rz_sum AS BIGINT) AS rz_sum
        |FROM d JOIN pix p USING (doc_id) JOIN rz r USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "q60_tumbling_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY date_trunc('hour', ts), event_type
        |ORDER BY window_start, event_type""".stripMargin,
    "q61_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events),
        |m AS (
        |  SELECT user_id,
        |    CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS is_new,
        |    ts, event_id
        |  FROM g),
        |s AS (
        |  SELECT user_id,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM m)
        |SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM s GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q62_user_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS vts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS cts FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.vts GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS pts FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.cts GROUP BY e.user_id)
        |SELECT
        |  (SELECT count(*) FROM v) AS n_view_users,
        |  (SELECT count(*) FROM c) AS n_click_users,
        |  (SELECT count(*) FROM p) AS n_purchase_users""".stripMargin,
    "q63_json_props" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q64x_sketch_bounds" ->
      """SELECT event_type,
        |  count(*) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  TRUE AS ndv_ok,
        |  TRUE AS med_ok
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // q65: the as-of semantics stated declaratively — newest view at
    // or before each click (ties pre-collapsed to max value), nulled
    // past the 2h tolerance. The newest view overall IS the newest
    // within tolerance whenever one exists, so the tolerance can live
    // in the join predicate here while the engine applies it post-match.
    "q65_asof_join" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, user_id, epoch_us(ts) AS cts
        |  FROM events WHERE event_type = 'click'),
        |v AS (
        |  SELECT user_id, epoch_us(ts) AS vts, max(value) AS view_value
        |  FROM events WHERE event_type = 'view'
        |  GROUP BY user_id, epoch_us(ts)),
        |m AS (
        |  SELECT c.click_id, c.user_id, c.cts, max(v.vts) AS matched_ts
        |  FROM c LEFT JOIN v
        |    ON c.user_id = v.user_id AND v.vts <= c.cts
        |   AND c.cts - v.vts <= 7200000000
        |  GROUP BY c.click_id, c.user_id, c.cts)
        |SELECT m.user_id, m.click_id, m.cts,
        |  coalesce(v2.view_value, -1.0) AS view_value,
        |  coalesce(m.matched_ts, -1) AS matched_ts
        |FROM m LEFT JOIN v v2
        |  ON m.user_id = v2.user_id AND m.matched_ts = v2.vts
        |ORDER BY click_id""".stripMargin,
    // q133: mirror of q65's oracle with min(vts >= cts) — inclusive
    // at equality, matching the operator's both-directions-inclusive
    // equal-timestamp rule.
    "q133_asof_forward" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, user_id, epoch_us(ts) AS cts
        |  FROM events WHERE event_type = 'click'),
        |v AS (
        |  SELECT user_id, epoch_us(ts) AS vts, max(value) AS view_value
        |  FROM events WHERE event_type = 'view'
        |  GROUP BY user_id, epoch_us(ts)),
        |m AS (
        |  SELECT c.click_id, c.user_id, c.cts, min(v.vts) AS matched_ts
        |  FROM c LEFT JOIN v
        |    ON c.user_id = v.user_id AND v.vts >= c.cts
        |   AND v.vts - c.cts <= 7200000000
        |  GROUP BY c.click_id, c.user_id, c.cts)
        |SELECT m.user_id, m.click_id, m.cts,
        |  coalesce(v2.view_value, -1.0) AS view_value,
        |  coalesce(m.matched_ts, -1) AS matched_ts
        |FROM m LEFT JOIN v v2
        |  ON m.user_id = v2.user_id AND m.matched_ts = v2.vts
        |ORDER BY m.click_id""".stripMargin,
    // q130: candidate views within tolerance on either side ranked by
    // (|dt|, vts) — vts ASC breaks distance ties toward the BACKWARD
    // match, the operator's documented rule; equal-ts view payloads
    // collapse by max first (the q65 tie convention).
    "q130_asof_nearest" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, user_id, epoch_us(ts) AS cts
        |  FROM events WHERE event_type = 'click'),
        |v AS (
        |  SELECT user_id, epoch_us(ts) AS vts, max(value) AS view_value
        |  FROM events WHERE event_type = 'view'
        |  GROUP BY user_id, epoch_us(ts)),
        |ranked AS (
        |  SELECT c.click_id, v.vts, v.view_value,
        |    row_number() OVER (PARTITION BY c.click_id
        |      ORDER BY abs(c.cts - v.vts), v.vts) AS rn
        |  FROM c JOIN v ON c.user_id = v.user_id
        |   AND abs(c.cts - v.vts) <= 3600000000)
        |SELECT c.user_id, c.click_id, c.cts,
        |  coalesce(r.view_value, -1.0) AS view_value,
        |  coalesce(r.vts, -1) AS matched_ts
        |FROM c LEFT JOIN ranked r ON r.click_id = c.click_id AND r.rn = 1
        |ORDER BY c.click_id""".stripMargin,
    "q66_range_join" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pts
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT user_id, epoch_us(ts) AS vts, value
        |  FROM events WHERE event_type = 'view')
        |SELECT p.purchase_id, p.user_id,
        |  count(v.vts) AS n_views_1h,
        |  coalesce(CAST(sum(CAST(v.value AS DECIMAL(18,6))) AS DOUBLE), -1.0) AS sum_view_value
        |FROM p LEFT JOIN v
        |  ON p.user_id = v.user_id
        | AND v.vts >= p.pts - 3600000000 AND v.vts <= p.pts
        |GROUP BY p.purchase_id, p.user_id
        |ORDER BY purchase_id""".stripMargin,
    "q71_media_pipeline" ->
      """WITH m AS (
        |  SELECT doc_id, octet_length(encode(text)) AS nb,
        |    greatest((octet_length(encode(text)) + 63) // 64, 1) AS nf
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(nb AS INT) AS n_bytes,
        |  CAST((nf + 1) // 2 AS BIGINT) AS n_frames,
        |  CAST(16 AS INT) AS resized_len
        |FROM m
        |ORDER BY doc_id""".stripMargin,
    // closed forms of Multimodal.syntheticMedia: payload lengths are
    // fixed per format (PNG 33 = sig + IHDR chunk, JPEG 27 = SOI +
    // APP0 + SOF0, GIF 10 = header + screen descriptor); dims are
    // the id arithmetic the headers encode
    "q70_binary_meta" ->
      """SELECT doc_id,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 27 ELSE 10 END AS INT) AS n_bytes,
        |  CAST(16 + doc_id % 1000 AS INT) AS width,
        |  CAST(16 + (doc_id * 7) % 1000 AS INT) AS height,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END AS format
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // q107: RANGE frames are inclusive of the boundary and of peers
    // in BOTH engines (standard SQL); the decimal window sum is exact
    // so accumulation order cannot leak into the hash
    "q107_trailing_stats" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_trail_1h,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_trail_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q108_transitions" ->
      """WITH s AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events)
        |SELECT event_type AS from_type, to_type, count(*) AS n_transitions
        |FROM s WHERE to_type IS NOT NULL
        |GROUP BY event_type, to_type
        |ORDER BY from_type, to_type""".stripMargin,
    // q112: the Morton interleave replayed bit-by-bit — an unnest
    // over the 16 bit positions, each contributing x's bit at 2i and
    // y's bit at 2i+1; the ORDER BY zkey is the layout under test
    "q112_zorder" ->
      """WITH e AS (
        |  SELECT event_id, user_id % 65536 AS x,
        |    (epoch_us(ts) // 3600000000) % 65536 AS y
        |  FROM events),
        |b AS (
        |  SELECT event_id, x, y,
        |    sum((((x >> i) & 1) << (2 * i)) + (((y >> i) & 1) << (2 * i + 1))) AS zkey
        |  FROM e, unnest(generate_series(0, 15)) AS t(i)
        |  GROUP BY event_id, x, y)
        |SELECT event_id, x, y, CAST(zkey AS BIGINT) AS zkey
        |FROM b
        |ORDER BY zkey, event_id""".stripMargin,
    // q144: the Hilbert walk replayed as 16 chained rounds of the
    // engine's exact reflect/transpose integer arithmetic (quadrant
    // digit via xor, rotation via the two CASEs) — bit level 15
    // down to 0, constants inlined per round.
    "q144_hilbert" -> {
      val rounds = (15 to 0 by -1).zipWithIndex.map { case (bit, i) =>
        val s = 1L << bit
        val s2 = s * s
        s"""h${i + 1} AS MATERIALIZED (
           |  SELECT event_id, x0, y0,
           |    d + $s2 * xor(3 * rx, ry) AS d,
           |    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN $s - 1 - y ELSE y END) ELSE x END AS x,
           |    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN $s - 1 - x ELSE x END) ELSE y END AS y
           |  FROM (SELECT event_id, x0, y0, d, x, y,
           |      CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
           |      CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry
           |    FROM h$i))""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT event_id, user_id % 65536 AS x,
         |    (epoch_us(ts) // 3600000000) % 65536 AS y
         |  FROM events),
         |h0 AS MATERIALIZED (
         |  SELECT event_id, x AS x0, y AS y0, CAST(0 AS BIGINT) AS d, x, y FROM e),
         |$rounds
         |SELECT event_id, x0 AS x, y0 AS y, CAST(d AS BIGINT) AS hkey
         |FROM h16
         |ORDER BY hkey, event_id""".stripMargin
    },
    // q159: zkey3 replayed as a 3-way bit unnest (bit i of dim j at
    // 3i+j); hkey3 as 15 chained rounds of Skilling's inverse-undo —
    // each round nests the THREE sequential axis steps (axis 0:
    // conditional invert; axes 1..2: invert-axis-0 or bit-swap-with-
    // axis-0 under the P mask) — then Gray encode, the t-fold off
    // the last axis (bit_xor over levels), the final xor and the
    // MSB-first gather (bit k of axis j at 3k + (2-j)).
    "q159_layout3" -> {
      val rounds = (15 to 1 by -1).zipWithIndex.map { case (bit, i) =>
        val q = 1L << bit
        val p = q - 1
        s"""h${i + 1} AS MATERIALIZED (
           |  SELECT event_id, x, y, z,
           |    CASE WHEN (a2 & $q) > 0 THEN xor(s1_0, $p)
           |      ELSE xor(s1_0, xor(s1_0, a2) & $p) END AS a0,
           |    s1_1 AS a1,
           |    CASE WHEN (a2 & $q) > 0 THEN a2
           |      ELSE xor(a2, xor(s1_0, a2) & $p) END AS a2
           |  FROM (
           |    SELECT event_id, x, y, z, a2,
           |      CASE WHEN (a1 & $q) > 0 THEN xor(s0_0, $p)
           |        ELSE xor(s0_0, xor(s0_0, a1) & $p) END AS s1_0,
           |      CASE WHEN (a1 & $q) > 0 THEN a1
           |        ELSE xor(a1, xor(s0_0, a1) & $p) END AS s1_1
           |    FROM (
           |      SELECT event_id, x, y, z, a1, a2,
           |        CASE WHEN (a0 & $q) > 0 THEN xor(a0, $p) ELSE a0 END AS s0_0
           |      FROM h$i)))""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (
         |  SELECT event_id, user_id % 65536 AS x,
         |    (epoch_us(ts) // 3600000000) % 65536 AS y,
         |    list_reduce(list_transform(generate_series(1, 15),
         |      i -> CAST(strpos('0123456789abcdef', substr(md5(event_type), CAST(i AS INT), 1)) - 1 AS BIGINT)),
         |      (a, b) -> a * 16 + b) % 65536 AS z
         |  FROM events),
         |zk AS MATERIALIZED (
         |  SELECT event_id,
         |    sum((((x >> i) & 1) << (3 * i)) + (((y >> i) & 1) << (3 * i + 1))
         |      + (((z >> i) & 1) << (3 * i + 2))) AS zkey3
         |  FROM e, unnest(generate_series(0, 15)) AS t(i)
         |  GROUP BY event_id),
         |h0 AS MATERIALIZED (
         |  SELECT event_id, x, y, z, x AS a0, y AS a1, z AS a2 FROM e),
         |$rounds,
         |g AS MATERIALIZED (
         |  SELECT event_id, x, y, z, a0, xor(a1, a0) AS g1,
         |    xor(a2, xor(a1, a0)) AS g2
         |  FROM h15),
         |tf AS MATERIALIZED (
         |  SELECT event_id, coalesce(bit_xor(
         |    CASE WHEN (g2 & (CAST(1 AS BIGINT) << q)) > 0
         |      THEN (CAST(1 AS BIGINT) << q) - 1 END), 0) AS t
         |  FROM g, unnest(generate_series(1, 15)) AS u(q)
         |  GROUP BY event_id),
         |hk AS MATERIALIZED (
         |  SELECT g.event_id,
         |    sum((((xor(a0, t) >> k) & 1) << (3 * k + 2))
         |      + (((xor(g1, t) >> k) & 1) << (3 * k + 1))
         |      + (((xor(g2, t) >> k) & 1) << (3 * k))) AS hkey3
         |  FROM g JOIN tf USING (event_id),
         |    unnest(generate_series(0, 15)) AS u(k)
         |  GROUP BY g.event_id)
         |SELECT e.event_id, e.x, e.y, e.z,
         |  CAST(zk.zkey3 AS BIGINT) AS zkey3, CAST(hk.hkey3 AS BIGINT) AS hkey3
         |FROM e JOIN zk USING (event_id) JOIN hk USING (event_id)
         |ORDER BY hkey3, event_id""".stripMargin
    },
    // q109: the 4 sliding windows containing instant t have starts
    // floor(t/15min)*15min - k*15min, k = 0..3 — replayed with an
    // unnest over k; window_start formatting matches q60's discipline
    "q109_sliding_agg" ->
      """WITH x AS (
        |  SELECT event_type, value,
        |    make_timestamp(((epoch_us(ts) // 900000000) - k) * 900000000) AS ws
        |  FROM events, unnest([0, 1, 2, 3]) AS t(k))
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM x
        |GROUP BY ws, event_type
        |ORDER BY window_start, event_type""".stripMargin
  )
}
