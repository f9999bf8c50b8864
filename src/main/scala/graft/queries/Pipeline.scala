package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Bloom, Bpe, Dedup, IvfPqFixed, KmeansFixed, LinkGraph, Robots, Sampling, Similarity, Snapshot, TarShards, TextAnalysis, Unigram, WordPiece}
import graft.sources.{AvroSource, WarcSource}

/** Blocks C/D/E — LLM-pipeline operators over `documents` and
  * `embeddings` (SURVEY.md §2.C-E): dedup (exact, MinHash-LSH,
  * SimHash, n-gram), similarity search (brute-force + LSH ANN), text
  * analysis (tokens, quality, lang-ID, fingerprints).
  */
object Pipeline {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_dedup_exact" -> q30,
    "q31_minhash_pairs" -> q31,
    "q32_simhash" -> q32,
    "q33_ngram_jaccard" -> q33,
    "q34_embed_neardup" -> q34,
    "q35_dedup_clusters" -> q35,
    "q36_prefix_jaccard" -> q36,
    "q37_decontaminate" -> q37,
    "q38_cross_dedup" -> q38,
    "q39_simhash128" -> q39,
    "q44_semantic_dedup" -> q44,
    "q45_stratified_sample" -> q45,
    "q46_pack_chunks" -> q46,
    "q47_quality_topk" -> q47,
    "q48_bpe_train" -> q48,
    "q49_bpe_tokenize" -> q49,
    "q40_cosine_topk" -> q40,
    "q41_ann_lsh" -> q41,
    "q42_ann_ivf" -> q42,
    "q43_neardup_lsh" -> q43,
    "q50_token_stats" -> q50,
    "q51_quality_score" -> q51,
    "q52_langid" -> q52,
    "q53_fingerprint" -> q53,
    "q54_vocab_topk" -> q54,
    "q55_repetition" -> q55,
    "q56_epoch_order" -> q56,
    "q57_pii_redact" -> q57,
    "q58_boilerplate" -> q58,
    "q59_lm_score" -> q59,
    "q67_domain_cap" -> q67,
    "q68_dup_spans" -> q68,
    "q69_temp_mix" -> q69,
    "q72_dsir_weights" -> q72,
    "q73_excise_spans" -> q73,
    "q74_gopher_rules" -> q74,
    "q75_normalize" -> q75,
    "q76_contam_spans" -> q76,
    "q77_decontam_apply" -> q77,
    "q78_matryoshka" -> q78,
    "q79_sq8_topk" -> q79,
    "q80_bm25" -> q80,
    "q81_pq_topk" -> q81,
    "q82_semantic_screen" -> q82,
    "q83_heavy_hitters" -> q83,
    "q84_cooccur" -> q84,
    "q85_dedup_keep_best" -> q85,
    "q86_blocklist" -> q86,
    "q87_quality_classifier" -> q87,
    "q88_bpe_pack" -> q88,
    "q90_c4_lines" -> q90,
    "q91_line_repetition" -> q91,
    "q92_line_excise" -> q92,
    "q93_oov_rate" -> q93,
    "q94_split_assign" -> q94,
    "q96_rp_topk" -> q96,
    "q98_ngram_novelty" -> q98,
    "q99_margin_auc" -> q99,
    "q100_char_diversity" -> q100,
    "q103_bloom_decontam" -> q103,
    "q104_pagerank" -> q104,
    "q106_fuzzy_names" -> q106,
    "q110_inverted_index" -> q110,
    "q113_token_deciles" -> q113,
    "q114_triangles" -> q114,
    "q119_html_extract" -> q119,
    "q120_snapshot_diff" -> q120,
    "q121_kcore" -> q121,
    "q122_lang_quartiles" -> q122,
    "q123_url_canon" -> q123,
    "q125_match_keys" -> q125,
    "q127_curation_e2e" -> q127,
    "q129_dup_by_source" -> q129,
    "q132_trending" -> q132,
    "q134_warc_records" -> q134,
    "q136_unigram_seed" -> q136,
    "q137_unigram_segment" -> q137,
    "q138_kmeans_fixed" -> q138,
    "q139_fuzzy_k2" -> q139,
    "q140_crawl_e2e" -> q140,
    "q141_wordpiece_train" -> q141,
    "q142_wordpiece_encode" -> q142,
    "q143_tar_shards" -> q143,
    "q146_robots" -> q146,
    "q150_pretrain_e2e" -> q150,
    "q151_tfidf_topk" -> q151,
    "q157_ivfpq_fixed" -> q157,
    "q158_langid_trained" -> q158,
    "q160_avro_roundtrip" -> q160,
    "q171_snapshot_pipeline" -> q171
  )

  /** Exact dedup over a corpus with planted duplicates (the corpus
    * unioned with an id-shifted copy of itself): 1 group of 2 per
    * doc, keeper = original id. */
  def q30(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val doubled = d.unionAll(d.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    Dedup.exact(doubled, "doc_id", "text")
      .orderBy(col("text_hash"))
  }

  /** MinHash-LSH near-dup pairs, exact-verified at Jaccard >= 0.95
    * (word sets). Oracle is the brute-force all-pairs answer — the
    * LSH miss probability at 0.95 (r=6, b=22, >=2-band gate) is
    * ~1e-11. */
  def q31(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashDuplicates(Tables.documents(spark, dir), "doc_id", "text",
        threshold = 0.95)
      .orderBy(col("i"), col("j"))

  /** SimHash near-dup pairs (hamming <= 8 over 64-bit signatures,
    * pigeonhole-banded candidates), with the PORTABLE md5-fold word
    * hash: the oracle reproduces the signature plane bit-for-bit and
    * brute-forces the hamming pairs, so the approximate-looking
    * operator is fully hash-checked (the q41/q42 trick). The
    * xxhash64 performance default stays spec-covered
    * (DedupPropertySpec). */
  def q32(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashDuplicates(Tables.documents(spark, dir), "doc_id", "text",
        maxHamming = 8, portableHash = true)
      .orderBy(col("i"), col("j"))

  /** 128-bit SimHash near-dup pairs (nWords = 2 — the signature-
    * width scale lever, driver-gated end-to-end), portable hash on
    * both planes. */
  def q39(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhash128Duplicates(Tables.documents(spark, dir), "doc_id", "text",
        maxHamming = 8, portableHash = true)
      .orderBy(col("i"), col("j"))

  /** Exact character-3-gram Jaccard pairs on the src0 slice, FORCED
    * down the prefix-filter path (bruteForceMaxDocs = 0) so the
    * corpus-scale plan — not the bounded-slice broadcast shortcut —
    * is what the oracle hash-checks (mirrors q43's blockBudget = 0).
    * The slice is a fixed 1/5 FRACTION of the corpus, so it grows
    * with sf and the all-pairs plan would grow quadratically. */
  def q33(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(
        Tables.documents(spark, dir).filter(col("source") === "src0"),
        "doc_id", "text", n = 3, threshold = 0.6, bruteForceMaxDocs = 0)
      .orderBy(col("i"), col("j"))

  /** Embedding-cosine near-dup pairs within label blocks (all blocks
    * under budget here => the exact all-pairs path; q43 exercises the
    * LSH path the dispatch takes on oversized blocks). */
  def q34(spark: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDup(
        Tables.embeddings(spark, dir).select(
          col("vec_id").as("id"), col("embedding").as("vec"), col("label").as("block")),
        threshold = 0.4)
      .orderBy(col("i"), col("j"))

  /** The same near-dup semantics FORCED down the hot-block LSH path
    * (blockBudget = 0): candidates are within-block hyperplane-bucket
    * collisions, exact-verified. The sign matrix is the portable
    * mixer, so the oracle replicates bucket assignment bit-for-bit —
    * a fully hash-checked approximate operator. */
  def q43(spark: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDup(
        Tables.embeddings(spark, dir).select(
          col("vec_id").as("id"), col("embedding").as("vec"), col("label").as("block")),
        threshold = 0.3, blockBudget = 0, planes = 6, tables = 20)
      .orderBy(col("i"), col("j"))

  /** Full dedup pipeline on a corpus with planted clones: LSH pairs ->
    * connected components -> representative per cluster. At threshold
    * 0.999 only identical word sets pair (max non-identical Jaccard on
    * ~50-word sets is 50/51), so the oracle states the component as
    * min(doc_id) over the word-set equivalence class. */
  def q35(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .filter(col("source").isin("src0", "src1", "src2", "src3"))
      .select(col("doc_id"), col("text"))
    val doubled = d.unionAll(d.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    Dedup.dedupCorpus(doubled, "doc_id", "text", threshold = 0.999)
      .orderBy(col("id"))
  }

  /** Exact prefix-filtered Jaccard join at 0.95 (AllPairs/PPJoin
    * family): the deterministic high-threshold alternative to q31's
    * MinHash-LSH — same brute-force oracle, zero miss probability.
    * See Dedup.prefixJaccardDuplicates for when to prefer which. */
  def q36(spark: SparkSession, dir: String): DataFrame =
    Dedup.prefixJaccardDuplicates(Tables.documents(spark, dir), "doc_id", "text",
        threshold = 0.95)
      .orderBy(col("i"), col("j"))

  /** Benchmark decontamination: corpus docs (doc_id % 10 != 0)
    * sharing any word 8-gram with the held-out benchmark slice
    * (doc_id % 10 == 0) — the drop-before-training contamination
    * check of LLM data pipelines. */
  def q37(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    Dedup.contamination(
        d.filter(col("doc_id") % 10 =!= 0),
        d.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", n = 8)
      .orderBy(col("doc_id"))
  }

  /** Cross-corpus dedup: near-dup pairs at 0.95 between the even-id
    * slice ("existing corpus") and the odd-id slice ("new crawl") via
    * the bipartite prefix join. */
  def q38(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    Dedup.prefixJaccardJoin(
        d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", threshold = 0.95)
      .orderBy(col("i"), col("j"))
  }

  /** Brute-force cosine top-5 for the vec_id % 50 == 0 query set. */
  def q40(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    Similarity.bruteForceTopK(
        e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("vec")),
        e.select(col("vec_id").as("cid"), col("embedding").as("vec")),
        k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** Hyperplane-LSH ANN top-5, same query set (approximate => rows-
    * only oracle; SimilaritySpec measures recall vs q40). */
  def q41(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    Similarity.annTopK(
        e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("vec")),
        e.select(col("vec_id").as("cid"), col("embedding").as("vec")),
        k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** IVF-bucketed ANN top-5 (pivot lists, nprobe=4), same query set
    * (approximate => rows-only oracle; PipelineSpec measures recall). */
  def q42(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    Similarity.ivfTopK(
        e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("vec")),
        e.select(col("vec_id").as("cid"), col("embedding").as("vec")),
        k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** SemDeDup-style semantic dedup pairs: IVF coarse-quantize into 8
    * deterministic-pivot clusters (pure map-side argmax over literal
    * pivot vectors), then exact cosine >= 0.4 pairs within clusters.
    * The portable pivot hash makes cluster assignment — and therefore
    * the whole approximate-looking pipeline — bit-reproducible in the
    * oracle. */
  def q44(spark: SparkSession, dir: String): DataFrame =
    Similarity.semanticNearDup(
        Tables.embeddings(spark, dir).select(
          col("vec_id").as("id"), col("embedding").as("vec")),
        threshold = 0.4, nlist = 8)
      .orderBy(col("i"), col("j"))

  /** Deterministic stratified mixture sample — the training-mix
    * weighting step: keep 50% of src0, 25% of src1, 10% of everything
    * else, gated by a portable md5-fold hash of (source, doc_id) so
    * the sampled set is identical on any engine, cluster size or
    * rerun (no RNG). Map-side only. */
  def q45(spark: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedSample(Tables.documents(spark, dir), "doc_id", "source",
        Map("src0" -> 0.5, "src1" -> 0.25), defaultFraction = 0.1)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))

  /** Concat-and-chunk sequence packing into 2048-token bins, one
    * stream per source: each doc's token offset and spanned bin range
    * (GPT-style packing — docs straddle boundaries, nothing padded or
    * dropped). One window per stream. */
  def q46(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("source"),
      size(TextAnalysis.wsTokens(col("text"))).as("n_tok"))
    Sampling.packChunks(d, "doc_id", "n_tok", "source", budget = 2048)
      .orderBy(col("source"), col("doc_id"))
  }

  /** Distributed BPE tokenizer training: the first 12 learned merges
    * over the corpus vocabulary (pair counts weighted by word-type
    * frequency, argmax tie-broken by (count desc, a, b)). The oracle
    * replays the identical merge loop in DuckDB — 12 chained CTE
    * rounds of count/argmax/greedy-merge — so the learned vocabulary
    * is hash-checked end-to-end, not spot-checked. */
  def q48(spark: SparkSession, dir: String): DataFrame = {
    val merges = Bpe.train(Tables.documents(spark, dir), "text", numMerges = 12)
    Bpe.mergesDF(spark, merges).orderBy(col("rank"))
  }

  /** BPE tokenization under the q48-trained vocabulary: per-doc TRUE
    * token counts from the imperative encoder (min-rank merge loop).
    * The oracle replays training to its final word segmentation and
    * joins the per-word-type symbol counts back onto each document —
    * so the gate checks that ENCODING a word reproduces exactly the
    * segmentation TRAINING evolved for it (the rank-order equivalence
    * encodeWord relies on), end-to-end over the whole corpus. */
  def q49(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val merges = Bpe.train(docs, "text", numMerges = 12)
    docs.select(col("doc_id"),
        Bpe.tokenCountUdf(merges)(col("text")).as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Sequence packing on TRAINED-tokenizer budgets — the loop a real
    * pretraining pipeline runs (count under the learned vocabulary →
    * pack → read slices): q46's banded two-phase prefix-sum packing,
    * but the per-doc budget is the TRUE BPE token count under the
    * q48-trained 12-merge vocabulary (Bpe.tokenCountUdf) instead of
    * the whitespace estimate. The oracle composes the q48 training
    * replay's final word segmentation (per-word-type symbol counts
    * joined onto each doc's words) with q46's running-sum packing —
    * gating tokenizer and packer TOGETHER end-to-end. q46 and q48
    * stay pinned unchanged. */
  def q88(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val merges = Bpe.train(docs, "text", numMerges = 12)
    val d = docs.select(col("doc_id"), col("source"),
      Bpe.tokenCountUdf(merges)(col("text")).as("n_tok"))
    Sampling.packChunks(d, "doc_id", "n_tok", "source", budget = 2048)
      .orderBy(col("source"), col("doc_id"))
  }

  /** Group-wise quality top-k: the 10 highest-quality docs per
    * source (score ties break by doc_id) — the keep-the-best curation
    * step; rank-filter windows get a map-side WindowGroupLimit. */
  def q47(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val scored = d.select(col("doc_id"), col("source"))
      .join(TextAnalysis.qualityFeatures(d, "doc_id", "text")
        .select(col("doc_id"), col("quality_score")), "doc_id")
    Sampling.topKPerStratum(scored, "source", "quality_score", "doc_id", k = 10)
      .orderBy(col("source"), col("rank"))
  }

  /** Token statistics: chars, whitespace tokens, alpha words, BPE-ish
    * token estimate, average word length. */
  def q50(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    Tables.documents(spark, dir).select(
        col("doc_id"),
        length(t).as("n_chars"),
        size(TextAnalysis.wsTokens(t)).as("n_ws_tokens"),
        size(TextAnalysis.alphaWords(t)).as("n_alpha_words"),
        TextAnalysis.tokenEstimate(t).as("n_token_est"),
        when(size(TextAnalysis.alphaWords(t)) === 0, 0.0)
          .otherwise(length(regexp_replace(lower(t), "[^a-z]", "")).cast("double") /
            size(TextAnalysis.alphaWords(t)).cast("double")).as("avg_word_len"))
      .orderBy(col("doc_id"))
  }

  /** Quality scoring: stopword/punctuation/length heuristics. */
  def q51(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityFeatures(Tables.documents(spark, dir), "doc_id", "text")
      .select(col("doc_id"), col("n_chars"), col("n_tokens"),
        col("punct_ratio"), col("stop_ratio"), col("quality_score"))
      .orderBy(col("doc_id"))

  /** Stopword-profile language ID vs the labelled lang column. */
  def q52(spark: SparkSession, dir: String): DataFrame = {
    val feats = TextAnalysis.langIdFeatures(
      Tables.documents(spark, dir), "doc_id", "text")
    feats.join(Tables.documents(spark, dir).select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("pred_lang"), col("lang"),
        (col("pred_lang") === col("lang")).as("correct"))
      .orderBy(col("doc_id"))
  }

  /** Winnowing-style min-hash fingerprint per document. */
  def q53(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
        col("doc_id"), TextAnalysis.fingerprint(col("text"), 8).as("fingerprint"))
      .orderBy(col("doc_id"))

  /** Corpus vocabulary: top-100 tokens by document frequency (the
    * tokenizer-training prep scan). */
  def q54(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabTopK(Tables.documents(spark, dir), "doc_id", "text", k = 100)

  /** Within-doc repetition: repeated word-8-gram fraction (the
    * C4/Gopher boilerplate filter). */
  def q55(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionScore(Tables.documents(spark, dir), "doc_id", "text", n = 8)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** DuckDB replay of [[graft.operators.Bpe.train]]: `k` chained CTE
    * rounds, each counting adjacent pairs over the word-type table,
    * taking the (count desc, a, b) argmax, and applying the merge by
    * the SAME greedy left-to-right fold the engine uses (list_reduce
    * over a chr(31)-joined accumulator — symbols never contain the
    * separator in this corpus). */
  /** Deterministic per-epoch corpus shuffle: the portable md5-fold
    * key makes the training traversal order identical on any engine
    * or rerun — which is exactly what the oracle hash-checks (the
    * whole permutation, order included). */
  def q56(spark: SparkSession, dir: String): DataFrame =
    Sampling.epochOrder(
        Tables.documents(spark, dir).select(col("doc_id")), "doc_id", epoch = 1)
      .orderBy(col("epoch_key"), col("doc_id"))

  /** PII redaction audit: deterministic emails/digit-runs are
    * spliced into each doc (closed-form in doc_id, so the oracle
    * rebuilds the same text), then the map-side scrubber counts and
    * redacts them — Java-regex and RE2 agree on these leftmost-greedy
    * patterns, which is what makes redaction byte-comparable. */
  def q57(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val pii = d.select(col("doc_id"),
      concat(col("text"),
        lit(" contact"), col("doc_id").cast("string"),
        lit("@ex"), pmod(col("doc_id"), lit(10)).cast("string"),
        lit(".org ref "), (col("doc_id") * 1234567 + 10000000).cast("string"),
        when(col("doc_id") % 3 === 0, lit(" second.user@mail.example.com"))
          .otherwise(lit(""))).as("text"))
    TextAnalysis.piiStats(pii, "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** Cross-document boilerplate accounting over raw word-8-gram
    * shingles: per doc, total distinct shingles and how many occur
    * in MORE than one document (the C4/RefinedWeb repeated-content
    * removal signal, corpus granularity). */
  def q58(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(spark, dir).select(col("doc_id"),
      explode(Dedup.wordShingles(col("text"), 8)).as("unit"))
    Dedup.boilerplate(sh, "doc_id", "unit", maxDocs = 1)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("n_boiler"))
      .select(col("id").as("doc_id"), col("n_shingles"), col("n_boiler"))
      .orderBy(col("doc_id"))
  }

  /** Corpus bigram-LM scoring (the CCNet-style perplexity quality
    * filter): an add-1 smoothed bigram LM trained on the corpus
    * itself, scored per doc. libm `ln` bitpatterns differ across
    * engines (measured 3/14400 between JVM Math.log and DuckDB ln),
    * so the double `nll` is a lib/spec concern; what the gate pins
    * is the exact count surface the score is a function of — every
    * (bigram, c2, c1) triple via the portable md5-fold signature
    * sum, plus the hapax count and vocabulary size. */
  def q59(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.lmScore(Tables.documents(spark, dir), "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_bigrams"), col("n_hapax"),
        col("v"), col("sig"))
      .orderBy(col("doc_id"))

  /** Per-domain cap (the CommonCrawl-style "no host dominates"
    * curation rule): at most 12 docs survive per source, chosen by
    * the deterministic portable md5 draw — the gate checks the whole
    * kept set AND each row's draw rank. `source` is non-null in the
    * fixture; the lib handles null groups via the hash sentinel. */
  def q67(spark: SparkSession, dir: String): DataFrame =
    Sampling.capPerGroup(
        Tables.documents(spark, dir).select(col("doc_id"), col("source")),
        "source", "doc_id", cap = 12)
      .orderBy(col("doc_id"))

  /** Exact-substring duplicate spans (Lee et al. 2021 ExactSubstr at
    * word granularity, k=8): the maximal token ranges each document
    * shares verbatim with the corpus — the ranges a span-level dedup
    * pass would cut. Pure integer/string surface, fully stated by
    * the oracle. */
  def q68(spark: SparkSession, dir: String): DataFrame =
    Dedup.dupSpans(Tables.documents(spark, dir), "doc_id", "text", k = 8)
      .select(col("id").as("doc_id"), col("span_id"), col("start_tok"),
        col("end_tok"), col("n_windows"))
      .orderBy(col("doc_id"), col("span_id"))

  /** Temperature-resampled language mix (alpha=0.5): the rarest lang
    * keeps everything, dominant langs sample down by sqrt share
    * ratio. Rates are IEEE-exact (division + sqrt only), so the gate
    * checks the kept SET and the rate values bit-for-bit. */
  def q69(spark: SparkSession, dir: String): DataFrame =
    Sampling.temperatureMix(
        Tables.documents(spark, dir).select(col("doc_id"), col("lang")),
        "lang", "doc_id", alpha = 0.5)
      .select(col("doc_id"), col("lang"), col("n_docs"), col("rate"))
      .orderBy(col("doc_id"))

  /** DSIR importance weighting against the English slice as target
    * distribution (hashed unigram+bigram buckets, B=256). Like q59,
    * the float logw is spec territory (libm ln); the gate pins the
    * exact (bucket, n, ct, cr) count surface the weight is a
    * function of. */
  def q72(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    TextAnalysis.importanceWeights(docs, docs.filter(col("lang") === "en"),
        "doc_id", "text", buckets = 256)
      .select(col("id").as("doc_id"), col("n_feats"), col("sig"))
      .orderBy(col("doc_id"))
  }

  /** Span excision applied (RefinedWeb exact-substring removal,
    * k=8): the cleaned corpus itself — every doc with its duplicated
    * ranges cut, byte-comparable text in, byte-comparable text out. */
  def q73(spark: SparkSession, dir: String): DataFrame =
    Dedup.exciseDupSpans(Tables.documents(spark, dir), "doc_id", "text", k = 8)
      .select(col("id").as("doc_id"), col("clean_text"), col("n_tokens"),
        col("n_removed"))
      .orderBy(col("doc_id"))

  /** The Gopher rule bundle (published thresholds verbatim): on this
    * fixture no doc passes (short docs, one stopword) — the verdict
    * column is honest, and the numeric surface (word counts, mean
    * lengths, ratios from exact integer division) varies and is
    * fully stated by the oracle. */
  def q74(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherFlags(Tables.documents(spark, dir), "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_words"), col("mean_wlen"),
        col("symbol_ratio"), col("alpha_frac"), col("n_stopwords"), col("passes"))
      .orderBy(col("doc_id"))

  /** Unicode NFC normalization (the canonical ingest-time cleanup)
    * via the codegen'd UnicodeNormalize expression. The fixture is
    * ASCII, so `norm_text` gates the identity fast path; the PROBE
    * columns append a combining acute (U+0301) to every doc before
    * normalizing, so each row also gates a real composition ('e' +
    * U+0301 → 'é') byte-for-byte against DuckDB's utf8proc — both
    * engines implement UAX #15. */
  def q75(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftext.TextNorm
    val probe = TextNorm.normalize(concat(col("text"), lit("e\u0301")))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextNorm.normalize(col("text")).as("norm_text"),
        (TextNorm.normalize(col("text")) =!= col("text")).as("changed"),
        substring(probe, -1, 1).as("probe_tail"),
        length(probe).as("probe_len"))
      .orderBy(col("doc_id"))
  }

  /** Span-level benchmark contamination (q37's split, span output):
    * the exact ranges of training docs that overlap the eval slice
    * by an 8-gram window. */
  def q76(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    Dedup.contaminationSpans(
        d.filter(col("doc_id") % 10 =!= 0), d.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", k = 8)
      .select(col("id").as("doc_id"), col("span_id"), col("start_tok"),
        col("end_tok"), col("n_windows"))
      .orderBy(col("doc_id"), col("span_id"))
  }

  /** Decontamination APPLIED (GPT-3 policy at span granularity): the
    * training slice with every eval-overlapping range cut, text
    * restated byte-for-byte. */
  def q77(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    Dedup.exciseContamination(
        d.filter(col("doc_id") % 10 =!= 0), d.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", k = 8)
      .select(col("id").as("doc_id"), col("clean_text"), col("n_tokens"),
        col("n_removed"))
      .orderBy(col("doc_id"))
  }

  /** Matryoshka adaptive retrieval: 16-dim truncated shortlist of 20
    * per query, exact full-dimension rescoring to top-5 — both stages
    * deterministic (left-fold dots, ties by id), so the gate states
    * the final ranking bit-for-bit. */
  def q78(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    Similarity.adaptiveTopK(
        e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("vec")),
        e.select(col("vec_id").as("cid"), col("embedding").as("vec")),
        k = 5, dims = 16, shortlist = 20)
      .orderBy(col("qid"), col("rank"))
  }

  /** Random-projection retrieval (Johnson–Lindenstrauss ±1-sign
    * sketch, the distribution-free sibling of q78's truncation):
    * 16-dim projected-L2 shortlist of 20, exact full-dimension
    * cosine rescoring to top-5. Signs come from the portable
    * integer mixer (the q41 hyperplane recurrence), projections and
    * distances are sequential left folds — the oracle restates the
    * whole two-stage ranking bit-for-bit. */
  def q96(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    Similarity.rpTopK(
        e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("vec")),
        e.select(col("vec_id").as("cid"), col("embedding").as("vec")),
        k = 5, projDims = 16, shortlist = 20)
      .orderBy(col("qid"), col("rank"))
  }

  /** SQ8 scalar-quantized retrieval: per-dim min/max codebook, floor
    * codes (bit-portable — round ties differ across engines, floor
    * does not), asymmetric full-query-vs-dequantized search. */
  def q79(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    Similarity.sq8TopK(
        e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("vec")),
        e.select(col("vec_id").as("cid"), col("embedding").as("vec")),
        k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** BM25 retrieval of the corpus against a 3-term query. Like q59/
    * q72, the float score is spec territory (libm ln); the gate pins
    * the exact (term, tf, df) surface plus doc length via the
    * portable signature. */
  def q80(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.bm25(Tables.documents(spark, dir), "doc_id", "text",
        Seq("spark", "query", "window"))
      .select(col("id").as("doc_id"), col("n_terms"), col("sig"), col("dl"))
      .orderBy(col("doc_id"))

  /** PQ retrieval: 8 subspaces x 8 dims, 16 hash-picked codewords,
    * asymmetric ADC ranking by squared L2 to the reconstruction —
    * codes, reconstruction and fold order all deterministic, so the
    * gate restates ranks AND distances bit-for-bit. */
  def q81(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    Similarity.pqTopK(
        e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("vec")),
        e.select(col("vec_id").as("cid"), col("embedding").as("vec")),
        k = 5, m = 8, ks = 16)
      .orderBy(col("qid"), col("rank"))
  }

  /** Semantic contamination screen of the corpus slice against the
    * bench slice (vec_id % 10 == 0): per corpus doc, nearest bench
    * item + cosine + the >= 0.8 verdict. Honest all-clear on this
    * fixture (isotropic embeddings top out near cos 0.5); the spec
    * plants a paraphrase-grade duplicate to exercise the flag. */
  def q82(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    Similarity.semanticScreen(
        e.filter(col("vec_id") % 10 =!= 0)
          .select(col("vec_id").as("cid"), col("embedding").as("vec")),
        e.filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("bid"), col("embedding").as("vec")),
        threshold = 0.8)
      .orderBy(col("cid"))
  }

  /** Count-min-sketch heavy hitters: exact top-20 token counts
    * (hash-checked) + the CMS error-envelope booleans the oracle
    * states TRUE — the q64x discipline for frequency sketches. */
  def q83(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.heavyHitters(Tables.documents(spark, dir), "doc_id", "text")

  /** Skip-gram co-occurrence counts (symmetric window 2, min pair
    * count 2, top 100 by (n_wc desc, w, c)) — the GloVe/PPMI
    * preprocessing surface. The gate pins the integer counts; the
    * PMI float is spec territory (libm ln), per the q59/q72 split. */
  def q84(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.cooccur(Tables.documents(spark, dir), "doc_id", "text")

  /** C4 blocklist gate over the corpus: token-exact hits against
    * ("dup", "lorem", "{") — "dup" is the corpus's rare planted
    * token, the other two are C4's own lorem-ipsum/brace rules and
    * never occur, exercising the zero-hit path. Map-side. */
  def q86(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.blocklist(Tables.documents(spark, dir), "doc_id", "text",
        Seq("dup", "lorem", "{"))
      .orderBy(col("id"))

  /** Trained quality classifier: 5 batch-perceptron rounds over
    * 64-bucket hashed n-gram features, label = lang=='en' (the CCNet
    * curated-slice proxy). Every margin/update/weight is an exact
    * integer, so the full training trajectory — not just the final
    * scores — is pinned by the oracle's chained-CTE replay. Honesty
    * note: this fixture's text is language-independent, so accuracy
    * is near chance here; separation is spec territory
    * (PipelineSpec's separable fixture). */
  def q87(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityPerceptron(Tables.documents(spark, dir), "doc_id", "text",
        col("lang") === "en", buckets = 64, iters = 5)
      .orderBy(col("id"))

  /** AUC of the trained quality classifier — the evaluation leg that
    * closes q87's train→score loop: exact Mann–Whitney over the
    * integer margins (average ranks for ties stay on the 1/2 grid,
    * so twice the positive rank sum is an exact int64 and the AUC is
    * one IEEE division — the oracle replays training AND the rank
    * statistic bit-for-bit). */
  def q99(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.qualityPerceptron(
      Tables.documents(spark, dir), "doc_id", "text",
      col("lang") === "en", buckets = 64, iters = 5)
    TextAnalysis.marginAuc(scored, "y", "margin")
  }

  /** C4 line-level cleaning over multi-line pages: the corpus has no
    * newlines, so pages are built deterministically — 10 docs per
    * page (doc_id div 10), one line per doc, ordered by doc_id, with
    * a suffix by doc_id % 4 that exercises every rule branch:
    * 0 → text + "." (retained), 1 → bare text (no terminal
    * punctuation), 2 → text + " but Javascript required." (terminal
    * punct AND enough words, but the javascript rule drops it),
    * 3 → first two words + "!" (terminal punct but under 5 words).
    * The cleaned page text is gated byte-for-byte. */
  def q90(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val line = when(pmod(col("doc_id"), lit(4)) === 0, concat(col("text"), lit(".")))
      .when(pmod(col("doc_id"), lit(4)) === 1, col("text"))
      .when(pmod(col("doc_id"), lit(4)) === 2,
        concat(col("text"), lit(" but Javascript required.")))
      .otherwise(concat(regexp_extract(col("text"), "^(\\S+ \\S+)", 1), lit("!")))
    val pages = d.select(expr("doc_id div 10").as("page_id"),
        struct(col("doc_id"), line.as("line")).as("s"))
      .groupBy(col("page_id"))
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(col("s"))), x => x.getField("line"))).as("t"))
    TextAnalysis.c4LineClean(pages, "page_id", "t")
      .orderBy(col("id"))
  }

  /** Gopher duplicate-line statistics over pages with PLANTED line
    * repeats: docs with doc_id % 3 == 0 are cloned (id + 1e6 — and
    * 1e6 % 50 == 0, so each clone lands in its original's page),
    * pages are 50 id-residue groups with lines ordered by doc_id.
    * Per page: duplicate-line and duplicate-character fractions —
    * exact integer surfaces, IEEE-exact divisions. */
  def q91(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val all = d.unionAll(d.filter(pmod(col("doc_id"), lit(3)) === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    val pages = all.select(pmod(col("doc_id"), lit(50)).as("page_id"),
        struct(col("doc_id"), col("text").as("line")).as("s"))
      .groupBy(col("page_id"))
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(col("s"))), x => x.getField("line"))).as("t"))
    TextAnalysis.lineRepetition(pages, "page_id", "t")
      .orderBy(col("id"))
  }

  /** Cross-page frequent-line excision: clones of doc_id % 3 == 0
    * docs land in the NEIGHBORING page (id + 1000001, and
    * 1000001 % 50 == 1), planting identical lines across two
    * distinct pages — exactly the boilerplate shape the frequency
    * pass must cut from BOTH, while every unrepeated line survives
    * byte-for-byte. Natural exact-duplicate texts in the corpus get
    * cut too (both sides compute the same frequency table). */
  def q92(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val all = d.unionAll(d.filter(pmod(col("doc_id"), lit(3)) === 0)
      .select((col("doc_id") + 1000001).as("doc_id"), col("text")))
    val pages = all.select(pmod(col("doc_id"), lit(50)).as("page_id"),
        struct(col("doc_id"), col("text").as("line")).as("s"))
      .groupBy(col("page_id"))
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(col("s"))), x => x.getField("line"))).as("t"))
    TextAnalysis.exciseCommonLines(pages, "page_id", "t", minDocs = 2)
      .orderBy(col("id"))
  }

  /** OOV rate under the top-20 corpus vocabulary (the corpus has 31
    * distinct tokens, so the truncation leaves genuine OOV mass in
    * every doc): vocabTopK's deterministic (doc_freq desc, term_freq
    * desc, token) head becomes the driver-resident vocabulary, then a
    * map-side InSet probe counts uncovered occurrences per doc. */
  def q93(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val vocab = TextAnalysis.vocabTopK(d, "doc_id", "text", 20)
      .select(col("token")).collect().map(_.getString(0)).toSeq
    TextAnalysis.oovStats(d, "doc_id", "text", vocab)
      .orderBy(col("id"))
  }

  /** N-gram novelty of the held-out tenth (the "incoming source"
    * slice) against the rest of the corpus: trigram windows, hashed
    * gram keys engine-side, content-identity in the oracle — the
    * keep/drop signal a dataset-iteration loop computes before paying
    * dedup+training cost on redundant data. */
  def q98(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    TextAnalysis.ngramNovelty(
        d.filter(col("doc_id") % 10 =!= 0), d.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", n = 3)
      .select(col("id").as("doc_id"), col("n_windows"), col("n_distinct"),
        col("n_novel"), col("novelty_rate"))
      .orderBy(col("doc_id"))
  }

  /** Character-diversity surface (the ln-free gibberish filter):
    * one codegen'd histogram pass per doc, exact integer surfaces +
    * the Simpson concentration index as one IEEE division — the
    * whole row hash-gates. */
  def q100(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.charDiversity(Tables.documents(spark, dir), "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_chars"), col("n_distinct"),
        col("sum_sq"), col("simpson"))
      .orderBy(col("doc_id"))

  /** Bloom-filter decontamination (the broadcast-bitset probe that
    * replaces the join when only the fingerprint of the reference
    * set fits in memory): bench = the %10 slice (the q37
    * convention), corpus = the rest plus PLANTED contaminated copies
    * of every bench doc (ids +2000000), bloom over the full text
    * with k=3 and m = 8 × bench count — DELIBERATELY tight (~0.31
    * fill) so the gate exercises BOTH branches at every scale
    * factor: every planted copy flags (zero false negatives,
    * structural), and a ~3% deterministic false-positive band flags
    * too — the oracle replays the salted md5 position draws and
    * reproduces each false positive bit-for-bit. The exact-join
    * columns are gate EVIDENCE (they price the fp rate); production
    * decontamination runs the probe alone: one corpus scan, zero
    * shuffle, m/64 longs broadcast (and sizes m for the fp rate it
    * wants, not for gate theatrics). */
  def q103(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val bench = d.filter(col("doc_id") % 10 === 0)
    val corpus = d.filter(col("doc_id") % 10 =!= 0)
      .unionAll(bench.select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
    val flagged = Bloom.decontaminate(corpus, bench, "text",
      m = (bench.count() * 8).toInt, k = 3)
    val exact = corpus.join(bench.select(col("text")).distinct().withColumn("__hit", lit(true)),
        Seq("text"), "left")
    flagged.join(exact.select(col("doc_id"), coalesce(col("__hit"), lit(false)).as("true_hit")),
        Seq("doc_id"))
      .select(col("doc_id"), col("flagged"), col("true_hit"),
        (col("flagged") && !col("true_hit")).as("false_positive"))
      .orderBy(col("doc_id"))
  }

  /** Web-graph PageRank as a corpus-quality prior — 5 power
    * iterations of FIXED-POINT integer PageRank (d = 17/20, scale
    * 1e9) over the deterministic hashed link graph (outdeg 1 + v%3,
    * targets from portable md5 draws). Integer division end-to-end
    * makes every iteration bit-replayable: the oracle chains 5
    * materialized CTEs (the q48 discipline), so an ITERATIVE graph
    * algorithm is hash-gated, not rows-only. */
  /** Trending terms between two corpus slices (the day-over-day
    * vocabulary-drift detector — the signal that catches a new spam
    * campaign or topic surge before any quality model does): token
    * counts per slice (doc_id parity plays yesterday/today), growth
    * ranked by the EXACT integer surface c_new·1e6 div (c_old+1)
    * (the +1 Laplace floor keeps new-word growth finite; integer
    * division keeps the rank engine-portable — no float ratio to
    * diverge on). Two count aggregates + one token-keyed join;
    * tokens below minCount in the new slice drop BEFORE the join.
    * Top 25 by (growth, token) — total order, no rank ambiguity. */
  def q132(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    def slice(parity: Int) = d.filter(col("doc_id") % 2 === parity)
      .select(explode(TextAnalysis.wsTokens(lower(col("text")))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val newC = slice(1).filter(col("c") >= 5)
      .select(col("t"), col("c").as("c_new"))
    val oldC = slice(0).select(col("t"), col("c").as("c_old"))
    newC.join(oldC, Seq("t"), "left")
      .select(col("t"), col("c_new"),
        coalesce(col("c_old"), lit(0L)).as("c_old"))
      .withColumn("growth",
        expr("c_new * 1000000L div (c_old + 1L)"))
      .orderBy(col("growth").desc, col("t"))
      .limit(25)
  }

  /** Per-source duplication report (the curation dashboard row that
    * decides which sources get the expensive near-dup pass): every
    * 3rd doc planted as an exact copy, then per source ONE aggregate
    * of row count + distinct text-hash count — dup volume as exact
    * integers (n_dup_rows = rows − uniques), the corpus never
    * shuffles text (hashes only). */
  def q129(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("text"))
    val doubled = base.unionAll(base.filter(col("doc_id") % 3 === 0)
      .select(col("source"), (col("doc_id") + 1000000L).as("doc_id"), col("text")))
    doubled.groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(md5(col("text"))).as("n_unique"))
      .withColumn("n_dup_rows", col("n_rows") - col("n_unique"))
      .orderBy(col("source"))
  }

  /** END-TO-END curation chain under ONE gate: extract (q119's HTML
    * wrap → strip/decode) → exact dedup over a corpus doubled with
    * planted copies (keeper = min id per text hash, the q30/q85
    * shape — the join carries 32-byte hashes, never text) → 60%
    * deterministic hash-sample of the survivors (the q45 gate) →
    * per-doc token count. One status per row proves the STAGES
    * COMPOSE — each stage is gated standalone elsewhere; this pins
    * the plumbing between them, which is what an operator library
    * actually sells. Every stage stays map-side or hash-keyed; no
    * stage materializes another's intermediate to disk. */
  def q127(spark: SparkSession, dir: String): DataFrame = {
    def esc(c: Column): Column =
      regexp_replace(regexp_replace(regexp_replace(c,
        lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
    val html = Tables.documents(spark, dir).select(col("doc_id"),
      concat(lit("<html><body><p>"), esc(col("text")),
        lit("</p> <div>footer</div></body></html>")).as("html"))
    val cleaned = TextAnalysis.htmlToText(html, "doc_id", "html")
      .select(col("doc_id"), col("clean_text"))
    val doubled = cleaned.unionAll(cleaned.select(
      (col("doc_id") + 1000000L).as("doc_id"), col("clean_text")))
      .withColumn("h", md5(col("clean_text")))
      .withColumn("n_tokens",
        size(filter(split(col("clean_text"), " "), w => length(w) > 0)).cast("long"))
      .drop("clean_text")
    val keeper = doubled.groupBy(col("h")).agg(min(col("doc_id")).as("keeper"))
    doubled.join(keeper, "h")
      .select(col("doc_id"),
        when(col("doc_id") =!= col("keeper"), "dup")
          .when(Sampling.hashGate(col("doc_id")) >= 600000L, "sampled_out")
          .otherwise("kept").as("status"),
        col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Accent-insensitive match keys ([[TextAnalysis.matchKey]]:
    * NFD → strip combining marks → lower → NFC) over text salted
    * with a deterministic accented suffix — the normalization
    * cross-source entity joins and fuzzy dedup run on ("Café" ==
    * "cafe"); byte-gated against DuckDB's ICU strip_accents, which
    * ships the same transform for Latin script. */
  def q125(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextAnalysis.matchKey(concat(col("text"),
          lit(" Café Ñandú ÜBER élan Noël"), col("doc_id") % 7))
          .as("match_key"))
      .orderBy(col("doc_id"))

  /** URL canonicalization ([[TextAnalysis.canonicalizeUrl]]) over a
    * deterministic fixture of crawl-shaped URLs (mixed-case hosts,
    * default ports, tracking params, unsorted queries, fragments,
    * plus a non-URL passthrough arm): the key-normalization step
    * before URL-level dedup — every rule byte-gated. Map-side. */
  def q123(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val url = when(col("doc_id") % 4 === 0,
        concat(lit("HTTP://Example"), col("doc_id") % 5,
          lit(".COM:80/Path/"), col("doc_id"),
          lit("?utm_source=feed&id="), col("doc_id") % 7, lit("&b=2#sec")))
      .when(col("doc_id") % 4 === 1,
        concat(lit("https://cdn.example.org:443/a/"), col("doc_id")))
      .when(col("doc_id") % 4 === 2,
        concat(lit("https://Example.org/a?z=1&a=2&gclid=XYZ"), col("doc_id")))
      .otherwise(concat(lit("not a url "), col("doc_id")))
    d.select(col("doc_id"), url.as("url"))
      .withColumn("canon_url", TextAnalysis.canonicalizeUrl(col("url")))
      .orderBy(col("doc_id"))
  }

  /** Fixed-round 3-core peeling over the q114 fixture graph
    * ([[LinkGraph.kcore]]): 8 peel rounds, each replayed by the
    * oracle as chained MATERIALIZED CTEs (the q104 discipline for
    * iterative graph algorithms) — KcoreSpec pins that the fixture
    * reaches the fixed point well inside the round budget. */
  def q121(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"))
    LinkGraph.kcore(
        LinkGraph.hashedFixtureEdges(spark, d, "doc_id", "tri:", 6), d,
        "src", "dst", "doc_id", k = 3, rounds = 8)
      .orderBy(col("doc_id"))
  }

  /** Per-language token-count quartiles ([[Profile.exactQuantilesBy]])
    * — the calibration table curation thresholds are actually applied
    * from (a global cut over mixed languages is wrong for every
    * language); q113's integer cut rule, window now PARTITIONED by
    * lang so no single-partition window exists at any scale. */
  def q122(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("lang"),
      size(filter(split(col("text"), " "), w => length(w) > 0))
        .cast("long").as("n_tokens"))
    graft.operators.Profile.exactQuantilesBy(d, "lang", "n_tokens", 4)
  }

  /** Corpus snapshot diff ([[Snapshot.diff]]): v2 is a deterministic
    * in-query mutation of the documents table (every 97th doc
    * removed, every 31st surviving doc revised, a new doc minted per
    * 53rd id), and the diff must classify every id exactly — the
    * dataset-versioning audit beside q118's checksum. Both sides
    * reduce to (id, hash) map-side before the full-outer join. */
  def q120(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val v2 = d.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 31 === 0, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")).as("text"))
      .unionAll(d.filter(col("doc_id") % 53 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit("new doc "), col("doc_id")).as("text")))
    Snapshot.diff(d, v2, "doc_id", Seq("text"))
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** HTML → text extraction (the crawl-to-corpus front door every
    * training pipeline runs before any other curation op): each doc
    * is wrapped in deterministic markup (tags, attributes, escaped
    * entities) IN the query, then [[TextAnalysis.htmlToText]] strips
    * tags and decodes entities — the gate hash-checks the cleaned
    * BYTES, so the cross-engine contract under test is regex
    * semantics parity (leftmost match, global replace), exactly the
    * thing that silently diverges between extraction stacks. Pure
    * map-side; no shuffle beyond the gate's orderBy. */
  def q119(spark: SparkSession, dir: String): DataFrame = {
    def esc(c: Column): Column =
      regexp_replace(regexp_replace(regexp_replace(c,
        lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
    val html = Tables.documents(spark, dir).select(col("doc_id"),
      concat(lit("<html><head><title>doc "), col("doc_id"),
        lit("</title></head><body><p class=\"main\">"), esc(col("text")),
        lit("</p><hr/><div id=\"f\">footer &amp; legal &#39;v1&#39;</div></body></html>"))
        .as("html"))
    TextAnalysis.htmlToText(html, "doc_id", "html")
      .orderBy(col("doc_id"))
  }

  /** WARC container ingest (ISO 28500) — the step BEFORE q119's
    * HTML extraction in a real crawl pipeline: per-doc payloads are
    * complete synthetic WARC streams in the genuine byte layout
    * (version line, CRLF headers, Content-Length-governed blocks,
    * record terminators; ODD ids gzip member-per-record, the
    * crawl-standard .warc.gz shape), parsed by [[WarcSource]]'s
    * permissive record walker. Every surface is closed-form in
    * doc_id, so the oracle restates arithmetic while the hash check
    * exercises header parsing, block slicing, stream-order offsets
    * (first_uri rides min(offset)) and multi-member gzip inflation.
    * Scale shape: pure map-side parse (decodeBatch discipline) +
    * one aggregation keyed by doc. */
  def q134(spark: SparkSession, dir: String): DataFrame = {
    val byteSum = udf((b: Array[Byte]) => {
      var s = 0L; var i = 0
      while (i < b.length) { s += (b(i) & 0xff); i += 1 }
      s
    })
    val payloads = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"),
        WarcSource.syntheticWarcUdf(col("doc_id")).as("payload"))
    val recs = WarcSource.records(WarcSource.parseBatch(payloads))
    recs.groupBy(col("path").cast("long").as("doc_id"))
      .agg(count(lit(1)).as("n_records"),
        sum(col("content_length")).as("block_bytes"),
        sum(byteSum(col("body"))).as("body_sum"),
        min(struct(col("offset"), col("target_uri")))
          .getField("target_uri").as("first_uri"),
        array_join(sort_array(collect_list(col("warc_type"))), ",")
          .as("types_sorted"))
      .orderBy(col("doc_id"))
  }

  /** Writer schema for [[q160]]: every contract type the
    * [[AvroSource]] conversion supports, values closed-form in
    * doc_id so the oracle restates arithmetic while the hash check
    * exercises the genuine container bytes (magic, header schema,
    * deflate blocks, sync markers) both directions. */
  private val q160WriterSchema =
    """{"type":"record","name":"DocRow","fields":[
      |{"name":"doc_id","type":"long"},
      |{"name":"b","type":"boolean"},
      |{"name":"i","type":"int"},
      |{"name":"l","type":"long"},
      |{"name":"s","type":"string"},
      |{"name":"lang","type":"string"},
      |{"name":"n_chars","type":"long"},
      |{"name":"bin","type":"bytes"},
      |{"name":"arr","type":{"type":"array","items":"long"}},
      |{"name":"opt","type":["null","long"]},
      |{"name":"e","type":{"type":"enum","name":"Sym","symbols":["S0","S1","S2"]}},
      |{"name":"rec","type":{"type":"record","name":"Inner","fields":[
      |  {"name":"rs","type":"string"},{"name":"rn","type":"long"}]}},
      |{"name":"m","type":{"type":"map","values":"long"}}]}""".stripMargin

  /** Reader schema for [[q160]]: the EVOLVED contract — field `i`
    * dropped (writer-only fields are skipped), `extra` added with a
    * default (reader-only fields are filled), order shuffled (Avro
    * resolution matches by name) — the shard-to-shard drift a
    * months-long 100 TB archive accumulates. */
  private val q160ReaderSchema =
    """{"type":"record","name":"DocRow","fields":[
      |{"name":"l","type":"long"},
      |{"name":"doc_id","type":"long"},
      |{"name":"extra","type":"long","default":-1},
      |{"name":"s","type":"string"},
      |{"name":"b","type":"boolean"},
      |{"name":"n_chars","type":"long"},
      |{"name":"bin","type":"bytes"},
      |{"name":"lang","type":"string"},
      |{"name":"opt","type":["null","long"]},
      |{"name":"arr","type":{"type":"array","items":"long"}},
      |{"name":"e","type":{"type":"enum","name":"Sym","symbols":["S0","S1","S2"]}},
      |{"name":"rec","type":{"type":"record","name":"Inner","fields":[
      |  {"name":"rs","type":"string"},{"name":"rn","type":"long"}]}},
      |{"name":"m","type":{"type":"map","values":"long"}}]}""".stripMargin

  /** Avro container round trip under the gate (the r7 verdict's task
    * #5, proven the q156 way — REAL files on disk, not in-memory
    * bytes): documents projected onto every [[AvroSource]] contract
    * type with closed-form values → written as 4 deflate container
    * shards (one file per partition) → read back under the EVOLVED
    * reader schema ([[q160ReaderSchema]]: drop/add-default/reorder,
    * Avro's public resolution rules). The hash covers every value
    * after the byte round trip plus the resolution surface (`extra`
    * = its default on all rows); the oracle restates the same values
    * straight off the source table — equality proves the writer laid
    * out valid containers and the reader decoded + resolved them
    * without loss. Binary/array/map surfaces land as deterministic
    * strings (hex / joins) for engine-portable hashing. Corruption
    * paths are AvroSpec territory (planted flip/sync/truncation). */
  def q160(spark: SparkSession, dir: String): DataFrame = {
    val out = sys.props("java.io.tmpdir").stripSuffix("/") +
      "/graft_avro_" + dir.replaceAll("[^A-Za-z0-9.]", "_")
    val src = Tables.documents(spark, dir).select(
      col("doc_id"),
      (col("doc_id") % 2 === 0).as("b"),
      ((col("doc_id") * 3) % 1000 - 500).cast("int").as("i"),
      (col("doc_id") * 1000003L).as("l"),
      col("source").as("s"),
      col("lang"),
      col("n_chars"),
      unhex(md5(col("text"))).as("bin"),
      array(col("doc_id"), col("n_chars"), col("doc_id") % 7).as("arr"),
      when(col("doc_id") % 5 === 0, lit(null).cast("long"))
        .otherwise(col("doc_id") * 7).as("opt"),
      concat(lit("S"), col("doc_id") % 3).as("e"),
      struct(col("source").as("rs"), (col("doc_id") % 13).as("rn")).as("rec"),
      map(lit("a"), col("n_chars"), lit("b"), col("doc_id") % 11).as("m"))
    AvroSource.write(src.repartition(4, col("doc_id")), out,
      q160WriterSchema, codec = "deflate")
    AvroSource.records(AvroSource.read(spark, out, q160ReaderSchema))
      .select(
        col("doc_id"), col("b"), col("l"), col("s"), col("lang"), col("n_chars"),
        hex(col("bin")).as("bin_hex"),
        array_join(transform(col("arr"), x => x.cast("string")), ",").as("arr_s"),
        col("opt"), col("e"),
        col("rec").getField("rs").as("rs"), col("rec").getField("rn").as("rn"),
        array_join(sort_array(transform(map_entries(col("m")),
          kv => concat(kv.getField("key"), lit("="),
            kv.getField("value").cast("string")))), ";").as("m_s"),
        col("extra"))
      .orderBy(col("doc_id"))
  }

  /** The crawl front door END-TO-END under one gate (the q127
    * discipline applied to the NEW ingest chain): WARC response
    * records carrying GENUINE HTTP messages (status line + headers +
    * blank line + HTML entity body — the CommonCrawl block layout;
    * odd ids gzipped) → [[WarcSource]] record parse →
    * [[WarcSource.httpBody]] header/body split →
    * [[TextAnalysis.htmlToText]] extraction. Each stage is gated
    * standalone (q134/q119); this pins the PLUMBING between them —
    * the declared Content-Length must cover exactly the HTTP head +
    * HTML bytes (ASCII corpus: octet == char length, which the
    * oracle restates as length arithmetic), and the extracted text
    * must byte-match q119's closed forms after transiting the
    * container. Pure map-side until the gate's orderBy. */
  def q140(spark: SparkSession, dir: String): DataFrame = {
    def esc(c: Column): Column =
      regexp_replace(regexp_replace(regexp_replace(c,
        lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
    val html = Tables.documents(spark, dir).select(col("doc_id"),
      concat(lit("<html><head><title>doc "), col("doc_id"),
        lit("</title></head><body><p class=\"main\">"), esc(col("text")),
        lit("</p><hr/><div id=\"f\">footer &amp; legal &#39;v1&#39;</div></body></html>"))
        .as("html"))
    val payloads = html.select(col("doc_id").as("id"),
      WarcSource.syntheticHttpWarcUdf(col("doc_id"), col("html")).as("payload"))
    val recs = WarcSource.records(WarcSource.parseBatch(payloads))
    val pages = recs.select(col("path").cast("long").as("doc_id"),
      col("content_length"), col("target_uri"),
      WarcSource.httpBodyUdf(col("body")).cast("string").as("html"))
    TextAnalysis.htmlToText(pages, "doc_id", "html")
      .join(pages.select(col("doc_id"), col("content_length"), col("target_uri")),
        "doc_id")
      .select(col("doc_id"), col("content_length"), col("target_uri"),
        col("n_tags"), col("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** Unigram-LM tokenizer SEED vocabulary (Kudo 2018's candidate
    * extraction, the q48 counterpart for the SentencePiece family):
    * top-48 substrings (length ≤ 4) of the corpus word types by
    * exact integer corpus frequency. The oracle replays the same
    * substring explosion and (score DESC, piece) ranking — pure
    * integer counting, so the learned inventory is hash-checked
    * end-to-end. Scale: candidate space is VOCABULARY-bounded
    * (Σ len·4 per word TYPE), never corpus-bounded. */
  def q136(spark: SparkSession, dir: String): DataFrame =
    Unigram.substringSeed(Tables.documents(spark, dir), "text",
        maxPieceLen = 4, topK = 48)
      .orderBy(col("rank"))

  /** Unigram-LM Viterbi segmentation under QUANTIZED integer costs —
    * the gate-tier half of the q59 float/integer split: piece cost
    * = ilog16(total) − ilog16(score) with [[Unigram.ilog2Fixed16]]'s
    * exact shift-and-square binary log (integer ops only, so both
    * engines price pieces bit-identically), Viterbi minimizing
    * (Σcost, n_pieces) as the combined key Σcost·64+n. The oracle
    * replays seed → char-coverage union → ilog (4 unrolled
    * square-and-shift rounds) → 16 chained DP relaxation rounds (the
    * q104 discipline), then joins the per-TYPE solution onto each
    * doc's words exactly as the engine does. The FLOAT unigram EM
    * (Unigram.train) is spec territory (UnigramSpec). */
  def q137(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val pieces = Unigram.pieceCosts(d, "text", maxPieceLen = 4, topK = 48)
    Unigram.segmentStats(d, "doc_id", "text", pieces, maxWordLen = 16)
      .orderBy(col("doc_id"))
  }

  /** FIXED-POINT integer Lloyd k-means, driver-gated (the r6
    * verdict's task #3 — one TRAINED quantizer path under the
    * oracle): 3 replayed training rounds over the 1024-grid
    * quantized embeddings, k = 4 seeded from the smallest ids. The
    * oracle replays quantization, the combined-key argmin
    * (dist·4 + c), and the sign-safe floor-division centroid update
    * through 3 chained CTE rounds — final centroids, cluster sizes
    * and total inertia all hash-checked. Float Lloyd
    * (Similarity.trainKmeans) stays the spec'd production path. */
  def q138(spark: SparkSession, dir: String): DataFrame =
    KmeansFixed.gateSurface(Tables.embeddings(spark, dir),
        "vec_id", "embedding", k = 4, iters = 3)
      .orderBy(col("cluster"), col("dim"))

  /** Fixed-point IVF-PQ end-to-end (the r7 verdict's task #2): the
    * q138 coarse quantizer + q81's hash-picked codebook applied to
    * integer RESIDUALS, encode, and the nprobe ADC search — index
    * ('assign' rows: list + folded codes + coarse dist per vector)
    * AND search ('topk' rows: rank/cid/exact adist per query) under
    * ONE hash. Float IVF-PQ (Similarity.ivfPqTopK) stays the spec'd
    * production path. */
  def q157(spark: SparkSession, dir: String): DataFrame =
    IvfPqFixed.gateSurface(Tables.embeddings(spark, dir),
      "vec_id", "embedding", k = 4, iters = 3, m = 8, ks = 16,
      nprobe = 2, topK = 5)

  /** TRAINED language-ID under the gate (the r7 verdict's task #3):
    * one-vs-rest integer batch perceptrons over hashed char-trigram
    * buckets, 3 training rounds, the FULL final margin matrix (one
    * row per doc × class) plus the pinned argmax hash-checked — the
    * oracle replays featurization and every round's multiclass
    * update as chained CTEs (the q87 discipline, lifted to C
    * classes). The q52 heuristic stays the zero-training bootstrap;
    * honesty note: this corpus's text is language-independent
    * (q87's note), so accuracy here is near chance — separation is
    * spec territory (TextAnalysisSpec's separable multiclass
    * fixture). */
  def q158(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.langIdPerceptron(Tables.documents(spark, dir),
        "doc_id", "text", "lang", gramLen = 3, buckets = 64, iters = 3)
      .orderBy(col("id"), col("cls"))

  /** Per-node triangle counts over a denser hashed fixture graph
    * (outdeg 1 + v % 6, prefix "tri:") — the degree-ordered exact
    * enumeration of [[LinkGraph.triangleCounts]], gated against a
    * brute three-way-join oracle that replays the same edge draws. */
  def q114(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"))
    LinkGraph.triangleCounts(
        LinkGraph.hashedFixtureEdges(spark, d, "doc_id", "tri:", 6), d,
        "src", "dst", "doc_id")
      .orderBy(col("doc_id"))
  }

  def q104(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"))
    LinkGraph.pageRankFixedPoint(
        LinkGraph.hashedFixtureEdges(spark, d, "doc_id"), d,
        "src", "dst", "doc_id", iters = 5)
      .orderBy(col("doc_id"))
  }

  /** Fuzzy entity matching: every pair of distinct customer names at
    * edit distance 1 (the one-typo/one-digit record-linkage signal),
    * via [[Dedup.fuzzyPairs1]]'s symmetric-delete blocking — the
    * candidate join is an equi-join on delete-1 variant keys, never
    * the all-pairs product the oracle's naive length-banded cross
    * join runs. EXACT: blocking is structurally complete at k=1 and
    * every candidate is levenshtein-verified. */
  def q106(spark: SparkSession, dir: String): DataFrame =
    Dedup.fuzzyPairs1(Tables.customer(spark, dir), "c_name")
      .select(col("a").as("name_a"), col("b").as("name_b"), col("dist"))
      .orderBy(col("name_a"), col("name_b"))

  /** Record-linkage fuzzy matching at edit distance ≤ 2
    * ([[Dedup.fuzzyPairs2]]'s delete-≤2 symmetric blocking), proven
    * loss-free against the same NAIVE length-banded oracle shape as
    * q106 — identical output means the wider neighborhood still
    * misses nothing while the join stays bounded by n·O(len²)
    * variants, never the all-pairs product. The fixture keys are the
    * SPARSE hashed shape k=2 exists for (md5-derived 8-hex prefix
    * per 3-customer group + a one-digit suffix, so every group
    * plants distance-1/2 positives while the space stays
    * near-singleton-bucketed): zero-padded dense numerics like
    * c_name are fuzzyPairs2's DOCUMENTED anti-pattern (bucket-
    * quadratic, ~50× output — BENCH.md r7 measured 76 s at sf0.1 on
    * exactly that shape before this re-fixture; the operator
    * docstring routes such spaces to k=1 or prefix blocking). */
  def q139(spark: SparkSession, dir: String): DataFrame = {
    val keys = Tables.customer(spark, dir).select(
      expr("concat(substring(md5(cast(c_custkey div 3 as string)), 1, 8), " +
        "cast(c_custkey % 3 as string))").as("link_key"))
    Dedup.fuzzyPairs2(keys, "link_key")
      .select(col("a").as("key_a"), col("b").as("key_b"), col("dist"))
      .orderBy(col("key_a"), col("key_b"))
  }

  /** WordPiece tokenizer training (Schuster & Nakajima 2012 — the
    * BERT family, the THIRD trained-subword family beside BPE and
    * unigram-LM): the first 10 merges under the LIKELIHOOD objective
    * score(a,b) = count(ab) / (count(a)·count(b)) over the corpus
    * word-type table, `##` continuation convention, merge product
    * a + strip##(b). The argmax is FLOAT-FREE — exact BigInt
    * cross-multiplication inside a proven tolerance band
    * ([[WordPiece.train]]) — and the oracle replays all 10 rounds
    * with a HUGEINT cross-multiplied anti-join argmax, so merge
    * choices, products and the `##` bookkeeping all sit inside the
    * hash with no float anywhere in either engine's decision. */
  def q141(spark: SparkSession, dir: String): DataFrame = {
    val merges = WordPiece.train(Tables.documents(spark, dir), "text",
      numMerges = 10)
    WordPiece.mergesDF(spark, merges).orderBy(col("rank"))
  }

  /** WordPiece inference under the q141-trained vocabulary: per-doc
    * token counts by greedy longest-match-first (the published BERT
    * rule — NOT merge replay; gating encode separately from training
    * is the point, since the two algorithms only agree through the
    * vocabulary), maxInputChars = 16 so over-length words collapse
    * to one [UNK]. The oracle replays training to the final
    * alphabet ∪ products vocabulary, classifies pieces by the raw
    * `##` prefix exactly as the engine's [[WordPiece.Vocab]] does,
    * then runs 16 chained longest-match rounds per word TYPE (each
    * round consumes >= 1 char, so 16 rounds close every <= 16-char
    * word) and joins counts back per doc — the q49 discipline. */
  def q142(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val merges = WordPiece.train(docs, "text", numMerges = 10)
    val vocab = WordPiece.vocabulary(docs, "text", merges)
    docs.select(col("doc_id"),
        WordPiece.tokenCountUdf(vocab, maxInputChars = 16)(col("text"))
          .as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** WebDataset-style tar-shard assignment (the export container
    * training pipelines ship corpora in): per source stream, entries
    * in doc_id order cost 512 + ceil(bytes/512)·512 tar bytes;
    * start_bytes via [[Sampling.packChunks]]'s banded two-phase
    * prefix sum; shard = start div 64 KiB with entries NEVER
    * straddling (bounded overshoot — a tar entry is atomic); byte
    * offset inside the shard. All exact integer arithmetic, so the
    * oracle restates it as two windows; the tar BYTES themselves
    * ([[TarShards.shardBytes]]/writeShards) are spec territory where
    * the rendered headers' actual offsets are cross-checked against
    * exactly this assignment arithmetic. */
  def q143(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        octet_length(col("text")).as("payload"))
    TarShards.assign(d, "doc_id", "payload", "source", budget = 65536L)
      .orderBy(col("source"), col("doc_id"))
  }

  /** robots.txt compliance decisions (RFC 9309 — the crawl-politeness
    * leg of the curation front door): per-domain robots BODIES in the
    * genuine line grammar (foreign-UA group, case-mixed field names,
    * comments, Crawl-delay mid-group, an empty Disallow no-op) are
    * parsed by [[Robots.parseRules]], matched with the `*`/`$`
    * wildcard matcher, and decided by longest-pattern-wins with
    * Allow beating Disallow at equal length (combined key len·2 +
    * allow, max-struct tie-break). The oracle restates the `*`-group
    * RULES closed-form (the q134 discipline) and replays the match
    * as LIKE patterns with the identical argmax — parser, group
    * selection, wildcard semantics and precedence all inside the
    * hash via two independent match implementations. */
  def q146(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val urls = d.select(col("doc_id"),
      concat(lit("example"), col("doc_id") % 5, lit(".com")).as("domain"),
      when(col("doc_id") % 4 === 0,
          concat(lit("/p/"), col("doc_id") % 7, lit("/page"), col("doc_id")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("/static/img"), col("doc_id"), lit(".png")))
        .when(col("doc_id") % 4 === 2, concat(lit("/admin/x"), col("doc_id")))
        .otherwise(concat(lit("/about"), col("doc_id"))).as("path"))
    val doms = spark.range(5).select(
      concat(lit("example"), col("id"), lit(".com")).as("domain"),
      concat(
        lit("User-agent: megabot\nDisallow: /\n\n# everyone else\nUSER-AGENT: *\n" +
          "disallow: /admin/\nAllow: /admin/x1\nDisallow: /static/*.png$\n" +
          "Crawl-delay: 5\nDisallow: /p/"),
        col("id"), lit("/\nAllow: /p/"), col("id"), lit("/page\nDisallow: /p/"),
        (col("id") + 1) % 7, lit("/\nDisallow:\n")).as("robots"))
    val rules = doms.select(col("domain"),
        explode(Robots.parseRulesUdf(col("robots"))).as("r"))
      .select(col("domain"), col("r._1").as("allow"), col("r._2").as("rpath"))
    Robots.decide(urls, rules, "doc_id", "domain", "path")
      .orderBy(col("doc_id"))
  }

  /** The PRETRAINING-DATA chain END-TO-END under one gate (the q127
    * curation-chain discipline applied to the training-side loop):
    * exact dedup (keeper = min doc_id per text) → integer quality
    * rules (20 ≤ n_tok ≤ 2000, longest word ≤ 30 — the q74
    * integer-surface discipline) → whitespace token budgets → q46's
    * banded two-phase prefix-sum packing into 2048-token bins per
    * source. One hash covers the whole composition: a bug in ANY
    * stage (a dropped dup, a filter off-by-one, a shifted offset)
    * moves every downstream packing cell. The pieces stay
    * individually gated (q30/q74/q46) — this pins their
    * COMPOSITION, which is what a production pipeline actually
    * ships. */
  def q150(spark: SparkSession, dir: String): DataFrame =
    pretrainChain(Tables.documents(spark, dir))
      .orderBy(col("source"), col("doc_id"))

  /** The q150 chain body over an arbitrary documents-shaped frame
    * (doc_id, source, text ...) — shared by q150 (raw parquet
    * source) and q171 (the same chain running OVER a snapshot
    * table), so the two gates provably run the identical
    * composition. */
  private def pretrainChain(docs: DataFrame): DataFrame = {
    val d = docs.filter(col("text").isNotNull)
    val keeper = d.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val kept = d.join(keeper, Seq("doc_id"), "leftsemi")
    val toks = kept.select(col("doc_id"), col("source"),
        TextAnalysis.wsTokens(col("text")).as("ws"))
      .select(col("doc_id"), col("source"),
        size(col("ws")).cast("long").as("n_tok"),
        array_max(transform(col("ws"), w => length(w))).as("max_wlen"))
      .filter(col("n_tok") >= 20 && col("n_tok") <= 2000 &&
        col("max_wlen") <= 30)
      .drop("max_wlen")
    Sampling.packChunks(toks, "doc_id", "n_tok", "source", budget = 2048)
  }

  /** The pretraining chain run END-TO-END OVER THE TABLE LAYER — the
    * integration [[graft.operators.Snapshots]] exists for (the r8
    * backlog's #1): documents land in a snapshot table over TWO
    * commits (publish + append — the chain's source is a real
    * multi-version manifest read, one explicit-schema relation), the
    * EXACT q150 composition ([[pretrainChain]] — the same function
    * object) runs over `Snapshots.read`, and its output is PUBLISHED
    * as a snapshot table and read back through a manifest before
    * hashing. The oracle restates the chain off the raw parquet —
    * identical output proves the table layer is TRANSPARENT to the
    * operators: no row, type or value drifts crossing publish/read
    * on either side of the pipeline.
    *
    * Scale: the snapshot read adds zero shuffles (one parquet
    * relation either way); the publish legs are the standard one
    *-hash-repartition write. Cost over q150 = the two table writes. */
  def q171(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Snapshots
    val base = sys.props("java.io.tmpdir").stripSuffix("/") +
      "/graft_snappipe_" + dir.replaceAll("[^A-Za-z0-9.]", "_")
    graft.operators.Snapshots.dropPath(spark, base)
    val srcTbl = s"$base/docs"
    val outTbl = s"$base/packed"
    val docs = Tables.documents(spark, dir)
      .withColumn("bucket", expr("doc_id div 4096"))
    Snapshots.publish(docs.filter(col("doc_id") % 2 === 0), srcTbl,
      "bucket", Seq("doc_id"))
    Snapshots.append(docs.filter(col("doc_id") % 2 === 1), srcTbl,
      "bucket", Seq("doc_id"))
    val packed = pretrainChain(Snapshots.read(spark, srcTbl).drop("bucket"))
    Snapshots.publish(packed.withColumn("bucket", expr("doc_id div 4096")),
      outTbl, "bucket", Seq("doc_id"))
    Snapshots.read(spark, outTbl).drop("bucket")
      .orderBy(col("source"), col("doc_id"))
  }

  /** TF-IDF keyword extraction under the QUANTIZED integer idf
    * ([[TextAnalysis.tfidfTopK]] — the q137 shift-and-square log
    * applied to the classic retrieval score): top-5 terms per doc by
    * tf·idf16 with idf16 = ilog16(N) − ilog16(df), every rank
    * decision exact integer arithmetic. The oracle replays the ilog
    * (4 unrolled square-and-shift rounds over the df table + the N
    * sentinel) and the rank window — term choice, quantized scores
    * and tie order all inside the hash. */
  def q151(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfTopK(Tables.documents(spark, dir), "doc_id", "text",
        k = 5)
      .orderBy(col("doc_id"), col("rank"))

  /** Sharded inverted-index build over the corpus (8 doc-shards):
    * posting lists gated as serialized "docId:tf" runs, so the
    * oracle's ordered string_agg must agree with the engine's
    * sorted-struct transform byte-for-byte — order, tf counts and
    * shard split all inside the hash check. */
  def q110(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.invertedIndex(Tables.documents(spark, dir), "doc_id", "text",
        shards = 8)
      .orderBy(col("token"), col("shard"))

  /** Exact decile cut points of per-doc token counts — the corpus
    * calibration table a curation pass thresholds against (keep the
    * top-k deciles, mix by length band): [[graft.operators.Profile.exactQuantiles]]'s
    * histogram + histogram-prefix shape, never a global row sort;
    * cuts stated in pure integer arithmetic (cum·10 ≥ d·N) so the
    * oracle lands on identical rows. */
  def q113(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.exactQuantiles(
      Tables.documents(spark, dir)
        .select(size(TextAnalysis.wsTokens(col("text"))).cast("long").as("n_tokens")),
      "n_tokens", q = 10)

  /** Deterministic train/val/test assignment (90/5/5): one portable
    * md5 draw per doc (key "split:id"), thresholds at 900000/950000
    * of the 1e6 gate modulus — disjoint, total, rerun-identical; the
    * oracle replays the fold and the CASE chain verbatim. */
  def q94(spark: SparkSession, dir: String): DataFrame =
    Sampling.splitAssign(Tables.documents(spark, dir), "doc_id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .select(col("doc_id"), col("split"))
      .orderBy(col("doc_id"))

  /** Dedup with a quality-aware canonical pick (RefinedWeb keeps the
    * LONGEST copy of each duplicate class, not the min-id one): q35's
    * cluster corpus, but each planted clone is the doc self-concatenated
    * — same word SET (so the 0.999 threshold still clusters it with the
    * original) at twice the token count — and the keeper is the
    * per-cluster (token count, min id) argmax via [[Dedup.keepBest]],
    * which collapses in the partial aggregate rather than a
    * single-reducer window. The oracle restates the word-set
    * equivalence class and the same argmax. */
  def q85(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .filter(col("source").isin("src0", "src1", "src2", "src3"))
      .select(col("doc_id"), col("text"))
    val doubled = d.unionAll(d.select(
      (col("doc_id") + 1000000).as("doc_id"),
      concat(col("text"), lit(" "), col("text")).as("text")))
    Dedup.dedupCorpusKeepBest(doubled, "doc_id", "text", threshold = 0.999,
        size(filter(split(col("text"), " "), w => length(w) > lit(0))).cast("long"))
      .orderBy(col("id"))
  }

  /** The full q87 perceptron replay preamble (featurization + 5
    * training rounds) — shared by the q87 and q99 oracles: leaves
    * `lab (id, y)`, `fx (id, b, n)` and the trained `w5 (b, w)`. */
  private def sqlPerceptronPreamble: String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id AS id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
       |    list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS tk
       |  FROM documents),
       |lab AS MATERIALIZED (SELECT id, CAST(y AS BIGINT) AS y FROM toks),
       |tok AS MATERIALIZED (
       |  SELECT id, i, tk[CAST(i AS INT)] AS w
       |  FROM toks, unnest(generate_series(1, len(tk))) AS t(i)),
       |feat AS MATERIALIZED (
       |  SELECT id, w AS g FROM tok
       |  UNION ALL
       |  SELECT a.id, a.w || chr(1) || b.w
       |  FROM tok a JOIN tok b ON a.id = b.id AND b.i = a.i + 1),
       |fx AS MATERIALIZED (
       |  SELECT id, b, CAST(count(*) AS BIGINT) AS n FROM (
       |    SELECT id, ${sqlMd5Fold("g")} % 64 AS b FROM feat)
       |  GROUP BY id, b
       |  UNION ALL
       |  SELECT id, CAST(64 AS BIGINT) AS b, CAST(1 AS BIGINT) AS n FROM toks),
       |w0 AS MATERIALIZED (
       |  SELECT CAST(t.b AS BIGINT) AS b, CAST(0 AS BIGINT) AS w
       |  FROM unnest(generate_series(0, 64)) AS t(b)),
       |${sqlPerceptronCtes(5)}""".stripMargin

  /** q87's training replay: `iters` batch-perceptron rounds as
    * chained MATERIALIZED CTEs (the q48 discipline — DuckDB inlines
    * multiply-referenced CTEs otherwise). Expects CTEs `lab (id, y)`,
    * `fx (id, b, n)` and `w0 (b, w)` upstream; leaves `w<iters>`. */
  private def sqlPerceptronCtes(iters: Int): String =
    (1 to iters).map { i =>
      s"""m$i AS MATERIALIZED (
         |  SELECT lab.id, lab.y, sum(fx.n * w${i - 1}.w) AS m
         |  FROM lab JOIN fx USING (id) JOIN w${i - 1} ON fx.b = w${i - 1}.b
         |  GROUP BY lab.id, lab.y),
         |u$i AS MATERIALIZED (
         |  SELECT fx.b, sum(m$i.y * fx.n) AS u
         |  FROM m$i JOIN fx ON m$i.id = fx.id
         |  WHERE m$i.y * m$i.m <= 0
         |  GROUP BY fx.b),
         |w$i AS MATERIALIZED (
         |  SELECT w${i - 1}.b, w${i - 1}.w + coalesce(u$i.u, 0) AS w
         |  FROM w${i - 1} LEFT JOIN u$i ON w${i - 1}.b = u$i.b)""".stripMargin
    }.mkString(",\n")

  /** q158's multiclass training replay: [[sqlPerceptronCtes]] lifted
    * to a `cls` key — per round, margins per (id, cls), flagged
    * update sums per (cls, b), weight fold per (cls, b). Expects
    * `lab (id, cls, y)`, `fx (id, b, n)` and `w0 (cls, b, w)`
    * upstream; leaves `w<iters>`. */
  private def sqlLangIdCtes(iters: Int): String =
    (1 to iters).map { i =>
      s"""m$i AS MATERIALIZED (
         |  SELECT lab.id, lab.cls, lab.y, sum(fx.n * w${i - 1}.w) AS m
         |  FROM lab JOIN fx USING (id)
         |  JOIN w${i - 1} ON w${i - 1}.cls = lab.cls AND w${i - 1}.b = fx.b
         |  GROUP BY lab.id, lab.cls, lab.y),
         |u$i AS MATERIALIZED (
         |  SELECT m$i.cls, fx.b, sum(m$i.y * fx.n) AS u
         |  FROM m$i JOIN fx ON m$i.id = fx.id
         |  WHERE m$i.y * m$i.m <= 0
         |  GROUP BY m$i.cls, fx.b),
         |w$i AS MATERIALIZED (
         |  SELECT w${i - 1}.cls, w${i - 1}.b, w${i - 1}.w + coalesce(u$i.u, 0) AS w
         |  FROM w${i - 1} LEFT JOIN u$i
         |    ON u$i.cls = w${i - 1}.cls AND u$i.b = w${i - 1}.b)""".stripMargin
    }.mkString(",\n")

  /** Unigram seed replay: word types (≤ 32 chars — the engine's
    * SentencePiece-style candidate cap), the substring explosion
    * with overlapping-occurrence counting, and the top-48 inventory
    * under (score DESC, piece) order. */
  private val sqlUnigramSeedCtes =
    """wt AS MATERIALIZED (
      |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
      |    SELECT unnest(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS w
      |    FROM documents)
      |  WHERE length(w) <= 32
      |  GROUP BY w),
      |cand AS MATERIALIZED (
      |  SELECT substr(w, CAST(i.g AS INT), CAST(l.g AS INT)) AS piece,
      |    CAST(sum(freq) AS BIGINT) AS score
      |  FROM wt,
      |    unnest(generate_series(1, 32)) AS i(g),
      |    unnest(generate_series(1, 4)) AS l(g)
      |  WHERE i.g <= length(w) AND l.g <= length(w) - i.g + 1
      |  GROUP BY 1),
      |top AS MATERIALIZED (
      |  SELECT piece, score FROM cand ORDER BY score DESC, piece LIMIT 48)""".stripMargin

  /** `n` unrolled square-and-shift rounds of the exact integer
    * binary log (bit-identical to [[Unigram.ilog2Fixed16]]): state
    * (piece, m, g, f); each round squares the 30-bit fixed-point
    * mantissa and shifts one fraction bit into f. */
  private def sqlIlogRounds(from: String, n: Int): String =
    (1 to n).map { i =>
      val prev = if (i == 1) from else s"r${i - 1}"
      s"""r$i AS MATERIALIZED (
         |  SELECT piece, m,
         |    CASE WHEN (g * g) >> 30 >= (CAST(1 AS BIGINT) << 31)
         |      THEN (g * g) >> 31 ELSE (g * g) >> 30 END AS g,
         |    f * 2 + CASE WHEN (g * g) >> 30 >= (CAST(1 AS BIGINT) << 31)
         |      THEN 1 ELSE 0 END AS f
         |  FROM $prev)""".stripMargin
    }.mkString(",\n")

  /** `n` chained Bellman relaxation rounds of the word-type Viterbi
    * DP (the q104 replay discipline): dk(w, pos) holds the minimal
    * combined key Σcost·64 + pieces reachable in ≤ k pieces. */
  private def sqlDpRounds(n: Int): String =
    (1 to n).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT w, pos, min(comb) AS comb FROM (
         |    SELECT w, pos, comb FROM d${i - 1}
         |    UNION ALL
         |    SELECT e.w, e.j, d.comb + e.cost * 64 + 1
         |    FROM d${i - 1} d JOIN edges e ON d.w = e.w AND d.pos = e.i)
         |  GROUP BY w, pos)""".stripMargin
    }.mkString(",\n")

  /** q138's replay: `iters` Lloyd rounds as chained MATERIALIZED
    * CTEs. Round i: per-(id, cluster) integer squared distance, the
    * combined-key argmin (dist·4 + c — ties to the smaller cluster,
    * exactly the engine's strict-< scan), then the sign-safe
    * floor-division centroid update with empty-cluster carry. One
    * extra assignment round (under the final centroids) feeds the
    * stats surface. */
  private def sqlKmeansRounds(iters: Int): String =
    (1 to iters + 1).map { i =>
      val asg =
        s"""a$i AS MATERIALIZED (
           |  SELECT e.id, p.c, CAST(sum((e.iv - p.v) * (e.iv - p.v)) AS BIGINT) AS dist
           |  FROM e JOIN c${i - 1} p ON e.dim = p.dim
           |  GROUP BY e.id, p.c),
           |b$i AS MATERIALIZED (
           |  SELECT id, min(dist * 4 + c) AS m FROM a$i GROUP BY id),
           |asg$i AS MATERIALIZED (
           |  SELECT id, m % 4 AS c, m // 4 AS dist FROM b$i)""".stripMargin
      val upd =
        s"""c$i AS MATERIALIZED (
           |  SELECT p.c, p.dim,
           |    CASE WHEN s.cnt IS NULL OR s.cnt = 0 THEN p.v
           |      ELSE (s.sm - ((s.sm % s.cnt) + s.cnt) % s.cnt) // s.cnt END AS v
           |  FROM c${i - 1} p LEFT JOIN (
           |    SELECT g.c, e.dim, CAST(sum(e.iv) AS BIGINT) AS sm,
           |      CAST(count(*) AS BIGINT) AS cnt
           |    FROM asg$i g JOIN e USING (id) GROUP BY g.c, e.dim) s
           |  ON p.c = s.c AND p.dim = s.dim)""".stripMargin
      if (i <= iters) s"$asg,\n$upd" else asg
    }.mkString(",\n")

  private def sqlBpeCtes(k: Int): String = {
    val rounds = (1 to k).map { i =>
      s"""p$i AS MATERIALIZED (SELECT syms[i] AS a, syms[i+1] AS b, sum(freq) AS cnt
         |  FROM w${i - 1}, unnest(range(1, len(syms))) AS t(i) GROUP BY 1, 2),
         |b$i AS MATERIALIZED (SELECT a AS ma, b AS mb FROM p$i ORDER BY cnt DESC, a, b LIMIT 1),
         |w$i AS MATERIALIZED (SELECT string_split(list_reduce(syms, (acc, x) -> CASE
         |    WHEN x = mb AND string_split(acc, chr(31))[-1] = ma
         |    THEN substr(acc, 1, length(acc) - length(ma)) || ma || mb
         |    ELSE acc || chr(31) || x END), chr(31)) AS syms, freq
         |  FROM w${i - 1} CROSS JOIN b$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH wt AS MATERIALIZED (
       |  SELECT w, count(*) AS freq FROM (
       |    SELECT unnest(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS w
       |    FROM documents) GROUP BY w),
       |w0 AS MATERIALIZED (SELECT list_transform(range(1, length(w) + 1), i -> w[i]) AS syms, freq FROM wt),
       |$rounds""".stripMargin
  }

  private def sqlBpeTrain(k: Int): String = {
    val sel = (1 to k)
      .map(i => s"SELECT $i AS rank, ma AS a, mb AS b, ma || mb AS merged FROM b$i")
      .mkString("\nUNION ALL ")
    s"""${sqlBpeCtes(k)}
       |$sel
       |ORDER BY rank""".stripMargin
  }

  /** q49 oracle: the trained corpus's FINAL word segmentation (w`k`)
    * keyed back to the word string (merges only concatenate, so
    * joining the symbols reconstitutes the word), then per-doc token
    * counts by joining each document's words to their symbol count. */
  private def sqlBpeTokenize(k: Int): String =
    s"""${sqlBpeCtes(k)},
       |wcount AS MATERIALIZED (
       |  SELECT array_to_string(syms, '') AS w, len(syms) AS ntok FROM w$k),
       |dw AS (
       |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS w
       |  FROM documents)
       |SELECT d.doc_id, CAST(coalesce(sum(wc.ntok), 0) AS BIGINT) AS n_tokens
       |FROM (SELECT DISTINCT doc_id FROM documents) d
       |LEFT JOIN dw ON d.doc_id = dw.doc_id
       |LEFT JOIN wcount wc ON dw.w = wc.w
       |GROUP BY d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** q141/q142 shared replay: `k` WordPiece merge rounds over the
    * word-TYPE table. Round i: adjacent-pair counts AND current
    * symbol unigram counts, the exact-fraction likelihood argmax
    * score = cnt/(ca·cb) as a HUGEINT cross-multiplied anti-join
    * (fraction DESC, then a, b — NO float in the decision, matching
    * the engine's BigInt comparison), then the greedy left-to-right
    * fold with the a + strip##(b) product. Initial symbols: first
    * char plain, later chars `##`-prefixed. */
  private def sqlWordPieceCtes(k: Int): String = {
    val rounds = (1 to k).map { i =>
      s"""p$i AS MATERIALIZED (SELECT syms[j] AS a, syms[j+1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM w${i - 1}, unnest(range(1, len(syms))) AS t(j) GROUP BY 1, 2),
         |s$i AS MATERIALIZED (SELECT s AS sym, CAST(sum(freq) AS BIGINT) AS scnt
         |  FROM w${i - 1}, unnest(syms) AS t(s) GROUP BY 1),
         |sc$i AS MATERIALIZED (SELECT p.a, p.b, p.cnt, sa.scnt AS ca, sb.scnt AS cb
         |  FROM p$i p JOIN s$i sa ON p.a = sa.sym JOIN s$i sb ON p.b = sb.sym),
         |b$i AS MATERIALIZED (SELECT a AS ma, b AS mb,
         |    a || CASE WHEN b LIKE '##%' THEN substr(b, 3) ELSE b END AS mg
         |  FROM sc$i s WHERE NOT EXISTS (SELECT 1 FROM sc$i t WHERE
         |    CAST(t.cnt AS HUGEINT) * s.ca * s.cb > CAST(s.cnt AS HUGEINT) * t.ca * t.cb
         |    OR (CAST(t.cnt AS HUGEINT) * s.ca * s.cb = CAST(s.cnt AS HUGEINT) * t.ca * t.cb
         |        AND (t.a < s.a OR (t.a = s.a AND t.b < s.b))))),
         |w$i AS MATERIALIZED (SELECT string_split(list_reduce(syms, (acc, x) -> CASE
         |    WHEN x = mb AND string_split(acc, chr(31))[-1] = ma
         |    THEN substr(acc, 1, length(acc) - length(ma)) || mg
         |    ELSE acc || chr(31) || x END), chr(31)) AS syms, freq
         |  FROM w${i - 1} CROSS JOIN b$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH wt AS MATERIALIZED (
       |  SELECT w, count(*) AS freq FROM (
       |    SELECT unnest(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS w
       |    FROM documents) GROUP BY w),
       |w0 AS MATERIALIZED (SELECT list_prepend(w[1],
       |    list_transform(range(2, length(w) + 1), i -> '##' || w[i])) AS syms, freq
       |  FROM wt),
       |$rounds""".stripMargin
  }

  private def sqlWordPieceTrain(k: Int): String = {
    val sel = (1 to k)
      .map(i => s"SELECT $i AS rank, ma AS a, mb AS b, mg AS merged FROM b$i")
      .mkString("\nUNION ALL ")
    s"""${sqlWordPieceCtes(k)}
       |$sel
       |ORDER BY rank""".stripMargin
  }

  /** q142 oracle: final vocabulary = initial alphabet ∪ the k merge
    * products, classified by the raw `##` prefix (the engine's
    * Vocab rule restated); then `maxLen` chained greedy
    * longest-match rounds over word TYPES — each round advances
    * every unfinished word by its LONGEST matching piece (cont
    * pieces match past position 1) — and per-doc counts by joining
    * types back (over-length words count one [UNK]). */
  private def sqlWordPieceTokenize(k: Int, maxLen: Int): String = {
    val rounds = (1 to maxLen).map { i =>
      s"""g$i AS MATERIALIZED (
         |  SELECT w, pos, n FROM g${i - 1} WHERE pos > length(w)
         |  UNION ALL
         |  SELECT g.w, g.pos + m.plen, g.n + 1
         |  FROM g${i - 1} g JOIN (
         |    SELECT u.w, u.pos, max(v.plen) AS plen
         |    FROM g${i - 1} u JOIN vocabt v
         |      ON v.cont = (u.pos > 1) AND substr(u.w, u.pos, v.plen) = v.stripped
         |    WHERE u.pos <= length(u.w)
         |    GROUP BY u.w, u.pos) m ON g.w = m.w AND g.pos = m.pos)""".stripMargin
    }.mkString(",\n")
    val products = (1 to k).map(i => s"SELECT mg AS piece FROM b$i")
      .mkString("\n  UNION\n  ")
    s"""${sqlWordPieceCtes(k)},
       |alpha AS MATERIALIZED (
       |  SELECT DISTINCT CASE WHEN i = 1 THEN w[i] ELSE '##' || w[i] END AS piece
       |  FROM wt, unnest(range(1, length(w) + 1)) AS t(i)),
       |vocab AS MATERIALIZED (
       |  SELECT piece FROM alpha
       |  UNION
       |  $products),
       |vocabt AS MATERIALIZED (
       |  SELECT stripped, cont, length(stripped) AS plen FROM (
       |    SELECT CASE WHEN piece LIKE '##%' THEN substr(piece, 3) ELSE piece END AS stripped,
       |      (piece LIKE '##%') AS cont
       |    FROM vocab) WHERE length(stripped) > 0),
       |g0 AS MATERIALIZED (SELECT w, 1 AS pos, 0 AS n FROM wt WHERE length(w) <= $maxLen),
       |$rounds,
       |wnp AS MATERIALIZED (
       |  SELECT w, n FROM g$maxLen
       |  UNION ALL
       |  SELECT w, 1 AS n FROM wt WHERE length(w) > $maxLen),
       |dw AS (
       |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS w
       |  FROM documents)
       |SELECT d.doc_id, CAST(coalesce(sum(wn.n), 0) AS BIGINT) AS n_tokens
       |FROM (SELECT DISTINCT doc_id FROM documents) d
       |LEFT JOIN dw ON d.doc_id = dw.doc_id
       |LEFT JOIN wnp wn ON dw.w = wn.w
       |GROUP BY d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  private val sqlWordSets =
    """sets AS (
      |  SELECT DISTINCT doc_id, w
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE length(w) > 0),
      |wc AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id)""".stripMargin

  /** Brute-force all-pairs word-set Jaccard >= 0.95 — the shared
    * oracle for q31 (MinHash-LSH) and q36 (prefix-filter join). */
  private val sqlBruteForcePairs95 =
    s"""WITH $sqlWordSets,
       |inter AS (
       |  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
       |  FROM sets a JOIN sets b ON a.w = b.w AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)
       |SELECT i, j,
       |  CAST(c AS DOUBLE) / CAST(na.n + nb.n - c AS DOUBLE) AS jacc
       |FROM inter JOIN wc na ON i = na.doc_id JOIN wc nb ON j = nb.doc_id
       |WHERE CAST(c AS DOUBLE) / CAST(na.n + nb.n - c AS DOUBLE) >= 0.95
       |ORDER BY i, j""".stripMargin

  /** The engine's portable per-word simhash vote hash restated in
    * DuckDB: fold 15 hex chars of md5 into a 60-bit integer —
    * digit-by-digit base-16 left fold == Spark's
    * conv(substring(md5(w), 1, 15), 16, 10) (Dedup.portableWordHash). */
  private def sqlMd5Fold(expr: String): String =
    s"""list_reduce(list_transform(generate_series(1, 15),
       |      i -> CAST(strpos('0123456789abcdef', substr(md5($expr), CAST(i AS INT), 1)) - 1 AS BIGINT)),
       |      (a, x) -> a * 16 + x)""".stripMargin

  /** Brute-force simhash near-dup pairs over portable-hash
    * signatures: per plane p, bit k of the signature is set when the
    * +/-1 vote sum over the doc's distinct words is positive (votes
    * from bit k of the plane's md5-fold hash — bits 60..63 are
    * structurally 0 in both engines, so only k 0..59 is computed);
    * wordless docs get all-zero signatures (the engine folds an
    * empty array). Pairs = all i < j with summed plane hamming <=
    * maxHamming — the ALGORITHM (pigeonhole banding, collapse, hot
    * splits) is the engine's business; the oracle states the answer. */
  private def sqlSimhashPairs(planeExprs: Seq[String], maxHamming: Int): String = {
    val whCols = planeExprs.zipWithIndex
      .map { case (e, i) => s"${sqlMd5Fold(e)} AS h$i" }.mkString(",\n    ")
    val planeCase = planeExprs.indices.map(i => s"WHEN pp.p = $i THEN h$i").mkString(" ")
    val sigCols = planeExprs.indices.map(i =>
      s"coalesce(max(CASE WHEN ps.p = $i THEN ps.sig END), 0) AS s$i").mkString(",\n    ")
    val ham = planeExprs.indices.map(i => s"bit_count(xor(a.s$i, b.s$i))").mkString(" + ")
    s"""WITH sets AS (
       |  SELECT DISTINCT doc_id, w
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0),
       |wh AS (SELECT doc_id,
       |    $whCols
       |  FROM sets),
       |bits AS (
       |  SELECT doc_id, pp.p, kk.k,
       |    sum(CASE WHEN ((CASE $planeCase END) >> kk.k) & 1 = 1 THEN 1 ELSE -1 END) AS s
       |  FROM wh
       |  CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS k) kk
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${planeExprs.size - 1})) AS p) pp
       |  GROUP BY doc_id, pp.p, kk.k),
       |plane_sigs AS (
       |  SELECT doc_id, p,
       |    CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << k) ELSE 0 END) AS BIGINT) AS sig
       |  FROM bits GROUP BY doc_id, p),
       |sigs AS (
       |  SELECT d.doc_id,
       |    $sigCols
       |  FROM documents d LEFT JOIN plane_sigs ps ON d.doc_id = ps.doc_id
       |  GROUP BY d.doc_id)
       |SELECT a.doc_id AS i, b.doc_id AS j, CAST($ham AS INT) AS hamming
       |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       |WHERE $ham <= $maxHamming
       |ORDER BY i, j""".stripMargin
  }

  /** Sequential left-fold dot product — bit-identical to the engine's
    * Similarity.dotSeq (DuckDB list_reduce folds left; the fold is
    * per-row, so no cross-row order dependence exists). */
  private def sqlDot(a: String, b: String): String =
    s"""list_reduce(list_transform(generate_series(1, len($a)),
       |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)),
       |    (acc, x) -> acc + x)""".stripMargin

  /** [[sqlDot]] for lists that are ALREADY double — the CAST in
    * sqlDot is a no-op on doubles, but keeping a separate name makes
    * the oracle's type story explicit. */
  private def sqlDotD(a: String, b: String): String =
    s"""list_reduce(list_transform(generate_series(1, len($a)),
       |    i -> $a[i] * $b[i]),
       |    (acc, x) -> acc + x)""".stripMargin

  private val sqlVecs =
    s"""norms AS (
       |  SELECT vec_id, label, embedding,
       |    ${sqlDot("embedding", "embedding")} AS n2
       |  FROM embeddings)""".stripMargin

  /** CTEs reproducing the engine's hyperplane machinery exactly
    * (Similarity.hyperplaneSign / graftext.VecHyperplaneBuckets):
    * sign(tp, dim i 1-based) = high bit of a two-round multiplicative
    * mixer over k = tp*4096 + i — plain 64-bit integer arithmetic, so
    * DuckDB computes the identical sign matrix; per-(vec, tp) plane
    * dots are the same left fold as the engine's accumulation, and
    * bucket t packs the plane sign bits. The sign series length is
    * derived from the data (max embedding length), matching the
    * engine's per-row dimension — and the engine enforces the mixer
    * key's 4096-dim cap (VecHyperplaneBuckets throws above it). */
  private def sqlBuckets(planes: Int, tables: Int): String =
    s"""plane_signs AS (
       |  SELECT tp,
       |    list_transform(
       |      list_transform(generate_series(1, (SELECT max(len(embedding)) FROM embeddings)),
       |        i -> ((tp * 4096 + i) * 2654435761) % 4294967296),
       |      h1 -> CASE WHEN ((xor(h1, h1 >> 15) & 2147483647) * 1103515245 + 12345)
       |                      % 2147483648 >= 1073741824
       |            THEN 1.0 ELSE -1.0 END) AS s
       |  FROM (SELECT unnest(generate_series(0, ${planes * tables - 1})) AS tp)),
       |plane_dots AS (
       |  SELECT e.vec_id, e.label, p.tp // $planes AS tbl, p.tp % $planes AS plane,
       |    list_reduce(list_transform(generate_series(1, len(e.embedding)),
       |      i -> CAST(e.embedding[i] AS DOUBLE) * p.s[i]), (acc, x) -> acc + x) AS dot
       |  FROM embeddings e CROSS JOIN plane_signs p),
       |buckets AS (
       |  SELECT vec_id, label, tbl,
       |    CAST(sum(CASE WHEN dot > 0 THEN 1 << plane ELSE 0 END) AS BIGINT) AS bucket
       |  FROM plane_dots GROUP BY vec_id, label, tbl)""".stripMargin

  /** The q150/q171 chain restated in DuckDB SQL (shared VERBATIM —
    * q171 proves the snapshot table layer transparent by matching
    * the same oracle). */
  private val pretrainChainSql: String =
    """WITH k AS (
        |  SELECT min(doc_id) AS doc_id FROM documents
        |  WHERE text IS NOT NULL GROUP BY text),
        |t AS (
        |  SELECT d.doc_id, d.source,
        |    list_filter(string_split(d.text, ' '), w -> length(w) > 0) AS ws
        |  FROM documents d JOIN k ON d.doc_id = k.doc_id),
        |f AS (
        |  SELECT doc_id, source, CAST(len(ws) AS BIGINT) AS n_tok
        |  FROM t
        |  WHERE len(ws) BETWEEN 20 AND 2000
        |    AND list_max(list_transform(ws, w -> length(w))) <= 30),
        |p AS (
        |  SELECT doc_id, source, n_tok,
        |    CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tok AS start_tok
        |  FROM f WHERE n_tok > 0)
        |SELECT source, doc_id, n_tok AS n_tokens, start_tok,
        |  start_tok // 2048 AS bin_first,
        |  (start_tok + n_tok - 1) // 2048 AS bin_last,
        |  (start_tok + n_tok - 1) // 2048 - start_tok // 2048 + 1 AS n_bins
        |FROM p ORDER BY source, doc_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q30_dedup_exact" ->
      """WITH doubled AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents)
        |SELECT md5(text) AS text_hash, count(*) AS group_size,
        |  min(doc_id) AS keeper
        |FROM doubled GROUP BY md5(text)
        |ORDER BY text_hash""".stripMargin,
    "q31_minhash_pairs" -> sqlBruteForcePairs95,
    "q48_bpe_train" -> sqlBpeTrain(12),
    "q49_bpe_tokenize" -> sqlBpeTokenize(12),
    "q56_epoch_order" ->
      s"""SELECT doc_id,
         |  ${sqlMd5Fold("'1:' || CAST(doc_id AS VARCHAR)")} AS epoch_key
         |FROM documents
         |ORDER BY epoch_key, doc_id""".stripMargin,
    "q57_pii_redact" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' contact' || CAST(doc_id AS VARCHAR) || '@ex' ||
        |    CAST(doc_id % 10 AS VARCHAR) || '.org ref ' ||
        |    CAST(doc_id * 1234567 + 10000000 AS VARCHAR) ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' second.user@mail.example.com' ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<PII>', 'g'),
        |    '[0-9]{7,}')) AS INT) AS n_digit_runs,
        |  CAST(length(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<PII>', 'g'),
        |    '[0-9]{7,}', '<PII>', 'g')) AS INT) AS red_len
        |FROM p
        |ORDER BY doc_id""".stripMargin,
    "q58_boilerplate" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS ws
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(1, CASE WHEN len(ws) >= 8 THEN len(ws) - 6 ELSE 1 END),
        |      i -> array_to_string(ws[i:i+7], ' '))) AS unit
        |  FROM w),
        |f AS (SELECT unit, count(DISTINCT doc_id) AS n_docs FROM sh GROUP BY unit)
        |SELECT sh.doc_id, count(*) AS n_shingles,
        |  CAST(sum(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
        |FROM sh JOIN f USING (unit)
        |GROUP BY sh.doc_id
        |ORDER BY sh.doc_id""".stripMargin,
    // q59: the bigram-LM count surface. The md5-fold is sqlMd5Fold
    // over (bigram, c2, c1) joined with ':' — chr(1) is the
    // engine's in-bigram separator — summed mod 1e12 per doc so the
    // signature stays int64-exact through every compare layer.
    "q59_lm_score" ->
      s"""WITH toks AS MATERIALIZED (
         |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS tk
         |  FROM documents),
         |tok AS MATERIALIZED (
         |  SELECT doc_id, i, tk[CAST(i AS INT)] AS w
         |  FROM toks, unnest(generate_series(1, len(tk))) AS t(i)),
         |bg AS MATERIALIZED (
         |  SELECT a.doc_id, a.w AS w1, a.w || chr(1) || b.w AS bgk
         |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
         |uni AS MATERIALIZED (SELECT w, count(*) AS c1 FROM tok GROUP BY w),
         |vt AS (SELECT count(*) AS v FROM uni),
         |bgc AS MATERIALIZED (SELECT bgk, count(*) AS c2 FROM bg GROUP BY bgk),
         |scored AS (
         |  SELECT bg.doc_id, bgc.c2,
         |    ${sqlMd5Fold("bg.bgk || ':' || CAST(bgc.c2 AS VARCHAR) || ':' || CAST(uni.c1 AS VARCHAR)")}
         |      % 1000000000000 AS h
         |  FROM bg JOIN bgc USING (bgk) JOIN uni ON bg.w1 = uni.w),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_bigrams,
         |    sum(CASE WHEN c2 = 1 THEN 1 ELSE 0 END) AS n_hapax,
         |    sum(h) AS sig
         |  FROM scored GROUP BY doc_id)
         |SELECT d.doc_id AS doc_id,
         |  CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |  CAST(coalesce(a.n_hapax, 0) AS BIGINT) AS n_hapax,
         |  CAST(vt.v AS BIGINT) AS v,
         |  CAST(coalesce(a.sig, 0) AS BIGINT) AS sig
         |FROM documents d CROSS JOIN vt LEFT JOIN agg a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // q68: the ExactSubstr covered ranges are restated wholesale —
    // window explode, frequency count, interval merge (running-max
    // window + gap-flag prefix sum) all have exact SQL counterparts.
    "q68_dup_spans" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
        |  FROM documents),
        |win AS MATERIALIZED (
        |  SELECT doc_id, CAST(i AS INT) AS pos,
        |    array_to_string(tk[CAST(i AS INT):CAST(i + 7 AS INT)], ' ') AS g
        |  FROM toks, unnest(generate_series(1, len(tk) - 7)) AS t(i)),
        |freq AS MATERIALIZED (SELECT g, count(*) AS cnt FROM win GROUP BY g),
        |dup AS (SELECT w.doc_id, w.pos FROM win w JOIN freq USING (g) WHERE cnt >= 2),
        |m AS (SELECT doc_id, pos,
        |    max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM dup),
        |s AS (SELECT doc_id, pos,
        |    sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
        |  FROM m)
        |SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
        |  CAST(min(pos) AS INT) AS start_tok,
        |  CAST(max(pos) + 7 AS INT) AS end_tok, count(*) AS n_windows
        |FROM s GROUP BY doc_id, span_id ORDER BY doc_id, span_id""".stripMargin,
    // q69: rates are division+sqrt only — IEEE-exact in any engine —
    // so the oracle recomputes them and the double compare against
    // the md5-fold gate lands bit-identically. Key shape mirrors
    // q45's (length-prefixed stratum:id).
    "q69_temp_mix" ->
      s"""WITH cnt AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
         |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM cnt),
         |r AS (SELECT lang, n_docs,
         |    1.0 / sqrt(CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE)) AS r
         |  FROM cnt CROSS JOIN tot),
         |rt AS (SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
         |    r / (SELECT max(r) FROM r) AS rate FROM r)
         |SELECT d.doc_id, d.lang, rt.n_docs, rt.rate
         |FROM documents d JOIN rt USING (lang)
         |WHERE ${sqlMd5Fold(
               "CAST(length(d.lang) AS VARCHAR) || ':' || d.lang || ':' || CAST(d.doc_id AS VARCHAR)")}
         |  % 1000000 < rate * 1000000
         |ORDER BY d.doc_id""".stripMargin,
    // q72: the DSIR count surface. Features are unigrams + chr(1)-
    // joined bigrams of the lowercased text, bucketed by md5-fold
    // % 256; sig folds every (bucket, n_db, ct, cr) quadruple.
    "q72_dsir_weights" ->
      s"""WITH toks AS MATERIALIZED (
         |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS tk
         |  FROM documents),
         |tok AS MATERIALIZED (
         |  SELECT doc_id, i, tk[CAST(i AS INT)] AS w
         |  FROM toks, unnest(generate_series(1, len(tk))) AS t(i)),
         |feat AS MATERIALIZED (
         |  SELECT doc_id, w AS g FROM tok
         |  UNION ALL
         |  SELECT a.doc_id, a.w || chr(1) || b.w
         |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
         |fb AS MATERIALIZED (
         |  SELECT doc_id, ${sqlMd5Fold("g")} % 256 AS b FROM feat),
         |docb AS MATERIALIZED (
         |  SELECT doc_id, b, count(*) AS n FROM fb GROUP BY doc_id, b),
         |rawb AS (SELECT b, CAST(sum(n) AS BIGINT) AS cr FROM docb GROUP BY b),
         |tgtb AS (
         |  SELECT b, count(*) AS ct FROM fb
         |  WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
         |  GROUP BY b),
         |scored AS (
         |  SELECT docb.doc_id, docb.n,
         |    ${sqlMd5Fold("CAST(docb.b AS VARCHAR) || ':' || CAST(docb.n AS VARCHAR) || ':' || " +
               "CAST(coalesce(tgtb.ct, 0) AS VARCHAR) || ':' || CAST(rawb.cr AS VARCHAR)")}
         |      % 1000000000000 AS h
         |  FROM docb JOIN rawb USING (b) LEFT JOIN tgtb USING (b)),
         |agg AS (
         |  SELECT doc_id, sum(n) AS n_feats, sum(h) AS sig
         |  FROM scored GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(a.n_feats, 0) AS BIGINT) AS n_feats,
         |  CAST(coalesce(a.sig, 0) AS BIGINT) AS sig
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    // q73: q68's dup positions expand to covered token positions
    // (union of [pos, pos+7] — equivalent to the engine's span
    // merge), anti-joined against the token stream; the cleaned
    // text is restated byte-for-byte.
    "q73_excise_spans" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
        |  FROM documents),
        |win AS MATERIALIZED (
        |  SELECT doc_id, CAST(i AS INT) AS pos,
        |    array_to_string(tk[CAST(i AS INT):CAST(i + 7 AS INT)], ' ') AS g
        |  FROM toks, unnest(generate_series(1, len(tk) - 7)) AS t(i)),
        |freq AS MATERIALIZED (SELECT g, count(*) AS cnt FROM win GROUP BY g),
        |dup AS (SELECT w.doc_id, w.pos FROM win w JOIN freq USING (g) WHERE cnt >= 2),
        |cov AS (SELECT DISTINCT doc_id, pos + CAST(o AS INT) AS p
        |  FROM dup, unnest(generate_series(0, 7)) AS gg(o)),
        |tok AS MATERIALIZED (
        |  SELECT doc_id, CAST(i AS INT) AS pos, tk[CAST(i AS INT)] AS w
        |  FROM toks, unnest(generate_series(1, len(tk))) AS t(i)),
        |kept AS (SELECT t.doc_id, t.pos, t.w FROM tok t
        |  LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.p
        |  WHERE c.p IS NULL),
        |agg AS (SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS ct,
        |  count(*) AS nk FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.ct, '') AS clean_text,
        |  CAST(len(tk) AS BIGINT) AS n_tokens,
        |  CAST(len(tk) - coalesce(a.nk, 0) AS BIGINT) AS n_removed
        |FROM documents d JOIN toks USING (doc_id) LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // q76/q77: corpus windows probe the DISTINCT bench gram set
    // (train = doc_id % 10 != 0, bench = the rest); the same interval
    // merge / covered-cut as q68/q73.
    "q76_contam_spans" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
        |  FROM documents),
        |win AS MATERIALIZED (
        |  SELECT doc_id, CAST(i AS INT) AS pos,
        |    array_to_string(tk[CAST(i AS INT):CAST(i + 7 AS INT)], ' ') AS g
        |  FROM toks, unnest(generate_series(1, len(tk) - 7)) AS t(i)),
        |bg AS MATERIALIZED (SELECT DISTINCT g FROM win WHERE doc_id % 10 = 0),
        |hit AS (SELECT w.doc_id, w.pos FROM win w JOIN bg USING (g)
        |  WHERE w.doc_id % 10 != 0),
        |m AS (SELECT doc_id, pos,
        |    max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM hit),
        |s AS (SELECT doc_id, pos,
        |    sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
        |  FROM m)
        |SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
        |  CAST(min(pos) AS INT) AS start_tok,
        |  CAST(max(pos) + 7 AS INT) AS end_tok, count(*) AS n_windows
        |FROM s GROUP BY doc_id, span_id ORDER BY doc_id, span_id""".stripMargin,
    "q77_decontam_apply" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
        |  FROM documents),
        |win AS MATERIALIZED (
        |  SELECT doc_id, CAST(i AS INT) AS pos,
        |    array_to_string(tk[CAST(i AS INT):CAST(i + 7 AS INT)], ' ') AS g
        |  FROM toks, unnest(generate_series(1, len(tk) - 7)) AS t(i)),
        |bg AS MATERIALIZED (SELECT DISTINCT g FROM win WHERE doc_id % 10 = 0),
        |hit AS (SELECT w.doc_id, w.pos FROM win w JOIN bg USING (g)
        |  WHERE w.doc_id % 10 != 0),
        |cov AS (SELECT DISTINCT doc_id, pos + CAST(o AS INT) AS p
        |  FROM hit, unnest(generate_series(0, 7)) AS gg(o)),
        |tok AS MATERIALIZED (
        |  SELECT doc_id, CAST(i AS INT) AS pos, tk[CAST(i AS INT)] AS w
        |  FROM toks, unnest(generate_series(1, len(tk))) AS t(i)
        |  WHERE doc_id % 10 != 0),
        |kept AS (SELECT t.doc_id, t.pos, t.w FROM tok t
        |  LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.p
        |  WHERE c.p IS NULL),
        |agg AS (SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS ct,
        |  count(*) AS nk FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.ct, '') AS clean_text,
        |  CAST(len(tk) AS BIGINT) AS n_tokens,
        |  CAST(len(tk) - coalesce(a.nk, 0) AS BIGINT) AS n_removed
        |FROM documents d JOIN toks USING (doc_id) LEFT JOIN agg a USING (doc_id)
        |WHERE d.doc_id % 10 != 0
        |ORDER BY d.doc_id""".stripMargin,
    // q75: DuckDB's utf8proc nfc_normalize vs the JVM Normalizer —
    // both UAX #15; norm_text gates the ASCII identity path, the
    // probe gates a real composition (e + U+0301 -> U+00E9) per row.
    "q75_normalize" ->
      """SELECT doc_id, nfc_normalize(text) AS norm_text,
        |  (nfc_normalize(text) != text) AS changed,
        |  right(nfc_normalize(text || 'e' || chr(769)), 1) AS probe_tail,
        |  CAST(length(nfc_normalize(text || 'e' || chr(769))) AS INT) AS probe_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    // q74: the Gopher thresholds restated; every ratio divides exact
    // integers so the doubles compare bit-for-bit. The stopword
    // count filters the STOPWORD list by containment (= distinct
    // stopwords present, Spark's array_intersect semantics).
    "q74_gopher_rules" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, text, list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(tk) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(tk, t -> length(t))), 0) AS BIGINT) AS sum_len,
        |    CAST(len(list_filter(tk, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
        |    CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
        |      s -> list_contains(list_transform(tk, t -> lower(t)), s))) AS BIGINT) AS n_stopwords,
        |    CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT) AS n_sym
        |  FROM toks),
        |r AS (
        |  SELECT doc_id, n_words,
        |    CASE WHEN n_words > 0 THEN CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE) ELSE 0.0 END AS mean_wlen,
        |    CASE WHEN n_words > 0 THEN CAST(n_sym AS DOUBLE) / CAST(n_words AS DOUBLE) ELSE 0.0 END AS symbol_ratio,
        |    CASE WHEN n_words > 0 THEN CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE) ELSE 0.0 END AS alpha_frac,
        |    n_stopwords
        |  FROM m)
        |SELECT doc_id, n_words, mean_wlen, symbol_ratio, alpha_frac, n_stopwords,
        |  (n_words >= 50 AND n_words <= 100000 AND mean_wlen >= 3.0 AND mean_wlen <= 10.0
        |   AND symbol_ratio < 0.1 AND alpha_frac > 0.8 AND n_stopwords >= 2) AS passes
        |FROM r ORDER BY doc_id""".stripMargin,
    // q67: the engine ranks by md5(concat_ws(":", source, doc_id)) —
    // source is non-null in the fixture so the null sentinel never
    // fires and the oracle key is a plain '||' concat. row_number is
    // BIGINT in DuckDB, INT in Spark: cast.
    "q67_domain_cap" ->
      """SELECT doc_id, source, CAST(rk AS INT) AS cap_rank FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(source || ':' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 12
        |ORDER BY doc_id""".stripMargin,
    "q32_simhash" -> sqlSimhashPairs(Seq("w"), 8),
    "q39_simhash128" -> sqlSimhashPairs(Seq("w", "w || ':1'"), 8),
    // q36 computes the SAME answer as q31 by a different exact
    // algorithm (prefix filtering); one brute-force oracle serves both
    "q36_prefix_jaccard" -> sqlBruteForcePairs95,
    "q38_cross_dedup" ->
      s"""WITH $sqlWordSets,
         |inter AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
         |  FROM sets a JOIN sets b ON a.w = b.w
         |  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT i, j,
         |  CAST(c AS DOUBLE) / CAST(na.n + nb.n - c AS DOUBLE) AS jacc
         |FROM inter JOIN wc na ON i = na.doc_id JOIN wc nb ON j = nb.doc_id
         |WHERE CAST(c AS DOUBLE) / CAST(na.n + nb.n - c AS DOUBLE) >= 0.95
         |ORDER BY i, j""".stripMargin,
    "q37_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, list_slice(ws, i, i + 7) AS gram
        |  FROM toks, unnest(generate_series(1, greatest(len(ws) - 7, 0))) AS t(i)),
        |a AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 10 <> 0),
        |b AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 10 = 0)
        |SELECT a.doc_id,
        |  count(DISTINCT b.doc_id) AS n_bench_docs,
        |  count(DISTINCT a.gram) AS n_shared_grams
        |FROM a JOIN b ON a.gram = b.gram
        |GROUP BY a.doc_id
        |ORDER BY a.doc_id""".stripMargin,
    // q100: the per-char histogram restated by character indexing
    // (code-point semantics agree across engines on this corpus);
    // integers exact, simpson one IEEE division of doubles.
    "q100_char_diversity" ->
      """WITH chars AS (
        |  SELECT doc_id, text[i] AS c
        |  FROM documents, unnest(generate_series(1, length(text))) AS t(i)),
        |h AS (SELECT doc_id, c, count(*) AS cnt FROM chars GROUP BY doc_id, c),
        |agg AS (SELECT doc_id,
        |    CAST(sum(cnt) AS BIGINT) AS n_chars,
        |    CAST(count(*) AS BIGINT) AS n_distinct,
        |    CAST(sum(cnt * cnt) AS BIGINT) AS sum_sq
        |  FROM h GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(a.n_chars, 0) AS n_chars,
        |  coalesce(a.n_distinct, 0) AS n_distinct,
        |  coalesce(a.sum_sq, 0) AS sum_sq,
        |  CASE WHEN coalesce(a.n_chars, 0) > 0
        |    THEN CAST(a.sum_sq AS DOUBLE)
        |       / (CAST(a.n_chars AS DOUBLE) * CAST(a.n_chars AS DOUBLE))
        |    ELSE CAST(0.0 AS DOUBLE) END AS simpson
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // q103: the bloom bitmap replayed as the SET of inserted
    // positions ("bit p set" == "p drawn by some bench key") — the
    // salted md5 folds restate Bloom.bitPositions digit-for-digit,
    // so membership, every planted true hit AND every deterministic
    // false positive reproduce exactly. The unnest var is `s`, NOT
    // `i` — sqlMd5Fold's lambda binds `i` and would shadow it.
    "q103_bloom_decontam" ->
      s"""WITH bench AS MATERIALIZED (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
         |corpus AS MATERIALIZED (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
         |  UNION ALL
         |  SELECT doc_id + 2000000 AS doc_id, text FROM bench),
    |m AS (SELECT 8 * count(*) AS m FROM bench),
         |bp AS (
         |  SELECT DISTINCT ${sqlMd5Fold("'bloom:' || s || ':' || text")} % (SELECT m FROM m) AS p
         |  FROM bench, unnest([0, 1, 2]) AS t(s)),
         |cp AS (
         |  SELECT doc_id, ${sqlMd5Fold("'bloom:' || s || ':' || text")} % (SELECT m FROM m) AS p
         |  FROM corpus, unnest([0, 1, 2]) AS t(s)),
         |flg AS (
         |  SELECT cp.doc_id,
         |    (sum(CASE WHEN bp.p IS NULL THEN 1 ELSE 0 END) = 0) AS flagged
         |  FROM cp LEFT JOIN bp USING (p) GROUP BY cp.doc_id),
         |ex AS (SELECT DISTINCT c.doc_id FROM corpus c JOIN bench b ON c.text = b.text)
         |SELECT f.doc_id, f.flagged AS flagged,
         |  (e.doc_id IS NOT NULL) AS true_hit,
         |  (f.flagged AND e.doc_id IS NULL) AS false_positive
         |FROM flg f LEFT JOIN ex e ON f.doc_id = e.doc_id
         |ORDER BY f.doc_id""".stripMargin,
    // q104: every power iteration replayed as a chained MATERIALIZED
    // CTE — fixed-point integer arithmetic (// on non-negative
    // BIGINTs == Spark's div) makes the 5-step trajectory, not just
    // the final ordering, bit-identical across engines.
    "q104_pagerank" -> {
      val steps = (1 to 5).map { k =>
        s"""r$k AS MATERIALIZED (
           |  SELECT d.doc_id AS id,
           |    CAST(150000000 + (17 * coalesce(sum(r.rank // e.deg), 0)) // 20 AS BIGINT) AS rank
           |  FROM documents d
           |  LEFT JOIN e ON e.dst = d.doc_id
           |  LEFT JOIN r${k - 1} r ON e.src = r.id
           |  GROUP BY d.doc_id)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (
         |  SELECT d.doc_id AS src,
         |    ${sqlMd5Fold("'link:' || CAST(d.doc_id AS VARCHAR) || ':' || s")} % (SELECT count(*) FROM documents) AS dst,
         |    CAST(1 + d.doc_id % 3 AS BIGINT) AS deg
         |  FROM documents d, unnest([0, 1, 2]) AS t(s)
         |  WHERE s <= d.doc_id % 3),
         |r0 AS (SELECT doc_id AS id, CAST(1000000000 AS BIGINT) AS rank FROM documents),
         |$steps
         |SELECT id AS doc_id, rank FROM r5 ORDER BY doc_id""".stripMargin
    },
    // q132: the growth surface is integer division on both engines
    // (Spark div == DuckDB // on non-negative operands), and the
    // (growth DESC, token) order is total, so LIMIT 25 is stable.
    "q132_trending" ->
      """WITH tok AS (
        |  SELECT doc_id % 2 AS parity, t.w AS t
        |  FROM documents,
        |    unnest(list_filter(string_split(lower(text), ' '), w -> length(w) > 0)) AS t(w)),
        |n AS (
        |  SELECT t, count(*) AS c_new FROM tok WHERE parity = 1
        |  GROUP BY t HAVING count(*) >= 5),
        |o AS (
        |  SELECT t, count(*) AS c_old FROM tok WHERE parity = 0 GROUP BY t)
        |SELECT n.t, n.c_new, coalesce(o.c_old, 0) AS c_old,
        |  CAST(n.c_new * 1000000 // (coalesce(o.c_old, 0) + 1) AS BIGINT) AS growth
        |FROM n LEFT JOIN o ON n.t = o.t
        |ORDER BY growth DESC, n.t
        |LIMIT 25""".stripMargin,
    // q129: distinct text (not md5) — same partition unless md5
    // collides, the q127 note.
    "q129_dup_by_source" ->
      """WITH dbl AS (
        |  SELECT source, text FROM documents
        |  UNION ALL SELECT source, text FROM documents WHERE doc_id % 3 = 0)
        |SELECT source, count(*) AS n_rows,
        |  count(DISTINCT text) AS n_unique,
        |  count(*) - count(DISTINCT text) AS n_dup_rows
        |FROM dbl GROUP BY source
        |ORDER BY source""".stripMargin,
    // q127: the full chain restated — wrap, strip, decode, double,
    // keeper-per-text, sample gate, token count. The oracle groups
    // on the text itself where the engine groups on md5(text):
    // identical partitions unless md5 collides.
    "q127_curation_e2e" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><body><p>' ||
        |    replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
        |    '</p> <div>footer</div></body></html>' AS html
        |  FROM documents),
        |x AS (
        |  SELECT doc_id,
        |    replace(replace(replace(replace(replace(replace(
        |      regexp_replace(html, '<[^>]*>', '', 'g'),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&') AS clean_text
        |  FROM h),
        |dbl AS (
        |  SELECT doc_id, clean_text FROM x
        |  UNION ALL SELECT doc_id + 1000000, clean_text FROM x),
        |k AS (SELECT clean_text, min(doc_id) AS keeper FROM dbl GROUP BY clean_text)
        |SELECT d.doc_id,
        |  CASE WHEN d.doc_id <> k.keeper THEN 'dup'
        |       WHEN list_reduce(list_transform(generate_series(1, 15),
        |           i -> CAST(strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT)),
        |           (a, b) -> a * 16 + b) % 1000000 >= 600000 THEN 'sampled_out'
        |       ELSE 'kept' END AS status,
        |  CAST(len(list_filter(string_split(d.clean_text, ' '), w -> length(w) > 0)) AS BIGINT) AS n_tokens
        |FROM dbl d JOIN k USING (clean_text)
        |ORDER BY d.doc_id""".stripMargin,
    // q125: ICU strip_accents == NFD + drop-Mn + NFC for Latin text;
    // lower() commutes with accent-stripping on this repertoire.
    "q125_match_keys" ->
      """SELECT doc_id,
        |  lower(strip_accents(text || ' Café Ñandú ÜBER élan Noël' || CAST(doc_id % 7 AS VARCHAR))) AS match_key
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // q123: the same RFC-3986 split + rule chain in DuckDB string
    // functions; list_sort == Spark array_sort on ASCII params
    // (binary collation both sides).
    "q123_url_canon" -> {
      val re = "'^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)\\??([^#]*)#?.*$'"
      s"""WITH f AS (
         |  SELECT doc_id,
         |    CASE
         |      WHEN doc_id % 4 = 0 THEN 'HTTP://Example' || CAST(doc_id % 5 AS VARCHAR) || '.COM:80/Path/' || CAST(doc_id AS VARCHAR) || '?utm_source=feed&id=' || CAST(doc_id % 7 AS VARCHAR) || '&b=2#sec'
         |      WHEN doc_id % 4 = 1 THEN 'https://cdn.example.org:443/a/' || CAST(doc_id AS VARCHAR)
         |      WHEN doc_id % 4 = 2 THEN 'https://Example.org/a?z=1&a=2&gclid=XYZ' || CAST(doc_id AS VARCHAR)
         |      ELSE 'not a url ' || CAST(doc_id AS VARCHAR)
         |    END AS url
         |  FROM documents),
         |parts AS (
         |  SELECT doc_id, url,
         |    lower(regexp_extract(url, $re, 1)) AS scheme,
         |    lower(regexp_extract(url, $re, 2)) AS host0,
         |    regexp_extract(url, $re, 3) AS path0,
         |    regexp_extract(url, $re, 4) AS query
         |  FROM f),
         |built AS (
         |  SELECT doc_id, url, scheme,
         |    CASE scheme WHEN 'http' THEN regexp_replace(host0, ':80$$', '')
         |                WHEN 'https' THEN regexp_replace(host0, ':443$$', '')
         |                ELSE host0 END AS host,
         |    CASE WHEN length(path0) = 0 THEN '/' ELSE path0 END AS path,
         |    list_sort(list_filter(string_split(query, '&'),
         |      p -> length(p) > 0 AND NOT starts_with(p, 'utm_')
         |        AND NOT starts_with(p, 'fbclid=') AND NOT starts_with(p, 'gclid='))) AS kept
         |  FROM parts)
         |SELECT doc_id, url,
         |  CASE WHEN length(scheme) > 0 THEN
         |    scheme || '://' || host || path ||
         |    CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&') ELSE '' END
         |  ELSE url END AS canon_url
         |FROM built
         |ORDER BY doc_id""".stripMargin
    },
    // q121: every peel round replayed as a chained MATERIALIZED CTE
    // pair (keep_r = nodes with >= k surviving degree, u_r = edges
    // with both ends kept) — the q104/q48 replay discipline.
    "q121_kcore" -> {
      val rounds = (1 to 8).map { r =>
        s"""k$r AS MATERIALIZED (
           |  SELECT v FROM (
           |    SELECT a AS v FROM u${r - 1} UNION ALL SELECT b AS v FROM u${r - 1})
           |  GROUP BY v HAVING count(*) >= 3),
           |u$r AS MATERIALIZED (
           |  SELECT u.a, u.b FROM u${r - 1} u
           |  JOIN k$r x ON u.a = x.v JOIN k$r y ON u.b = y.v)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (
         |  SELECT d.doc_id AS src,
         |    ${sqlMd5Fold("'tri:' || CAST(d.doc_id AS VARCHAR) || ':' || s")} % (SELECT count(*) FROM documents) AS dst
         |  FROM documents d, unnest([0, 1, 2, 3, 4, 5]) AS t(s)
         |  WHERE s <= d.doc_id % 6),
         |u0 AS MATERIALIZED (
         |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM e WHERE src <> dst),
         |$rounds,
         |fd AS (
         |  SELECT v AS doc_id, count(*) AS core_deg FROM (
         |    SELECT a AS v FROM u8 UNION ALL SELECT b AS v FROM u8)
         |  GROUP BY v)
         |SELECT d.doc_id,
         |  coalesce(fd.core_deg, 0) >= 3 AS in_core,
         |  CAST(coalesce(fd.core_deg, 0) AS BIGINT) AS core_deg
         |FROM documents d LEFT JOIN fd ON fd.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },
    // q122: q113's integer cut rule partitioned by lang
    "q122_lang_quartiles" ->
      """WITH s AS (
        |  SELECT lang,
        |    CAST(len(list_filter(string_split(text, ' '), w -> length(w) > 0)) AS BIGINT) AS v
        |  FROM documents WHERE lang IS NOT NULL),
        |h AS (SELECT lang, v, count(*) AS c FROM s GROUP BY lang, v),
        |cum AS (
        |  SELECT lang, v, c,
        |    CAST(sum(c) OVER (PARTITION BY lang ORDER BY v) AS BIGINT) AS cum
        |  FROM h),
        |n AS (SELECT lang, count(*) AS n FROM s GROUP BY lang),
        |cuts AS (
        |  SELECT cum.lang, d.d AS bucket, min(cum.v) AS cut_value
        |  FROM cum JOIN n USING (lang), unnest(generate_series(1, 3)) AS d(d)
        |  WHERE cum.cum * 4 >= d.d * n.n
        |  GROUP BY cum.lang, d.d)
        |SELECT c.lang, c.bucket, c.cut_value, cum.cum AS n_le, n.n AS n_total
        |FROM cuts c
        |JOIN cum ON cum.lang = c.lang AND cum.v = c.cut_value
        |JOIN n ON n.lang = c.lang
        |ORDER BY c.lang, c.bucket""".stripMargin,
    // q120: the oracle replays the mutation and compares TEXT
    // directly — deliberately STRONGER than the engine's 60-bit hash
    // verdicts (a collision would fail the gate; none exists on this
    // data, and the 2^-60/doc odds are the documented trade).
    "q120_snapshot_diff" ->
      """WITH d AS (SELECT doc_id, text FROM documents),
        |v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 31 = 0 THEN text || ' [rev2]' ELSE text END AS text
        |  FROM d WHERE doc_id % 97 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, 'new doc ' || CAST(doc_id AS VARCHAR)
        |  FROM d WHERE doc_id % 53 = 0)
        |SELECT coalesce(d.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN d.doc_id IS NULL THEN 'added'
        |       WHEN v2.doc_id IS NULL THEN 'removed'
        |       WHEN d.text = v2.text THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM d FULL OUTER JOIN v2 ON d.doc_id = v2.doc_id
        |ORDER BY doc_id""".stripMargin,
    // q119: the SAME wrap-strip-decode pipeline in DuckDB functions —
    // the hash gate on the cleaned bytes is a cross-engine regex
    // semantics check ('g' flag: DuckDB replaces first match only by
    // default, Spark replaces all — the classic extraction-stack
    // divergence this gate exists to catch).
    "q119_html_extract" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
        |    '</title></head><body><p class="main">' ||
        |    replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
        |    '</p><hr/><div id="f">footer &amp; legal &#39;v1&#39;</div></body></html>' AS html
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(html, '<[^>]*>')) AS BIGINT) AS n_tags,
        |  replace(replace(replace(replace(replace(replace(
        |    regexp_replace(html, '<[^>]*>', '', 'g'),
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&') AS clean_text
        |FROM h
        |ORDER BY doc_id""".stripMargin,
    // q134: the synthetic WARC streams' record surfaces restated as
    // doc_id arithmetic (n = 1 + id % 3 records; block j carries
    // 40 + (7·id + 13·j) % 100 bytes of (id + j + i) mod 256); the
    // parse itself (headers, Content-Length slicing, gzip members)
    // happens only on the engine side, inside the hash.
    "q134_warc_records" ->
      """WITH r AS MATERIALIZED (
        |  SELECT doc_id, CAST(j AS BIGINT) AS j,
        |    CAST(40 + (7 * doc_id + 13 * j) % 100 AS BIGINT) AS len
        |  FROM documents, unnest(range(0, 3)) AS t(j)
        |  WHERE j < 1 + doc_id % 3),
        |b AS MATERIALIZED (
        |  SELECT doc_id, sum((doc_id + j + i) % 256) AS bs
        |  FROM (SELECT doc_id, j, unnest(range(0, len)) AS i FROM r)
        |  GROUP BY doc_id)
        |SELECT r.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_records,
        |  CAST(sum(r.len) AS BIGINT) AS block_bytes,
        |  CAST(any_value(b.bs) AS BIGINT) AS body_sum,
        |  'http://host-' || CAST(r.doc_id % 50 AS VARCHAR) || '.example/p/' ||
        |    CAST(r.doc_id AS VARCHAR) || '/0' AS first_uri,
        |  CASE CAST(max(r.j) AS INT) WHEN 0 THEN 'response'
        |    WHEN 1 THEN 'request,response'
        |    ELSE 'metadata,request,response' END AS types_sorted
        |FROM r JOIN b USING (doc_id)
        |GROUP BY r.doc_id
        |ORDER BY r.doc_id""".stripMargin,
    // q140: the crawl chain restated — html rebuilt as in q119, the
    // declared Content-Length as pure length arithmetic (ASCII
    // corpus: octet == char count; the HTTP head is a fixed-width
    // constant), extraction identical to q119's. The WARC/HTTP
    // transit happens only on the engine side, inside the hash.
    "q140_crawl_e2e" -> {
      val headLen = graft.sources.WarcSource.SynthHttpHead.length
      s"""WITH h AS (
         |  SELECT doc_id,
         |    '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
         |    '</title></head><body><p class="main">' ||
         |    replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
         |    '</p><hr/><div id="f">footer &amp; legal &#39;v1&#39;</div></body></html>' AS html
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(length(html) + $headLen AS BIGINT) AS content_length,
         |  'http://host-' || CAST(doc_id % 50 AS VARCHAR) || '.example/page/' ||
         |    CAST(doc_id AS VARCHAR) AS target_uri,
         |  CAST(len(regexp_extract_all(html, '<[^>]*>')) AS BIGINT) AS n_tags,
         |  replace(replace(replace(replace(replace(replace(
         |    regexp_replace(html, '<[^>]*>', '', 'g'),
         |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&') AS clean_text
         |FROM h
         |ORDER BY doc_id""".stripMargin
    },
    // q136/q137: the unigram-LM integer tier. Seed = exact substring
    // counting; segmentation = the shift-and-square integer log (4
    // unrolled rounds — bit-identical to Unigram.ilog2Fixed16) plus
    // 16 chained Bellman relaxation rounds over the word-type DP.
    "q136_unigram_seed" ->
      s"""WITH $sqlUnigramSeedCtes
         |SELECT CAST(row_number() OVER (ORDER BY score DESC, piece) AS INT) AS rank,
         |  piece, score
         |FROM top
         |ORDER BY rank""".stripMargin,
    "q137_unigram_segment" ->
      s"""WITH $sqlUnigramSeedCtes,
         |pieces0 AS MATERIALIZED (
         |  SELECT piece, CAST(max(score) AS BIGINT) AS score FROM (
         |    SELECT piece, score FROM top
         |    UNION ALL
         |    SELECT piece, score FROM cand WHERE length(piece) = 1)
         |  GROUP BY piece),
         |withtot AS MATERIALIZED (
         |  SELECT piece, score FROM pieces0
         |  UNION ALL
         |  SELECT '' AS piece, CAST((SELECT sum(score) FROM pieces0) AS BIGINT) AS score),
         |m0 AS MATERIALIZED (
         |  SELECT piece, length(bin(score)) - 1 AS m,
         |    ((score << 30) >> (length(bin(score)) - 1)) AS g,
         |    CAST(0 AS BIGINT) AS f
         |  FROM withtot),
         |${sqlIlogRounds("m0", 4)},
         |il AS MATERIALIZED (SELECT piece, 16 * m + f AS ilog FROM r4),
         |pc AS MATERIALIZED (
         |  SELECT piece, CAST(length(piece) AS BIGINT) AS pl,
         |    (SELECT ilog FROM il WHERE piece = '') - ilog AS cost
         |  FROM il WHERE piece <> ''),
         |wtp AS MATERIALIZED (SELECT w FROM wt WHERE length(w) <= 16),
         |edges AS MATERIALIZED (
         |  SELECT wtp.w AS w, i.g AS i, i.g + pc.pl AS j, pc.cost AS cost
         |  FROM wtp, unnest(generate_series(1, 16)) AS i(g), pc
         |  WHERE i.g + pc.pl <= length(wtp.w) + 1
         |    AND substr(wtp.w, CAST(i.g AS INT), CAST(pc.pl AS INT)) = pc.piece),
         |d0 AS MATERIALIZED (
         |  SELECT w, CAST(1 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS comb FROM wtp),
         |${sqlDpRounds(16)},
         |seg AS MATERIALIZED (
         |  SELECT w, comb FROM d16 WHERE pos = length(w) + 1),
         |dw AS (
         |  SELECT doc_id,
         |    unnest(list_filter(string_split(text, ' '),
         |      t -> length(t) > 0 AND length(t) <= 16)) AS w
         |  FROM documents)
         |SELECT dw.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(seg.comb & 63) AS BIGINT) AS n_pieces,
         |  CAST(sum(seg.comb >> 6) AS BIGINT) AS total_cost
         |FROM dw JOIN seg ON dw.w = seg.w
         |GROUP BY dw.doc_id
         |ORDER BY dw.doc_id""".stripMargin,
    // q141/q142: the WordPiece family. Training = 10 replayed
    // likelihood-argmax merge rounds (HUGEINT cross-mult anti-join ==
    // the engine's BigInt band argmax — no float in either decision);
    // encode = 16 replayed greedy longest-match rounds under the
    // alphabet ∪ products vocabulary with raw-## classification.
    "q141_wordpiece_train" -> sqlWordPieceTrain(10),
    "q142_wordpiece_encode" -> sqlWordPieceTokenize(10, 16),
    // q151: df table + N sentinel through the exact ilog replay (the
    // q137 machinery), then tf·idf16 and the rank window.
    "q151_tfidf_topk" ->
      s"""WITH dw AS MATERIALIZED (
         |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM (
         |    SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS w
         |    FROM documents) GROUP BY doc_id, w),
         |dfc AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS df FROM dw GROUP BY w),
         |vals AS (
         |  SELECT w AS piece, df AS v FROM dfc
         |  UNION ALL
         |  SELECT '' AS piece, CAST(count(*) AS BIGINT) AS v FROM documents),
         |m0 AS MATERIALIZED (
         |  SELECT piece, length(bin(v)) - 1 AS m,
         |    ((v << 30) >> (length(bin(v)) - 1)) AS g,
         |    CAST(0 AS BIGINT) AS f
         |  FROM vals),
         |${sqlIlogRounds("m0", 4)},
         |il AS MATERIALIZED (SELECT piece, 16 * m + f AS ilog FROM r4),
         |sc AS (
         |  SELECT dw.doc_id, dw.w, dw.tf, dfc.df,
         |    dw.tf * ((SELECT ilog FROM il WHERE piece = '') - il.ilog) AS score
         |  FROM dw JOIN dfc USING (w) JOIN il ON il.piece = dw.w),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS rank
         |  FROM sc)
         |SELECT doc_id, CAST(rank AS INT) AS rank, w AS term, tf, df,
         |  CAST(score AS BIGINT) AS score
         |FROM r WHERE rank <= 5
         |ORDER BY doc_id, rank""".stripMargin,
    // q150: the whole chain restated — dedup keeper, integer quality
    // rules, token budgets, running-sum packing; one hash over the
    // composition.
    "q150_pretrain_e2e" -> pretrainChainSql,
    // q171: the table layer must be TRANSPARENT — the oracle is the
    // IDENTICAL chain off the raw parquet (the same SQL object as
    // q150); any row/type/value drift crossing snapshot publish/read
    // on either side of the pipeline breaks the hash.
    "q171_snapshot_pipeline" -> pretrainChainSql,
    // q146: the *-group rules restated closed-form (megabot group and
    // the empty Disallow excluded — exactly what the parser must
    // produce); match replayed via LIKE patterns (an independent
    // matcher implementation), argmax via the identical combined key.
    "q146_robots" ->
      """WITH doms AS (
        |  SELECT g.d AS d, 'example' || g.d || '.com' AS domain
        |  FROM unnest(generate_series(0, 4)) g(d)),
        |rules AS (
        |  SELECT domain, FALSE AS allow, '/admin/' AS rpath, '/admin/%' AS pat FROM doms
        |  UNION ALL SELECT domain, TRUE, '/admin/x1', '/admin/x1%' FROM doms
        |  UNION ALL SELECT domain, FALSE, '/static/*.png$', '/static/%.png' FROM doms
        |  UNION ALL SELECT domain, FALSE, '/p/' || d || '/', '/p/' || d || '/%' FROM doms
        |  UNION ALL SELECT domain, TRUE, '/p/' || d || '/page', '/p/' || d || '/page%' FROM doms
        |  UNION ALL SELECT domain, FALSE, '/p/' || ((d + 1) % 7) || '/', '/p/' || ((d + 1) % 7) || '/%' FROM doms),
        |urls AS (
        |  SELECT doc_id, 'example' || (doc_id % 5) || '.com' AS domain,
        |    CASE WHEN doc_id % 4 = 0 THEN '/p/' || (doc_id % 7) || '/page' || doc_id
        |         WHEN doc_id % 4 = 1 THEN '/static/img' || doc_id || '.png'
        |         WHEN doc_id % 4 = 2 THEN '/admin/x' || doc_id
        |         ELSE '/about' || doc_id END AS path
        |  FROM documents),
        |m AS (
        |  SELECT u.doc_id, r.rpath,
        |    CAST(length(r.rpath) AS BIGINT) * 2 + CASE WHEN r.allow THEN 1 ELSE 0 END AS prio
        |  FROM urls u JOIN rules r ON u.domain = r.domain AND u.path LIKE r.pat),
        |won AS (SELECT doc_id, max(prio) AS prio FROM m GROUP BY doc_id),
        |wrule AS (
        |  SELECT m.doc_id, m.prio, max(m.rpath) AS rule_path
        |  FROM m JOIN won ON m.doc_id = won.doc_id AND m.prio = won.prio
        |  GROUP BY m.doc_id, m.prio)
        |SELECT u.doc_id, u.domain, u.path,
        |  coalesce(w.prio % 2 = 1, TRUE) AS allowed,
        |  w.rule_path,
        |  w.prio // 2 AS rule_len
        |FROM urls u LEFT JOIN wrule w ON u.doc_id = w.doc_id
        |ORDER BY u.doc_id""".stripMargin,
    // q143: tar-shard assignment restated as two windows — the
    // entry-cost formula, the straddle-free shard rule and the
    // in-shard offset are all exact integer arithmetic.
    "q143_tar_shards" ->
      """WITH e AS (
        |  SELECT doc_id, source, CAST(strlen(text) AS BIGINT) AS n_bytes,
        |    512 + ((CAST(strlen(text) AS BIGINT) + 511) // 512) * 512 AS entry_bytes
        |  FROM documents WHERE text IS NOT NULL),
        |s AS (
        |  SELECT doc_id, source, n_bytes, entry_bytes,
        |    CAST(coalesce(sum(entry_bytes) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_bytes
        |  FROM e),
        |sh AS (SELECT *, start_bytes // 65536 AS shard FROM s)
        |SELECT source, doc_id, n_bytes, entry_bytes, start_bytes, shard,
        |  start_bytes - min(start_bytes) OVER (PARTITION BY source, shard) AS offset_in_shard
        |FROM sh
        |ORDER BY source, doc_id""".stripMargin,
    // q160: every field restated straight off documents — equality
    // with the Spark side proves the avro write -> evolved read
    // round trip (container bytes + schema resolution) lost nothing.
    "q160_avro_roundtrip" ->
      """SELECT doc_id,
        |  doc_id % 2 = 0 AS b,
        |  doc_id * 1000003 AS l,
        |  source AS s,
        |  lang,
        |  n_chars,
        |  upper(md5(text)) AS bin_hex,
        |  doc_id || ',' || n_chars || ',' || (doc_id % 7) AS arr_s,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL ELSE doc_id * 7 END AS opt,
        |  'S' || (doc_id % 3) AS e,
        |  source AS rs,
        |  doc_id % 13 AS rn,
        |  'a=' || n_chars || ';b=' || (doc_id % 11) AS m_s,
        |  CAST(-1 AS BIGINT) AS extra
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // q138: fixed-point Lloyd replayed end-to-end — quantize,
    // 3 argmin/update rounds, final stats. All integer arithmetic.
    "q138_kmeans_fixed" ->
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id AS id, d.g AS dim,
         |    CAST(floor(embedding[CAST(d.g AS INT) + 1] * 1024.0 + 0.5) AS BIGINT) AS iv
         |  FROM embeddings, unnest(generate_series(0, 63)) AS d(g)),
         |seed AS MATERIALIZED (
         |  SELECT id, CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS c
         |  FROM (SELECT DISTINCT id FROM e) ORDER BY id LIMIT 4),
         |c0 AS MATERIALIZED (
         |  SELECT seed.c, e.dim, e.iv AS v FROM seed JOIN e USING (id)),
         |${sqlKmeansRounds(3)},
         |st AS MATERIALIZED (
         |  SELECT c, CAST(count(*) AS BIGINT) AS n_points,
         |    CAST(sum(dist) AS BIGINT) AS inertia
         |  FROM asg4 GROUP BY c)
         |SELECT c3.c AS cluster, c3.dim, c3.v AS c_val,
         |  coalesce(st.n_points, 0) AS n_points,
         |  coalesce(st.inertia, 0) AS inertia
         |FROM c3 LEFT JOIN st ON c3.c = st.c
         |ORDER BY cluster, dim""".stripMargin,
    // q157: the whole fixed-point IVF-PQ pipeline restated — q138's
    // 3 Lloyd rounds verbatim (c3 + final assignment asg4), residual
    // vectors per id, the q81 hash-pick of 16 RESIDUAL rows as the
    // codebook, per-subspace argmin codes folded 4 bits per subspace,
    // then the nprobe=2 search: per-query probes by (centroid dist,
    // c), integer LUT per (query, probed list, s, j), ADC sum joined
    // code-to-LUT, rank by (adist, cid). Every number an exact int64.
    "q157_ivfpq_fixed" ->
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id AS id, d.g AS dim,
         |    CAST(floor(embedding[CAST(d.g AS INT) + 1] * 1024.0 + 0.5) AS BIGINT) AS iv
         |  FROM embeddings, unnest(generate_series(0, 63)) AS d(g)),
         |seed AS MATERIALIZED (
         |  SELECT id, CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS c
         |  FROM (SELECT DISTINCT id FROM e) ORDER BY id LIMIT 4),
         |c0 AS MATERIALIZED (
         |  SELECT seed.c, e.dim, e.iv AS v FROM seed JOIN e USING (id)),
         |${sqlKmeansRounds(3)},
         |res AS MATERIALIZED (
         |  SELECT e.id, e.dim, e.iv - p.v AS rv
         |  FROM e JOIN asg4 g USING (id) JOIN c3 p ON p.c = g.c AND p.dim = e.dim),
         |rvec AS MATERIALIZED (
         |  SELECT id, list(rv ORDER BY dim) AS rv FROM res GROUP BY id),
         |cb AS MATERIALIZED (
         |  SELECT j, rv FROM (
         |    SELECT row_number() OVER (
         |        ORDER BY ((id % 1000000007) * 2654435761) % 4294967296, id) AS j, rv
         |    FROM rvec) WHERE j <= 16),
         |cw AS MATERIALIZED (
         |  SELECT CAST(s AS INT) AS s, CAST(j - 1 AS BIGINT) AS j,
         |    rv[CAST(s*8+1 AS INT) : CAST(s*8+8 AS INT)] AS cwv
         |  FROM cb, unnest(generate_series(0, 7)) AS t(s)),
         |code AS MATERIALIZED (
         |  SELECT id, s, j FROM (
         |    SELECT id, s, j, row_number() OVER (PARTITION BY id, s ORDER BY d2, j) AS rn
         |    FROM (
         |      SELECT rvec.id, cw.s, cw.j,
         |        list_reduce(list_transform(generate_series(1, 8),
         |          i -> (rv[CAST(s*8+i AS INT)] - cwv[CAST(i AS INT)])
         |             * (rv[CAST(s*8+i AS INT)] - cwv[CAST(i AS INT)])),
         |          (acc, x) -> acc + x) AS d2
         |      FROM rvec, cw)) WHERE rn = 1),
         |codef AS MATERIALIZED (
         |  SELECT id, CAST(sum(j * (CAST(1 AS BIGINT) << CAST(4 * s AS INT))) AS BIGINT) AS codes
         |  FROM code GROUP BY id),
         |qd AS MATERIALIZED (
         |  SELECT e.id AS qid, p.c,
         |    CAST(sum((e.iv - p.v) * (e.iv - p.v)) AS BIGINT) AS dist
         |  FROM e JOIN c3 p ON e.dim = p.dim
         |  WHERE e.id % 50 = 0 GROUP BY e.id, p.c),
         |probe AS MATERIALIZED (
         |  SELECT qid, c FROM (
         |    SELECT qid, c, row_number() OVER (PARTITION BY qid ORDER BY dist, c) AS rn
         |    FROM qd) WHERE rn <= 2),
         |qrvec AS MATERIALIZED (
         |  SELECT q.qid, q.c, list(e.iv - p.v ORDER BY e.dim) AS rv
         |  FROM probe q JOIN e ON e.id = q.qid
         |  JOIN c3 p ON p.c = q.c AND p.dim = e.dim
         |  GROUP BY q.qid, q.c),
         |lut AS MATERIALIZED (
         |  SELECT qid, qrvec.c, cw.s, cw.j,
         |    list_reduce(list_transform(generate_series(1, 8),
         |      i -> (rv[CAST(s*8+i AS INT)] - cwv[CAST(i AS INT)])
         |         * (rv[CAST(s*8+i AS INT)] - cwv[CAST(i AS INT)])),
         |      (acc, x) -> acc + x) AS d2
         |  FROM qrvec, cw),
         |scored AS MATERIALIZED (
         |  SELECT l.qid, cd.id AS cid,
         |    CAST(list_reduce(list(d2 ORDER BY l.s), (acc, x) -> acc + x) AS BIGINT) AS adist
         |  FROM code cd JOIN asg4 g ON cd.id = g.id
         |  JOIN lut l ON l.c = g.c AND l.s = cd.s AND l.j = cd.j
         |  WHERE l.qid <> cd.id GROUP BY l.qid, cd.id),
         |topk AS (
         |  SELECT qid, cid, rank, adist FROM (
         |    SELECT qid, cid, adist,
         |      row_number() OVER (PARTITION BY qid ORDER BY adist, cid) AS rank
         |    FROM scored) WHERE rank <= 5)
         |SELECT 'assign' AS section, g.id AS a, g.c AS b,
         |  codef.codes AS m1, g.dist AS m2
         |FROM asg4 g JOIN codef USING (id)
         |UNION ALL
         |SELECT 'topk' AS section, qid AS a, CAST(rank AS BIGINT) AS b,
         |  cid AS m1, adist AS m2
         |FROM topk
         |ORDER BY section, a, b""".stripMargin,
    // q158: the multiclass trajectory restated — char-trigram
    // featurization (char indexing both sides, so multi-byte scripts
    // gram identically), one-vs-rest labels as docs × classes, and
    // each round's C·(buckets+1) flagged-update sums as chained
    // MATERIALIZED CTEs (the q87 replay lifted to a cls key), then
    // the full final margin matrix + the pinned argmax.
    "q158_langid_trained" ->
      s"""WITH docs AS MATERIALIZED (
         |  SELECT doc_id AS id, lang, lower(text) AS t FROM documents),
         |cls AS MATERIALIZED (
         |  SELECT DISTINCT lang AS cls FROM docs WHERE lang IS NOT NULL),
         |gr AS MATERIALIZED (
         |  -- gi, NOT i: sqlMd5Fold's lambda binds i, which would
         |  -- shadow the gram index inside the fold
         |  SELECT id, ${sqlMd5Fold("substr(t, CAST(gi AS INT), 3)")} % 64 AS b
         |  FROM docs, unnest(generate_series(1, length(t) - 2)) AS u(gi)),
         |fx AS MATERIALIZED (
         |  SELECT id, b, CAST(count(*) AS BIGINT) AS n FROM gr GROUP BY id, b
         |  UNION ALL
         |  SELECT id, CAST(64 AS BIGINT) AS b, CAST(1 AS BIGINT) AS n FROM docs),
         |lab AS MATERIALIZED (
         |  SELECT d.id, c.cls,
         |    CAST(CASE WHEN d.lang = c.cls THEN 1 ELSE -1 END AS BIGINT) AS y
         |  FROM docs d CROSS JOIN cls c),
         |w0 AS MATERIALIZED (
         |  SELECT c.cls, CAST(t.b AS BIGINT) AS b, CAST(0 AS BIGINT) AS w
         |  FROM cls c CROSS JOIN unnest(generate_series(0, 64)) AS t(b)),
         |${sqlLangIdCtes(3)},
         |fin AS (
         |  SELECT lab.id, lab.cls, CAST(sum(fx.n * w3.w) AS BIGINT) AS margin
         |  FROM lab JOIN fx USING (id) JOIN w3 ON w3.cls = lab.cls AND w3.b = fx.b
         |  GROUP BY lab.id, lab.cls)
         |SELECT id, cls, margin,
         |  CAST(CASE WHEN row_number() OVER (
         |    PARTITION BY id ORDER BY margin DESC, cls) = 1
         |    THEN 1 ELSE 0 END AS INT) AS is_pred
         |FROM fin ORDER BY id, cls""".stripMargin,
    // q114: brute three-way join over the replayed edge table — the
    // oracle's id-ordered enumeration and the engine's degree-ordered
    // orientation list the same triangle set; per-node counts are
    // orientation-independent.
    "q114_triangles" ->
      s"""WITH e AS MATERIALIZED (
         |  SELECT d.doc_id AS src,
         |    ${sqlMd5Fold("'tri:' || CAST(d.doc_id AS VARCHAR) || ':' || s")} % (SELECT count(*) FROM documents) AS dst
         |  FROM documents d, unnest([0, 1, 2, 3, 4, 5]) AS t(s)
         |  WHERE s <= d.doc_id % 6),
         |u AS MATERIALIZED (
         |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM e WHERE src <> dst),
         |tri AS (
         |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM u e1 JOIN u e2 ON e2.a = e1.b
         |  JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b),
         |pn AS (
         |  SELECT v AS doc_id, count(*) AS c FROM (
         |    SELECT x AS v FROM tri
         |    UNION ALL SELECT y AS v FROM tri
         |    UNION ALL SELECT z AS v FROM tri)
         |  GROUP BY v)
         |SELECT d.doc_id, CAST(coalesce(pn.c, 0) AS BIGINT) AS n_tri
         |FROM documents d LEFT JOIN pn ON pn.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // q106: the oracle is the NAIVE shape on purpose — a distinct
    // length-banded cross join with levenshtein, independent of the
    // engine's symmetric-delete blocking; identical output proves the
    // blocking loses no pair.
    "q106_fuzzy_names" ->
      """WITH d AS (SELECT DISTINCT c_name AS s FROM customer WHERE c_name IS NOT NULL)
        |SELECT a.s AS name_a, b.s AS name_b, levenshtein(a.s, b.s) AS dist
        |FROM d a JOIN d b
        |  ON a.s < b.s AND abs(length(a.s) - length(b.s)) <= 1
        |WHERE levenshtein(a.s, b.s) <= 1
        |ORDER BY name_a, name_b""".stripMargin,
    // q139: q106's naive oracle widened to <= 2 — again independent
    // of the engine's delete-neighborhood blocking. The sparse
    // hashed fixture keys are derived identically on both sides
    // (md5 of the custkey 3-group + suffix digit).
    "q139_fuzzy_k2" ->
      """WITH d AS (SELECT DISTINCT
        |    substr(md5(CAST(c_custkey // 3 AS VARCHAR)), 1, 8)
        |      || CAST(c_custkey % 3 AS VARCHAR) AS s
        |  FROM customer)
        |SELECT a.s AS key_a, b.s AS key_b, levenshtein(a.s, b.s) AS dist
        |FROM d a JOIN d b
        |  ON a.s < b.s AND abs(length(a.s) - length(b.s)) <= 2
        |WHERE levenshtein(a.s, b.s) <= 2
        |ORDER BY key_a, key_b""".stripMargin,
    // q113: cut d = smallest token count whose cumulative doc count
    // reaches d·N/10, stated as cum*10 >= d*N — integer comparison,
    // no quantile-interpolation rule to disagree on
    "q113_token_deciles" ->
      """WITH s AS (
        |  SELECT CAST(len(list_filter(string_split(text, ' '), w -> length(w) > 0)) AS BIGINT) AS v
        |  FROM documents),
        |h AS (SELECT v, count(*) AS c FROM s GROUP BY v),
        |cum AS (SELECT v, c, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum FROM h),
        |n AS (SELECT count(*) AS n FROM s),
        |cuts AS (
        |  SELECT d.d AS bucket, min(cum.v) AS cut_value
        |  FROM cum, n, unnest(generate_series(1, 9)) AS d(d)
        |  WHERE cum.cum * 10 >= d.d * n.n
        |  GROUP BY d.d)
        |SELECT c.bucket, c.cut_value, cum.cum AS n_le, n.n AS n_total
        |FROM cuts c JOIN cum ON cum.v = c.cut_value, n
        |ORDER BY c.bucket""".stripMargin,
    "q110_inverted_index" ->
      """WITH toks AS (
        |  SELECT doc_id, t.w AS token
        |  FROM documents, unnest(string_split(text, ' ')) AS t(w)
        |  WHERE length(t.w) > 0),
        |tf AS (
        |  SELECT token, doc_id, count(*) AS tf FROM toks GROUP BY token, doc_id)
        |SELECT token, doc_id % 8 AS shard,
        |  count(*) AS doc_freq,
        |  CAST(sum(tf) AS BIGINT) AS term_freq,
        |  string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
        |FROM tf
        |GROUP BY token, doc_id % 8
        |ORDER BY token, shard""".stripMargin,
    // q98: gram identity by CONTENT (the engine joins hashed keys —
    // collision odds 2^-64, the q33/q37 acceptance); windows, distinct
    // and novel counts are exact integers, the rate one IEEE division.
    "q98_ngram_novelty" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> length(w) > 0) AS ws
        |  FROM documents),
        |g AS MATERIALIZED (
        |  SELECT doc_id, list_slice(ws, i, i + 2) AS gram
        |  FROM toks, unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS t(i)),
        |cand AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 10 = 0),
        |base AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 <> 0),
        |cnt AS (SELECT c.doc_id, count(*) AS n_distinct,
        |    sum(CASE WHEN b.gram IS NULL THEN 1 ELSE 0 END) AS n_novel
        |  FROM cand c LEFT JOIN base b ON c.gram = b.gram GROUP BY c.doc_id),
        |win AS (SELECT doc_id, CAST(greatest(len(ws) - 2, 0) AS BIGINT) AS n_windows
        |  FROM toks WHERE doc_id % 10 = 0)
        |SELECT w.doc_id, w.n_windows,
        |  CAST(coalesce(c.n_distinct, 0) AS BIGINT) AS n_distinct,
        |  CAST(coalesce(c.n_novel, 0) AS BIGINT) AS n_novel,
        |  CASE WHEN coalesce(c.n_distinct, 0) > 0
        |    THEN CAST(c.n_novel AS DOUBLE) / CAST(c.n_distinct AS DOUBLE)
        |    ELSE CAST(0.0 AS DOUBLE) END AS novelty_rate
        |FROM win w LEFT JOIN cnt c USING (doc_id) ORDER BY w.doc_id""".stripMargin,
    "q33_ngram_jaccard" ->
      """WITH sub AS (SELECT doc_id, text FROM documents WHERE source = 'src0'),
        |g AS (
        |  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 3) AS g
        |  FROM sub, unnest(generate_series(1, length(text) - 2)) AS t(i)),
        |n AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
        |  FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT i, j,
        |  CAST(c AS DOUBLE) / CAST(na.n + nb.n - c AS DOUBLE) AS jacc
        |FROM inter JOIN n na ON i = na.doc_id JOIN n nb ON j = nb.doc_id
        |WHERE CAST(c AS DOUBLE) / CAST(na.n + nb.n - c AS DOUBLE) >= 0.6
        |ORDER BY i, j""".stripMargin,
    "q34_embed_neardup" ->
      s"""WITH $sqlVecs,
         |scored AS (
         |  SELECT a.label AS block, a.vec_id AS i, b.vec_id AS j,
         |    ${sqlDot("a.embedding", "b.embedding")} / (sqrt(a.n2) * sqrt(b.n2)) AS cos
         |  FROM norms a JOIN norms b
         |    ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT block, i, j, cos
         |FROM scored
         |WHERE cos >= 0.4
         |ORDER BY i, j""".stripMargin,
    "q35_dedup_clusters" ->
      """WITH doubled AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE source IN ('src0', 'src1', 'src2', 'src3')
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents
        |  WHERE source IN ('src0', 'src1', 'src2', 'src3')),
        |keyed AS (
        |  SELECT doc_id,
        |    array_to_string(list_sort(list_distinct(
        |      list_filter(string_split(text, ' '), w -> length(w) > 0))), chr(9)) AS k
        |  FROM doubled)
        |SELECT doc_id AS id,
        |  min(doc_id) OVER (PARTITION BY k) AS component,
        |  doc_id = min(doc_id) OVER (PARTITION BY k) AS keep
        |FROM keyed
        |ORDER BY id""".stripMargin,
    // q41: the FULL hyperplane-LSH ANN pipeline restated in SQL —
    // bucket collisions (query side multiprobes all 1-bit flips),
    // candidate dedup, exact cosine, top-5. Bit-for-bit because the
    // sign matrix is the portable mixer (see sqlBuckets).
    "q41_ann_lsh" ->
      s"""WITH ${sqlBuckets(planes = 4, tables = 8)},
         |$sqlVecs,
         |qprobes AS (
         |  SELECT vec_id AS qid, tbl, bucket FROM buckets WHERE vec_id % 50 = 0
         |  UNION ALL
         |  SELECT b.vec_id, b.tbl, xor(b.bucket, 1 << t.p)
         |  FROM buckets b, unnest(generate_series(0, 3)) AS t(p)
         |  WHERE b.vec_id % 50 = 0),
         |cand AS (
         |  SELECT DISTINCT q.qid, c.vec_id AS cid
         |  FROM qprobes q JOIN buckets c ON q.tbl = c.tbl AND q.bucket = c.bucket
         |  WHERE q.qid <> c.vec_id),
         |scored AS (
         |  SELECT cand.qid, cand.cid,
         |    ${sqlDot("nq.embedding", "nc.embedding")} / (sqrt(nq.n2) * sqrt(nc.n2)) AS cos
         |  FROM cand JOIN norms nq ON nq.vec_id = cand.qid
         |            JOIN norms nc ON nc.vec_id = cand.cid),
         |ranked AS (
         |  SELECT qid, cid, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
         |  FROM scored)
         |SELECT qid, cid, rank, cos FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,
    // q42: the IVF pipeline restated in SQL — same pivot hash, same
    // nearest-pivot assignment (ties by pivot_id), nprobe=4 lists,
    // exact cosine over probed lists, top-5.
    "q42_ann_ivf" ->
      s"""WITH $sqlVecs,
         |pivots AS (
         |  SELECT vec_id AS pivot_id, embedding AS pvec, n2 AS pn2
         |  FROM norms
         |  ORDER BY ((vec_id % 1000000007) * 2654435761) % 4294967296, vec_id
         |  LIMIT 16),
         |cassign AS (
         |  SELECT vec_id AS cid, embedding AS cvec, n2 AS cn2, pivot_id AS list_id
         |  FROM (
         |    SELECT n.vec_id, n.embedding, n.n2, p.pivot_id,
         |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |        ${sqlDot("n.embedding", "p.pvec")} / (sqrt(n.n2) * sqrt(p.pn2)) DESC,
         |        p.pivot_id) AS rnk
         |    FROM norms n CROSS JOIN pivots p)
         |  WHERE rnk = 1),
         |qassign AS (
         |  SELECT vec_id AS qid, embedding AS qvec, n2 AS qn2, pivot_id AS list_id
         |  FROM (
         |    SELECT n.vec_id, n.embedding, n.n2, p.pivot_id,
         |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |        ${sqlDot("n.embedding", "p.pvec")} / (sqrt(n.n2) * sqrt(p.pn2)) DESC,
         |        p.pivot_id) AS rnk
         |    FROM norms n CROSS JOIN pivots p
         |    WHERE n.vec_id % 50 = 0)
         |  WHERE rnk <= 4),
         |scored AS (
         |  SELECT q.qid, c.cid,
         |    ${sqlDot("q.qvec", "c.cvec")} / (sqrt(q.qn2) * sqrt(c.cn2)) AS cos
         |  FROM qassign q JOIN cassign c ON q.list_id = c.list_id
         |  WHERE q.qid <> c.cid),
         |ranked AS (
         |  SELECT qid, cid, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
         |  FROM scored)
         |SELECT qid, cid, rank, cos FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,
    // q43: within-block LSH near-dup — candidates share any
    // (table, bucket) inside their label block, exact-verified.
    "q43_neardup_lsh" ->
      s"""WITH ${sqlBuckets(planes = 6, tables = 20)},
         |$sqlVecs,
         |cand AS (
         |  SELECT DISTINCT a.label AS block, a.vec_id AS i, b.vec_id AS j
         |  FROM buckets a JOIN buckets b
         |    ON a.label = b.label AND a.tbl = b.tbl AND a.bucket = b.bucket
         |   AND a.vec_id < b.vec_id),
         |pairs AS (
         |  SELECT cand.block, cand.i, cand.j,
         |    ${sqlDot("na.embedding", "nb.embedding")} / (sqrt(na.n2) * sqrt(nb.n2)) AS cos
         |  FROM cand JOIN norms na ON na.vec_id = cand.i
         |            JOIN norms nb ON nb.vec_id = cand.j)
         |SELECT block, i, j, cos FROM pairs WHERE cos >= 0.3
         |ORDER BY i, j""".stripMargin,
    // q44: the full semantic-dedup pipeline restated — same portable
    // pivot hash as q42, nearest-pivot assignment (ties by pivot_id,
    // the engine's fold rule), exact cosine pairs within clusters.
    "q44_semantic_dedup" ->
      s"""WITH $sqlVecs,
         |pivots AS (
         |  SELECT vec_id AS pivot_id, embedding AS pvec, n2 AS pn2
         |  FROM norms
         |  ORDER BY ((vec_id % 1000000007) * 2654435761) % 4294967296, vec_id
         |  LIMIT 8),
         |assign AS (
         |  SELECT vec_id, embedding, n2, pivot_id AS block
         |  FROM (
         |    SELECT n.vec_id, n.embedding, n.n2, p.pivot_id,
         |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |        ${sqlDot("n.embedding", "p.pvec")} / (sqrt(n.n2) * sqrt(p.pn2)) DESC,
         |        p.pivot_id) AS rnk
         |    FROM norms n CROSS JOIN pivots p)
         |  WHERE rnk = 1),
         |pairs AS (
         |  SELECT a.block, a.vec_id AS i, b.vec_id AS j,
         |    ${sqlDot("a.embedding", "b.embedding")} / (sqrt(a.n2) * sqrt(b.n2)) AS cos
         |  FROM assign a JOIN assign b ON a.block = b.block AND a.vec_id < b.vec_id)
         |SELECT block, i, j, cos FROM pairs WHERE cos >= 0.4
         |ORDER BY i, j""".stripMargin,
    // key is length-prefixed exactly as the engine builds it
    // (Sampling.stratifiedSample): len(stratum) ":" stratum ":" id,
    // with a null stratum coalesced to '' (same as the engine) so a
    // null source samples at the default fraction instead of being
    // dropped by NULL propagation through md5.
    "q45_stratified_sample" ->
      s"""SELECT doc_id, source FROM documents
         |WHERE ${sqlMd5Fold(
               "CAST(length(coalesce(source, '')) AS VARCHAR) || ':' || coalesce(source, '') || ':' || CAST(doc_id AS VARCHAR)")} % 1000000 <
         |  CASE WHEN source = 'src0' THEN 500000
         |       WHEN source = 'src1' THEN 250000
         |       ELSE 100000 END
         |ORDER BY doc_id""".stripMargin,
    // q47: the q51 quality formula + per-source rank window
    "q47_quality_topk" ->
      """WITH f AS (
        |  SELECT doc_id, source,
        |    length(text) AS n_chars,
        |    len(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS n_tokens,
        |    length(regexp_replace(text, '[^.,;:!?''"()]', '', 'g')) AS n_punct,
        |    len(list_filter(string_split(lower(text), ' '),
        |      t -> list_contains(['the','a','an','and','or','of','to','in','is','are',
        |                          'was','for','on','with','as','at','by','from','that','this'], t)))
        |      AS n_stop
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, source,
        |    0.4 * (CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) +
        |    0.3 * (1.0 - CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)) +
        |    0.3 * (CASE WHEN n_tokens >= 20 THEN 1.0
        |                ELSE CAST(n_tokens AS DOUBLE) / 20.0 END) AS quality_score
        |  FROM f),
        |r AS (
        |  SELECT doc_id, source, quality_score,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY quality_score DESC, doc_id) AS INT) AS rank
        |  FROM s)
        |SELECT doc_id, source, quality_score, rank
        |FROM r WHERE rank <= 10
        |ORDER BY source, rank""".stripMargin,
    "q46_pack_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split(text, ' '), w -> length(w) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tokens AS start_tok
        |  FROM t WHERE n_tokens > 0)
        |SELECT source, doc_id, n_tokens, start_tok,
        |  start_tok // 2048 AS bin_first,
        |  (start_tok + n_tokens - 1) // 2048 AS bin_last,
        |  (start_tok + n_tokens - 1) // 2048 - start_tok // 2048 + 1 AS n_bins
        |FROM p ORDER BY source, doc_id""".stripMargin,
    // q78: both stages restated — truncated (first-16-dim) cosine
    // shortlist of 20, then exact full-dim rescoring to top-5; the
    // same left-fold dot as every other vector oracle.
    "q78_matryoshka" ->
      s"""WITH tq AS (SELECT vec_id, embedding[1:16] AS tv FROM embeddings WHERE vec_id % 50 = 0),
         |tc AS (SELECT vec_id, embedding[1:16] AS tv FROM embeddings),
         |s1 AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    ${sqlDot("q.tv", "c.tv")} / (sqrt(${sqlDot("q.tv", "q.tv")}) * sqrt(${sqlDot("c.tv", "c.tv")})) AS tcos
         |  FROM tq q JOIN tc c ON q.vec_id <> c.vec_id),
         |short AS (SELECT qid, cid FROM (
         |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY tcos DESC, cid) AS srank
         |    FROM s1) WHERE srank <= 20),
         |s2 AS (SELECT s.qid, s.cid,
         |    ${sqlDot("eq.embedding", "ec.embedding")} / (sqrt(${sqlDot("eq.embedding", "eq.embedding")}) * sqrt(${sqlDot("ec.embedding", "ec.embedding")})) AS cos
         |  FROM short s JOIN embeddings eq ON s.qid = eq.vec_id
         |  JOIN embeddings ec ON s.cid = ec.vec_id)
         |SELECT qid, cid, CAST(rank AS INT) AS rank, cos FROM (
         |  SELECT qid, cid, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
         |  FROM s2)
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    // q96: the JL sign projection restated — the q41 integer mixer
    // generates the ±1 sign rows, projections and the shortlist's
    // squared-L2 are the same sequential left folds as the engine's
    // kernels (VecProjectSigns / VecL2SqSeq d-order accumulation),
    // then the exact full-dim rescore of q78's s2.
    "q96_rp_topk" ->
      s"""WITH signs AS MATERIALIZED (
         |  SELECT j, list_transform(
         |      list_transform(generate_series(1, (SELECT max(len(embedding)) FROM embeddings)),
         |        i -> ((j * 4096 + i) * 2654435761) % 4294967296),
         |      h1 -> CASE WHEN ((xor(h1, h1 >> 15) & 2147483647) * 1103515245 + 12345)
         |                      % 2147483648 >= 1073741824
         |            THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END) AS sg
         |  FROM (SELECT unnest(generate_series(0, 15)) AS j)),
         |proj AS MATERIALIZED (
         |  SELECT vec_id, list(p ORDER BY j) AS pv FROM (
         |    SELECT e.vec_id, s.j,
         |      list_reduce(list_transform(generate_series(1, len(e.embedding)),
         |        i -> CAST(e.embedding[i] AS DOUBLE) * s.sg[i]), (acc, x) -> acc + x) AS p
         |    FROM embeddings e CROSS JOIN signs s)
         |  GROUP BY vec_id),
         |s1 AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    list_reduce(list_transform(generate_series(1, 16),
         |      j -> (q.pv[j] - c.pv[j]) * (q.pv[j] - c.pv[j])), (acc, x) -> acc + x) AS pd2
         |  FROM proj q JOIN proj c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id % 50 = 0),
         |short AS (SELECT qid, cid FROM (
         |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY pd2, cid) AS srank
         |    FROM s1) WHERE srank <= 20),
         |s2 AS (SELECT s.qid, s.cid,
         |    ${sqlDot("eq.embedding", "ec.embedding")} / (sqrt(${sqlDot("eq.embedding", "eq.embedding")}) * sqrt(${sqlDot("ec.embedding", "ec.embedding")})) AS cos
         |  FROM short s JOIN embeddings eq ON s.qid = eq.vec_id
         |  JOIN embeddings ec ON s.cid = ec.vec_id)
         |SELECT qid, cid, CAST(rank AS INT) AS rank, cos FROM (
         |  SELECT qid, cid, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
         |  FROM s2)
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    // q80: the BM25 count surface — (term, tf, df) folds + doc
    // length; the ln-bearing score is spec-gated.
    "q80_bm25" ->
      s"""WITH toks AS MATERIALIZED (
         |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS tk
         |  FROM documents),
         |dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM toks),
         |tf AS MATERIALIZED (
         |  SELECT doc_id, t, count(*) AS tf FROM (
         |    SELECT doc_id, unnest(tk) AS t FROM toks)
         |  WHERE t IN ('spark', 'query', 'window') GROUP BY doc_id, t),
         |dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
         |scored AS (SELECT tf.doc_id,
         |    ${sqlMd5Fold("tf.t || ':' || CAST(tf.tf AS VARCHAR) || ':' || CAST(dfreq.df AS VARCHAR)")}
         |      % 1000000000000 AS h
         |  FROM tf JOIN dfreq USING (t)),
         |agg AS (SELECT doc_id, count(*) AS n_terms, sum(h) AS sig FROM scored GROUP BY doc_id)
         |SELECT d.doc_id, CAST(coalesce(a.n_terms, 0) AS BIGINT) AS n_terms,
         |  CAST(coalesce(a.sig, 0) AS BIGINT) AS sig, dl.dl
         |FROM documents d JOIN dl USING (doc_id) LEFT JOIN agg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    // q81: the full PQ pipeline restated — hash-pick the 16 codebook
    // rows (same mixer as the IVF pivots), slice into 8 subspaces,
    // argmin-encode every vector (ties by codeword index), then the
    // ADC grouping: per-(query, subspace, codeword) LUT entries via
    // the same left fold, summed over s in order.
    "q81_pq_topk" ->
      s"""WITH cb AS MATERIALIZED (
         |  SELECT j, vec FROM (
         |    SELECT row_number() OVER (
         |        ORDER BY ((vec_id % 1000000007) * 2654435761) % 4294967296, vec_id) AS j,
         |      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
         |    FROM embeddings) WHERE j <= 16),
         |cw AS MATERIALIZED (
         |  SELECT CAST(s AS INT) AS s, CAST(j AS INT) AS j,
         |    vec[CAST(s*8+1 AS INT) : CAST(s*8+8 AS INT)] AS cwv
         |  FROM cb, unnest(generate_series(0, 7)) AS t(s)),
         |cvec AS MATERIALIZED (
         |  SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
         |  FROM embeddings),
         |code AS MATERIALIZED (
         |  SELECT cid, s, j FROM (
         |    SELECT cid, s, j, row_number() OVER (PARTITION BY cid, s ORDER BY d2, j) AS rn
         |    FROM (
         |      SELECT cid, s, j,
         |        list_reduce(list_transform(generate_series(1, 8),
         |          i -> (vec[CAST(s*8+i AS INT)] - cwv[CAST(i AS INT)])
         |             * (vec[CAST(s*8+i AS INT)] - cwv[CAST(i AS INT)])),
         |          (acc, x) -> acc + x) AS d2
         |      FROM cvec, cw)) WHERE rn = 1),
         |q AS MATERIALIZED (
         |  SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvec
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |lut AS MATERIALIZED (
         |  SELECT qid, s, j,
         |    list_reduce(list_transform(generate_series(1, 8),
         |      i -> (qvec[CAST(s*8+i AS INT)] - cwv[CAST(i AS INT)])
         |         * (qvec[CAST(s*8+i AS INT)] - cwv[CAST(i AS INT)])),
         |      (acc, x) -> acc + x) AS d2
         |  FROM q, cw),
         |scored AS (SELECT qid, cid,
         |    list_reduce(list(d2 ORDER BY s), (acc, x) -> acc + x) AS adist
         |  FROM code JOIN lut USING (s, j)
         |  WHERE qid <> cid
         |  GROUP BY qid, cid)
         |SELECT qid, cid, CAST(rank AS INT) AS rank, adist FROM (
         |  SELECT qid, cid, adist,
         |    row_number() OVER (PARTITION BY qid ORDER BY adist, cid) AS rank
         |  FROM scored)
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    // q82: per-corpus-doc nearest bench item — same cosine fold as
    // q40; argmax restated as a (cos desc, bid) row_number.
    "q82_semantic_screen" ->
      s"""WITH $sqlVecs,
         |s AS (SELECT c.vec_id AS cid, b.vec_id AS bid,
         |    ${sqlDot("c.embedding", "b.embedding")} / (sqrt(c.n2) * sqrt(b.n2)) AS cos
         |  FROM norms c JOIN norms b
         |    ON c.vec_id % 10 <> 0 AND b.vec_id % 10 = 0),
         |r AS (SELECT cid, bid, cos,
         |    row_number() OVER (PARTITION BY cid ORDER BY cos DESC, bid) AS rn
         |  FROM s)
         |SELECT cid, bid, cos, cos >= 0.8 AS contaminated
         |FROM r WHERE rn = 1 ORDER BY cid""".stripMargin,
    // q83: exact heavy-hitter counts restated; the sketch envelope
    // booleans are stated TRUE (the CMS lower bound holds always,
    // the upper with margin eps*N at confidence 0.99 under a pinned
    // seed — the q64x pattern).
    "q83_heavy_hitters" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
        |    t -> length(t) > 0)) AS t
        |  FROM documents),
        |agg AS (SELECT t AS token, count(*) AS cnt, count(DISTINCT doc_id) AS ndocs
        |  FROM toks GROUP BY t)
        |SELECT token, CAST(cnt AS BIGINT) AS cnt, CAST(ndocs AS BIGINT) AS ndocs,
        |  TRUE AS lower_ok, TRUE AS upper_ok
        |FROM agg ORDER BY cnt DESC, token LIMIT 20""".stripMargin,
    // q84: the co-occurrence integer surface restated with pure list
    // ops (no lateral unnest): per-position context windows, pair +
    // center-unigram aggregates, total pair mass.
    "q84_cooccur" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS tk
        |  FROM documents),
        |prs AS MATERIALIZED (
        |  SELECT p[1] AS w, p[2] AS c FROM (
        |    SELECT unnest(flatten(list_transform(generate_series(1, len(tk)), i ->
        |      list_transform(list_filter(generate_series(greatest(i-2, 1), least(i+2, len(tk))),
        |          j -> j <> i),
        |        j -> [tk[CAST(i AS INT)], tk[CAST(j AS INT)]])))) AS p
        |    FROM toks)),
        |pc AS MATERIALIZED (SELECT w, c, count(*) AS n_wc FROM prs GROUP BY w, c),
        |uni AS MATERIALIZED (SELECT w, count(*) AS n_w FROM prs GROUP BY w),
        |tot AS (SELECT sum(n_wc) AS n FROM pc)
        |SELECT pc.w, pc.c, CAST(n_wc AS BIGINT) AS n_wc, CAST(u1.n_w AS BIGINT) AS n_w,
        |  CAST(u2.n_w AS BIGINT) AS n_c, CAST(n AS BIGINT) AS n
        |FROM pc JOIN uni u1 ON pc.w = u1.w JOIN uni u2 ON pc.c = u2.w, tot
        |WHERE n_wc >= 2
        |ORDER BY n_wc DESC, pc.w, pc.c LIMIT 100""".stripMargin,
    // q85: q35's word-set equivalence class (the clone's self-concat
    // leaves the SET unchanged), score = token count, keeper = the
    // per-class (score desc, id) argmax.
    "q85_dedup_keep_best" ->
      """WITH doubled AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE source IN ('src0', 'src1', 'src2', 'src3')
        |  UNION ALL SELECT doc_id + 1000000, text || ' ' || text FROM documents
        |  WHERE source IN ('src0', 'src1', 'src2', 'src3')),
        |keyed AS (
        |  SELECT doc_id,
        |    array_to_string(list_sort(list_distinct(
        |      list_filter(string_split(text, ' '), w -> length(w) > 0))), chr(9)) AS k,
        |    CAST(len(list_filter(string_split(text, ' '), w -> length(w) > 0)) AS BIGINT) AS score
        |  FROM doubled)
        |SELECT doc_id AS id,
        |  min(doc_id) OVER (PARTITION BY k) AS component,
        |  score,
        |  doc_id = first_value(doc_id) OVER (PARTITION BY k
        |    ORDER BY score DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS keep
        |FROM keyed
        |ORDER BY id""".stripMargin,
    "q86_blocklist" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), w -> length(w) > 0) AS tk
        |  FROM documents)
        |SELECT doc_id AS id,
        |  CAST(len(list_filter(tk, w -> w IN ('dup', 'lorem', '{'))) AS INT) AS n_blocked,
        |  CAST(len(list_intersect(list_distinct(tk), ['dup', 'lorem', '{'])) AS INT) AS n_terms_hit,
        |  len(list_filter(tk, w -> w IN ('dup', 'lorem', '{'))) = 0 AS keep
        |FROM toks
        |ORDER BY id""".stripMargin,
    // q87: the full perceptron training trajectory restated — q72's
    // featurization (md5-fold buckets + a bias slot), then 5 rounds
    // of margin/flag/update in chained materialized CTEs, then the
    // final margins. Integer-only, so the replay is bit-exact.
    "q87_quality_classifier" ->
      s"""$sqlPerceptronPreamble
         |SELECT lab.id, lab.y, CAST(sum(fx.n * w5.w) AS BIGINT) AS margin,
         |  sum(fx.n * w5.w) > 0 AS pred
         |FROM lab JOIN fx USING (id) JOIN w5 ON fx.b = w5.b
         |GROUP BY lab.id, lab.y
         |ORDER BY lab.id""".stripMargin,
    // q99: q87's training replay, then the exact Mann–Whitney rank
    // statistic over the margin histogram — average ranks for ties
    // via 2·cum_below + np + nn + 1 per positive (the 1/2-grid trick
    // that keeps r2_pos integer).
    "q99_margin_auc" ->
      s"""$sqlPerceptronPreamble,
         |marg AS MATERIALIZED (
         |  SELECT lab.id, lab.y, CAST(sum(fx.n * w5.w) AS BIGINT) AS m
         |  FROM lab JOIN fx USING (id) JOIN w5 ON fx.b = w5.b
         |  GROUP BY lab.id, lab.y),
         |h AS (SELECT m,
         |    sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS np,
         |    sum(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS nn
         |  FROM marg GROUP BY m),
         |r AS (SELECT m, np, nn,
         |    coalesce(sum(np + nn) OVER (ORDER BY m
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_below
         |  FROM h),
         |agg AS (SELECT
         |    CAST(sum(np) AS BIGINT) AS n_pos,
         |    CAST(sum(nn) AS BIGINT) AS n_neg,
         |    CAST(sum(np * (2 * cum_below + np + nn + 1)) AS BIGINT) AS r2_pos
         |  FROM r)
         |SELECT n_pos, n_neg, r2_pos,
         |  CASE WHEN n_pos > 0 AND n_neg > 0
         |    THEN CAST(r2_pos - n_pos * (n_pos + 1) AS DOUBLE)
         |       / CAST(2 * n_pos * n_neg AS DOUBLE)
         |    ELSE CAST(0.5 AS DOUBLE) END AS auc
         |FROM agg""".stripMargin,
    // q88: the q48 training replay's final segmentation (w12) keyed
    // back to word types, per-doc TRUE token counts, then q46's
    // running-sum packing over those counts — tokenizer and packer
    // gated together.
    "q88_bpe_pack" ->
      s"""${sqlBpeCtes(12)},
         |wcount AS MATERIALIZED (
         |  SELECT array_to_string(syms, '') AS w, len(syms) AS ntok FROM w12),
         |dw AS (
         |  SELECT doc_id, source, unnest(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS w
         |  FROM documents),
         |t AS (
         |  SELECT dw.doc_id, dw.source, CAST(sum(wc.ntok) AS BIGINT) AS n_tokens
         |  FROM dw JOIN wcount wc ON dw.w = wc.w
         |  GROUP BY dw.doc_id, dw.source),
         |p AS (
         |  SELECT doc_id, source, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tokens AS start_tok
         |  FROM t WHERE n_tokens > 0)
         |SELECT source, doc_id, n_tokens, start_tok,
         |  start_tok // 2048 AS bin_first,
         |  (start_tok + n_tokens - 1) // 2048 AS bin_last,
         |  (start_tok + n_tokens - 1) // 2048 - start_tok // 2048 + 1 AS n_bins
         |FROM p ORDER BY source, doc_id""".stripMargin,
    // q90/q91: the page construction (grouping, line order, rule
    // suffixes / planted clones) restated, then the line rules /
    // duplicate accounting over the identical pages.
    "q90_c4_lines" ->
      """WITH l AS (
        |  SELECT doc_id, doc_id // 10 AS page_id,
        |    CASE doc_id % 4
        |      WHEN 0 THEN text || '.'
        |      WHEN 1 THEN text
        |      WHEN 2 THEN text || ' but Javascript required.'
        |      ELSE regexp_extract(text, '^(\S+ \S+)', 1) || '!'
        |    END AS line
        |  FROM documents),
        |pg AS (
        |  SELECT page_id, string_agg(line, chr(10) ORDER BY doc_id) AS t
        |  FROM l GROUP BY page_id),
        |x AS (
        |  SELECT page_id,
        |    list_filter(string_split(t, chr(10)), s -> length(s) > 0) AS ls
        |  FROM pg),
        |k AS (
        |  SELECT page_id, ls,
        |    list_filter(ls, s ->
        |      regexp_matches(s, '[.!?"]$')
        |      AND len(list_filter(string_split(s, ' '), w -> length(w) > 0)) >= 5
        |      AND NOT contains(lower(s), 'javascript')) AS ks
        |  FROM x)
        |SELECT page_id AS id, CAST(len(ls) AS INT) AS n_lines,
        |  CAST(len(ks) AS INT) AS n_kept,
        |  len(ks) >= 3 AS keep,
        |  array_to_string(ks, chr(10)) AS clean_text
        |FROM k ORDER BY id""".stripMargin,
    "q91_line_repetition" ->
      """WITH a AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 3 = 0),
        |pg AS (
        |  SELECT doc_id % 50 AS id, string_agg(text, chr(10) ORDER BY doc_id) AS t
        |  FROM a GROUP BY doc_id % 50),
        |x AS (
        |  SELECT id,
        |    list_filter(string_split(t, chr(10)), s -> length(s) > 0) AS ls
        |  FROM pg),
        |y AS (SELECT id, ls, list_distinct(ls) AS ds,
        |    CAST(coalesce(list_sum(list_transform(ls, s -> length(s))), 0) AS BIGINT) AS lc,
        |    CAST(coalesce(list_sum(list_transform(list_distinct(ls), s -> length(s))), 0) AS BIGINT) AS dc
        |  FROM x)
        |SELECT id,
        |  CAST(len(ls) AS BIGINT) AS n_lines,
        |  CAST(len(ls) - len(ds) AS BIGINT) AS n_dup_lines,
        |  CASE WHEN len(ls) > 0
        |    THEN (len(ls) - len(ds)) / CAST(len(ls) AS DOUBLE) ELSE 0.0 END AS dup_line_frac,
        |  lc AS n_chars,
        |  lc - dc AS n_dup_chars,
        |  CASE WHEN lc > 0 THEN (lc - dc) / CAST(lc AS DOUBLE) ELSE 0.0 END AS dup_char_frac
        |FROM y ORDER BY id""".stripMargin,
    // q92: the shifted-clone page construction, then line frequency
    // across pages and the ordered rebuild of surviving lines.
    "q92_line_excise" ->
      """WITH a AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000001, text FROM documents WHERE doc_id % 3 = 0),
        |pg AS (
        |  SELECT doc_id % 50 AS id, string_agg(text, chr(10) ORDER BY doc_id) AS t
        |  FROM a GROUP BY doc_id % 50),
        |x AS (
        |  SELECT id, list_filter(string_split(t, chr(10)), s -> length(s) > 0) AS ls
        |  FROM pg),
        |ln AS (
        |  SELECT id, i, ls[CAST(i AS INT)] AS line
        |  FROM x, unnest(generate_series(1, len(ls))) AS t(i)),
        |fq AS (
        |  SELECT line, count(DISTINCT id) AS nd FROM ln GROUP BY line)
        |SELECT ln.id,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN fq.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_cut,
        |  coalesce(string_agg(CASE WHEN fq.nd < 2 THEN ln.line END, chr(10)
        |    ORDER BY ln.i), '') AS clean_text
        |FROM ln JOIN fq USING (line)
        |GROUP BY ln.id
        |ORDER BY ln.id""".stripMargin,
    // q93: the top-20 vocabulary by the same deterministic order,
    // then per-doc uncovered-occurrence counts.
    "q93_oov_rate" ->
      """WITH tf AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> length(w) > 0)) AS token
        |  FROM documents),
        |v AS (
        |  SELECT token FROM (
        |    SELECT token, count(DISTINCT doc_id) AS df_, count(*) AS tf_
        |    FROM tf GROUP BY token)
        |  ORDER BY df_ DESC, tf_ DESC, token LIMIT 20),
        |vl AS (SELECT list(token) AS vs FROM v),
        |d AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> length(w) > 0) AS tk
        |  FROM documents)
        |SELECT doc_id AS id,
        |  CAST(len(tk) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(tk, t -> NOT list_contains(vl.vs, t))) AS BIGINT) AS n_oov,
        |  CASE WHEN len(tk) > 0
        |    THEN len(list_filter(tk, t -> NOT list_contains(vl.vs, t))) / CAST(len(tk) AS DOUBLE)
        |    ELSE 0.0 END AS oov_rate
        |FROM d, vl
        |ORDER BY id""".stripMargin,
    // q94: the split gate replayed — md5 fold of 'split:id', CASE on
    // the cumulative thresholds.
    "q94_split_assign" ->
      s"""SELECT doc_id,
         |  CASE WHEN h < 900000 THEN 'train'
         |       WHEN h < 950000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id,
         |    ${sqlMd5Fold("'split:' || CAST(doc_id AS VARCHAR)")} % 1000000 AS h
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,
    // q79: quantize -> dequantize -> rank, all restated. The
    // codebook is per-dim min/max over exactly-converted doubles;
    // codes floor (not round) so both engines agree bit-for-bit.
    "q79_sq8_topk" ->
      s"""WITH dims AS MATERIALIZED (
         |  SELECT vec_id, CAST(i AS INT) AS d, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
         |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)),
         |stats AS (SELECT d, min(x) AS lo, max(x) AS hi FROM dims GROUP BY d),
         |dq AS (SELECT vec_id, d,
         |    CASE WHEN hi = lo THEN lo
         |      ELSE lo + floor((x - lo) / (hi - lo) * 255.0) / 255.0 * (hi - lo) END AS v
         |  FROM dims JOIN stats USING (d)),
         |cvec AS (SELECT vec_id, list(v ORDER BY d) AS vec FROM dq GROUP BY vec_id),
         |qvec AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |scored AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    ${sqlDotD("q.vec", "c.vec")} / (sqrt(${sqlDotD("q.vec", "q.vec")}) * sqrt(${sqlDotD("c.vec", "c.vec")})) AS cos
         |  FROM qvec q JOIN cvec c ON q.vec_id <> c.vec_id)
         |SELECT qid, cid, CAST(rank AS INT) AS rank, cos FROM (
         |  SELECT qid, cid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
         |  FROM scored)
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "q40_cosine_topk" ->
      s"""WITH $sqlVecs,
         |scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    ${sqlDot("q.embedding", "c.embedding")} / (sqrt(q.n2) * sqrt(c.n2)) AS cos
         |  FROM norms q JOIN norms c
         |    ON q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id),
         |ranked AS (
         |  SELECT qid, cid, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
         |  FROM scored)
         |SELECT qid, cid, rank, cos FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,
    "q50_token_stats" ->
      """SELECT doc_id,
        |  length(text) AS n_chars,
        |  len(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS n_ws_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z]+')) AS n_alpha_words,
        |  CAST(coalesce((
        |    SELECT sum(CASE WHEN regexp_matches(t.tok, '^[A-Za-z]+$')
        |      THEN CAST(ceil(length(t.tok) / 4.0) AS INT) ELSE 1 END)
        |    FROM unnest(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS t(tok)
        |  ), 0) AS INT) AS n_token_est,
        |  CASE WHEN len(regexp_extract_all(lower(text), '[a-z]+')) = 0 THEN 0.0
        |    ELSE CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) /
        |         CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS DOUBLE) END AS avg_word_len
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q51_quality_score" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    length(text) AS n_chars,
        |    len(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS n_tokens,
        |    length(regexp_replace(text, '[^.,;:!?''"()]', '', 'g')) AS n_punct,
        |    len(list_filter(string_split(lower(text), ' '),
        |      t -> list_contains(['the','a','an','and','or','of','to','in','is','are',
        |                          'was','for','on','with','as','at','by','from','that','this'], t)))
        |      AS n_stop
        |  FROM documents),
        |r AS (
        |  SELECT *,
        |    CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) AS punct_ratio,
        |    CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio
        |  FROM f)
        |SELECT doc_id, n_chars, n_tokens, punct_ratio, stop_ratio,
        |  0.4 * stop_ratio + 0.3 * (1.0 - punct_ratio) +
        |  0.3 * (CASE WHEN n_tokens >= 20 THEN 1.0
        |              ELSE CAST(n_tokens AS DOUBLE) / 20.0 END) AS quality_score
        |FROM r
        |ORDER BY doc_id""".stripMargin,
    "q52_langid" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS tk
        |  FROM documents),
        |scores AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(tk, t -> list_contains(['der','die','das','und','ist','nicht','ein','mit','auf','von'], t))) AS s_de,
        |    len(list_filter(tk, t -> list_contains(['the','a','and','is','of','to','in','that','with','for'], t))) AS s_en,
        |    len(list_filter(tk, t -> list_contains(['el','la','los','las','y','es','de','que','en','con'], t))) AS s_es,
        |    len(list_filter(tk, t -> list_contains(['le','la','les','et','est','de','que','dans','avec','pour'], t))) AS s_fr,
        |    len(list_filter(tk, t -> list_contains(['de','shi','le','zai','you','he','wo','ta','men','zhe'], t))) AS s_zh
        |  FROM toks)
        |SELECT doc_id,
        |  CASE WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
        |       WHEN s_en >= greatest(s_de, s_es, s_fr, s_zh) THEN 'en'
        |       WHEN s_es >= greatest(s_de, s_en, s_fr, s_zh) THEN 'es'
        |       WHEN s_fr >= greatest(s_de, s_en, s_es, s_zh) THEN 'fr'
        |       ELSE 'zh' END AS pred_lang,
        |  lang,
        |  (CASE WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
        |        WHEN s_en >= greatest(s_de, s_es, s_fr, s_zh) THEN 'en'
        |        WHEN s_es >= greatest(s_de, s_en, s_fr, s_zh) THEN 'es'
        |        WHEN s_fr >= greatest(s_de, s_en, s_es, s_zh) THEN 'fr'
        |        ELSE 'zh' END) = lang AS correct
        |FROM scores
        |ORDER BY doc_id""".stripMargin,
    "q53_fingerprint" ->
      """SELECT doc_id,
        |  (SELECT min(md5(substr(text, CAST(t.i AS INT), 8)))
        |   FROM unnest(generate_series(1, greatest(length(text) - 7, 1))) AS t(i)) AS fingerprint
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q55_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, list_slice(ws, i, i + 7) AS gram
        |  FROM toks, unnest(generate_series(1, greatest(len(ws) - 7, 0))) AS t(i)),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_grams, count(DISTINCT gram) AS n_distinct
        |  FROM g GROUP BY doc_id)
        |SELECT t.doc_id,
        |  CAST(coalesce(a.n_grams, 0) AS BIGINT) AS n_grams,
        |  CAST(coalesce(a.n_distinct, 0) AS BIGINT) AS n_distinct,
        |  CASE WHEN coalesce(a.n_grams, 0) > 0
        |    THEN 1.0 - CAST(a.n_distinct AS DOUBLE) / CAST(a.n_grams AS DOUBLE)
        |    ELSE 0.0 END AS rep_frac
        |FROM toks t LEFT JOIN agg a ON t.doc_id = a.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "q54_vocab_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, t.w AS token
        |  FROM documents, unnest(string_split(text, ' ')) AS t(w)
        |  WHERE length(t.w) > 0)
        |SELECT token,
        |  count(DISTINCT doc_id) AS doc_freq,
        |  count(*) AS term_freq
        |FROM toks
        |GROUP BY token
        |ORDER BY doc_freq DESC, term_freq DESC, token
        |LIMIT 100""".stripMargin
  )
}
