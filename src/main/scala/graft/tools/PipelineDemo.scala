package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Bpe, Dedup, Sampling, Similarity, TextAnalysis}

/** End-to-end training-data pipeline demo over the documents +
  * embeddings tables: near-dup dedup -> quality filter -> semantic
  * dedup -> mixture sampling -> token budget + sequence packing ->
  * language mix -> similarity search. Every stage is the production
  * operator, chained the way a 100 TB curation job would.
  *
  * Run: sbt "runMain graft.tools.PipelineDemo [sfDir]"
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, dir)
    println(s"=== corpus: ${docs.count()} docs ===")

    // 0. crawl front door: HTML extraction + URL canonicalization —
    //    the step before everything else on a real crawl (here the
    //    corpus is wrapped in markup to drive the extractor)
    val wrapped = docs.select(col("doc_id"),
      concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>")).as("html"),
      concat(lit("HTTP://Example.COM:80/doc/"), col("doc_id"),
        lit("?utm_source=crawl&id="), col("doc_id")).as("url"))
    val extracted = TextAnalysis.htmlToText(wrapped, "doc_id", "html")
    val nTags = extracted.agg(sum(col("n_tags"))).head().getLong(0)
    val canonUrls = wrapped.select(TextAnalysis.canonicalizeUrl(col("url")).as("u"))
      .distinct().count()
    println(s"=== extract: $nTags tags stripped across the corpus; " +
      s"$canonUrls canonical urls (ports/tracking params gone) ===")

    // 1. near-dup dedup (MinHash-LSH -> connected components)
    val deduped = Dedup.dedupCorpus(docs, "doc_id", "text", threshold = 0.9)
    val kept = deduped.filter(col("keep"))
    println(s"=== dedup @0.9: keep ${kept.count()} of ${deduped.count()} " +
      s"(${deduped.select(countDistinct(col("component"))).collect()(0).getLong(0)} clusters) ===")

    // 1b. exact-substring span excision — the SPAN-level alternative
    //     to doc-level dedup (RefinedWeb policy: cut corpus-duplicated
    //     ranges, keep unique remainders; hashed grams are the 100 TB
    //     freight default). Shown on the raw corpus: it removes the
    //     same planted duplication as step 1 while preserving every
    //     doc's unique text instead of dropping whole docs.
    val excised = Dedup.exciseDupSpans(docs, "doc_id", "text",
      k = 8, hashGrams = true)
    val cut = excised.agg(sum(col("n_removed")), sum(col("n_tokens"))).collect()(0)
    println(s"=== exact-substring excision (raw corpus): cut ${cut.getLong(0)} " +
      s"of ${cut.getLong(1)} tokens, all ${excised.count()} docs kept ===")

    // 2. quality filter on the kept set
    val quality = TextAnalysis.qualityFeatures(
        docs.join(kept.select(col("id").as("doc_id")), "doc_id"), "doc_id", "text")
      .filter(col("quality_score") >= 0.5)
    println(s"=== quality >= 0.5: ${quality.count()} docs ===")

    // 2b. corpus-LM perplexity scoring + DSIR importance resampling
    //     toward the English slice — the two model-based quality
    //     levers, both deterministic
    val lmAvg = TextAnalysis.lmScore(docs, "doc_id", "text")
      .agg(avg(col("nll"))).collect()(0).getDouble(0)
    val dsir = TextAnalysis.importanceWeights(docs,
      docs.filter(col("lang") === "en"), "doc_id", "text")
    val bnd = dsir.agg(min(col("logw")), max(col("logw"))).collect()(0)
    val dsirKept = Sampling.weightedSample(
      dsir.withColumn("w",
        (col("logw") - bnd.getDouble(0)) / (bnd.getDouble(1) - bnd.getDouble(0))),
      "id", "w")
    println(f"=== corpus-LM avg nll $lmAvg%.3f; DSIR resample toward en: " +
      s"${dsirKept.count()} of ${dsir.count()} docs ===")

    // 3. semantic dedup over embeddings (IVF clusters -> cosine pairs
    //    -> connected components -> per-cluster representative)
    val e0 = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val semPairs = Similarity.semanticNearDup(e0, threshold = 0.5, nlist = 16)
    val semComps = Dedup.connectedComponents(semPairs.select(col("i"), col("j")))
    println(s"=== semantic dedup @0.5: ${semPairs.count()} near-dup pairs, " +
      s"${semComps.count()} vectors in dup groups ===")

    // 4. deterministic mixture sampling of the survivors (upsample
    //    src0, downsample the rest — same sample on any rerun)
    val sampled = Sampling.stratifiedSample(
      docs.join(quality.select("doc_id"), "doc_id"), "doc_id", "source",
      Map("src0" -> 1.0), defaultFraction = 0.5)
    println(s"=== mixture sample: ${sampled.count()} docs ===")

    // 4b. temperature-flattened language mix + per-domain cap (the
    //     "no host dominates" rule) on the same survivors
    val mixed = Sampling.temperatureMix(
      docs.join(quality.select("doc_id"), "doc_id").select(col("doc_id"), col("lang")),
      "lang", "doc_id", alpha = 0.5)
    val mixCounts = mixed.groupBy(col("lang")).count().orderBy(col("lang"))
      .collect().map(r => s"${r.getString(0)}:${r.getLong(1)}").mkString(" ")
    val capped = Sampling.capPerGroup(
      docs.select(col("doc_id"), col("source")), "source", "doc_id", cap = 12)
    println(s"=== temperature mix a=0.5: $mixCounts; " +
      s"domain cap 12: ${capped.count()} docs ===")

    // 5. token budget + sequence packing of the final corpus
    val withToks = sampled.select(col("doc_id"), col("source"),
      TextAnalysis.tokenEstimate(col("text")).as("t"))
    val tokens = withToks.agg(sum(col("t"))).collect()(0).getLong(0)
    val bins = Sampling.packChunks(withToks, "doc_id", "t", "source", budget = 2048)
      .groupBy(col("source")).agg((max(col("bin_last")) + 1).as("nb"))
      .agg(sum(col("nb"))).collect()(0).getLong(0)
    println(s"=== token budget: $tokens tokens -> $bins bins of 2048 ===")

    // 5b. same packing under a TRAINED tokenizer: BPE merges learned
    //     on the corpus, true token counts replacing the estimate
    val merges = Bpe.train(docs, "text", numMerges = 16)
    val bpeToks = sampled.select(col("doc_id"), col("source"),
      Bpe.tokenCountUdf(merges)(col("text")).as("t"))
    val bpeTotal = bpeToks.agg(sum(col("t"))).collect()(0).getLong(0)
    println(s"=== BPE(16 merges) vocabulary: " +
      merges.take(6).map(_.merged).mkString(" ") + " ... ===")
    println(s"=== BPE token budget: $bpeTotal tokens " +
      s"(estimate said $tokens) ===")

    // 5c. loader manifest + reproducible epoch order: per-bin token
    //     slices (what a data-loader reads) and the deterministic
    //     per-epoch corpus shuffle
    val packedB = Sampling.packChunks(bpeToks, "doc_id", "t", "source", budget = 2048)
    val manifest = Sampling.binSlices(packedB, "doc_id", "source", budget = 2048)
    println(s"=== loader manifest: ${manifest.count()} (bin, doc) slices ===")
    val order = Sampling.epochOrder(sampled.select(col("doc_id")), "doc_id", epoch = 1)
      .orderBy(col("epoch_key"), col("doc_id")).limit(5)
      .select(col("doc_id")).collect().map(_.getLong(0)).mkString(", ")
    println(s"=== epoch 1 starts with docs: $order ===")

    // 6. language mix
    println("=== language mix (predicted) ===")
    TextAnalysis.langIdFeatures(docs, "doc_id", "text")
      .groupBy(col("pred_lang")).count().orderBy(col("pred_lang")).show()

    // 7. similarity search over embeddings (ANN with exact rescoring)
    val e = Tables.embeddings(spark, dir)
    println("=== ANN top-3 for vec_id 0 (multi-table hyperplane LSH) ===")
    Similarity.annTopK(
        e.filter(col("vec_id") === 0).select(col("vec_id").as("qid"), col("embedding").as("vec")),
        e.select(col("vec_id").as("cid"), col("embedding").as("vec")), k = 3)
      .show()

    spark.stop()
  }
}
