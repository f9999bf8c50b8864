package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text pipelines
  * (SURVEY.md §2.C). All paths are shuffle-bounded: no O(n^2) stage
  * ever materializes; candidate generation is hash-bucketed and only
  * candidates pay the exact-verification cost.
  */
object Dedup {

  /** Distinct non-empty word set per document, kept as an array column
    * (array ops beat a words-table explosion for per-pair math). */
  def wordSet(text: Column): Column =
    array_distinct(filter(split(text, " "), w => length(w) > 0))

  /** Exact dedup: group by md5(text), keep the min-id representative.
    * One hash-partitioned aggregate — the 100 TB workhorse.
    * @return text_hash, group_size, keeper (min id)
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("group_size"), min(col(idCol)).as("keeper"))

  /** MinHash signatures: sig[p] = min over words of xxhash64(word, p).
    * numHashes longs per doc, map-side only. */
  def minhashSignature(words: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      p => aggregate(words, lit(Long.MaxValue),
        (acc, w) => least(acc, xxhash64(w, p))))

  /** LSH candidate pairs from banded minhash signatures.
    *
    * Signature splits into `bands` bands of `rows` hashes; docs
    * sharing any band land in the same bucket. With rows=6, bands=22
    * the miss probability at Jaccard 0.95 is (1 - 0.95^6)^22 ~ 2e-13 —
    * the candidate set is effectively a superset of all pairs above
    * the target threshold, so exact verification of candidates equals
    * the brute-force answer without the O(n^2) scan.
    *
    * Scale shape: explode is x bands (fixed small factor), the
    * self-join shuffles on (band, bucket) — AQE splits hot buckets.
    */
  def lshCandidates(df: DataFrame, idCol: String, words: Column,
                    rows: Int = 6, bands: Int = 22): DataFrame = {
    val sig = df.select(col(idCol).as("id"), minhashSignature(words, rows * bands).as("sig"))
    val banded = sig.select(col("id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            xxhash64(b, slice(col("sig"), b * rows + 1, lit(rows))).as("bucket")))).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"))
      .distinct()
  }

  /** Exact word-set Jaccard for given pairs (array intersect/union on
    * the two docs' word arrays — per-row, no explosion).
    * @param pairs (i, j) ; @param docs (id, words array)
    * @return i, j, jacc
    */
  def verifyJaccard(pairs: DataFrame, docs: DataFrame): DataFrame = {
    val a = docs.select(col("id").as("i"), col("words").as("wa"))
    val b = docs.select(col("id").as("j"), col("words").as("wb"))
    pairs.join(a, "i").join(b, "j")
      .withColumn("c", size(array_intersect(col("wa"), col("wb"))))
      .withColumn("jacc",
        col("c").cast("double") /
          (size(col("wa")) + size(col("wb")) - col("c")).cast("double"))
      .select(col("i"), col("j"), col("jacc"))
  }

  /** MinHash-LSH near-duplicate pairs, exact-verified at `threshold`.
    * Equals brute-force all-pairs Jaccard >= threshold (up to the
    * ~1e-13 LSH miss probability) at shuffle-bounded cost. */
  def minhashDuplicates(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double, rows: Int = 6, bands: Int = 22): DataFrame = {
    val docs = df.select(col(idCol).as("id"), wordSet(col(textCol)).as("words"))
    val cands = lshCandidates(df.select(col(idCol), wordSet(col(textCol)).as("__words")),
      idCol, col("__words"), rows, bands)
    verifyJaccard(cands, docs).filter(col("jacc") >= threshold)
  }

  /** 64-bit SimHash over the word set: bit k is set when the sum of
    * sign contributions (words whose xxhash64 has bit k) is positive. */
  def simhash(words: Column): Column = {
    val bitSums = transform(sequence(lit(0), lit(63)), k =>
      aggregate(words, lit(0),
        (acc, w) => acc + when(call_function("shiftright", xxhash64(w), k).bitwiseAND(1) === 1, 1).otherwise(-1)))
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(63)),
        (s, k) => when(s > 0, call_function("shiftleft", lit(1L), k)).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming.
    *
    * Pigeonhole banding: split 64 bits into maxHamming+1 blocks — any
    * pair within the budget must agree exactly on at least one block,
    * so candidates come from equi-joins on block values (shuffle on
    * (block, value)), then exact popcount verification. No O(n^2).
    */
  def simhashDuplicates(df: DataFrame, idCol: String, textCol: String,
                        maxHamming: Int = 8): DataFrame = {
    val nBlocks = maxHamming + 1
    val width = 64 / nBlocks + (if (64 % nBlocks > 0) 1 else 0)
    val sigs = df.select(col(idCol).as("id"),
      simhash(wordSet(col(textCol))).as("sig"))
    val blocked = sigs.select(col("id"), col("sig"),
        explode(transform(sequence(lit(0), lit(nBlocks - 1)), b => struct(
          b.as("block"),
          call_function("shiftright", col("sig"), b * width)
            .bitwiseAND(shiftleft(lit(1L), width) - 1).as("value")))).as("bv"))
      .select(col("id"), col("sig"), col("bv.block"), col("bv.value"))
    blocked.as("a").join(blocked.as("b"),
        col("a.block") === col("b.block") && col("a.value") === col("b.value") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
        col("a.sig").as("si"), col("b.sig").as("sj"))
      .distinct()
      .withColumn("hamming", bit_count(col("si").bitwiseXOR(col("sj"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("i"), col("j"), col("hamming"))
  }

  /** Exact character-n-gram Jaccard over all pairs of a (small,
    * pre-filtered) doc set — the non-LSH baseline. Pairs come from a
    * shingle-bucket join (docs sharing no shingle never pair). */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   n: Int, threshold: Double): DataFrame = {
    val docs = df.select(col(idCol).as("id"),
      array_distinct(transform(sequence(lit(1), length(col(textCol)) - (n - 1)),
        i => col(textCol).substr(i, lit(n)))).as("grams"))
    val exploded = docs.select(col("id"), explode(col("grams")).as("g"))
    val pairs = exploded.as("a").join(exploded.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j")).distinct()
    val a = docs.select(col("id").as("i"), col("grams").as("ga"))
    val b = docs.select(col("id").as("j"), col("grams").as("gb"))
    pairs.join(a, "i").join(b, "j")
      .withColumn("c", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("jacc", col("c").cast("double") /
        (size(col("ga")) + size(col("gb")) - col("c")).cast("double"))
      .filter(col("jacc") >= threshold)
      .select(col("i"), col("j"), col("jacc"))
  }
}
