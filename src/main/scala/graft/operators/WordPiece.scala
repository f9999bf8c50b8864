package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import graft.PlanUtil

/** WordPiece tokenizer family (Schuster & Nakajima 2012; the BERT
  * tokenizer — public algorithm, as also documented by the
  * HuggingFace tokenizers library), the THIRD trained-subword family
  * beside [[Bpe]] (merge-rank) and [[Unigram]] (likelihood lattice).
  * (Beyond-reference component: the reference pipeline has no
  * tokenizer; SURVEY §2.E's training-data ops motivate it.)
  *
  * Training is BPE-shaped — iteratively merge one adjacent symbol
  * pair, applied greedily left-to-right over the word-TYPE table —
  * but the selection objective is the LIKELIHOOD score
  * `score(a,b) = count(ab) / (count(a) * count(b))` over the current
  * segmentation (the pair that most increases a unigram LM's corpus
  * likelihood when fused), not the raw pair count. Continuation
  * symbols carry the `##` prefix (word-initial pieces don't), and a
  * merge's product is `a + strip##(b)`.
  *
  * EXACT-ARGMAX DISCIPLINE (what makes this gateable): scores are
  * rationals of exact integer counts, and the argmax is computed
  * WITHOUT float ordering — candidates within a 1e-9 relative band
  * of the float maximum (doubles misrank fractions by at most a few
  * ulps, ~1e-15 relative, so the band provably contains the true
  * argmax) are compared by exact BigInt cross-multiplication
  * `c1·a2·b2 vs c2·a1·b1`, ties broken (a asc, b asc). The q141
  * oracle replays the same argmax in DuckDB as a HUGEINT
  * cross-multiplied anti-join — both engines pick bit-identical
  * merges with no float anywhere in the decision. The band collapse
  * is guarded: more than [[BandLimit]] candidates inside the band
  * raises rather than risking a silently wrong pick (a degenerate
  * all-ties corpus; real text never approaches it).
  *
  * Encoding is NOT merge replay (the BPE/WordPiece asymmetry):
  * inference is greedy longest-match-first against the final
  * vocabulary (alphabet + every merge product), per whitespace word,
  * with words longer than `maxInputChars` mapping to a single [UNK]
  * token — exactly the published WordPiece inference rule. The q142
  * gate replays the longest-match loop per word TYPE as chained
  * CTE rounds (each round consumes >= 1 char, so `maxInputChars`
  * rounds suffice) and joins counts back per document (segment each
  * TYPE once, never each token — the q49 discipline).
  *
  * Scale shape (the q48 discipline): all training state is
  * VOCABULARY-bounded. One corpus-scale wordcount shuffle up front;
  * each round costs two word-type-bounded partial-agg shuffles
  * (adjacent pairs + symbol unigrams) and a driver argmax over the
  * tolerance band (usually one row). `checkpointFlat` per round
  * keeps lineage O(1) at any merge count. Encoding is map-side: the
  * vocabulary ships once in the task closure, no shuffle.
  */
object WordPiece {

  /** Continuation-piece prefix (the BERT convention). */
  val ContPrefix = "##"

  /** Whole-word UNK sentinel emitted for unencodable / over-length
    * words. */
  val UnkToken = "[UNK]"

  /** Hard cap on the exact-argmax tolerance band (see class doc). */
  val BandLimit = 4096

  /** One learned merge: at `rank`, adjacent symbols (`a`, `b`) fuse
    * into `a + strip##(b)`. */
  case class Merge(rank: Int, a: String, b: String) {
    def merged: String = a + stripCont(b)
  }

  def stripCont(s: String): String =
    if (s.startsWith(ContPrefix)) s.substring(ContPrefix.length) else s

  /** Corpus word-TYPE table (w, freq) — whitespace words, the q48
    * word model. */
  def wordTypes(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(filter(split(col(textCol), " "), w => length(w) > 0)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Initial WordPiece symbols of a word: first char plain, every
    * later char `##`-prefixed ("word" -> [w, ##o, ##r, ##d]). */
  def initialSyms(w: Column): Column =
    concat(
      array(substring(w, 1, 1)),
      transform(
        filter(split(substring(w, 2, Int.MaxValue), ""), s => length(s) > 0),
        c => concat(lit(ContPrefix), c)))

  /** Word-type table as initial symbol arrays: (syms, freq). */
  def symTypes(df: DataFrame, textCol: String): DataFrame =
    wordTypes(df, textCol).select(initialSyms(col("w")).as("syms"), col("freq"))

  /** Greedy left-to-right application of ONE merge to a symbol
    * array, as a codegen-friendly fold (the [[Bpe.applyMerge]]
    * scan, parameterized by the WordPiece product string): the fused
    * symbol differs from `a` (it is strictly longer), so comparing
    * the accumulator's last element implements the non-overlapping
    * left-to-right pass. */
  def applyMerge(syms: Column, m: Merge): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(m.a) && s === lit(m.b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(m.merged))))
          .otherwise(concat(acc, array(s))))

  /** Adjacent symbol pairs as (a, b) structs — empty for
    * single-symbol words (sequence(1, stop) DESCENDS for stop < 1
    * and would fabricate pairs; the when-guard prevents it). */
  private def adjacentPairs(syms: Column): Column =
    transform(
      when(size(syms) >= 2, sequence(lit(1), size(syms) - 1))
        .otherwise(array().cast("array<int>")),
      i => struct(element_at(syms, i).as("a"), element_at(syms, i + 1).as("b")))

  /** Exact argmax of `cnt / (ca * cb)` over the candidate frame
    * (columns a, b, cnt, ca, cb): float-band prefilter, then BigInt
    * cross-multiplication driver-side. Returns None when no pair
    * exists. */
  private def exactArgmax(cand: DataFrame): Option[(String, String)] = {
    // ONE action per round: TakeOrdered the double-score prefix. The
    // band rows (within 1e-9 of the max) sort ahead of everything
    // else, so as long as the band fits the limit (guarded below),
    // the true argmax is inside the collected prefix — the earlier
    // two-action formulation (max() then band filter) re-ran both
    // round aggregations twice and measured 2x the round cost.
    val top = cand.withColumn("dscore",
        col("cnt").cast("double") / (col("ca").cast("double") * col("cb").cast("double")))
      .orderBy(col("dscore").desc, col("a"), col("b"))
      .limit(BandLimit + 1)
      .select(col("a"), col("b"), col("cnt"), col("ca"), col("cb"), col("dscore"))
      .collect()
    if (top.isEmpty) None
    else {
      val maxD = top(0).getDouble(5)
      val band = top.filter(_.getDouble(5) >= maxD * (1 - 1e-9))
      require(band.length <= BandLimit,
        s"WordPiece argmax: > $BandLimit candidates tied within 1e-9 of the " +
          "maximum score — degenerate corpus; refusing to guess the argmax")
      val withScore = band.map { r =>
        (r.getString(0), r.getString(1),
          BigInt(r.getLong(2)), BigInt(r.getLong(3)) * BigInt(r.getLong(4)))
      }
      val winner = withScore.reduceLeft { (x, y) =>
        // x = (a, b, num, den); keep the larger fraction, ties -> smaller (a, b)
        val cmp = (x._3 * y._4).compare(y._3 * x._4)
        if (cmp > 0) x
        else if (cmp < 0) y
        else if (x._1 < y._1 || (x._1 == y._1 && x._2 <= y._2)) x
        else y
      }
      Some((winner._1, winner._2))
    }
  }

  /** Train `numMerges` WordPiece merges. Each round: adjacent-pair
    * counts AND current symbol unigram counts over the word-type
    * table (both freq-weighted, both vocabulary-bounded shuffles),
    * the exact likelihood-score argmax, then the greedy map-side
    * merge. Stops early when no pair remains. */
  def train(df: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    var words = PlanUtil.checkpointFlat(symTypes(df, textCol))
    val out = ArrayBuffer.empty[Merge]
    var k = 1
    var exhausted = false
    while (k <= numMerges && !exhausted) {
      // Two aggregations over the same word-type scan. A fused
      // one-explode variant (pairs + last-symbol markers, symbol
      // counts derived from the pair aggregate) was built and
      // MEASURED SLOWER at sf0.1 (4.6 s vs 3.3 s warm): the
      // per-round checkpoint barrier it needs costs more than the
      // second explode, whose shuffle Spark already reuses across
      // the round's actions. Measured dead end — recorded in
      // BENCH.md, the two-aggregation shape stays.
      val pairs = words
        .select(explode(adjacentPairs(col("syms"))).as("p"), col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
      val symCnt = words
        .select(explode(col("syms")).as("sym"), col("freq"))
        .groupBy(col("sym")).agg(sum(col("freq")).as("scnt"))
      val cand = pairs
        .join(symCnt.withColumnRenamed("sym", "a").withColumnRenamed("scnt", "ca"), "a")
        .join(symCnt.withColumnRenamed("sym", "b").withColumnRenamed("scnt", "cb"), "b")
        .select(col("a"), col("b"), col("cnt"), col("ca"), col("cb"))
      exactArgmax(cand) match {
        case None => exhausted = true
        case Some((a, b)) =>
          val m = Merge(k, a, b)
          out += m
          words = PlanUtil.checkpointFlat(
            words.withColumn("syms", applyMerge(col("syms"), m)))
          k += 1
      }
    }
    out.toSeq
  }

  /** The learned merge table as a frame: (rank, a, b, merged). */
  def mergesDF(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.a, m.b, m.merged)).toDF("rank", "a", "b", "merged")
  }

  /** The corpus initial alphabet: first chars plain + non-initial
    * chars `##`-prefixed, over all word types. Bounded by the
    * charset (couple hundred pieces on real text), so the collect is
    * a bounded fetch by construction. */
  def alphabet(df: DataFrame, textCol: String): Seq[String] =
    wordTypes(df, textCol)
      .select(explode(initialSyms(col("w"))).as("piece"))
      .distinct()
      .collect().map(_.getString(0)).toSeq

  /** Inference vocabulary, pre-classified by the `##` RAW-PREFIX
    * rule: `initial` holds pieces not starting with `##` verbatim,
    * `continuation` holds the STRIPPED forms of pieces that do.
    * Classification is by raw string prefix — not provenance — so a
    * merge product that happens to begin with literal `##` lands in
    * the continuation set, exactly as the oracle's
    * `piece LIKE '##%'` classifies it (the ambiguity is inherent to
    * the `##` convention on `#`-bearing corpora; both engines apply
    * the identical rule, which is what the gate checks). */
  case class Vocab(initial: Set[String], continuation: Set[String])

  /** Final vocabulary for inference: alphabet ∪ merge products
    * (pieces of different rounds CAN collide as strings — sets,
    * matching the oracle's UNION). */
  def vocabulary(df: DataFrame, textCol: String, merges: Seq[Merge]): Vocab = {
    val pieces = alphabet(df, textCol).toSet ++ merges.map(_.merged)
    Vocab(
      pieces.filterNot(_.startsWith(ContPrefix)),
      pieces.filter(_.startsWith(ContPrefix)).map(_.substring(ContPrefix.length))
        // a merge of initial "#" with continuation "###" can product the
        // raw string "##" — a continuation piece with an EMPTY stripped
        // form, which no longest-match cursor can consume; dropped here
        // and by the oracle's length(stripped) > 0 filter identically
        .filter(_.nonEmpty))
  }

  /** Greedy longest-match-first WordPiece inference for one word
    * (the published rule): repeatedly take the LONGEST vocabulary
    * piece matching at the cursor (position 0 probes the initial
    * set, later positions the continuation set); over-length or
    * unmatchable words collapse to a single [UNK]. O(len^2) per
    * word worst case, vocabulary independent (hash-set probes). */
  def encodeWord(word: String, vocab: Vocab, maxInputChars: Int): Seq[String] = {
    if (word.length > maxInputChars) Seq(UnkToken)
    else {
      val out = ArrayBuffer.empty[String]
      var pos = 0
      var bad = false
      while (pos < word.length && !bad) {
        val set = if (pos == 0) vocab.initial else vocab.continuation
        var l = word.length - pos
        var found = -1
        while (l >= 1 && found < 0) {
          if (set.contains(word.substring(pos, pos + l))) found = l else l -= 1
        }
        if (found < 0) bad = true
        else {
          out += (if (pos == 0) "" else ContPrefix) + word.substring(pos, pos + found)
          pos += found
        }
      }
      if (bad) Seq(UnkToken) else out.toSeq
    }
  }

  /** Per-text token count under a trained vocabulary (null-safe,
    * map-side — the vocabulary ships once per task closure). */
  def tokenCountUdf(vocab: Vocab, maxInputChars: Int): UserDefinedFunction =
    udf((text: String) =>
      if (text == null) 0L
      else text.split(" ").iterator.filter(_.nonEmpty)
        .map(w => encodeWord(w, vocab, maxInputChars).length.toLong).sum)

  /** Whole-text tokenizer (null-safe, map-side). */
  def tokenizeUdf(vocab: Vocab, maxInputChars: Int): UserDefinedFunction =
    udf((text: String) =>
      if (text == null) null
      else text.split(" ").iterator.filter(_.nonEmpty)
        .flatMap(w => encodeWord(w, vocab, maxInputChars)).toSeq)
}
