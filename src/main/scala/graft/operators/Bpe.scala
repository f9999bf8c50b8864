package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import graft.PlanUtil

/** Distributed byte-pair-encoding tokenizer training and encoding
  * (SURVEY.md §2.E adjacent — the trainable-vocabulary counterpart of
  * TextAnalysis's regex token ESTIMATE; no reference counterpart, an
  * LLM-pipeline brief item). Algorithm: Sennrich, Haddow & Birch 2016
  * ("Neural Machine Translation of Rare Words with Subword Units") —
  * iteratively merge the most frequent adjacent symbol pair.
  *
  * Scale shape: training runs over the WORD-TYPE frequency table, not
  * the corpus — one corpus-scale wordcount shuffle up front (with
  * map-side partial aggregation), after which every merge round costs
  * a map-side fold over word types plus one (pair, freq) partial-agg
  * shuffle whose argmax is a `limit(1)` — the driver holds one row
  * per round, never a distribution. The word-type table is
  * vocabulary-bounded (Heaps' law), so a 100 TB corpus trains over
  * millions of rows, not trillions. `checkpointFlat` per round keeps
  * lineage and planner statistics O(1) at any merge count. Encoding
  * is embarrassingly parallel: a per-row kernel over a driver-shipped
  * rank map, no shuffle.
  *
  * Determinism: the argmax tie-breaks by (count desc, a asc, b asc)
  * under binary string ordering, so training is reproducible on any
  * cluster size and replayable in an external SQL engine — the q48
  * driver gate replays the full merge loop in DuckDB.
  */
object Bpe {

  /** One learned merge: at `rank`, adjacent symbols (`a`, `b`)
    * concatenate into a new symbol. */
  case class Merge(rank: Int, a: String, b: String) {
    def merged: String = a + b
  }

  /** Whitespace words of `textCol`, one row per distinct word with
    * its corpus frequency, as initial single-character symbol arrays.
    * BPE statistics are word-internal, so frequencies over word TYPES
    * carry exactly the information of the full corpus at a fraction
    * of the rows. */
  def wordTypes(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(filter(split(col(textCol), " "), w => length(w) > 0)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      // split(w, "") keeps a trailing "" under Java's limit=-1 split
      .select(filter(split(col("w"), ""), s => length(s) > 0).as("syms"), col("freq"))

  /** Greedy left-to-right application of ONE merge (`a`,`b`) to a
    * symbol array, as a codegen-friendly fold: the freshly merged
    * symbol `a+b` differs from `a`, so a fold that compares the
    * accumulator's last element implements exactly the
    * non-overlapping left-to-right scan ("aaa" + (a,a) -> [aa, a]). */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(s))))

  /** Adjacent symbol pairs of a word as (a, b) structs — empty for
    * single-symbol words (the when-guard matters: sequence(1, stop)
    * DESCENDS for stop < 1 and would fabricate pairs). */
  private def adjacentPairs(syms: Column): Column =
    transform(
      when(size(syms) >= 2, sequence(lit(1), size(syms) - 1))
        .otherwise(array().cast("array<int>")),
      i => struct(element_at(syms, i).as("a"), element_at(syms, i + 1).as("b")))

  /** Train `numMerges` BPE merges over the corpus. Each round: count
    * adjacent pairs weighted by word frequency, take the
    * deterministic argmax, apply the merge map-side. Stops early if
    * no pair remains (corpus fully merged). */
  def train(df: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    var words = PlanUtil.checkpointFlat(wordTypes(df, textCol))
    val out = ArrayBuffer.empty[Merge]
    var k = 1
    var exhausted = false
    while (k <= numMerges && !exhausted) {
      val top = words
        .select(explode(adjacentPairs(col("syms"))).as("p"), col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        out += Merge(k, a, b)
        words = PlanUtil.checkpointFlat(
          words.withColumn("syms", applyMerge(col("syms"), a, b)))
        k += 1
      }
    }
    out.toSeq
  }

  /** Greedy left-to-right application of SEVERAL symbol-disjoint
    * merges in one fold pass. Disjointness (no symbol appears in two
    * rules) means at most one rule can match at any position, so the
    * simultaneous application is order-independent and equal to
    * applying the rules sequentially in any order. */
  private def applyMerges(syms: Column, ms: Seq[Merge]): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => {
        val appended = concat(acc, array(s))
        ms.foldLeft(appended) { (els, m) =>
          when(size(acc) > 0 && element_at(acc, -1) === lit(m.a) && s === lit(m.b),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(m.merged))))
            .otherwise(els)
        }
      })

  /** Batched BPE training — the 32k-vocabulary scale path. [[train]]
    * is exact but pays one Spark round PER merge (a real vocabulary
    * needs tens of thousands); here each round counts pairs once,
    * selects up to `batch` pairs greedily in (count desc, a, b)
    * order SKIPPING any pair that shares a symbol with an
    * already-selected one, and applies the whole batch in a single
    * map-side fold — rounds = numMerges/batch, not numMerges.
    *
    * Semantics note (standard scalable-BPE trade): merges 2..batch
    * of a round are chosen from the ROUND-START counts instead of
    * recounting after each merge, so the learned vocabulary can
    * differ from the sequential reference's (batch = 1 reproduces
    * [[train]] exactly — spec-pinned). The symbol-disjointness
    * constraint is what keeps the batch well-defined: simultaneous
    * application equals sequential application in any order, so
    * rank-order encoding ([[encodeWord]]) still reproduces the
    * trained segmentation exactly, batched or not. */
  def trainBatched(df: DataFrame, textCol: String, numMerges: Int,
                   batch: Int = 64): Seq[Merge] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    require(batch >= 1, s"batch must be >= 1, got $batch")
    var words = PlanUtil.checkpointFlat(wordTypes(df, textCol))
    val out = ArrayBuffer.empty[Merge]
    var exhausted = false
    while (out.size < numMerges && !exhausted) {
      val want = math.min(batch, numMerges - out.size)
      // over-fetch so disjointness filtering still fills the batch
      // in frequency-skewed rounds; a short round just recounts
      val top = words
        .select(explode(adjacentPairs(col("syms"))).as("p"), col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(want * 8).collect()
      if (top.isEmpty) exhausted = true
      else {
        // a pair joins the batch only if its INPUT symbols and its
        // OUTPUT symbol are all unseen in this batch — inputs for
        // match-disjointness, the output so no batch rule can consume
        // (or recreate) another's product, which is what makes
        // simultaneous application equal to sequential in any order
        val used = scala.collection.mutable.Set.empty[String]
        val picked = ArrayBuffer.empty[Merge]
        top.iterator.takeWhile(_ => picked.size < want).foreach { r =>
          val (a, b) = (r.getString(0), r.getString(1))
          if (!used(a) && !used(b) && !used(a + b)) {
            used += a; used += b; used += (a + b)
            picked += Merge(out.size + picked.size + 1, a, b)
          }
        }
        out ++= picked
        words = PlanUtil.checkpointFlat(
          words.withColumn("syms", applyMerges(col("syms"), picked.toSeq)))
      }
    }
    out.toSeq
  }

  /** The learned vocabulary as a frame: (rank, a, b, merged). */
  def mergesDF(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.a, m.b, m.merged)).toDF("rank", "a", "b", "merged")
  }

  /** Encode one word under a trained rank map: repeatedly merge the
    * LOWEST-rank adjacent pair present (all its occurrences, greedy
    * left-to-right) until none applies. Equivalent to applying every
    * merge once in rank order — a merge can only create pairs
    * involving its own output symbol, whose merges all carry LATER
    * ranks, so earlier-rank pairs never (re)appear. O(len^2) worst
    * case per word, independent of vocabulary size. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms: ArrayBuffer[String] = ArrayBuffer(word.map(_.toString): _*)
    var more = syms.length >= 2
    while (more) {
      var best = Int.MaxValue
      var i = 0
      var bi = -1
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) more = false
      else {
        val (a, b) = (syms(bi), syms(bi + 1))
        val nb = ArrayBuffer.empty[String]
        syms.foreach { s =>
          if (nb.nonEmpty && nb.last == a && s == b) nb(nb.length - 1) = a + b
          else nb += s
        }
        syms = nb
        more = syms.length >= 2
      }
    }
    syms.toSeq
  }

  /** Whole-text tokenizer over whitespace words (null-safe). The rank
    * map ships once in the task closure — encoding is map-side only. */
  def tokenizeUdf(merges: Seq[Merge]): UserDefinedFunction = {
    val ranks = merges.map(m => ((m.a, m.b), m.rank)).toMap
    udf((text: String) =>
      if (text == null) null
      else text.split(" ").iterator.filter(_.nonEmpty)
        .flatMap(w => encodeWord(w, ranks)).toSeq)
  }

  /** TRUE token count under the trained vocabulary — the drop-in
    * upgrade for the regex estimate feeding token budgets
    * (Sampling.packChunks) and token stats (q50): counts without
    * materializing the token arrays. */
  def tokenCountUdf(merges: Seq[Merge]): UserDefinedFunction = {
    val ranks = merges.map(m => ((m.a, m.b), m.rank)).toMap
    udf((text: String) =>
      if (text == null) 0L
      else text.split(" ").iterator.filter(_.nonEmpty)
        .map(w => encodeWord(w, ranks).length.toLong).sum)
  }
}
