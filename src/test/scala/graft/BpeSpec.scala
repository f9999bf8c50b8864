package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE tokenizer training + encoding (Sennrich et al. 2016). */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  // The classic fixture, hand-computed under the (count desc, a, b)
  // tie rule:
  //   "aaabdaaabac" = [a a a b d a a a b a c]
  //   round 1: (a,a) x4 wins            -> [aa a b d aa a b a c]
  //   round 2: (aa,a) and (a,b) tie at 2; "a" < "aa" picks (a,b)
  //                                      -> [aa ab d aa ab a c]
  //   round 3: (aa,ab) x2 wins          -> [aaab d aaab a c]
  //   round 4: all pairs tie at 1; (a,c) is lexicographically first
  //                                      -> [aaab d aaab ac]
  test("train learns the hand-computed merges of the classic corpus") {
    val df = Seq("aaabdaaabac").toDF("text")
    val merges = Bpe.train(df, "text", numMerges = 4)
    assert(merges.map(m => (m.rank, m.a, m.b)) ==
      Seq((1, "a", "a"), (2, "a", "b"), (3, "aa", "ab"), (4, "a", "c")))
    assert(merges.map(_.merged) == Seq("aa", "ab", "aaab", "ac"))
    // reruns are identical (deterministic argmax, no RNG)
    assert(Bpe.train(df, "text", numMerges = 4) == merges)
  }

  test("null and empty texts are ignored by training and encode to zero tokens") {
    val df = Seq(Some("xy xy"), None, Some(""), Some("   ")).toDF("text")
    val m = Bpe.train(df, "text", numMerges = 1)
    assert(m.map(x => (x.a, x.b)) == Seq(("x", "y")))
    val out = df.select(Bpe.tokenCountUdf(m)(col("text")).as("n"))
      .as[Long].collect().sorted
    assert(out.toSeq == Seq(0L, 0L, 0L, 2L))
  }

  test("train stops early when no pairs remain") {
    // single-char words only: zero adjacent pairs from the start
    val df = Seq("a b c a b").toDF("text")
    assert(Bpe.train(df, "text", numMerges = 5).isEmpty)
    // one two-char word type: exactly one merge is learnable, then
    // every word is a single symbol
    val df2 = Seq("ab ab a b").toDF("text")
    val m = Bpe.train(df2, "text", numMerges = 5)
    assert(m.map(x => (x.a, x.b)) == Seq(("a", "b")))
  }

  test("word frequencies weight the pair counts (types vs tokens)") {
    // "xy" occurs 3 times as a word, "zq" once: (x,y) must win even
    // though both pairs appear in exactly one word TYPE
    val df = Seq("xy xy xy zq").toDF("text")
    val m = Bpe.train(df, "text", numMerges = 1)
    assert(m.head.a == "x" && m.head.b == "y")
  }

  test("encodeWord applies lowest-rank-first and matches the trained corpus") {
    val merges = Seq(Bpe.Merge(1, "a", "a"), Bpe.Merge(2, "a", "b"),
      Bpe.Merge(3, "aa", "ab"), Bpe.Merge(4, "a", "c"))
    val ranks = merges.map(m => ((m.a, m.b), m.rank)).toMap
    // the training corpus re-encodes to its final symbol state
    assert(Bpe.encodeWord("aaabdaaabac", ranks) == Seq("aaab", "d", "aaab", "ac"))
    // rank order matters: in "aab", (a,a) at rank 1 beats (a,b) at 2
    assert(Bpe.encodeWord("aab", ranks) == Seq("aa", "b"))
    // unknown characters pass through as single symbols
    assert(Bpe.encodeWord("zaab", ranks) == Seq("z", "aa", "b"))
    assert(Bpe.encodeWord("a", ranks) == Seq("a"))
  }

  test("encodeWord == sequential rank-order expression application") {
    // property: the imperative min-rank encoder equals applying each
    // merge once in rank order via the applyMerge fold expression
    val corpus = Seq("abcabc", "aabbcc", "cabbage", "bbbbbb", "abacus",
      "aaabdaaabac", "ccc", "x")
    val df = corpus.toDF("w")
    val merges = Bpe.train(Seq(corpus.mkString(" ")).toDF("text"), "text", numMerges = 6)
    val ranks = merges.map(m => ((m.a, m.b), m.rank)).toMap
    val viaExpr = merges.foldLeft(
        df.select(col("w"), filter(split(col("w"), ""), s => length(s) > 0).as("syms"))) {
        (d, m) => d.withColumn("syms", Bpe.applyMerge(col("syms"), m.a, m.b))
      }
      .select(col("w"), col("syms")).as[(String, Seq[String])].collect().toMap
    corpus.foreach { w =>
      assert(Bpe.encodeWord(w, ranks) == viaExpr(w), s"mismatch on '$w'")
    }
  }

  test("trainBatched with batch=1 reproduces the sequential trainer exactly") {
    val docs = Tables.documents(spark, sf).limit(120)
    val seq8 = Bpe.train(docs, "text", numMerges = 8)
    val bat1 = Bpe.trainBatched(docs, "text", numMerges = 8, batch = 1)
    assert(bat1 == seq8)
  }

  test("trainBatched batches are symbol-disjoint, deterministic, and encodable") {
    val docs = Tables.documents(spark, sf).limit(120)
    val merges = Bpe.trainBatched(docs, "text", numMerges = 12, batch = 4)
    assert(merges.size == 12 && merges.map(_.rank) == (1 to 12))
    // within every batch-of-4 window the inputs AND outputs are
    // disjoint (the invariant that makes simultaneous application
    // order-independent)
    merges.grouped(4).foreach { g =>
      val syms = g.flatMap(m => Seq(m.a, m.b, m.merged))
      assert(syms.distinct.size == syms.size, s"colliding batch: $g")
    }
    assert(Bpe.trainBatched(docs, "text", numMerges = 12, batch = 4) == merges)
    // encoding under batched merges reconstitutes every word exactly
    val ranks = merges.map(m => ((m.a, m.b), m.rank)).toMap
    docs.select(col("text")).collect().flatMap(_.getString(0).split(" ")).filter(_.nonEmpty)
      .take(200).foreach { w =>
        assert(Bpe.encodeWord(w, ranks).mkString == w, s"lossy encode of '$w'")
      }
  }

  test("tokenizeUdf and tokenCountUdf agree and plug into packing budgets") {
    val docs = Tables.documents(spark, sf).limit(50)
    val merges = Bpe.train(docs, "text", numMerges = 8)
    assert(merges.size == 8)
    val toks = docs.select(col("doc_id"),
      Bpe.tokenizeUdf(merges)(col("text")).as("toks"),
      Bpe.tokenCountUdf(merges)(col("text")).as("n_tok"))
    assert(toks.filter(size(col("toks")) =!= col("n_tok")).count() == 0)
    // BPE merges only ever reduce the whitespace-char token count
    val chars = docs.select(sum(length(regexp_replace(col("text"), " ", ""))))
      .as[Long].first()
    val total = toks.select(sum(col("n_tok"))).as[Long].first()
    assert(total > 0 && total < chars)
    // true token counts drive the packer exactly like the estimate
    val packed = graft.operators.Sampling.packChunks(
      toks.select(col("doc_id"), lit("s").as("src"), col("n_tok")),
      "doc_id", "n_tok", "src", budget = 512)
    assert(packed.select(sum(col("n_tokens"))).as[Long].first() == total)
  }
}
