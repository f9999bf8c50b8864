package graft

import org.apache.spark.sql.functions._

import graft.operators.WordPiece

/** WordPiece family (q141/q142): hand-computed merge fixture, exact
  * likelihood-argmax parity vs a driver-side reference trainer over
  * seeded random corpora, the greedy fold semantics, longest-match
  * inference incl. [UNK] paths, and udf/driver parity. */
class WordPieceSpec extends SparkSuite {

  import spark.implicits._

  private def corpusDF(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  // ---- driver-side reference trainer (plain Scala, exact fractions) ----

  private def strip(s: String) = if (s.startsWith("##")) s.substring(2) else s

  private def initSyms(w: String): Vector[String] =
    Vector(w.substring(0, 1)) ++ w.drop(1).map(c => "##" + c)

  private def applyRef(s: Vector[String], a: String, b: String, m: String): Vector[String] =
    s.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ m else acc :+ x
    }

  private def refTrain(wordFreq: Seq[(String, Long)], n: Int): Seq[(String, String, String)] = {
    var syms = wordFreq.map { case (w, f) => (initSyms(w), f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    var k = 0
    var done = false
    while (k < n && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      val sym = scala.collection.mutable.Map.empty[String, Long]
      syms.foreach { case (s, f) =>
        s.foreach(x => sym(x) = sym.getOrElse(x, 0L) + f)
        s.sliding(2).filter(_.size == 2)
          .foreach(p => pairs((p(0), p(1))) = pairs.getOrElse((p(0), p(1)), 0L) + f)
      }
      if (pairs.isEmpty) done = true
      else {
        val best = pairs.toSeq.map { case ((a, b), c) =>
          (a, b, BigInt(c), BigInt(sym(a)) * BigInt(sym(b)))
        }.reduceLeft { (x, y) =>
          val cmp = (x._3 * y._4).compare(y._3 * x._4)
          if (cmp > 0) x
          else if (cmp < 0) y
          else if (x._1 < y._1 || (x._1 == y._1 && x._2 <= y._2)) x
          else y
        }
        val m = best._1 + strip(best._2)
        out += ((best._1, best._2, m))
        syms = syms.map { case (s, f) => (applyRef(s, best._1, best._2, m), f) }
        k += 1
      }
    }
    out.toSeq
  }

  test("hand fixture: likelihood argmax picks rare-pair merges first, " +
    "exact-fraction ties break (a, b) ascending") {
    val df = corpusDF("low low low lower lowest")
    val merges = WordPiece.train(df, "text", numMerges = 4)
    // scores r1: (##s,##t) 1/1 wins over (##e,##r)=(##e,##s)=1/2 and the
    // 0.2 floor; r2: (##e,##r) vs (##e,##st) tie at 1/2 -> b asc; r3:
    // (##e,##st) 1/1; r4: all remaining tie at exactly 1/5 -> a asc
    // picks ##o (the '#' prefix sorts before 'l').
    assert(merges.map(m => (m.a, m.b, m.merged)) === Seq(
      ("##s", "##t", "##st"),
      ("##e", "##r", "##er"),
      ("##e", "##st", "##est"),
      ("##o", "##w", "##ow")))
  }

  test("train matches the driver-side exact-fraction reference on seeded " +
    "random corpora (argmax band + BigInt tie-break end-to-end)") {
    val rnd = new scala.util.Random(42)
    (1 to 10).foreach { trial =>
      val words = (1 to 5 + rnd.nextInt(6)).map { _ =>
        (1 to 1 + rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }
      val repeated = words.flatMap(w => Seq.fill(1 + rnd.nextInt(4))(w))
      val df = corpusDF(rnd.shuffle(repeated).mkString(" "))
      val wf = repeated.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq
      val got = WordPiece.train(df, "text", numMerges = 6).map(m => (m.a, m.b, m.merged))
      val want = refTrain(wf, 6)
      assert(got === want, s"trial=$trial corpus=${repeated.mkString(" ")}")
    }
  }

  test("applyMerge fold is greedy left-to-right and non-overlapping") {
    val df = Seq(
      (Seq("a", "##a", "##a"), "x"),
      (Seq("a", "##b", "a", "##b"), "y")).toDF("syms", "tag")
    val m1 = WordPiece.Merge(1, "##a", "##a")
    val r1 = df.filter($"tag" === "x")
      .select(WordPiece.applyMerge($"syms", m1).as("s")).as[Seq[String]].head()
    assert(r1 === Seq("a", "##aa"))
    val m2 = WordPiece.Merge(1, "a", "##b")
    val r2 = df.filter($"tag" === "y")
      .select(WordPiece.applyMerge($"syms", m2).as("s")).as[Seq[String]].head()
    assert(r2 === Seq("ab", "ab"))
  }

  test("encodeWord: greedy longest-match-first, continuation prefixes, " +
    "[UNK] on over-length and unmatchable words") {
    val df = corpusDF("low low low lower lowest")
    val merges = WordPiece.train(df, "text", numMerges = 4)
    val vocab = WordPiece.vocabulary(df, "text", merges)
    // ##ow and ##est are in the vocab, so greedy longest-match uses them
    assert(WordPiece.encodeWord("lowest", vocab, 16) === Seq("l", "##ow", "##est"))
    assert(WordPiece.encodeWord("low", vocab, 16) === Seq("l", "##ow"))
    assert(WordPiece.encodeWord("lr", vocab, 16) === Seq("l", "##r"))
    // 'x' never appears in the corpus -> no piece matches
    assert(WordPiece.encodeWord("lox", vocab, 16) === Seq(WordPiece.UnkToken))
    // over the char cap -> single [UNK] without probing
    assert(WordPiece.encodeWord("lowlowlow", vocab, 8) === Seq(WordPiece.UnkToken))
    // word-initial 'o' exists only as a continuation piece -> [UNK]
    assert(WordPiece.encodeWord("ow", vocab, 16) === Seq(WordPiece.UnkToken))
  }

  test("raw-## classification: a literal-# corpus encodes consistently " +
    "with the (stripped, continuation) rule") {
    val df = corpusDF("#tag #tag ##x")
    val merges = WordPiece.train(df, "text", numMerges = 2)
    val vocab = WordPiece.vocabulary(df, "text", merges)
    // alphabet holds initial "#" and continuation "#"/"x"/"t"/"a"/"g";
    // whatever the merges learned, every corpus word must round-trip
    // to a non-UNK segmentation whose concatenated stripped pieces
    // rebuild the word.
    Seq("#tag", "##x").foreach { w =>
      val enc = WordPiece.encodeWord(w, vocab, 16)
      assert(enc != Seq(WordPiece.UnkToken), s"w=$w enc=$enc")
      val rebuilt = enc.zipWithIndex.map { case (p, i) =>
        if (i == 0) p else strip(p)
      }.mkString
      assert(rebuilt === w, s"w=$w enc=$enc")
    }
  }

  test("tokenCountUdf equals tokenizeUdf length over sf0.001 documents") {
    val docs = Tables.documents(spark, sf)
    val merges = WordPiece.train(docs, "text", numMerges = 4)
    val vocab = WordPiece.vocabulary(docs, "text", merges)
    val both = docs.select(
      WordPiece.tokenCountUdf(vocab, 16)(col("text")).as("n"),
      size(WordPiece.tokenizeUdf(vocab, 16)(col("text"))).cast("long").as("m"))
    assert(both.filter(col("n") =!= col("m")).count() === 0L)
  }
}
