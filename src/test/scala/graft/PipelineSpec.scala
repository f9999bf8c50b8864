package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextAnalysis}

class PipelineSpec extends SparkSuite {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf)
  lazy val embs = Tables.embeddings(spark, sf)

  test("redact scrubs emails before digit runs and counts both") {
    val df = Seq(
      ("call 12345678 or mail bob12345678@corp.example.org now", 1L),
      ("clean text, short 123 stays", 2L),
      ("two mails: a@b.io c.d+e@f-g.co and 99999999999", 3L)
    ).toDF("text", "id")
    val out = TextAnalysis.piiStats(df, "id", "text")
      .orderBy($"id").as[(Long, Int, Int, Int)].collect()
    // email FIRST: the address's embedded digits must not be
    // half-redacted into a broken local part
    val red = df.orderBy($"id")
      .select(TextAnalysis.redact($"text")).as[String].collect()
    assert(red(0) == "call <PII> or mail <PII> now")
    assert(red(1) == "clean text, short 123 stays")
    assert(red(2) == "two mails: <PII> <PII> and <PII>")
    assert(out(0) == ((1L, 1, 1, 28)) && out(1)._2 == 0 && out(1)._3 == 0)
    assert(out(2)._2 == 2 && out(2)._3 == 1)
  }

  test("boilerplate flags units shared across docs, keeps unique ones") {
    val units = Seq(
      (1L, "the same header"), (2L, "the same header"), (3L, "the same header"),
      (1L, "unique to one"), (2L, "pair line"), (3L, "pair line"),
      (1L, "the same header") // duplicate pair collapses before counting
    ).toDF("doc", "line")
    val out = Dedup.boilerplate(units, "doc", "line", maxDocs = 1)
      .as[(Long, String, Long, Boolean)].collect()
    val byUnit = out.map(r => r._2 -> (r._3, r._4)).toMap
    assert(byUnit("the same header") == ((3L, false)))
    assert(byUnit("pair line") == ((2L, false)))
    assert(byUnit("unique to one") == ((1L, true)))
    assert(out.length == 6) // distinct (doc, unit) pairs
    // threshold is inclusive: maxDocs = 2 keeps the pair line
    val relaxed = Dedup.boilerplate(units, "doc", "line", maxDocs = 2)
      .filter($"unit" === "pair line").select($"keep").as[Boolean].collect()
    assert(relaxed.forall(identity))
  }

  test("exact dedup groups identical texts and keeps min id") {
    val d = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "ccc"), (5L, "bbb"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(d, "doc_id", "text").collect()
    assert(out.length === 3)
    val byKeeper = out.map(r => r.getAs[Long]("keeper") -> r.getAs[Long]("group_size")).toMap
    assert(byKeeper === Map(1L -> 2L, 2L -> 2L, 4L -> 1L))
  }

  test("prefix-filter pairs equal brute-force jaccard pairs at 0.9 and 0.95") {
    for (t <- Seq(0.9, 0.95)) {
      val pre = Dedup.prefixJaccardDuplicates(docs, "doc_id", "text", threshold = t)
        .select("i", "j").as[(Long, Long)].collect().toSet
      val ws = docs.select(col("doc_id"), Dedup.wordSet(col("text")).as("words"))
        .as[(Long, Seq[String])].collect()
      val brute = (for {
        (i, wa) <- ws; (j, wb) <- ws if i < j
        inter = wa.toSet.intersect(wb.toSet).size
        jacc = inter.toDouble / (wa.size + wb.size - inter)
        if jacc >= t
      } yield (i, j)).toSet
      assert(pre === brute, s"threshold $t")
    }
  }

  test("prefix-filter and minhash handle empty and single-word docs alike") {
    val d = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta epsilon"),
      (3L, "   "), (4L, ""), (5L, "zeta"), (6L, "zeta"), (7L, "alpha")
    ).toDF("doc_id", "text")
    for (f <- Seq(
        Dedup.prefixJaccardDuplicates(d, "doc_id", "text", 0.75),
        Dedup.minhashDuplicates(d, "doc_id", "text", 0.75))) {
      val got = f.select("i", "j").as[(Long, Long)].collect().toSet
      // (1,2): jacc 4/5 = 0.8; (5,6): identical single-word sets.
      // Whitespace-only/empty docs (3,4) must pair with NOTHING.
      assert(got === Set((1L, 2L), (5L, 6L)))
    }
  }

  test("bipartite prefix join equals brute-force cross-corpus jaccard pairs") {
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val got = Dedup.prefixJaccardJoin(even, odd, "doc_id", "text", threshold = 0.9)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val ws = docs.select(col("doc_id"), Dedup.wordSet(col("text")).as("words"))
      .as[(Long, Seq[String])].collect()
    val brute = (for {
      (i, wa) <- ws if i % 2 == 0
      (j, wb) <- ws if j % 2 == 1
      inter = wa.toSet.intersect(wb.toSet).size
      uni = wa.size + wb.size - inter
      if uni > 0 && inter.toDouble / uni >= 0.9
    } yield (i, j)).toSet
    assert(got === brute)
  }

  test("repetitionScore measures repeated n-gram windows; short docs score 0") {
    import graft.operators.TextAnalysis
    val d = Seq(
      (1L, "a b c d a b c d a b c d"),  // 12 words, period 4: 5 windows, 4 distinct
      (2L, "one two three four five six seven eight nine"), // 2 windows, both unique
      (3L, "too short"),                 // < 8 words
      (4L, "")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionScore(d, "doc_id", "text", n = 8)
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got(1L) === ((5L, 4L, 1.0 - 4.0 / 5.0)))
    assert(got(2L) === ((2L, 2L, 0.0)))
    assert(got(3L) === ((0L, 0L, 0.0)))
    assert(got(4L) === ((0L, 0L, 0.0)))
  }

  test("contamination flags exactly the docs sharing a word n-gram with the benchmark") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),   // shares the 8-gram window
      (2L, "completely unrelated text about something else entirely here now"),
      (3L, "a quick brown fox jumps over the lazy cat today"),     // every 8-window differs -> clean
      (4L, "short doc"),                                           // < n words
      (5L, "")                                                     // empty
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "prefix words the quick brown fox jumps over the lazy dog suffix")
    ).toDF("doc_id", "text")
    val got = Dedup.contamination(corpus, bench, "doc_id", "text", n = 8)
      .as[(Long, Long, Long)].collect().toSet
    // doc 1: windows of 8 within "the quick brown fox jumps over the lazy dog today";
    // bench contains "the quick brown fox jumps over the lazy" and
    // "quick brown fox jumps over the lazy dog" -> 2 shared grams, 1 bench doc
    assert(got === Set((1L, 1L, 2L)))
  }

  test("minhash-LSH pairs equal brute-force jaccard pairs at 0.9") {
    val lsh = Dedup.minhashDuplicates(docs, "doc_id", "text", threshold = 0.9)
      .select("i", "j").as[(Long, Long)].collect().toSet
    // brute force on the same word sets
    val ws = docs.select(col("doc_id"), Dedup.wordSet(col("text")).as("words"))
      .as[(Long, Seq[String])].collect()
    val brute = (for {
      (i, wa) <- ws; (j, wb) <- ws if i < j
      inter = wa.toSet.intersect(wb.toSet).size
      jacc = inter.toDouble / (wa.size + wb.size - inter)
      if jacc >= 0.9
    } yield (i, j)).toSet
    assert(lsh === brute)
  }

  test("simhash: near-identical word sets collide, hamming is symmetric-free") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // identical
      (3L, "totally different words entirely unrelated content here now")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashDuplicates(d, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    assert(pairs.exists { case (i, j, h) => i == 1 && j == 2 && h == 0 })
    assert(!pairs.exists { case (i, j, _) => j == 3 || i == 3 })
  }

  test("ANN top-k recall vs brute force >= 0.6 and exact cosines") {
    val q = embs.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("vec"))
    val c = embs.select(col("vec_id").as("cid"), col("embedding").as("vec"))
    val exact = Similarity.bruteForceTopK(q, c, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val ann = Similarity.annTopK(q, c, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(ann).size.toDouble / exact.size
    assert(recall >= 0.6, s"ANN recall $recall too low")
    // ANN scores are exact cosines: any (qid,cid) in both must agree
    val exactScores = Similarity.bruteForceTopK(q, c, 5)
      .select("qid", "cid", "cos").as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    Similarity.annTopK(q, c, 5)
      .select("qid", "cid", "cos").as[(Long, Long, Double)].collect()
      .foreach { case (a, b, s) =>
        exactScores.get((a, b)).foreach(es => assert(es === s))
      }
  }

  test("connected components: known graph, cliques, singletons excluded") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("i", "j")
    val comps = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comps(1L) === 1L && comps(2L) === 1L && comps(3L) === 1L)
    assert(comps(10L) === 10L && comps(11L) === 10L)
    assert(comps(20L) === 20L && comps(21L) === 20L && comps(22L) === 20L)
    assert(!comps.contains(5L))
  }

  test("dedupCorpus on a doubled corpus keeps exactly the originals") {
    val d = docs.select(col("doc_id"), col("text")).limit(50)
    val doubled = d.unionAll(d.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    val out = Dedup.dedupCorpus(doubled, "doc_id", "text", threshold = 0.999)
      .as[(Long, Long, Boolean)].collect()
    // every clone pair clusters with its original; the original (min
    // id) is the keeper; pairs at jacc>=0.999 are exactly the clones
    // unless two distinct docs share a word set
    val keepers = out.filter(_._3).map(_._1).toSet
    val originals = d.collect().map(_.getLong(0)).toSet
    assert(keepers.subsetOf(originals))
    // every doc is assigned a component and clones never keep
    assert(out.length === 100)
    out.filter(_._1 >= 1000000).foreach { case (id, comp, keep) =>
      assert(!keep, s"clone $id kept")
      assert(comp === id - 1000000 || comp < id)
    }
  }

  test("blocklist: token-exact hits, case-folded, occurrences vs distinct terms") {
    val df = Seq(
      (1L, "clean text with no listed words"),
      (2L, "has BAD twice bad and also evil here"),
      (3L, "evil alone"),
      (4L, ""),
      (5L, "badly evildoer substrings do not count")
    ).toDF("id", "text")
    val out = TextAnalysis.blocklist(df, "id", "text", Seq("bad", "EVIL"))
      .orderBy($"id").as[(Long, Int, Int, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, 0, 0, true),
      (2L, 3, 2, false),  // BAD + bad + evil; two distinct terms
      (3L, 1, 1, false),
      (4L, 0, 0, true),   // empty doc: no tokens, keeps
      (5L, 0, 0, true)))  // substring containment is NOT a hit
  }

  test("qualityPerceptron: separates a separable corpus, partition-invariant") {
    // disjoint vocabularies: linearly separable, so training accuracy
    // must reach 1.0 within the 5 batch rounds
    val pos = (0 until 20).map(i => (i.toLong, "good fine nice good fine", true))
    val neg = (20 until 40).map(i => (i.toLong, "bad awful poor bad awful", false))
    val df = (pos ++ neg).toDF("id", "text", "lab")
    val out = TextAnalysis.qualityPerceptron(df, "id", "text", col("lab"),
        buckets = 32, iters = 5)
      .orderBy($"id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out.length === 40)
    out.foreach { case (id, y, _, pred) =>
      assert(pred === (y == 1L), s"doc $id misclassified")
    }
    // margins are exact integer dots: batch updates are
    // order-independent, so repartitioning changes nothing
    val out7 = TextAnalysis.qualityPerceptron(df.repartition(7), "id", "text",
        col("lab"), buckets = 32, iters = 5)
      .orderBy($"id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out === out7)
    // empty docs carry only the bias feature and still score
    val e = TextAnalysis.qualityPerceptron(
        Seq((1L, "", true), (2L, "", true), (3L, "good", false)).toDF("id", "text", "lab"),
        "id", "text", col("lab"), buckets = 4, iters = 1)
      .orderBy($"id").as[(Long, Long, Long, Boolean)].collect()
    assert(e.length === 3)
    // round 1 flags everything at w=0; bias update = +1+1-1 = +1, so
    // the empty docs' final margin is exactly the bias weight
    assert(e(0)._3 === 1L && e(1)._3 === 1L)
  }

  test("langIdPerceptron: separates disjoint-script classes, pinned " +
       "argmax, partition-invariant, null labels scored not trained") {
    // disjoint character vocabularies: linearly separable one-vs-rest
    val mk = (n: Int, base: Int, txt: String, lang: String) =>
      (0 until n).map(i => ((base + i).toLong, txt, lang))
    val df = (mk(12, 0, "aaa aaa aaa aaa", "aa") ++
      mk(12, 100, "bbb bbb bbb bbb", "bb") ++
      mk(12, 200, "ccc ccc ccc ccc", "cc")).toDF("id", "text", "lang")
    val out = TextAnalysis.langIdPerceptron(df, "id", "text", "lang",
        gramLen = 3, buckets = 32, iters = 6)
      .orderBy($"id", $"cls")
      .as[(Long, String, Long, Int)].collect().toSeq
    assert(out.length === 36 * 3)
    // exactly one argmax row per doc, and it names the true class
    val preds = out.filter(_._4 == 1)
    assert(preds.length === 36)
    val truth = df.as[(Long, String, String)].collect().map(t => t._1 -> t._3).toMap
    preds.foreach { case (id, cls, _, _) =>
      assert(cls === truth(id), s"doc $id predicted $cls")
    }
    // the argmax rule re-derived from the margin matrix: max margin,
    // ties to the smaller class
    out.groupBy(_._1).foreach { case (_, rows) =>
      val want = rows.minBy { case (_, cls, m, _) => (-m, cls) }
      rows.foreach { case r =>
        assert((r._4 == 1) === (r == want), s"argmax flag wrong on $r")
      }
    }
    // batch updates are order-independent integer sums
    val out7 = TextAnalysis.langIdPerceptron(df.repartition(7), "id", "text",
        "lang", gramLen = 3, buckets = 32, iters = 6)
      .orderBy($"id", $"cls").as[(Long, String, Long, Int)].collect().toSeq
    assert(out === out7)
    // a NULL-label doc joins no class but is still scored: y = -1
    // for every class, C rows out, and the class list excludes null
    val withNull = df.unionAll(Seq((999L, "aaa aaa", null: String))
      .toDF("id", "text", "lang"))
    val scored = TextAnalysis.langIdPerceptron(withNull, "id", "text", "lang",
        gramLen = 3, buckets = 32, iters = 2)
    assert(scored.select($"cls").distinct().count() === 3)
    assert(scored.filter($"id" === 999L).count() === 3)
  }

  test("charGramBuckets kernel is bit-identical to the substring + " +
       "md5-fold SQL chain, including multi-byte scripts") {
    val df = Seq("the quick brown fox", "héllo wörld", "世界中のデータ処理",
      "mix 中文 and ascii", "ab", "", "   ").toDF("t")
    val kernel = df.select($"t",
      org.apache.spark.sql.graftext.ArrayOps.charGramBuckets($"t", 3, 64L).as("k"))
    val hof = kernel.withColumn("h",
      when(length($"t") >= 3,
        transform(sequence(lit(1), length($"t") - 2), i =>
          conv(substring(md5($"t".substr(i, lit(3))), 1, 15), 16, 10)
            .cast("long") % 64))
        .otherwise(array().cast("array<long>")))
    val rows = hof.select($"t", $"k", $"h")
      .as[(String, Seq[Long], Seq[Long])].collect()
    rows.foreach { case (t, k, h) =>
      assert(k === h, s"kernel != SQL chain on '$t'")
    }
    // under-n strings yield no grams
    assert(rows.find(_._1 == "ab").get._2.isEmpty)
    assert(rows.find(_._1 == "").get._2.isEmpty)
  }

  test("htmlToText: tags with attributes, entity order, the quoted-'>' limitation") {
    val df = Seq(
      (1L, "<html><body><p class=\"x\">a &amp; b</p><br/>c</body></html>"),
      // &amp;lt; must decode to the literal text "&lt;", NOT "<"
      (2L, "x &amp;lt; y &lt; z &#39;q&#39; &nbsp;end"),
      // documented regex limitation: '>' inside a quoted attribute
      // truncates the tag match, leaving the attribute tail as text
      (3L, "<a title=\"a>b\">link</a>"),
      (4L, "no markup at all")).toDF("id", "html")
    val got = TextAnalysis.htmlToText(df, "id", "html")
      .orderBy($"id").as[(Long, Long, String)].collect()
    assert(got(0) === ((1L, 7L, "a & b" + "c")))
    assert(got(1) === ((2L, 0L, "x &lt; y < z 'q'  end")))
    assert(got(2) === ((3L, 2L, "b\">link")))
    assert(got(3) === ((4L, 0L, "no markup at all")))
  }

  test("canonicalizeUrl: rule branches on hand URLs") {
    val cases = Seq(
      // default port + case + tracking + fragment + sort
      "HTTP://A.Com:80/P?utm_source=x&b=1&a=2#f" -> "http://a.com/P?a=2&b=1",
      // https 443 stripped; http 443 NOT stripped (non-default)
      "https://h:443/x" -> "https://h/x",
      "http://h:443/x" -> "http://h:443/x",
      // empty path -> "/"; all-tracking query drops entirely
      "https://h?utm_campaign=c&gclid=1&fbclid=2" -> "https://h/",
      // non-URL passthrough, including scheme-less host
      "example.com/path" -> "example.com/path",
      "plain text" -> "plain text",
      // query with empty params ("a=1&&b=2") drops the empties
      "http://h/p?b=2&&a=1" -> "http://h/p?a=1&b=2")
    val got = cases.map(_._1).toDF("url")
      .select(TextAnalysis.canonicalizeUrl($"url")).as[String].collect().toSeq
    assert(got === cases.map(_._2), s"got $got")
  }

  test("c4LineClean: rule branches, empty lines, and the 3-line page drop " +
    "on hand-built pages") {
    val df = Seq(
      (1L, "one two three four five.\nshort one.\nno terminal punct here at all\n" +
        "uses JavaScript so it dies despite six words.\nGood line with enough words!\n" +
        "Quoted line of five words\"\nAnother fine retained line here?"),
      (2L, "only one good line in this page."),
      (3L, ""),
      (4L, "a.\n\n\nb.")
    ).toDF("id", "text")
    val out = TextAnalysis.c4LineClean(df, "id", "text")
      .orderBy($"id").as[(Long, Int, Int, Boolean, String)].collect().toSeq
    // page 1: 7 lines; retained = line 1 (5 words + '.'), 'Good line...' (5 words + '!'),
    // 'Quoted...' (5 words + '"'), 'Another...' (5 words + '?') — 'short one.' (2 words),
    // the punctless line, and the javascript line all drop
    assert(out(0) === (1L, 7, 4, true,
      "one two three four five.\nGood line with enough words!\n" +
      "Quoted line of five words\"\nAnother fine retained line here?"))
    assert(out(1) === (2L, 1, 1, false, "only one good line in this page."))
    assert(out(2) === (3L, 0, 0, false, ""))   // empty text: zero lines
    assert(out(3) === (4L, 2, 0, false, ""))   // blank lines dropped before counting
  }

  test("exciseCommonLines: cross-doc frequent lines cut everywhere; " +
    "within-doc repeats and unique lines survive; empty docs survive") {
    val df = Seq(
      (1L, "cookie banner\nreal content one\ncookie banner"),
      (2L, "cookie banner\nreal content two"),
      (3L, "echo\necho\nonly here"), // repeats within ONE doc: not boilerplate
      (4L, "")
    ).toDF("id", "text")
    val out = TextAnalysis.exciseCommonLines(df, "id", "text", minDocs = 2)
      .orderBy($"id").as[(Long, Long, Long, String)].collect().toSeq
    // 'cookie banner' is in docs 1 and 2 -> cut from both (both
    // occurrences in doc 1); 'echo' repeats only inside doc 3 -> kept
    assert(out(0) === (1L, 3L, 2L, "real content one"))
    assert(out(1) === (2L, 2L, 1L, "real content two"))
    assert(out(2) === (3L, 3L, 0L, "echo\necho\nonly here"))
    assert(out(3) === (4L, 0L, 0L, ""))
    // raising minDocs past the frequency keeps everything
    val loose = TextAnalysis.exciseCommonLines(df, "id", "text", minDocs = 3)
      .orderBy($"id").as[(Long, Long, Long, String)].collect().toSeq
    assert(loose(0)._4 === "cookie banner\nreal content one\ncookie banner")
  }

  test("lineRepetition: duplicate-line and duplicate-char fractions by hand") {
    val df = Seq(
      (1L, "aaa\nbb\naaa\nbb\naaa"), // 5 lines, 2 distinct: 3 dup; chars 13, distinct 5
      (2L, "x\ny\nz"),               // no repeats
      (3L, "")                       // no lines
    ).toDF("id", "text")
    val out = TextAnalysis.lineRepetition(df, "id", "text")
      .orderBy($"id")
      .as[(Long, Long, Long, Double, Long, Long, Double)].collect().toSeq
    assert(out(0) === (1L, 5L, 3L, 3.0 / 5.0, 13L, 8L, 8.0 / 13.0))
    assert(out(1) === (2L, 3L, 0L, 0.0, 3L, 0L, 0.0))
    assert(out(2) === (3L, 0L, 0L, 0.0, 0L, 0L, 0.0))
  }

  test("keepBest: per-cluster score argmax, ties by min id, NaN loses to any real") {
    val labeled = Seq(
      (1L, 1L, 5.0), (2L, 1L, 9.0), (3L, 1L, 9.0), // tie at 9.0 -> min id 2
      (10L, 10L, Double.NaN),                       // singleton, NaN still keeps
      (20L, 20L, Double.NaN), (21L, 20L, 1.0),      // NaN loses to the real score
      (30L, 30L, Double.NaN), (31L, 30L, Double.NaN) // all-NaN -> min id
    ).toDF("id", "component", "score")
    // the join puts the cluster key first — select back to input order
    val keep = Dedup.keepBest(labeled, "id", "component", "score")
      .select("id", "component", "score", "keep")
      .as[(Long, Long, Double, Boolean)].collect()
      .filter(_._4).map(_._1).toSet
    assert(keep === Set(2L, 10L, 21L, 30L))
  }

  test("keepBest: a NULL score loses to any scored row; all-null clusters fall back to min id") {
    val labeled = Seq(
      (1L, 1L, Some(0.5)), (2L, 1L, None),   // null must NOT steal the cluster
      (10L, 10L, None), (11L, 10L, None),    // all-null -> min id 10
      (20L, 20L, None)                       // null singleton still keeps
    ).toDF("id", "component", "score")
    val keep = Dedup.keepBest(labeled, "id", "component", "score")
      .select("id", "keep").as[(Long, Boolean)].collect()
      .filter(_._2).map(_._1).toSet
    assert(keep === Set(1L, 10L, 20L))
  }

  test("dedupCorpusKeepBest: self-concat clones win their cluster by token count") {
    val d = docs.select(col("doc_id"), col("text")).limit(50)
    val doubled = d.unionAll(d.select((col("doc_id") + 1000000).as("doc_id"),
      concat(col("text"), lit(" "), col("text")).as("text")))
    val out = Dedup.dedupCorpusKeepBest(doubled, "doc_id", "text", threshold = 0.999,
        size(split(col("text"), " ")).cast("long"))
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out.length === 100)
    // identical word set -> same cluster; the doubled clone has 2x the
    // tokens, so every keeper is a clone and every original is dropped
    val keepers = out.filter(_._4).map(_._1)
    assert(keepers.forall(_ >= 1000000L), s"original kept: ${keepers.mkString(",")}")
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.count(_._4) === 1, "exactly one keeper per cluster")
    }
    // clone score is exactly double its original's (plus the joiner space)
    val score = out.map(r => r._1 -> r._3).toMap
    score.keys.filter(_ < 1000000L).foreach { id =>
      assert(score(id + 1000000L) === 2 * score(id))
    }
  }

  test("cosineNearDup LSH path: subset of exact pairs, same cosines, recall bound") {
    val v = embs.select(col("vec_id").as("id"), col("embedding").as("vec"),
      col("label").as("block"))
    val exact = Similarity.cosineNearDup(v, threshold = 0.3)
      .select("i", "j", "cos").as[(Long, Long, Double)].collect()
      .map { case (i, j, c) => (i, j) -> c }.toMap
    val lsh = Similarity.cosineNearDup(v, threshold = 0.3, blockBudget = 0,
        planes = 6, tables = 20)
      .select("i", "j", "cos").as[(Long, Long, Double)].collect()
    // every LSH pair is a true pair with the identical exact cosine
    lsh.foreach { case (i, j, c) =>
      assert(exact.contains((i, j)), s"LSH emitted non-pair ($i,$j)")
      assert(exact((i, j)) === c, s"cosine mismatch for ($i,$j)")
    }
    // and the bucketed candidate generation keeps useful recall
    if (exact.nonEmpty) {
      val recall = lsh.length.toDouble / exact.size
      assert(recall >= 0.4, s"LSH near-dup recall $recall too low")
    }
    // auto-scaled width (planes = 0 default, blocks all hot): same
    // subset-of-exact-pairs / identical-cosine contract; recall is
    // config-dependent at this low threshold so only the correctness
    // contract is asserted here
    val auto = Similarity.cosineNearDup(v, threshold = 0.3, blockBudget = 0)
      .select("i", "j", "cos").as[(Long, Long, Double)].collect()
    auto.foreach { case (i, j, c) =>
      assert(exact.contains((i, j)), s"auto-width emitted non-pair ($i,$j)")
      assert(exact((i, j)) === c, s"cosine mismatch for ($i,$j)")
    }
  }

  test("IVF ANN recall vs brute force >= 0.5 with exact cosines") {
    val q = embs.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("vec"))
    val c = embs.select(col("vec_id").as("cid"), col("embedding").as("vec"))
    val exact = Similarity.bruteForceTopK(q, c, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(q, c, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
  }

  test("country code normalization (reference clean_country step)") {
    val d = Seq("FRA", "gbr", " DEU ", "XXX", "USA").toDF("iso3")
    val out = d.select(graft.sources.CountryCodes.alpha3To2(col("iso3"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(out.toSeq === Seq("FR", "GB", "DE", null, "US"))
    // round trip
    val back = Seq("FR", "GB").toDF("iso2")
      .select(graft.sources.CountryCodes.alpha2To3Col(col("iso2"))).collect()
      .map(_.getString(0))
    assert(back.toSeq === Seq("FRA", "GBR"))
  }

  test("language profiles fire on real sentences") {
    val d = Seq(
      (1L, "the cat is on the mat and it is happy"),
      (2L, "el gato es de la casa y es que los perros"),
      (3L, "der hund ist nicht mit der katze und das ist gut"),
      (4L, "le chien est dans la maison et est avec les chats")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langIdFeatures(d, "doc_id", "text")
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(out(1L) === "en"); assert(out(2L) === "es")
    assert(out(3L) === "de"); assert(out(4L) === "fr")
  }

  test("quality score is bounded and monotone in stopword ratio") {
    val feats = TextAnalysis.qualityFeatures(docs, "doc_id", "text").collect()
    feats.foreach { r =>
      val s = r.getAs[Double]("quality_score")
      assert(s >= 0.0 && s <= 1.0, s"score $s out of range")
    }
  }

  test("fingerprint is deterministic and shift-invariant for contained grams") {
    val d = Seq((1L, "abcdefghijklmnop"), (2L, "XXabcdefghijklmnop")).toDF("doc_id", "text")
    val fps = d.select(col("doc_id"), TextAnalysis.fingerprint(col("text"), 8).as("fp"))
      .as[(Long, String)].collect().toMap
    // doc2 contains every 8-gram of doc1 plus two more: its min can
    // only be <= doc1's min
    assert(fps(2L) <= fps(1L))
  }

  test("dupSpans: corpus-duplicated k-windows merge into maximal covered ranges") {
    val docs = Seq(
      (1L, "a b c d e f"),          // shares [a b c],[b c d] w/ doc 2 AND [d e f] w/ docs 5,6
      (2L, "x a b c d y"),
      (3L, "a b c a b c a b c"),    // within-doc repetition: one full-cover span
      (4L, "q r s t u v"),          // unique: no spans
      (5L, "a b c z1 z2 z3 z4 d e f"), // two separated shared regions
      (6L, "a b c y1 y2 y3 y4 d e f")
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpans(docs, "doc_id", "text", k = 3)
      .orderBy($"id", $"span_id")
      .select($"id", $"span_id", $"start_tok", $"end_tok", $"n_windows")
      .as[(Long, Long, Int, Int, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 1, 6, 3L),  // windows at pos 1,2,4 chain (4 <= prev_end+1) into 1..6
      (2L, 1L, 2, 5, 2L),
      (3L, 1L, 1, 9, 7L),  // every window duplicated -> whole doc
      (5L, 1L, 1, 3, 1L), (5L, 2L, 8, 10, 1L),
      (6L, 1L, 1, 3, 1L), (6L, 2L, 8, 10, 1L)))
    // partitioning-invariant (shuffle-heavy plan, exact integer output)
    assert(Dedup.dupSpans(docs.repartition(5), "doc_id", "text", k = 3)
      .orderBy($"id", $"span_id")
      .select($"id", $"span_id", $"start_tok", $"end_tok", $"n_windows")
      .as[(Long, Long, Int, Int, Long)].collect().toSeq == out)
    // docs shorter than k words contribute no windows and no spans
    assert(Dedup.dupSpans(Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text"),
      "doc_id", "text", k = 3).count() == 0L)
    // the hashed-gram freight lever computes identical spans (no
    // 64-bit collision at this scale, by overwhelming odds)
    assert(Dedup.dupSpans(docs, "doc_id", "text", k = 3, hashGrams = true)
      .orderBy($"id", $"span_id")
      .select($"id", $"span_id", $"start_tok", $"end_tok", $"n_windows")
      .as[(Long, Long, Int, Int, Long)].collect().toSeq == out)
  }

  test("UnicodeNormalize composes, decomposes, handles compatibility forms " +
    "and survives codegen") {
    import org.apache.spark.sql.graftext.TextNorm
    val d = Seq(
      (1L, "plain ascii"),
      (2L, "e\u0301clair"),          // decomposed -> NFC composes to é
      (3L, "\u00e9clair"),           // precomposed: NFC identity
      (4L, "\ufb01le"),              // fi ligature: NFKC folds, NFC keeps
      (5L, null.asInstanceOf[String])
    ).toDF("id", "t")
    val out = d.select($"id", TextNorm.normalize($"t").as("nfc"),
        TextNorm.normalize($"t", "NFKC").as("nfkc"),
        TextNorm.normalize($"t", "NFD").as("nfd"))
      .orderBy($"id").collect()
    assert(out(0).getString(1) == "plain ascii")
    assert(out(1).getString(1) == "\u00e9clair" && out(1).getString(1).length == 6)
    assert(out(2).getString(1) == "\u00e9clair")
    assert(out(2).getString(3) == "e\u0301clair") // NFD decomposes back
    assert(out(3).getString(1) == "\ufb01le" && out(3).getString(2) == "file")
    assert(out(4).isNullAt(1)) // null in, null out
    // interpreted == codegen (eval path exercised via a filter that
    // blocks codegen-only execution is overkill: compare both modes)
    val expr = org.apache.spark.sql.graftext.UnicodeNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        org.apache.spark.unsafe.types.UTF8String.fromString("e\u0301x"),
        org.apache.spark.sql.types.StringType), "NFC")
    assert(expr.eval(null).toString == "\u00e9x")
    intercept[IllegalArgumentException] {
      TextNorm.normalize($"t", "NOPE"); d.select(TextNorm.normalize($"t", "NOPE")).collect()
    }
  }

  test("adaptiveTopK: full-corpus shortlist reproduces brute force exactly; " +
    "truncated shortlist keeps exact scores and high recall") {
    val q = embs.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("vec"))
    val c = embs.select($"vec_id".as("cid"), $"embedding".as("vec"))
    val n = c.count().toInt
    val exact = Similarity.bruteForceTopK(q, c, 5).collect().map(_.toSeq).toSet
    // shortlist = corpus: stage 2 sees every candidate -> identical
    // ranking AND identical full-dim cosines
    assert(Similarity.adaptiveTopK(q, c, 5, dims = 16, shortlist = n)
      .collect().map(_.toSeq).toSet == exact)
    // 16-of-64-dim shortlist of 20 on the random fixture: scores of
    // agreeing pairs are the EXACT full-dim cosines (rescoring stage)
    val adaptive = Similarity.adaptiveTopK(q, c, 5, dims = 16, shortlist = 20)
      .collect().map(_.toSeq).toSet
    val exactCos = exact.map(r => (r(0), r(1)) -> r(3)).toMap
    assert(adaptive.filter(r => exactCos.contains((r(0), r(1))))
      .forall(r => r(3) == exactCos((r(0), r(1)))),
      "rescored cosines must equal full-dim exact cosines")
    // The recall PROPERTY needs matryoshka-structured vectors (info
    // front-loaded in the prefix dims) — on the fixture's isotropic
    // random embeddings truncation recall collapses (~0.22, honest:
    // random vectors have no low-dim structure). Structured corpus:
    // first 16 dims carry the cluster id, the rest is noise.
    val rng = new scala.util.Random(7)
    val structured = (0 until 200).map { i =>
      val cluster = i % 10
      val head = Array.tabulate(16)(d =>
        (if (d == cluster) 1.0f else 0.0f) + rng.nextFloat() * 0.1f)
      val tail = Array.fill(48)(rng.nextFloat() * 0.3f)
      (i.toLong, head ++ tail)
    }.toDF("id", "vec")
    val sq = structured.filter($"id" < 10).select($"id".as("qid"), $"vec")
    val sc = structured.select($"id".as("cid"), $"vec")
    val sExact = Similarity.bruteForceTopK(sq, sc, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val sAd = Similarity.adaptiveTopK(sq, sc, 5, dims = 16, shortlist = 20)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = sExact.intersect(sAd).size.toDouble / sExact.size
    assert(recall >= 0.9, s"structured-corpus adaptive recall $recall too low")
  }

  test("rpTopK: full-corpus shortlist reproduces brute force exactly; " +
    "JL projection beats truncation on the tail-signal corpus") {
    val q = embs.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("vec"))
    val c = embs.select($"vec_id".as("cid"), $"embedding".as("vec"))
    val n = c.count().toInt
    val exact = Similarity.bruteForceTopK(q, c, 5).collect().map(_.toSeq).toSet
    // shortlist = corpus: stage 2 rescoring sees every candidate ->
    // identical ranking and identical exact cosines
    assert(Similarity.rpTopK(q, c, 5, projDims = 16, shortlist = n)
      .collect().map(_.toSeq).toSet == exact)
    // JL sees signal WHEREVER it lives: cluster signal in the TAIL
    // dims (16..63), pure noise in the head — truncation to the
    // first 16 dims sketches only noise (recall ~= chance), while
    // the sign projection mixes every dim and keeps the cluster
    // geometry. (On a corpus with NO distance structure at all —
    // isotropic random, cosines all ~0.75 — a 16-dim sketch of
    // either kind cannot resolve the tiny margins; measured ~0.2
    // both. JL's edge is indifference to WHERE structure sits, not
    // resolution beyond the JL distortion bound.)
    val rng = new scala.util.Random(11)
    val tailStructured = (0 until 200).map { i =>
      val cluster = i % 10
      val head = Array.fill(16)(rng.nextFloat() * 0.3f)
      val tail = Array.tabulate(48)(d =>
        (if (d % 10 == cluster) 1.0f else 0.0f) + rng.nextFloat() * 0.1f)
      (i.toLong, head ++ tail)
    }.toDF("id", "vec")
    val sq = tailStructured.filter($"id" < 10).select($"id".as("qid"), $"vec")
    val sc = tailStructured.select($"id".as("cid"), $"vec")
    val sExact = Similarity.bruteForceTopK(sq, sc, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val rp = Similarity.rpTopK(sq, sc, 5, projDims = 16, shortlist = 20)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val rpRecall = sExact.intersect(rp).size.toDouble / sExact.size
    val tr = Similarity.adaptiveTopK(sq, sc, 5, dims = 16, shortlist = 20)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val trRecall = sExact.intersect(tr).size.toDouble / sExact.size
    assert(rpRecall >= 0.7, s"projected recall $rpRecall too low")
    assert(rpRecall > trRecall + 0.2,
      s"JL projection ($rpRecall) must clearly beat truncation ($trRecall) " +
        "on the tail-signal corpus")
    // rescored cosines of agreeing pairs are the exact full-dim values
    val exactCos = exact.map(r => (r.head, r(1)) -> r(3)).toMap
    val rpFull = Similarity.rpTopK(q, c, 5, projDims = 16, shortlist = 20)
      .collect().map(_.toSeq)
    assert(rpFull.filter(r => exactCos.contains((r.head, r(1))))
      .forall(r => r(3) == exactCos((r.head, r(1)))),
      "rescored cosines must equal full-dim exact cosines")
  }

  test("sq8TopK: quantization error bounded by one code step, high overlap " +
    "with exact retrieval, constant dims exact") {
    val q = embs.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("vec"))
    val c = embs.select($"vec_id".as("cid"), $"embedding".as("vec"))
    val exact = Similarity.bruteForceTopK(q, c, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val sq = Similarity.sq8TopK(q, c, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val overlap = exact.intersect(sq).size.toDouble / exact.size
    assert(overlap >= 0.5, s"sq8 overlap $overlap vs exact too low")
    // per-dim reconstruction error < (hi-lo)/255 by construction:
    // check the worst dim explicitly
    import org.apache.spark.sql.functions.{posexplode, max => smax, min => smin, abs => sabs}
    val dims = c.select($"cid", posexplode($"vec"))
      .select($"pos".as("d"), $"col".cast("double").as("x"))
    val stats = dims.groupBy($"d").agg(smin($"x").as("lo"), smax($"x").as("hi"))
    val step = stats.select(smax(($"hi" - $"lo") / 255.0)).as[Double].collect()(0)
    val maxErr = dims.join(broadcast(stats), "d")
      .filter($"hi" =!= $"lo")
      .select(sabs($"x" - ($"lo" +
        floor(($"x" - $"lo") / ($"hi" - $"lo") * 255.0) / 255.0 * ($"hi" - $"lo")))
        .as("err"))
      .agg(smax($"err")).as[Double].collect()(0)
    assert(maxErr <= step + 1e-12, s"reconstruction error $maxErr > step $step")
    // a constant dimension (hi == lo) dequantizes exactly
    val const = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(1.0f, 3.0f)),
      (3L, Array(1.0f, 2.5f))).toDF("cid", "vec")
    val cq = Seq((10L, Array(1.0f, 2.0f))).toDF("qid", "vec")
    assert(Similarity.sq8TopK(cq, const, 1).select($"cid").as[Long].collect()(0) == 1L)
  }

  test("pqTopK: bit-exact parity with an independent PQ model; codes in " +
    "range; corpus == codebook reconstructs exactly") {
    val q = embs.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("vec"))
    val c = embs.select($"vec_id".as("cid"), $"embedding".as("vec"))
    val out = Similarity.pqTopK(q, c, 5, m = 8, ks = 16)
      .orderBy($"qid", $"rank")
      .as[(Long, Long, Int, Double)].collect().toSeq
    // independent plain-Scala PQ model: same hash pick, same argmin
    // tie rule, same left folds
    val rows = embs.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
    val picked = rows.sortBy { case (id, _) =>
      (((id % 1000000007L) * 2654435761L) % 4294967296L, id) }.take(16)
    val cw = Array.tabulate(8)(s => picked.map(_._2.slice(s * 8, s * 8 + 8).map(_.toDouble)))
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.foldLeft(0.0)(_ + _)
    def encode(v: Array[Float]): Array[Int] = Array.tabulate(8) { s =>
      val d = cw(s).map(l2(v.slice(s * 8, s * 8 + 8).map(_.toDouble), _))
      d.indexOf(d.min)
    }
    val codesOf = rows.map { case (id, v) => id -> encode(v) }.toMap
    // ADC grouping: per-subspace left folds, then a left fold over s
    def adc(qd: Array[Double], codes: Array[Int]): Double =
      codes.zipWithIndex.map { case (code, s) =>
        l2(qd.slice(s * 8, s * 8 + 8), cw(s)(code)) }.reduce(_ + _)
    val expected = rows.filter(_._1 % 50 == 0).toSeq.sortBy(_._1).flatMap {
      case (qid, qv) =>
        val qd = qv.map(_.toDouble)
        rows.filter(_._1 != qid)
          .map { case (cid, _) => (cid, adc(qd, codesOf(cid))) }
          .sortBy { case (cid, d) => (d, cid) }.take(5).zipWithIndex
          .map { case ((cid, d), i) => (qid, cid, i + 1, d) }
    }
    assert(out == expected) // ranks AND double bits
    // the stored representation: m codes in [0, ks)
    val codes = Similarity.pqEncode(c, Similarity.pqCodebook(c, 8, 16))
      .as[(Long, Array[Int])].collect()
    assert(codes.length == rows.length &&
      codes.forall(_._2.length == 8) &&
      codes.forall(_._2.forall(x => x >= 0 && x < 16)))
    // corpus of exactly ks rows: every row is a codeword, so each
    // vector encodes to a zero-distance codeword and reconstructs
    // exactly -> adist == exact squared L2 (in the ADC grouping)
    val c16ids = rows.sortBy(_._1).take(16)
    val c16 = c16ids.toSeq.toDF("cid", "vec")
    val q1 = Seq((c16ids.head._1, c16ids.head._2)).toDF("qid", "vec")
    val got = Similarity.pqTopK(q1, c16, 3, m = 8, ks = 16)
      .orderBy($"rank").as[(Long, Long, Int, Double)].collect().toSeq
    val qd = c16ids.head._2.map(_.toDouble)
    val exp16 = c16ids.tail
      .map { case (cid, v) =>
        (cid, Array.tabulate(8)(s =>
          l2(qd.slice(s * 8, s * 8 + 8),
            v.map(_.toDouble).slice(s * 8, s * 8 + 8))).reduce(_ + _)) }.toSeq
      .sortBy { case (cid, d) => (d, cid) }.take(3).zipWithIndex
      .map { case ((cid, d), i) => (c16ids.head._1, cid, i + 1, d) }
    assert(got == exp16)
  }

  test("semanticScreen: bit-exact nearest-bench report, deterministic " +
    "ties, planted duplicate flags") {
    val corpus = embs.filter($"vec_id" % 10 =!= 0)
      .select($"vec_id".as("cid"), $"embedding".as("vec"))
    val bench = embs.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("bid"), $"embedding".as("vec"))
    val out = Similarity.semanticScreen(corpus, bench, 0.8)
      .orderBy($"cid").as[(Long, Long, Double, Boolean)].collect().toSeq
    // brute model with the same fold order
    val rows = embs.select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.foldLeft(0.0)(_ + _)
    val bm = rows.filter(_._1 % 10 == 0)
    val expected = rows.filter(_._1 % 10 != 0).toSeq.sortBy(_._1).map { case (cid, cv) =>
      val (bid, cos) = bm
        .map { case (bid, bv) => (bid, dot(cv, bv) / (math.sqrt(dot(cv, cv)) * math.sqrt(dot(bv, bv)))) }
        .minBy { case (bid, cos) => (-cos, bid) }
      (cid, bid, cos, cos >= 0.8)
    }
    assert(out == expected)
    assert(out.forall(!_._4), "isotropic fixture must screen all-clear")
    // planted near-identical doc -> flagged; identical bench twins ->
    // smallest bid wins
    val v = rows.head._2
    val c2 = Seq((1000L, v), (1001L, rows(1)._2)).toDF("cid", "vec")
    val b2 = Seq((7L, v), (3L, v)).toDF("bid", "vec")
    val got = Similarity.semanticScreen(c2, b2, 0.8)
      .orderBy($"cid").as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(got.head._2 == 3L && got.head._4, s"planted dup must flag with min bid: $got")
    assert(got(1)._2 == 3L, "tie on equal vectors resolves to smallest bid")
  }

  test("heavyHitters: exact counts with deterministic order, CMS envelope " +
    "holds, partition-invariant") {
    // lower() folds b/B: a=4 over 3 docs, c=4 over 2, b=3 over 2
    val d = Seq((1L, "a a b c"), (2L, "a b B"), (3L, "c c c a")).toDF("doc_id", "text")
    val out = TextAnalysis.heavyHitters(d, "doc_id", "text", k = 3)
      .as[(String, Long, Long, Boolean, Boolean)].collect().toSeq
    assert(out == Seq(("a", 4L, 3L, true, true), ("c", 4L, 2L, true, true),
      ("b", 3L, 2L, true, true)))
    // sketch merge is counterwise addition: parallelism-invariant
    assert(TextAnalysis.heavyHitters(d.repartition(7), "doc_id", "text", k = 3)
      .as[(String, Long, Long, Boolean, Boolean)].collect().toSeq == out)
    // corpus fixture: full k, every envelope check green
    val full = TextAnalysis.heavyHitters(docs, "doc_id", "text")
      .as[(String, Long, Long, Boolean, Boolean)].collect()
    assert(full.length == 20 && full.forall(r => r._4 && r._5))
  }

  test("cooccur: hand-computed skip-gram counts, symmetric pair table, " +
    "PMI closed form, partition-invariant") {
    // "a b c a", window 2: centers emit (a,b)x2 (a,c)x2 (b,a)x2
    // (b,c)x1 (c,a)x2 (c,b)x1; unigram mass a=4 b=3 c=3; n=10
    val d = Seq((1L, "a b C a")).toDF("doc_id", "text")
    val out = TextAnalysis.cooccur(d, "doc_id", "text", window = 2, minCount = 1)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("a", "b", 2L, 4L, 3L, 10L), ("a", "c", 2L, 4L, 3L, 10L),
      ("b", "a", 2L, 3L, 4L, 10L), ("c", "a", 2L, 3L, 4L, 10L),
      ("b", "c", 1L, 3L, 3L, 10L), ("c", "b", 1L, 3L, 3L, 10L)))
    // PMI closed form on the first row: ln(2*10 / (4*3))
    val pmi = TextAnalysis.cooccur(d, "doc_id", "text", window = 2, minCount = 1)
      .select(TextAnalysis.pmiOf($"n_wc", $"n_w", $"n_c", $"n").as("pmi"))
      .as[Double].collect()
    assert(math.abs(pmi(0) - math.log(20.0 / 12.0)) < 1e-12)
    // the symmetric window makes the pair table symmetric: on the
    // corpus fixture every (w,c) count equals its (c,w) mirror
    val full = TextAnalysis.cooccur(docs, "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(full.nonEmpty && full.forall { case ((w, c), n) =>
      !full.contains((c, w)) || full((c, w)) == n })
    // map-side pair generation: parallelism-invariant
    assert(TextAnalysis.cooccur(docs.repartition(13), "doc_id", "text")
      .collect().map(_.toSeq).toSeq ==
      TextAnalysis.cooccur(docs, "doc_id", "text").collect().map(_.toSeq).toSeq)
  }

  test("contaminationSpans + exciseContamination cut exactly the " +
    "bench-overlapping ranges") {
    val corpus = Seq(
      (1L, "p q the quick brown fox r s"), // bench 3-grams overlap mid-doc
      (2L, "no overlap here at all"),
      (3L, "the quick brown")              // fully covered
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "x the quick brown fox y")).toDF("doc_id", "text")
    val spans = Dedup.contaminationSpans(corpus, bench, "doc_id", "text", k = 3)
      .select($"id", $"span_id", $"start_tok", $"end_tok", $"n_windows")
      .as[(Long, Long, Int, Int, Long)].collect().toSet
    // doc1: bench 3-windows {x the quick, the quick brown, quick brown fox,
    // brown fox y}; doc1 windows at pos 3 ("the quick brown") and 4
    // ("quick brown fox") hit -> covered tokens 3..6
    assert(spans == Set((1L, 1L, 3, 6, 2L), (3L, 1L, 1, 3, 1L)))
    val cleaned = Dedup.exciseContamination(corpus, bench, "doc_id", "text", k = 3)
      .orderBy($"id").select($"id", $"clean_text", $"n_tokens", $"n_removed")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(cleaned == Seq(
      (1L, "p q r s", 8L, 4L),
      (2L, "no overlap here at all", 5L, 0L),
      (3L, "", 3L, 3L)))
    // hashed grams: identical result
    assert(Dedup.contaminationSpans(corpus, bench, "doc_id", "text", k = 3,
      hashGrams = true)
      .select($"id", $"span_id", $"start_tok", $"end_tok", $"n_windows")
      .as[(Long, Long, Int, Int, Long)].collect().toSet == spans)
  }

  test("bm25: hand-computed Okapi scores, portable count signature, " +
    "no-match docs zero") {
    // corpus: d1 "x x y" (x:2, y:1, dl 3), d2 "x z" (x:1, dl 2),
    // d3 "w w" (no match, dl 2). Query {x, y}: N=3, avgdl=7/3,
    // df(x)=2, df(y)=1.
    val d = Seq((1L, "x x y"), (2L, "x z"), (3L, "w w")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(d, "doc_id", "text", Seq("x", "y"))
      .orderBy($"id").collect()
    val k1 = 1.2; val b = 0.75; val avgdl = 7.0 / 3
    def idf(df: Int) = math.log((3 - df + 0.5) / (df + 0.5) + 1.0)
    def w(tf: Int, dl: Int, df: Int) =
      idf(df) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert(out(0).getLong(1) == 2 && out(0).getLong(3) == 3)
    assert(math.abs(out(0).getDouble(4) - (w(2, 3, 2) + w(1, 3, 1))) < 1e-12)
    assert(math.abs(out(1).getDouble(4) - w(1, 2, 2)) < 1e-12)
    assert(out(2).getLong(1) == 0 && out(2).getDouble(4) == 0.0 && out(2).getLong(3) == 2)
    // signature folds each (term, tf, df) triple
    def md5mod(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 1000000000000L
    }
    assert(out(0).getLong(2) == md5mod("x:2:2") + md5mod("y:1:1"))
    assert(out(1).getLong(2) == md5mod("x:1:2"))
    // partitioning-invariant gated surface
    val re = TextAnalysis.bm25(d.repartition(5), "doc_id", "text", Seq("x", "y"))
      .orderBy($"id").drop("score").collect()
    assert(re.map(_.toSeq).toSeq == out.map(_.toSeq.dropRight(1)).toSeq)
  }

  test("gopherFlags: published thresholds, one rule failing at a time") {
    // 60 words, mean length in range, 2 stopwords, alphabetic -> passes
    val good = (Seq.fill(29)("alpha beta") ++ Seq("the with")).mkString(" ")
    val d = Seq(
      (1L, good),
      (2L, good.replace("the with", "gamma delta")),         // 1 stopword short
      (3L, "the with alpha beta"),                           // < 50 words
      (4L, (Seq.fill(29)("alpha ###########") :+ "the with").mkString(" ")), // symbols+nonalpha
      (5L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherFlags(d, "doc_id", "text")
      .orderBy($"id")
      .select($"id", $"n_words", $"mean_wlen", $"symbol_ratio", $"alpha_frac",
        $"n_stopwords", $"passes")
      .as[(Long, Long, Double, Double, Double, Long, Boolean)].collect()
    assert(out(0) == ((1L, 60L, (29 * 9 + 7).toDouble / 60, 0.0, 1.0, 2L, true)))
    assert(!out(1)._7 && out(1)._6 == 0)
    assert(!out(2)._7 && out(2)._2 == 4)
    // doc 4: 29 '#'-runs of 11 = 29 windows... symbol matches: each
    // "###########" word contributes 11 '#' matches; ratio 319/60 > 0.1;
    // alpha_frac 31/60 < 0.8 -> fails on both
    assert(!out(3)._7 && out(3)._3 > 0.1 && out(3)._5 < 0.8)
    assert(out(4) == ((5L, 0L, 0.0, 0.0, 0.0, 0L, false)))
  }

  test("exciseDupSpans cuts covered ranges, keeps unique remainders and " +
    "empty/fully-covered docs") {
    val docs = Seq(
      (1L, "a b c d e f"),             // fully covered (span 1..6) -> ""
      (2L, "x a b c d y"),             // span 2..5 -> "x y"
      (3L, "a b c a b c a b c"),       // fully covered
      (4L, "q r s t u v"),             // untouched
      (5L, "a b c z1 z2 z3 z4 d e f"), // spans 1..3, 8..10 -> middle survives
      (6L, "a b c y1 y2 y3 y4 d e f"),
      (7L, "")                         // token-less doc stays present
    ).toDF("doc_id", "text")
    val out = Dedup.exciseDupSpans(docs, "doc_id", "text", k = 3)
      .orderBy($"id").select($"id", $"clean_text", $"n_tokens", $"n_removed")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "", 6L, 6L),
      (2L, "x y", 6L, 4L),
      (3L, "", 9L, 9L),
      (4L, "q r s t u v", 6L, 0L),
      (5L, "z1 z2 z3 z4", 10L, 6L),
      (6L, "y1 y2 y3 y4", 10L, 6L),
      (7L, "", 0L, 0L)))
  }

  test("importanceWeights: hand-computed DSIR log-ratios, portable signature, " +
    "featureless docs zero") {
    // corpus: d1 "x x" (features x:2, x.x:1), d2 "y" (y:1), d3 "" (none);
    // target = d1. Buckets 3/159/96 for x/x.x/y — distinct (precomputed).
    // Tr=4, Tt=3, B=256:
    //   logw(d1) = 2*[ln(3/259)-ln(3/260)] + [ln(2/259)-ln(2/260)] = 3 ln(260/259)
    //   logw(d2) = ln(1/259) - ln(2/260) = ln(260/518)
    val corpus = Seq((1L, "x x"), (2L, "y"), (3L, "")).toDF("doc_id", "text")
    val target = Seq((1L, "x x")).toDF("doc_id", "text")
    val out = TextAnalysis.importanceWeights(corpus, target, "doc_id", "text")
      .orderBy($"id").collect()
    assert(out(0).getLong(1) == 3L && out(1).getLong(1) == 1L && out(2).getLong(1) == 0L)
    assert(math.abs(out(0).getDouble(3) - 3 * math.log(260.0 / 259.0)) < 1e-12)
    assert(math.abs(out(1).getDouble(3) - math.log(260.0 / 518.0)) < 1e-12)
    assert(out(2).getLong(2) == 0L && out(2).getDouble(3) == 0.0)
    // signature folds each (bucket, n, ct, cr) quadruple
    def md5mod(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 1000000000000L
    }
    def bucket(g: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 256L
    }
    val bx = bucket("x"); val bxx = bucket("x\u0001x"); val by = bucket("y")
    assert(out(0).getLong(2) == md5mod(s"$bx:2:2:2") + md5mod(s"$bxx:1:1:1"))
    assert(out(1).getLong(2) == md5mod(s"$by:1:0:1"))
    // the gated surface is partitioning-invariant
    val re = TextAnalysis.importanceWeights(
      corpus.repartition(7), target.repartition(3), "doc_id", "text")
      .orderBy($"id").drop("logw").collect()
    assert(re.map(_.toSeq).toSeq == out.map(_.toSeq.dropRight(1)).toSeq)
  }

  test("lmScore: add-1 bigram LM counts, portable signature, hand-computed nll") {
    // tokens: d1 [a,b,a], d2 [a,b,c], d3 [x], d4 [] ->
    // unigrams a:3 b:2 c:1 x:1 (V=4); bigrams a.b:2 b.a:1 b.c:1
    val d = Seq((1L, "A b a"), (2L, "a b c"), (3L, "x"), (4L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(d, "doc_id", "text").orderBy($"id").collect()
    def md5mod(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 1000000000000L
    }
    val sig1 = md5mod("a\u0001b:2:3") + md5mod("b\u0001a:1:2")
    val sig2 = md5mod("a\u0001b:2:3") + md5mod("b\u0001c:1:2")
    // p(b|a) = (2+1)/(3+4), p(a|b) = p(c|b) = (1+1)/(2+4)
    val nll = -(math.log(3.0 / 7.0) + math.log(2.0 / 6.0)) / 2
    assert(out(0).getLong(1) == 2 && out(0).getLong(2) == 1 && out(0).getLong(3) == 4)
    assert(out(1).getLong(1) == 2 && out(1).getLong(2) == 1)
    assert(out(0).getLong(4) == sig1 && out(1).getLong(4) == sig2)
    assert(math.abs(out(0).getDouble(5) - nll) < 1e-12)
    assert(math.abs(out(1).getDouble(5) - nll) < 1e-12)
    // short/empty docs: zero bigrams, zero signature, 0.0 nll, V kept
    assert(out(2).getLong(1) == 0 && out(2).getLong(4) == 0L &&
      out(2).getDouble(5) == 0.0 && out(2).getLong(3) == 4)
    assert(out(3).getLong(1) == 0)
    // the gated surface is exact integers: partitioning-invariant
    val re = TextAnalysis.lmScore(d.repartition(7), "doc_id", "text")
      .orderBy($"id").drop("nll").collect()
    assert(re.map(_.toSeq).toSeq == out.map(_.toSeq.dropRight(1)).toSeq)
  }

  test("invertedIndex: hand-built postings, shard split, tf counts") {
    val d = Seq((0L, "a b a"), (1L, "b c"), (2L, "a"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(d, "doc_id", "text", shards = 2)
      .orderBy($"token", $"shard").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.toSeq === Seq(
      ("a", 0L, 2L, 3L, "0:2,2:1"), // docs 0 and 2 share shard 0; doc order inside
      ("b", 0L, 1L, 1L, "0:1"),
      ("b", 1L, 1L, 1L, "1:1"),
      ("c", 1L, 1L, 1L, "1:1")))
    // partitioning-invariant (the gate hashes the serialized lists)
    val re = TextAnalysis.invertedIndex(d.repartition(7), "doc_id", "text", 2)
      .orderBy($"token", $"shard").collect().map(_.toSeq)
    assert(re.toSeq === out.map(t => Seq(t._1, t._2, t._3, t._4, t._5)).toSeq)
  }

  test("compressionRatio: repetitive text compresses far below high-entropy text") {
    val rep = "spam " * 400                       // 2000 bytes of period-5 repetition
    val rng = new scala.util.Random(7)
    val noise = Array.fill(2000)((33 + rng.nextInt(94)).toChar).mkString
    val d = Seq((1L, rep), (2L, noise), (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.compressionRatio(d, "doc_id", "text")
      .orderBy($"id").collect()
    val repRatio = out(0).getDouble(3)
    val noiseRatio = out(1).getDouble(3)
    assert(out(0).getLong(1) === 2000L && out(1).getLong(1) === 2000L)
    assert(repRatio < 0.05, s"repetition should collapse, got $repRatio")
    assert(noiseRatio > 0.7, s"printable noise barely compresses, got $noiseRatio")
    // empty: zero bytes, zero ratio by convention; null text stays null
    assert(out(2).getLong(1) === 0L && out(2).getDouble(3) === 0.0)
    assert(out(3).isNullAt(2))
    // deterministic within this JVM (thread-local deflater, reset per row)
    val re = TextAnalysis.compressionRatio(d.repartition(5), "doc_id", "text")
      .orderBy($"id").collect()
    assert(re.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }
}
