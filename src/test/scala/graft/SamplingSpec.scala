package graft

import org.apache.spark.sql.functions._

import graft.operators.{Sampling, Similarity}

/** Sampling (hash-gated + stratified), packing, and semantic dedup. */
class SamplingSpec extends SparkSuite {
  import spark.implicits._

  test("hashSample is deterministic, fraction-accurate and monotone in fraction") {
    val df = spark.range(0, 20000).toDF("id")
    val n20 = Sampling.hashSample(df, "id", 0.2).count()
    // md5 gates are uniform: binomial 3-sigma on 20k at 0.2 is ~±170
    assert(math.abs(n20 - 4000L) < 300, s"got $n20 of expected ~4000")
    // rerun identical (no RNG)
    assert(Sampling.hashSample(df, "id", 0.2).count() == n20)
    // a row kept at 0.2 is kept at any larger fraction (gate is a
    // fixed per-row number compared to a growing threshold)
    val s20 = Sampling.hashSample(df, "id", 0.2)
    val s50 = Sampling.hashSample(df, "id", 0.5)
    assert(s20.except(s50).isEmpty)
    assert(Sampling.hashSample(df, "id", 0.0).count() == 0)
    assert(Sampling.hashSample(df, "id", 1.0).count() == 20000)
  }

  test("weightedSample keeps rows in proportion to their weight, monotonically") {
    val df = spark.range(0, 30000)
      .select($"id", (($"id" % 3).cast("double") / 2.0).as("w")) // 0, 0.5, 1.0
    val out = Sampling.weightedSample(df, "id", "w")
    val byW = out.groupBy($"w").count().as[(Double, Long)].collect().toMap
    assert(!byW.contains(0.0))                      // weight 0 never kept
    assert(byW(1.0) == 10000L)                      // weight 1 always kept
    assert(math.abs(byW(0.5) - 5000L) < 400, s"w=0.5: ${byW(0.5)}")
    // raising weights only ADDS rows (same gate, higher threshold)
    val half = Sampling.weightedSample(
      df.withColumn("w", $"w" * 0.5), "id", "w").select("id")
    assert(half.except(out.select("id")).isEmpty)
    // clamping: out-of-range weights behave as 0/1, nulls drop
    val dirty = Seq((1L, Some(2.0)), (2L, Some(-1.0)), (3L, None: Option[Double]))
      .toDF("id", "w")
    val kept = Sampling.weightedSample(dirty, "id", "w")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("null ids and strata are sampled, not silently dropped") {
    val df = Seq(Some(1L), Some(2L), None, Some(4L)).toDF("id")
    assert(Sampling.hashSample(df, "id", 1.0).count() == 4)
    val st = Seq((1L, Some("a")), (2L, None: Option[String]), (3L, Some("b")))
      .toDF("id", "stratum")
    assert(Sampling.stratifiedSample(st, "id", "stratum",
      Map("a" -> 1.0), defaultFraction = 1.0).count() == 3)
  }

  test("stratifiedSample applies per-stratum fractions") {
    val df = spark.range(0, 30000)
      .select($"id", concat(lit("s"), ($"id" % 3).cast("string")).as("st"))
    val out = Sampling.stratifiedSample(df, "id", "st",
        Map("s0" -> 0.5, "s1" -> 0.1), defaultFraction = 0.9)
      .groupBy($"st").count().as[(String, Long)].collect().toMap
    assert(math.abs(out("s0") - 5000L) < 400, s"s0: ${out("s0")}")
    assert(math.abs(out("s1") - 1000L) < 300, s"s1: ${out("s1")}")
    assert(math.abs(out("s2") - 9000L) < 400, s"s2: ${out("s2")}")
  }

  test("splitAssign: disjoint and total, deterministic, first split grows " +
    "monotonically, trailing split pinned by the preceding weight sum") {
    import graft.operators.Sampling
    val df = spark.range(0, 5000).toDF("id")
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val a = Sampling.splitAssign(df, "id", splits)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    assert(a.size == 5000, "every id assigned exactly once")
    val counts = a.values.groupBy(identity).map { case (k, v) => k -> v.size }
    // 60-bit md5 draws: fractions land near the weights
    assert(math.abs(counts("train") - 4500) < 150, s"train ${counts("train")}")
    assert(math.abs(counts("val") - 250) < 80, s"val ${counts("val")}")
    assert(math.abs(counts("test") - 250) < 80, s"test ${counts("test")}")
    // deterministic rerun
    val b = Sampling.splitAssign(df.repartition(7), "id", splits)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    assert(b == a)
    // growing train (val shrinks, test untouched): train never loses
    // an id, test identical — the boundary-chain property
    val g = Sampling.splitAssign(df, "id",
        Seq("train" -> 0.92, "val" -> 0.03, "test" -> 0.05))
      .select($"id", $"split").as[(Long, String)].collect().toMap
    val trainA = a.filter(_._2 == "train").keySet
    val trainG = g.filter(_._2 == "train").keySet
    assert(trainA.subsetOf(trainG), "growing train must keep its members")
    assert(a.filter(_._2 == "test") == g.filter(_._2 == "test"),
      "trailing split must not move when earlier splits trade mass")
    // invalid weights fail loudly
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(df, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("oovStats: hand-computed coverage under a fixed vocabulary") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "a b a c"),   // vocab {a,b}: 1 OOV of 4
      (2L, "x y z"),     // all OOV
      (3L, "a a"),       // fully covered
      (4L, "")           // empty
    ).toDF("id", "text")
    val out = TextAnalysis.oovStats(df, "id", "text", Seq("a", "b"))
      .orderBy($"id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (1L, 4L, 1L, 0.25), (2L, 3L, 3L, 1.0), (3L, 2L, 0L, 0.0), (4L, 0L, 0L, 0.0)))
  }

  test("charDiversity: hand-computed Simpson surfaces, code-point semantics") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "aab"),          // {a:2, b:1}: n=3, distinct 2, sumSq 5
      (2L, "aaaa"),         // pure concentration: simpson 1.0
      (3L, ""),             // empty: all zeros
      (4L, "ab😀" // surrogate-pair emoji counts ONCE
        + "😀")   // {a:1, b:1, emoji:2}: n=4, distinct 3, sumSq 6
    ).toDF("id", "text")
    val out = TextAnalysis.charDiversity(df, "id", "text")
      .orderBy($"id").as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (1L, 3L, 2L, 5L, 5.0 / 9.0),
      (2L, 4L, 1L, 16L, 1.0),
      (3L, 0L, 0L, 0L, 0.0),
      (4L, 4L, 3L, 6L, 6.0 / 16.0)))
  }

  test("marginAuc: exact Mann-Whitney with tie handling, degenerate classes") {
    import graft.operators.TextAnalysis
    def auc(rows: Seq[(Long, Long)]): (Long, Long, Long, Double) =
      TextAnalysis.marginAuc(rows.toDF("y", "margin"), "y", "margin")
        .as[(Long, Long, Long, Double)].collect().head
    // pos {3,1}, neg {2,0}: ranks 1..4, R_pos = 2+4 = 6 -> AUC 0.75
    assert(auc(Seq((1L, 3L), (1L, 1L), (-1L, 2L), (-1L, 0L))) ==
      (2L, 2L, 12L, 0.75))
    // all scores tied: AUC exactly 0.5 (average ranks)
    assert(auc(Seq((1L, 7L), (1L, 7L), (-1L, 7L)))._4 == 0.5)
    // perfect separation -> 1.0; inverted -> 0.0
    assert(auc(Seq((1L, 10L), (1L, 9L), (-1L, 1L)))._4 == 1.0)
    assert(auc(Seq((1L, 0L), (-1L, 5L)))._4 == 0.0)
    // single-class input: 0.5 convention, counts still reported
    assert(auc(Seq((1L, 4L), (1L, 2L))) == (2L, 0L, 6L, 0.5))
    // half-rank ties land exactly on the 1/2 grid: pos {1}, neg {1, 0}
    // ranks: 0 -> 1, ties at 1 -> avg 2.5; AUC = (5 - 2) / (2*1*2) = 0.75
    assert(auc(Seq((1L, 1L), (-1L, 1L), (-1L, 0L))) == (1L, 2L, 5L, 0.75))
  }

  test("ngramNovelty: hand-computed trigram novelty vs a base corpus") {
    import graft.operators.TextAnalysis
    val base = Seq(
      (100L, "a b c d"),   // grams: "a b c", "b c d"
      (101L, "x y z w")    // grams: "x y z", "y z w"
    ).toDF("id", "text")
    val cand = Seq(
      (1L, "a b c x"),       // distinct {a b c, b c x}: 1 novel
      (2L, "q r"),           // too short: 0 windows
      (3L, "x y z w"),       // both grams seen: 0 novel
      (4L, "a b c a b c a")  // 5 windows, distinct {a b c, b c a, c a b}: 2 novel
    ).toDF("id", "text")
    val out = TextAnalysis.ngramNovelty(base, cand, "id", "text", n = 3)
      .orderBy($"id").as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (1L, 2L, 2L, 1L, 0.5),
      (2L, 0L, 0L, 0L, 0.0),
      (3L, 2L, 2L, 0L, 0.0),
      (4L, 5L, 3L, 2L, 2.0 / 3.0)))
  }

  test("topKPerStratum keeps exactly k per stratum via a map-side group limit") {
    val df = spark.range(0, 1000).select(($"id" % 7).as("st"),
      ($"id" * 37 % 101).cast("double").as("score"), $"id")
    val top = Sampling.topKPerStratum(df, "st", "score", "id", 5)
    assert(top.groupBy($"st").count().collect().forall(_.getLong(1) == 5L))
    // ranks are 1..5 and the tie rule (score desc, id asc) is stable
    assert(top.collect().map(_.getAs[Int]("rank")).forall(r => r >= 1 && r <= 5))
    assert(top.collect().toSet ==
      Sampling.topKPerStratum(df, "st", "score", "id", 5).collect().toSet)
    // the rank-filter window must carry the map-side WindowGroupLimit
    // (each task forwards only its local top-k into the shuffle)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("capPerGroup keeps at most cap rows per group via a uniform " +
    "order-independent draw") {
    val df = spark.range(0, 1000).select(($"id" % 5).cast("string").as("g"), $"id")
    val kept = Sampling.capPerGroup(df, "g", "id", 12)
    assert(kept.groupBy($"g").count().collect().forall(_.getLong(1) == 12L))
    assert(kept.collect().map(_.getAs[Int]("cap_rank")).forall(r => r >= 1 && r <= 12))
    // the draw is a function of (group, id) only: input order/partitioning
    // can't change the kept set
    assert(kept.select($"g", $"id").collect().toSet ==
      Sampling.capPerGroup(df.orderBy($"id".desc).repartition(13), "g", "id", 12)
        .select($"g", $"id").collect().toSet)
    // small groups survive whole; null groups rank under the sentinel key
    val small = Seq(("x", 1L), ("x", 2L), (null, 3L), (null, 4L)).toDF("g", "id")
    assert(Sampling.capPerGroup(small, "g", "id", 12).count() == 4L)
    // map-side WindowGroupLimit: the shuffle carries O(tasks*cap), not groups
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("temperatureMix: rarest group keeps all, dominant groups flatten, " +
    "and kept sets nest as alpha rises") {
    val df = spark.range(0, 1000)
      .select(when($"id" < 640, "big").when($"id" < 920, "mid").otherwise("rare").as("g"), $"id")
    val out = Sampling.temperatureMix(df, "g", "id", alpha = 0.5)
    val rates = out.select($"g", $"rate").distinct().as[(String, Double)].collect().toMap
    // rate_g = sqrt(p_rare / p_g): exact closed forms
    assert(rates("rare") == 1.0)
    assert(math.abs(rates("big") - math.sqrt(80.0 / 640.0)) < 1e-15)
    assert(math.abs(rates("mid") - math.sqrt(80.0 / 280.0)) < 1e-15)
    val kept = out.groupBy($"g").count().as[(String, Long)].collect().toMap
    assert(kept("rare") == 80L) // rate 1.0 keeps everything
    assert(math.abs(kept("big") - 640 * rates("big")) < 40)
    // gate is fixed per (group, id); only the threshold moves with alpha,
    // so the alpha=0.5 corpus nests inside the alpha=0.9 corpus (pow path)
    val k05 = out.select($"id").as[Long].collect().toSet
    val k09 = Sampling.temperatureMix(df, "g", "id", alpha = 0.9)
      .select($"id").as[Long].collect().toSet
    assert(k05.subsetOf(k09))
    // deterministic under reordering/repartitioning
    assert(Sampling.temperatureMix(df.orderBy($"id".desc).repartition(11), "g", "id", 0.5)
      .select($"id").as[Long].collect().toSet == k05)
  }

  test("packChunks: offsets are gapless per stream and bins respect the budget") {
    val df = Seq(
      ("a", 1L, 1000L), ("a", 2L, 1000L), ("a", 3L, 100L), ("a", 4L, 5000L),
      ("b", 1L, 10L), ("b", 2L, 0L), ("b", 3L, 20L)
    ).toDF("src", "id", "toks")
    val out = Sampling.packChunks(df, "id", "toks", "src", budget = 2048)
      .orderBy($"src", $"id")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    // stream a: offsets 0, 1000, 2000, 2100
    assert(out.filter(_._1 == "a").map(_._4).toSeq == Seq(0L, 1000L, 2000L, 2100L))
    // doc (a,1): [0, 999] -> bin 0 only
    assert(out.find(r => r._1 == "a" && r._2 == 1L).get._5 == 0L)
    assert(out.find(r => r._1 == "a" && r._2 == 1L).get._6 == 0L)
    // doc (a,2): [1000, 1999] -> bin 0 only; (a,3): [2000, 2099]
    // straddles the 2048 boundary -> bins 0..1
    assert(out.find(r => r._1 == "a" && r._2 == 2L).get._6 == 0L)
    val a3 = out.find(r => r._1 == "a" && r._2 == 3L).get
    assert(a3._5 == 0L && a3._6 == 1L && a3._7 == 2L)
    // doc (a,4): [2100, 7099] spans bins 1..3 (straddles two boundaries)
    val a4 = out.find(r => r._1 == "a" && r._2 == 4L).get
    assert(a4._5 == 1L && a4._6 == 3L && a4._7 == 3L)
    // zero-token doc dropped; stream b offsets 0, 10
    assert(out.filter(_._1 == "b").map(_._2).toSeq == Seq(1L, 3L))
    assert(out.filter(_._1 == "b").map(_._4).toSeq == Seq(0L, 10L))
    // per-stream token conservation: last offset + last tokens = total
    val aTotal = out.filter(_._1 == "a").map(_._3).sum
    assert(out.filter(_._1 == "a").last._4 + out.filter(_._1 == "a").last._3 == aTotal)
  }

  test("packChunks: two-phase prefix sum is bit-identical to the single-window " +
       "reference and shards a single stream across bands") {
    // one lone stream + one multi-stream mix, gappy non-dense ids
    val df = spark.range(0, 4000)
      .select(($"id" % 2).cast("string").as("src"),
        ($"id" * 37 + ($"id" % 5)).as("id"),
        (pmod(xxhash64($"id"), lit(400L)) + 1).as("toks"))
    val banded = Sampling.packChunks(df, "id", "toks", "src", budget = 2048, bands = 7)
    // reference: the naive unbounded per-stream window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"src").orderBy($"id")
      .rowsBetween(Long.MinValue, 0)
    val ref = df.filter($"toks" > 0)
      .withColumn("n_tokens", $"toks".cast("long"))
      .withColumn("start_tok", sum($"n_tokens").over(w) - $"n_tokens")
      .withColumn("bin_first", floor($"start_tok" / 2048))
      .withColumn("bin_last", floor(($"start_tok" + $"n_tokens" - 1) / 2048))
      .withColumn("n_bins", $"bin_last" - $"bin_first" + 1)
      .select($"src", $"id", $"n_tokens", $"start_tok",
        $"bin_first", $"bin_last", $"n_bins")
    assert(banded.except(ref).isEmpty && ref.except(banded).isEmpty,
      "banded prefix-sum output diverges from the single-window reference")

    // a SINGLE stream must still use >1 shard: the row-touching
    // running-sum window partitions on (stream, band), and the rows
    // of one stream actually land in several bands
    val one = spark.range(0, 5000)
      .select(lit("only").as("src"), $"id", lit(3L).as("toks"))
    val packed = Sampling.packChunks(one, "id", "toks", "src", budget = 1000, bands = 8)
    val plan = packed.queryExecution.executedPlan.toString
    assert(plan.contains("_band"), s"no band sharding in plan:\n$plan")
    // recompute the sampled percentile band boundaries the operator
    // uses: uniform ids must land in several bands
    val bounds = one.filter(pmod(xxhash64($"id"), lit(100)) === 0)
      .select(percentile_approx($"id",
        typedlit((1 until 8).map(_ / 8.0)), lit(1000))).as[Seq[Long]].head()
    val nBands = one.select(
      aggregate(typedlit(bounds), lit(0L),
        (acc, b) => acc + when($"id" > b, 1L).otherwise(0L)).as("b"))
      .distinct().count()
    assert(nBands > 1, "single stream collapsed to one band")
    // and the packed output is still the exact concat order
    val rows = packed.orderBy($"id").select($"start_tok").as[Long].collect()
    assert(rows.zipWithIndex.forall { case (s, i) => s == 3L * i })

    // SKEWED id range: one outlier id stretches min/max by 10^9 —
    // range-banding would collapse every other row into band 0;
    // percentile banding must stay balanced AND bit-correct
    val skew = spark.range(0, 2000)
      .select(lit("k").as("src"),
        when($"id" === 1999, lit(2000000000000L)).otherwise($"id").as("id"),
        lit(5L).as("toks"))
    val packedSkew = Sampling.packChunks(skew, "id", "toks", "src", budget = 1000, bands = 8)
      .orderBy($"id").select($"start_tok").as[Long].collect()
    assert(packedSkew.zipWithIndex.forall { case (s, i) => s == 5L * i },
      "skewed-id stream must still pack exactly")

    // NEGATIVE ids: banding is decimal-safe and stays id-monotone
    val neg = spark.range(0, 1000)
      .select(lit("n").as("src"), ($"id" - 500).as("id"), lit(7L).as("toks"))
    val packedNeg = Sampling.packChunks(neg, "id", "toks", "src", budget = 100)
      .orderBy($"id").select($"start_tok").as[Long].collect()
    assert(packedNeg.zipWithIndex.forall { case (s, i) => s == 7L * i },
      "negative-id stream must still pack in ascending id order")

    // NON-INTEGRAL id (string): falls back to the single-window path,
    // same semantics under the string sort order
    val str = Seq(("s", "a", 5L), ("s", "b", 6L), ("s", "c", 7L))
      .toDF("src", "id", "toks")
    val packedStr = Sampling.packChunks(str, "id", "toks", "src", budget = 10)
      .orderBy($"id")
      .select($"id", $"start_tok", $"bin_first").as[(String, Long, Long)].collect()
    assert(packedStr.toSeq == Seq(("a", 0L, 0L), ("b", 5L, 0L), ("c", 11L, 1L)))
  }

  test("epochOrder is a stable permutation and epochs are independent") {
    val df = spark.range(0, 5000).toDF("id")
    val e1 = Sampling.epochOrder(df, "id", epoch = 1)
      .orderBy($"epoch_key", $"id").select($"id").as[Long].collect()
    // a permutation of the corpus, identical on rerun
    assert(e1.sorted.toSeq == (0L until 5000L))
    assert(Sampling.epochOrder(df, "id", epoch = 1)
      .orderBy($"epoch_key", $"id").select($"id").as[Long].collect().toSeq == e1.toSeq)
    // a different epoch is a genuinely different order (and not the
    // identity): compare prefix agreement
    val e2 = Sampling.epochOrder(df, "id", epoch = 2)
      .orderBy($"epoch_key", $"id").select($"id").as[Long].collect()
    val agree = e1.zip(e2).count { case (a, b) => a == b }
    assert(agree < 50, s"epochs 1 and 2 agree on $agree of 5000 positions")
    assert(e1.zipWithIndex.count { case (v, i) => v == i } < 50, "epoch 1 is ~identity")
  }

  test("binSlices partitions every doc and fills every non-final bin exactly") {
    val df = spark.range(0, 500)
      .select(($"id" % 3).cast("string").as("src"), $"id",
        (pmod(xxhash64($"id"), lit(400L)) + 1).as("toks"))
    val budget = 256L
    val packed = Sampling.packChunks(df, "id", "toks", "src", budget)
    val slices = Sampling.binSlices(packed, "id", "src", budget)
      .as[(String, Long, Long, Long, Long)].collect()
    // per doc: slices cover [0, n_tokens) contiguously
    val nTok = packed.select($"src", $"id", $"n_tokens")
      .as[(String, Long, Long)].collect().map { case (s, i, n) => (s, i) -> n }.toMap
    slices.groupBy(s => (s._1, s._3)).foreach { case (key, ss) =>
      val sorted = ss.sortBy(_._2)
      assert(sorted.head._4 == 0L, s"doc $key first slice must start at 0")
      assert(sorted.last._5 == nTok(key), s"doc $key last slice must end at n_tokens")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 == b._4 && b._2 == a._2 + 1,
          s"doc $key slices not contiguous")
        case _ =>
      }
      assert(ss.forall(s => s._5 > s._4), s"doc $key has an empty slice")
    }
    // per bin: slice lengths sum to budget, except each stream's last
    val lastBin = slices.groupBy(_._1).map { case (src, ss) => src -> ss.map(_._2).max }
    slices.groupBy(s => (s._1, s._2)).foreach { case ((src, bin), ss) =>
      val filled = ss.map(s => s._5 - s._4).sum
      if (bin < lastBin(src)) assert(filled == budget, s"bin ($src,$bin) holds $filled")
      else assert(filled <= budget)
    }
  }

  test("ivfAssign matches the brute-force nearest pivot and semanticNearDup " +
       "finds within-cluster pairs exactly") {
    val e = Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val nlist = 8
    val assigned = Similarity.ivfAssign(e, nlist)
    assert(assigned.count() == e.count())
    // brute-force check via the join formulation (same tie rule)
    val pivots = e
      .withColumn("hk", (($"id" % 1000000007L) * 2654435761L) % 4294967296L)
      .orderBy($"hk", $"id").limit(nlist)
      .select($"id".as("pivot_id"), $"vec".as("pvec"))
    val brute = e.crossJoin(broadcast(pivots))
      .withColumn("cos",
        Similarity.dotSeq($"vec", $"pvec") /
          (sqrt(Similarity.norm2Seq($"vec")) * sqrt(Similarity.norm2Seq($"pvec"))))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"id")
          .orderBy($"cos".desc, $"pivot_id")))
      .filter($"rnk" === 1)
      .select($"id", $"pivot_id".as("block"))
    val mismatch = assigned.select($"id", $"block").except(brute).count()
    assert(mismatch == 0, s"$mismatch assignment mismatches vs brute force")

    // semanticNearDup == all-pairs cosine within the assigned blocks
    val pairs = Similarity.semanticNearDup(e, threshold = 0.4, nlist = nlist)
    val bruteP = assigned.as("a").join(assigned.as("b"),
        col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .withColumn("cos",
        Similarity.dotSeq(col("a.vec"), col("b.vec")) /
          (sqrt(Similarity.norm2Seq(col("a.vec"))) * sqrt(Similarity.norm2Seq(col("b.vec")))))
      .filter($"cos" >= 0.4)
      .select(col("a.block"), col("a.id").as("i"), col("b.id").as("j"))
    assert(pairs.select($"block", $"i", $"j").except(bruteP).isEmpty)
    assert(bruteP.except(pairs.select($"block", $"i", $"j")).isEmpty)
    assert(pairs.count() > 0)
  }
}
