package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Spherical k-means training for the IVF family (trained-centroid
  * upgrade path; the gated q42/q44 queries stay on hash pivots). */
class KmeansSpec extends SparkSuite {
  import spark.implicits._

  /** Deterministic clustered corpus: `nc` well-separated cluster
    * centers, vectors = center + small per-id perturbation. */
  private def clustered(nv: Int, ndim: Int, nc: Int) =
    spark.range(0, nv, 1, 4).mapPartitions { it =>
      it.map { id =>
        val cluster = (id % nc).toInt
        val base = new scala.util.Random(cluster)
        val v = Array.fill(ndim)(base.nextFloat() * 2 - 1)
        val rng = new scala.util.Random(id)
        (0 until 4).foreach(_ => v(rng.nextInt(ndim)) += rng.nextFloat() * 0.2f)
        (id, v)
      }
    }.toDF("id", "vec").localCheckpoint()

  test("objective is monotonically non-increasing and training is deterministic") {
    val corpus = clustered(2000, 16, 10)
    val (cents, hist) = Similarity.trainKmeans(corpus, nlist = 8, iters = 6)
    assert(cents.size == 8 && hist.size == 6)
    hist.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"objective rose: $a -> $b in $hist")
    }
    // training converges on this corpus: the final objective is well
    // below the seed assignment's
    assert(hist.last < hist.head)
    // deterministic rerun
    val (cents2, hist2) = Similarity.trainKmeans(corpus, nlist = 8, iters = 6)
    assert(cents2 == cents && hist2 == hist)
  }

  test("trained centroids reach recall >= hash pivots at equal nprobe") {
    val corpus = clustered(4000, 16, 40)
    val queries = corpus.filter($"id" % 100 === 0)
      .select($"id".as("qid"), $"vec")
    val cands = corpus.select($"id".as("cid"), $"vec")
    val truth = Similarity.bruteForceTopK(queries, cands, 5)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select($"qid", $"cid").as[(Long, Long)].collect().toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val (cents, _) = Similarity.trainKmeans(corpus, nlist = 20, iters = 8)
    val hash = recallOf(Similarity.ivfTopK(queries, cands, 5, nlist = 20, nprobe = 3))
    val trained = recallOf(Similarity.ivfTopKWith(queries, cands, 5, cents, nprobe = 3))
    assert(trained >= hash,
      s"trained recall $trained < hash-pivot recall $hash at equal nprobe")
    // and it is genuinely usable: most true neighbors found
    assert(trained > 0.5, s"trained recall $trained unexpectedly low")
  }

  test("trainPqCodebook: monotone reconstruction error, deterministic, " +
    "trained recall >= hash-picked recall at equal (m, ks)") {
    // PQ resolves neighbor structure at the CLUSTER scale (same-code
    // rows reconstruct identically), so the recall regime is many
    // small clusters with codeword capacity ~ cluster count — not the
    // IVF fixture's few fat clusters, whose within-cluster neighbor
    // ranking sits below any codebook's resolution
    val nv = 2000
    val corpus = clustered(nv, 16, 250)
      .select($"id".as("cid"), $"vec").localCheckpoint()
    val (cw, hist) = Similarity.trainPqCodebook(corpus, m = 4, ks = 32, iters = 6)
    assert(cw.length == 4 && cw.forall(_.length == 32) &&
      cw.forall(_.forall(_.length == 4)))
    hist.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"reconstruction error rose: $a -> $b in $hist")
    }
    // hist.head IS the hash-picked codebook's reconstruction error
    // (the incoming seed); training must improve it materially
    assert(hist.last < hist.head, s"training never improved: $hist")
    val (cw2, hist2) = Similarity.trainPqCodebook(corpus, m = 4, ks = 32, iters = 6)
    assert(cw2 == cw && hist2 == hist)

    // recall@k against the exact full-dim L2 ranking (what ADC
    // approximates), trained vs the hash-picked seed codebook
    val queries = corpus.filter($"cid" % 50 === 0)
      .select($"cid".as("qid"), $"vec")
    val exact = queries.crossJoin(
        corpus.select($"cid", $"vec".as("cvec")))
      .filter($"qid" =!= $"cid")
      .withColumn("d2", org.apache.spark.sql.graftext.ArrayOps.vecL2Sq(
        $"vec", $"cvec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"d2", $"cid")
    val truth = exact.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select($"qid", $"cid").as[(Long, Long)].collect().toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val hash = recallOf(Similarity.pqTopK(queries, corpus, 3, m = 4, ks = 32))
    val trained = recallOf(Similarity.pqTopKWith(queries, corpus, 3, cw))
    assert(trained >= hash,
      s"trained PQ recall $trained < hash-codebook recall $hash")
    assert(trained > 0.3, s"trained PQ recall $trained unexpectedly low")
  }

  test("ivfPqTopK: residual PQ at full probe >= plain PQ recall at equal " +
    "code budget, nprobe trades recall monotonically-ish, deterministic") {
    val corpus = clustered(2000, 16, 20).select($"id".as("cid"), $"vec")
      .localCheckpoint()
    val queries = corpus.filter($"cid" % 40 === 0).select($"cid".as("qid"), $"vec")
    // exact L2 ground truth, driver-side
    val cv = corpus.as[(Long, Array[Float])].collect()
    val qv = queries.as[(Long, Array[Float])].collect()
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
      s
    }
    val truth = qv.map { case (qid, q) =>
      qid -> cv.filter(_._1 != qid).map { case (cid, v) => (cid, l2(q, v)) }
        .sortBy(t => (t._2, t._1)).take(5).map(_._1).toSet
    }.toMap
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val byQ = df.select($"qid", $"cid").as[(Long, Long)].collect().groupBy(_._1)
      byQ.map { case (q, g) => g.map(_._2).toSet.intersect(truth(q)).size }.sum
        .toDouble / (truth.size * 5)
    }
    val (cents, _) = Similarity.trainKmeans(
      corpus.select($"cid".as("id"), $"vec"), nlist = 16, iters = 6)
    val resFrame = Similarity.residualFrame(corpus, cents).localCheckpoint()
    val (cwRes, _) = Similarity.trainPqCodebook(resFrame, m = 8, ks = 16, iters = 4)
    val (cwRaw, _) = Similarity.trainPqCodebook(corpus, m = 8, ks = 16, iters = 4)
    val fullDf = Similarity.ivfPqTopK(queries, corpus, 5, cents, cwRes, nprobe = 16)
    val full = recallOf(fullDf)
    val plain = recallOf(Similarity.pqTopKWith(queries, corpus, 5, cwRaw))
    // residual variance < raw variance -> the same m*log2(ks) bits
    // quantize finer; at full probe the list structure costs nothing
    assert(full >= plain, s"residual recall $full < plain PQ recall $plain")
    // absolute bar calibrated to the code budget: 8x16 = 32 bits on
    // 16 dims sits in the ~0.1-0.4 recall regime on this fixture
    // (random would be 5/2000 = 0.0025); the COMPARATIVE claim above
    // is the operator's contract
    assert(full > 0.05, s"residual recall $full unusably low")
    // probing fewer lists can only drop candidates
    val probe2 = recallOf(Similarity.ivfPqTopK(queries, corpus, 5, cents, cwRes, nprobe = 2))
    assert(probe2 <= full + 1e-9, s"nprobe=2 recall $probe2 > full $full")
    // exactly k results per query at full probe, rank 1..k
    val counts = fullDf.groupBy($"qid").count().select($"count").as[Long].collect()
    assert(counts.forall(_ == 5L))
    // deterministic end-to-end
    val again = Similarity.ivfPqTopK(queries, corpus, 5, cents, cwRes, nprobe = 16)
      .orderBy($"qid", $"rank").collect().toSeq
    assert(again === fullDf.orderBy($"qid", $"rank").collect().toSeq)
  }

  test("ivfAssignWith matches the driver-side argmax and feeds semantic dedup") {
    val corpus = clustered(500, 8, 5)
    val (cents, _) = Similarity.trainKmeans(corpus, nlist = 5, iters = 4)
    val assigned = Similarity.ivfAssignWith(corpus, cents)
    assert(assigned.count() == 500)
    val sorted = cents.sortBy(_._1)
    val local = corpus.select($"id", $"vec").as[(Long, Seq[Float])].collect()
    val expect = local.map { case (id, v) =>
      val n2 = v.map(x => x.toDouble * x).sum
      val best = sorted.map { case (cid, cv) =>
        val dot = v.zip(cv).map { case (x, y) => x.toDouble * y }.sum
        val cn2 = cv.map(x => x * x).sum
        (cid, dot / (math.sqrt(n2) * math.sqrt(cn2)))
      }.maxBy { case (cid, cos) => (cos, -cid) }
      (id, best._1)
    }.toMap
    assigned.select($"id", $"block").as[(Long, Long)].collect().foreach {
      case (id, blk) => assert(blk == expect(id), s"id $id: $blk != ${expect(id)}")
    }
    // trained SemDeDup runs end-to-end and only emits >= threshold pairs
    val pairs = Similarity.semanticNearDupWith(corpus, threshold = 0.9, cents)
    assert(pairs.filter($"cos" < 0.9).count() == 0)
  }

  test("KmeansFixed: the sign-safe floor-division identity matches " +
    "Math.floorDiv across signs") {
    for (sVal <- Seq(-1000L, -17L, -1L, 0L, 1L, 17L, 1000L, 123456L);
         n <- Seq(1L, 2L, 3L, 7L, 500L)) {
      val viaIdentity = (sVal - ((sVal % n) + n) % n) / n
      assert(viaIdentity === Math.floorDiv(sVal, n), s"s=$sVal n=$n")
    }
  }

  test("KmeansFixed: deterministic training, inertia improves over the " +
    "seed model, stats account for every vector") {
    import graft.operators.KmeansFixed
    val emb = graft.Tables.embeddings(spark, sf)
    val c1 = KmeansFixed.train(emb, "vec_id", "embedding", k = 4, iters = 3)
    val c2 = KmeansFixed.train(emb, "vec_id", "embedding", k = 4, iters = 3)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
    val out = KmeansFixed.gateSurface(emb, "vec_id", "embedding", k = 4, iters = 3)
      .collect()
    assert(out.length === 4 * 64)
    val n = emb.count()
    val perCluster = out.groupBy(_.getLong(0)).view
      .mapValues(_.head.getLong(3)).toMap
    assert(perCluster.values.sum === n)
    // inertia under the trained centroids beats the raw seed model
    val seed0 = KmeansFixed.train(emb, "vec_id", "embedding", k = 4, iters = 0)
    val i0 = KmeansFixed.gateSurface(emb, "vec_id", "embedding", k = 4, iters = 0)
      .select("cluster", "inertia").distinct().collect().map(_.getLong(1)).sum
    val i3 = out.groupBy(_.getLong(0)).values.map(_.head.getLong(4)).sum
    assert(i3 < i0, s"trained inertia $i3 !< seed inertia $i0")
    assert(seed0.length === 4)
  }

  test("KmeansFixed: an emptied cluster carries its previous centroid " +
    "(duplicate seeds tie to the smaller index)") {
    import spark.implicits._
    import graft.operators.KmeansFixed
    // seeds 0..3 = [0, 5, 9, 9]: clusters 2 and 3 start identical, so
    // EVERY point (including seed 3's own) ties to cluster 2 -> cluster
    // 3 is empty from round 1 and must keep its seed centroid while
    // cluster 2's centroid moves to absorb the 8.9-valued mass
    val vals = Seq(0.0f, 5.0f, 9.0f, 9.0f) ++ Seq.fill(16)(8.9f)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, Array.fill(8)(v)) }
      .toDF("vec_id", "embedding")
    val cents = KmeansFixed.train(df, "vec_id", "embedding", k = 4, iters = 2)
    val q9 = math.floor(9.0 * 1024.0 + 0.5).toLong
    assert(cents(3).forall(_ == q9), s"empty cluster 3 moved: ${cents(3).toSeq}")
    assert(cents(2).forall(_ != q9), "cluster 2 failed to absorb the 8.9 mass")
    assert(cents(0).forall(_ == 0L))
  }
}
