package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.ArrayOps

import graft.operators.{Opq, Similarity}

/** OPQ rotation: moments, Jacobi eigensolver, eigenvalue allocation,
  * the codegen'd matvec, and the end metric — rotated-space PQ beats
  * plain trained PQ on a correlated corpus (the gated q81 stays on
  * the hash codebook; this is the documented quality-upgrade path).
  */
class OpqSpec extends SparkSuite {
  import spark.implicits._

  /** Correlated anisotropic corpus: latent z with geometrically
    * decaying per-dim scales, mixed by 45° Givens rotations pairing
    * dim i with dim i+8 — each pair lands in DIFFERENT contiguous
    * PQ subspaces, so plain PQ quantizes the two halves of a strongly
    * correlated pair independently (the distortion OPQ exists to
    * remove), while PCA recovers the axis-aligned latents and the
    * allocation rebalances the decayed spectrum. A fully RANDOM
    * orthonormal mix would be the WRONG fixture: it equalizes
    * coordinate variances, which balances contiguous subspaces by
    * accident and leaves rotation nothing to win. */
  private val D = 16
  private lazy val mixQ: Array[Double] = {
    val q = new Array[Double](D * D)
    val c = math.sqrt(0.5)
    for (i <- 0 until D / 2) {
      q(i * D + i) = c; q(i * D + (i + D / 2)) = -c
      q((i + D / 2) * D + i) = c; q((i + D / 2) * D + (i + D / 2)) = c
    }
    q
  }

  /** Latent clusters (top-3 neighbors = cluster mates — the regime
    * where ADC recall is measurable at all; see KmeansSpec's note)
    * with decaying per-dim scales, mixed by [[mixQ]]. */
  private def correlated(nv: Int, nc: Int = 125) = {
    val q = mixQ
    val d = D // capture locals, not the (non-serializable) suite
    spark.range(0, nv, 1, 4).mapPartitions { it =>
      it.map { id =>
        val cr = new scala.util.Random((id % nc) * 1664525L + 1013904223L)
        val zc = Array.tabulate(d)(i => cr.nextGaussian() * math.pow(2.0, -i / 8.0))
        val nr = new scala.util.Random(id * 2654435761L)
        val z = Array.tabulate(d)(i =>
          zc(i) + nr.nextGaussian() * 0.1 * math.pow(2.0, -i / 8.0))
        val x = Array.tabulate(d)(r =>
          (0 until d).map(c => q(r * d + c) * z(c)).sum.toFloat)
        (id, x)
      }
    }.toDF("cid", "vec").localCheckpoint()
  }

  test("moments matches the driver formula on a small corpus") {
    val rows = (0 until 50).map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Array.fill(6)(rnd.nextFloat() * 4 - 2))
    }
    val df = rows.toDF("cid", "vec").repartition(3)
    val (n, mean, cov) = Opq.moments(df, "vec")
    assert(n == 50)
    val xs = rows.map(_._2.map(_.toDouble))
    val wantMean = (0 until 6).map(j => xs.map(_(j)).sum / 50)
    (0 until 6).foreach(j => assert(math.abs(mean(j) - wantMean(j)) < 1e-9))
    for (i <- 0 until 6; j <- 0 until 6) {
      val want = xs.map(x => x(i) * x(j)).sum / 50 - wantMean(i) * wantMean(j)
      assert(math.abs(cov(i * 6 + j) - want) < 1e-9, s"cov($i,$j)")
      assert(cov(i * 6 + j) == cov(j * 6 + i), s"cov symmetry ($i,$j)")
    }
  }

  test("eigenJacobi: reconstruction, orthonormal rows, descending eigenvalues") {
    val d = 12
    val rnd = new scala.util.Random(3)
    val b = Array.fill(d * d)(rnd.nextGaussian())
    val a = Array.tabulate(d * d) { k =>
      val i = k / d; val j = k % d
      b(i * d + j) + b(j * d + i)
    }
    val (evals, rows) = Opq.eigenJacobi(a, d)
    assert(evals.sliding(2).forall { case Array(x, y) => x >= y })
    // rows orthonormal: R·Rᵀ = I
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(k => rows(i * d + k) * rows(j * d + k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"RRt($i,$j)=$dot")
    }
    // reconstruction: A = Rᵀ·diag(λ)·R
    for (i <- 0 until d; j <- 0 until d) {
      val aij = (0 until d).map(k => rows(k * d + i) * evals(k) * rows(k * d + j)).sum
      assert(math.abs(aij - a(i * d + j)) < 1e-8, s"recon($i,$j)")
    }
  }

  test("balancedRotation: orthonormal permutation, fill ds per subspace, " +
    "never worse balanced than contiguous slicing") {
    val corpus = correlated(400)
    val (_, _, cov) = Opq.moments(corpus, "vec")
    val (evals, rows) = Opq.eigenJacobi(cov, D)
    val m = 4; val ds = D / m
    val rot = Opq.balancedRotation(evals, rows, m)
    // permutation of the eigen rows
    val eigRowSet = (0 until D).map(i => rows.slice(i * D, i * D + D).toSeq).toSet
    val rotRows = (0 until D).map(i => rot.slice(i * D, i * D + D).toSeq)
    assert(rotRows.toSet == eigRowSet && rotRows.distinct.size == D)
    // balance: spread of per-subspace log-eigenvalue sums <= the
    // contiguous (unallocated) assignment's spread
    val byRow = (0 until D).map(i => rows.slice(i * D, i * D + D).toSeq -> math.log(math.max(evals(i), 1e-12))).toMap
    def spread(groups: Seq[Seq[Seq[Double]]]): Double = {
      val loads = groups.map(_.map(byRow).sum)
      loads.max - loads.min
    }
    val alloc = spread((0 until m).map(s => rotRows.slice(s * ds, s * ds + ds)))
    val contig = spread((0 until m).map(s =>
      (0 until D).map(i => rows.slice(i * D, i * D + D).toSeq).slice(s * ds, s * ds + ds)))
    assert(alloc <= contig + 1e-12, s"allocation spread $alloc > contiguous $contig")
  }

  test("vecMatMul: bit-equal to the driver fold, float + double inputs, null rules") {
    val mat = Array.tabulate(3 * 4)(i => (i * 7 % 5 - 2) * 0.25)
    val f = Seq((1L, Array(1.0f, -2.5f, 0.125f, 3.0f))).toDF("id", "vec")
    val gotF = f.select(ArrayOps.vecMatMul($"vec", mat, 4, 3)).as[Seq[Double]].head()
    val x = Array(1.0f, -2.5f, 0.125f, 3.0f).map(_.toDouble)
    val want = (0 until 3).map { r =>
      var acc = 0.0
      (0 until 4).foreach(c => acc += mat(r * 4 + c) * x(c))
      acc
    }
    assert(gotF == want)
    val dd = Seq((1L, x.toSeq)).toDF("id", "vec")
    assert(dd.select(ArrayOps.vecMatMul($"vec", mat, 4, 3)).as[Seq[Double]].head() == want)
    // null element -> null result (nullable schema path)
    val withNull = Seq((1L, Seq[Option[Double]](Some(1.0), None, Some(2.0), Some(0.0))))
      .toDF("id", "vec")
    assert(withNull.select(ArrayOps.vecMatMul($"vec", mat, 4, 3)).collect().head.isNullAt(0))
    // short input folds the overlap
    val short = Seq((1L, Seq(2.0, 1.0))).toDF("id", "vec")
    val gotS = short.select(ArrayOps.vecMatMul($"vec", mat, 4, 3)).as[Seq[Double]].head()
    assert(gotS == (0 until 3).map(r => mat(r * 4) * 2.0 + mat(r * 4 + 1) * 1.0))
  }

  test("trained rotation is orthonormal and preserves pairwise L2 to fp tolerance") {
    val corpus = correlated(600)
    val rot = Opq.trainRotation(corpus, m = 4)
    for (i <- 0 until D; j <- 0 until D) {
      val dot = (0 until D).map(k => rot(i * D + k) * rot(j * D + k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9)
    }
    val r2 = corpus.limit(40)
      .select($"cid", $"vec", Opq.rotated($"vec", rot, D).as("rvec"))
    val pairs = r2.as("a").crossJoin(r2.as("b"))
      .filter($"a.cid" < $"b.cid")
      .select(
        ArrayOps.vecL2Sq($"a.vec", $"b.vec").as("d0"),
        ArrayOps.vecL2Sq($"a.rvec", $"b.rvec").as("d1"))
      .as[(Double, Double)].collect()
    pairs.foreach { case (d0, d1) =>
      assert(math.abs(d0 - d1) <= 1e-6 * math.max(1.0, d0), s"L2 drifted: $d0 vs $d1")
    }
  }

  test("procrustes: recovers a known rotation exactly and returns orthonormal R") {
    val d = 8
    val rnd = new scala.util.Random(11)
    // build a known orthonormal Q via Gram-Schmidt
    val raw = Array.fill(d, d)(rnd.nextGaussian())
    for (i <- 0 until d) {
      for (j <- 0 until i) {
        val dot = (0 until d).map(k => raw(i)(k) * raw(j)(k)).sum
        for (k <- 0 until d) raw(i)(k) -= dot * raw(j)(k)
      }
      val n = math.sqrt((0 until d).map(k => raw(i)(k) * raw(i)(k)).sum)
      for (k <- 0 until d) raw(i)(k) /= n
    }
    val q = raw
    // M = sum over random x of (Q x) x^T — the Procrustes minimizer
    // of sum ||R x - Q x||^2 is R = Q exactly
    val mm = new Array[Double](d * d)
    for (_ <- 0 until 200) {
      val x = Array.fill(d)(rnd.nextGaussian())
      val y = Array.tabulate(d)(r => (0 until d).map(c => q(r)(c) * x(c)).sum)
      for (r <- 0 until d; c <- 0 until d) mm(r * d + c) += y(r) * x(c)
    }
    val r = Opq.procrustes(mm, d)
    for (i <- 0 until d; j <- 0 until d) {
      assert(math.abs(r(i * d + j) - q(i)(j)) < 1e-8, s"R($i,$j)")
      val dot = (0 until d).map(k => r(i * d + k) * r(j * d + k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9)
    }
  }

  test("iterative OPQ: distortion history non-increasing, ends at or below " +
    "the parametric rotation's, rotation stays orthonormal") {
    val corpus = correlated(1500)
    val m = 4; val ks = 16
    val (rotIt, cwIt, hist) = Opq.trainRotationIterative(corpus, m, ks,
      opqIters = 3, lloydIters = 2)
    hist.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-6 * math.abs(a), s"distortion rose: $a -> $b in $hist")
    }
    // hist.head is the PARAMETRIC rotation's distortion (round 0
    // measures before any Procrustes update) — the loop must not
    // end above it
    assert(hist.last <= hist.head + 1e-9, s"no improvement: $hist")
    for (i <- 0 until D; j <- 0 until D) {
      val dot = (0 until D).map(k => rotIt(i * D + k) * rotIt(j * D + k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-8)
    }
    // deterministic rerun
    val (rot2, cw2, hist2) = Opq.trainRotationIterative(corpus, m, ks,
      opqIters = 3, lloydIters = 2)
    assert(rot2.toSeq == rotIt.toSeq && cw2 == cwIt && hist2 == hist)
  }

  test("rotated PQ cuts reconstruction error and reaches recall >= plain trained PQ " +
    "on the correlated corpus; deterministic") {
    val corpus = correlated(2000)
    val m = 4; val ks = 16
    val (cwPlain, histPlain) = Similarity.trainPqCodebook(corpus, m, ks, iters = 5)
    val rot = Opq.trainRotation(corpus, m)
    val rc = corpus.select($"cid", Opq.rotated($"vec", rot, D).as("vec")).localCheckpoint()
    val (cwRot, histRot) = Similarity.trainPqCodebook(rc, m, ks, iters = 5)
    // orthonormal rotation preserves L2, so reconstruction errors are
    // directly comparable across the two spaces
    assert(histRot.last < histPlain.last,
      s"rotation did not cut distortion: ${histRot.last} >= ${histPlain.last}")

    val queries = corpus.filter($"cid" % 50 === 0).select($"cid".as("qid"), $"vec")
    val exact = queries.crossJoin(corpus.select($"cid", $"vec".as("cvec")))
      .filter($"qid" =!= $"cid")
      .withColumn("d2", ArrayOps.vecL2Sq($"vec", $"cvec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"d2", $"cid")
    val truth = exact.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select($"qid", $"cid").as[(Long, Long)].collect().toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    // recall3@10: same-code cluster mates tie under ADC (ties break
    // by cid), so top-3-vs-top-3 is a coin flip within a cluster —
    // the shortlist form is what a PQ deployment actually runs
    // (shortlist, then exact rescore; the q78 matryoshka shape)
    val plain = recallOf(Similarity.pqTopKWith(queries, corpus, 10, cwPlain))
    val rotated = recallOf(Opq.pqTopKRotated(queries, corpus, 10, rot, m, ks))
    assert(rotated >= plain,
      s"rotated PQ recall3@10 $rotated < plain trained recall3@10 $plain")
    assert(rotated > 0.5, s"rotated PQ recall3@10 $rotated unexpectedly low")

    // deterministic rerun (moments partition sums are fixed by the
    // checkpointed partitioning; everything downstream is driver math)
    val rot2 = Opq.trainRotation(corpus, m)
    assert(rot2.toSeq == rot.toSeq)
  }

  test("rotatedStrict raises on wrong vector width; rotated zero-pads") {
    import spark.implicits._
    val d = 4
    val eye = Array.tabulate(d * d)(i => if (i % (d + 1) == 0) 1.0 else 0.0)
    val short = Seq((1L, Array(1.0, 2.0))).toDF("cid", "vec")
    // the permissive path keeps its documented zero-pad contract
    val padded = short.select(Opq.rotated($"vec", eye, d)).as[Seq[Double]].head()
    assert(padded === Seq(1.0, 2.0, 0.0, 0.0))
    // the retrieval path must FAIL, not fabricate neighbors
    val ex = intercept[Exception] {
      short.select(Opq.rotatedStrict($"vec", eye, d)).collect()
    }
    assert(ex.getMessage.contains("vector width"), ex.getMessage)
    // exact width passes strict unchanged
    val ok = Seq((1L, Array(1.0, 2.0, 3.0, 4.0))).toDF("cid", "vec")
      .select(Opq.rotatedStrict($"vec", eye, d)).as[Seq[Double]].head()
    assert(ok === Seq(1.0, 2.0, 3.0, 4.0))
  }
}
