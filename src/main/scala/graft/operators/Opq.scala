package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftext.ArrayOps

/** OPQ-style rotation for product quantization (SURVEY.md §2.D; the
  * r5 backlog's "last gap to FAISS-quality codebooks").
  *
  * PQ quantizes each D/m-dim subspace independently, so correlation
  * ACROSS subspaces is distortion PQ can never remove. The fix
  * (Ge et al., "Optimized Product Quantization", CVPR 2013 — the
  * parametric solution; FAISS ships it as OPQMatrix) is a learned
  * orthonormal rotation before encoding:
  *
  *  1. eigendecompose the corpus covariance (PCA decorrelates dims);
  *  2. allocate principal components to the m subspaces BALANCING the
  *     per-subspace variance product (eigenvalue allocation: greedy
  *     largest-eigenvalue → currently-lightest-bucket, the classic
  *     LPT heuristic for the OPQ balance objective) so no subspace
  *     is starved or overloaded;
  *  3. rotate every vector by the permuted eigenbasis (map-side,
  *     codegen'd) and train/encode PQ in the rotated space.
  *
  * Rotation is orthonormal → L2 distances are preserved up to fp
  * rounding, so ADC distances in rotated space rank the ORIGINAL
  * vectors; recall is measured against the unrotated brute-force
  * ground truth (OpqSpec).
  *
  * Scale shape: the covariance is ONE map-side pass (each partition
  * folds its rows into a D×D accumulator — D²·n FMAs that any method
  * must pay — and emits a single (n, Σx, Σxᵢxⱼ) row; the driver sums
  * ≤ #partitions accumulators), the D×D Jacobi eigensolve is driver
  * arithmetic on a matrix that fits in a cache line budget (D=64 →
  * 32 KiB), and the rotation itself is a codegen'd matvec literal in
  * the plan — the corpus never shuffles at any step. Float surfaces
  * throughout → spec territory, not gate territory (the trainKmeans
  * discipline: the gated q81 stays pinned to the hash codebook).
  */
object Opq {

  /** Mean vector and covariance of a vector column, exactly one pass:
    * per-partition fold into (n, s[D], m[D·D]) with m row-major
    * Σ xᵢxⱼ, driver-side reduce, then cov = m/n − mean·meanᵀ
    * (population covariance; spec checks vs the driver formula).
    * @return (n, mean, cov row-major D×D) */
  def moments(corpus: DataFrame, vecCol: String): (Long, Array[Double], Array[Double]) = {
    val parts: Array[(Long, Array[Double], Array[Double])] =
      corpus.select(col(vecCol)).rdd.mapPartitions { it =>
        var n = 0L
        var s: Array[Double] = null
        var m: Array[Double] = null
        var d = 0
        it.foreach { row =>
          val a = row.getSeq[Any](0)
          if (s == null) {
            d = a.length
            s = new Array[Double](d); m = new Array[Double](d * d)
          }
          require(a.length == d, s"opq: ragged vector lengths ($d vs ${a.length})")
          val x = new Array[Double](d)
          var i = 0
          while (i < d) {
            x(i) = a(i) match {
              case f: Float  => f.toDouble
              case v: Double => v
              case e => throw new IllegalArgumentException(
                s"opq: vec must be array<float|double>, got element $e")
            }
            i += 1
          }
          n += 1
          i = 0
          while (i < d) {
            s(i) += x(i)
            var j = 0
            val base = i * d
            while (j < d) { m(base + j) += x(i) * x(j); j += 1 }
            i += 1
          }
        }
        if (n == 0L) Iterator.empty else Iterator.single((n, s, m))
      }.collect()
    require(parts.nonEmpty, "opq: empty corpus")
    val d = parts.head._2.length
    // per-partition folds only check widths within their partition;
    // a corpus mixing widths across partitions must fail loudly here,
    // not silently truncate the wider sums
    require(parts.forall(_._2.length == d),
      s"opq: vector width differs across partitions (${parts.map(_._2.length).distinct.toSeq})")
    val s = new Array[Double](d); val m = new Array[Double](d * d)
    var n = 0L
    parts.foreach { case (pn, ps, pm) =>
      n += pn
      var i = 0
      while (i < d) { s(i) += ps(i); i += 1 }
      i = 0
      while (i < d * d) { m(i) += pm(i); i += 1 }
    }
    val mean = s.map(_ / n)
    val cov = new Array[Double](d * d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) { cov(i * d + j) = m(i * d + j) / n - mean(i) * mean(j); j += 1 }
      i += 1
    }
    (n, mean, cov)
  }

  /** Classical cyclic Jacobi eigensolver for a symmetric row-major
    * D×D matrix: repeated 2×2 rotations zeroing the largest-sweep
    * off-diagonal entries until off-diagonal mass < tol. Fixed sweep
    * order → deterministic. Returns eigenpairs sorted by eigenvalue
    * DESCENDING, eigenvectors as ROWS of the returned matrix (so the
    * matrix is directly the PCA rotation y = V·x).
    * @return (eigenvalues desc, eigenvector-rows row-major) */
  def eigenJacobi(a0: Array[Double], d: Int, tol: Double = 1e-12,
                  maxSweeps: Int = 64): (Array[Double], Array[Double]) = {
    require(a0.length == d * d, s"eigen: length ${a0.length} != $d x $d")
    val a = a0.clone()
    // v starts as identity; accumulates COLUMN eigenvectors
    val v = new Array[Double](d * d)
    var i = 0
    while (i < d) { v(i * d + i) = 1.0; i += 1 }
    def off(): Double = {
      var s = 0.0; var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) { val x = a(p * d + q); s += x * x; q += 1 }
        p += 1
      }
      s
    }
    var sweep = 0
    while (sweep < maxSweeps && off() > tol * tol) {
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) {
          val apq = a(p * d + q)
          if (math.abs(apq) > 1e-300) {
            val app = a(p * d + p); val aqq = a(q * d + q)
            val theta = (aqq - app) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case sgn => sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            // rows/cols p and q of a
            var k = 0
            while (k < d) {
              val akp = a(k * d + p); val akq = a(k * d + q)
              a(k * d + p) = c * akp - s * akq
              a(k * d + q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p * d + k); val aqk = a(q * d + k)
              a(p * d + k) = c * apk - s * aqk
              a(q * d + k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k * d + p); val vkq = v(k * d + q)
              v(k * d + p) = c * vkp - s * vkq
              v(k * d + q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i * d + i))
    val evals = order.map(i => a(i * d + i)).toArray
    val rows = new Array[Double](d * d)
    var r = 0
    while (r < d) {
      val src = order(r)
      var c = 0
      while (c < d) { rows(r * d + c) = v(c * d + src); c += 1 }
      r += 1
    }
    (evals, rows)
  }

  /** Eigenvalue allocation (OPQ §parametric): interleave the
    * descending principal components across m equal-size subspaces so
    * the per-subspace log-variance sums balance — greedy
    * largest-first into the currently-lightest OPEN bucket (LPT).
    * Returns the permuted rotation: output dims [s·ds, (s+1)·ds) hold
    * subspace s's components, so a downstream PQ encoder's contiguous
    * slicing picks up exactly the allocated components.
    * @return row-major D×D rotation (rows = permuted eigenvectors) */
  def balancedRotation(evals: Array[Double], eigRows: Array[Double],
                       m: Int): Array[Double] = {
    val d = evals.length
    require(d % m == 0, s"opq: dims $d not divisible by m=$m")
    require(eigRows.length == d * d, "opq: eigenvector matrix shape")
    val ds = d / m
    // log-domain balance; clamp tiny/negative eigenvalues (numerical
    // zeros of a PSD matrix) so one degenerate component can't -inf a
    // bucket into absorbing everything
    val w = evals.map(e => math.log(math.max(e, 1e-12)))
    val load = new Array[Double](m)
    val fill = new Array[Int](m)
    val assign = new Array[Int](d) // eigen index -> subspace
    var i = 0
    while (i < d) {
      var best = -1
      var bestLoad = Double.MaxValue
      var s = 0
      while (s < m) {
        if (fill(s) < ds && load(s) < bestLoad) { best = s; bestLoad = load(s) }
        s += 1
      }
      assign(i) = best
      load(best) += w(i)
      fill(best) += 1
      i += 1
    }
    val out = new Array[Double](d * d)
    val next = Array.tabulate(m)(_ * ds)
    i = 0
    while (i < d) {
      val r = next(assign(i))
      next(assign(i)) += 1
      System.arraycopy(eigRows, i * d, out, r * d, d)
      i += 1
    }
    out
  }

  /** The full parametric-OPQ rotation for a (cid, vec) corpus:
    * moments → Jacobi → eigenvalue allocation. Driver-resident D×D. */
  def trainRotation(corpus: DataFrame, m: Int,
                    vecCol: String = "vec"): Array[Double] = {
    val (_, _, cov) = moments(corpus, vecCol)
    val d = math.sqrt(cov.length.toDouble).round.toInt
    val (evals, rows) = eigenJacobi(cov, d)
    balancedRotation(evals, rows, m)
  }

  /** Map-side rotation of a vector column by a driver-resident
    * row-major D×D matrix (codegen'd; the plan compiles once no
    * matter how many refined rotations an optimization loop tries). */
  def rotated(vec: Column, rotation: Array[Double], d: Int): Column =
    ArrayOps.vecMatMul(vec, rotation, d, d)

  /** [[rotated]] with the width contract ENFORCED on the data path:
    * vecMatMul's documented zero-pad tolerance is right for feature
    * assembly but wrong for retrieval, where a short/long vector
    * silently becomes a wrong neighbor list. Raises with the row's
    * actual length instead. */
  def rotatedStrict(vec: Column, rotation: Array[Double], d: Int): Column =
    when(size(vec) === d, ArrayOps.vecMatMul(vec, rotation, d, d))
      .otherwise(raise_error(concat(
        lit(s"rotated: vector width != $d, got "), size(vec).cast("string"))))

  /** One pass of encode-and-accumulate for the iterative OPQ loop:
    * per row, rotate (y = R·x), PQ-encode y under `cw` (argmin-L2
    * per subspace, the pqEncode tie rule), and accumulate the
    * Procrustes cross matrix M = Σ c·xᵀ (c = the code's
    * reconstruction) plus the distortion Σ‖y − c‖². One map-side
    * pass, ≤ #partitions (n, M, obj) rows to the driver — the
    * moments() shape with the encoder inlined.
    * @return (n, M row-major D×D, distortion) */
  private def encodeAccumulate(corpus: DataFrame, vecCol: String,
                               rot: Array[Double],
                               cw: Seq[Seq[Seq[Double]]]): (Long, Array[Double], Double) = {
    val m = cw.length; val ks = cw.head.length; val ds = cw.head.head.length
    val d = m * ds
    require(rot.length == d * d, s"opq: rotation ${rot.length} != $d x $d")
    val cwArr: Array[Array[Array[Double]]] =
      cw.map(_.map(_.toArray).toArray).toArray
    val parts = corpus.select(col(vecCol)).rdd.mapPartitions { it =>
      var n = 0L
      val mm = new Array[Double](d * d)
      var obj = 0.0
      val x = new Array[Double](d)
      val y = new Array[Double](d)
      val c = new Array[Double](d)
      it.foreach { row =>
        val a = row.getSeq[Any](0)
        require(a.length == d, s"opq: vec length ${a.length} != $d")
        var i = 0
        while (i < d) {
          x(i) = a(i) match {
            case f: Float  => f.toDouble
            case v: Double => v
            case e => throw new IllegalArgumentException(s"opq: bad element $e")
          }
          i += 1
        }
        var r = 0
        while (r < d) {
          var acc = 0.0
          var j = 0
          while (j < d) { acc += rot(r * d + j) * x(j); j += 1 }
          y(r) = acc
          r += 1
        }
        var s = 0
        while (s < m) {
          var bestJ = 0; var bestD = Double.MaxValue
          var j = 0
          while (j < ks) {
            var dd = 0.0
            var t = 0
            while (t < ds) {
              val diff = y(s * ds + t) - cwArr(s)(j)(t); dd += diff * diff; t += 1
            }
            if (dd < bestD) { bestD = dd; bestJ = j }
            j += 1
          }
          var t = 0
          while (t < ds) { c(s * ds + t) = cwArr(s)(bestJ)(t); t += 1 }
          obj += bestD
          s += 1
        }
        r = 0
        while (r < d) {
          val cr = c(r)
          var j = 0
          val base = r * d
          while (j < d) { mm(base + j) += cr * x(j); j += 1 }
          r += 1
        }
        n += 1
      }
      if (n == 0L) Iterator.empty else Iterator.single((n, mm, obj))
    }.collect()
    require(parts.nonEmpty, "opq: empty corpus")
    val mm = new Array[Double](d * d)
    var n = 0L; var obj = 0.0
    parts.foreach { case (pn, pm, po) =>
      n += pn; obj += po
      var i = 0
      while (i < d * d) { mm(i) += pm(i); i += 1 }
    }
    (n, mm, obj)
  }

  /** Orthogonal Procrustes solve: the orthonormal R minimizing
    * Σ‖R·xᵢ − cᵢ‖² given M = Σ cᵢ·xᵢᵀ is R = U·Vᵀ from M's SVD
    * (public result, Schönemann 1966). SVD via the symmetric
    * eigensolver already here: MᵀM = V·Σ²·Vᵀ (Jacobi), uᵢ = M·vᵢ/σᵢ,
    * rank-deficient columns completed by Gram-Schmidt against the
    * standard basis (deterministic). */
  def procrustes(mmat: Array[Double], d: Int): Array[Double] = {
    require(mmat.length == d * d, s"procrustes: ${mmat.length} != $d x $d")
    val mtm = new Array[Double](d * d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        var acc = 0.0
        var r = 0
        while (r < d) { acc += mmat(r * d + i) * mmat(r * d + j); r += 1 }
        mtm(i * d + j) = acc
        j += 1
      }
      i += 1
    }
    val (evals, vrows) = eigenJacobi(mtm, d)
    val u = Array.ofDim[Double](d, d) // u(i) = left singular column i
    val have = new Array[Boolean](d)
    i = 0
    while (i < d) {
      val sigma = math.sqrt(math.max(evals(i), 0.0))
      if (sigma > 1e-9) {
        val col = new Array[Double](d)
        var r = 0
        while (r < d) {
          var acc = 0.0
          var cIdx = 0
          while (cIdx < d) { acc += mmat(r * d + cIdx) * vrows(i * d + cIdx); cIdx += 1 }
          col(r) = acc / sigma
          r += 1
        }
        u(i) = col; have(i) = true
      }
      i += 1
    }
    // complete the deficient columns deterministically
    i = 0
    while (i < d) {
      if (!have(i)) {
        var e = 0
        var done = false
        while (e < d && !done) {
          val cand = new Array[Double](d)
          cand(e) = 1.0
          var k = 0
          while (k < d) {
            if (have(k)) {
              var dot = 0.0
              var r = 0
              while (r < d) { dot += cand(r) * u(k)(r); r += 1 }
              r = 0
              while (r < d) { cand(r) -= dot * u(k)(r); r += 1 }
            }
            k += 1
          }
          val nrm = math.sqrt(cand.map(x => x * x).sum)
          if (nrm > 1e-6) {
            var r = 0
            while (r < d) { cand(r) /= nrm; r += 1 }
            u(i) = cand; have(i) = true; done = true
          }
          e += 1
        }
        require(have(i), "procrustes: basis completion failed")
      }
      i += 1
    }
    // R = U·Vᵀ : R(r)(c) = Σ_i u_i(r)·v_i(c)
    val out = new Array[Double](d * d)
    var r = 0
    while (r < d) {
      var cIdx = 0
      while (cIdx < d) {
        var acc = 0.0
        var k = 0
        while (k < d) { acc += u(k)(r) * vrows(k * d + cIdx); k += 1 }
        out(r * d + cIdx) = acc
        cIdx += 1
      }
      r += 1
    }
    out
  }

  /** ITERATIVE OPQ (the full Ge et al. 2013 alternating optimization;
    * FAISS OPQMatrix's training loop): parametric init, then per
    * round (a) encode under the current rotation+codebook while
    * accumulating the Procrustes cross matrix — one map-side pass,
    * (b) driver-side Procrustes solve for the new rotation,
    * (c) warm-restarted Lloyd refresh of the codebook in the newly
    * rotated space. Every step minimizes the SAME distortion
    * Σ‖Rx − q(Rx)‖² with the others fixed, so the recorded history
    * (measured at each round's start) is non-increasing — the spec's
    * pin. Deterministic throughout.
    * @return (rotation, codebook, distortion history) */
  def trainRotationIterative(corpus: DataFrame, m: Int, ks: Int,
                             opqIters: Int = 4, lloydIters: Int = 2,
                             vecCol: String = "vec", idCol: String = "cid")
      : (Array[Double], Seq[Seq[Seq[Double]]], Seq[Double]) = {
    require(opqIters >= 1 && lloydIters >= 1,
      s"bad params: opqIters=$opqIters lloydIters=$lloydIters")
    var rot = trainRotation(corpus, m, vecCol)
    val d = math.sqrt(rot.length.toDouble).round.toInt
    val base = corpus.select(col(idCol).as("cid"), col(vecCol).as("vec"))
      .localCheckpoint()
    def rotatedCorpus(r: Array[Double]) =
      base.select(col("cid"), rotated(col("vec"), r, d).as("vec"))
    var cw = Similarity.trainPqCodebook(rotatedCorpus(rot), m, ks, lloydIters)._1
    val history = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 0 until opqIters) {
      val (_, mm, obj) = encodeAccumulate(base, "vec", rot, cw)
      history += obj
      rot = procrustes(mm, d)
      cw = Similarity.trainPqCodebookFrom(rotatedCorpus(rot), cw, lloydIters)._1
    }
    history += encodeAccumulate(base, "vec", rot, cw)._3
    (rot, cw, history.toSeq)
  }

  /** PQ retrieval under a rotation: rotate corpus + queries map-side,
    * train codewords in the rotated space ([[Similarity.trainPqCodebook]]),
    * then run the identical encode + ADC scan. Orthonormality makes
    * rotated-space L2 == original-space L2 (up to fp), so results
    * rank the original vectors. */
  def pqTopKRotated(queries: DataFrame, corpus: DataFrame, k: Int,
                    rotation: Array[Double], m: Int, ks: Int,
                    trainIters: Int = 5): DataFrame = {
    val d = math.sqrt(rotation.length.toDouble).round.toInt
    val rc = corpus.select(col("cid"), rotatedStrict(col("vec"), rotation, d).as("vec"))
    val rq = queries.select(col("qid"), rotatedStrict(col("vec"), rotation, d).as("vec"))
    val (cw, _) = Similarity.trainPqCodebook(rc, m, ks, trainIters)
    Similarity.pqTopKWith(rq, rc, k, cw)
  }
}
