package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graftext.ArrayOps


/** Similarity search over embedding columns (SURVEY.md §2.D).
  *
  * Numeric discipline: dot products and norms are PER-ROW sequential
  * left folds over the vector in element order — deterministic at any
  * parallelism (nothing crosses rows), and bit-identical to the
  * oracle's `list_reduce` left fold (SURVEY.md §4).
  */
object Similarity {

  /** Sequential left-fold dot product of two float-array columns —
    * the codegen'd VecDotSeq expression (bit-identical fold to the
    * interpreted `aggregate(zip_with(...))` chain it replaced). */
  def dotSeq(a: Column, b: Column): Column = ArrayOps.vecDot(a, b)

  /** Sequential left-fold squared norm (same fold order). */
  def norm2Seq(a: Column): Column = ArrayOps.vecDot(a, a)

  /** cos(a,b) from precomputed squared norms. */
  def cosine(dot: Column, n2a: Column, n2b: Column): Column =
    dot / (sqrt(n2a) * sqrt(n2b))

  /** Brute-force cosine top-k: every query row against the full
    * corpus. The query side is expected to be small and is broadcast,
    * so the corpus streams map-side — no shuffle of the corpus at any
    * scale; only the per-query top-k heap aggregates.
    * @param queries (qid, vec) ; @param corpus (cid, vec)
    * @return qid, cid, rank (1..k), cos
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("qid"), col("vec").as("qvec"),
      norm2Seq(col("vec")).as("qn2"))
    val c = corpus.select(col("cid"), col("vec").as("cvec"),
      norm2Seq(col("vec")).as("cn2"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cos", cosine(dotSeq(col("qvec"), col("cvec")), col("qn2"), col("cn2")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"), col("cos"))
  }

  /** Matryoshka-style ADAPTIVE retrieval (the truncation property of
    * MRL-trained embeddings, Kusupati et al. 2022): stage 1 ranks by
    * cosine over only the FIRST `dims` dimensions — at 100 TB that is
    * the lever: the full-corpus scan touches dims/D of the vector
    * bytes (a 16-of-768 prefix reads ~2% of the data; with columnar
    * prefix storage the rest is never fetched) — then stage 2 exactly
    * rescores only the per-query `shortlist` survivors at full
    * dimensionality and re-ranks the final k.
    *
    * Stage 1 carries IDS only through the rank window; full vectors
    * re-join for the shortlist alone (the same survivors-only payload
    * discipline as the dedup verify stages). Recall is exactly 1 when
    * every true top-k member lands in the truncated shortlist —
    * guaranteed at shortlist = corpus size. The truncation contract
    * is MRL's: information front-loaded in the prefix dims. On such
    * corpora the spec measures recall >= 0.9 at 16-of-64 dims; on
    * ISOTROPIC random vectors it collapses (measured 0.22 on the
    * test fixture) — truncation is not a free lunch on unstructured
    * embeddings, and the spec pins both regimes honestly.
    *
    * @param queries (qid, vec) — small, broadcast; @param corpus (cid, vec)
    * @return qid, cid, rank (1..k), cos (full-dimension cosine)
    */
  def adaptiveTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                   dims: Int, shortlist: Int): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val qt = queries.select(col("qid"), slice(col("vec"), 1, dims).as("tv"))
      .withColumn("tn2", norm2Seq(col("tv")))
    val ct = corpus.select(col("cid"), slice(col("vec"), 1, dims).as("tv"))
      .withColumn("cn2", norm2Seq(col("tv")))
    val w1 = Window.partitionBy(col("qid")).orderBy(col("tcos").desc, col("cid"))
    val short = ct.crossJoin(broadcast(qt.select(col("qid"), col("tv").as("qtv"), col("tn2"))))
      .filter(col("qid") =!= col("cid"))
      .withColumn("tcos", cosine(dotSeq(col("qtv"), col("tv")), col("tn2"), col("cn2")))
      .withColumn("srank", row_number().over(w1))
      .filter(col("srank") <= shortlist)
      .select(col("qid"), col("cid"))
    val qv = queries.select(col("qid"), col("vec").as("qvec"),
      norm2Seq(col("vec")).as("qn2"))
    val cv = corpus.select(col("cid"), col("vec").as("cvec"),
      norm2Seq(col("vec")).as("cn2f"))
    val w2 = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    short.join(broadcast(qv), "qid").join(cv, "cid")
      .withColumn("cos", cosine(dotSeq(col("qvec"), col("cvec")), col("qn2"), col("cn2f")))
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"), col("cos"))
  }

  /** Random-projection retrieval (Johnson–Lindenstrauss sketch with
    * Achlioptas-style ±1 hashed signs — [[adaptiveTopK]]'s sibling
    * for embeddings with NO matryoshka prefix structure): stage 1
    * ranks by squared L2 distance between `projDims`-dim sign
    * projections (VecProjectSigns — one fused pass, signs from the
    * portable integer recurrence, no stored matrix, no RNG), stage 2
    * exactly rescores the per-query `shortlist` survivors at full
    * dimensionality by cosine.
    *
    * Scale shape: identical to adaptiveTopK — the projected corpus
    * scan reads projDims/D of the vector bandwidth (16-of-768 ≈ 2%),
    * the shortlist window carries IDS only, full vectors re-join for
    * survivors alone. Unlike truncation, JL's distance guarantee is
    * DISTRIBUTION-FREE: ‖Px−Py‖² concentrates around (k/d)‖x−y‖²
    * for any fixed vectors — the sketch sees structure WHEREVER it
    * sits, where truncation only sees the prefix dims. The spec pins
    * this on a tail-signal corpus (clusters living in dims 16..63):
    * truncation recall collapses to ~chance, projection stays ≥0.7.
    * (Neither sketch resolves a corpus with NO distance structure —
    * isotropic random cosines bunch within the JL distortion bound;
    * measured ~0.2 recall for both at 16-of-64. JL's edge is
    * indifference to where structure lives, not sub-distortion
    * resolution.)
    *
    * Determinism: projections are sequential d-order folds of exact
    * ±1 signs, the shortlist orders by (projected d², cid), and the
    * final ranking is the exact cosine — every stage restatable
    * bit-for-bit by the SQL oracle.
    *
    * @param queries (qid, vec) — small, broadcast; @param corpus (cid, vec)
    * @return qid, cid, rank (1..k), cos (full-dimension cosine)
    */
  def rpTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             projDims: Int, shortlist: Int): DataFrame = {
    require(projDims >= 1, s"projDims must be >= 1, got $projDims")
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val qp = queries.select(col("qid"),
      ArrayOps.projectSigns(col("vec"), projDims).as("qp"))
    val cp = corpus.select(col("cid"),
      ArrayOps.projectSigns(col("vec"), projDims).as("cp"))
    val w1 = Window.partitionBy(col("qid")).orderBy(col("pd2"), col("cid"))
    val short = cp.crossJoin(broadcast(qp))
      .filter(col("qid") =!= col("cid"))
      .withColumn("pd2", ArrayOps.vecL2Sq(col("qp"), col("cp")))
      .withColumn("srank", row_number().over(w1))
      .filter(col("srank") <= shortlist)
      .select(col("qid"), col("cid"))
    val qv = queries.select(col("qid"), col("vec").as("qvec"),
      norm2Seq(col("vec")).as("qn2"))
    val cv = corpus.select(col("cid"), col("vec").as("cvec"),
      norm2Seq(col("vec")).as("cn2f"))
    val w2 = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    short.join(broadcast(qv), "qid").join(cv, "cid")
      .withColumn("cos", cosine(dotSeq(col("qvec"), col("cvec")), col("qn2"), col("cn2f")))
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"), col("cos"))
  }

  /** Scalar 8-bit quantization retrieval (the SQ8 of FAISS/pgvector —
    * the STORAGE lever at 100 TB: a 768-dim float corpus is 3 KB/vec;
    * SQ8 is 768 B plus a 2-float-per-dim codebook, a 4× scan-
    * bandwidth cut with near-lossless recall on normalized
    * embeddings). Per-DIMENSION corpus min/max form the codebook
    * (one 2-value-per-dim aggregate, broadcast back);
    * code = floor((x-lo)/(hi-lo)·255) — floor, not round, because
    * IEEE specifies floor exactly while round ties differ across
    * engines, so the codes (and the gate) are bit-portable.
    * Search is ASYMMETRIC (full-precision query against dequantized
    * codes), the standard SQ trade.
    *
    * Scale note: this formulation materializes the dequantized
    * corpus through an explode + regroup so the oracle can restate
    * it; a production scan would decode inline per block. The
    * codebook aggregate and broadcast are the plan's only shuffle
    * beyond the top-k window.
    *
    * @return qid, cid, rank (1..k), cos (query vs dequantized corpus)
    */
  def sq8TopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val dims = corpus.select(col("cid"), posexplode(col("vec")))
      .select(col("cid"), (col("pos") + 1).as("d"), col("col").cast("double").as("x"))
    val stats = dims.groupBy(col("d")).agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val dq = dims.join(broadcast(stats), "d")
      .withColumn("v",
        when(col("hi") === col("lo"), col("lo"))
          .otherwise(col("lo") +
            floor((col("x") - col("lo")) / (col("hi") - col("lo")) * 255.0) / 255.0 *
              (col("hi") - col("lo"))))
      .groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("v")))),
        s => s.getField("v")).as("vec"))
    bruteForceTopK(
      queries.select(col("qid"),
        transform(col("vec"), x => x.cast("double")).as("vec")),
      dq.select(col("cid"), col("vec")), k)
  }

  /** Deterministic PQ codebook: split the D dims into `m` subspaces
    * of D/m; codeword j of every subspace is the j-th hash-picked
    * corpus row's subvector (the same portable mixer and (hk, cid)
    * order as [[pivotsOf]], so an independent engine picks the
    * identical rows). ks rows — driver-resident by definition, like
    * IVF centroids. Floats convert to double exactly before any
    * arithmetic.
    * @return cw(s)(j) = codeword j of subspace s (ds doubles)
    */
  private[graft] def pqCodebook(corpus: DataFrame, m: Int, ks: Int): Seq[Seq[Seq[Double]]] = {
    require(m >= 1 && ks >= 1, s"pq: m=$m ks=$ks must be >= 1")
    val rows = corpus
      .withColumn("hk", ((col("cid") % lit(1000000007L)) * lit(2654435761L)) % lit(4294967296L))
      .orderBy(col("hk"), col("cid")).limit(ks)
      .select(col("vec")).collect()
    require(rows.nonEmpty, "pq: empty corpus")
    val vecs: Seq[Seq[Double]] = rows.toSeq.map(_.getSeq[Any](0).map {
      case f: Float  => f.toDouble
      case d: Double => d
      case x => throw new IllegalArgumentException(
        s"pq: vec must be array<float|double>, got element $x")
    })
    val dims = vecs.head.length
    require(vecs.forall(_.length == dims), "pq: ragged vector lengths in codebook rows")
    require(dims % m == 0, s"pq: dims $dims not divisible by m=$m")
    val ds = dims / m
    (0 until m).map(s => vecs.map(_.slice(s * ds, s * ds + ds)))
  }

  /** TRAINED PQ codebook: per-subspace L2 k-means (classic Lloyd, the
    * FAISS IndexPQ training shape) seeded by [[pqCodebook]]'s
    * hash-picked rows — strictly the quality upgrade path: the gated
    * q81 stays pinned to the untrained codebook, and a deployment
    * runs this once to cut quantization distortion on real embedding
    * distributions.
    *
    * ALL m subspaces train simultaneously — per iteration:
    *  - ASSIGN is map-side: codewords ride the plan as literals and
    *    each row takes m codegen'd VecL2SqSeq argmins at its subspace
    *    offsets (the [[pqEncode]] expressions) — the corpus never
    *    shuffles;
    *  - UPDATE is ONE partial aggregate: posexplode(vec) keyed by
    *    (subspace, assigned code, dim-in-subspace) sums — map-side
    *    combine bounds the shuffle at dims·ks·partitions rows
    *    regardless of corpus size, and the driver collects exactly
    *    the dims·ks mean table each round (the [[trainKmeans]] loop
    *    shape).
    *  - Empty cells keep their previous codeword (deterministic).
    *
    * The returned history is the summed reconstruction error
    * Σ_rows Σ_s min_j ||row_sub(s) − cw(s)(j)||² under each
    * iteration's INCOMING codebook — non-increasing by the usual
    * Lloyd argument (each half-step can only lower it).
    *
    * @param corpus (cid, vec) — uniform dims, divisible by m
    * @return (cw(s)(j) like [[pqCodebook]], objective history)
    */
  def trainPqCodebook(corpus: DataFrame, m: Int, ks: Int, iters: Int = 5)
      : (Seq[Seq[Seq[Double]]], Seq[Double]) =
    trainPqCodebookFrom(corpus, pqCodebook(corpus, m, ks), iters)

  /** [[trainPqCodebook]] from an EXPLICIT seed codebook — the warm
    * restart an alternating optimizer (OPQ's rotate ↔ re-train loop)
    * needs so each round continues from the previous codebook
    * instead of re-seeding from hash-picked rows. */
  def trainPqCodebookFrom(corpus: DataFrame, cw0: Seq[Seq[Seq[Double]]],
                          iters: Int)
      : (Seq[Seq[Seq[Double]]], Seq[Double]) = {
    require(iters >= 1, s"pq train: iters must be >= 1, got $iters")
    var cw = cw0
    val m = cw.length
    val ks = cw.head.length
    val ds = cw.head.head.length
    // every Lloyd round re-reads the vectors: materialize once
    val base = corpus.select(col("cid"), col("vec")).localCheckpoint()
    val history = scala.collection.mutable.ArrayBuffer.empty[Double]
    var it = 0
    while (it < iters) {
      val perSub = (0 until m).map { s =>
        val cwS = typedlit(cw(s))
        val dists = transform(sequence(lit(0), lit(ks - 1)), j =>
          ArrayOps.vecL2Sq(col("vec"), element_at(cwS, j + lit(1)), s * ds))
        struct((array_position(dists, array_min(dists)) - 1).cast("int").as("c"),
          array_min(dists).as("d"))
      }
      // two selects so the argmin structs evaluate ONCE (Catalyst
      // declines to collapse projects that duplicate non-cheap
      // expressions — the q20 st_measures discipline)
      val assigned = base.select(col("vec"), array(perSub: _*).as("sd"))
        .select(col("vec"),
          transform(col("sd"), x => x.getField("c")).as("codes"),
          aggregate(transform(col("sd"), x => x.getField("d")),
            lit(0.0), (a, b) => a + b).as("__err"))
      val stats = assigned
        .select(col("codes"), col("__err"), posexplode(col("vec")))
        .withColumn("s", (col("pos") / ds).cast("int"))
        .groupBy(col("s"), element_at(col("codes"), col("s") + 1).as("c"),
          col("pos"))
        .agg(sum(col("col").cast("double")).as("sum"), count(lit(1)).as("n"),
          sum(col("__err")).as("obj"))
        .collect()
      // each (s=0, c, pos=0..ds-1) group of one cell sums the same
      // rows' __err; read the objective off the pos % ds == 0 groups
      // of subspace 0 (every row appears in exactly one s=0 cell)
      history += stats.filter(r => r.getAs[Int]("s") == 0 && r.getAs[Int]("pos") == 0)
        .map(_.getAs[Double]("obj")).sum
      val byCell = stats.groupBy(r => (r.getAs[Int]("s"), r.getAs[Int]("c")))
      cw = (0 until m).map { s =>
        (0 until ks).map { j =>
          byCell.get((s, j)) match {
            case None => cw(s)(j)
            case Some(rows) =>
              val n = rows.head.getAs[Long]("n").toDouble
              rows.sortBy(_.getAs[Int]("pos"))
                .map(_.getAs[Double]("sum") / n).toSeq
          }
        }
      }
      it += 1
    }
    (cw, history.toSeq)
  }

  /** [[pqTopK]] under an EXPLICIT codebook (e.g. a
    * [[trainPqCodebook]] result) — encode + ADC scan identical to the
    * gated path, only the codewords differ. */
  def pqTopKWith(queries: DataFrame, corpus: DataFrame, k: Int,
                 cw: Seq[Seq[Seq[Double]]]): DataFrame = {
    val m = cw.length; val ks = cw.head.length; val ds = cw.head.head.length
    val lut = flatten(array((0 until m).map { s =>
      transform(typedlit(cw(s)), cwv => ArrayOps.vecL2Sq(col("vec"), cwv, s * ds))
    }: _*))
    val q = queries.select(col("qid"), lut.as("lut"))
    val adist = (0 until m).map(s =>
      element_at(col("lut"), element_at(col("codes"), s + 1) + lit(s * ks + 1)))
      .reduce(_ + _)
    val scored = pqEncode(corpus, cw).crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .withColumn("adist", adist)
    val w = Window.partitionBy(col("qid")).orderBy(col("adist"), col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"), col("adist"))
  }

  /** PQ encoding: each corpus vector becomes `m` small codes — code s
    * is the argmin-L2 codeword of subspace s (ties by codeword index,
    * first occurrence). ONE map-side pass over literal codewords (the
    * ivfAssign discipline: the corpus never shuffles, no ks-fold row
    * replication); per-subspace distances are sequential left folds
    * in dim order, so the codes are bit-portable. The codes column IS
    * the stored corpus of a PQ deployment: m bytes/vector at ks<=256
    * vs 4·D for raw floats — 32× at D=64, m=8.
    * @param corpus (cid, vec) ; @return (cid, codes: array<int>, 0-based)
    */
  def pqEncode(corpus: DataFrame, cw: Seq[Seq[Seq[Double]]]): DataFrame = {
    val m = cw.length; val ks = cw.head.length; val ds = cw.head.head.length
    // m is a static Int, so the subspace loop unrolls into plain
    // column expressions and each per-codeword fold is the codegen'd
    // VecL2SqSeq reading the subvector AT ITS OFFSET — zero slice
    // copies, no per-element lambda interpretation, float widening
    // inside the fold (the identical IEEE sequence the HOF chain
    // produced; stress-measured 76.7 s → see BENCH.md for the after).
    val codes = array((0 until m).map { s =>
      val cwS = typedlit(cw(s))
      val dists = transform(sequence(lit(0), lit(ks - 1)), j =>
        ArrayOps.vecL2Sq(col("vec"), element_at(cwS, j + lit(1)), s * ds))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }: _*)
    corpus.select(col("cid"), codes.as("codes"))
  }

  /** IVF-ADC with RESIDUAL product quantization (Jégou et al. 2011
    * §IV — the composition a FAISS `IndexIVFPQ` runs, and the
    * production ANN index shape: coarse centroids partition the
    * corpus into inverted lists, PQ encodes each vector's RESIDUAL
    * from its list centroid, and a query scans only its `nprobe`
    * nearest lists with a per-list ADC table built over the QUERY
    * residual). Residual encoding is the point of the composition:
    * residuals have far less variance than raw vectors, so the same
    * m·log2(ks) bits buy a finer quantization — spec-measured
    * against plain [[pqTopKWith]] at identical code budget.
    *
    * Metric is squared L2 end-to-end (assignment, LUT, ranking) —
    * the ADC metric; the cosine [[ivfTopK]] family is a different
    * contract. Centroid ties break on the FIRST centroid in the
    * given order (argmin via array_position), query probe ties by
    * centroid position; ranking ties by cid — deterministic.
    *
    * Scale shape: centroids and codebook ride the plan as literals
    * (driver-resident by definition of IVF); corpus assignment +
    * residual + encode are ONE map-side pass (the corpus never
    * shuffles); queries explode only over nlist (bounded) to pick
    * probes, build one LUT per (query, probed list) on the broadcast
    * side, and the join lands each query row on exactly its nprobe
    * lists — scan cost is corpus/nlist · nprobe per query, the IVF
    * contract. Final rank is the standard top-k window
    * (WindowGroupLimit bounds the shuffle at O(queries·k)).
    *
    * @param centroids coarse quantizer, e.g. a [[trainKmeans]] result
    * @param cw        PQ codebook trained on RESIDUALS (see spec for
    *                  the train-on-residuals recipe)
    * @return qid, cid, rank (1..k), adist (squared L2 approximation)
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                centroids: Seq[(Long, Seq[Double])],
                cw: Seq[Seq[Seq[Double]]], nprobe: Int = 4): DataFrame = {
    require(centroids.nonEmpty, "ivfPqTopK: centroids must be non-empty")
    val m = cw.length; val ks = cw.head.length; val ds = cw.head.head.length
    val nlist = centroids.length
    val np = math.min(nprobe, nlist)
    val cents = typedlit(centroids.map(_._2))
    val centIds = typedlit(centroids.map(_._1))
    def centDists(vecCol: Column): Column =
      transform(sequence(lit(0), lit(nlist - 1)), j =>
        ArrayOps.vecL2Sq(vecCol, element_at(cents, j + lit(1)), 0))
    def resCodes: Column = array((0 until m).map { s =>
      val cwS = typedlit(cw(s))
      val dd = transform(sequence(lit(0), lit(ks - 1)), j =>
        ArrayOps.vecL2Sq(col("res"), element_at(cwS, j + lit(1)), s * ds))
      (array_position(dd, array_min(dd)) - 1).cast("int")
    }: _*)

    val enc = corpus
      .select(col("cid"), col("vec").cast("array<double>").as("vec"))
      .withColumn("__d", centDists(col("vec")))
      .withColumn("__idx",
        (array_position(col("__d"), array_min(col("__d"))) - 1).cast("int"))
      .withColumn("list_id", element_at(centIds, col("__idx") + 1))
      .withColumn("res", zip_with(col("vec"),
        element_at(cents, col("__idx") + 1), (a, b) => a - b))
      .select(col("cid"), col("list_id"), resCodes.as("codes"))

    val qp = queries
      .select(col("qid"), col("vec").cast("array<double>").as("vec"))
      .select(col("qid"), col("vec"), posexplode(centDists(col("vec"))))
    val wp = Window.partitionBy(col("qid")).orderBy(col("col"), col("pos"))
    val luts = qp.withColumn("__rk", row_number().over(wp))
      .filter(col("__rk") <= np)
      .withColumn("list_id", element_at(centIds, col("pos").cast("int") + 1))
      .withColumn("res", zip_with(col("vec"),
        element_at(cents, col("pos").cast("int") + 1), (a, b) => a - b))
      .withColumn("lut", flatten(array((0 until m).map { s =>
        transform(typedlit(cw(s)), cwv => ArrayOps.vecL2Sq(col("res"), cwv, s * ds))
      }: _*)))
      .select(col("qid"), col("list_id"), col("lut"))

    val adist = (0 until m).map(s =>
      element_at(col("lut"), element_at(col("codes"), s + 1) + lit(s * ks + 1)))
      .reduce(_ + _)
    val scored = enc.join(broadcast(luts), "list_id")
      .filter(col("qid") =!= col("cid"))
      .withColumn("adist", adist)
    val w = Window.partitionBy(col("qid")).orderBy(col("adist"), col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"), col("adist"))
  }

  /** The train-on-residuals companion of [[ivfPqTopK]]: assign every
    * corpus vector to its nearest centroid (L2, same tie rule),
    * subtract, and return the residual frame (cid, vec) ready for
    * [[trainPqCodebook]]. One map-side pass. */
  def residualFrame(corpus: DataFrame,
                    centroids: Seq[(Long, Seq[Double])]): DataFrame = {
    require(centroids.nonEmpty, "residualFrame: centroids must be non-empty")
    val nlist = centroids.length
    val cents = typedlit(centroids.map(_._2))
    val dists = transform(sequence(lit(0), lit(nlist - 1)), j =>
      ArrayOps.vecL2Sq(col("vec"), element_at(cents, j + lit(1)), 0))
    corpus.select(col("cid"), col("vec").cast("array<double>").as("vec"))
      .withColumn("__d", dists)
      .withColumn("__idx",
        (array_position(col("__d"), array_min(col("__d"))) - 1).cast("int"))
      .select(col("cid"), zip_with(col("vec"),
        element_at(cents, col("__idx") + 1), (a, b) => a - b).as("vec"))
  }

  /** Product-quantization retrieval (Jégou et al. 2011 — the OTHER
    * FAISS storage lever beside SQ8): corpus encoded by [[pqEncode]]
    * under a [[pqCodebook]], queries score each item ASYMMETRICALLY
    * (full-precision query vs the code reconstruction) via the
    * classic ADC lookup table. Each query precomputes a flat m·ks
    * table — lut[s·ks + j] = ||q_sub(s) − cw(s)(j)||², a sequential
    * left fold in dim order — and the per-pair distance is then m
    * `element_at` lookups summed left-to-right: plain codegen'd
    * array indexing, no per-pair lambda over D dims. (The r5 stress
    * run measured the naive full-vector fold at 595 s for 500×50k;
    * the LUT scan is the shape a FAISS IndexPQ search actually runs.)
    * Ranking is adist ascending, ties by cid; the oracle restates the
    * same grouping — per-subspace folds, then a left fold over s — so
    * the gate stays bit-for-bit.
    *
    * Codewords are hash-picked corpus rows (the q42 pivot trick:
    * deterministic, zero training passes, oracle-replayable);
    * [[trainKmeans]] per subspace is the quality upgrade a deployment
    * would run once — the gated path stays pinned.
    *
    * Scale shape: codebook broadcast as literals; encode is map-side;
    * LUTs are built once per query row (m·ks·(D/m) work on the tiny
    * broadcast side) and the rank stage is the standard
    * broadcast-query top-k window over the corpus (WindowGroupLimit
    * keeps the shuffle at O(partitions·queries·k)). Nothing shuffles
    * except the final O(queries·k) rows.
    * @return qid, cid, rank (1..k), adist (squared L2 to reconstruction)
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             m: Int = 8, ks: Int = 16): DataFrame =
    pqTopKWith(queries, corpus, k, pqCodebook(corpus, m, ks))

  /** Semantic benchmark-contamination screen: every corpus doc's
    * NEAREST benchmark item by embedding cosine, plus the >= tau
    * verdict — the embedding-side counterpart of the n-gram
    * decontamination family (q37/q76: shared shingles; here: shared
    * meaning, which survives paraphrase). A screening REPORT rather
    * than a pair miner: one row per corpus doc, so an honest all-clear
    * corpus still exercises the whole plan (the q74 discipline).
    *
    * Scale shape: the bench side is eval-sized — it BROADCASTS; the
    * corpus scores map-side, and the per-doc argmax collapses in the
    * partial aggregate (min of a (-cos, bid) struct, so ties break
    * toward the smallest bid deterministically) — the shuffle carries
    * ONE struct per corpus doc, never the bench fan-out. A bench too
    * big to broadcast is the cross-corpus LSH regime (cosineNearDup
    * machinery), not this operator.
    *
    * @param corpus (cid, vec) ; @param bench (bid, vec) — small, broadcast
    * @return cid, bid (nearest bench item), cos, contaminated
    */
  def semanticScreen(corpus: DataFrame, bench: DataFrame, threshold: Double): DataFrame = {
    val b = bench.select(col("bid"), col("vec").as("bvec"), norm2Seq(col("vec")).as("bn2"))
    val c = corpus.select(col("cid"), col("vec").as("cvec"), norm2Seq(col("vec")).as("cn2"))
    c.crossJoin(broadcast(b))
      .withColumn("cos", cosine(dotSeq(col("cvec"), col("bvec")), col("cn2"), col("bn2")))
      .groupBy(col("cid"))
      .agg(min(struct((-col("cos")).as("nc"), col("bid").as("b"))).as("m"))
      .select(col("cid"), col("m.b").as("bid"), (-col("m.nc")).as("cos"),
        ((-col("m.nc")) >= threshold).as("contaminated"))
  }

  /** Deterministic pseudo-random hyperplane component for plane p,
    * dimension d: a +/-1 from a PORTABLE two-round multiplicative
    * mixer (Knuth constant, xor-fold, LCG round) over k = p*4096+d+1.
    * Chosen over xxhash64 deliberately: every operation is plain
    * 64-bit integer arithmetic with no overflow below k < 2^31, so an
    * independent engine (the DuckDB oracle, a Python check) can
    * reproduce the exact sign matrix — which makes the ANN queries
    * fully hash-checkable instead of rows-only. Dimension cap 4096
    * keeps (p, d) keys collision-free. */
  private[graft] def hyperplaneSign(p: Column, d: Column): Column = {
    val k = p.cast("long") * lit(4096L) + d.cast("long") + lit(1L)
    val h1 = (k * lit(2654435761L)) % lit(4294967296L)
    val m = h1.bitwiseXOR(shiftright(h1, 15)).bitwiseAND(lit(2147483647L))
    val h2 = (m * lit(1103515245L) + lit(12345L)) % lit(2147483648L)
    when(h2 >= lit(1073741824L), 1.0).otherwise(-1.0)
  }

  /** Random-hyperplane LSH bucket id for one hash table: `planes`
    * sign bits packed into a long; `tableOffset` seeds distinct
    * hyperplanes per table. P(bit agrees) = 1 - theta/pi. */
  def lshBucket(vec: Column, planes: Int, tableOffset: Column): Column =
    aggregate(
      transform(sequence(lit(0), lit(planes - 1)), p => {
        val dot = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, d) => x.cast("double") * hyperplaneSign(tableOffset + p, d)),
          lit(0.0), (acc, x) => acc + x)
        when(dot > 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))
      }),
      lit(0L), (acc, x) => acc.bitwiseOR(x))

  /** Multi-table ANN top-k: `tables` independent hyperplane tables of
    * `planes` bits; candidates = bucket collisions in any table
    * (queries additionally probe all 1-bit flips), exact cosine over
    * the deduped candidate set.
    *
    * Recall/cost dial: collision prob per table at angle theta is
    * p^b + b*p^(b-1)*(1-p) with p = 1 - theta/pi, overall
    * 1-(1-...)^tables. Defaults (4 bits x 8 tables) target moderate-
    * similarity corpora; tighten (more bits, fewer probes) when
    * neighbours are closer. Scale shape: the join shuffles on
    * (table, bucket) ids only — vectors never cross the wire except
    * for surviving candidates.
    * @return qid, cid, rank, cos — approximate (recall pinned in spec)
    */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              planes: Int = 4, tables: Int = 8, multiprobe: Boolean = true): DataFrame = {
    // all table buckets in one codegen'd pass over each vector
    // (VecHyperplaneBuckets — same signs/folds as lshBucket)
    val c = corpus.select(col("cid"),
        posexplode(ArrayOps.hyperplaneBuckets(col("vec"), planes, tables))
          .as(Seq("table", "bucket")))
    val qProbes = queries.select(col("qid"),
        posexplode(ArrayOps.hyperplaneBuckets(col("vec"), planes, tables))
          .as(Seq("table", "qb")))
    val probes =
      if (!multiprobe) qProbes.withColumn("bucket", col("qb"))
      else qProbes.withColumn("bucket",
        explode(concat(array(col("qb")),
          transform(sequence(lit(0), lit(planes - 1)),
            p => col("qb").bitwiseXOR(call_function("shiftleft", lit(1L), p))))))
    // candidate ids dedup first — vectors never ride the bucket join
    // or the distinct shuffle; they join back only for survivors
    val candIds = probes.join(c, Seq("table", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"))
      .distinct()
    val q = queries.select(col("qid"), col("vec").as("qvec"), norm2Seq(col("vec")).as("qn2"))
    val cv = corpus.select(col("cid"), col("vec").as("cvec"), norm2Seq(col("vec")).as("cn2"))
    val scored = candIds.join(cv, "cid").join(broadcast(q), "qid")
      .withColumn("cos", cosine(dotSeq(col("qvec"), col("cvec")), col("qn2"), col("cn2")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"), col("cos"))
  }

  /** IVF-style ANN top-k: a deterministic pivot sample plays the role
    * of k-means centroids (hash-selected corpus vectors — no training
    * pass, reproducible); every corpus vector is assigned to its
    * nearest pivot ("inverted list"), queries probe the `nprobe`
    * nearest pivots and score only those lists exactly.
    *
    * Scale shape: pivots are a broadcast-sized sample; assignment is
    * one map-side pass; the probe join shuffles on pivot id only. The
    * recall/cost dial is (nlist, nprobe) — classic IVF semantics
    * without a clustering dependency.
    * @param queries (qid, vec) ; @param corpus (cid, vec)
    */
  /** Deterministic pivot sample for the IVF family: the nlist
    * smallest corpus rows under a portable multiplicative hash of the
    * id (ties broken by id) — same engine-independence rationale as
    * hyperplaneSign: the oracle can pick the identical pivots, so IVF
    * output is hash-checkable. The % 1000000007 pre-fold keeps the
    * product overflow-free for any non-negative 64-bit id under ANSI
    * mode. Broadcast-sized by construction (nlist rows).
    * @param corpus (cid, vec) ; @return (pivot_id, pvec, pn2)
    */
  private def pivotsOf(corpus: DataFrame, nlist: Int): DataFrame =
    corpus
      .withColumn("hk", ((col("cid") % lit(1000000007L)) * lit(2654435761L)) % lit(4294967296L))
      .orderBy(col("hk"), col("cid")).limit(nlist)
      .select(col("cid").as("pivot_id"), col("vec").as("pvec"),
        norm2Seq(col("vec")).as("pn2"))

  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4): DataFrame =
    ivfTopKOver(queries, corpus, k, pivotsOf(corpus, nlist), nprobe)

  /** [[ivfTopK]] with TRAINED centroids (see [[trainKmeans]]) in
    * place of the hash-pivot sample — identical probe mechanics, but
    * list boundaries now follow the learned cluster structure, which
    * is what recall at a fixed nprobe tracks. The gated q42 path
    * stays on the pinned hash pivots; this is the quality upgrade a
    * real deployment trains once and reuses. */
  def ivfTopKWith(queries: DataFrame, corpus: DataFrame, k: Int,
                  centroids: Seq[(Long, Seq[Double])], nprobe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val pivots = centroids.map { case (id, v) => (id, v, v.map(x => x * x).sum) }
      .toDF("pivot_id", "pvec", "pn2")
    ivfTopKOver(queries, corpus, k, pivots, nprobe)
  }

  private def ivfTopKOver(queries: DataFrame, corpus: DataFrame, k: Int,
                          pivots: DataFrame, nprobe: Int): DataFrame = {

    def nearestPivots(side: DataFrame, vecCol: String, n2Col: String, n: Int,
                      outCol: String): DataFrame = {
      val w = Window.partitionBy(col("__rid")).orderBy(col("pcos").desc, col("pivot_id"))
      side.crossJoin(broadcast(pivots))
        .withColumn("pcos", cosine(dotSeq(col(vecCol), col("pvec")), col(n2Col), col("pn2")))
        .withColumn("__rank", row_number().over(w))
        .filter(col("__rank") <= n)
        .withColumn(outCol, col("pivot_id"))
        .drop("pvec", "pn2", "pcos", "__rank", "pivot_id")
    }

    val c = nearestPivots(
      corpus.select(col("cid").as("__rid"), col("vec").as("cvec"),
        norm2Seq(col("vec")).as("cn2")), "cvec", "cn2", 1, "list_id")
      .select(col("__rid").as("cid"), col("cvec"), col("cn2"), col("list_id"))
    val q = nearestPivots(
      queries.select(col("qid").as("__rid"), col("vec").as("qvec"),
        norm2Seq(col("vec")).as("qn2")), "qvec", "qn2", nprobe, "list_id")
      .select(col("__rid").as("qid"), col("qvec"), col("qn2"), col("list_id"))

    val scored = q.join(c, "list_id")
      .filter(col("qid") =!= col("cid"))
      .withColumn("cos", cosine(dotSeq(col("qvec"), col("cvec")), col("qn2"), col("cn2")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"), col("cos"))
  }

  /** Nearest-pivot cluster assignment — the "coarse quantizer" half
    * of IVF as a standalone operator: every corpus vector labeled with
    * its nearest of [[pivotsOf]]'s nlist deterministic pivots (cosine;
    * ties by pivot_id). One broadcast + one map-side pass — the
    * corpus never shuffles.
    * @param corpus (id, vec) ; @return (id, vec, block = pivot id)
    */
  def ivfAssign(corpus: DataFrame, nlist: Int = 16): DataFrame = {
    // The pivot table is bounded at nlist rows (a TakeOrdered over the
    // hash keys) and IVF centroids are by definition driver-resident —
    // collecting them turns assignment into a PURE MAP-SIDE argmax
    // expression over literal vectors: zero shuffle of the corpus, no
    // nlist-fold replication riding a window (the join formulation
    // would shuffle every vector nlist times).
    val pivots = pivotsOf(corpus.select(col("id").as("cid"), col("vec")), nlist)
      .collect()
    if (pivots.isEmpty)
      return corpus.select(col("id"), col("vec"), lit(null).cast("long").as("block")).limit(0)
    // vec_dot accepts array<float> AND array<double> — mirror that
    // here (a float-only getSeq would crash the double case every
    // sibling operator supports)
    val isFloat = corpus.schema(corpus.schema.fieldIndex("vec")).dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => true
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, _) => false
      case t => throw new IllegalArgumentException(
        s"vec must be array<float> or array<double>, got $t")
    }
    def pvecLit(r: org.apache.spark.sql.Row): Column =
      if (isFloat) typedlit(r.getSeq[Float](1)) else typedlit(r.getSeq[Double](1))
    // pivots SORTED BY ID, cosines as one flat array: the first
    // position holding the max is then exactly the (cos desc,
    // pivot_id asc) winner the oracle's row_number restates. A
    // running-max fold of nested when(...).otherwise(acc) would copy
    // the accumulated subtree 3x per pivot — exponential expression
    // size (measured: a 26 MiB task binary at nlist = 8).
    val sorted = pivots.toSeq.map { r =>
      (r.getLong(0), pvecLit(r), r.getDouble(2))
    }.sortBy(_._1)
    val cosArr = array(sorted.map { case (_, pvec, pn2) =>
      cosine(dotSeq(col("vec"), pvec), col("__n2"), lit(pn2))
    }: _*)
    val block = element_at(typedlit(sorted.map(_._1)),
      array_position(cosArr, array_max(cosArr)).cast("int"))
    corpus.select(col("id"), col("vec"), norm2Seq(col("vec")).as("__n2"))
      .withColumn("block", block)
      .select(col("id"), col("vec"), col("block"))
  }

  /** Cosine argmax array over literal centroid vectors — expects the
    * caller's frame to carry `vec` and `__n2`. Flat array +
    * array_max/array_position (NOT a when-fold running max — that
    * copies the accumulated subtree 3x per centroid, exponential
    * expression size). */
  private def centroidCosArr(sorted: Seq[(Long, Seq[Double])]): Column =
    array(sorted.map { case (_, cv) =>
      cosine(dotSeq(col("vec"), typedlit(cv)), col("__n2"), lit(cv.map(x => x * x).sum))
    }: _*)

  /** [[ivfAssign]] with TRAINED centroids: the same zero-shuffle
    * map-side argmax, over learned cluster centers instead of the
    * hash-pivot sample. Ties break toward the lowest centroid id. */
  def ivfAssignWith(corpus: DataFrame, centroids: Seq[(Long, Seq[Double])]): DataFrame = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    val sorted = centroids.sortBy(_._1)
    val cosArr = centroidCosArr(sorted)
    val block = element_at(typedlit(sorted.map(_._1)),
      array_position(cosArr, array_max(cosArr)).cast("int"))
    corpus.select(col("id"), col("vec"), norm2Seq(col("vec")).as("__n2"))
      .withColumn("block", block)
      .select(col("id"), col("vec"), col("block"))
  }

  /** Spherical k-means (Lloyd) training for the IVF family's coarse
    * quantizer, seeded by [[pivotsOf]]'s deterministic hash pivots —
    * reproducible on any cluster size with zero RNG plumbing, and
    * strictly an upgrade path: the gated q42/q44 queries stay pinned
    * to the untrained pivots.
    *
    * Per iteration (classic distributed Lloyd):
    *  - ASSIGN is map-side: the nlist centroids ride the plan as
    *    literals (driver-resident by definition) and every vector
    *    takes a codegen'd cosine argmax — the corpus never shuffles;
    *  - UPDATE is ONE partial aggregate: per-(cluster, dim) sums of
    *    the unit vectors x/|x|. The spherical update — the mean
    *    DIRECTION maximizes the summed cosine for a fixed assignment
    *    (Cauchy-Schwarz), which is what makes the objective monotone;
    *    a raw mean of unnormalized vectors would not be. Map-side
    *    combine bounds the shuffle at nlist x dim x partitions rows
    *    regardless of corpus size, and the driver collects exactly
    *    the nlist x dim centroid table each round.
    *  - Empty clusters keep their previous centroid; a zero summed
    *    direction does too (both deterministic).
    *
    * Zero-norm vectors are excluded from training (their cosine is
    * undefined). The returned objective history J_t = sum over rows
    * of (1 - cos(x, nearest centroid)) under iteration t's centroids
    * is non-increasing: neither reassignment nor the spherical
    * update can raise it.
    *
    * @param corpus (id, vec)
    * @return (centroids sorted by seed pivot id: (id, direction),
    *         objective history, one entry per iteration)
    */
  def trainKmeans(corpus: DataFrame, nlist: Int = 16, iters: Int = 10)
      : (Seq[(Long, Seq[Double])], Seq[Double]) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // materialize ONCE: every Lloyd round re-reads (vec, n2); without
    // this the source scan + norm recompute runs `iters` times (the
    // standard cache-the-input k-means discipline). Zero-norm rows
    // are excluded BEFORE seeding too — cosine to a zero vector is
    // undefined, so one must never become a centroid.
    val base = corpus.select(col("id"), col("vec"), norm2Seq(col("vec")).as("__n2"))
      .filter(col("__n2") > 0)
      .localCheckpoint()
    val pivotFrame = pivotsOf(base.select(col("id").as("cid"), col("vec")), nlist)
    val seedFloat = pivotFrame.schema("pvec").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => true
      case _ => false
    }
    val seedRows = pivotFrame.collect()
    require(seedRows.nonEmpty, "corpus has no nonzero vectors")
    var cents: Seq[(Long, Seq[Double])] = seedRows.toSeq.map { r =>
      val v: Seq[Double] =
        if (seedFloat) r.getSeq[Float](1).map(_.toDouble) else r.getSeq[Double](1)
      (r.getLong(0), v)
    }.sortBy(_._1)
    val history = scala.collection.mutable.ArrayBuffer.empty[Double]
    var it = 0
    while (it < iters) {
      val cosArr = centroidCosArr(cents)
      val assigned = base
        .withColumn("__cos", array_max(cosArr))
        .withColumn("__blk", element_at(typedlit(cents.map(_._1)),
          array_position(cosArr, array_max(cosArr)).cast("int")))
      val stats = assigned
        .select(col("__blk"), col("__cos"), col("__n2"), posexplode(col("vec")))
        .groupBy(col("__blk"), col("pos"))
        .agg(sum(col("col").cast("double") / sqrt(col("__n2"))).as("s"),
          count(lit(1)).as("n"),
          sum(lit(1.0) - col("__cos")).as("obj"))
        .collect()
      // every pos-group of a cluster sums the same rows' (1 - cos):
      // read the objective off the pos = 0 groups
      history += stats.filter(_.getAs[Int]("pos") == 0)
        .map(_.getAs[Double]("obj")).sum
      val byBlk = stats.groupBy(_.getAs[Long]("__blk"))
      cents = cents.map { case (cid, old) =>
        byBlk.get(cid) match {
          case None => (cid, old)
          case Some(rows) =>
            val n = rows.head.getAs[Long]("n").toDouble
            val dir = rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("s") / n).toSeq
            if (dir.map(x => x * x).sum <= 0) (cid, old) else (cid, dir)
        }
      }
      it += 1
    }
    (cents, history.toSeq)
  }

  /** [[semanticNearDup]] with TRAINED centroids — SemDeDup over the
    * learned cluster structure; recall of within-cluster mining rises
    * with centroid quality while the mechanics stay identical. */
  def semanticNearDupWith(corpus: DataFrame, threshold: Double,
                          centroids: Seq[(Long, Seq[Double])],
                          blockBudget: Long = 100000, planes: Int = 0,
                          tables: Int = 30): DataFrame =
    cosineNearDup(ivfAssignWith(corpus, centroids).localCheckpoint(), threshold,
      blockBudget, planes, tables)

  /** SemDeDup-style semantic near-dup pairs: cluster the corpus by
    * nearest deterministic pivot ([[ivfAssign]] — the IVF coarse
    * quantizer standing in for k-means, no training pass), then mine
    * cosine >= threshold pairs WITHIN clusters via [[cosineNearDup]]
    * (which size-dispatches oversized clusters to in-block LSH). The
    * pair space shrinks from O(n²) to Σ cluster², and near-identical
    * embeddings land in the same cluster except at pivot-boundary
    * ties — the standard semantic-dedup recall trade. Feed the pairs
    * to Dedup.connectedComponents for cluster representatives.
    * @param corpus (id, vec) ; @return block, i, j, cos >= threshold
    */
  def semanticNearDup(corpus: DataFrame, threshold: Double, nlist: Int = 16,
                      blockBudget: Long = 100000, planes: Int = 0,
                      tables: Int = 30): DataFrame =
    // checkpoint the assignment: cosineNearDup reads its input 3+
    // times (size aggregate + both join sides) and the per-row
    // nlist-cosine argmax is worth computing once, not per consumer
    cosineNearDup(ivfAssign(corpus, nlist).localCheckpoint(), threshold,
      blockBudget, planes, tables)

  /** Embedding-cosine near-duplicate pairs within same-`blockCol`
    * blocks, with a SIZE-DISPATCHED pair space: blocks up to
    * `blockBudget` rows take the exact all-pairs block join (the pair
    * space is bounded by budget² per block), while larger blocks —
    * where all-pairs degenerates to O(block²) on a single key, the
    * scale-killer on skewed label distributions — switch to
    * hyperplane-LSH bucketing WITHIN the block: candidates share a
    * (table, bucket) collision in any of `tables` tables, then exact
    * cosine verification. Mirrors dedupCorpus's cost dispatch.
    *
    * The LSH path's miss probability at similarity cos>=t is
    * (1 - p^planes)^tables with p = 1 - acos(t)/pi; at 10 planes x
    * 30 tables that is ~8e-4 at t=0.9 while random pairs (p~0.5)
    * collide anywhere with prob ~3% — a ~30x candidate reduction.
    * Both paths are deterministic (portable sign matrix), so even the
    * LSH path is reproducible by an independent engine.
    *
    * `planes = 0` (the default) AUTO-SCALES the bit width to
    * max(10, ceil(log2(maxHotBlock))) from the same size aggregate
    * the dispatch already runs: bucket occupancy is c/2^planes, so a
    * fixed width re-enters the quadratic in-bucket regime once a
    * single block reaches ~2^planes rows (~10M at 2x for width 10) —
    * scaling planes with log2(c) pins occupancy ~constant at any
    * block size. `tables` then rescales (capped at 20x the passed
    * value) to hold the 10x30 design point's miss probability at the
    * given threshold — wider buckets alone would trade the quadratic
    * regime for recall loss. Passing planes > 0 pins the sign matrix
    * and table count instead (the oracle-facing q43 restates the
    * 6-plane matrix in SQL).
    *
    * @param df (id, vec, block) ; @return block, i, j, cos >= threshold
    */
  def cosineNearDup(df: DataFrame, threshold: Double, blockBudget: Long = 100000,
                    planes: Int = 0, tables: Int = 30): DataFrame = {
    val v = df.select(col("id"), col("vec"), col("block"),
      norm2Seq(col("vec")).as("n2"))
    // hot blocks: one tiny aggregate (<= n/budget entries),
    // checkpointed — it feeds the max-size scalar plus both
    // dispatch joins, and it is broadcast-sized by construction
    val hotCounts = v.groupBy(col("block")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > blockBudget)
      .localCheckpoint()
    val hotSet = hotCounts.select(col("block"))
    val cold = v.join(broadcast(hotSet), Seq("block"), "left_anti")
    val hot = v.join(broadcast(hotSet), Seq("block"), "left_semi")

    val coldPairs = {
      val a = cold.select(col("id").as("i"), col("vec").as("va"),
        col("block"), col("n2").as("n2a"))
      val b = cold.select(col("id").as("j"), col("vec").as("vb"),
        col("block"), col("n2").as("n2b"))
      a.join(b, Seq("block"))
        .filter(col("i") < col("j"))
        .withColumn("cos", cosine(dotSeq(col("va"), col("vb")), col("n2a"), col("n2b")))
        .filter(col("cos") >= threshold)
        .select(col("block"), col("i"), col("j"), col("cos"))
    }

    // The hot machinery only materializes when a hot block exists
    // (one scalar over the checkpointed counts) — the common
    // small-block case pays nothing beyond the size aggregate.
    val Array(maxHotRow) = hotCounts.agg(max(col("cnt"))).collect()
    if (maxHotRow.isNullAt(0)) return coldPairs

    val (hotPlanes, hotTables) =
      if (planes > 0) (planes, tables)
      else {
        val c = maxHotRow.getLong(0)
        val p = math.max(10, 64 - java.lang.Long.numberOfLeadingZeros(c - 1))
        // Wider buckets agree on fewer pairs per table, so holding
        // the miss rate needs more tables — rescale to the 10-plane
        // design point's miss probability at THIS threshold:
        // miss = (1 - q^planes)^tables, q = 1 - acos(t)/pi. The
        // capped growth is still a huge net win: per-bucket join
        // volume scales by tables/2^planes, so e.g. (16, 76) costs
        // ~4% of (10, 30) on a width-10-saturating block.
        val q = 1.0 - math.acos(math.min(math.max(threshold, -1.0), 1.0)) / math.Pi
        val missTarget = math.pow(1.0 - math.pow(q, 10), tables.toDouble)
        val rescaled =
          if (p == 10) tables
          else math.ceil(math.log(missTarget) / math.log(1.0 - math.pow(q, p))).toInt
        (p, math.min(math.max(rescaled, tables), tables * 20))
      }

    val hotPairs = {
      // checkpoint the hot side once: it feeds the bucket frame and
      // both verify sides, and the bucket frame self-joins — without
      // the cut each consumer recomputes the buckets/norms lineage
      val hotCp = hot.localCheckpoint()
      // bucket ids only ride the collision join; vectors join back
      // for surviving candidate pairs (same plan shape as annTopK)
      val bk = hotCp.select(col("id"), col("block"),
          posexplode(ArrayOps.hyperplaneBuckets(col("vec"), hotPlanes, hotTables))
            .as(Seq("table", "bucket")))
        .localCheckpoint()
      val candIds = bk.select(col("block"), col("table"), col("bucket"), col("id").as("i"))
        .join(bk.select(col("block"), col("table"), col("bucket"), col("id").as("j")),
          Seq("block", "table", "bucket"))
        .filter(col("i") < col("j"))
        .select(col("block"), col("i"), col("j"))
        .distinct()
      val a = hotCp.select(col("id").as("i"), col("block"),
        col("vec").as("va"), col("n2").as("n2a"))
      val b = hotCp.select(col("id").as("j"), col("block"),
        col("vec").as("vb"), col("n2").as("n2b"))
      candIds.join(a, Seq("block", "i")).join(b, Seq("block", "j"))
        .withColumn("cos", cosine(dotSeq(col("va"), col("vb")), col("n2a"), col("n2b")))
        .filter(col("cos") >= threshold)
        .select(col("block"), col("i"), col("j"), col("cos"))
    }

    coldPairs.unionAll(hotPairs)
  }
}
