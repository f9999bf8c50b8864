package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FIXED-POINT integer IVF-PQ — the end-to-end gated counterpart of
  * [[Similarity.ivfPqTopK]] (the r7 verdict's task #2: "the one major
  * trained path still spec-only"). Composes the two already-gated
  * integer trainers: [[KmeansFixed]]'s fixed-point Lloyd as the
  * coarse quantizer (q138's replayable rounds) and q81's hash-picked
  * codebook trick on the RESIDUALS — so every number in the index
  * (coarse assignment, residual codes, ADC distances, the final
  * top-k under nprobe) is an exact int64 a DuckDB oracle restates
  * bit-for-bit. [[Similarity.ivfPqTopK]] stays the float PRODUCTION
  * path; this is the gate-tier twin, exactly the q59/q138 split.
  *
  * Pinned arithmetic (all integer, all engine-agnostic):
  *  - quantize: iv_d = floor(v_d · 1024 + 0.5) (the q138 grid);
  *  - coarse: k-cluster fixed-point Lloyd, ties to the smaller
  *    cluster index; one extra assignment round under the final
  *    centroids yields (list_id, coarse_dist) per vector;
  *  - residual: rv = iv − centroid(list_id), per dim — integers;
  *  - codebook: the ks residual vectors whose ids come FIRST in the
  *    q81 hash order (((id % 1000000007)·2654435761) % 2^32, id) —
  *    deterministic, zero extra training passes, oracle-replayable;
  *  - encode: per subspace s, code_s = argmin_j Σ_i (rv_i − cw_i)²
  *    over the subspace's ds dims, ties to the smaller codeword;
  *    codes fold into ONE int64 as Σ code_s · 2^(4s) (ks ≤ 16);
  *  - search: queries probe the nprobe nearest centroids (integer
  *    L2, ties to the smaller index), build an integer LUT per
  *    (query, probed list), and rank by exact ADC adist, ties cid.
  *
  * Scale shape: centroids (k×D longs) and the residual codebook
  * (ks×D longs) are driver literals by definition of IVF; corpus
  * assignment + residual + encode are ONE map-side pass (the corpus
  * never shuffles); the query side explodes only over nprobe and
  * broadcasts its LUTs, so each corpus row meets exactly the
  * queries probing its list — scan cost corpus/k · nprobe per
  * query, the IVF contract. Final rank is the standard top-k window
  * (WindowGroupLimit bounds the shuffle at O(queries·k)).
  */
object IvfPqFixed {

  /** Trained fixed-point index: coarse centroids (k × D longs) and
    * the residual codebook (ks × D longs, subspace-sliced at use). */
  case class Index(cents: Array[Array[Long]], cw: Array[Array[Long]])

  private def residualUdf(cents: Array[Array[Long]]) =
    udf((iv: Seq[Long], c: Int) => {
      val cv = cents(c)
      Array.tabulate(iv.length)(i => iv(i) - cv(i))
    })

  /** Per-subspace argmin codes over the residual codebook, folded
    * into one int64 (Σ code_s · 2^(4s)); requires ks ≤ 16. */
  private def encodeUdf(cw: Array[Array[Long]], m: Int) =
    udf((rv: Seq[Long]) => {
      val ds = rv.length / m
      var fold = 0L
      var s = 0
      while (s < m) {
        var bestJ = 0
        var bestD = Long.MaxValue
        var j = 0
        while (j < cw.length) {
          var d = 0L
          var i = 0
          while (i < ds) {
            val t = rv(s * ds + i) - cw(j)(s * ds + i)
            d += t * t
            i += 1
          }
          if (d < bestD) { bestD = d; bestJ = j } // strict: ties keep smaller j
          j += 1
        }
        fold += bestJ.toLong << (4 * s)
        s += 1
      }
      fold
    })

  /** Flat integer ADC lookup table for one (query residual):
    * lut[s·ks + j] = Σ_i (rv_{s·ds+i} − cw_j,{s·ds+i})². */
  private def lutUdf(cw: Array[Array[Long]], m: Int) =
    udf((rv: Seq[Long]) => {
      val ks = cw.length
      val ds = rv.length / m
      val out = new Array[Long](m * ks)
      var s = 0
      while (s < m) {
        var j = 0
        while (j < ks) {
          var d = 0L
          var i = 0
          while (i < ds) {
            val t = rv(s * ds + i) - cw(j)(s * ds + i)
            d += t * t
            i += 1
          }
          out(s * ks + j) = d
          j += 1
        }
        s += 1
      }
      out
    })

  /** Train the full fixed-point index: `iters` Lloyd rounds for the
    * coarse quantizer, then the hash-first-ks residual codebook.
    * Input: (idCol, vecCol float array). */
  def train(df: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int, ks: Int): Index = {
    require(ks <= 16, s"codes fold 4 bits per subspace; ks=$ks > 16")
    val cents = KmeansFixed.train(df, idCol, vecCol, k, iters)
    val q = quantized(df, idCol, vecCol)
      .withColumn("a", KmeansFixed.assignUdf(cents)(col("iv")))
      .withColumn("rv", residualUdf(cents)(col("iv"), col("a._1")))
    val cw = q
      .withColumn("hk", (col("id") % 1000000007L) * 2654435761L % 4294967296L)
      .orderBy(col("hk"), col("id"))
      .limit(ks)
      .select(col("rv"))
      .collect()
      .map(_.getAs[Seq[Long]]("rv").toArray)
    require(cw.length == ks, s"need >= $ks vectors for the codebook")
    Index(cents, cw)
  }

  private def quantized(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        KmeansFixed.quantizeUdf(col(vecCol)).as("iv"))
      .filter(col("iv").isNotNull)

  /** The q157 gate surface — the WHOLE index and the search it
    * serves in one hash, two sections over uniform (long) columns:
    *
    *  - 'assign' rows, one per corpus vector: a = id, b = list_id
    *    (coarse assignment), m1 = folded PQ codes, m2 = coarse
    *    squared distance — hashing these pins the trained index
    *    itself (centroid trajectory + codebook + every encode);
    *  - 'topk' rows, one per (query, rank): a = qid, b = rank,
    *    m1 = neighbor cid, m2 = exact integer ADC distance — pins
    *    the nprobe search over that index.
    *
    * Queries are the vec_id % 50 == 0 slice, like the rest of the
    * ANN family. */
  def gateSurface(df: DataFrame, idCol: String, vecCol: String,
                  k: Int, iters: Int, m: Int, ks: Int,
                  nprobe: Int, topK: Int): DataFrame = {
    val idx = train(df, idCol, vecCol, k, iters, ks)
    val enc = quantized(df, idCol, vecCol)
      .withColumn("a", KmeansFixed.assignUdf(idx.cents)(col("iv")))
      .withColumn("rv", residualUdf(idx.cents)(col("iv"), col("a._1")))
      .select(col("id"), col("a._1").cast("long").as("list_id"),
        col("a._2").as("cdist"), encodeUdf(idx.cw, m)(col("rv")).as("codes"))
      .localCheckpoint()

    val assign = enc.select(lit("assign").as("section"), col("id").as("a"),
      col("list_id").as("b"), col("codes").as("m1"), col("cdist").as("m2"))

    // query side: integer dists to all k centroids -> nprobe probes
    val cents = typedlit(idx.cents.map(_.toSeq).toSeq)
    val qk = quantized(df.filter(col(idCol) % 50 === 0), idCol, vecCol)
      .select(col("id").as("qid"), col("iv"),
        posexplode(transform(sequence(lit(0), lit(k - 1)), j =>
          aggregate(sequence(lit(0), lit(idx.cents(0).length - 1)), lit(0L),
            (acc, i) => {
              val t = element_at(col("iv"), i + 1) -
                element_at(element_at(cents, j + 1), i + 1)
              acc + t * t
            }))))
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("col"), col("pos"))
    val luts = qk.withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= nprobe)
      .withColumn("rv", residualUdf(idx.cents)(col("iv"), col("pos").cast("int")))
      .select(col("qid"), col("pos").cast("long").as("list_id"),
        lutUdf(idx.cw, m)(col("rv")).as("lut"))

    val adist: Column = (0 until m).map { s =>
      val codeS = shiftright(col("codes"), 4 * s) % 16
      element_at(col("lut"), (codeS + lit(s * ks + 1)).cast("int"))
    }.reduce(_ + _)
    val scored = enc.join(broadcast(luts), "list_id")
      .filter(col("qid") =!= col("id"))
      .withColumn("adist", adist)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("adist"), col("id"))
    val topk = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(lit("topk").as("section"), col("qid").as("a"),
        col("rank").cast("long").as("b"), col("id").as("m1"),
        col("adist").as("m2"))

    assign.unionAll(topk).orderBy(col("section"), col("a"), col("b"))
  }
}
