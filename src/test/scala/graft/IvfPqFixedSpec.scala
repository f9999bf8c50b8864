package graft

import org.apache.spark.sql.functions._

import graft.operators.IvfPqFixed

/** Fixed-point IVF-PQ (the q157 gate operator). The heavyweight check
  * re-implements the whole pinned arithmetic — quantize, coarse
  * assign, residual, encode, LUT, ADC — in plain driver Scala and
  * demands bit-equality with the Spark plan at nprobe = k (a full ADC
  * scan, so approximation never hides a mismatch). */
class IvfPqFixedSpec extends SparkSuite {
  import spark.implicits._

  private val Dim = 16
  private val M = 8

  /** Deterministic clustered corpus (the KmeansSpec shape). */
  private def clustered(nv: Int, nc: Int) = {
    val dim = Dim // local capture: the suite itself is not serializable
    spark.range(0, nv, 1, 4).mapPartitions { it =>
      it.map { id =>
        val cluster = (id % nc).toInt
        val base = new scala.util.Random(cluster)
        val v = Array.fill(dim)(base.nextFloat() * 2 - 1)
        val rng = new scala.util.Random(id)
        (0 until 4).foreach(_ => v(rng.nextInt(dim)) += rng.nextFloat() * 0.2f)
        (id, v)
      }
    }.toDF("id", "vec").localCheckpoint()
  }

  private def quant(v: Array[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 1024.0 + 0.5).toLong)

  private def sqDist(a: Array[Long], b: Array[Long]): Long = {
    var d = 0L; var i = 0
    while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
    d
  }

  /** Nearest index by integer L2, ties to the smaller index. */
  private def nearest(v: Array[Long], cents: Array[Array[Long]]): (Int, Long) = {
    var bc = 0; var bd = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      val d = sqDist(v, cents(c))
      if (d < bd) { bd = d; bc = c }
      c += 1
    }
    (bc, bd)
  }

  private def subDist(rv: Array[Long], cw: Array[Long], s: Int, ds: Int): Long = {
    var d = 0L; var i = 0
    while (i < ds) { val t = rv(s * ds + i) - cw(s * ds + i); d += t * t; i += 1 }
    d
  }

  test("nprobe = k gate surface is bit-identical to a driver-side " +
       "re-implementation of the full pinned arithmetic") {
    val corpus = clustered(400, 4)
    val k = 4
    val ks = 16
    val topK = 5
    val idx = IvfPqFixed.train(corpus, "id", "vec", k = k, iters = 3, ks = ks)
    val got = IvfPqFixed.gateSurface(corpus, "id", "vec",
        k = k, iters = 3, m = M, ks = ks, nprobe = k, topK = topK)
      .as[(String, Long, Long, Long, Long)].collect().toSeq

    // driver-side replay off the same trained index
    val ds = Dim / M
    val vecs = corpus.as[(Long, Array[Float])].collect().sortBy(_._1)
      .map { case (id, v) => id -> quant(v) }
    val enc = vecs.map { case (id, iv) =>
      val (c, cd) = nearest(iv, idx.cents)
      val rv = Array.tabulate(Dim)(i => iv(i) - idx.cents(c)(i))
      val codes = (0 until M).map { s =>
        // argmin_j over codewords, ties to the smaller j
        (0 until ks).minBy(j => (subDist(rv, idx.cw(j), s, ds), j)).toLong << (4 * s)
      }.sum
      (id, c, cd, rv, codes)
    }
    val assignExp = enc.map { case (id, c, cd, _, codes) =>
      ("assign", id, c.toLong, codes, cd) }
    val topkExp = vecs.filter(_._1 % 50 == 0).flatMap { case (qid, qiv) =>
      // nprobe = k: every list probed, so ADC over the whole corpus
      val scored = enc.filter(_._1 != qid).map { case (cid, c, _, _, codes) =>
        val qrv = Array.tabulate(Dim)(i => qiv(i) - idx.cents(c)(i))
        val adist = (0 until M).map { s =>
          val j = ((codes >> (4 * s)) & 15).toInt
          subDist(qrv, idx.cw(j), s, ds)
        }.sum
        (cid, adist)
      }.sortBy { case (cid, adist) => (adist, cid) }.take(topK)
      scored.zipWithIndex.map { case ((cid, adist), r) =>
        ("topk", qid, (r + 1).toLong, cid, adist) }
    }
    val expected = (assignExp ++ topkExp).sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(got == expected)
  }

  test("training is deterministic and every folded code nibble is a " +
       "legal codeword index") {
    val corpus = clustered(300, 3)
    val a = IvfPqFixed.train(corpus, "id", "vec", k = 3, iters = 2, ks = 8)
    val b = IvfPqFixed.train(corpus, "id", "vec", k = 3, iters = 2, ks = 8)
    assert(a.cents.map(_.toSeq).toSeq == b.cents.map(_.toSeq).toSeq)
    assert(a.cw.map(_.toSeq).toSeq == b.cw.map(_.toSeq).toSeq)
    val codes = IvfPqFixed.gateSurface(corpus, "id", "vec",
        k = 3, iters = 2, m = M, ks = 8, nprobe = 2, topK = 3)
      .filter($"section" === "assign").select($"m1").as[Long].collect()
    assert(codes.nonEmpty)
    codes.foreach { f =>
      (0 until M).foreach { s =>
        val j = (f >> (4 * s)) & 15
        assert(j < 8, s"code nibble $j out of range for ks=8 in fold $f")
      }
    }
  }

  test("ks > 16 refuses (the 4-bit fold contract)") {
    val corpus = clustered(100, 2)
    val e = intercept[IllegalArgumentException] {
      IvfPqFixed.train(corpus, "id", "vec", k = 2, iters = 1, ks = 17)
    }
    assert(e.getMessage.contains("16"))
  }
}
