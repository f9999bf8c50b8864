package graft

import org.apache.spark.sql.functions._

import graft.operators.Bloom

/** Bloom-filter membership: build/probe round-trip, determinism,
  * false-positive envelope, and bitmap-word parity against a driver
  * reference of the same md5 draws. */
class BloomSpec extends SparkSuite {
  import spark.implicits._

  private val M = 2048
  private val K = 3

  /** Bloom.positionsJvm is the driver reference — java.security md5,
    * independent of Spark's expression engine; the first test pins
    * the Column fold against it bit-for-bit. */
  private def refPositions(key: String, m: Int, k: Int): Seq[Long] =
    Bloom.positionsJvm(key, m, k).toSeq

  test("build produces exactly the reference bit set, zero false negatives") {
    val keys = (0 until 400).map(i => s"doc-$i")
    val df = keys.toDF("k")
    val words = Bloom.build(df, "k", M, K)
    assert(words.length == M / 64)
    // bit-for-bit vs the driver reference
    val ref = new Array[Long](M / 64)
    keys.flatMap(refPositions(_, M, K)).foreach(p =>
      ref((p / 64).toInt) |= 1L << (p % 64).toInt)
    assert(words.toSeq == ref.toSeq)
    // every inserted key probes true — the structural guarantee
    val flagged = df.withColumn("f", Bloom.probeFlag(col("k"), words, M, K))
    assert(flagged.filter(!col("f")).count() == 0)
  }

  test("false positives are rare at the designed fill and deterministic") {
    val df = (0 until 400).map(i => s"doc-$i").toDF("k")
    val words = Bloom.build(df, "k", M, K)
    // disjoint probe keys: fp rate (1-e^(-kn/m))^k ~ 0.081 at this
    // fill; 3-sigma on 2000 draws is ~±37
    val probes = (0 until 2000).map(i => s"other-$i").toDF("k")
    val fp = probes.filter(Bloom.probeFlag(col("k"), words, M, K)).count()
    assert(fp < 300, s"fp=$fp is past the envelope")
    assert(probes.filter(Bloom.probeFlag(col("k"), words, M, K)).count() == fp,
      "rerun must flag the SAME rows (no RNG anywhere)")
  }

  test("decontaminate flags exactly reference ∪ deterministic fp set; null keys probe consistently") {
    val ref = (0 until 300).map(i => s"seen-$i").toDF("k")
    val corpus = ((0 until 300).map(i => s"seen-$i") ++
      (0 until 300).map(i => s"new-$i")).toDF("k")
    val out = Bloom.decontaminate(corpus, ref, "k", m = 2400, k = K)
    val seenFlags = out.filter(col("k").startsWith("seen-"))
    assert(seenFlags.filter(!col("flagged")).count() == 0)
    // a null key inserts and probes via the sentinel, not NULL-vanishes
    val nref = Seq(Option.empty[String]).toDF("k")
    val nwords = Bloom.build(nref, "k", M, K)
    val nprobe = Seq(Option.empty[String]).toDF("k")
      .withColumn("f", Bloom.probeFlag(col("k"), nwords, M, K))
    assert(nprobe.filter(col("f")).count() == 1)
  }

  test("non-multiple-of-64 m and word-boundary bits round-trip") {
    val df = (0 until 50).map(i => s"x$i").toDF("k")
    val m = 100 // 2 words, top bits unused
    val words = Bloom.build(df, "k", m, K)
    assert(words.length == 2)
    assert(df.filter(!Bloom.probeFlag(col("k"), words, m, K)).count() == 0)
  }
}
