package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.{Bits, ZCurve}

/** Z-order key: hand-checked interleaves, the locality property the
  * layout exists for, and codegen/interpreted agreement. */
class BitsSpec extends SparkSuite {
  import spark.implicits._

  test("interleave16: hand-checked bit layouts") {
    assert(ZCurve.interleave16(0, 0) === 0L)
    assert(ZCurve.interleave16(1, 0) === 1L)     // x bit 0 -> position 0
    assert(ZCurve.interleave16(0, 1) === 2L)     // y bit 0 -> position 1
    assert(ZCurve.interleave16(3, 1) === 7L)     // 11 ⨯ 01 -> 0111
    assert(ZCurve.interleave16(0xffff, 0) === 0x55555555L)
    assert(ZCurve.interleave16(0, 0xffff) === 0xaaaaaaaaL)
    assert(ZCurve.interleave16(0xffff, 0xffff) === 0xffffffffL)
    // only the low 16 bits participate (documented grid resolution)
    assert(ZCurve.interleave16(0x1ffff, 0) === ZCurve.interleave16(0xffff, 0))
  }

  test("column API matches the static helper and keeps nulls null") {
    val df = Seq((Some(5L), Some(9L)), (None, Some(1L)), (Some(2L), None))
      .toDF("x", "y")
      .select(col("x"), col("y"), Bits.zorder(col("x"), col("y")).as("z"))
    val rows = df.collect()
    assert(rows(0).getLong(2) === ZCurve.interleave16(5, 9))
    assert(rows(1).isNullAt(2) && rows(2).isNullAt(2))
  }

  test("z-order sorting clusters both dimensions (the layout property)") {
    // 32x32 grid in random order; after ORDER BY zkey, any run of 64
    // consecutive rows spans a bounded sub-square in BOTH dims —
    // exactly why min/max pruning works on either predicate. A
    // single-column sort makes the other dimension span the full
    // range in every file-sized run.
    val n = 32
    val pts = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    val sorted = spark.createDataset(scala.util.Random.shuffle(pts.toVector))(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong))
      .toDF("x", "y")
      .select(col("x"), col("y"), Bits.zorder(col("x"), col("y")).as("z"))
      .orderBy(col("z")).collect()
    val runs = sorted.grouped(64).toSeq
    runs.foreach { run =>
      val xs = run.map(_.getLong(0)); val ys = run.map(_.getLong(1))
      // the full grid makes each grouped(64) run an ALIGNED Morton
      // block = exactly one 8x8 quad: span 7 in BOTH dims (a
      // single-column sort would span the full 0..31 in the other)
      assert(xs.max - xs.min <= 7, s"x span ${xs.max - xs.min}")
      assert(ys.max - ys.min <= 7, s"y span ${ys.max - ys.min}")
    }
    // and the keys are a permutation of 0..n*n-1 over the full grid
    assert(sorted.map(_.getLong(2)).toSeq === (0L until (n.toLong * n)).toSeq)
  }
}
