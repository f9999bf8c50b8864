package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Morton/Z-curve bit interleaving (static helper shared by the
  * interpreted and codegen paths). 16 bits per dimension — the x
  * bits land on even positions, y on odd, giving a 32-bit key whose
  * lexicographic order is the Z-order space-filling curve over the
  * (x, y) grid. */
object ZCurve {
  /** Spread the low 16 bits of v so bit i lands at position 2i —
    * the classic parallel-prefix mask cascade, O(1). */
  def spread16(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }
  def interleave16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)
}

/** Z-order layout key as a native codegen'd Catalyst expression —
  * the data-clustering primitive for scan locality at 100 TB:
  * writing a table ORDER BY z(x, y) co-locates rows that are close
  * in BOTH dimensions into the same files/row groups, so min/max
  * pruning skips on either predicate (the Z-ORDER layout lever of
  * modern lakehouse writers, public technique: Morton order).
  *
  * Inputs are taken mod 2^16 (documented grid resolution — callers
  * bucket/scale their dimensions into the grid first). Two mask
  * cascades + an OR per row, branchless, whole-stage-codegen'd.
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any =
    ZCurve.interleave16(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"${ev.value} = org.apache.spark.sql.graftext.ZCurve.interleave16($x, $y);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

/** Hilbert-curve index (static helper shared by the interpreted and
  * codegen paths): the classic iterative xy2d walk (quadrant digit +
  * reflect/transpose rotation per bit level, public algorithm). The
  * Hilbert curve is the layout alternative to [[ZCurve]] with
  * strictly better locality: CONSECUTIVE indices are always grid
  * neighbors (unit Manhattan step, spec-pinned), where Z-order jumps
  * across the grid at quadrant seams — fewer split row groups, so
  * min/max pruning boxes are tighter at the same sort cost. */
object HilbertCurve {
  /** Hilbert index of (x, y) on the 2^16 x 2^16 grid (inputs taken
    * mod 2^16, the [[ZOrderKey]] grid contract). */
  def xy2d(xIn: Long, yIn: Long): Long = {
    var x = xIn & 0xffffL
    var y = yIn & 0xffffL
    var d = 0L
    var s = 1L << 15
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        // reflect (rx quadrant) then transpose — the rotation that
        // makes the four child curves join head-to-tail
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Hilbert layout key as a native codegen'd Catalyst expression —
  * [[ZOrderKey]]'s sibling (same 16-bit grid contract, same
  * write-ORDER-BY usage); 16 branch-light iterations per row. */
case class HilbertKey(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any =
    HilbertCurve.xy2d(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"${ev.value} = org.apache.spark.sql.graftext.HilbertCurve.xy2d($x, $y);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): HilbertKey =
    copy(left = newLeft, right = newRight)
}

/** d-DIMENSIONAL Morton interleave (static kernel): bit i of
  * dimension j lands at position i·d + j — dim 0 on the lowest
  * positions, the [[ZCurve]] 2-D layout generalized. Real lakehouse
  * tables cluster on 3–4 dims (source × day × lang), not two.
  * Requires d·bits ≤ 63 (callers pick the grid: 3×16, 4×15, …). */
object ZCurveN {
  def interleave(vs: Array[Long], bits: Int): Long = {
    val d = vs.length
    var out = 0L
    var i = 0
    while (i < bits) {
      var j = 0
      while (j < d) {
        out |= ((vs(j) >> i) & 1L) << (i * d + j)
        j += 1
      }
      i += 1
    }
    out
  }
}

/** d-DIMENSIONAL Hilbert index (static kernel): Skilling's
  * transpose-form walk ("Programming the Hilbert curve", AIP 2004 —
  * the compact public d-dim formulation of the Butz/Lawder
  * algorithm): inverse-undo rounds top bit down (conditional invert
  * of axis 0 / bit-swap with axis 0 under the P mask), Gray encode
  * across axes, the t-fold correction off the last axis, then the
  * index is the MSB-first interleave of the transposed axes (axis 0
  * contributing the most significant bit of each level's digit).
  * Consecutive indices are unit Manhattan steps in ANY d
  * (spec-pinned exhaustively on the 3-dim grid) — the locality
  * property that keeps row-group min/max boxes tight per dimension.
  * Requires d·bits ≤ 63. */
object HilbertCurveN {
  def index(vs: Array[Long], bits: Int): Long = {
    val n = vs.length
    val mask = (1L << bits) - 1
    val x = new Array[Long](n)
    var i = 0
    while (i < n) { x(i) = vs(i) & mask; i += 1 }
    // inverse undo
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transposed-form gather: bit k of axis j -> index bit
    // k·n + (n-1-j), so axis 0 is the most significant per level
    var out = 0L
    var k = 0
    while (k < bits) {
      var j = 0
      while (j < n) {
        out |= ((x(j) >> k) & 1L) << (k * n + (n - 1 - j))
        j += 1
      }
      k += 1
    }
    out
  }
}

/** 3-dim Morton key on the 16-bit grid (48-bit key), fully
  * whole-stage-codegen'd — the gated d>2 layout primitive. */
case class ZOrderKey3(first: Expression, second: Expression,
                      third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, LongType, LongType)
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    ZCurveN.interleave(Array(a.asInstanceOf[Long] & 0xffffL,
      b.asInstanceOf[Long] & 0xffffL, c.asInstanceOf[Long] & 0xffffL), 16)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      s"${ev.value} = org.apache.spark.sql.graftext.ZCurveN.interleave(" +
        s"new long[]{$a & 0xffffL, $b & 0xffffL, $c & 0xffffL}, 16);"
    })

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): ZOrderKey3 =
    copy(first = a, second = b, third = c)
}

/** 3-dim Hilbert key on the 16-bit grid (48-bit key), fully
  * whole-stage-codegen'd — [[ZOrderKey3]]'s better-locality sibling. */
case class HilbertKey3(first: Expression, second: Expression,
                       third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, LongType, LongType)
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    HilbertCurveN.index(Array(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long]), 16)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      s"${ev.value} = org.apache.spark.sql.graftext.HilbertCurveN.index(" +
        s"new long[]{$a, $b, $c}, 16);"
    })

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): HilbertKey3 =
    copy(first = a, second = b, third = c)
}

object Bits {
  /** Column API: 32-bit Morton key over the low 16 bits of x and y. */
  def zorder(x: Column, y: Column): Column =
    ExpressionUtils.column(ZOrderKey(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y)))

  /** Column API: Hilbert index over the low 16 bits of x and y. */
  def hilbert(x: Column, y: Column): Column =
    ExpressionUtils.column(HilbertKey(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y)))

  /** Column API: 48-bit 3-dim Morton key (low 16 bits per dim). */
  def zorder3(x: Column, y: Column, z: Column): Column =
    ExpressionUtils.column(ZOrderKey3(ExpressionUtils.expression(x),
      ExpressionUtils.expression(y), ExpressionUtils.expression(z)))

  /** Column API: 48-bit 3-dim Hilbert key (low 16 bits per dim). */
  def hilbert3(x: Column, y: Column, z: Column): Column =
    ExpressionUtils.column(HilbertKey3(ExpressionUtils.expression(x),
      ExpressionUtils.expression(y), ExpressionUtils.expression(z)))
}
