package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
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

object Bits {
  /** Column API: 32-bit Morton key over the low 16 bits of x and y. */
  def zorder(x: Column, y: Column): Column =
    ExpressionUtils.column(ZOrderKey(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y)))

  /** Column API: Hilbert index over the low 16 bits of x and y. */
  def hilbert(x: Column, y: Column): Column =
    ExpressionUtils.column(HilbertKey(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y)))
}
