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

object Bits {
  /** Column API: 32-bit Morton key over the low 16 bits of x and y. */
  def zorder(x: Column, y: Column): Column =
    ExpressionUtils.column(ZOrderKey(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y)))
}
