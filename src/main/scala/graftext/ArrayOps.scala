package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType, TypeCollection}
import org.apache.spark.unsafe.types.UTF8String

/** Intersection size of two SORTED long arrays via a zero-allocation
  * two-pointer merge, with full whole-stage-codegen support.
  *
  * Why a custom Catalyst Expression (SURVEY.md §3 preference (b)):
  * `array_intersect` materializes a hash set per invocation — on a
  * multi-million-pair dedup verify stage that allocation dominates the
  * query. The merge needs no allocation at all when inputs are sorted,
  * which the dedup operators guarantee (array_sort at projection
  * time, once per document, not per pair).
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val an = a.numElements(); val bn = b.numElements()
    while (i < an && j < bn) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val an = ctx.freshName("an"); val bn = ctx.freshName("bn")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |final int $an = $a.numElements(), $bn = $b.numElements();
         |while ($i < $an && $j < $bn) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Sequential left-fold dot product of two float/double array columns
  * with full whole-stage-codegen support.
  *
  * Why a custom Catalyst Expression: the equivalent
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` chain is evaluated
  * INTERPRETED per row (higher-order functions don't codegen), and on
  * brute-force/ANN scoring stages the per-candidate lambda overhead
  * dominates. This loop performs the IDENTICAL IEEE operation
  * sequence — widen each element to double, multiply, left-fold add
  * from 0.0 — so results are bit-identical to the HOF chain and to
  * the DuckDB oracle's `list_reduce` left fold (SURVEY.md §4).
  *
  * Contract: element types float or double (independently per side),
  * result over the shorter length if dims differ. A NULL ELEMENT in
  * either array makes the result null — matching the HOF chain's null
  * propagation — and the per-element null check is only compiled in
  * when the input schema says elements can be null (containsNull), so
  * schemas that forbid nulls keep the branch-free loop. This matters
  * because the expression is also registered as the public SQL
  * function `vec_dot`, where arbitrary user arrays arrive.
  */
case class VecDotSeq(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def elemsNullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullable: Boolean = super.nullable || elemsNullable

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val af = elemType(left) == FloatType
    val bf = elemType(right) == FloatType
    val checkNull = elemsNullable
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNull && (a.isNullAt(i) || b.isNullAt(i))) return null
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def get(arr: String, idx: String, e: Expression): String =
        if (elemType(e) == FloatType) s"(double) $arr.getFloat($idx)"
        else s"$arr.getDouble($idx)"
      // ev.isNull may only be REFERENCED when the expression is
      // nullable: nullSafeCodeGen's non-nullable branch swaps
      // ev.isNull to the `false` literal AFTER this string is built,
      // leaving the original variable name undeclared in the
      // generated source (Janino: "isNull_N is not an rvalue").
      // elemsNullable forces nullable=true, so the guard is safe
      // exactly when it is needed.
      val nullCheck =
        if (elemsNullable)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      val assign =
        if (elemsNullable) s"if (!${ev.isNull}) ${ev.value} = $acc;"
        else s"${ev.value} = $acc;"
      s"""
         |double $acc = 0.0;
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += ${get(a, i, left)} * ${get(b, i, right)};
         |}
         |$assign
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotSeq =
    copy(left = newLeft, right = newRight)
}

/** Sequential left-fold SQUARED L2 DISTANCE between a window of `left`
  * starting at element `aStart` (0-based) and the whole of `right`:
  * fold over i of (left[aStart+i] − right[i])², acc from 0.0, i in
  * element order.
  *
  * Why a custom Catalyst Expression: product-quantization encode runs
  * this fold corpus-rows × m subspaces × ks codewords times — as the
  * interpreted `aggregate(zip_with(slice(...), cw, ...))` chain it
  * dominated the PQ stress section (the slice also copies the
  * subvector per codeword; here the offset read makes it zero-copy).
  * The loop performs the IDENTICAL IEEE operation sequence — widen to
  * double, subtract, square, left-fold add from 0.0 — so distances
  * (and therefore argmin codes under the (d2, j) tie rule) are
  * bit-identical to the HOF chain and the DuckDB oracle's
  * `list_reduce` fold.
  *
  * Contract: element types float or double (independently per side);
  * folds while both aStart+i and i are in bounds, so a window running
  * past `left`'s end folds the overlap only — deliberately BETTER
  * DEFINED than the HOF chain it replaces (`zip_with` pads the
  * shorter side with nulls, which nulls the whole fold); PQ corpora
  * are uniform-dim by [[graft.operators.Similarity.pqCodebook]]'s
  * contract, so the paths agree everywhere they both produce a
  * number. NULL elements null the result, checked only when the
  * schema allows element nulls — the VecDotSeq discipline.
  */
case class VecL2SqSeq(left: Expression, right: Expression, aStart: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(aStart >= 0, s"vec_l2sq: aStart $aStart must be >= 0")

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def elemsNullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullable: Boolean = super.nullable || elemsNullable

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements() - aStart, b.numElements())
    val af = elemType(left) == FloatType
    val bf = elemType(right) == FloatType
    val checkNull = elemsNullable
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNull && (a.isNullAt(aStart + i) || b.isNullAt(i))) return null
      val x = if (af) a.getFloat(aStart + i).toDouble else a.getDouble(aStart + i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      def get(arr: String, idx: String, e: Expression): String =
        if (elemType(e) == FloatType) s"(double) $arr.getFloat($idx)"
        else s"$arr.getDouble($idx)"
      // ev.isNull referenced only when nullable (see VecDotSeq note)
      val nullCheck =
        if (elemsNullable)
          s"""if ($a.isNullAt($aStart + $i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      val assign =
        if (elemsNullable) s"if (!${ev.isNull}) ${ev.value} = $acc;"
        else s"${ev.value} = $acc;"
      s"""
         |double $acc = 0.0;
         |final int $n = java.lang.Math.min($a.numElements() - $aStart, $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  final double $d = ${get(a, s"$aStart + $i", left)} - ${get(b, i, right)};
         |  $acc += $d * $d;
         |}
         |$assign
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2SqSeq =
    copy(left = newLeft, right = newRight)
}

/** All random-hyperplane LSH bucket ids for a vector in ONE pass —
  * `tables` buckets of `planes` sign bits each, as array<long>.
  *
  * Semantically identical to mapping `Similarity.lshBucket` over the
  * table ids: the sign for (plane p of table t, dimension d) comes
  * from the PORTABLE two-round multiplicative mixer over
  * k = (t*planes + p)*4096 + d + 1 (see Similarity.hyperplaneSign —
  * plain 64-bit integer arithmetic an independent engine can
  * replicate, which is what makes the ANN queries hash-checkable
  * against the DuckDB oracle), the plane dot is the sequential left
  * fold over dimensions, and bit p of bucket t is set when that dot
  * is positive.
  *
  * Why a custom Expression: the HOF formulation nests three
  * higher-order lambdas (tables -> planes -> dimensions), all
  * interpreted, with the inner index `sequence` re-materialized per
  * plane — measured 3.15 s for 2000x128-dim vectors. Here the
  * +/-1 sign matrix is row-constant, so it is hoisted and built once
  * per partition, and each vector is read once while all
  * tables*planes dots accumulate simultaneously.
  */
case class VecHyperplaneBuckets(child: Expression, planes: Int, tables: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(planes >= 1 && planes <= 63, "planes must fit a long's bits")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // row-constant +/-1 matrix [tables*planes][dim], grown on demand
  @transient private var signs: Array[Array[Double]] = _

  private def signsFor(dim: Int): Array[Array[Double]] = {
    if (signs == null || signs(0).length < dim) {
      signs = Array.tabulate(tables * planes) { tp =>
        Array.tabulate(dim) { d =>
          val k = tp.toLong * 4096L + d + 1L
          val h1 = (k * 2654435761L) % 4294967296L
          val m = (h1 ^ (h1 >>> 15)) & 2147483647L
          val h2 = (m * 1103515245L + 12345L) % 2147483648L
          if (h2 >= 1073741824L) 1.0 else -1.0
        }
      }
    }
    signs
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    // the mixer key is (table*planes + p) * 4096 + d: dims above 4096
    // would alias into the next plane's key space (silent bucket
    // corruption), so the documented cap is enforced, not assumed
    if (n > 4096) throw new IllegalArgumentException(
      s"hyperplane buckets support vectors of at most 4096 dims, got $n")
    val s = signsFor(n)
    val out = new Array[Long](tables)
    val accs = new Array[Double](tables * planes)
    var d = 0
    while (d < n) {
      val x = if (isFloat) a.getFloat(d).toDouble else a.getDouble(d)
      var tp = 0
      while (tp < tables * planes) {
        accs(tp) += x * s(tp)(d)
        tp += 1
      }
      d += 1
    }
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        if (accs(t * planes + p) > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsVar = ctx.addMutableState("double[][]", "hpSigns")
    val tp = tables * planes
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val d = ctx.freshName("d")
      val i = ctx.freshName("i"); val x = ctx.freshName("x")
      val accs = ctx.freshName("accs"); val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val p = ctx.freshName("p")
      val bucket = ctx.freshName("bucket")
      val k = ctx.freshName("k"); val h1 = ctx.freshName("h1")
      val m = ctx.freshName("m"); val h2 = ctx.freshName("h2")
      val getElem = if (isFloat) s"(double) $a.getFloat($d)" else s"$a.getDouble($d)"
      s"""
         |final int $n = $a.numElements();
         |if ($n > 4096) throw new IllegalArgumentException(
         |  "hyperplane buckets support vectors of at most 4096 dims, got " + $n);
         |if ($signsVar == null || $signsVar[0].length < $n) {
         |  $signsVar = new double[$tp][$n];
         |  for (int $i = 0; $i < $tp; $i++) {
         |    for (int $d = 0; $d < $n; $d++) {
         |      final long $k = ((long) $i) * 4096L + $d + 1L;
         |      final long $h1 = ($k * 2654435761L) % 4294967296L;
         |      final long $m = ($h1 ^ ($h1 >>> 15)) & 2147483647L;
         |      final long $h2 = ($m * 1103515245L + 12345L) % 2147483648L;
         |      $signsVar[$i][$d] = ($h2 >= 1073741824L) ? 1.0 : -1.0;
         |    }
         |  }
         |}
         |final double[] $accs = new double[$tp];
         |for (int $d = 0; $d < $n; $d++) {
         |  final double $x = $getElem;
         |  for (int $i = 0; $i < $tp; $i++) {
         |    $accs[$i] += $x * $signsVar[$i][$d];
         |  }
         |}
         |final long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bucket = 0L;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    if ($accs[$t * $planes + $p] > 0) $bucket |= (1L << $p);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecHyperplaneBuckets =
    copy(child = newChild)
}

/** Johnson–Lindenstrauss random projection with HASHED ±1 signs
  * (the database-friendly Achlioptas 2003 family: entries ±1, no
  * stored matrix, no RNG state): output dim j is the sequential
  * d-order fold Σ_d x_d · sign(j, d), where sign is
  * [[VecHyperplaneBuckets]]'s exact two-round multiplicative mixer
  * over key j·4096 + d + 1 — the same portable integer recurrence an
  * independent SQL engine restates bit-for-bit, and the same 4096-dim
  * cap for the same key-aliasing reason.
  *
  * This is the hyperplane-LSH sign matrix WITHOUT the thresholding:
  * LSH keeps only the sign bit per plane (a locality HASH), the
  * projection keeps the real-valued dot (a DISTANCE-preserving
  * sketch, ‖Py−Px‖ ≈ √(k/d)·‖y−x‖ w.h.p.), which is what a
  * shortlist-then-rescore retrieval wants.
  *
  * Why a custom Expression: one pass over the input accumulates all
  * `outDims` folds (the transform(sequence(...)) HOF chain is
  * interpreted and re-reads the vector per output dim); the sign
  * matrix is computed once per task and rides in mutable state, so
  * per-row work is exactly outDims·d fused multiply-adds.
  */
case class VecProjectSigns(child: Expression, outDims: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(outDims >= 1, s"outDims must be >= 1, got $outDims")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private var signs: Array[Array[Double]] = _

  private def signsFor(dim: Int): Array[Array[Double]] = {
    if (signs == null || signs(0).length < dim) {
      signs = Array.tabulate(outDims) { j =>
        Array.tabulate(dim) { d =>
          val k = j.toLong * 4096L + d + 1L
          val h1 = (k * 2654435761L) % 4294967296L
          val m = (h1 ^ (h1 >>> 15)) & 2147483647L
          val h2 = (m * 1103515245L + 12345L) % 2147483648L
          if (h2 >= 1073741824L) 1.0 else -1.0
        }
      }
    }
    signs
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n > 4096) throw new IllegalArgumentException(
      s"sign projection supports vectors of at most 4096 dims, got $n")
    val s = signsFor(n)
    val out = new Array[Double](outDims)
    var d = 0
    while (d < n) {
      val x = if (isFloat) a.getFloat(d).toDouble else a.getDouble(d)
      var j = 0
      while (j < outDims) {
        out(j) += x * s(j)(d)
        j += 1
      }
      d += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsVar = ctx.addMutableState("double[][]", "rpSigns")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val d = ctx.freshName("d")
      val j = ctx.freshName("j"); val x = ctx.freshName("x")
      val out = ctx.freshName("out")
      val k = ctx.freshName("k"); val h1 = ctx.freshName("h1")
      val m = ctx.freshName("m"); val h2 = ctx.freshName("h2")
      val getElem = if (isFloat) s"(double) $a.getFloat($d)" else s"$a.getDouble($d)"
      s"""
         |final int $n = $a.numElements();
         |if ($n > 4096) throw new IllegalArgumentException(
         |  "sign projection supports vectors of at most 4096 dims, got " + $n);
         |if ($signsVar == null || $signsVar[0].length < $n) {
         |  $signsVar = new double[$outDims][$n];
         |  for (int $j = 0; $j < $outDims; $j++) {
         |    for (int $d = 0; $d < $n; $d++) {
         |      final long $k = ((long) $j) * 4096L + $d + 1L;
         |      final long $h1 = ($k * 2654435761L) % 4294967296L;
         |      final long $m = ($h1 ^ ($h1 >>> 15)) & 2147483647L;
         |      final long $h2 = ($m * 1103515245L + 12345L) % 2147483648L;
         |      $signsVar[$j][$d] = ($h2 >= 1073741824L) ? 1.0 : -1.0;
         |    }
         |  }
         |}
         |final double[] $out = new double[$outDims];
         |for (int $d = 0; $d < $n; $d++) {
         |  final double $x = $getElem;
         |  for (int $j = 0; $j < $outDims; $j++) {
         |    $out[$j] += $x * $signsVar[$j][$d];
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecProjectSigns =
    copy(child = newChild)
}

/** MinHash signature of a pre-hashed word set in ONE codegen'd pass:
  * slot p of the result is min over words w of xxhash64(w, p) —
  * exactly the HOF fold it replaces (XXH64.hashLong(w, 42) chained
  * with XXH64.hashInt(p, ·), Spark's XxHash64 semantics for a
  * (long, int) call). Empty input yields Long.MaxValue slots, like
  * the fold's initial accumulator.
  *
  * Why a custom Expression: the single-fold HOF formulation is
  * interpreted and allocates a numHashes-wide array per WORD
  * (zip_with), the dominant cost of signature computation.
  */
case class VecMinhashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = XXH64.hashLong(a.getLong(i), 42L)
      var p = 0
      while (p < numHashes) {
        val h = XXH64.hashInt(p, base)
        if (h < out(p)) out(p) = h
        p += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val p = ctx.freshName("p"); val base = ctx.freshName("base")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |final long[] $out = new long[$numHashes];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $base = $xxh.hashLong($a.getLong($i), 42L);
         |  for (int $p = 0; $p < $numHashes; $p++) {
         |    final long $h = $xxh.hashInt($p, $base);
         |    if ($h < $out[$p]) $out[$p] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecMinhashSig =
    copy(child = newChild)
}

/** The portable md5-fold gram hash as a static kernel (shared by the
  * interpreted and codegen paths of [[VecGramBuckets]]): bucket id of
  * a gram g is `conv(substring(md5(g), 1, 15), 16, 10) % m` — the
  * first 60 bits of the MD5 of g's UTF-8 bytes, mod m — exactly the
  * SQL chain the DSIR/perceptron featurizations use, so a DuckDB
  * oracle replays bucket ids bit-for-bit.
  */
object GramHash {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of the digest as a non-negative long:
    * bytes 0..6 fully plus the high nibble of byte 7. */
  private def fold60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) & 0xF0L) >>> 4)
  }

  private def bucketOf(bytes: Array[Byte], m: Long): Long = {
    val md = mdLocal.get()
    md.reset()
    fold60(md.digest(bytes)) % m
  }

  /** Bucket ids of a token array's unigrams followed by its
    * -joined adjacent bigrams (the DSIR featurization), one
    * O(tokens) pass. A null token contributes no gram — the same
    * histogram the md5-HOF chain produced (null grams hash to null
    * and are dropped downstream). */
  def gramBuckets(arr: ArrayData, m: Long): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](if (n == 0) 0 else 2 * n - 1)
    var k = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        out(k) = bucketOf(arr.getUTF8String(i).getBytes, m)
        k += 1
      }
      i += 1
    }
    i = 0
    while (i < n - 1) {
      if (!arr.isNullAt(i) && !arr.isNullAt(i + 1)) {
        val a = arr.getUTF8String(i).getBytes
        val b = arr.getUTF8String(i + 1).getBytes
        val g = new Array[Byte](a.length + 1 + b.length)
        System.arraycopy(a, 0, g, 0, a.length)
        g(a.length) = 0x01
        System.arraycopy(b, 0, g, a.length + 1, b.length)
        out(k) = bucketOf(g, m)
        k += 1
      }
      i += 1
    }
    if (k == out.length) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  /** Bucket ids of a string's overlapping CHARACTER n-gram windows
    * (the language-ID featurization): gram i is the n code points
    * starting at char i, hashed over its UTF-8 bytes by the same
    * md5 fold — so `substr(t, i, n)` in any engine followed by the
    * SQL fold chain reproduces the ids bit-for-bit (char indexing,
    * not bytes: multi-byte scripts gram identically everywhere). A
    * string shorter than n chars yields no grams. */
  def charGramBuckets(s: UTF8String, n: Int, m: Long): ArrayData = {
    val cnt = math.max(0, s.numChars() - n + 1)
    val out = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      out(i) = bucketOf(s.substring(i, i + n).getBytes, m)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Unigram + adjacent-bigram bucket ids of a token array in ONE pass —
  * the hashed featurization of the DSIR/quality-classifier operators:
  * for each token g (and each -joined adjacent pair), the
  * portable md5 fold `conv(substring(md5(g), 1, 15), 16, 10) % m`.
  *
  * Why a custom Catalyst Expression: the HOF formulation
  * (`transform(concat(tk, zip_with(slice, slice, concat)), md5-fold)`)
  * evaluates interpreted, allocating gram STRINGS just to hash them —
  * the dominant cost of the classifier featurization. Here the digest
  * runs straight over token bytes. Bucket ids are bit-identical to
  * the SQL chain (and therefore to the DuckDB oracle's replay).
  */
case class VecGramBuckets(child: Expression, buckets: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(buckets >= 2, s"gram buckets: need >= 2, got $buckets")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    GramHash.gramBuckets(v.asInstanceOf[ArrayData], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = org.apache.spark.sql.graftext.GramHash.gramBuckets($a, ${buckets}L);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecGramBuckets =
    copy(child = newChild)
}

/** Hashed character n-gram bucket ids of a string column in one fused
  * pass — the language-ID featurization (fastText/CCNet classify on
  * char grams, which survive tokenizer-hostile scripts): every
  * overlapping n-CHAR window hashed by the portable md5 fold.
  *
  * Why a custom Catalyst Expression: the HOF formulation
  * (`transform(sequence(1, length-n+1), i => substring(t, i, n))`
  * then the md5-fold chain) materializes every gram as a string ROW
  * expression evaluated interpreted; here the windows are UTF8String
  * slices hashed directly. Bucket ids replay in SQL as
  * `md5-fold(substr(t, i, n)) % m` — char indexing both sides, so
  * multi-byte scripts agree. */
case class VecCharGramBuckets(child: Expression, n: Int, buckets: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"char grams: need n >= 1, got $n")
  require(buckets >= 2, s"gram buckets: need >= 2, got $buckets")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    GramHash.charGramBuckets(v.asInstanceOf[UTF8String], n, buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = org.apache.spark.sql.graftext.GramHash.charGramBuckets($a, $n, ${buckets}L);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecCharGramBuckets =
    copy(child = newChild)
}

/** One-pass bincount of an array<long> of bucket ids: slot i of the
  * result counts the elements equal to i, for i in [0, buckets);
  * values outside the range and NULL elements count nowhere (exactly
  * the rows `filter(bs, b === i)` would drop). With `bias` set, one
  * extra trailing slot holds the constant 1 — the bias feature of a
  * hashed-feature model, materialized here so the histogram needs no
  * downstream concat.
  *
  * Why a custom Catalyst Expression: the HOF formulation
  * `transform(sequence(0, buckets-1), i => size(filter(bs, b === i)))`
  * is O(buckets · grams) INTERPRETED passes per row — on the
  * quality-classifier featurization it rescanned each doc's gram
  * array 64 times. This is the single O(grams) pass with the
  * identical result.
  */
case class VecBincount(child: Expression, buckets: Int, bias: Boolean)
    extends UnaryExpression with ExpectsInputTypes {

  require(buckets >= 1, s"bincount: buckets must be >= 1, got $buckets")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def outLen: Int = buckets + (if (bias) 1 else 0)

  private def elemsNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Long](outLen)
    val checkNull = elemsNullable
    var i = 0
    while (i < n) {
      if (!(checkNull && a.isNullAt(i))) {
        val b = a.getLong(i)
        if (b >= 0L && b < buckets) out(b.toInt) += 1L
      }
      i += 1
    }
    if (bias) out(buckets) = 1L
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val b = ctx.freshName("b"); val out = ctx.freshName("out")
      val nullGuard = if (elemsNullable) s"if ($a.isNullAt($i)) continue;" else ""
      val biasSet = if (bias) s"$out[$buckets] = 1L;" else ""
      s"""
         |final int $n = $a.numElements();
         |final long[] $out = new long[$outLen];
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullGuard
         |  final long $b = $a.getLong($i);
         |  if ($b >= 0L && $b < ${buckets}L) $out[(int) $b]++;
         |}
         |$biasSet
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecBincount =
    copy(child = newChild)
}

/** Integer dot product of an array<long> column with a DRIVER-RESIDENT
  * long weight vector: Σ x[i]·w[i] over min(len(x), len(w)), plain
  * 64-bit wraparound arithmetic — identical to the
  * `aggregate(zip_with(x, typedlit(w), _*_), 0L, _+_)` chain it
  * replaces, including null-element propagation (a null element nulls
  * the result; checked only when the schema allows element nulls).
  *
  * Why a custom Catalyst Expression, and why the weights are a
  * CONSTRUCTOR PARAM instead of a literal-array child: (1) the HOF
  * chain evaluates interpreted per row; (2) a literal array embeds the
  * weight VALUES in the plan, so an iterative trainer (one new weight
  * vector per round) generates a fresh codegen source per round and
  * Janino recompiles the whole stage every iteration. Here the array
  * rides in the codegen references table (`addReferenceObj`), so the
  * generated source is IDENTICAL across rounds and the whole-stage
  * compile cache hits — training rounds 2..n pay zero compilation.
  */
case class VecDotLongConst(child: Expression, weights: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType

  private def elemsNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullable: Boolean = super.nullable || elemsNullable

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), weights.length)
    val checkNull = elemsNullable
    var acc = 0L
    var i = 0
    while (i < n) {
      if (checkNull && a.isNullAt(i)) return null
      acc += a.getLong(i) * weights(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("dotWeights", weights, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      // ev.isNull referenced only when nullable (see VecDotSeq note)
      val nullCheck =
        if (elemsNullable)
          s"""if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      val assign =
        if (elemsNullable) s"if (!${ev.isNull}) ${ev.value} = $acc;"
        else s"${ev.value} = $acc;"
      s"""
         |long $acc = 0L;
         |final int $n = java.lang.Math.min($a.numElements(), $wRef.length);
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += $a.getLong($i) * $wRef[$i];
         |}
         |$assign
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecDotLongConst =
    copy(child = newChild)
}

/** 64-bit SimHash of a pre-hashed word set in ONE codegen'd pass:
  * bit k of the result is set when the count of words with bit k set
  * exceeds the count without — identical to the HOF bit-sum fold it
  * replaces (each word contributes +1/-1 per bit; ties (sum 0, incl.
  * the empty set) leave the bit clear).
  */
case class VecSimhash(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val sums = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = a.getLong(i)
      var k = 0
      while (k < 64) {
        sums(k) += (if (((h >>> k) & 1L) == 1L) 1 else -1)
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (sums(k) > 0) sig |= (1L << k)
      k += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val k = ctx.freshName("k"); val h = ctx.freshName("h")
      val sums = ctx.freshName("sums"); val sig = ctx.freshName("sig")
      s"""
         |final int $n = $a.numElements();
         |final int[] $sums = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $a.getLong($i);
         |  for (int $k = 0; $k < 64; $k++) {
         |    $sums[$k] += ((($h >>> $k) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $k = 0; $k < 64; $k++) {
         |  if ($sums[$k] > 0) $sig |= (1L << $k);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecSimhash =
    copy(child = newChild)
}

/** Wide SimHash: `words` x 64 bits of signature in ONE codegen'd
  * pass. Word 0 votes with the raw 64-bit element hash (bit-equal to
  * [[VecSimhash]]); word w > 0 votes with XXH64.hashLong(h, 42 + w) —
  * independent bit planes from the same element hashes. Signature
  * WIDTH is the simhash scale lever: pigeonhole blocks over 64*words
  * bits are ~(64*words)/(maxHamming+1) bits wide, so the block-value
  * space grows exponentially with width and bucket saturation (the
  * quadratic hot-bucket regime) is pushed out by 2^64 per extra word.
  */
case class VecSimhashWide(child: Expression, words: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(words >= 1 && words <= 8, "1..8 signature words supported")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val sums = new Array[Int](64 * words)
    var i = 0
    while (i < n) {
      val h0 = a.getLong(i)
      var w = 0
      while (w < words) {
        val h = if (w == 0) h0 else XXH64.hashLong(h0, 42L + w)
        var k = 0
        while (k < 64) {
          sums(w * 64 + k) += (if (((h >>> k) & 1L) == 1L) 1 else -1)
          k += 1
        }
        w += 1
      }
      i += 1
    }
    val out = new Array[Long](words)
    var w = 0
    while (w < words) {
      var sig = 0L
      var k = 0
      while (k < 64) {
        if (sums(w * 64 + k) > 0) sig |= (1L << k)
        k += 1
      }
      out(w) = sig
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val w = ctx.freshName("w"); val k = ctx.freshName("k")
      val h0 = ctx.freshName("h0"); val h = ctx.freshName("h")
      val sums = ctx.freshName("sums"); val out = ctx.freshName("out")
      val sig = ctx.freshName("sig")
      s"""
         |final int $n = $a.numElements();
         |final int[] $sums = new int[${64 * words}];
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h0 = $a.getLong($i);
         |  for (int $w = 0; $w < $words; $w++) {
         |    final long $h = ($w == 0) ? $h0 : $xxh.hashLong($h0, 42L + $w);
         |    for (int $k = 0; $k < 64; $k++) {
         |      $sums[$w * 64 + $k] += ((($h >>> $k) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |final long[] $out = new long[$words];
         |for (int $w = 0; $w < $words; $w++) {
         |  long $sig = 0L;
         |  for (int $k = 0; $k < 64; $k++) {
         |    if ($sums[$w * 64 + $k] > 0) $sig |= (1L << $k);
         |  }
         |  $out[$w] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecSimhashWide =
    copy(child = newChild)
}

/** Dense matrix-vector product of a vector column with a
  * DRIVER-RESIDENT row-major matrix: out[r] = left-fold over c of
  * M[r·inDims + c] · x[c], each row's fold from 0.0 in input-dim
  * order — the deterministic sequence a spec can reproduce exactly.
  *
  * Why a custom Catalyst Expression: this is the map-side rotation
  * step of OPQ-style quantization (rotate, then product-quantize) —
  * outDims interpreted `aggregate(zip_with(...))` folds per row is
  * the exact shape q87's margin rewrite measured and killed. And why
  * the matrix is a CONSTRUCTOR PARAM riding `addReferenceObj`
  * rather than a literal-array child: the generated source is
  * matrix-value independent, so alternating-optimization loops that
  * refine the rotation recompile nothing (the VecDotLongConst
  * lesson).
  *
  * Contract: element types float or double; folds while both c <
  * inDims and c < x.length (short inputs fold the overlap). NULL
  * elements null the result, checked only when the schema allows
  * element nulls — the VecDotSeq discipline. Output is
  * array<double> with non-null elements.
  */
case class VecMatMulConst(child: Expression, matrix: Array[Double],
                          inDims: Int, outDims: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(inDims >= 1 && outDims >= 1 && matrix.length == inDims * outDims,
    s"matmul: matrix length ${matrix.length} != $outDims x $inDims")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def elemsNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullable: Boolean = super.nullable || elemsNullable

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), inDims)
    val checkNull = elemsNullable
    val x = new Array[Double](n)
    var c = 0
    while (c < n) {
      if (checkNull && a.isNullAt(c)) return null
      x(c) = if (isFloat) a.getFloat(c).toDouble else a.getDouble(c)
      c += 1
    }
    val out = new Array[Double](outDims)
    var r = 0
    while (r < outDims) {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += matrix(r * inDims + i) * x(i); i += 1 }
      out(r) = acc
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("matmulM", matrix, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      val r = ctx.freshName("r"); val i = ctx.freshName("i")
      val x = ctx.freshName("x"); val out = ctx.freshName("out")
      val acc = ctx.freshName("acc")
      val get = if (isFloat) s"(double) $a.getFloat($c)" else s"$a.getDouble($c)"
      // ev.isNull only referenced when nullable (VecDotSeq note)
      val nullCheck =
        if (elemsNullable)
          s"""if ($a.isNullAt($c)) { ${ev.isNull} = true; break; }"""
        else ""
      val body =
        s"""
           |final int $n = java.lang.Math.min($a.numElements(), $inDims);
           |final double[] $x = new double[$n];
           |for (int $c = 0; $c < $n; $c++) {
           |  $nullCheck
           |  $x[$c] = $get;
           |}
         """.stripMargin
      val compute =
        s"""
           |final double[] $out = new double[$outDims];
           |for (int $r = 0; $r < $outDims; $r++) {
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $acc += $mRef[$r * $inDims + $i] * $x[$i];
           |  }
           |  $out[$r] = $acc;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      if (elemsNullable) s"$body\nif (!${ev.isNull}) {\n$compute\n}"
      else s"$body\n$compute"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecMatMulConst =
    copy(child = newChild)
}

object ArrayOps {
  /** Column API: intersection count of two sorted array<long> columns. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedLongIntersectCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column API: minhash signature (array<long> of length numHashes)
    * of a pre-hashed word-set column. */
  def minhashSig(hashes: Column, numHashes: Int): Column =
    ExpressionUtils.column(VecMinhashSig(ExpressionUtils.expression(hashes), numHashes))

  /** Column API: 64-bit simhash of a pre-hashed word-set column. */
  def simhash(hashes: Column): Column =
    ExpressionUtils.column(VecSimhash(ExpressionUtils.expression(hashes)))

  /** Column API: words x 64-bit simhash signature (array<long>);
    * word 0 is bit-equal to [[simhash]]. */
  def simhashWide(hashes: Column, words: Int): Column =
    ExpressionUtils.column(VecSimhashWide(ExpressionUtils.expression(hashes), words))

  /** Column API: all hyperplane-LSH bucket ids for a vector column,
    * one long per table. */
  def hyperplaneBuckets(vec: Column, planes: Int, tables: Int): Column =
    ExpressionUtils.column(VecHyperplaneBuckets(
      ExpressionUtils.expression(vec), planes, tables))

  /** Column API: sequential left-fold dot product of two vector
    * columns (array<float|double>); `vecDot(a, a)` is the squared
    * norm with the same fold order. */
  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDotSeq(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column API: squared L2 distance between a's window starting at
    * element `aStart` (0-based) and all of b — same fold order as the
    * slice + zip_with + aggregate chain it replaces. */
  def vecL2Sq(a: Column, b: Column, aStart: Int = 0): Column =
    ExpressionUtils.column(VecL2SqSeq(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), aStart))

  /** Column API: JL ±1-sign random projection of a vector column to
    * `outDims` dims (portable hashed signs, one fused pass). */
  def projectSigns(vec: Column, outDims: Int): Column =
    ExpressionUtils.column(VecProjectSigns(
      ExpressionUtils.expression(vec), outDims))

  /** Column API: portable md5-fold bucket ids of a token array's
    * unigrams + chr(1)-joined adjacent bigrams (one fused pass). */
  def gramBuckets(tokens: Column, buckets: Long): Column =
    ExpressionUtils.column(VecGramBuckets(
      ExpressionUtils.expression(tokens), buckets))

  /** Column API: portable md5-fold bucket ids of a string's
    * overlapping character n-grams (one fused pass). */
  def charGramBuckets(text: Column, n: Int, buckets: Long): Column =
    ExpressionUtils.column(VecCharGramBuckets(
      ExpressionUtils.expression(text), n, buckets))

  /** Column API: one-pass histogram of an array<long> of bucket ids
    * (counts of value i in slot i, i < buckets), plus a trailing
    * constant-1 bias slot when requested. */
  def bincount(bucketIds: Column, buckets: Int, bias: Boolean = false): Column =
    ExpressionUtils.column(VecBincount(
      ExpressionUtils.expression(bucketIds), buckets, bias))

  /** Column API: exact integer dot of an array<long> column with a
    * driver-resident weight vector (codegen source is weight-value
    * independent, so iterative trainers compile once). */
  def vecDotLong(x: Column, weights: Array[Long]): Column =
    ExpressionUtils.column(VecDotLongConst(
      ExpressionUtils.expression(x), weights))

  /** Column API: row-major matrix x vector product (array<double>
    * out), matrix driver-resident so iterative refiners compile the
    * stage once. */
  def vecMatMul(x: Column, matrix: Array[Double], inDims: Int,
                outDims: Int): Column =
    ExpressionUtils.column(VecMatMulConst(
      ExpressionUtils.expression(x), matrix, inDims, outDims))
}
