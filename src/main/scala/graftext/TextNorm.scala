package org.apache.spark.sql.graftext

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen'd Catalyst expression —
  * the canonical first step of text curation (the same logical
  * doc occurring precomposed vs decomposed would defeat exact dedup,
  * shingle counts, and BPE vocabularies; normalize once at ingest).
  *
  * Why an Expression rather than a UDF (SURVEY.md §3 preference
  * (b)): it stays inside whole-stage codegen — no per-row
  * SerDe/closure dispatch — and the ASCII/already-normalized fast
  * path (`Normalizer.isNormalized`, a scan without allocation)
  * returns the input UTF8String untouched, which on realistic
  * mostly-ASCII corpora means zero allocation per row.
  *
  * `java.text.Normalizer` implements Unicode Standard Annex #15 —
  * the same spec DuckDB's utf8proc `nfc_normalize` implements, which
  * is what lets q75 gate the normalized text byte-for-byte across
  * engines.
  *
  * @param form one of NFC | NFD | NFKC | NFKD (validated eagerly)
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {

  // fail at plan time, not per row, on a bad form name
  private val normForm = Normalizer.Form.valueOf(form)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = child.dataType

  override def nullSafeEval(s: Any): Any = {
    val u = s.asInstanceOf[UTF8String]
    val str = u.toString
    if (Normalizer.isNormalized(str, normForm)) u
    else UTF8String.fromString(Normalizer.normalize(str, normForm))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val f = s"java.text.Normalizer.Form.${normForm.name()}"
      s"""
         |final java.lang.String $s = $c.toString();
         |if (java.text.Normalizer.isNormalized($s, $f)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, $f));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

/** One-pass code-point histogram surface (static helper so the
  * interpreted and codegen paths of [[CharHistStats]] share one
  * implementation — scalac emits a static forwarder the generated
  * Java calls directly). */
object CharHist {
  def compute(u: UTF8String): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val s = u.toString
    val m = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val c = m.get(cp)
      if (c == null) m.put(cp, Array(1L)) else c(0) += 1
    }
    var sumSq = 0L
    val it = m.values().iterator()
    while (it.hasNext) { val c = it.next()(0); sumSq += c * c }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, m.size.toLong, sumSq))
  }
}

/** Per-document character-diversity surface in ONE pass: code-point
  * count, distinct code points, and Σc² over the per-code-point
  * counts — the integer core of the Simpson/Herfindahl concentration
  * index (Σ(c/n)², the gibberish/low-entropy filter that needs no
  * logarithm: a keyboard-mash doc concentrates mass on few symbols
  * and its index spikes, exactly what a char-entropy rule detects,
  * but every surface here is an exact int64 an independent engine
  * restates bit-for-bit — the q59 ln-free gating discipline applied
  * at character granularity).
  *
  * Counts are CODE POINTS (surrogate pairs count once), matching
  * engines whose length() is code-point-based. Σc² ≤ n², inside
  * int64 for any document under ~3×10⁹ chars — beyond every
  * realistic page; a media-transcript outlier that long belongs in
  * binary pipelines anyway.
  */
case class CharHistStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_chars",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_distinct",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("sum_sq",
      org.apache.spark.sql.types.LongType, nullable = false)))

  override def nullSafeEval(s: Any): Any =
    CharHist.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = org.apache.spark.sql.graftext.CharHist.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): CharHistStats =
    copy(child = newChild)
}

/** DEFLATE-compressed length of the UTF-8 bytes (raw stream, level 6,
  * no zlib/gzip header so the surface is pure entropy coding). The
  * Deflater is thread-local and reset per row — allocating one per
  * row would dominate the scan; per-thread reuse is the standard
  * java.util.zip discipline for columnar loops. */
object DeflateLen {
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }
  def compute(u: UTF8String): Long = {
    val d = local.get()
    d.reset()
    d.setInput(u.getBytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

/** Compressed size of a string's UTF-8 bytes — the zlib
  * compression-ratio quality signal (low ratio = repetitive/
  * templated/boilerplate text, near-1 ratio = high-entropy noise;
  * both tails are drop candidates in published curation pipelines).
  *
  * Deliberately NOT SQL-oracle-gated: the byte length of a DEFLATE
  * stream is implementation-defined (zlib version, strategy), so no
  * independent engine can restate it bit-for-bit. It is spec-bound
  * instead (monotone envelope: repeated text compresses far below
  * high-entropy text; determinism within this JVM), and downstream
  * thresholds must be calibrated per deployment, as with any
  * compressor-dependent signal.
  */
case class DeflateSize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(s: Any): Any =
    DeflateLen.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = org.apache.spark.sql.graftext.DeflateLen.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object TextNorm {
  /** Column API: Unicode-normalize a string column (default NFC). */
  def normalize(text: Column, form: String = "NFC"): Column =
    ExpressionUtils.column(UnicodeNormalize(ExpressionUtils.expression(text), form))

  /** Column API: struct(n_chars, n_distinct, sum_sq) — the one-pass
    * char-diversity surface (select the struct in its own projection,
    * then extract fields — the st_measures decode-once shape). */
  def charStats(text: Column): Column =
    ExpressionUtils.column(CharHistStats(ExpressionUtils.expression(text)))

  /** Column API: DEFLATE-compressed byte length (see [[DeflateSize]]
    * for why this is spec-bound rather than oracle-gated). */
  def deflateLen(text: Column): Column =
    ExpressionUtils.column(DeflateSize(ExpressionUtils.expression(text)))
}
