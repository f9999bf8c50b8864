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

object TextNorm {
  /** Column API: Unicode-normalize a string column (default NFC). */
  def normalize(text: Column, form: String = "NFC"): Column =
    ExpressionUtils.column(UnicodeNormalize(ExpressionUtils.expression(text), form))
}
