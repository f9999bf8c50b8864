package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftext.{Bits, FunctionInjection, UnicodeNormalize, VecL2SqSeq, ZOrderKey}

/** SQL surface for the NATIVE text/layout expressions (the st_*
  * discipline applied to the LLM-pipeline side): registered through
  * the same extension hook as [[GeoFunctions]], so a shared cluster
  * gets `zorder_key` / `vec_l2sq` / `unicode_normalize` in every
  * session with zero per-notebook setup.
  *
  * Deliberately NATIVE-ONLY: a function-registry builder must return
  * an analyzable catalyst Expression, and composite Column chains
  * built from `functions._` carry UnresolvedFunction nodes that never
  * pass through the analyzer on this path (measured: INTERNAL_ERROR
  * at codegen). The composite operators (matchKey, canonicalizeUrl,
  * stripTags, decodeEntities) therefore stay Scala-API —
  * re-implementing them as UDFs for SQL would fork their semantics,
  * the exact divergence the byte-gates exist to prevent. */
object TextFunctions {

  private def form(e: Expression): String = {
    require(e.foldable, "unicode_normalize: form must be a literal")
    e.eval().toString
  }

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "zorder_key" -> (xs => ZOrderKey(xs(0), xs(1))),
    "vec_l2sq" -> (xs => VecL2SqSeq(xs(0), xs(1), 0)),
    "unicode_normalize" -> (xs => UnicodeNormalize(xs(0), form(xs(1)))))

  def injectInto(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (n, b) => FunctionInjection.injectExpr(ext, n, b) }

  /** Late-bind into an existing session (tests; late setup). */
  def registerBuilders(spark: SparkSession): Unit =
    builders.foreach { case (n, b) => FunctionInjection.registerExprInto(spark, n, b) }
}
