package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression for Unicode normalization (NFC/NFD/
 * NFKC/NFKD via `java.text.Normalizer`) — the canonicalization step a
 * text pipeline runs before ANY hashing, dedup, or tokenization:
 * visually identical strings with different code-point sequences
 * (composed é vs e+U+0301, compatibility ligatures, width variants)
 * otherwise land in different dedup buckets and different vocab rows.
 *
 * One pass per row inside whole-stage codegen (a static call on the
 * row's string — no UDF serialization, no allocation beyond the
 * normalized result). The ASCII fast path is free: `Normalizer`
 * returns the SAME string instance when the input is already
 * normalized, so the dominant all-ASCII corpus slice costs one isNormalized
 * scan. Null in, null out. The `form` is validated at construction.
 *
 * Cross-engine note: DuckDB exposes NFC only (`nfc_normalize`) — the
 * q229 oracle pins the NFC path; other forms are spec-covered.
 */
case class UnicodeNormExpr(child: Expression, form: String)
    extends UnaryExpression {

  require(UnicodeNormExpr.Forms.contains(form),
    s"unicode_norm form must be one of ${UnicodeNormExpr.Forms}, got $form")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"unicode_norm expects a string input, got $t")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_norm"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormExpr.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = graft.functions.UnicodeNormExpr.normalize($s, "$form");""")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object UnicodeNormExpr {

  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Static kernel (called from generated code): normalize, reusing
    * the input buffer when the string is already in the target form
    * (the all-ASCII fast path). */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = java.text.Normalizer.Form.valueOf(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}
