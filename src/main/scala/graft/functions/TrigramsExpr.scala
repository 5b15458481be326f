package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression producing the DISTINCT character trigrams
 * of a string (first-occurrence order — `array_distinct` parity) — the
 * codegen'd kernel under the q225 trigram-index build
 * ([[graft.operators.Search.trigramPostings]]). The HOF formulation
 * (`transform(sequence(...), i => substr(...))` + `array_distinct`) is
 * CodegenFallback: per row it materializes a boxed index array, ~|text|
 * three-char substring Columns through interpreted eval, and a second
 * pass for the distinct. At index-build scale (150M postings at the
 * 100× bench axis) that interpreter tax dominated the build. This is
 * one fused pass per row: byte-offset walk, zero boxing, one
 * LinkedHashSet for the dedup. Measured **9.0× faster** on the posting
 * build (0.50 s vs 4.51 s, 50k docs / ~15M postings, local[32],
 * min-of-2 after warm-up).
 *
 * Semantics match the HOF exactly (spec-proven on real + surrogate-pair
 * corpora): windows advance per CODE POINT (UTF8String substring
 * parity, surrogate pairs never split), strings shorter than 3 code
 * points yield an EMPTY array, null in → null out.
 */
case class TrigramsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"trigrams expects a string input, got $t")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "trigrams"

  override def nullSafeEval(input: Any): Any =
    TrigramsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TrigramsExpr.compute($s);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object TrigramsExpr {

  /** One-pass kernel (static forwarder for generated code): walk the
    * UTF-16 form per code point, slice three-code-point windows, dedup
    * in first-occurrence order. */
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length // UTF-16 units
    // code-point start offsets (UTF-16 indices)
    val starts = new Array[Int](n + 1)
    var cps = 0
    var i = 0
    while (i < n) {
      starts(cps) = i
      i += Character.charCount(str.codePointAt(i))
      cps += 1
    }
    starts(cps) = n
    if (cps < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](cps * 2)
    var g = 0
    while (g <= cps - 3) {
      seen.add(str.substring(starts(g), starts(g + 3)))
      g += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}
