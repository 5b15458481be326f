package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression for per-row Shannon character entropy
 * (nats) — the codegen'd replacement for
 * [[graft.operators.TextAnalysis.charEntropyExploded]], whose
 * explode → (doc, char) aggregate → per-doc aggregate shape shuffles
 * ~|text|× the scan. This computes the same
 * `H = ln n − (Σ c·ln c)/n` in ONE pass over the string per row: no
 * explode, no shuffle, no per-row state beyond a 128-slot ASCII count
 * array (+ a map only when non-ASCII appears). At 100 TB the explode
 * formulation ships every character through an exchange; this ships
 * nothing.
 *
 * Semantics: counts are per CODE POINT (DuckDB `string_split(text,'')`
 * parity — the oracle's splitter; also how Spark's `split` advances,
 * surrogate pairs never divided). Empty string yields SQL null (the
 * exploded formulation drops the row — callers filter `length > 0` to
 * keep the two shapes row-identical); null in, null out. Accumulation
 * order over the count array is deterministic (code-point ascending for
 * ASCII, insertion order after), and each (c, n) pair contributes the
 * same terms the aggregate formulation sums — spec-proven equal to the
 * exploded path on randomized corpora after the shared round(…,4).
 */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"char_entropy expects a string input, got $t")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"
  // empty string → null even under a non-null child
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val h = CharEntropyExpr.compute(input.asInstanceOf[UTF8String])
    if (h.isNaN) null else h
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val h = ctx.freshName("h")
      s"""
         |double $h = graft.functions.CharEntropyExpr.compute($s);
         |if (Double.isNaN($h)) { ${ev.isNull} = true; }
         |else { ${ev.value} = $h; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object CharEntropyExpr {

  /** One-pass per-row kernel (called from generated code via the
    * static forwarder): ASCII counts in a stack array, spill to a map
    * only for non-ASCII code points. Returns NaN for the empty string
    * (mapped to SQL null by the expression — ln 0 is meaningless). */
  def compute(s: UTF8String): Double = {
    val str = s.toString
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Array[Int]] = null
    var n = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Array[Int]]()
        val slot = other.get(cp)
        if (slot == null) other.put(cp, Array(1)) else slot(0) += 1
      }
    }
    if (n == 0L) return Double.NaN
    var sumClnC = 0.0
    var c = 0
    while (c < 128) {
      val k = ascii(c)
      if (k > 1) sumClnC += k.toDouble * math.log(k.toDouble)
      c += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val k = it.next()(0)
        if (k > 1) sumClnC += k.toDouble * math.log(k.toDouble)
      }
    }
    math.log(n.toDouble) - sumClnC / n
  }
}
