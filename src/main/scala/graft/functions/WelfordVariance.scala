package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Running-moments buffer: count, mean, sum of squared deviations. */
final case class WelfordBuf(n: Long, mean: Double, m2: Double)

/**
 * Numerically stable sample variance as a typed `Aggregator` — the
 * engine's UDAF surface (SURVEY.md §2.2 "UDAF"). Welford's online update
 * merges associatively (Chan et al.), so the partial/final split Spark
 * applies to every aggregate works unchanged; register with
 * `udaf(WelfordVariance)` for SQL use.
 *
 * Built-in `var_samp` covers production needs; this exists to keep the
 * extension point exercised and tested, not to replace the built-in.
 */
object WelfordVariance
    extends Aggregator[java.lang.Double, WelfordBuf, java.lang.Double] {

  override def zero: WelfordBuf = WelfordBuf(0L, 0.0, 0.0)

  // boxed input so NULLs arrive as null and are SKIPPED, matching SQL
  // aggregate semantics (a primitive Double encoder would decode NULL
  // as 0.0 and count it as a sample)
  override def reduce(b: WelfordBuf, boxed: java.lang.Double): WelfordBuf = {
    if (boxed == null) return b
    val x = boxed.doubleValue()
    val n = b.n + 1
    val d = x - b.mean
    val mean = b.mean + d / n
    WelfordBuf(n, mean, b.m2 + d * (x - mean))
  }

  override def merge(a: WelfordBuf, b: WelfordBuf): WelfordBuf = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      WelfordBuf(n,
        a.mean + d * b.n / n,
        a.m2 + b.m2 + d * d * a.n * b.n / n)
    }
  }

  // null (not NaN) for n<2, matching SQL var_samp semantics — the q44
  // oracle compares against DuckDB's var_samp, which yields NULL there.
  override def finish(r: WelfordBuf): java.lang.Double =
    if (r.n < 2) null else java.lang.Double.valueOf(r.m2 / (r.n - 1))

  override def bufferEncoder: Encoder[WelfordBuf] = Encoders.product[WelfordBuf]
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}
