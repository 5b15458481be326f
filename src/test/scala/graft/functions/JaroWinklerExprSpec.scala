package graft.functions

import graft.SparkTestSession
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Byte-parity contract for [[JaroWinklerExpr]] against DuckDB's
  * `jaro_winkler_similarity` — goldens are values probed from DuckDB
  * 1.0.0 in this container (the oracle engine), covering the boost
  * threshold, the 4-char prefix cap, window-0 transposition blindness,
  * empties, and the BYTE (not code-point) alignment on multi-byte
  * text. */
class JaroWinklerExprSpec extends AnyFunSuite with SparkTestSession {

  private def jw(a: String, b: String): Double =
    JaroWinklerExpr.compute(UTF8String.fromString(a),
      UTF8String.fromString(b))

  private val goldens = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("", "", 0.0),
    ("a", "", 0.0),
    ("a", "b", 0.0),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("kitten", "sitting", 0.746031746031746),
    ("x", "x", 1.0),
    ("prefix_same_tail_a", "prefix_same_tail_b", 0.9777777777777777),
    // boost threshold: jaro 0.6 <= 0.7 → NO prefix boost
    ("abcdxxxxxx", "abcdyyyyyy", 0.6),
    ("ab", "aX", 0.6666666666666666),
    // prefix cap 4 (5 shared leading chars still boost by 4)
    ("aaaaab", "aaaaac", 0.9333333333333333),
    ("abcdefghij", "abcdefghix", 0.96),
    // window-0: adjacent swap in 2-char strings matches nothing
    ("ab", "ba", 0.0),
    ("CRATE", "TRACE", 0.7333333333333334),
    ("aXbXcX", "XaXbXc", 0.8333333333333334),
    // BYTE alignment: 'été' is 5 UTF-8 bytes vs 3 — DuckDB aligns
    // bytes, and so do we
    ("été", "ete", 0.5111111111111111)
  )

  goldens.foreach { case (a, b, want) =>
    test(s"golden: jw('$a','$b') == $want") {
      assert(jw(a, b) == want, s"got ${jw(a, b)}")
    }
  }

  test("symmetry and null handling through the Column API") {
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA"), (null, "x"), ("x", null))
      .toDF("a", "b")
    val out = df.select(TextAnalysis.jaroWinkler(col("a"), col("b")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(out(0) == 0.9611111111111111)
    assert(out(1) == null && out(2) == null)
    // symmetric on a randomized corpus
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 300) {
      val s1 = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val s2 = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      assert(jw(s1, s2) == jw(s2, s1), s"asymmetric on ($s1, $s2)")
      assert(jw(s1, s2) >= 0.0 && jw(s1, s2) <= 1.0)
    }
  }

  test("jaro_winkler and char_entropy are first-class SQL functions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT round(jaro_winkler('MARTHA', 'MARHTA'), 4) jw, " +
        "round(char_entropy('abcd'), 4) h")
      .collect().head
    assert(r.getDouble(0) == 0.9611)
    assert(r.getDouble(1) == math.rint(math.log(4) * 1e4) / 1e4)
  }

  test("expression compiles into whole-stage codegen") {
    val ranged = SparkTestSession.session.range(50)
      .select(concat(lit("k"), col("id")).as("a"),
        concat(lit("k"), col("id") + 1).as("b"))
    val plan = ranged
      .select(TextAnalysis.jaroWinkler(col("a"), col("b")).as("s"))
      .queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("jaro_winkler"))
      .getOrElse("")
    assert(line.trim.startsWith("*("), plan)
  }
}
