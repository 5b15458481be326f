package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the training-pipeline ops the SQL oracle can't state:
  * pack capacity bounds, split determinism, planted contamination. */
class PipelineSpec extends AnyFunSuite with SparkTestSession {

  private val sf = "/root/testdata/sf0.01"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("packSequences: packs respect capacity unless a single doc exceeds it") {
    val packs = Pipeline.packSequences(docs, "doc_id", "text", "lang", 2048)
      .collect()
    assert(packs.nonEmpty)
    // a pack may overflow capacity only via its LAST appended doc, so any
    // multi-doc pack stays under capacity + max single-doc token count
    val maxDocTok = docs
      .select(max(size(split(col("text"), " ")))).collect()(0).getInt(0)
    packs.foreach { p =>
      val tokens = p.getAs[Long]("pack_tokens")
      assert(tokens < 2048L + maxDocTok,
        s"pack ${p.getAs[Long]("pack_id")} overflows: $tokens")
    }
    // contiguity (pack ids per lang are 0..max, no gaps) holds only when
    // no single doc exceeds capacity — an oversized doc legitimately
    // jumps the running sum across >1 boundary and leaves a gap. The
    // corpus satisfies that today; guard so growth flags the assumption
    // instead of failing a then-correct operator.
    if (maxDocTok <= 2048) {
      val byLang = packs.groupBy(_.getAs[String]("lang"))
      byLang.foreach { case (_, ps) =>
        val ids = ps.map(_.getAs[Long]("pack_id")).sorted.toSeq
        assert(ids == (0L until ids.length.toLong).toSeq)
      }
    } else cancel(s"corpus grew a doc of $maxDocTok tokens > capacity; " +
      "contiguity assertion not applicable")
  }

  test("hashSplit: deterministic across recomputation, ratios near 80/10/10") {
    val a = Pipeline.hashSplit(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Pipeline.hashSplit(docs.repartition(7), "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b) // partitioning-independent
    val n = a.values.sum.toDouble
    assert(a("train") / n > 0.7 && a("train") / n < 0.9)
    assert(a("val") / n > 0.05 && a("val") / n < 0.15)
    assert(a("test") / n > 0.05 && a("test") / n < 0.15)
  }

  test("contaminatedDocs flags a planted copy and ignores clean docs") {
    import spark.implicits._
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "completely unrelated words about astronomy and starlight maps")
    ).toDF("doc_id", "text")
    val probes = Seq(
      (1L, "benchmark question the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val hits = Pipeline.contaminatedDocs(corpus, probes, "doc_id", "text", 5)
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(100L))
  }
}
