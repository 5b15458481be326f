package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tests for the round-12 quality/selection operators: the one-pass
  * repetition kernel ([[graft.functions.RepetitionStatsExpr]] via
  * [[TextAnalysis.repetitionStats]]) against hand-counted documents AND
  * the exploded pure-built-ins formulation on a real corpus, and
  * [[Pipeline.dsirWeights]] against a hand-computed smoothed-unigram
  * example plus its target=source fixpoint. */
class RepetitionDsirSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("repetitionStats: hand-counted grams") {
    // tokens: a b a b a c c c → 7 bigrams, top "a b"/"b a"/"c c" = 2;
    // 6 trigrams, "a b a" occurs twice → 2 duplicated instances
    val got = TextAnalysis.repetitionStats(
        Seq((1L, "a b a b a c c c")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq((7L, 2L, 6L, 2L)))
  }

  test("repetitionStats: short and degenerate inputs") {
    val got = TextAnalysis.repetitionStats(
        Seq((1L, "solo"), (2L, "two tokens"), (3L, "")).toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // 1 token → no grams; 2 tokens → one bigram, no trigrams; the
    // empty string splits to one empty token (splitter parity) → zeros
    assert(got.toSeq == Seq((1L, 0L, 0L, 0L, 0L), (2L, 1L, 1L, 0L, 0L),
      (3L, 0L, 0L, 0L, 0L)))
  }

  test("repetitionStats: null in, null out") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b")))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.repetitionStatsCol(col("text")).as("r"))
      .orderBy("doc_id").collect()
    assert(df(0).isNullAt(1))
    assert(!df(1).isNullAt(1))
  }

  test("repetitionStats: expression equals the exploded formulation") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val expr = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .filter(col("n_trigrams") > 0) // exploded path keeps ≥3 tokens only
    val ref = TextAnalysis.repetitionStatsExploded(docs, "doc_id", "text")
    assert(expr.count() == docs.count()) // every corpus doc has ≥3 tokens
    assert(expr.exceptAll(ref).isEmpty && ref.exceptAll(expr).isEmpty)
  }

  test("dsirWeights: hand-computed smoothed unigram ratios") {
    // target doc 1 "a a b", source adds doc 2 "b c":
    // nt=3 ns=5 v=3; ct: a=2 b=1 c=0; cs: a=2 b=2 c=1
    val docs = Seq((1L, "a a b", "en"), (2L, "b c", "de"))
      .toDF("doc_id", "text", "lang")
    val got = Pipeline.dsirWeights(docs, "doc_id", "text",
        col("lang") === "en")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // doc1: 2·ln(3/3)+ln(2/3) + 3·ln(8/6) = 0.4576; heavy: a only
    //   ((2+1)·8=24 > (2+1)·6=18), twice
    // doc2: ln(2/3)+ln(1/2) + 2·ln(8/6) = −0.5232; no heavy tokens
    assert(got.toSeq == Seq((1L, 3L, 2L, 0.4576), (2L, 2L, 0L, -0.5232)))
  }

  test("dsirWeights: target = source is the zero-weight fixpoint") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val w = Pipeline.dsirWeights(docs, "doc_id", "text", lit(true))
    // ct = cs for every word and the normalizer is ln 1: every doc
    // weighs exactly 0 and no token is target-heavy
    assert(w.filter(col("log_weight") =!= 0.0 ||
      col("n_target_heavy") =!= 0L).isEmpty)
    assert(w.count() == docs.count())
  }

  test("dsirWeights: empty target rejected") {
    val docs = Seq((1L, "a b", "en")).toDF("doc_id", "text", "lang")
    assertThrows[IllegalArgumentException] {
      Pipeline.dsirWeights(docs, "doc_id", "text", col("lang") === "zz")
    }
  }
}
