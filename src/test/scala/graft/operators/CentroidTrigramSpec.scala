package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tests for the round-12 classification + substring-search operators:
  * [[Similarity.medianCentroids]] / [[Similarity.classifyNearestCentroid]]
  * (hand-computed medians, tie rule, and equality with a window-argmax
  * reference formulation on real embeddings) and
  * [[Search.trigramPostings]] / [[Search.substringSearch]] (hand grams,
  * a planted false candidate the verify step must remove, and full-scan
  * equality on a real corpus). */
class CentroidTrigramSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("medianCentroids: odd count picks the middle, even the lower middle") {
    val train = Seq(
      (1L, 0, Seq(1f, 6f)), (2L, 0, Seq(3f, 2f)), (3L, 0, Seq(5f, 4f)),
      (4L, 1, Seq(10f, 0f)), (5L, 1, Seq(20f, 2f))).toDF(
      "vec_id", "label", "embedding")
    val got = Similarity.medianCentroids(train, "vec_id", "embedding", "label")
      .orderBy("label")
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1)))
    // label 0: dim medians of (1,3,5) and (6,2,4) = (3, 4); label 1 has
    // an EVEN count → lower middles of (10,20) and (0,2) = (10, 0)
    assert(got.toSeq == Seq((0, Seq(3f, 4f)), (1, Seq(10f, 0f))))
  }

  test("classifyNearestCentroid: argmax cosine, ties go to the smaller label") {
    val cents = Seq((0, Seq(1f, 0f)), (1, Seq(0f, 1f))).toDF(
      "label", "centroid")
    val test = Seq(
      (10L, 1, Seq(2f, 0f)),   // aligned with centroid 0
      (11L, 0, Seq(0f, 3f)),   // aligned with centroid 1
      (12L, 1, Seq(1f, 1f))).toDF("vec_id", "label", "embedding") // exact tie
    val got = Similarity.classifyNearestCentroid(
        test, cents, "vec_id", "embedding", "label")
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(got.toSeq == Seq((10L, 0), (11L, 1), (12L, 0)))
  }

  test("classifyNearestCentroid equals the window-argmax formulation on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.medianCentroids(
      emb.where(col("vec_id") % 2 === 0), "vec_id", "embedding", "label")
    val fast = Similarity.classifyNearestCentroid(
        emb.where(col("vec_id") % 2 === 1), cents,
        "vec_id", "embedding", "label")
      .select(col("vec_id"), col("assigned"), round(col("cos"), 9).as("c"))
    // reference: explicit cross join + per-vector row_number argmax
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("assigned"))
    val ref = emb.where(col("vec_id") % 2 === 1)
      .crossJoin(broadcast(cents.select(col("label").as("assigned"),
        col("centroid"))))
      .withColumn("cos", Similarity.cosine(col("embedding"), col("centroid")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("assigned"), round(col("cos"), 9).as("c"))
    assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty)
    assert(fast.count() == emb.where(col("vec_id") % 2 === 1).count())
  }

  test("maxSimTopK: per-aspect best match, order-invariant, pooled cosine can't tell") {
    // q = (e1 | e2): doc 11 = (e1 | e2) and doc 12 = (e2 | e1) both
    // score 1+1 = 2 (MaxSim ignores sub ORDER); doc 13 = (e1 | e1)
    // matches only one aspect → 1.0; a POOLED cosine would score 12
    // and 13 identically (both share half the mass)
    val emb = Seq(
      (10L, Seq(1f, 0f, 0f, 1f)),
      (11L, Seq(1f, 0f, 0f, 1f).map(identity)),
      (12L, Seq(0f, 1f, 1f, 0f)),
      (13L, Seq(1f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val got = Similarity.maxSimTopK(emb, emb.where(col("vec_id") === 10),
        "vec_id", "embedding", subspaces = 2, subDim = 2, k = 3)
      .orderBy("rn")
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((11L, 2.0), (12L, 2.0), (13L, 1.0)))
  }

  test("trigramPostings: hand grams, short texts contribute none") {
    val docs = Seq((1L, "abcd"), (2L, "ab"), (3L, "aaaa")).toDF(
      "doc_id", "text")
    val got = Search.trigramPostings(docs, "doc_id", "text")
      .orderBy("doc_id", "gram")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // doc 3's overlapping "aaa" grams collapse via the per-doc distinct
    assert(got.toSeq == Seq((1L, "abc"), (1L, "bcd"), (3L, "aaa")))
  }

  test("substringSearch removes planted false candidates (all grams, no match)") {
    val docs = Seq(
      (1L, "the scan slow path"),      // true match
      (2L, "slow scan slot war"),      // every trigram of the pattern, no contiguous match
      (3L, "nothing here")).toDF("doc_id", "text")
    val pp = Search.trigramPostings(docs, "doc_id", "text")
    // the planted doc really is a candidate: it holds all pattern grams
    val grams = "scan slow".sliding(3).toSeq.distinct
    val candIds = pp.filter(col("gram").isin(grams: _*))
      .select("doc_id", "gram").distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .where(col("n") === grams.size)
      .collect().map(_.getLong(0)).sorted
    assert(candIds.toSeq == Seq(1L, 2L), "planted candidate missing")
    val got = Search.substringSearch(pp, docs, "doc_id", "text", "scan slow")
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L))
  }

  test("substringSearch equals the full contains scan on a real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pp = Search.trigramPostings(docs, "doc_id", "text")
    val viaIndex = Search.substringSearch(pp, docs, "doc_id", "text",
      "scan slow").orderBy("doc_id").collect().map(_.getLong(0))
    val full = docs.where(col("text").contains("scan slow"))
      .orderBy("doc_id").collect().map(_.getAs[Long]("doc_id"))
    assert(viaIndex.toSeq == full.toSeq && full.nonEmpty)
  }

  test("TrigramsExpr equals the HOF formulation, code points never split") {
    // real corpus: identical (doc_id, gram) multisets
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fast = Search.trigramPostings(docs, "doc_id", "text")
    val hof = Search.trigramPostingsHof(docs, "doc_id", "text")
    assert(fast.exceptAll(hof).isEmpty && hof.exceptAll(fast).isEmpty)
    // surrogate pairs: 😀 is one code point (two UTF-16 units) — the
    // windows advance per code point exactly like the HOF's substr
    val emoji = Seq((1L, "😀😀😀a"))
      .toDF("doc_id", "text")
    val eFast = Search.trigramPostings(emoji, "doc_id", "text")
      .orderBy("gram").collect().map(_.getString(1)).toSeq
    val eHof = Search.trigramPostingsHof(emoji, "doc_id", "text")
      .orderBy("gram").collect().map(_.getString(1)).toSeq
    assert(eFast == eHof && eFast.size == 2)
  }

  test("substringSearch rejects sub-trigram patterns") {
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    val pp = Search.trigramPostings(docs, "doc_id", "text")
    intercept[IllegalArgumentException] {
      Search.substringSearch(pp, docs, "doc_id", "text", "ab")
    }
  }

  test("substringSearch windows non-BMP patterns per code point") {
    // 😀 is two UTF-16 units; a sliding(3) over units would split the
    // surrogate pair and the index lookup would find nothing
    val docs = Seq((1L, "say 😀😀😀a loud"), (2L, "no emoji here"))
      .toDF("doc_id", "text")
    val pp = Search.trigramPostings(docs, "doc_id", "text")
    val got = Search.substringSearch(pp, docs, "doc_id", "text", "😀😀😀a")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L), s"got $got — surrogate-pair grams missed")
    // length validation counts code points: 😀😀😀 is 3 code points
    // (6 UTF-16 units) and must be accepted, not rejected
    val emojiOnly = Search.substringSearch(pp, docs, "doc_id", "text",
      "😀😀😀").collect().map(_.getLong(0)).toSeq
    assert(emojiOnly == Seq(1L))
    // ...while 2 code points must be rejected even at 4 UTF-16 units
    intercept[IllegalArgumentException] {
      Search.substringSearch(pp, docs, "doc_id", "text", "😀😀")
    }
  }
}
