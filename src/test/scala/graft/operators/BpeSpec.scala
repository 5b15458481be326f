package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge learning against the hand-computed textbook corpus, plus
  * the distribution-invariance and compression properties the
  * determinism contract promises. */
class BpeSpec extends AnyFunSuite with SparkTestSession {

  test("learns the hand-computed merges on the textbook corpus") {
    import spark.implicits._
    // low:3 lower:2 newest:1 — worked by hand in the assertions
    val docs = Seq("low low low", "lower lower newest").toDF("text")
    val (merges, words) = Bpe.learn(docs, "text", 3)
    // pairs r1: (l,o)=5 ties (o,w)=5 → tiebreak a asc picks (l,o)
    // r2: (lo,w)=5; r3: (low,</w>)=3 beats (low,e)=2,(e,r)=2,(r,</w>)=2
    assert(merges.map(m => (m.rnk, m.ml, m.mr, m.cnt)) == Seq(
      (1L, "l", "o", 5L), (2L, "lo", "w", 5L), (3L, "low", "</w>", 3L)))
    val segmented = words.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.unpersist()
    assert(segmented(" low</w> ") == 3L)
    assert(segmented(" low e r </w> ") == 2L)
  }

  test("applyStats with the learned merges reproduces training segmentation stats") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(("low low low", "a"), ("lower lower newest", "a"))
      .toDF("text", "lang")
    val merges = Bpe.mergeTable(docs, "text", 3)
    // replaying the stored merges over the SAME corpus must match the
    // stats of learn()'s final segmented vocabulary exactly
    val (_, words) = Bpe.learn(docs, "text", 3)
    val expectTokens = words
      .select(sum(size(expr("split(trim(w), ' ')")) * col("n")))
      .first().getLong(0)
    val expectWords = words.select(sum("n")).first().getLong(0)
    words.unpersist()
    val got = Bpe.applyStats(docs, "text", "lang", merges).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getString(0), r.getLong(1), r.getLong(2)) ==
      (("a", expectWords, expectTokens)), r)
    // fully merged words: low</w> occurs 3 times after merge 3
    assert(r.getLong(3) == 3L, r)
  }

  test("applyStats on held-out text degrades gracefully: unseen words stay character-segmented") {
    import spark.implicits._
    val train = Seq(("low low low", "x")).toDF("text", "lang")
    val merges = Bpe.mergeTable(train, "text", 2) // (l,o), (lo,w)
    val test_ = Seq(("zzz low", "x")).toDF("text", "lang")
    val got = Bpe.applyStats(test_, "text", "lang", merges).collect().head
    // low -> 'low </w>' (2 tokens); zzz -> 'z z z </w>' (4 tokens)
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) == ((2L, 6L, 0L)),
      got)
  }

  test("merge table is partitioning-invariant and merges compress") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq("aa ab aa ba bab", "ab aa bab aa aa ab").toDF("text")
    val one = Bpe.mergeTable(docs, "text", 4).collect().toSeq
    val many = Bpe.mergeTable(docs.repartition(7), "text", 4).collect().toSeq
    assert(one == many)
    // every merge strictly reduces the total symbol count
    val (ms, words) = Bpe.learn(docs, "text", 4)
    val symbols = words
      .select(sum(size(expr("split(trim(w), ' ')")) * col("n"))).first().getLong(0)
    words.unpersist()
    val base = Bpe.wordCounts(docs, "text")
      .select(sum(size(expr("split(trim(w), ' ')")) * col("n"))).first().getLong(0)
    // counts include overlapping occurrences but merges apply
    // non-overlapping, so the reduction is bounded by — not equal to —
    // the count sum
    assert(symbols < base && base - symbols <= ms.map(_.cnt).sum)
  }
}
