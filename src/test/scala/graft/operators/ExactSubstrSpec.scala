package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ExactSubstr duplicate-span detection and cut (Lee et al. 2022,
  * suffix-array-free): planted cross-document duplicates must surface
  * as maximal anchor-run spans with exact boundaries, overlapping
  * islands must union in the cut, and the documented chimeric
  * over-merge must behave as declared. */
class ExactSubstrSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private val K = 3

  test("planted shared span surfaces with exact boundaries in both docs") {
    // "the quick brown fox jumps" (5 words) shared verbatim; contexts
    // differ → anchors at the 3 shared k-gram positions only
    val docs = Seq(
      (1L, "alpha beta the quick brown fox jumps gamma delta"),
      (2L, "one two three the quick brown fox jumps four")).toDF(
      "doc_id", "text")
    val got = Dedup.exactSubstrSpans(docs, "doc_id", "text", K)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // doc 1: shared words at positions 2..6 → anchors 2,3,4 → span
    // start 2, words 3+K-1=5; doc 2: positions 3..7 → start 3, len 5
    assert(got.toSeq == Seq((1L, 2L, 5L), (2L, 3L, 5L)), got.toSeq)
  }

  test("span md5 fingerprints the same covered words on both sides") {
    val docs = Seq(
      (1L, "x y shared words here z"),
      (2L, "shared words here q r s")).toDF("doc_id", "text")
    val md5s = Dedup.exactSubstrSpans(docs, "doc_id", "text", K)
      .select("span_md5").distinct().collect()
    assert(md5s.length == 1, "the same span must hash identically")
  }

  test("chimeric adjacency merges into one span (the documented over-merge)") {
    // doc 1 holds X-span then Y-span back to back; X duplicates with
    // doc 2, Y with doc 3 — every k-window of the concatenation that
    // straddles the seam is NOT duplicated unless k-grams align, so
    // plant the seam k-gram too (doc 4) to force the merge
    val x = "ex one two three"
    val y = "why five six seven"
    val docs = Seq(
      (1L, s"$x $y"),
      (2L, s"left pad $x"),
      (3L, s"$y right pad"),
      // doc 4 plants BOTH seam grams ("two three why", "three why
      // five") so every anchor of doc 1 is duplicated somewhere
      (4L, "two three why padding three why five")).toDF(
      "doc_id", "text")
    val spans = Dedup.exactSubstrSpans(docs, "doc_id", "text", K)
      .filter(col("doc_id") === 1L)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    // every anchor position of doc 1 is duplicated somewhere →
    // one merged span covering all 8 words
    assert(spans.toSeq == Seq((0L, 8L)), spans.toSeq)
  }

  test("cut removes covered words, unions overlaps, passes clean docs byte-exact") {
    val docs = Seq(
      (1L, "alpha beta the quick brown fox jumps gamma delta"),
      (2L, "one two three the quick brown fox jumps four"),
      (3L, "совершенно unique document nothing shared at all")).toDF(
      "doc_id", "text")
    val got = Dedup.exactSubstrCut(docs, "doc_id", "text", K)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(got(0) == ((1L, 9L, 5L, "alpha beta gamma delta")))
    assert(got(1) == ((2L, 9L, 5L, "one two three four")))
    assert(got(2) == ((3L, 7L, 0L,
      "совершенно unique document nothing shared at all")))
  }

  test("cut interval union never double-counts overlapping spans") {
    // TWO islands (anchor 2 is clean) whose word intervals overlap:
    // {0,1} covers words [0,4), {3} covers [3,6) — naive sum is 7,
    // the union is 6; cut_words must be the union
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "z a b c d y"),      // duplicates anchors 0 ("a b c"), 1 ("b c d")
      (3L, "w d e f v u")).toDF("doc_id", "text") // duplicates anchor 3
    val spans = Dedup.exactSubstrSpans(docs, "doc_id", "text", K)
      .filter(col("doc_id") === 1L).orderBy("span_start")
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(spans.toSeq == Seq((0L, 4L), (3L, 3L)), spans.toSeq)
    val got = Dedup.exactSubstrCut(docs, "doc_id", "text", K)
      .filter(col("doc_id") === 1L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq((8L, 6L, "g h")), got.toSeq)
  }

  test("sub-k documents carry no spans and pass through the cut") {
    val docs = Seq((1L, "one two"), (2L, "one two")).toDF("doc_id", "text")
    assert(Dedup.exactSubstrSpans(docs, "doc_id", "text", K).isEmpty)
    val kept = Dedup.exactSubstrCut(docs, "doc_id", "text", K)
      .orderBy("doc_id").collect().map(_.getString(3)).toSeq
    assert(kept == Seq("one two", "one two"))
  }
}
