package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the round-10 candidate-generation operators: blocked
  * edit-distance pairs (hot-block cap), the distributed global rank,
  * sorted-neighborhood pairs (incl. bucket-boundary coverage), the
  * bigram-LM document score, and kNN majority-vote classification. */
class BlockedPairsSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  // -- editDistancePairs -----------------------------------------------

  private lazy val edocs = Seq(
    (1L, "g1", "kitten in the yard"),
    (2L, "g1", "sitten in the yard"),   // 1 edit from doc 1
    (3L, "g1", "a completely different string"),
    (4L, "g2", "kitten in the yard"),   // same text, OTHER block: no pair
    (5L, "g2", "kitten in the yarn")    // 1 edit from doc 4
  ).toDF("id", "blk", "txt")

  test("editDistancePairs: within-block pairs under the threshold only") {
    val got = Dedup.editDistancePairs(edocs, "id", col("txt"),
        Seq(col("blk")), maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L), (4L, 5L, 1L)))
  }

  test("editDistancePairs: the hot-block cap drops oversized blocks") {
    // block "hot" has 5 members (over cap 3) — all its pairs must drop,
    // including exact duplicates; the small block survives
    val docs = (1 to 5).map(i => (i.toLong, "hot", "same text")).toDF(
        "id", "blk", "txt")
      .union(Seq((10L, "cold", "abc"), (11L, "cold", "abd"))
        .toDF("id", "blk", "txt"))
    val got = Dedup.editDistancePairs(docs, "id", col("txt"),
        Seq(col("blk")), maxDist = 3, maxBlock = Some(3L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 11L)))
  }

  // -- globalRank ------------------------------------------------------

  test("weightedJaccardPairs: frequency-aware — repetition lowers sim where sets agree") {
    val docs = Seq(
      (1L, "g", "w a b c"), (2L, "g", "w a b c"),      // identical: 1.0
      (3L, "g", "w a a a b c")                          // same SET as 1
    ).toDF("id", "blk", "txt")
    val got = Dedup.weightedJaccardPairs(docs, "id", "txt",
        Seq(col("blk")), minSim = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(got((1L, 2L)) == 1.0)
    // multisets: min-sum 4 (w,a,b,c), max-sum 6 → 0.6667 < set-jaccard 1.0
    assert(got((1L, 3L)) == 0.6667)
  }

  test("lexicalCosinePairs: hand-computed cosines, df cap drops stop words") {
    val docs = Seq(
      (1L, "a b"), (2L, "a b"),           // identical → 1.0
      (3L, "a a b"),                      // vs 1: dot=3, |.|²=2,5 → 3/√10
      (4L, "z z z")                       // shares nothing
    ).toDF("id", "txt")
    val got = Dedup.lexicalCosinePairs(docs, "id", "txt",
        minSim = 0.0, maxDf = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(got((1L, 2L)) == 1.0)
    assert(got((1L, 3L)) == math.rint(3.0 / math.sqrt(10.0) * 1e6) / 1e6)
    assert(!got.keySet.exists { case (a, b) => a == 4L || b == 4L })
    // df cap 2 drops 'a' and 'b' (df 3 each): only the z-less docs
    // lose all terms; no pairs survive because nothing is shared
    val capped = Dedup.lexicalCosinePairs(docs, "id", "txt",
        minSim = 0.0, maxDf = 2L)
      .collect()
    assert(capped.isEmpty)
    // threshold keeps only the exact-dup pair
    val thr = Dedup.lexicalCosinePairs(docs, "id", "txt",
        minSim = 0.99, maxDf = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(thr == Seq((1L, 2L)))
  }

  test("lexicalCosineAgainst: vocabulary restriction, exact dup scores 1.0") {
    val corpus = Seq((100L, "a b c"), (101L, "x y z")).toDF("id", "txt")
    val probes = Seq(
      (1L, "a b c"),        // exact dup of 100 → 1.0
      (2L, "a b c qq qq"),  // qq is NOT index vocab: excluded from the
                            // norm, so sim vs 100 is still 1.0
      (3L, "a z")           // split across both corpus docs, weak
    ).toDF("id", "txt")
    val idxTf = Dedup.cappedLexicalTf(corpus, "id", "txt", maxDf = 100L)
    val got = Dedup.lexicalCosineAgainst(probes, "id", "txt",
        idxTf, Dedup.lexicalNorms(idxTf), minSim = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(got((1L, 100L)) == 1.0)
    assert(got((2L, 100L)) == 1.0)
    // probe 3 restricted to {a, z}: vs 100 dot=1, norms 2·3 → 1/√6
    assert(got((3L, 100L)) == math.rint(1.0 / math.sqrt(6.0) * 1e6) / 1e6)
    assert(got((3L, 101L)) == math.rint(1.0 / math.sqrt(6.0) * 1e6) / 1e6)
    assert(!got.contains((1L, 101L)) || got((1L, 101L)) == 0.0)
  }

  test("prefixFilterJaccardPairs equals the brute-force blocked result (prefix lemma)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = pairs(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.6))
    val viaPrefix = pairs(
      Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text", 3, 0.6))
    assert(exact.nonEmpty)
    assert(viaPrefix == exact,
      s"missed: ${exact -- viaPrefix}; extra: ${viaPrefix -- exact}")
  }

  test("jaccardPairsAuto: skew statistic picks direct on uniform, PPJoin on hot-head") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // the bench corpus is near-uniform: ratio stays under the dispatch
    // threshold → the cheap direct path (round 10 measured it 1.56×
    // faster than PPJoin there)
    val uniformRatio = Dedup.shingleSkewRatio(
      Dedup.shingles(docs, "doc_id", "text", 3))
    assert(uniformRatio < Dedup.PrefixFilterSkewThreshold,
      s"uniform corpus scored $uniformRatio")
    // a boilerplate header shared by EVERY document (the classic
    // stop-shingle head): one bucket of size ndocs dominates Σdf² and
    // the ratio crosses the threshold → prefix filter
    val header = "terms of service apply to this document"
    val hot = (0L until 400L).map(i =>
      (i, s"$header unique$i body$i tail$i word$i more$i text$i end$i"))
      .toDF("doc_id", "text")
    val hotRatio = Dedup.shingleSkewRatio(
      Dedup.shingles(hot, "doc_id", "text", 3))
    assert(hotRatio >= Dedup.PrefixFilterSkewThreshold,
      s"hot-head corpus scored $hotRatio")
    // the dispatch reads a deterministic 1/8 hash sample — the head
    // signal must survive sampling (the shared header spans the sample)
    val hotSampleRatio = Dedup.shingleSkewRatio(Dedup.shingles(
      hot.filter(pmod(xxhash64(col("doc_id")), lit(8)) === 0),
      "doc_id", "text", 3))
    assert(hotSampleRatio >= Dedup.PrefixFilterSkewThreshold,
      s"sampled hot-head corpus scored $hotSampleRatio")
    // dispatch never changes results — both paths are exact
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs(Dedup.jaccardPairsAuto(hot, "doc_id", "text", 3, 0.6)) ==
      pairs(Dedup.ngramJaccardPairs(hot, "doc_id", "text", 3, 0.6)))
    // empty-sample fallback: a corpus whose 1/8 hash sample catches no
    // docs (or an outright empty one) must score 1.0 and take the
    // direct path, not NPE on the null aggregate (r11 review finding)
    assert(Dedup.shingleSkewRatio(Dedup.shingles(
      hot.limit(0), "doc_id", "text", 3)) == 1.0)
    val twoShort = Seq((1L, "hi"), (2L, "yo")).toDF("doc_id", "text")
    assert(pairs(Dedup.jaccardPairsAuto(twoShort, "doc_id", "text", 3, 0.6))
      .isEmpty)
  }

  test("globalRank equals the single-reducer window row_number") {
    // enough rows to span several range partitions; key collides so the
    // id tiebreaker matters
    val df = spark.range(500).select(col("id"),
      (col("id") % 7).cast("string").as("key"))
    val expected = df.withColumn("rn",
        row_number().over(Window.orderBy(col("key"), col("id"))).cast("long"))
      .select("id", "rn")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Pipeline.globalRank(df, "id", Seq(col("key"), col("id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  // -- sortedNeighborhoodPairs -----------------------------------------

  test("sortedNeighborhoodPairs matches the rank-window self-join") {
    val docs = spark.range(200).select(col("id"),
      concat(lit("k"), col("id") % 13).as("key"))
    val w = 3
    val r = docs.withColumn("rn",
      row_number().over(Window.orderBy(col("key"), col("id"))).cast("long"))
    val a = r.select(col("id").as("xa"), col("rn").as("ra"))
    val b = r.select(col("id").as("xb"), col("rn").as("rb"))
    val expected = a.join(b,
        col("rb") - col("ra") >= 1 && col("rb") - col("ra") <= w)
      .select("xa", "xb").collect().map(_.toSeq).toSet
    val got = Dedup.sortedNeighborhoodPairs(docs, "id", col("key"), w)
      .select("a_id", "b_id").collect().map(_.toSeq)
    assert(got.toSet == expected)
    assert(got.length == got.toSet.size, "duplicate candidate pair")
    // every row but the last w has exactly w successors
    assert(got.length == (200 - w) * w + (w - 1) * w / 2)
  }

  // -- bigramLogLikelihood ---------------------------------------------

  test("bigramLogLikelihood: hand-computed MLE scores") {
    // corpus: "a b a b" + "a b c"; bigram instances: (a,b)x3? no —
    // doc1: (a,b),(b,a),(a,b); doc2: (a,b),(b,c)
    // c12: (a,b)=3, (b,a)=1, (b,c)=1; c1: a=3, b=2
    // doc1 ll: [ln(3/3), ln(1/2), ln(3/3)] → avg = ln(1/2)/3
    // doc2 ll: [ln(3/3), ln(1/2)] → avg = ln(1/2)/2
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogLikelihood(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(got == Map(
      1L -> ((3L, r4(math.log(0.5) / 3))),
      2L -> ((2L, r4(math.log(0.5) / 2)))))
    // the 1-word doc carries no bigrams and drops out
    assert(!got.contains(3L))
  }

  // -- knnClassify -----------------------------------------------------

  test("knnClassify: majority vote with smaller-label tie break") {
    // 2D-ish embeddings in 4 dims; probe 0 sits near three label-1
    // points and two label-2 points → majority 1; probe 1 is equidistant
    // between one label-3 and one label-4 neighbor set (k=2, 1 vote
    // each) → tie broken to 3
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 9),
      (10L, Array(0.9f, 0.1f, 0.0f, 0.0f), 1),
      (11L, Array(0.9f, 0.0f, 0.1f, 0.0f), 1),
      (12L, Array(0.9f, 0.0f, 0.0f, 0.1f), 1),
      (13L, Array(0.8f, 0.2f, 0.0f, 0.0f), 2),
      (14L, Array(0.8f, 0.0f, 0.2f, 0.0f), 2),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f), 9),
      (20L, Array(0.0f, 0.9f, 0.1f, 0.0f), 4),
      (21L, Array(0.0f, 0.9f, 0.0f, 0.1f), 3)
    ).toDF("vec_id", "embedding", "label")
    val probes = emb.filter(col("vec_id") < 10)
    val got5 = Similarity.knnClassify(emb, probes, "vec_id", "embedding",
        "label", k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2))))
      .toMap
    assert(got5(0L) == ((1, 3L)))
    val got2 = Similarity.knnClassify(emb, probes, "vec_id", "embedding",
        "label", k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2))))
      .toMap
    // probe 1's two nearest are 20 (label 4) and 21 (label 3): one vote
    // each, tie → smaller label 3
    assert(got2(1L) == ((3, 1L)))
  }

  // -- hardNegatives ---------------------------------------------------

  test("hardNegatives: same-label vectors never rank; order is sim desc") {
    // probe 0 (label 1): vector 10 is its twin but SAME label, so the
    // top negative must be 13 (closest different-label), then 14, 20
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1),
      (10L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1),  // identical, same label
      (13L, Array(0.9f, 0.1f, 0.0f, 0.0f), 2),
      (14L, Array(0.8f, 0.2f, 0.0f, 0.0f), 2),
      (20L, Array(0.0f, 1.0f, 0.0f, 0.0f), 3)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(emb, emb.filter(col("vec_id") === 0),
        "vec_id", "embedding", "label", k = 3)
      .orderBy("rn")
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getLong(4)))
    assert(got.toSeq == Seq((13L, 2, 1L), (14L, 2, 2L), (20L, 3, 3L)))
    // the same-label twin is excluded even though its sim is maximal
    assert(!got.map(_._1).contains(10L))
  }
}
