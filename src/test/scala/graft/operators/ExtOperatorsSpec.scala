package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operator-level tests for the dedup / text-analysis / similarity
  * extensions (the parts a SQL oracle can't check: LSH recall, SimHash
  * locality, heuristics on real-language text). */
class ExtOperatorsSpec extends AnyFunSuite with SparkTestSession {

  private val sf = "/root/testdata/sf0.01"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash candidates contain every true near-dup pair (recall 1.0 here)") {
    val exact = pairSet(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.6))
    val cand = pairSet(Dedup.minHashCandidatePairs(docs, "doc_id", "text"))
    assert(exact.nonEmpty) // the corpus plants near-duplicates
    val missed = exact -- cand
    assert(missed.isEmpty, s"LSH missed true pairs: $missed")
  }

  test("dedupClusters: chains collapse transitively, components stay apart") {
    import spark.implicits._
    // two components: a chain 1-2-3-4 (no direct 1-4 pair) and a pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("da", "db")
    val got = Dedup.dedupClusters(pairs, "da", "db")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("dedupClusters: deep path graph converges; diameter > maxIter fails loudly") {
    import spark.implicits._
    // a 12-node path is the WORST case for min-label propagation
    // (diameter 11 — real near-dup components are clique-ish and
    // shallow); the label must walk the whole chain
    val path = (1L until 12L).map(i => (i, i + 1)).toDF("da", "db")
    val got = Dedup.dedupClusters(path, "da", "db")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 12L).map(_ -> 1L).toMap)
    // the documented contract: a component the budget can't close is an
    // exception, never a silently SPLIT clustering (a wrong answer)
    intercept[IllegalStateException] {
      Dedup.dedupClusters(path, "da", "db", maxIter = 3)
    }
  }

  test("dedupClustersStar: propagation's fixpoint in O(log) rounds on deep graphs") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("da", "db")
    val star = Dedup.dedupClustersStar(pairs, "da", "db")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
    // diameter-199 path: min-label propagation needs ~199 driver rounds
    // (its own spec above throws past maxIter); the large/small-star
    // alternation is diameter-independent and must close it in ≤ 10
    val path = (1L until 200L).map(i => (i, i + 1)).toDF("da", "db")
    val (lbls, rounds) = Dedup.dedupClustersStarImpl(path, "da", "db", 25)
    assert(rounds <= 10, s"expected O(log) alternations, got $rounds")
    val got = lbls.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 200L).map(_ -> 1L).toMap)
  }

  test("dedupClustersStar == dedupClusters on random graphs and real pairs") {
    import spark.implicits._
    def labelSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rnd = new scala.util.Random(7)
    val randomPairs = Seq.fill(300)(
        (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("da", "db")
    assert(labelSet(Dedup.dedupClustersStar(randomPairs, "da", "db")) ==
      labelSet(Dedup.dedupClusters(randomPairs, "da", "db")))
    val real = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.6)
    assert(labelSet(Dedup.dedupClustersStar(real, "da", "db")) ==
      labelSet(Dedup.dedupClusters(real, "da", "db")))
  }

  test("minhash dedup pairs == brute-force blocked pairs") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.6)
      .orderBy("da", "db").collect().toSeq
    val lsh = Dedup.minHashDedupPairs(docs, "doc_id", "text")
      .orderBy("da", "db").collect().toSeq
    assert(lsh == exact)
  }

  test("shingle DF cap keeps the high-similarity pairs, bounds the join") {
    val uncapped = pairSet(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8))
    val capped = pairSet(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.7,
      maxShingleDf = Some(50L)))
    assert(uncapped.nonEmpty)
    // a generous cap (few shingles in this corpus repeat >50×) must not
    // lose the planted near-dups, found at a slightly relaxed threshold
    val missed = uncapped -- capped
    assert(missed.isEmpty, s"DF cap lost pairs: $missed")
  }

  test("exact dedup: copies sum to row count, representative is min id") {
    val dd = Dedup.exactDedup(docs, "doc_id", "text")
    val total = dd.agg(sum("n_copies")).collect().head.getLong(0)
    assert(total == docs.count())
  }

  test("ann recall vs brute force is usable and ann output is well-formed") {
    val probes = emb.filter(col("vec_id") < 10)
    val exact = Similarity.knnBatch(emb, probes, "vec_id", "embedding", 10)
      .select("probe_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 500 near-random vectors: 4-bit buckets keep occupancy ~31 so the
    // neighbor actually meets the probe; at larger N, bits scales up.
    def ann10 = Similarity.annCosineTopK(emb, probes, "vec_id", "embedding",
      10, tables = 8, bits = 4)
    val ann = ann10.select("probe_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.5, s"ANN recall too low: $recall")
    // per-probe ranks are 1..k without duplicates
    val ranks = ann10
      .groupBy("probe_id").agg(count(lit(1)).as("n"), max("rn").as("mx"))
      .collect()
    assert(ranks.forall(r => r.getAs[Long]("n") == r.getAs[Long]("mx")))
  }

  test("bitsFor reproduces the measured scale configs and stays monotone") {
    // the BENCH_SCALED q41c_logbits sweep: 2k→6, 20k→9, 200k→13 bits
    assert(Similarity.bitsFor(2000) == 6)
    assert(Similarity.bitsFor(20000) == 9)
    assert(Similarity.bitsFor(200000) == 13)
    // flat-occupancy invariant: +10× corpus ≈ +log₂10 ≈ 3.3 bits
    val steps = (3 to 9).map(e => Similarity.bitsFor(math.pow(10, e).toLong))
    assert(steps == steps.sorted && steps.distinct == steps)
    steps.sliding(2).foreach { case Seq(a, b) => assert(b - a >= 3 && b - a <= 4) }
    // tiny corpora never go below 1 bit; occupancy must be positive
    assert(Similarity.bitsFor(1) >= 1)
    assertThrows[IllegalArgumentException](Similarity.bitsFor(100, 0))
  }

  test("null embeddings degrade per-row: LSH/IVF/PQ never NPE on dirty rows") {
    // a single null embedding in a 100 TB corpus must cost one row, not
    // the job (r7 ADVICE: the compiled key/assign UDFs used to NPE where
    // the HOF expressions they replaced propagated null)
    val dirty = emb.select(col("vec_id"),
      when(col("vec_id") === 7L, lit(null).cast("array<float>"))
        .otherwise(col("embedding")).as("embedding"))
    // LSH: null keys → posexplode drops the row; everything else indexed
    val buckets = Similarity.annBucketFrame(dirty, "vec_id", "embedding")
    assert(buckets.count() == (emb.count() - 1) * 8)
    assert(buckets.filter(col("id") === 7L).count() == 0)
    // IVF: the dirty row gets a null cell (and the fit ignores it)
    val (cells, _) = Similarity.ivfIndex(dirty, "vec_id", "embedding", nlist = 8)
    assert(cells.filter(col("cell").isNull).count() == 1)
    assert(cells.filter(col("id") === 7L).select("cell").collect().head.isNullAt(0))
    // PQ: the dirty row's codes are null (and the fit ignores it)
    val (codes, _) = Similarity.pqIndex(dirty, "vec_id", "embedding")
    assert(codes.filter(col("code").isNull).count() == 8)
    assert(codes.filter(col("id") === 7L && col("code").isNotNull).count() == 0)
  }

  test("lsh keys: compiled-closure array equals the HOF expression keys") {
    // the operators hash with lshKeysArray (one UDF call/row); the HOF
    // column formulation is the pure-built-ins parity reference — the
    // two must agree bit-for-bit or every bucket join silently changes
    val (tables, bits, dim) = (8, 6, 64)
    val viaUdf = emb.select(col("vec_id"),
        Similarity.lshKeysArray(tables, bits, dim)(col("embedding")).as("ks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val hofCols = Similarity.lshBucketKeys(col("embedding"), tables, bits, dim)
    val viaHof = emb.select(col("vec_id") +: hofCols: _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to tables).map(r.getLong(_)).toVector)
      .toMap
    assert(viaUdf == viaHof)
  }

  test("multi-probe keys: base key identical to single-probe, flips at hamming 1") {
    val (tables, bits, dim) = (4, 6, 64)
    val single = emb.select(col("vec_id"),
        Similarity.lshKeysArray(tables, bits, dim)(col("embedding")).as("ks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val multi = emb.select(col("vec_id"),
        Similarity.lshProbeKeysMulti(tables, bits, dim, flips = 2)(col("embedding"))
          .as("ks"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[scala.collection.Seq[Long]](1).map(_.toVector).toVector)
      .toMap
    assert(multi.keySet == single.keySet)
    for ((id, perTable) <- multi; (keys, t) <- perTable.zipWithIndex) {
      assert(keys.length == 3)
      assert(keys.head == single(id)(t)) // base key bit-identical
      for (k <- keys.tail) // each perturbation flips exactly one bit
        assert(java.lang.Long.bitCount(k ^ keys.head) == 1)
      assert(keys.distinct.length == 3) // distinct buckets probed
    }
  }

  test("multi-probe ann: flips=0 equals the single-probe path; recall is monotone") {
    val (tables, bits) = (4, 6)
    val idx = Similarity.annBucketFrame(emb, "vec_id", "embedding",
      tables = tables, bits = bits)
    val probes = emb.filter(col("vec_id") < 20)
    def res(flips: Int): Map[(Long, Long), Double] =
      Similarity.annCosineTopKFromMulti(idx, probes, "vec_id", "embedding",
          k = 5, tables = tables, bits = bits, flips = flips)
        .collect()
        .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("rn")) ->
          r.getAs[Double]("sim")).toMap
    val plain = Similarity.annCosineTopKFrom(idx, probes, "vec_id", "embedding",
        k = 5, tables = tables, bits = bits)
      .collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("rn")) ->
        r.getAs[Double]("sim")).toMap
    assert(res(0) == plain) // flips=0 ≡ single-probe, value-identical
    // superset candidates ⇒ at every rank the sim weakly improves, and
    // no probe returns fewer neighbors
    val f0 = res(0); val f2 = res(2)
    assert(f0.keySet.map(_._1).subsetOf(f2.keySet.map(_._1)))
    for ((pr, s0) <- f0; s2 <- f2.get(pr)) assert(s2 >= s0 - 1e-9,
      s"rank ${pr._2} of probe ${pr._1} got worse: $s0 -> $s2")
  }

  test("simhash: aggregate formulation equals the per-row HOF version") {
    val viaHof = docs.select(col("doc_id"),
        Dedup.simHash64(split(col("text"), " ")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaAgg = Dedup.simHash64Agg(docs, "doc_id", split(col("text"), " "))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAgg == viaHof)
  }

  test("simhash: near-duplicates are closer in hamming distance than strangers") {
    val top = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .orderBy(col("jac").desc, col("da")).limit(1).collect().head
    val (da, db) = (top.getLong(0), top.getLong(1))
    val sh = docs.select(col("doc_id"),
        Dedup.simHash64(split(col("text"), " ")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val near = hamming(sh(da), sh(db))
    // average distance of the near-dup's fingerprint to 20 strangers
    val strangers = sh.keys.filter(k => k != da && k != db).take(20)
    val avgFar = strangers.map(k => hamming(sh(da), sh(k))).sum.toDouble / strangers.size
    assert(near < avgFar, s"simhash near=$near avgFar=$avgFar")
  }

  test("ivf: coarse-quantized search reaches usable recall vs brute force") {
    val probes = emb.filter(col("vec_id") < 10)
    val exact = Similarity.knnBatch(emb, probes, "vec_id", "embedding", 10)
      .select("probe_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfCosineTopK(emb, probes, "vec_id", "embedding",
        k = 10, nlist = 16, nprobe = 6)
      .select("probe_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }

  test("pq: code-compressed search reaches usable recall vs brute force") {
    val probes = emb.filter(col("vec_id") < 10)
    val exact = Similarity.knnBatch(emb, probes, "vec_id", "embedding", 10)
      .select("probe_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqCosineTopK(emb, probes, "vec_id", "embedding",
        k = 10, candidates = 100)
      .select("probe_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.5, s"PQ recall too low: $recall")
    // every probe gets its full k (candidate pool never starves)
    assert(pq.groupBy(_._1).values.forall(_.size == 10))
  }

  test("pq: per-subspace codebooks beat the shared codebook at equal candidates") {
    // classic PQ trains one codebook per subspace; the round-5 shortcut
    // shared one across all eight. At an aggressive candidate cut the
    // quantization error gap shows up directly as recall.
    val probes = emb.filter(col("vec_id") < 10)
    val exact = Similarity.knnBatch(emb, probes, "vec_id", "embedding", 10)
      .select("probe_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(perSub: Boolean): Double = {
      val pq = Similarity.pqCosineTopK(emb, probes, "vec_id", "embedding",
          k = 10, candidates = 50, perSubspace = perSub)
        .select("probe_id", "nn_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & pq).size.toDouble / exact.size
    }
    val (per, shared) = (recallOf(true), recallOf(false))
    assert(per >= shared,
      s"per-subspace recall $per below shared-codebook recall $shared")
  }

  test("embedding near-dup pairs finds exactly the planted pair") {
    import spark.implicits._
    val dim = 64
    def unit(axis: Int): Array[Float] =
      Array.tabulate(dim)(i => if (i == axis) 1f else 0f)
    val nearA = unit(0)
    val nearB = Array.tabulate(dim)(i => nearA(i) + (if (i == 1) 0.01f else 0f))
    val rows = Seq(
      (0L, nearA), (1L, nearB), // planted near-identical pair
      (2L, unit(5)), (3L, unit(9)), // orthogonal strangers
      (4L, Array.tabulate(dim)(i => ((i * 37 % 11) - 5).toFloat / 5)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(rows, "vec_id", "embedding",
        threshold = 0.95, tables = 8, bits = 4, dim = dim)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)), s"got $pairs")
  }

  test("as-of join: <= semantics, equal-ts ties, and no-match nulls") {
    import spark.implicits._
    val left = Seq( // (id, key, ts)
      (100L, 1L, 10L), (101L, 1L, 20L), (102L, 1L, 5L), (103L, 2L, 50L))
      .toDF("id", "k", "ts")
    val right = Seq( // (key, ts, val)
      (1L, 10L, 7L), (1L, 10L, 8L), (1L, 15L, 9L), (2L, 60L, 1L))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", "v", "v", "matched")
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    assert(out(100L).contains(8L)) // equal ts matches; tie → larger tiebreak
    assert(out(101L).contains(9L)) // latest ≤ 20 is ts=15
    assert(out(102L).isEmpty) // nothing at or before ts=5
    assert(out(103L).isEmpty) // right row is after the left ts
  }

  test("as-of join matches a naive reference on randomized data with ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (0 until 200).map(i =>
      (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(50).toLong))
    val right = (0 until 150).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(50).toLong, (1000 + i).toLong))
    val out = AsOfJoin.asOf(
        left.toDF("id", "k", "ts"), right.toDF("k", "ts", "v"),
        Seq("k"), "ts", "ts", "v", "v", "m")
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    left.foreach { case (id, k, ts) =>
      val expect = right.filter(r => r._1 == k && r._2 <= ts)
        .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      assert(out(id) == expect, s"id=$id k=$k ts=$ts")
    }
  }

  test("jaccard pairs match a naive reference on a randomized corpus") {
    import spark.implicits._
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val rnd = new scala.util.Random(11)
    val base = (0 until 40).map(i =>
      (i.toLong, Seq.fill(8 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    // plant 10 near-duplicates: copy with one word appended
    val planted = (0 until 10).map(i =>
      (100L + i, base(i)._2 + " " + vocab(rnd.nextInt(vocab.size))))
    val docs = base ++ planted
    def shingleSet(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val expect = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = shingleSet(ta); sb = shingleSet(tb)
      if sa.nonEmpty && sb.nonEmpty
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= 0.5
    } yield (ia, ib)).toSet
    val got = pairSet(Dedup.ngramJaccardPairs(
      docs.toDF("doc_id", "text"), "doc_id", "text", 3, 0.5))
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
  }

  test("as-of join: NULL right keys/ts never fabricate matches") {
    import spark.implicits._
    val left = Seq((1L, 1L, 5L)).toDF("id", "k", "ts")
    val right = Seq(
      (Some(1L), None: Option[Long], 99L), // null ts: r.ts <= l.ts is false
      (None: Option[Long], Some(3L), 98L)) // null key: never equi-matches
      .toDF("k", "ts", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", "v", "v", "m")
      .collect()
    assert(out.length == 1 && out.head.isNullAt(3), out.mkString)
  }

  test("lang-id predicts real-language samples") {
    import spark.implicits._
    val samples = Seq(
      ("the cat sat on a mat of straw", "en"),
      ("le chat et la souris dans le jardin et la maison", "fr"),
      ("el perro y los gatos y el sol", "es"),
      ("der hund und die katze und der baum", "de"),
      ("这是一个在北京的是好天气", "zh")).toDF("text", "expected")
    val out = samples
      .select(col("expected"), TextAnalysis.predictLang(col("text")).as("pred"))
      .collect()
    out.foreach(r => assert(r.getString(1) == r.getString(0),
      s"expected ${r.getString(0)} got ${r.getString(1)}"))
  }

  test("token count and rolling fingerprint match independently computed values") {
    import spark.implicits._
    val df = Seq("ab 12 cd!", "hello world x").toDF("text")
    val rows = df.select(TextAnalysis.tokenCount(col("text")),
      TextAnalysis.rollingFingerprint(col("text"))).collect()
    assert(rows(0).getLong(0) == 4L) // ab | 12 | cd | !
    // cross-checked against DuckDB list_reduce this session
    assert(rows(1).getLong(1) == 108714L)
  }

  test("qualityScore matches a hand computation and orders prose above noise") {
    import spark.implicits._
    // "the cat is in a hat." : 6 words, 4 stopwords (the, is, in, a),
    // 1 punct char of 20 chars -> 0.4*(4/6) + 0.3*(1 - 1/20) + 0.3*(6/100)
    val prose = "the cat is in a hat."
    val noise = ";;;; !!!! ???? ::::"
    val got = Seq(prose, noise).toDF("text")
      .select(TextAnalysis.qualityScore(col("text")).as("s"))
      .collect().map(_.getDouble(0))
    val expected = BigDecimal(0.4 * (4.0 / 6) + 0.3 * (1 - 1.0 / 20) + 0.3 * 0.06)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) == expected, s"prose scored ${got(0)}, expected $expected")
    assert(got(0) > got(1), "punctuation noise must score below prose")
  }

  test("charEntropy: hand values, uniform max, degenerate zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa"),        // one symbol → H = 0
      (2L, "abcd"),        // uniform over 4 → H = ln 4
      (3L, "aab")          // p = (2/3, 1/3) → ln 3 − (2 ln 2)/3
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(out(1L) == ((4L, 0.0)))
    assert(out(2L) == ((4L, r4(math.log(4)))))
    assert(out(3L) == ((3L, r4(math.log(3) - 2 * math.log(2) / 3))))
  }

  test("lmRarityFilter: integer rarity rule on hand counts; flag at the share bound") {
    import spark.implicits._
    // corpus bigrams: (a,b)×2 from doc1+doc2, (b,a)×1, (a,c)×1 —
    // c1(a)=3, c1(b)=1. With probFloor=2: (a,c) rare (3 > 2·1),
    // (a,b) not (3 > 2·2 false), (b,a) not (1 > 2·1 false)
    val docs = Seq(
      (1L, "a b a c"),   // bigrams (a,b),(b,a),(a,c): n=3, rare=1
      (2L, "a b"),       // bigram (a,b): n=1, rare=0
      (3L, "z")          // no bigrams → no row
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmRarityFilter(docs, "doc_id", "text",
        probFloor = 2L, shareNum = 1L, shareDen = 3L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // doc1: 3·1 ≥ 1·3 → flagged exactly AT the share bound
    assert(out == Map(1L -> ((3L, 1L, true)), 2L -> ((1L, 0L, false))))
  }

  test("charEntropy: native expression equals the exploded formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefg αβ九 ,."
    val docs = ((1 to 60).map { i =>
      (i.toLong, (0 until rnd.nextInt(200)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    } :+ ((99L, ""))).toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))
    val fast = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .collect().map(key).toMap
    val slow = TextAnalysis.charEntropyExploded(docs, "doc_id", "text")
      .collect().map(key).toMap
    assert(fast == slow)
    // empty text drops out of BOTH paths
    assert(!fast.contains(99L))
    // the expression stays inside whole-stage codegen (a non-local
    // source — local relations constant-fold to LocalTableScan, which
    // exercises the interpreted eval path instead)
    val ranged = spark.range(100).select(col("id").as("doc_id"),
      concat(lit("ab"), col("id")).as("text"))
    val plan = TextAnalysis.charEntropy(ranged, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a whole-stage-codegen'd operator; the
    // projection carrying char_entropy must sit inside one
    val entropyLine = plan.linesIterator
      .find(_.contains("char_entropy")).getOrElse("")
    assert(entropyLine.trim.startsWith("*("), plan)
  }

  test("tfIdfTopTerms matches a brute-force Scala computation") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "g1", "apple apple banana"),
      (2L, "g1", "apple cherry"),
      (3L, "g2", "banana banana cherry"),
      (4L, "g2", "date")
    ).toDF("id", "grp", "txt")
    val got = TextAnalysis.tfIdfTopTerms(corpus, "id", "txt", "grp", k = 2)
      .orderBy("grp", "rn").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))

    // brute force: tf per (group, token), df per token over ALL docs
    val docs = Seq((1L, "g1", "apple apple banana"), (2L, "g1", "apple cherry"),
      (3L, "g2", "banana banana cherry"), (4L, "g2", "date"))
    val n = docs.size.toDouble
    val toks = docs.flatMap { case (id, g, t) => t.split(" ").map(w => (id, g, w)) }
    val tf = toks.groupBy(x => (x._2, x._3)).view.mapValues(_.size).toMap
    val dfreq = toks.groupBy(_._3).view.mapValues(_.map(_._1).distinct.size).toMap
    val expected = tf.toSeq.map { case ((g, w), f) =>
      val score = BigDecimal(f * math.log(n / dfreq(w)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (g, w, score)
    }.groupBy(_._1).toSeq.flatMap { case (_, terms) =>
      terms.sortBy(t => (-t._3, t._2)).take(2).zipWithIndex
        .map { case ((g, w, s), i) => (g, w, s, i + 1L) }
    }.sortBy(t => (t._1, t._4))
    assert(got.toSeq == expected)
  }

  test("simHashNearDupPairs finds planted near-dups; exact under the pigeonhole bound") {
    import spark.implicits._
    // two exact copies (hamming 0), one lightly edited copy, and noise
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = Seq(
      (1L, base), (2L, base),
      (3L, base.replace("dog", "cat")),
      (4L, "completely different words about spark physical plans here"),
      (5L, "unrelated text on query optimization and shuffle exchanges")
    ).toDF("doc_id", "text")
    val toks = split(col("text"), " ")
    val got = Dedup.simHashNearDupPairs(corpus, "doc_id", toks, maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.contains((1L, 2L)) && got((1L, 2L)) == 0L,
      s"exact copies must pair at hamming 0: $got")

    // pigeonhole: for maxHamming < SimHashBands the banded result equals
    // the BRUTE-FORCE result — verify against hamming computed in Scala
    // from the collected fingerprints
    val fps = Dedup.simHashHexAgg(corpus, "doc_id", toks)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def ham(a: String, b: String): Int =
      (0 until 16).map(i => Integer.bitCount(
        Integer.parseInt(a.substring(i, i + 1), 16) ^
          Integer.parseInt(b.substring(i, i + 1), 16))).sum
    val ids = fps.keys.toSeq.sorted
    val brute = (for {
      a <- ids; b <- ids if a < b && ham(fps(a), fps(b)) <= 3
    } yield (a, b) -> ham(fps(a), fps(b)).toLong).toMap
    val banded = Dedup.simHashNearDupPairs(corpus, "doc_id", toks, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(banded == brute)
  }

  test("HLL sketch table is re-aggregable: daily-union estimate equals the direct estimate") {
    val ev = CoreQueries.events(spark, "/root/testdata/sf0.01")
      .withColumn("day", expr("ts_ns div 86400000000000"))
    // the sketch-table path: per-(type, day) sketches merged at read time
    val merged = ev.groupBy("event_type", "day")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    // the direct path: one sketch over the raw rows
    val direct = ev.groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
    val m = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val d = direct.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // HLL union is register-wise max: partitioning the input must not
    // change the estimate AT ALL — that is what makes the pattern safe
    assert(m == d, s"merged=$m direct=$d")
    // and the estimate is honest: within 5% of the exact count
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("ex"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, ex) =>
      assert(math.abs(m(t) - ex) <= ex * 0.05, s"$t: est=${m(t)} exact=$ex")
    }
  }

  test("pmiBigrams matches a brute-force computation") {
    import spark.implicits._
    val corpus = Seq(
      "new york new york city hall",
      "new york is a city",
      "the city hall of new york"
    ).map(Tuple1(_)).toDF("text")
    val got = TextAnalysis.pmiBigrams(corpus, "text", minCount = 2L, k = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))

    val docs = Seq("new york new york city hall", "new york is a city",
      "the city hall of new york").map(_.split(" ").toSeq)
    val unis = docs.flatten
    val n = unis.size.toDouble
    val cw = unis.groupBy(identity).view.mapValues(_.size).toMap
    val bis = docs.flatMap(ws => ws.zip(ws.tail))
    val cab = bis.groupBy(identity).view.mapValues(_.size).toMap
    val expected = cab.toSeq.filter(_._2 >= 2).map { case ((a, b), c) =>
      val pmi = BigDecimal(math.log(c * n / (cw(a) * cw(b))))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, c.toLong, pmi)
    }.sortBy(t => (-t._4, t._1, t._2)).take(5)
    assert(got.toSeq == expected)
  }

  test("semanticDedup keeps one representative per chained cluster") {
    import spark.implicits._
    // a 2-D rotation chain embedded in 64 dims: cos(v0,v1)=cos(v1,v2)
    // = cos 9° ≈ 0.988 ≥ 0.97 but cos(v0,v2) = cos 18° ≈ 0.951 < 0.97 —
    // only the closure makes {0,1,2} one cluster; 40 is isolated
    def vec(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array.tabulate(64)(i =>
        if (i == 0) math.cos(r).toFloat
        else if (i == 1) math.sin(r).toFloat else 0f)
    }
    val corpus = Seq(
      (0L, vec(0)), (1L, vec(9)), (2L, vec(18)),
      (40L, Array.tabulate(64)(i => if (i == 2) 1f else 0f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(corpus, "vec_id", "embedding",
      threshold = 0.97)
    assert(out.select("vec_id").collect().map(_.getLong(0)).toSet
      == Set(0L, 40L))
    // schema passes through untouched
    assert(out.columns.toSeq == Seq("vec_id", "embedding"))
  }

  test("semanticDedup with no near-dups is the identity") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Array.tabulate(64)(i => if (i == 0) 1f else 0f)),
      (2L, Array.tabulate(64)(i => if (i == 1) 1f else 0f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(corpus, "vec_id", "embedding", 0.9)
    assert(out.count() == 2)
  }

  test("events() fails fast on a corrupt ts schema instead of flowing nulls") {
    import spark.implicits._
    // both shipped layouts normalize; anything else (here: ts arrives as a
    // STRING after upstream schema corruption) must throw, because casting
    // it would silently null every window/gap computation downstream
    val dir = java.nio.file.Files.createTempDirectory("badevents").toString
    Seq(("not-a-timestamp", 1L)).toDF("ts", "user_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ex = intercept[IllegalStateException] {
      CoreQueries.events(spark, dir)
    }
    assert(ex.getMessage.contains("unsupported type"))
  }

  test("l2LshTopK: E2LSH recall against the exact Euclidean top-3 at the q131 config") {
    import org.apache.spark.sql.expressions.Window
    val probes = emb.filter(col("vec_id") < 10)
    val win = Window.partitionBy("probe_id").orderBy(col("dist").asc, col("nn_id"))
    val exact = emb.select(col("vec_id").as("nn_id"), col("embedding").as("_n"))
      .crossJoin(broadcast(probes.select(col("vec_id").as("probe_id"),
        col("embedding").as("_p"))))
      .filter(col("nn_id") =!= col("probe_id"))
      .select(col("probe_id"), col("nn_id"),
        round(Similarity.euclidean(col("_p"), col("_n")), 4).as("dist"))
      .withColumn("rn", row_number().over(win)).filter(col("rn") <= 3)
      .select("probe_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.l2LshTopK(emb, probes, "vec_id", "embedding",
        k = 3, tables = 32, bits = 4, w = 2.0)
      .select("probe_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // per-probe ≥2-of-3 (the q131 floor) across 10 probes
    (0L until 10L).foreach { p =>
      val hit = (exact.filter(_._1 == p) intersect ann).size
      assert(hit >= 2, s"probe $p recalled only $hit of 3")
    }
  }

  test("l2LshKeysArray: identical vectors share every key; null stays null") {
    import spark.implicits._
    val keys = Similarity.l2LshKeysArray(tables = 8, bits = 4, dim = 4, w = 1.0)
    val df = Seq(
      (1L, Seq(0.1f, 0.2f, 0.3f, 0.4f)),
      (2L, Seq(0.1f, 0.2f, 0.3f, 0.4f)),
      (3L, null.asInstanceOf[Seq[Float]])
    ).toDF("id", "e").withColumn("k", keys(col("e")))
    val rows = df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(2)) null else r.getSeq[Long](2))).toMap
    assert(rows(1L) == rows(2L) && rows(1L) != null)
    assert(rows(3L) == null)
  }

  test("rollingFingerprint uses code points (ascii parity with DuckDB)") {
    import spark.implicits._
    // 'é' = U+00E9 = 233 in BOTH Spark ascii() and DuckDB ascii()
    // (empirically verified; a first-BYTE semantic would give -61).
    // words: "été" -> 233+3=236, "fête" -> 102+4=106; fold: 236*31+106
    val got = Seq("été fête").toDF("text")
      .select(TextAnalysis.rollingFingerprint(col("text")))
      .collect().head.getLong(0)
    assert(got == 236L * 31 + 106)
  }

  test("randomProjection: JL distortion bounded on the fixture, nulls degrade per-row") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val proj = Similarity.randomProjection(emb, "vec_id", "embedding",
      outDim = 16, dim = 64)
    // exact algebra: the projection IS the jlMatrix product (computed
    // independently here from the same public matrix)
    val m = Similarity.jlMatrix(16, 64)
    val first = emb.orderBy("vec_id").select("embedding").collect().head
      .getSeq[Float](0).toArray
    val expected = m.map { row =>
      var s = 0.0; var i = 0
      while (i < 64 && i < first.length) { s += first(i) * row(i); i += 1 }
      s
    }.toSeq
    val gotFirst = proj.orderBy("id").select("proj").collect().head
      .getSeq[Double](0)
    assert(gotFirst == expected)
    // statistical JL property on an UNSELECTED pair set (probes × the
    // 200 lowest ids — no top-k selection bias): a k=16 Rademacher
    // projection estimates cosine with σ ≈ 1/√16, so the MEAN absolute
    // distortion over ~1000 near-orthogonal pairs (the hardest input)
    // must sit around 0.2; per-pair extremes are the estimator's tail,
    // deliberately not asserted
    val probesP = proj.filter(col("id") < 5)
    val pSim = probesP.select(col("id").as("probe_id"), col("proj").as("_pp"))
      .crossJoin(proj.filter(col("id") < 200)
        .select(col("id").as("nn_id"), col("proj").as("_pn")))
      .filter(col("probe_id") =!= col("nn_id"))
      .select(col("probe_id"), col("nn_id"),
        Similarity.cosine(col("_pp"), col("_pn")).as("psim"))
    val probesO = emb.filter(col("vec_id") < 5)
    val oSim = probesO.select(col("vec_id").as("probe_id"), col("embedding").as("_op"))
      .crossJoin(emb.filter(col("vec_id") < 200)
        .select(col("vec_id").as("nn_id"), col("embedding").as("_on")))
      .filter(col("probe_id") =!= col("nn_id"))
      .select(col("probe_id"), col("nn_id"),
        Similarity.cosine(col("_op"), col("_on")).as("osim"))
    val meanD = pSim.join(oSim, Seq("probe_id", "nn_id"))
      .agg(avg(abs(col("psim") - col("osim")))).collect().head.getDouble(0)
    assert(meanD < 0.3, s"mean distortion $meanD")
    // determinism: same seed, same matrix, bit-identical projections
    val a = proj.orderBy("id").collect().map(_.getSeq[Double](1))
    val b = Similarity.randomProjection(emb, "vec_id", "embedding",
        outDim = 16, dim = 64).orderBy("id").collect().map(_.getSeq[Double](1))
    assert(a.zip(b).forall { case (x, y) => x == y })
    // null embedding degrades to a null projection, not an NPE
    import spark.implicits._
    val dirty = Seq((1L, Seq(1.0f, 2.0f)), (2L, null))
      .toDF("vec_id", "embedding")
    val got = Similarity.randomProjection(dirty, "vec_id", "embedding",
        outDim = 16, dim = 2)
      .orderBy("id").collect()
    assert(!got(0).isNullAt(1) && got(1).isNullAt(1))
  }

  test("dedupClustersAugment: delta merge equals the full re-cluster, untouched rows pass through") {
    import spark.implicits._
    // stored history: {1,2,3} (chain), {10,11}, {20,21}
    val day1 = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("da", "db")
    val stored = Dedup.dedupClustersStar(day1, "da", "db")
    // delta: bridges {1..3} with {10,11} via a NEW node 7, and brings a
    // brand-new independent pair {30,31}; {20,21} is untouched
    val delta = Seq((3L, 7L), (7L, 10L), (30L, 31L)).toDF("da", "db")
    def m(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aug = m(Dedup.dedupClustersAugment(stored, delta, "da", "db"))
    val full = m(Dedup.dedupClustersStar(
      day1.unionByName(delta), "da", "db"))
    assert(aug == full)
    assert(aug(11L) == 1L && aug(7L) == 1L) // merged across the bridge
    assert(aug(20L) == 20L && aug(21L) == 20L) // untouched survives
    assert(aug(31L) == 30L) // new component labeled by its own min
    // an EMPTY delta is the identity
    assert(m(Dedup.dedupClustersAugment(stored,
      Seq.empty[(Long, Long)].toDF("da", "db"), "da", "db")) == m(stored))
  }

  test("nlistFor: sqrt growth between the floor and the broadcast ceiling") {
    // tiny corpora hit the floor (cells need rows to be worth a file)
    assert(Similarity.nlistFor(500) == 16)
    assert(Similarity.nlistFor(2000) == 31) // N/64 cap binds before sqrt
    // the third-decade case that motivated the rule: 2M vectors
    assert(Similarity.nlistFor(2000000) == 1414)
    // ceiling: the centroid table must stay broadcast-sized
    assert(Similarity.nlistFor(1000000000000L) == 65536)
    // monotone over six decades
    val xs = Seq(1L, 100L, 10000L, 1000000L, 100000000L, 10000000000L)
      .map(Similarity.nlistFor)
    assert(xs == xs.sorted)
  }

  test("lshBitsFor: constant expected occupancy between the clamps") {
    // floor: tiny corpora keep the 6-bit minimum (64 buckets)
    assert(Similarity.lshBitsFor(100) == 6)
    // the rule: ceil(log2(n / perBucket)) — 100k/50 = 2000 → 11 bits
    assert(Similarity.lshBitsFor(100000) == 11)
    assert(Similarity.lshBitsFor(10000) == 8) // the pre-policy default
    // ceiling: 24 bits (16M buckets) even at absurd corpus sizes
    assert(Similarity.lshBitsFor(1000000000000L) == 24)
    // occupancy law: n / 2^bits stays within [perBucket/2, perBucket]
    // wherever neither clamp binds
    for (n <- Seq(10000L, 100000L, 1000000L, 100000000L)) {
      val occ = n.toDouble / (1L << Similarity.lshBitsFor(n))
      assert(occ > 12 && occ <= 50, s"n=$n occupancy $occ")
    }
    // monotone
    val bs = Seq(1L, 1000L, 100000L, 10000000L, 1000000000L)
      .map(Similarity.lshBitsFor(_))
    assert(bs == bs.sorted)
  }
}
