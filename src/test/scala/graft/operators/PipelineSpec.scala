package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the training-pipeline ops the SQL oracle can't state:
  * pack capacity bounds, split determinism, planted contamination. */
class PipelineSpec extends AnyFunSuite with SparkTestSession {

  private val sf = "/root/testdata/sf0.01"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("stratifiedSample: deterministic, monotone in rate, exact at 0 and 1") {
    val rates = Seq("en" -> 0.5, "fr" -> 0.25)
    val once = Pipeline.stratifiedSample(docs, "doc_id", "lang", rates, 0.75)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val again = Pipeline.stratifiedSample(docs, "doc_id", "lang", rates, 0.75)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(once == again, "same inputs must keep the same rows")
    // raising every rate only ADDS rows (thresholds are monotone in rate)
    val larger = Pipeline.stratifiedSample(docs, "doc_id", "lang",
      Seq("en" -> 0.9, "fr" -> 0.6), 1.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(once.subsetOf(larger))
    // boundary rates are exact, not approximate
    val all = Pipeline.stratifiedSample(docs, "doc_id", "lang", Nil, 1.0)
    assert(all.count() == docs.count())
    val none = Pipeline.stratifiedSample(docs, "doc_id", "lang",
      Seq("en" -> 0.0), 1.0)
    assert(none.filter(col("lang") === "en").count() == 0)
    assert(none.count() == docs.filter(col("lang") =!= "en").count())
  }

  test("weightedSample: clamps, hits boundaries, and matches the stratified threshold for constant weights") {
    assert(Pipeline.weightedSample(docs, "doc_id", lit(0.0)).count() == 0)
    assert(Pipeline.weightedSample(docs, "doc_id", lit(1.0)).count() == docs.count())
    assert(Pipeline.weightedSample(docs, "doc_id", lit(7.5)).count() == docs.count(),
      "weights above 1 clamp to keep-all")
    assert(Pipeline.weightedSample(docs, "doc_id", lit(-3.0)).count() == 0,
      "negative weights clamp to keep-none")
    // a constant weight IS a stratified rate: same surviving set
    val viaWeight = Pipeline.weightedSample(docs, "doc_id", lit(0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaStrata = Pipeline.stratifiedSample(docs, "doc_id", "lang", Nil, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaWeight == viaStrata)
  }

  test("shuffleDeterministic: reproducible permutation, partitioning-proof, seed-independent") {
    val base = Pipeline.shuffleDeterministic(docs, "doc_id", seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    // a permutation: same multiset, nothing dropped or duplicated
    assert(base.sorted == docs.select("doc_id").collect()
      .map(_.getLong(0)).toSeq.sorted)
    // reproducible under a different physical partitioning
    val repart = Pipeline.shuffleDeterministic(
        docs.repartition(13), "doc_id", seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(base == repart, "same seed must give the identical order")
    // a new epoch (seed) is a genuinely different permutation
    val epoch2 = Pipeline.shuffleDeterministic(docs, "doc_id", seed = 8L)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(base != epoch2)
    // and not the sorted-id order either (it actually shuffles)
    assert(base != base.sorted)
  }

  test("prepareCorpus: each stage drops exactly the planted rows, output in epoch order") {
    import spark.implicits._
    // prose that clears the quality gate (stopwords, no punctuation,
    // decent length), with planted failures for each pipeline stage
    val good = (0 until 60).map(i => s"the quick word$i is a fine token and it works").mkString(" ")
    def mutated(i: Int) = good.split(" ").updated(i, "swapped").mkString(" ")
    val corpus = Seq(
      (1L, good, "en"),            // survives everything
      (2L, good, "en"),            // exact dup of 1 → dropped (min id wins)
      (3L, mutated(5), "en"),      // fuzzy near-dup of 1 → dropped
      (4L, "!!! ??? ### $$$ %%%", "xx"), // quality gate drops it
      (5L, (0 until 80).map(n => s"unique$n entirely different corpus body").mkString(" "), "fr")
    ).toDF("doc_id", "text", "lang")
    val out = Pipeline.prepareCorpus(corpus, "doc_id", "text")
    val rows = out.select("doc_id", "shuffle_key").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows.map(_._1).toSet == Set(1L, 5L), s"survivors ${rows.map(_._1)}")
    // epoch order: rows arrive sorted by the md5 shuffle key
    assert(rows.map(_._2) == rows.map(_._2).sorted)
    // the gate alone keeps 4 of 5 (only the punctuation doc fails)
    assert(Pipeline.prepareCorpus(corpus, "doc_id", "text",
      jaccardThreshold = 1.01).count() == 3,
      "threshold above 1 disables fuzzy dedup: exact-dup drop only")
  }

  test("latestByKey: per-key winner is the argmax of the order columns") {
    import spark.implicits._
    val log = Seq(
      // key 1: ties on version, seq breaks them — (1, v2, seq3) wins
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 2L, 3L, "c"),
      // key 2: single row
      (2L, 5L, 1L, "d"),
      // key 3: later version with lower seq still wins on version
      (3L, 9L, 1L, "e"), (3L, 7L, 9L, "f")
    ).toDF("k", "version", "seq", "payload")
    val got = Pipeline.latestByKey(log, Seq("k"),
        Seq(col("version"), col("seq")))
      .select("k", "payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "c", 2L -> "d", 3L -> "e"))

    // a caller's existing _rn column must survive, not be clobbered
    // by the operator's working column and then dropped
    val withRn = log.withColumn("_rn", lit("mine"))
    val kept = Pipeline.latestByKey(withRn, Seq("k"),
      Seq(col("version"), col("seq")))
    assert(kept.columns.contains("_rn"))
    assert(kept.select("_rn").collect().forall(_.getString(0) == "mine"))
  }

  test("equiDepthHistogram: remainder rule, boundary ties, repartition-invariant") {
    import spark.implicits._
    // n=10, k=4 → sizes 3,3,2,2; duplicate values straddle bin edges
    val df = Seq(5.0, 1.0, 3.0, 3.0, 3.0, 2.0, 4.0, 1.0, 2.0, 5.0).toDF("v")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSeq
    val got = rows(Pipeline.equiDepthHistogram(df, col("v"), 4))
    // sorted: 1,1,2 | 2,3,3 | 3,4 | 5,5
    assert(got == Seq((1L, 3L, 1.0, 2.0), (2L, 3L, 2.0, 3.0),
      (3L, 2L, 3.0, 4.0), (4L, 2L, 5.0, 5.0)))
    // equals the single-reducer ntile window on the same data
    val w = org.apache.spark.sql.expressions.Window.orderBy("v")
    val exp = df.withColumn("bin", ntile(4).over(w))
      .groupBy("bin").agg(count(lit(1)).as("n"),
        min("v").as("lo"), max("v").as("hi"))
      .orderBy("bin").collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == exp)
    // the synthesized tiebreaker cannot leak partitioning into output
    assert(rows(Pipeline.equiDepthHistogram(df.repartition(7),
      col("v"), 4)) == got)
  }

  test("chunkDocuments: strides, overlap, and tail chunk behave exactly") {
    import spark.implicits._
    // 10 words, chunkSize 4, overlap 2 → stride 2, starts 1,3,5,7,9
    val words = (1 to 10).map(i => s"w$i")
    val one = Seq((7L, words.mkString(" "))).toDF("id", "txt")
    val got = Pipeline.chunkDocuments(one, "id", "txt", chunkSize = 4, overlap = 2)
      .orderBy("chunk_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.length == 5)
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    // full chunks are chunkSize long; the last two starts clamp
    assert(got.map(_._2).toSeq == Seq(4L, 4L, 4L, 4L, 2L))
    // content: chunk i covers words [2i+1, 2i+4] — verify via md5
    def m(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    got.zipWithIndex.foreach { case ((_, _, md5got), i) =>
      val expect = words.slice(i * 2, i * 2 + 4).mkString(" ")
      assert(md5got == m(expect), s"chunk $i content mismatch")
    }
    // invalid overlap fails loudly
    intercept[IllegalArgumentException] {
      Pipeline.chunkDocuments(one, "id", "txt", chunkSize = 4, overlap = 4)
    }
  }

  test("histogram: bins partition the rows and floor negative values down") {
    import spark.implicits._
    val vals = Seq(("a", -0.5), ("a", 0.0), ("a", 9.99), ("a", 10.0), ("b", 25.0))
      .toDF("g", "v")
    val got = Pipeline.histogram(vals, "v", 10.0, Seq("g")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", -1L) -> 1L, ("a", 0L) -> 2L, ("a", 1L) -> 1L,
      ("b", 2L) -> 1L))
    // on the real corpus the bin counts must repartition to the row count
    val ev = CoreQueries.events(spark, sf) // ns-timestamp-safe loader
    val hist = Pipeline.histogram(ev, "value", 10.0, Seq("event_type"))
    assert(hist.agg(sum("cnt")).collect()(0).getLong(0) == ev.count())
  }

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

  test("hdr sketch: partitioned build merges to EXACTLY the direct build") {
    val ev = CoreQueries.events(spark, sf)
      .withColumn("day", expr("ts_ns div 86400000000000"))
    val daily = Pipeline.hdrSketch(ev, "value", Seq("event_type", "day"))
    val merged = Pipeline.hdrMerge(daily, Seq("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val direct = Pipeline.hdrSketch(ev, "value", Seq("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // counts are integers and merge by addition: the split-then-merge
    // path must be EQUAL, not approximately equal — that is the property
    // that makes per-day sketches at rest answer any-slice quantiles
    assert(merged == direct)
  }

  test("hdr quantiles: within the 12.5% one-sided bucket guarantee of exact") {
    val ev = CoreQueries.events(spark, sf)
    val sk = Pipeline.hdrSketch(ev, "value", Seq("event_type"))
    val est = Pipeline.hdrQuantiles(sk, Seq("event_type"), Seq(50, 95, 99))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // the sketch targets the ceil(p*n/100)-th ORDER STATISTIC (not the
    // interpolated percentile, which can fall below it) — compute that
    // exact order statistic as the truth
    val byType = ev.select("event_type", "value").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    def orderStat(vs: Array[Double], p: Int): Double =
      vs((vs.length * p + 99) / 100 - 1)
    for ((t, vs) <- byType; (s, p) <- Seq(
        (est(t)._1, 50), (est(t)._2, 95), (est(t)._3, 99))) {
      val e = orderStat(vs, p)
      // the estimate is the LOWER bound of the bucket holding the target
      // order statistic: lb <= v < lb*(1 + 1/8), plus the 0.01 scaling
      // granularity on each side
      assert(s <= e + 0.01, s"$t p$p: estimate $s above exact $e")
      assert(e < s * 1.125 + 0.02, s"$t p$p: estimate $s undershoots exact $e beyond the bucket guarantee")
    }
  }

  test("zorderKey: Column, SQL generator, and a bit-twiddling reference agree") {
    import spark.implicits._
    def ref(x: Long, y: Long): Long =
      (0 until 9).map(i => (((x >> i) & 1) << (2 * i)) |
        (((y >> i) & 1) << (2 * i + 1))).sum
    val pairs = Seq((0L, 0L), (511L, 511L), (1L, 0L), (0L, 1L),
      (341L, 170L), (256L, 255L), (490L, 296L))
    val df = pairs.toDF("x", "y")
    val viaColumn = df.select(Pipeline.zorderKey(col("x"), col("y")))
      .collect().map(_.getLong(0)).toSeq
    val viaSql = df.selectExpr(Pipeline.zorderKeySql("x", "y") + " AS z")
      .collect().map(_.getLong(0)).toSeq
    val expected = pairs.map { case (x, y) => ref(x, y) }
    assert(viaColumn == expected)
    assert(viaSql == expected) // the generated SQL is the same arithmetic
  }

  test("z-order layout: file min/max boxes prune 2-D predicates, linear sort can't") {
    // PREREQUISITE (the production rule): each dimension's bucket ids
    // must occupy the full bit range, or the sparse dimension's bits
    // drown under the dense one's in the interleave and z-order degrades
    // to a single-column sort. Real writers bucket by rank (quantile
    // boundaries from stats); here the day dimension spans ~30 values,
    // so stretch it over [0, 511] order-preservingly before keying.
    val raw = CoreQueries.events(spark, sf)
      .select(
        least(greatest(floor(col("value")).cast("long"), lit(0L)), lit(511L)).as("zx"),
        expr("ts_ns div 86400000000000").as("day"))
    val (dLo, dHi) = {
      val r = raw.agg(min("day"), max("day")).collect().head
      (r.getLong(0), r.getLong(1))
    }
    val ev = raw
      .withColumn("zy", (col("day") - dLo) * 511L / math.max(dHi - dLo, 1L))
      .withColumn("zy", col("zy").cast("long"))
      .withColumn("zkey", Pipeline.zorderKey(col("zx"), col("zy")))
    // 16 "files": range-partition on the layout key, then read each
    // file's min/max stats per dimension — exactly what a parquet footer
    // would expose for skipping
    def fileBoxes(key: String): Array[(Long, Long, Long, Long)] =
      ev.repartitionByRange(16, col(key))
        .withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min("zx").as("x0"), max("zx").as("x1"),
          min("zy").as("y0"), max("zy").as("y1"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val zBoxes = fileBoxes("zkey")
    val linBoxes = fileBoxes("zx") // the single-column sort layout
    val (yLo, yHi) = {
      val r = ev.agg(min("zy"), max("zy")).collect().head
      (r.getLong(0), r.getLong(1))
    }
    def touches(boxes: Array[(Long, Long, Long, Long)],
                x: Option[(Long, Long)], y: Option[(Long, Long)]): Int =
      boxes.count { case (x0, x1, y0, y1) =>
        x.forall { case (a, b) => x1 >= a && x0 <= b } &&
          y.forall { case (a, b) => y1 >= a && y0 <= b }
      }
    // day-range predicate (~5 of 30 days, scaled): the dimension the
    // linear layout does NOT sort by — every linear file spans all days;
    // z-order files hold small day boxes
    val yBox = Some((yLo + (yHi - yLo) / 10, yLo + (yHi - yLo) / 10 + (yHi - yLo) / 6))
    assert(touches(linBoxes, None, yBox) == linBoxes.length,
      "single-column sort cannot prune the other dimension")
    assert(touches(zBoxes, None, yBox) < linBoxes.length / 2,
      s"z-order should prune day-range scans: ${touches(zBoxes, None, yBox)} of ${zBoxes.length}")
    // value-range predicate still prunes under z-order (worse than the
    // perfect single-column sort, far better than nothing)
    val xBox = Some((100L, 150L))
    assert(touches(zBoxes, xBox, None) < zBoxes.length,
      "z-order must retain pruning on the first dimension too")
    // and a 2-D box composes both
    assert(touches(zBoxes, xBox, yBox) <= touches(zBoxes, xBox, None))
  }

  test("contaminatedDocsBloom equals the exact screen on the real corpus") {
    val corpus = docs.filter(col("doc_id") >= 20)
    val probes = docs.filter(col("doc_id") < 20)
    val exact = Pipeline.contaminatedDocs(corpus, probes, "doc_id", "text", 5)
      .collect().map(_.getLong(0)).toSet
    val bloom = Pipeline.contaminatedDocsBloom(corpus, probes, "doc_id", "text", 5)
      .collect().map(_.getLong(0)).toSet
    // verify-after-prefilter: false positives die in the verify join,
    // false negatives are impossible — set equality, not containment
    assert(bloom == exact)
    assert(exact.nonEmpty, "screen should flag planted contamination")
  }

  test("bloom prefilter kills almost all corpus shingles before the join") {
    val corpus = docs.filter(col("doc_id") >= 20)
    val probes = docs.filter(col("doc_id") < 20)
    val probeShingles = Dedup.shingles(probes, "doc_id", "text", 5)
      .select("shingle").distinct()
    val bf = probeShingles.stat.bloomFilter("shingle",
      math.max(probeShingles.count(), 1L), 0.01)
    val bc = spark.sparkContext.broadcast(bf)
    val hit = udf((sh: String) => sh != null && bc.value.mightContainString(sh))
    val all = Dedup.shingles(corpus, "doc_id", "text", 5)
    val total = all.count()
    val survivors = all.filter(hit(col("shingle"))).count()
    val trueHits = all.join(broadcast(probeShingles), Seq("shingle"), "left_semi").count()
    // survivors = true hits + ~fpp of the rest; at fpp=1% the prefilter
    // must remove the overwhelming share of non-matching shingles —
    // that reduction is what the verify join never has to process
    assert(survivors >= trueHits, "bloom filters cannot lose true hits")
    assert(survivors - trueHits <= (total - trueHits) / 20,
      s"false-positive sliver too large: $survivors survivors, $trueHits true of $total")
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

  test("segmentDedup: drops planted boilerplate, keeps unique text byte-exact") {
    import spark.implicits._
    // docs 1 and 2 share their first 4-word segment (the boilerplate);
    // everything else is unique. 8 words each → exactly 2 segments.
    val corpus = Seq(
      (1L, "all rights reserved worldwide alpha beta gamma delta"),
      (2L, "all rights reserved worldwide epsilon zeta eta theta"),
      (3L, "entirely original content here omega psi chi phi")
    ).toDF("doc_id", "text")
    val out = Pipeline.segmentDedup(corpus, "doc_id", "text", 4)
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    val d1 = out(0)
    assert(d1.getAs[Long]("n_seg") == 2 && d1.getAs[Long]("n_dup") == 1)
    assert(d1.getAs[Long]("kept_tokens") == 4)
    // the rebuild is the kept segments in order — md5 of the tail half
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(d1.getAs[String]("kept_md5") == md5hex("alpha beta gamma delta"))
    // a fully-unique doc reassembles to its original text exactly
    // (segments partition the word stream; concat-with-space restores it)
    val d3 = out(2)
    assert(d3.getAs[Long]("n_dup") == 0)
    assert(d3.getAs[String]("kept_md5") ==
      md5hex("entirely original content here omega psi chi phi"))
  }

  test("segmentDedup: all segments duplicated yields the empty-string fingerprint") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "exact copy of this text"),
      (2L, "exact copy of this text")
    ).toDF("doc_id", "text")
    val out = Pipeline.segmentDedup(corpus, "doc_id", "text", 4)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getAs[Long]("kept_tokens") == 0))
    val md5empty = "d41d8cd98f00b204e9800998ecf8427e"
    assert(out.forall(_.getAs[String]("kept_md5") == md5empty))
  }

  test("dupSpanStats: planted shared span counted at every position, short docs absent") {
    import spark.implicits._
    val corpus = Seq(
      // 6 words → 3 span positions; spans 1-3 unique to this doc
      (1L, "one two three four five six"),
      // shares no 4-gram with doc 1
      (2L, "seven eight nine ten eleven twelve"),
      // repeats doc 1's first span verbatim → both docs gain a dup span
      (3L, "one two three four something else entirely"),
      // 3 words: shorter than the span → no output row
      (4L, "too short doc")
    ).toDF("doc_id", "text")
    val out = Pipeline.dupSpanStats(corpus, "doc_id", "text", 4)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Long]("n_spans") == 3)
    assert(byId(1L).getAs[Long]("dup_spans") == 1)
    assert(byId(1L).getAs[Double]("dup_ratio") == 0.3333)
    assert(byId(2L).getAs[Long]("dup_spans") == 0)
    assert(byId(3L).getAs[Long]("n_spans") == 4)
    assert(byId(3L).getAs[Long]("dup_spans") == 1)
  }

  test("mixtureResample: smallest stratum keeps all, rates monotone, alpha=1 keeps everything") {
    val out = Pipeline.mixtureResample(docs, "doc_id", "lang", "text")
      .orderBy("lang").collect()
    val byLang = out.map(r => r.getString(0) -> r).toMap
    val counts = out.map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    val cmin = counts.values.min
    // the smallest stratum's keep-rate is 1 — nothing dropped there
    val smallest = counts.minBy(_._2)._1
    assert(byLang(smallest).getAs[Long]("kept_docs") == cmin)
    // every stratum keeps a subset, larger strata keep a smaller share
    out.foreach { r =>
      assert(r.getAs[Long]("kept_docs") <= r.getAs[Long]("n_docs"))
    }
    val shares = out.map(r =>
      r.getAs[Long]("n_docs") ->
        r.getAs[Long]("kept_docs").toDouble / r.getAs[Long]("n_docs"))
    for (pair <- shares.sortBy(_._1).sliding(2) if pair.length == 2
         if pair(0)._1 < pair(1)._1)
      assert(pair(0)._2 >= pair(1)._2 - 0.15,
        s"larger stratum (${pair(1)._1}) should not keep a materially larger share than smaller (${pair(0)._1})")
    // alpha = 1 is "keep the natural mixture": every doc survives
    val natural = Pipeline.mixtureResample(docs, "doc_id", "lang", "text",
      alpha = 1.0).collect()
    natural.foreach { r =>
      assert(r.getAs[Long]("kept_docs") == r.getAs[Long]("n_docs"))
    }
    // deterministic: the same call keeps the same counts
    val again = Pipeline.mixtureResample(docs, "doc_id", "lang", "text")
      .orderBy("lang").collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("deterministicGroupSample: exact k per big group, keep-all for small, repartition-invariant") {
    val got = Pipeline.deterministicGroupSample(docs, "lang", "doc_id", 40)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (lang, n) =>
      assert(got(lang) == math.min(n, 40L), s"$lang: ${got(lang)} of $n")
    }
    val ids = Pipeline.deterministicGroupSample(docs, "lang", "doc_id", 40)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val again = Pipeline.deterministicGroupSample(docs.repartition(7), "lang",
        "doc_id", 40)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == again)
  }

  test("snapshotDiff: added/removed/changed/unchanged partition the key union") {
    import spark.implicits._
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val after = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v")
    val got = Pipeline.snapshotDiff(before, after, "k", "v")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("kAnonymityViolations: flags exactly the under-k combinations, smallest first") {
    import spark.implicits._
    val df = (Seq.fill(5)(("en", "web")) ++ Seq.fill(2)(("en", "pdf")) ++
      Seq(("fr", "web"))).toDF("lang", "src")
    val got = Pipeline.kAnonymityViolations(df, Seq("lang", "src"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("fr", "web", 1L), ("en", "pdf", 2L)))
  }

  test("profileColumns: one row per column with null-aware counts and stringified extremes") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("a")), (4L, Some("b")))
      .toDF("id", "tag")
    val got = Pipeline.profileColumns(df, Seq("id", "tag"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(got("id") == ((4L, 4L, 4L, "1", "4")))
    assert(got("tag") == ((4L, 3L, 2L, "a", "b"))) // null excluded everywhere
    // one scan: the plan carries exactly one FileScan/LocalTableScan leaf
    val plan = Pipeline.profileColumns(df, Seq("id", "tag"))
      .queryExecution.executedPlan.toString
    assert(plan.split("LocalTableScan").length - 1 == 1, plan)
  }

  test("expectations: exact violation counts, null is not a violation, one scan") {
    import spark.implicits._
    val df = Seq((1L, Some(5.0)), (2L, Some(-1.0)), (3L, None),
      (4L, Some(200.0))).toDF("id", "v")
    val rules = Seq(
      "v_nonneg" -> (col("v") >= 0.0),          // -1 violates; null doesn't
      "v_below_100" -> (col("v") < 100.0),      // 200 violates
      "v_present" -> col("v").isNotNull,        // the explicit null rule
      "id_positive" -> (col("id") > 0L))        // clean
    val got = Pipeline.expectations(df, rules)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got == Map(
      "v_nonneg" -> ((1L, false)), "v_below_100" -> ((1L, false)),
      "v_present" -> ((1L, false)), "id_positive" -> ((0L, true))))
    // one scan regardless of rule count
    val plan = Pipeline.expectations(df, rules)
      .queryExecution.executedPlan.toString
    assert(plan.split("LocalTableScan").length - 1 == 1, plan)
  }

  test("leakageSafeSplit: clusters never straddle folds, singletons keep the kfold law") {
    import spark.implicits._
    // pair graph: {1,2,3} via a chain, {10,11}; 20/21 are singletons
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("da", "db")
    val got = Pipeline.leakageSafeSplit(docs, "doc_id", pairs, "da", "db", 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // every doc assigned exactly once
    assert(got.keySet == Set(1L, 2L, 3L, 10L, 11L, 20L, 21L))
    // cluster members share the label AND the fold
    assert(Set(got(1L), got(2L), got(3L)).size == 1)
    assert(Set(got(10L), got(11L)).size == 1)
    // cluster label is the min member; its fold is kfold(label)
    assert(got(1L)._1 == 1L && got(10L)._1 == 10L)
    // singletons degrade to the plain per-doc kfold assignment
    val plain = docs.select(col("doc_id"),
        Pipeline.kfold(col("doc_id"), 5).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(20L) == ((20L, plain(20L))))
    assert(got(21L) == ((21L, plain(21L))))
    assert(got(1L)._2 == plain(1L)) // fold of the cluster = kfold(min id)
  }

  test("rendezvousShard: minimal disruption and rough balance on grow") {
    import spark.implicits._
    val keys = spark.range(2000).toDF("id")
    val routed = keys.select(col("id"),
        Pipeline.rendezvousShard(col("id"), 4).as("s4"),
        Pipeline.rendezvousShard(col("id"), 5).as("s5"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // every key that moves when shard 4 joins moves TO shard 4
    routed.foreach { case (id, s4, s5) =>
      assert(s5 == s4 || s5 == 4, s"key $id moved $s4 -> $s5 (not the new shard)")
    }
    val moved = routed.count { case (_, s4, s5) => s4 != s5 }
    // expected 1/5 of keys move; allow a generous band around 400
    assert(moved > 250 && moved < 550, s"moved=$moved")
    // rough balance at 4 shards: each holds 2000/4 ± 40%
    val byShard = routed.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byShard.keySet == Set(0, 1, 2, 3))
    byShard.values.foreach(n => assert(n > 300 && n < 700, byShard.toString))
    // n = 1 routes everything to shard 0
    val one = keys.select(Pipeline.rendezvousShard(col("id"), 1).as("s"))
      .agg(min("s"), max("s")).collect().head
    assert(one.getInt(0) == 0 && one.getInt(1) == 0)
  }

  test("prefixLmSplit: exact integer split point, one-token clamp, reassembly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"), // 8 tokens -> k = 6
      (2L, "only"),            // 1 token  -> clamp k = 1, empty target
      (3L, "x y z"))           // 3 tokens -> (3*3) div 4 = 2
      .toDF("doc_id", "text")
    val out = Pipeline.prefixLmSplit(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out(0) == ((1L, "a b c d e f", "g h")))
    assert(out(1) == ((2L, "only", "")))
    assert(out(2) == ((3L, "x y", "z")))
    // reassembly restores the doc for every row
    out.foreach { case (_, in, tgt) =>
      val whole = if (tgt.isEmpty) in else s"$in $tgt"
      assert(Seq("a b c d e f g h", "only", "x y z").contains(whole))
    }
  }

  test("spanCorrupt: sentinel numbering, round-trip reconstruction, determinism") {
    import spark.implicits._
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, (0 until 20).map(t => s"w$t").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Pipeline.spanCorrupt(docs, "doc_id", "text").orderBy("doc_id")
    val rows = out.collect()
    // structural invariants on every doc
    rows.foreach { r =>
      val (n, input, target) =
        (r.getLong(1), r.getString(2), r.getString(3))
      val sentinelsIn = "<extra_id_\\d+>".r.findAllIn(input).toSeq
      assert(sentinelsIn.size == n)
      // sentinels appear in order 0..n-1 in BOTH strings
      assert(sentinelsIn == (0L until n).map(k => s"<extra_id_$k>"))
      val sentinelsTgt = "<extra_id_\\d+>".r.findAllIn(target).toSeq
      assert(sentinelsTgt == sentinelsIn)
      // splicing each target span back at its sentinel restores the doc
      var rebuilt = input
      val spans = target.split("<extra_id_\\d+> ?").toSeq.filter(_.nonEmpty)
      spans.zipWithIndex.foreach { case (span, k) =>
        rebuilt = rebuilt.replace(s"<extra_id_$k>", span.trim)
      }
      assert(rebuilt == (0 until 20).map(t => s"w$t").mkString(" "),
        s"round trip failed:\n$input\n$target\n$rebuilt")
    }
    // some docs corrupted, some untouched (1-in-6 draw over 7 blocks)
    assert(rows.exists(_.getLong(1) > 0) && rows.exists(_.getLong(1) == 0))
    // partitioning-proof
    val again = Pipeline.spanCorrupt(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rows.map(_.toSeq).sameElements(again.map(_.toSeq)))
  }
}
