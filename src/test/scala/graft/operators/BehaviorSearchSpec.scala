package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operator-level tests for the behavioral-analytics ([[Behavior]]) and
  * lexical-retrieval ([[Search]]) operators — the invariants the SQL
  * oracle can't state: funnel monotonicity and strict ordering,
  * retention mass conservation, SCD-2 run reconstruction, BM25 rank
  * behavior on hand-built corpora. */
class BehaviorSearchSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  // (user, ts, id, type) — user 1 converts fully in order; user 2 has
  // the click BEFORE any view (must NOT count past stage 1); user 3
  // views only.
  private lazy val ev = Seq(
    (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "buy"),
    (2L, 10L, 4L, "click"), (2L, 20L, 5L, "view"), (2L, 30L, 6L, "buy"),
    (3L, 10L, 7L, "view")
  ).toDF("user_id", "ts", "event_id", "event_type")

  test("funnel: strict ordering — out-of-order stages do not convert") {
    val got = Behavior.funnel(ev, "user_id", col("ts"), col("event_type"),
        Seq("view", "click", "buy"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // user 2's click precedes its view, so only user 1 passes stage 2;
    // user 2's buy AFTER its view still can't count without the click
    assert(got.toSeq == Seq((1L, "view", 3L), (2L, "click", 1L),
      (3L, "buy", 1L)))
  }

  test("funnel: stage counts are monotone non-increasing on real data") {
    val events = graft.operators.CoreQueries.events(
      spark, "/root/testdata/sf0.001")
    val counts = Behavior.funnel(events, "user_id",
        expr("ts_ns div 1000"), col("event_type"),
        Seq("view", "click", "purchase"))
      .orderBy("stage_ord").collect().map(_.getLong(2))
    assert(counts.length == 3)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a })
  }

  test("retention: day-0 row carries every cohort member; mass conserved") {
    val events = graft.operators.CoreQueries.events(
      spark, "/root/testdata/sf0.001")
    val day = expr("(ts_ns div 1000) div 86400000000")
    val r = Behavior.retention(events, "user_id", day)
    val rows = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(rows.forall(_._2 >= 0), "offsets must be non-negative")
    // Σ over a cohort's day-0 rows = cohort sizes = distinct users
    val day0 = rows.filter(_._2 == 0L).map(_._3).sum
    val users = events.select("user_id").distinct().count()
    assert(day0 == users, s"day-0 mass $day0 != $users users")
  }

  test("changeIntervals: runs reconstruct the event count and tile time") {
    val got = Behavior.changeIntervals(ev, "user_id", col("ts"),
      col("event_id"), col("event_type"))
    val rows = got.collect()
    assert(rows.map(_.getLong(5)).sum == ev.count()) // n_events conserved
    // per user: valid_to of run k equals valid_from of run k+1; the
    // last run is open (null)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(4) == b.getLong(3))
        case _ =>
      }
      assert(sorted.last.isNullAt(4), "last run must be open")
    }
  }

  test("topPaths: paths are depth-bounded and counts sum to entities") {
    val got = Behavior.topPaths(ev, "user_id", col("ts"), col("event_id"),
      col("event_type"), depth = 2, topK = 10).collect()
    val paths = got.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(paths == Map("view>click" -> 1L, "click>view" -> 1L,
      "view" -> 1L))
  }

  test("bm25: more matched terms and rarer terms rank higher") {
    val docs = Seq(
      (1L, "alpha beta gamma pad pad pad"),
      (2L, "alpha pad pad pad pad pad"),
      (3L, "pad pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val got = Search.bm25TopK(docs, "doc_id", "text",
        Seq("alpha", "beta"), k = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    // doc 1 matches both terms → strictly above doc 2 (one term);
    // doc 3 matches none → absent
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
    assert(got(0)._2 > got(1)._2)
  }

  test("bm25: length normalization — same tf, shorter doc wins") {
    val docs = Seq(
      (1L, "alpha " + Seq.fill(3)("pad").mkString(" ")),
      (2L, "alpha " + Seq.fill(30)("pad").mkString(" "))
    ).toDF("doc_id", "text")
    val got = Search.bm25TopK(docs, "doc_id", "text", Seq("alpha"), 10)
      .collect().map(_.getLong(1))
    assert(got.toSeq == Seq(1L, 2L))
  }

  test("funnel: conversion window drops late transitions") {
    // user 1 clicks 5 ticks after the view; user 4 clicks 100 after
    val ev2 = ev.union(Seq((4L, 10L, 8L, "view"), (4L, 110L, 9L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type"))
    def stage2(gap: Option[Long]) =
      Behavior.funnel(ev2, "user_id", col("ts"), col("event_type"),
          Seq("view", "click"), maxGap = gap)
        .filter(col("stage_ord") === 2).collect().head.getLong(2)
    assert(stage2(None) == 2L)       // users 1 and 4
    assert(stage2(Some(50L)) == 1L)  // user 4's click is outside the window
  }

  test("interEventGaps: gap stats per entity; single-event entity keeps nulls") {
    val got = Behavior.interEventGaps(ev, "user_id", col("ts"), col("event_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    assert(got(1L) == ((3L, 2L, 10L))) // gaps 10, 10
    assert(got(3L) == ((1L, 0L, -1L))) // one event → zero gaps, null avg
  }

  test("pageRank: matches an in-test reference on a hand graph; ranks sum to N under full links") {
    // a 3-cycle plus a dangler: a→b→c→a, a→d
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"))
      .toDF("src", "dst")
    val got = Graph.pageRank(edges, "src", "dst", iterations = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // reference: same formulation, driver-side
    val e = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "d")
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    val deg = e.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to 3) {
      val contrib = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / deg(s) }.sum).toMap
      r = nodes.map(n => n -> (0.15 + 0.85 * contrib.getOrElse(n, 0.0))).toMap
    }
    nodes.foreach(n => assert(math.abs(got(n) - r(n)) < 1e-12,
      s"$n: got ${got(n)}, want ${r(n)}"))
    // a receives c's FULL rank (deg 1) while d only gets half of a's —
    // the cycle head outranks the sink (b ties d exactly: same single
    // half-of-a in-flow, a genuine structural tie)
    assert(got("a") > got("d"))
  }

  test("triangleCount: K4 has 4 triangles; counts orientation-independent") {
    // K4 on {1..4}: 6 edges (one duplicated + one reversed — normalized
    // away), C(4,3)=4 triangles, wedges Σ C(3,2)=12
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L), (3L, 4L)).toDF("s", "d")
    val r = Graph.triangleCount(edges, "s", "d").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((6L, 12L, 4L)))
    // path graph: wedges but zero triangles
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val p = Graph.triangleCount(path, "s", "d").collect().head
    assert((p.getLong(0), p.getLong(1), p.getLong(2)) == ((3L, 2L, 0L)))
  }

  test("kCore: pendant chain peels over two rounds, core keeps the triangle") {
    // triangle {1,2,3} + chain 3–4–5: round 1 peels 5 (deg 1), which
    // drops 4 to deg 1 → round 2 peels 4; the 2-core is the triangle
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("s", "d")
    val got = Graph.kCore(edges, "s", "d", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k above the max degree: everything peels, empty core (converged)
    assert(Graph.kCore(edges, "s", "d", k = 5).isEmpty)
    // a peel needing 2 rounds fails loudly at maxIter = 1
    intercept[IllegalArgumentException] {
      Graph.kCore(edges, "s", "d", k = 2, maxIter = 1)
    }
  }

  test("chiSquareCells: independent uniform table has zero contributions") {
    val df = (for (a <- Seq("x", "y"); b <- 0 to 1; _ <- 1 to 5)
      yield (a, b)).toDF("a", "b")
    val got = Qan.chiSquareCells(df, col("a"), col("b")).collect()
    assert(got.length == 4)
    got.foreach { r =>
      assert(r.getLong(2) == 5L)
      assert(r.getDouble(3) == 5.0)   // expected = 10*10/20
      assert(r.getDouble(4) == 0.0)   // perfectly independent
    }
  }

  test("degrees: in/out/total census over the distinct edge set") {
    val edges = Seq(("a", "b"), ("a", "b"), ("b", "a"), ("a", "c"))
      .toDF("src", "dst")
    val got = Graph.degrees(edges, "src", "dst")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      "a" -> ((2L, 1L, 3L)), // out: b,c; in: b
      "b" -> ((1L, 1L, 2L)),
      "c" -> ((0L, 1L, 1L))))
  }

  // hub graph for the twoHopReach cap tests: middle 0 with 3 in-edges
  // and 4 out-edges (wedge fan-out 12) next to a 4-node chain whose
  // middles all have fan-out 1
  private lazy val hubEdges = (
    (1L to 3L).map(i => (i, 0L)) ++ Seq(10L, 11L, 12L, 13L).map(j => (0L, j)) ++
      Seq((20L, 21L), (21L, 22L), (22L, 23L))
  ).toDF("s", "d")

  test("twoHopReach: cap high enough to keep every middle equals the uncapped result") {
    val k = 50
    val uncapped = Graph.twoHopReach(hubEdges, "s", "d", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val capped = Graph.twoHopReach(hubEdges, "s", "d", k,
        maxMiddleWedges = Some(12L)) // hub fan-out is exactly 12, kept
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(capped == uncapped)
    // sanity on the uncapped semantics: node 1 reaches 0 plus the hub's
    // 4 out-neighbors
    val reach = uncapped.map(t => t._2 -> t._3).toMap
    assert(reach(1L) == 5L)
    assert(reach(20L) == 2L) // chain: 21, 22
  }

  test("twoHopReach: a cap below the hub fan-out drops only wedges THROUGH the hub") {
    val got = Graph.twoHopReach(hubEdges, "s", "d", 50,
        maxMiddleWedges = Some(11L))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // spokes lose the hub's neighborhood but keep their one-hop edge
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    // the hub's own reach and the chain (fan-out 1 middles) are intact
    assert(got(0L) == 4L)
    assert(got(20L) == 2L && got(21L) == 2L && got(22L) == 1L)
  }

  test("twoHopReach: decodeNode equals running on pre-decoded string keys") {
    // long parity keys (the q209 shuffle layout) + decode-at-readout must
    // equal the string-keyed run EXACTLY — including rank tie order,
    // which the decode applies BEFORE the top-k ("c10" < "c2" on strings
    // but 10 < 2 is false on longs, so ranking on longs then decoding
    // would order ties differently)
    val longEdges = hubEdges.select((col("s") * 2).as("s"),
      (col("d") * 2 + 1).as("d"))
    val dec: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      n => when(n % 2 === 0, concat(lit("c"), (n / 2).cast("long")))
        .otherwise(concat(lit("s"), ((n - 1) / 2).cast("long")))
    val strEdges = longEdges.select(dec(col("s")).as("s"), dec(col("d")).as("d"))
    val viaDecode = Graph.twoHopReach(longEdges, "s", "d", 50,
        decodeNode = Some(dec))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val direct = Graph.twoHopReach(strEdges, "s", "d", 50)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(viaDecode == direct)
    assert(viaDecode.nonEmpty)
  }

  test("twoHopReach: approxDistinct agrees with exact counts on a small graph") {
    val exact = Graph.twoHopReach(hubEdges, "s", "d", 50)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val approx = Graph.twoHopReach(hubEdges, "s", "d", 50,
        approxDistinct = true)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (n, r) =>
      assert(math.abs(approx(n) - r) <= math.max(1L, (r * 0.05).toLong),
        s"node $n: approx ${approx(n)} vs exact $r")
    }
  }

  test("transitionMatrix: rows are per-entity consecutive pairs, probs sum to 1 per source") {
    val got = Behavior.transitionMatrix(ev, "user_id", col("ts"),
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    // sequences: u1 view>click>buy, u2 click>view>buy, u3 view (no pair)
    val cnt = got.map(t => (t._1, t._2) -> t._3).toMap
    assert(cnt == Map(("view", "click") -> 1L, ("click", "buy") -> 1L,
      ("click", "view") -> 1L, ("view", "buy") -> 1L))
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-9)
    }
  }

  test("sessionStats: gap splits sessions, spans exact, events conserved") {
    // user 1: events at 10, 20, then 1000 (gap 980 > 100 → new session)
    val evs = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 1000L, 3L),
      (2L, 5L, 4L)).toDF("user_id", "ts", "event_id")
    val got = Behavior.sessionStats(evs, "user_id", col("ts"),
        col("event_id"), maxGap = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(5)))
    assert(got.toSeq == Seq((1L, 1L, 2L, 10L), (1L, 2L, 1L, 0L),
      (2L, 1L, 1L, 0L)))
  }

  test("conversionTimes: only full converters, elapsed = strict chain span") {
    val got = Behavior.conversionTimes(ev, "user_id", col("ts"),
        col("event_type"), Seq("view", "click", "buy"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // only user 1 completes view→click→buy in order: 10 → 30
    assert(got.toSeq == Seq((1L, 10L, 30L, 20L)))
  }

  test("associationPairs: lift from exact counts, support floor, basket-bounded") {
    // 4 tx: {1,2} {1,2} {1,3} {3}; n=4, c1=3 c2=2 c3=2
    val tx = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L), (13L, 3L), (12L, 3L)) // dup row: distinct-ed
      .toDF("tx", "item")
    val got = Behavior.associationPairs(tx, "tx", "item",
        minSupport = 2L, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // only (1,2) reaches support 2: lift = 2*4/(3*2) = 1.3333
    assert(got.toSeq == Seq((1L, 2L, 2L, 1.3333)))
  }

  test("conjunctiveSearch: equals the intersection of per-term hits") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val post = Search.postings(docs, "doc_id", "text")
    val both = Search.conjunctiveSearch(post, Seq("hash", "merge"))
      .select("doc_id").as[Long].collect().toSet
    def hits(t: String) = Search.conjunctiveSearch(post, Seq(t))
      .select("doc_id").as[Long].collect().toSet
    assert(both == (hits("hash") intersect hits("merge")))
    assert(both.nonEmpty)
  }

  test("phraseDocs: adjacency in order, not mere co-occurrence") {
    // doc 1 has the phrase; doc 2 has both words reversed; doc 3 has
    // them separated; doc 4 repeats the first word before the match
    // (pos arithmetic must not be confused by the earlier miss)
    val docs = Seq(
      (1L, "a slow query ran"), (2L, "query slow path"),
      (3L, "slow disk query"), (4L, "slow slow query end"),
      (5L, "nothing here")
    ).toDF("doc_id", "text")
    val got = Search.phraseDocs(docs, "doc_id", "text", "slow query")
      .as[Long].collect().toSeq
    assert(got == Seq(1L, 4L))
    // 3-word phrase: needs all three adjacent in order
    val tri = Search.phraseDocs(docs, "doc_id", "text", "a slow query")
      .as[Long].collect().toSeq
    assert(tri == Seq(1L))
    // single-word phrase degenerates to containment
    val one = Search.phraseDocs(docs, "doc_id", "text", "query")
      .as[Long].collect().toSeq
    assert(one == Seq(1L, 2L, 3L, 4L))
  }

  test("phraseOccurrences: overlapping starts each count") {
    val docs = Seq(
      (1L, "a a a"),          // "a a" starts at 0 and 1 → 2
      (2L, "a b a b a"),      // "a b" starts at 0 and 2 → 2
      (3L, "b b")             // no match → absent
    ).toDF("doc_id", "text")
    val pp = Search.positionalPostings(docs, "doc_id", "text")
    val got = Search.phraseOccurrences(pp, "a a")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L)))
    val ab = Search.phraseOccurrences(pp, "a b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ab == Seq((2L, 2L)))
  }

  test("proximityDocs: window boundary exact, either order, bin edges") {
    // positions: doc 1 has x@0 y@3 (|Δ|=3, inside w=3, crosses a bin
    // edge); doc 2 x@0 y@4 (|Δ|=4, outside); doc 3 y@1 x@2 (reverse
    // order, inside); doc 4 x@5 y@5 impossible (one token per pos) —
    // instead x@5 y@8 exactly w apart across bins 1|2
    val docs = Seq(
      (1L, "x p p y"), (2L, "x p p p y"), (3L, "p y x"),
      (4L, "p p p p p x p p y")
    ).toDF("doc_id", "text")
    val pp = Search.positionalPostings(docs, "doc_id", "text")
    val got = Search.proximityDocs(pp, "x", "y", window = 3)
      .as[Long].collect().toSeq
    assert(got == Seq(1L, 3L, 4L))
    // the binned join finds each qualifying pair exactly once: doc-level
    // occurrence counting off the same join must equal the brute force
    val pairs = Search.proximityDocs(pp, "x", "y", window = 4)
      .as[Long].collect().toSeq
    assert(pairs == Seq(1L, 2L, 3L, 4L))
  }

  test("phraseDocs property: equals the delimited-contains scan on random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // small alphabet forces phrase hits, overlaps, and near-misses
    val word = Gen.oneOf("a", "b", "c", "ab")
    val doc = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val corpus = (0 until 120).flatMap(i =>
      doc.apply(Gen.Parameters.default, Seed(i.toLong)).map(t => (i.toLong, t)))
    val df = corpus.toDF("doc_id", "text")
    for (phrase <- Seq("a", "a b", "b a c", "ab a", "c c")) {
      val got = Search.phraseDocs(df, "doc_id", "text", phrase)
        .as[Long].collect().toSet
      val want = corpus.collect { case (id, t)
        if s" $t ".contains(s" $phrase ") => id }.toSet
      assert(got == want, s"phrase '$phrase'")
    }
    // proximity: the binned join equals the brute-force distance scan
    val pp = Search.positionalPostings(df, "doc_id", "text")
    for (w <- Seq(1, 2, 5)) {
      val got = Search.proximityDocs(pp, "a", "b", w)
        .as[Long].collect().toSet
      val want = corpus.collect { case (id, t) if {
        val toks = t.split(" ")
        val pa = toks.indices.filter(toks(_) == "a")
        val pb = toks.indices.filter(toks(_) == "b")
        pa.exists(x => pb.exists(y => math.abs(x - y) <= w))
      } => id }.toSet
      assert(got == want, s"window $w")
    }
  }

  test("phraseDocs on the test corpus: equals the delimited-contains scan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Search.phraseDocs(docs, "doc_id", "text", "slow query")
      .as[Long].collect().toSet
    val brute = docs
      .filter(concat(lit(" "), col("text"), lit(" ")).contains(" slow query "))
      .select("doc_id").as[Long].collect().toSet
    assert(got == brute)
    assert(got.nonEmpty)
  }

  test("phraseBoostTopK: zero boost equals plain BM25; boost promotes phrase docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val terms = Seq("hash", "merge", "vector")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val plain = rows(Search.bm25TopK(docs, "doc_id", "text", terms, k = 10))
    val zero = rows(Search.phraseBoostTopK(docs, "doc_id", "text", terms,
      "hash join", boost = 0.0, k = 10))
    assert(zero == plain)
    // with a boost exceeding the score spread, the head is exactly the
    // phrase docs that carry any query term, ranked by score
    val boosted = rows(Search.phraseBoostTopK(docs, "doc_id", "text", terms,
      "hash join", boost = 100.0, k = 10))
    val phraseIds = Search.phraseDocs(docs, "doc_id", "text", "hash join")
      .collect().map(_.getLong(0)).toSet
    assert(boosted.forall { case (_, id, s) =>
      (s > 100.0) == phraseIds.contains(id) })
    // every boosted doc ranks above every unboosted one
    val flags = boosted.map(_._3 > 100.0)
    assert(!flags.zip(flags.tail).contains((false, true)))
    assert(flags.head, "no phrase doc reached the head")
  }

  test("rfmSegments: arithmetic tiles equal the unpartitioned ntile windows") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    // 103 users (n % 4 = 3 exercises ntile's remainder rule: first 3
    // tiles carry 26 rows, the last 25), synthetic skewed metrics with
    // deliberate ties so the user_id tiebreak is load-bearing
    val ev = (0 until 1030).map { i =>
      (i % 103L, (i * 37 % 500).toLong, 1.0 + (i % 7))
    }.toDF("user_id", "us", "value")
    val got = Behavior.rfmSegments(ev, "user_id", col("us"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val byUser = ev.groupBy("user_id")
      .agg(max("us").as("_last"), count(lit(1)).as("_freq"),
        round(sum("value"), 4).as("_mon"))
    val want = byUser
      .withColumn("_r", ntile(4).over(W.orderBy(col("_last").desc, col("user_id"))))
      .withColumn("_f", ntile(4).over(W.orderBy(col("_freq").desc, col("user_id"))))
      .withColumn("_m", ntile(4).over(W.orderBy(col("_mon").desc, col("user_id"))))
      .groupBy(concat(col("_r"), col("_f"), col("_m")).as("rfm"))
      .agg(count(lit(1)).as("n_users"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want)
    assert(got.values.sum == 103L)
  }

  test("rfmSegments: remainder rule holds at every n mod k, including n < k") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    // n = 2 (< k), 4 (= k), 5..7 (each n % 4), 9 — the ntile remainder
    // boundary cases the arithmetic must reproduce exactly
    for (n <- Seq(2, 4, 5, 6, 7, 9)) {
      val ev = (0 until n * 3).map { i =>
        (i % n.toLong, (i * 13 % 40).toLong, 1.0 + (i % 3))
      }.toDF("user_id", "us", "value")
      val got = Behavior.rfmSegments(ev, "user_id", col("us"), col("value"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val byUser = ev.groupBy("user_id")
        .agg(max("us").as("_last"), count(lit(1)).as("_freq"),
          round(sum("value"), 4).as("_mon"))
      val want = byUser
        .withColumn("_r", ntile(4).over(W.orderBy(col("_last").desc, col("user_id"))))
        .withColumn("_f", ntile(4).over(W.orderBy(col("_freq").desc, col("user_id"))))
        .withColumn("_m", ntile(4).over(W.orderBy(col("_mon").desc, col("user_id"))))
        .groupBy(concat(col("_r"), col("_f"), col("_m")).as("rfm"))
        .agg(count(lit(1)).as("n_users"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == want, s"n=$n: got $got want $want")
    }
  }

  test("seasonalAnomaly: integer z² flags the spike hour-bucket; zero-variance never flags") {
    // hour 0 over 5 days: 1.00 ×4 then a 5.00 spike; hour 1 constant.
    // NOTE small-m masking: one outlier among m observations caps the
    // z-score at (m−1)/√m ≈ 1.79 for m = 5 because it inflates its own
    // variance — so the spec tests at z = 1 (the default z = 3 needs
    // the long profiles real calendars have)
    val ev = (Seq.tabulate(4)(d => (d.toLong, 0L, 1.00)) ++
      Seq((4L, 0L, 5.00)) ++
      Seq.tabulate(5)(d => (d.toLong, 1L, 2.00)))
      .toDF("day", "hour", "value")
    val out = Behavior.seasonalAnomaly(ev, col("day"), col("hour"),
        round(col("value") * 100).cast("long"), z = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(3), r.getBoolean(4)))).toMap
    assert(out((4L, 0L)) == ((500L, true)))       // the spike flags
    assert(out((0L, 0L)) == ((100L, false)))      // its peers do not
    // zero-variance hour: dev = 0, bound = 0, strict > never flags
    (0L to 4L).foreach(d => assert(out((d, 1L)) == ((200L, false))))
  }

  test("cusumChangepoint: hand integers, argmax at the regime edge, endpoint zero") {
    // one 2.00-valued event per day for days 0–3, then 10.00 for 4–7:
    // C_t = 8·Σcents − cn·4800 bottoms at day 3 (the last low day),
    // and C_7 = 0 by construction (the full-series deviation cancels)
    val ev = (0L to 3L).map(d => (d, 2.00)) ++ (4L to 7L).map(d => (d, 10.00))
    val df = ev.toDF("day", "value")
    val out = Behavior.cusumChangepoint(df, col("day"),
        round(col("value") * 100).cast("long"))
      .orderBy("day")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    val want = Seq(
      (0L, 1L, 200L, -3200L, false), (1L, 1L, 200L, -6400L, false),
      (2L, 1L, 200L, -9600L, false), (3L, 1L, 200L, -12800L, true),
      (4L, 1L, 1000L, -9600L, false), (5L, 1L, 1000L, -6400L, false),
      (6L, 1L, 1000L, -3200L, false), (7L, 1L, 1000L, 0L, false))
    assert(out.toSeq == want)
    // argmax tie rule: a flat series puts every C_t at its own max (all
    // zero only at the end — an all-equal series has C_t = 0 everywhere)
    // → the flag lands on the EARLIEST day
    val flat = (0L to 4L).map(d => (d, 3.00)).toDF("day", "value")
    val flags = Behavior.cusumChangepoint(flat, col("day"),
        round(col("value") * 100).cast("long"))
      .filter(col("is_changepoint")).select("day")
      .collect().map(_.getLong(0)).toSeq
    assert(flags == Seq(0L))
  }

  test("cusumFromDaily over rollup partials is bit-identical to the raw-event monitor") {
    // split arrivals into two appended batches of partials (the
    // StreamingRollup posture), merge, collapse types to the daily
    // frame, feed the monitor — must equal the event-level run exactly
    val ev = (0L until 60L).map(i =>
      (i % 9, if (i % 2 == 0) "a" else "b", (i % 13) * 0.25 + 1.0))
      .toDF("day", "ty", "value")
    val cents = round(col("value") * 100).cast("long")
    def parts(b: org.apache.spark.sql.DataFrame) =
      graft.operators.Rollup.dailyPartials(b, col("day"), col("ty"), cents)
    val stored = parts(ev.filter(col("value") < 2.0))
      .unionByName(parts(ev.filter(col("value") >= 2.0)))
    val daily = graft.operators.Rollup.mergePartials(stored)
      .groupBy("day")
      .agg(sum("cnt").as("n"), sum("sum_v").as("_s"))
    val viaRollup = Behavior.cusumFromDaily(daily).orderBy("day").collect()
    val direct = Behavior.cusumChangepoint(ev, col("day"), cents)
      .orderBy("day").collect()
    assert(viaRollup.sameElements(direct))
  }
}
