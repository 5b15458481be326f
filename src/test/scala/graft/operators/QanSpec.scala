package graft.operators

import graft.SparkTestSession
import graft.slowlog.{SlowLogSource, SlowLogTable}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end QAN report over an ingested log: the reference's full
  * user journey (log → events → wide table → top-queries report). */
class QanSpec extends AnyFunSuite with SparkTestSession {

  private lazy val wide = {
    val dir = Files.createTempDirectory("graft-qan")
    val sb = new StringBuilder
    // digest A: 6 slow calls in shopdb; digest B: 3 fast calls in refdb;
    // two users on A — every aggregate below is hand-computable
    for (i <- 0 until 9) {
      val (tbl, qt, user, db) =
        if (i < 6) ("orders", 0.5 + i * 0.1,
          if (i % 2 == 0) "alice" else "bob", "shopdb")
        else ("nation", 0.001, "alice", "refdb")
      sb.append(f"# Time: 2024-01-15T10:0${i / 6}%d:0$i%02d.000000Z\n")
      sb.append(s"# User@Host: $user[$user] @ h [10.0.0.1]\n")
      sb.append(f"# Query_time: $qt%.6f  Lock_time: 0.000001 Rows_sent: 5  Rows_examined: ${100 * (i + 1)}%d\n")
      sb.append(s"use $db;\n")
      sb.append(f"SET timestamp=${1705312800L + i}%d;\n")
      sb.append(s"SELECT * FROM $tbl WHERE k = $i;\n")
    }
    Files.writeString(dir.resolve("qan.log"), sb.result())
    SlowLogTable.flatten(SlowLogSource.readRaw(spark, dir.toString))
  }

  test("profile ranks digests by total time with correct aggregates") {
    val prof = Qan.profile(wide).collect()
    assert(prof.length == 2)
    val top = prof(0)
    assert(top.getAs[String]("fingerprint") == "select * from orders where k = ?")
    assert(top.getAs[Long]("cnt") == 6L)
    // unsampled log: scaled count degenerates to the plain count
    assert(top.getAs[Long]("cnt_scaled") == 6L)
    assert(top.getAs[Long]("n_users") == 2L)
    assert(math.abs(top.getAs[Double]("total_time") - (0.5 + 0.6 + 0.7 + 0.8 + 0.9 + 1.0)) < 1e-9)
    assert(top.getAs[Long]("rows_examined") == (1 to 6).map(_ * 100L).sum)
    // hand-computed: avg = 4.5/6; p95 over {0.5..1.0} at 10k accuracy is
    // the max; first/last seen are the SET timestamps of calls 0 and 5
    assert(math.abs(top.getAs[Double]("avg_time") - 0.75) < 1e-9)
    // V/M by hand over {0.5..1.0}: var_pop = E[x^2]-E[x]^2 = 0.0291666..,
    // ratio = var/mean; stddev is its square root
    val varPop = (5 to 10).map(i => (i / 10.0 - 0.75) * (i / 10.0 - 0.75)).sum / 6
    assert(math.abs(top.getAs[Double]("stddev_time") - math.sqrt(varPop)) < 1e-9)
    // the worst-case example is the raw text of the slowest call (k = 5,
    // query_time 1.0) — pt-query-digest's EXPLAIN-ready sample
    assert(top.getAs[String]("example_query") == "SELECT * FROM orders WHERE k = 5")
    assert(math.abs(top.getAs[Double]("vm_ratio") - varPop / 0.75) < 1e-9)
    assert(math.abs(top.getAs[Double]("p95_time") - 1.0) < 1e-9)
    assert(top.getAs[java.sql.Timestamp]("first_seen").getTime == 1705312800000L)
    assert(top.getAs[java.sql.Timestamp]("last_seen").getTime == 1705312805000L)
    val second = prof(1)
    assert(second.getAs[String]("fingerprint") == "select * from nation where k = ?")
    assert(second.getAs[Long]("cnt") == 3L)
    assert(math.abs(second.getAs[Double]("total_time") - 0.003) < 1e-9)
  }

  test("profile scales counts by the Percona rate limit") {
    // rate-limited log: sampling keeps 1-in-20 queries, annotation
    // written once where sampling starts and carried forward — the
    // 4 logged calls represent 80 executions
    val dir = Files.createTempDirectory("graft-qan-rate")
    val sb = new StringBuilder
    for (i <- 0 until 4) {
      sb.append(f"# Time: 2024-01-15T10:00:0$i%d.000000Z\n")
      sb.append("# User@Host: app[app] @ h [10.0.0.1]\n")
      sb.append("# Query_time: 0.200000  Lock_time: 0.000001 Rows_sent: 1  Rows_examined: 10\n")
      if (i == 0)
        sb.append("# Log_slow_rate_type: query  Log_slow_rate_limit: 20\n")
      sb.append(f"SET timestamp=${1705312800L + i}%d;\n")
      sb.append(s"SELECT * FROM orders WHERE k = $i;\n")
    }
    Files.writeString(dir.resolve("rate.log"), sb.result())
    val w = SlowLogTable.flatten(SlowLogSource.readRaw(spark, dir.toString))
    val prof = Qan.profile(w).collect()
    assert(prof.length == 1)
    assert(prof(0).getAs[Long]("cnt") == 4L)
    assert(prof(0).getAs[Long]("cnt_scaled") == 80L)
    // every additive aggregate scales: 4 × 0.2 s logged ⇒ 16 s true load
    assert(math.abs(prof(0).getAs[Double]("total_time_scaled") - 16.0) < 1e-9)
  }

  test("profile ranks a sampled heavy hitter above an unsampled lighter query") {
    // digest A: 2 logged calls × 0.3 s at rate 1-in-50 → true load 30 s.
    // digest B: 5 unsampled calls × 1.0 s → true load 5 s.
    // Raw total_time would rank B (5.0 s) above A (0.6 s); the scaled
    // ordering puts A first — the pt-query-digest contract.
    val dir = Files.createTempDirectory("graft-qan-rank")
    val sb = new StringBuilder
    for (i <- 0 until 2) {
      sb.append(f"# Time: 2024-01-15T10:00:0$i%d.000000Z\n")
      sb.append("# User@Host: app[app] @ h [10.0.0.1]\n")
      sb.append("# Query_time: 0.300000  Lock_time: 0.000001 Rows_sent: 1  Rows_examined: 10\n")
      if (i == 0)
        sb.append("# Log_slow_rate_type: query  Log_slow_rate_limit: 50\n")
      sb.append(f"SET timestamp=${1705312800L + i}%d;\n")
      sb.append(s"SELECT * FROM hot WHERE k = $i;\n")
    }
    Files.writeString(dir.resolve("sampled.log"), sb.result())
    val sb2 = new StringBuilder
    for (i <- 0 until 5) {
      sb2.append(f"# Time: 2024-01-15T10:01:0$i%d.000000Z\n")
      sb2.append("# User@Host: app[app] @ h [10.0.0.1]\n")
      sb2.append("# Query_time: 1.000000  Lock_time: 0.000001 Rows_sent: 1  Rows_examined: 10\n")
      sb2.append(f"SET timestamp=${1705312860L + i}%d;\n")
      sb2.append(s"SELECT * FROM cold WHERE k = $i;\n")
    }
    Files.writeString(dir.resolve("unsampled.log"), sb2.result())
    val w = SlowLogTable.flatten(SlowLogSource.readRaw(spark, dir.toString))
    val prof = Qan.profile(w).collect()
    assert(prof.length == 2)
    assert(prof(0).getAs[String]("fingerprint") == "select * from hot where k = ?")
    assert(math.abs(prof(0).getAs[Double]("total_time_scaled") - 30.0) < 1e-9)
    assert(math.abs(prof(0).getAs[Double]("total_time") - 0.6) < 1e-9)
    assert(prof(1).getAs[String]("fingerprint") == "select * from cold where k = ?")
    assert(math.abs(prof(1).getAs[Double]("total_time_scaled") - 5.0) < 1e-9)
  }

  test("unsampled log: scaled ordering and totals degenerate to the raw ones") {
    val prof = Qan.profile(wide).collect()
    // the shared 9-event fixture is never rate-limited: every scaled
    // aggregate must equal its raw twin row-for-row, so the scaled
    // ordering IS the raw ordering
    prof.foreach { r =>
      assert(r.getAs[Long]("cnt_scaled") == r.getAs[Long]("cnt"))
      assert(math.abs(r.getAs[Double]("total_time_scaled") -
        r.getAs[Double]("total_time")) < 1e-12)
    }
    assert(prof.map(_.getAs[Double]("total_time")).toSeq ==
      prof.map(_.getAs[Double]("total_time")).sortBy(-_).toSeq)
  }

  test("sparkline buckets per digest and hour with exact values") {
    val sl = Qan.sparkline(wide, "hour").collect()
    // all events fall in hour 10:00; 2 digests → 2 rows, ordered by
    // (bucket, digest); identify rows by value, not digest order
    assert(sl.length == 2)
    assert(sl.forall(_.getAs[java.sql.Timestamp]("bucket").getTime ==
      1705312800000L)) // 2024-01-15T10:00:00Z
    val byCnt = sl.sortBy(_.getAs[Long]("cnt"))
    assert(byCnt(0).getAs[Long]("cnt") == 3L)
    assert(math.abs(byCnt(0).getAs[Double]("total_time") - 0.003) < 1e-9)
    assert(byCnt(1).getAs[Long]("cnt") == 6L)
    assert(math.abs(byCnt(1).getAs[Double]("total_time") - 4.5) < 1e-9)
    // unsampled fixture: the scaled series mirrors the raw series
    sl.foreach { r =>
      assert(r.getAs[Long]("cnt_scaled") == r.getAs[Long]("cnt"))
      assert(math.abs(r.getAs[Double]("total_time_scaled") -
        r.getAs[Double]("total_time")) < 1e-12)
    }
  }

  test("load breakdown rolls up db and user with exact values") {
    val rows = Qan.loadByDbUser(wide).collect()
    // rollup levels: grand, per-db ×2, per-(db,user) ×3 → 6 rows
    assert(rows.length == 6)
    def level(db: Option[String], user: Option[String]): (Long, Double) = {
      val r = rows.find(r =>
        Option(r.getAs[String]("db")) == db &&
        Option(r.getAs[String]("user")) == user).get
      (r.getAs[Long]("cnt"), r.getAs[Double]("total_time"))
    }
    val (gc, gt) = level(None, None)
    assert(gc == 9L && math.abs(gt - 4.503) < 1e-9)
    val (sc, st) = level(Some("shopdb"), None)
    assert(sc == 6L && math.abs(st - 4.5) < 1e-9)
    val (rc, rt) = level(Some("refdb"), None)
    assert(rc == 3L && math.abs(rt - 0.003) < 1e-9)
    // alice took the even-indexed orders calls: 0.5 + 0.7 + 0.9
    val (ac, at) = level(Some("shopdb"), Some("alice"))
    assert(ac == 3L && math.abs(at - 2.1) < 1e-9)
    val (bc, bt) = level(Some("shopdb"), Some("bob"))
    assert(bc == 3L && math.abs(bt - 2.4) < 1e-9)
    val (rac, rat) = level(Some("refdb"), Some("alice"))
    assert(rac == 3L && math.abs(rat - 0.003) < 1e-9)
    // unsampled fixture: the scaled breakdown mirrors the raw one
    rows.foreach { r =>
      assert(r.getAs[Long]("cnt_scaled") == r.getAs[Long]("cnt"))
      assert(math.abs(r.getAs[Double]("total_time_scaled") -
        r.getAs[Double]("total_time")) < 1e-12)
    }
  }

  test("compareWindows ranks by load delta with the rate-scaled load plugged in") {
    import org.apache.spark.sql.functions._
    val df = wide.withColumn("ts_s", unix_timestamp(col("ts")))
    // split at epoch 1705312803: digest A (orders) has calls 0-2 before
    // (0.5+0.6+0.7 = 1.8) and 3-5 after (0.8+0.9+1.0 = 2.7); digest B
    // (nation) is entirely in the after-window (3 × 0.001). The load
    // expression is the same rate-scaled one profile() uses — unsampled
    // fixture, so greatest(rate_limit, 1) degenerates to 1.
    val cmp = Qan.compareWindows(df, "digest", "ts_s",
      col("query_time") * greatest(col("rate_limit"), lit(1L)),
      lit(1705312803L)).collect()
    assert(cmp.length == 2)
    val top = cmp(0) // worst regression first: A's delta 0.9 > B's 0.003
    assert(math.abs(top.getAs[Double]("load_before") - 1.8) < 1e-9)
    assert(math.abs(top.getAs[Double]("load_after") - 2.7) < 1e-9)
    assert(math.abs(top.getAs[Double]("load_delta") - 0.9) < 1e-9)
    assert(top.getAs[Long]("cnt_before") == 3L)
    assert(top.getAs[Long]("cnt_after") == 3L)
    assert(math.abs(top.getAs[Double]("load_ratio") - 1.5) < 1e-9)
    val fresh = cmp(1) // new-after-split key: zero before, null ratio
    assert(fresh.getAs[Long]("cnt_before") == 0L)
    assert(fresh.getAs[Long]("cnt_after") == 3L)
    assert(math.abs(fresh.getAs[Double]("load_before")) < 1e-12)
    assert(math.abs(fresh.getAs[Double]("load_delta") - 0.003) < 1e-9)
    assert(fresh.isNullAt(fresh.fieldIndex("load_ratio")))
  }

  test("apdex scores the three latency classes and ranks worst first") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // key a at t=50: 10 satisfied, 60 tolerating (50,200], 300 frustrated
    // → (1 + 0.5)/3 = 0.5; key b: all satisfied → 1.0; a sorts first
    val df = Seq(("a", 10.0), ("a", 60.0), ("a", 300.0),
      ("b", 10.0), ("b", 20.0)).toDF("k", "lat")
    val out = Qan.apdex(df, "k", col("lat"), t = 50.0).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b"))
    val a = out(0)
    assert(a.getAs[Long]("cnt") == 3L)
    assert(a.getAs[Long]("satisfied") == 1L)
    assert(a.getAs[Long]("tolerating") == 1L)
    assert(a.getAs[Double]("apdex") == 0.5)
    assert(out(1).getAs[Double]("apdex") == 1.0)
    // boundary: exactly t is satisfied, exactly 4t is tolerating
    val edge = Qan.apdex(Seq(("e", 50.0), ("e", 200.0)).toDF("k", "lat"),
      "k", col("lat"), t = 50.0).collect().head
    assert(edge.getAs[Long]("satisfied") == 1L)
    assert(edge.getAs[Long]("tolerating") == 1L)
  }

  test("firstSeen flags keys with no occurrence before the cutoff") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a spans the cutoff (old), b starts after it (new), c ends before
    val df = Seq(("a", 1L), ("a", 9L), ("b", 10L), ("b", 12L), ("c", 2L))
      .toDF("k", "ts")
    val out = Qan.firstSeen(df, "k", col("ts"), lit(8L)).collect()
    // new first, then newest-first within each flag class
    assert(out.map(_.getString(0)).toSeq == Seq("b", "c", "a"))
    val b = out(0)
    assert(b.getAs[Boolean]("is_new"))
    assert(b.getAs[Long]("first_seen") == 10L)
    assert(b.getAs[Long]("last_seen") == 12L)
    assert(b.getAs[Long]("cnt") == 2L)
    assert(!out(1).getAs[Boolean]("is_new") && !out(2).getAs[Boolean]("is_new"))
    // boundary: first occurrence exactly AT the cutoff counts as new
    val at = Qan.firstSeen(Seq(("x", 8L)).toDF("k", "ts"),
      "k", col("ts"), lit(8L)).collect().head
    assert(at.getAs[Boolean]("is_new"))
  }

  test("latency sketch at rest: per-day append merges to the direct build, p95 bounded") {
    import org.apache.spark.sql.functions._
    val sketch = Qan.latencySketch(wide)
    // the at-rest contract: the union of per-day sketch frames (what
    // daily appends accumulate) answers EXACTLY like a fresh build —
    // counts are integers merging by addition
    val days = sketch.select("day").distinct().collect().map(_.getString(0))
    val viaAppends = days.map(d => sketch.filter(col("day") === d))
      .reduce(_ union _)
    val got = Qan.latencyPercentilesFrom(viaAppends)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val direct = Qan.latencyPercentilesFrom(sketch)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got == direct)
    // accuracy against the exact order statistics of the fixture's
    // hand-built latencies (digest A: 0.5..1.0 s): the q91 bucket
    // guarantee at µs granularity
    val byDigest = wide.select("digest", "query_time").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1)).sorted).toMap
    for ((dig, (n, p50, p95, p99)) <- got; vs = byDigest(dig)) {
      assert(n == vs.length)
      for ((est, p) <- Seq((p50, 50), (p95, 95), (p99, 99))) {
        val exact = vs((vs.length * p + 99) / 100 - 1)
        assert(est <= exact + 1e-4, s"$dig p$p: $est above exact $exact")
        assert(exact < est * 1.125 + 1e-4,
          s"$dig p$p: $est undershoots exact $exact beyond the bucket bound")
      }
    }
    // a day-sliced report reads only that day's sketch rows — and equals
    // a direct build over only that day's fact rows
    val d0 = days.min
    val sliced = Qan.latencyPercentilesFrom(sketch.filter(col("day") === d0))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val directDay = Qan.latencyPercentilesFrom(
        Qan.latencySketch(wide.filter(to_date(col("ts")).cast("string") === d0)))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(sliced == directDay)
  }

  test("latencyAnomaly: median/MAD flags the spike hour and nothing else") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // one event per hour, load == query_time: hours 0-8 climb 10..18
    // (median 14.5 over the ten hourly loads incl. the spike), hour 9
    // is a 100-load spike. MAD = 2.5, so only |100 - 14.5| > 7.5 flags.
    val rows = ((0 to 8).map(h => (h, 10.0 + h)) :+ (9, 100.0)).map {
      case (h, qt) => ("qa", f"2024-01-15 $h%02d:10:00", qt)
    }
    val wideMini = rows.toDF("digest", "tss", "query_time")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val out = Qan.latencyAnomaly(wideMini).orderBy("hr").collect()
    assert(out.length == 10)
    assert(out.forall(_.getAs[Double]("med") == 14.5))
    assert(out.forall(_.getAs[Double]("mad") == 2.5))
    val flagged = out.filter(_.getAs[Boolean]("is_anomaly"))
      .map(_.getAs[Double]("load")).toSeq
    assert(flagged == Seq(100.0), s"only the spike should flag, got $flagged")
    // a flat digest (MAD 0) flags nothing: zero deviation is not > 0
    val flat = (0 to 5).map(h => ("qb", f"2024-01-15 $h%02d:00:00", 1.0))
      .toDF("digest", "tss", "query_time")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    assert(Qan.latencyAnomaly(flat).filter(col("is_anomaly")).count() == 0)
  }

  test("psiDrift: identical halves score 0, a shifted half scores high") {
    import spark.implicits._
    // group "same": ref and cur both uniform over bins {0,1} → p=q → 0
    // group "shift": ref all in bin 0, cur all in bin 2 → large PSI
    val rows =
      (0 until 40).map(i => ("same", (i % 2) * 50.0 + 10.0, i < 20)) ++
      (0 until 40).map(i => ("shift",
        if (i < 20) 10.0 else 110.0, i < 20))
    val df = rows.toDF("g", "value", "is_ref")
    val out = Qan.psiDrift(df, "g", "value", "is_ref", binWidth = 50.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("same") == ((20L, 20L, 0.0)))
    val (nr, nc, psi) = out("shift")
    assert(nr == 20L && nc == 20L)
    // hand value: bins {0,2}, B=2; p=(21/22, 1/22), q=(1/22, 21/22)
    // psi = 2 * (20/22) * ln 21 ≈ 5.5352
    val expect = 2.0 * (20.0 / 22.0) * math.log(21.0)
    assert(psi == math.rint(expect * 1e4) / 1e4, s"psi=$psi")
  }

  test("psiDrift: one-sided bins survive via add-one smoothing") {
    import spark.implicits._
    // cur has an empty slice (all rows are ref in bin 0 plus one cur in
    // bin 1): no log blows up, psi is finite
    val df = ((0 until 10).map(i => ("g", 1.0, true)) :+ (("g", 60.0, false)))
      .toDF("g", "value", "is_ref")
    val out = Qan.psiDrift(df, "g", "value", "is_ref", binWidth = 50.0)
      .collect()
    assert(out.length == 1 && !out.head.getDouble(3).isNaN &&
      !out.head.getDouble(3).isInfinite)
  }

  test("ksDrift: hand-computed exact D numerator, argmax at the smallest tied value") {
    import spark.implicits._
    // ref {1,2,3}, cur {3,4}: cum cross products |f1*n2 - f2*n1| over
    // pooled values = 2, 4, 3, 0 → D_num=4 at u=2, ks=4/6
    val df = Seq(("a", 1L, true), ("a", 2L, true), ("a", 3L, true),
        ("a", 3L, false), ("a", 4L, false))
      .toDF("g", "u", "is_ref")
    val out = Qan.ksDrift(df, "g", "u", "is_ref").collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4), r.getLong(5)) ==
      (("a", 3L, 2L, 4L, 0.666667, 2L)), r)
  }

  test("ksDrift: identical samples score exactly 0") {
    import spark.implicits._
    val rows = (0 until 30).map(i => ("g", (i % 5).toLong, i < 15))
    val out = Qan.ksDrift(rows.toDF("g", "u", "is_ref"), "g", "u", "is_ref")
      .collect().head
    assert(out.getLong(3) == 0L && out.getDouble(4) == 0.0, out)
  }

  test("paretoLoad includes the class that crosses the threshold") {
    import spark.implicits._
    // loads 50/30/15/5: cum shares 0.5, 0.8, 0.95, 1.0 — at t=0.9 the
    // crossing class is c (prev share 0.8 < 0.9), d is out
    val df = Seq(("a", 50.0), ("b", 30.0), ("c", 15.0), ("d", 5.0))
      .toDF("cls", "load")
    val out = Qan.paretoLoad(df, "cls", org.apache.spark.sql.functions.col("load"),
      threshold = 0.9).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(out.last.getDouble(3) == 0.95) // head covers ≥ threshold
    // a single dominant class still returns itself, never an empty head
    val one = Qan.paretoLoad(
      Seq(("big", 99.0), ("small", 1.0)).toDF("cls", "load"),
      "cls", org.apache.spark.sql.functions.col("load"), threshold = 0.8)
      .collect()
    assert(one.map(_.getString(0)).toSeq == Seq("big"))
  }
}
