package graft.functions

import graft.SparkTestSession
import graft.sources.Amplify
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tests for the UDAF surface and load amplification (R11). */
class FunctionsSpec extends AnyFunSuite with SparkTestSession {

  test("UnicodeNormExpr: NFC composes, NFD decomposes, NFKC folds compatibility") {
    import spark.implicits._
    import graft.operators.TextAnalysis.normalizeUnicode
    // decomposed e + U+0301, the NFKC-only ligature U+FB01, fullwidth 4
    val df = Seq(("e\u0301", "nfc"), ("caf\u00e9", "nfd"),
        ("\ufb01le \uff14", "nfkc"), (null: String, "null")).toDF("s", "tag")
    val got = df.select(col("tag"),
        normalizeUnicode(col("s")).as("nfc"),
        normalizeUnicode(col("s"), "NFD").as("nfd"),
        normalizeUnicode(col("s"), "NFKC").as("nfkc"))
      .collect().map(r => r.getString(0) ->
        (Option(r.getString(1)), Option(r.getString(2)),
          Option(r.getString(3)))).toMap
    assert(got("nfc")._1.get == "\u00e9")            // composed
    assert(got("nfc")._2.get == "e\u0301")           // NFD keeps it apart
    assert(got("nfd")._2.get == "cafe\u0301")        // NFD decomposes the e-acute
    assert(got("nfkc")._1.get == "\ufb01le \uff14") // NFC keeps compat chars
    assert(got("nfkc")._3.get == "file 4")          // NFKC folds them
    assert(got("null") == ((None, None, None)))     // null in, null out
    // already-normalized ASCII is the identity (the fast path)
    val ascii = Seq("plain ascii").toDF("s")
      .select(normalizeUnicode(col("s")).as("n")).collect().head.getString(0)
    assert(ascii == "plain ascii")
    // invalid form rejected at construction
    intercept[IllegalArgumentException] {
      normalizeUnicode(col("s"), "NFX")
    }
  }

  test("Welford variance matches built-in var_samp") {
    val df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val welford = udaf(WelfordVariance)
    val row = df.agg(
      welford(col("c_acctbal")).as("w"),
      var_samp(col("c_acctbal")).as("v")).collect().head
    val (w, v) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(w - v) / math.abs(v) < 1e-9, s"welford=$w var_samp=$v")
  }

  test("Welford handles tiny groups (n<2 -> null, matching var_samp)") {
    import spark.implicits._
    val welford = udaf(WelfordVariance)
    val rows = Seq(("a", Some(1.0)), ("b", Some(2.0)), ("b", Some(4.0)),
        ("b", None)) // NULL input must be skipped, not counted as 0.0
      .toDF("k", "x")
      .groupBy("k").agg(welford(col("x")).as("v"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(rows("a").isEmpty)
    assert(math.abs(rows("b").get.asInstanceOf[Double] - 2.0) < 1e-12)
  }

  test("TopKSketch finds heavy hitters across partitions within error bounds") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // skewed stream: 3 heavy items + uniform noise tail
    val items = Seq.fill(1200)("alpha") ++ Seq.fill(700)("beta") ++
      Seq.fill(400)("gamma") ++ Seq.fill(900)(s"noise${rnd.nextInt(300)}")
    val df = rnd.shuffle(items).toDF("item").repartition(8) // force merges
    val topk = udaf(TopKSketch(5))
    val out = df.agg(topk(col("item")).as("top")).collect().head
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // the three true heavy hitters lead, in order
    assert(out.take(3).map(_._1) == Seq("alpha", "beta", "gamma"), out.toString)
    // counts overestimate by at most the reported error
    val exact = Map("alpha" -> 1200L, "beta" -> 700L, "gamma" -> 400L)
    out.take(3).foreach { case (i, c, e) =>
      assert(c >= exact(i) && c - e <= exact(i), s"$i: c=$c e=$e")
    }
  }

  test("Amplify replicates n-fold without shuffling the amplified side") {
    val df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    val amp = Amplify(df, 7)
    assert(amp.count() == df.count() * 7)
    assert(amp.columns.toSeq == df.columns.toSeq)
    val plan = amp.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }
}
