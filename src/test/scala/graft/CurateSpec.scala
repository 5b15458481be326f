package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The curation CLI end-to-end on a hand-checkable fixture: every
  * stage of the recipe (blocklist, quality, URL dedup, exact dedup,
  * near dedup, cap, HRW shards) attritions exactly the planted docs,
  * and the scorecard ledgers each stage. */
class CurateSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def prose(stem: String): String =
    (0 until 40).map(i => s"the $stem word$i is here and").mkString(" ")

  test("fixture run: planted docs attrition at the right stage; shards cover the kept set") {
    val in = Files.createTempDirectory("graft-curate-in").toString
    val out = Files.createTempDirectory("graft-curate-out").toString + "/c"
    val docs = Seq(
      // a.com: 1+2 are canonical-URL twins of one fetch; 3 is an exact
      // text dup of 1; 4 is a near dup (one-word mutation); 5 distinct
      (1L, "https://a.com/p/1?utm_source=x", prose("alpha")),
      (2L, "https://A.COM/p/1#f", prose("beta")),
      (3L, "https://a.com/p/3", prose("alpha")),
      (4L, "https://a.com/p/4",
        prose("alpha").replace("word7", "changed7")),
      (5L, "https://a.com/p/5", prose("gamma")),
      // blocked.org: governance-rejected whole domain
      (6L, "https://blocked.org/p/6", prose("delta")),
      (7L, "https://blocked.org/p/7", prose("epsilon")),
      // b.net: one good doc, one punctuation-spam doc the quality
      // gate drops
      (8L, "https://b.net/p/8", prose("zeta")),
      (9L, "https://b.net/p/9", ";;;;; !!!! ???? ;;;; ###" * 10))
      .toDF("doc_id", "url", "text")
    docs.write.mode("overwrite").parquet(in)
    val c = Curate.parseArgs(Array(
      "-in", in, "-out", out, "-url", "url",
      "-threshold", "0.6", "-cap", "2", "-shards", "3",
      "-minQuality", "0.35", "-blocklist", "blocked.org"))
    val card = Curate.run(spark, c).collect()
      .map(r => r.getString(0) -> r).toMap
    val kept = spark.read.parquet(out)
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    // a.com: twins 1/2 -> one; 3 exact-dups whichever of 1/2 won (same
    // text as 1; if 2 won, 3 survives exact but near-dups 2) — either
    // way the near stage leaves ONE alpha-family doc; 5 survives; cap=2
    assert(keptIds.intersect(Set(1L, 2L, 3L, 4L)).size == 1,
      s"alpha family not collapsed: $keptIds")
    assert(keptIds.contains(5L))
    assert(!keptIds.contains(6L) && !keptIds.contains(7L), "blocklist leaked")
    assert(keptIds.contains(8L) && !keptIds.contains(9L), "quality gate")
    // scorecard ledgers the attrition
    val a = card("a.com")
    assert(a.getAs[Long]("n_raw") == 5 && a.getAs[Long]("n_url_uniq") == 4)
    assert(a.getAs[Long]("n_kept") == 2)
    val b = card("blocked.org")
    assert(b.getAs[Long]("n_raw") == 2 && b.getAs[Long]("n_allowed") == 0 &&
      b.getAs[Long]("n_kept") == 0)
    val bn = card("b.net")
    assert(bn.getAs[Long]("n_quality") == 1 && bn.getAs[Long]("n_kept") == 1)
    // shards partition the kept set; routing is the deterministic HRW
    assert(kept.select("shard").distinct().collect()
      .map(_.getInt(0)).forall(s => s >= 0 && s < 3))
    val re = spark.read.parquet(out)
      .withColumn("re", graft.operators.Pipeline.rendezvousShard(
        col("doc_id").cast("string"), 3))
    assert(re.filter(col("shard") =!= col("re")).count() == 0)
  }

  test("parseArgs: url-vs-synthesize exclusivity and bounds") {
    intercept[IllegalArgumentException] {
      Curate.parseArgs(Array("-in", "x", "-out", "y"))
    }
    intercept[IllegalArgumentException] {
      Curate.parseArgs(Array("-in", "x", "-out", "y", "-url", "u",
        "-synthesize"))
    }
    intercept[IllegalArgumentException] {
      Curate.parseArgs(Array("-in", "x", "-out", "y", "-url", "u",
        "-cap", "0"))
    }
    val c = Curate.parseArgs(Array("-in", "x", "-out", "y", "-synthesize",
      "-blocklist", "a.com,b.org", "-minQuality", "0.3",
      "-robots", "a.com=/search,b.org=/"))
    assert(c.synthesize && c.blocklist == Seq("a.com", "b.org") &&
      c.minQuality.contains(0.3))
    assert(c.robots == Seq(("a.com", "/search"), ("b.org", "/")))
    intercept[IllegalArgumentException] {
      Curate.parseArgs(Array("-in", "x", "-out", "y", "-synthesize",
        "-robots", "nodelimiter"))
    }
  }

  test("-psl file swaps the eTLD+1 rule: com.br hosts roll up correctly") {
    val in = Files.createTempDirectory("graft-curate-psl-in").toString
    val out = Files.createTempDirectory("graft-curate-psl-out").toString + "/c"
    val pslFile = Files.createTempDirectory("graft-curate-psl").resolve("psl.dat")
    Files.writeString(pslFile,
      "// fixture snapshot\ncom\ncom.br\ngithub.io\n*.ck\n!www.ck\n")
    Seq(
      (1L, "https://a.example.com.br/p", prose("alpha")),
      (2L, "https://usera.github.io/p", prose("beta")),
      (3L, "https://userb.github.io/q", prose("gamma")),
      (4L, "https://c.other.com/r", prose("delta")))
      .toDF("doc_id", "url", "text")
      .write.mode("overwrite").parquet(in)
    val card = Curate.run(spark, Curate.parseArgs(Array(
      "-in", in, "-out", out, "-url", "url", "-psl", pslFile.toString)))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_raw")).toMap
    // the private suffix is the case the heuristic CANNOT express: it
    // would lump both github-pages users into one 'github.io' domain;
    // the PSL keeps each user a separate registrable domain
    assert(card == Map("example.com.br" -> 1L, "usera.github.io" -> 1L,
      "userb.github.io" -> 1L, "other.com" -> 1L))
  }

  test("robots flag drops disallowed paths in the run") {
    val in = Files.createTempDirectory("graft-curate-rob-in").toString
    val out = Files.createTempDirectory("graft-curate-rob-out").toString + "/c"
    Seq(
      (1L, "https://a.com/search?q=x", prose("alpha")),
      (2L, "https://a.com/article/1", prose("beta")),
      (3L, "https://b.net/search?q=y", prose("gamma")))
      .toDF("doc_id", "url", "text")
      .write.mode("overwrite").parquet(in)
    Curate.run(spark, Curate.parseArgs(Array(
      "-in", in, "-out", out, "-url", "url",
      "-robots", "a.com=/search")))
    val kept = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // a.com/search disallowed; b.net's /search has no rule and passes
    assert(kept == Set(2L, 3L))
  }

  test("-redactPii scrubs the kept text; without the flag PII passes through") {
    val in = Files.createTempDirectory("graft-curate-pii-in").toString
    val out = Files.createTempDirectory("graft-curate-pii-out").toString + "/c"
    Seq(
      (1L, "https://a.com/p/1",
        prose("alpha") + " mail me at jo@example.com or 555-123-4567"),
      (2L, "https://b.net/p/2", prose("beta") + " server 10.0.0.1 up"))
      .toDF("doc_id", "url", "text")
      .write.mode("overwrite").parquet(in)
    Curate.run(spark, Curate.parseArgs(Array(
      "-in", in, "-out", out, "-url", "url", "-redactPii")))
    val texts = spark.read.parquet(out)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(texts(1L).endsWith("mail me at <EMAIL> or <PHONE>"))
    assert(texts(2L).endsWith("server <IP> up"))
    // control: same run without the flag keeps the raw text
    val out2 = Files.createTempDirectory("graft-curate-pii-out2").toString + "/c"
    Curate.run(spark, Curate.parseArgs(Array(
      "-in", in, "-out", out2, "-url", "url")))
    val raw = spark.read.parquet(out2).filter(col("doc_id") === 1L)
      .select("text").collect()(0).getString(0)
    assert(raw.contains("jo@example.com"))
  }
}
