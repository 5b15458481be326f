package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PII scrub contract ([[Pii]]): per-class detection on hand-built
  * vectors (octet-validated IPv4 negatives, phone/SSN disjointness),
  * redaction order + idempotence, Luhn known vectors, and the map-only
  * plan shape. */
class PiiSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def counts(text: String): Map[String, Long] = {
    val r = Seq(text).toDF("t")
      .select(Pii.piiCounts(col("t")).as("c")).select("c.*").collect()(0)
    r.schema.fieldNames.map(n => n -> r.getAs[Long](n)).toMap
  }

  test("piiCounts: email vectors incl. dots, plus-addressing, subdomains") {
    assert(counts("mail first.last+tag@sub.mail.example.com end")("n_email") == 1L)
    assert(counts("u_1%x@a-b.co here")("n_email") == 1L)
    assert(counts("no at sign example.com")("n_email") == 0L)
  }

  test("piiCounts: IPv4 octet validation — 256/999 are NOT addresses") {
    assert(counts("a 10.20.30.40 b")("n_ipv4") == 1L)
    assert(counts("edge 0.0.0.0 and 255.255.255.255")("n_ipv4") == 2L)
    assert(counts("bad 256.1.1.1 worse 999.88.77.66")("n_ipv4") == 0L)
    assert(counts("short 1.2.3 long 1.2.3.4.5")("n_ipv4") == 1L) // the 4-quad inside
  }

  test("piiCounts: phone and SSN shapes are mutually disjoint") {
    val phone = counts("call 555-123-4567 now")
    assert(phone("n_phone") == 1L && phone("n_ssn") == 0L)
    val ssn = counts("id 123-45-6789 end")
    assert(ssn("n_ssn") == 1L && ssn("n_phone") == 0L)
  }

  test("luhnValid: known card vectors") {
    val out = Seq("4111111111111111", "4012888888881881", "4111111111111112")
      .toDF("cc").select(col("cc"), Pii.luhnValid(col("cc")).as("ok"))
      .orderBy("cc").collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out("4111111111111111") && out("4012888888881881"))
    assert(!out("4111111111111112"))
  }

  test("luhnValidSql mirrors luhnValid on the synthetic corpus slice") {
    // the q277 contract in miniature: Spark expression ≡ the generated
    // SQL evaluated BY SPARK (same arithmetic, so any engine running
    // the SQL agrees)
    val df = Seq.tabulate(50)(i => f"4${i * 7919}%015d").toDF("cc")
    val viaExpr = df.select(col("cc"), Pii.luhnValid(col("cc")).as("ok"))
    val viaSql = df.selectExpr("cc",
      Pii.luhnValidSql("cc").replace("INTEGER", "INT") + " AS ok")
    assert(viaExpr.except(viaSql).isEmpty && viaSql.except(viaExpr).isEmpty)
  }

  test("redactPii: class order, completeness, idempotence") {
    val dirty = "u@x.io card 4111111111111111 id 123-45-6789 " +
      "tel 555-123-4567 ip 10.0.0.1 bad 999.1.1.1"
    val once = Seq(dirty).toDF("t")
      .select(Pii.redactPii(col("t")).as("r")).collect()(0).getString(0)
    assert(once == "<EMAIL> card <CC> id <SSN> tel <PHONE> ip <IP> bad 999.1.1.1")
    val twice = Seq(once).toDF("t")
      .select(Pii.redactPii(col("t")).as("r")).collect()(0).getString(0)
    assert(twice == once, "redaction must be idempotent")
  }

  test("synthetic corpus: planted pieces detected, invalid IP rejected") {
    val docs = Seq.tabulate(60)(i => (i.toLong, s"doc text $i")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        Pii.syntheticPiiText(col("doc_id"), col("text")).as("dirty"))
      .select(col("doc_id"), Pii.piiCounts(col("dirty")).as("c"))
      .agg(sum("c.n_cc").as("cc"), sum("c.n_ipv4").as("ip"),
        sum("c.n_email").as("em")).collect()(0)
    assert(out.getLong(0) == 60L, "every doc carries a card number")
    // ips planted for ~2/3 of docs but only the h%3==0 third is VALID
    assert(out.getLong(1) > 10L && out.getLong(1) < 30L,
      s"only the valid-IP third may match, got ${out.getLong(1)}")
    assert(out.getLong(2) > 20L && out.getLong(2) < 40L)
  }

  test("detection + redaction are map-only (no exchange)") {
    val docs = Seq((1L, "a u@x.io b")).toDF("doc_id", "text")
    val plan = docs.select(col("doc_id"),
        Pii.piiCounts(col("text")).as("c"),
        Pii.redactPii(col("text")).as("r"),
        Pii.piiHits(col("text")).as("n"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"PII scan shuffled:\n$plan")
  }
}
