package graft.functions

import graft.SparkTestSession
import graft.slowlog.SlowLogTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd fingerprint must be indistinguishable from the
  * Scala-UDF path it replaced (§7.4 ledger lift) — every digest in the
  * warehouse depends on it. */
class FingerprintExprSpec extends AnyFunSuite with SparkTestSession {

  // representative query shapes: literals, IN-lists, VALUES, comments,
  // casing, unicode, embedded quotes — plus null and empty
  private val corpus = Seq(
    "SELECT c1, sum(v) FROM t WHERE k IN (1, 2, 3) AND s = 'x'",
    "INSERT INTO t(a, b) VALUES (1, 'two'), (3, 'four')",
    "select /* comment */ * from `db`.`tbl` where x = 0xFF",
    "UPDATE t SET a = 1.5e3 WHERE name = 'it''s'",
    "use `foo`",
    "CALL sp_cleanup(42)",
    "SELECT 'héllo wörld', \"double quoted\" FROM t",
    "",
    "   \n\t  "
  )

  test("expression output equals the UDF output over the corpus, null → null") {
    import spark.implicits._
    val df = (corpus.map(Option(_)) :+ None).toDF("query")
    val rows = df.select(
        SlowLogTable.fingerprintCol(col("query")).as("via_expr"),
        SlowLogTable.fingerprintUdf(col("query")).as("via_udf"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[String]("via_expr") == r.getAs[String]("via_udf"))
    }
    // the null input row produced null on both sides
    assert(rows.exists(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("fingerprint_native registers as a SQL function (extensions path)") {
    GraftExtensions.register(spark)
    import spark.implicits._
    corpus.filter(_.trim.nonEmpty).toDF("query").createOrReplaceTempView("fp_corpus")
    val viaSql = spark.sql(
      "SELECT fingerprint_native(query) AS f FROM fp_corpus")
      .collect().map(_.getString(0)).toSeq
    val direct = corpus.filter(_.trim.nonEmpty)
      .map(graft.slowlog.Fingerprint.fingerprint)
    assert(viaSql == direct)
  }

  test("flatten's digest is unchanged by the expression lift") {
    import spark.implicits._
    val events = Seq(
      (0L, new java.sql.Timestamp(1705312800000L), false,
        "SELECT * FROM orders WHERE k = 7", "u", "h", "db",
        null.asInstanceOf[String], None: Option[Long],
        Map("Query_time" -> 0.1), Map("Rows_sent" -> 1L),
        Map.empty[String, Boolean])
    ).toDF("offset", "ts", "admin", "query", "user", "host", "db",
      "rateType", "rateLimit", "timeMetrics", "numberMetrics", "boolMetrics")
    val viaExpr = SlowLogTable.flatten(events)
      .select("fingerprint", "digest").collect().head
    val viaUdf = SlowLogTable
      .flatten(events, SlowLogTable.fingerprintUdf(col("query")))
      .select("fingerprint", "digest").collect().head
    assert(viaExpr == viaUdf)
    assert(viaExpr.getString(0) == "select * from orders where k = ?")
  }
}
