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

  // -- grammar fuzz (r15 verdict stretch 9): the 65 goldens pin known
  // shapes; a structured generator walks the combinations the hand
  // corpus can't — literals × IN-lists × VALUES × comments × charset/
  // hex/bit introducers × unicode × quoted identifiers — asserting the
  // two load-bearing invariants on every generated statement:
  // idempotence (fp∘fp = fp) and codegen parity (expression ≡ Scala).
  private val sqlGrammar: org.scalacheck.Gen[String] = {
    import org.scalacheck.Gen
    val ident = Gen.oneOf("t", "orders", "`db`.`tbl`", "c1", "v",
      "`weird col`", "T2")
    val numLit = Gen.oneOf("42", "-7", "3.14", "1e6", "1.5e-3", "0xFF",
      "0b1010", "x'4D79'", "X'4d'", "b'1010'", "B'01'")
    val strLit = Gen.oneOf("'str'", "'it''s'", "\"dq\"", "'héllo wörld'",
      "'multi word'", "_utf8'x'", "_latin1'abc'", "N'nat'")
    val lit = Gen.oneOf(numLit, strLit)
    val inList = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, lit))
      .map(_.mkString("(", ", ", ")"))
    val comment = Gen.oneOf("/* c */", "/*comment*/", "-- eol\n", "# h\n")
    val cond = for { i <- ident; op <- Gen.oneOf("=", "<", ">=", "<>", "LIKE")
                     l <- lit } yield s"$i $op $l"
    val inCond = for { i <- ident; il <- inList } yield s"$i IN $il"
    val preds = Gen.choose(1, 3)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(cond, inCond)))
      .map(_.mkString(" AND "))
    val select = for {
      c <- Gen.option(comment); i <- ident; tbl <- ident; w <- preds
      ob <- Gen.option(Gen.const("ORDER BY 1 DESC LIMIT 10"))
    } yield s"SELECT ${c.getOrElse("")}$i, count(*) FROM $tbl " +
      s"WHERE $w ${ob.getOrElse("")}"
    val valuesRow = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, lit))
      .map(_.mkString("(", ", ", ")"))
    val insert = for {
      tbl <- ident
      rows <- Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, valuesRow))
    } yield s"INSERT INTO $tbl (a, b) VALUES ${rows.mkString(", ")}"
    val update = for { tbl <- ident; l <- lit; w <- preds }
      yield s"UPDATE $tbl SET a = $l WHERE $w"
    Gen.frequency(4 -> select, 3 -> insert, 2 -> update,
      1 -> comment.flatMap(c => select.map(s => c + s)))
  }

  test("property: grammar fuzz — idempotence + codegen parity on 250+ statements") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val stmts = (0 until 300).flatMap(i =>
      sqlGrammar.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(stmts.size >= 250, s"generator starved: ${stmts.size}")
    val direct = stmts.map(graft.slowlog.Fingerprint.fingerprint)
    // idempotence on the Scala reference
    direct.zip(stmts).foreach { case (once, q) =>
      val twice = graft.slowlog.Fingerprint.fingerprint(once)
      assert(twice == once, s"not idempotent: $q -> $once -> $twice")
    }
    // codegen parity: one DataFrame pass through the expression
    val viaExpr = stmts.toDF("query")
      .select(SlowLogTable.fingerprintCol(col("query")).as("f"))
      .collect().map(_.getString(0)).toSeq
    viaExpr.zip(direct).zip(stmts).foreach { case ((e, s), q) =>
      assert(e == s, s"codegen drift: $q -> expr=$e scala=$s")
    }
  }
}
