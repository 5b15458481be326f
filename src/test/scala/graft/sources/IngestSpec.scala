package graft.sources

import graft.{Ingest, SparkTestSession}
import graft.operators.Qan
import graft.slowlog.Fingerprint
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end CLI contract (VERDICT r02 item 2, SURVEY.md §3.1): one
  * command from a slow-log directory to a queried-back wide table, with
  * hand-computed value assertions on counts, digests, and the QAN
  * profile — the exact workflow a slowlog2clickhouse user runs. */
class IngestSpec extends AnyFunSuite with SparkTestSession {

  private val driver = "org.duckdb.DuckDBDriver"

  private val selectFp =
    "select o_orderkey, o_totalprice from orders where o_custkey in(?+) and o_orderstatus = ?"
  private val insertFp = "insert into audit (a, b) values(?+)"
  private val adminFp = "administrator command: Quit"

  test("parseArgs: reference-style flags, defaults, and validation") {
    val c = Ingest.parseArgs(Array(
      "-slowLogPath", "/logs", "-dsn", "jdbc:duckdb:/tmp/x.db",
      "-batchSize", "500", "-amplify", "3", "-mode", "overwrite"))
    assert(c.slowLogPath == "/logs")
    assert(c.dsn == "jdbc:duckdb:/tmp/x.db")
    assert(c.table == "queries") // default
    assert(c.batchSize == 500 && c.amplify == 3 && c.mode == "overwrite")
    intercept[IllegalArgumentException](Ingest.parseArgs(Array("-bogus", "x")))
    intercept[IllegalArgumentException](
      Ingest.parseArgs(Array("-slowLogPath", "/logs"))) // -dsn missing
  }

  test("-dsn jdbc:clickhouse: routes to the dialect + generated DDL path") {
    // the reference's actual sink, one flag away: the ClickHouse DSN
    // must (a) infer its driver class, (b) route through the
    // create-if-missing preparation whose statements are EXACTLY the
    // golden-tested generated DDL. Execution needs the live server +
    // driver jar (the documented offline boundary), so the proof is:
    // the first failure of a run against a ClickHouse DSN is the
    // driver-class load of the INFERRED class — not "cannot infer".
    val dir = Files.createTempDirectory("graft-ingest-ch")
    Files.writeString(dir.resolve("slow001.log"),
      graft.slowlog.SlowLogFixtures.slow001)
    val c = Ingest.parseArgs(Array("-slowLogPath", dir.toString,
      "-dsn", "jdbc:clickhouse://ch:8123/qan"))
    val e = intercept[ClassNotFoundException](Ingest.run(spark, c))
    assert(e.getMessage.contains("com.clickhouse.jdbc.ClickHouseDriver"))
    // the statements the preparation executes are the golden DDL —
    // asserted against the committed corpus's DDL section verbatim
    val wide = graft.slowlog.SlowLogTable.flatten(
      graft.slowlog.SlowLogSource.readRaw(spark, dir.toString))
    val stmts = ClickHouseSink.prepareStatements(wide.schema, "queries")
    val golden = new String(Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/clickhouse_wide_schema.golden").toURI)),
      java.nio.charset.StandardCharsets.UTF_8)
    val goldenDdl = golden
      .split("=== DDL ===\n")(1).split("\n=== INSERT ===")(0).trim
    assert(stmts == Seq(goldenDdl))
  }

  test("parquet DSN: one-command ingest to the date-partitioned warehouse") {
    val dir = Files.createTempDirectory("graft-ingest-pq")
    Files.writeString(dir.resolve("slow001.log"),
      graft.slowlog.SlowLogFixtures.slow001)
    val out = dir.resolve("warehouse").toString

    Ingest.run(spark, Ingest.parseArgs(Array(
      "-slowLogPath", dir.toString, "-dsn", s"parquet:$out",
      "-mode", "overwrite")))

    val back = Warehouse.read(spark, out)
    assert(back.count() == 3L)
    assert(back.columns.contains("q_date"), "warehouse layout is date-partitioned")
    assert(back.select("digest").collect().map(_.getString(0)).sorted.toSeq ==
      Seq(selectFp, insertFp, adminFp).map(Fingerprint.digestId).sorted)
    // the partition column actually landed as directory structure
    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("q_date="))
    assert(parts.nonEmpty, "no q_date= partition directories written")
  }

  test("parquet DSN in -tail mode: streamed files land and resume exactly-once") {
    import org.apache.spark.sql.streaming.Trigger
    val logDir = Files.createTempDirectory("graft-ingest-pqt")
    // sink + checkpoint must live OUTSIDE the tailed directory, or the
    // file source lists them as input
    val sinkDir = Files.createTempDirectory("graft-ingest-pqt-out")
    val out = sinkDir.resolve("wh").toString
    val ckpt = sinkDir.resolve("ckpt").toString
    Files.writeString(logDir.resolve("a.log"),
      graft.slowlog.SlowLogFixtures.slow001)

    def drain(): Unit = {
      val q = Ingest.runTail(spark, Ingest.parseArgs(Array(
        "-slowLogPath", logDir.toString, "-dsn", s"parquet:$out",
        "-tail", "-checkpoint", ckpt)), Some(Trigger.AvailableNow()))
      q.awaitTermination(60000); q.stop()
    }
    drain()
    assert(Warehouse.read(spark, out).count() == 3L)
    // restart with one NEW file: only its events are appended
    Files.writeString(logDir.resolve("b.log"),
      graft.slowlog.SlowLogFixtures.slow001)
    drain()
    assert(Warehouse.read(spark, out).count() == 6L,
      "restart must process exactly the new file")
  }

  test("one-command ingest: log dir → DuckDB → counts, digests, QAN profile") {
    val dir = Files.createTempDirectory("graft-ingest-cli")
    Files.writeString(dir.resolve("slow001.log"),
      graft.slowlog.SlowLogFixtures.slow001)
    val url = s"jdbc:duckdb:${dir.resolve("ingest.db")}"

    Ingest.run(spark, Ingest.parseArgs(Array(
      "-slowLogPath", dir.toString, "-dsn", url, "-mode", "overwrite")))

    val back = JdbcSink.read(spark, url, "queries", driver)
    assert(back.count() == 3L)
    assert(back.select("digest").collect().map(_.getString(0)).sorted.toSeq ==
      Seq(selectFp, insertFp, adminFp).map(Fingerprint.digestId).sorted)

    // QAN profile over the round-tripped table, worst-first by total time:
    // INSERT (1.5 s) > SELECT (0.003218 s) > admin Quit (0.00001 s).
    val prof = Qan.profile(back).collect()
    assert(prof.map(_.getAs[String]("digest")).toSeq ==
      Seq(insertFp, selectFp, adminFp).map(Fingerprint.digestId))
    val insertRow = prof(0)
    assert(insertRow.getAs[Number]("cnt").longValue == 1L)
    assert(math.abs(insertRow.getAs[Number]("total_time").doubleValue - 1.5) < 1e-9)
    assert(insertRow.getAs[Number]("rows_examined").longValue == 500000L)
    assert(insertRow.getAs[Number]("n_users").longValue == 1L)
    assert(insertRow.getAs[String]("fingerprint") == insertFp)
    val selectRow = prof(1)
    assert(math.abs(selectRow.getAs[Number]("total_time").doubleValue - 0.003218) < 1e-9)
    assert(selectRow.getAs[Number]("rows_sent").longValue == 10L)

    // metric fidelity through the sink (no explicit DDL: DuckDbDialect
    // maps BooleanType natively)
    val full = back.filter("full_scan").collect()
    assert(full.length == 1)
    assert(full.head.getAs[Number]("innodb_io_r_bytes").longValue == 1638400L)
  }

  test("-tail follows the log dir with checkpointed exactly-once resume") {
    val dir = Files.createTempDirectory("graft-ingest-tail")
    val ckpt = Files.createTempDirectory("graft-ingest-ckpt").toString
    // the sink db must live OUTSIDE the streamed directory — the file
    // source has no glob filter, so a sink inside it would be ingested
    // as a log on the next drain
    val sinkDir = Files.createTempDirectory("graft-ingest-sink")
    val url = s"jdbc:duckdb:${sinkDir.resolve("tail.db")}"
    val conf = Ingest.parseArgs(Array(
      "-slowLogPath", dir.toString, "-dsn", url, "-tail", "-checkpoint", ckpt))

    def drainOnce(): Unit = {
      val q = Ingest.runTail(spark, conf, Some(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      q.awaitTermination(60000); q.stop()
    }

    Files.writeString(dir.resolve("a.log"),
      graft.slowlog.SlowLogFixtures.slow001)
    drainOnce()
    assert(JdbcSink.read(spark, url, "queries", driver).count() == 3L)

    // restart: a.log is in the checkpoint, only b.log's events append
    Files.writeString(dir.resolve("b.log"),
      graft.slowlog.SlowLogFixtures.slow001)
    drainOnce()
    assert(JdbcSink.read(spark, url, "queries", driver).count() == 6L)

    intercept[IllegalArgumentException](Ingest.parseArgs(Array(
      "-slowLogPath", dir.toString, "-dsn", url, "-tail"))) // no checkpoint
  }

  test("-amplify N replicates the load N times (reference re-ingest flag)") {
    val dir = Files.createTempDirectory("graft-ingest-amp")
    Files.writeString(dir.resolve("slow001.log"),
      graft.slowlog.SlowLogFixtures.slow001)
    val url = s"jdbc:duckdb:${dir.resolve("amp.db")}"

    Ingest.run(spark, Ingest.parseArgs(Array(
      "-slowLogPath", dir.toString, "-dsn", url, "-amplify", "3",
      "-mode", "overwrite")))

    val back = JdbcSink.read(spark, url, "queries", driver)
    assert(back.count() == 9L)
    val prof = Qan.profile(back).collect()
    assert(prof(0).getAs[Number]("cnt").longValue == 3L)
    assert(math.abs(prof(0).getAs[Number]("total_time").doubleValue - 4.5) < 1e-9)
  }
}
