package graft.sources

import graft.SparkTestSession
import graft.slowlog.{Fingerprint, SlowLogSource, SlowLogTable}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Integration test (SURVEY.md M3): fixture log → parse → flatten → JDBC
  * batch write (DuckDB as the offline ClickHouse stand-in) → read back →
  * counts and digests match. */
class JdbcSinkSpec extends AnyFunSuite with SparkTestSession {

  private val driver = "org.duckdb.DuckDBDriver"

  test("ingest round-trip: log → wide table → JDBC → read back") {
    val dir = Files.createTempDirectory("graft-jdbc")
    val logPath = dir.resolve("slow001.log")
    Files.writeString(logPath, graft.slowlog.SlowLogFixtures.slow001)
    val url = s"jdbc:duckdb:${dir.resolve("sink.db")}"

    val wide = SlowLogTable.flatten(SlowLogSource.readRaw(spark, logPath.toString))

    // Embedded DuckDB = single writer; generic JDBC dialect maps BooleanType
    // to BIT(1), which DuckDB rejects — give the bool columns explicit types.
    val boolDdl = (Seq("admin") ++ SlowLogTable.BoolKeys.map(_.toLowerCase))
      .map(c => s"$c BOOLEAN").mkString(", ")
    JdbcSink.write(wide.drop("file"), url, "queries", driver,
      mode = "overwrite", batchSize = 10000, numPartitions = Some(1),
      createTableColumnTypes = Some(boolDdl))

    val back = JdbcSink.read(spark, url, "queries", driver)
    assert(back.count() == 3L)
    val digests = back.select("digest").collect().map(_.getString(0)).sorted
    val expected = Seq(
      "select o_orderkey, o_totalprice from orders where o_custkey in(?+) and o_orderstatus = ?",
      "insert into audit (a, b) values(?+)",
      "administrator command: Quit").map(Fingerprint.digestId).sorted
    assert(digests.toSeq == expected)
    // metric fidelity through the sink
    val r = back.filter("full_scan").collect()
    assert(r.length == 1)
    assert(r.head.getAs[Number]("innodb_io_r_bytes").longValue == 1638400L)
  }

  test("overwrite with truncate=true keeps the pre-created table, drop-recreate does not") {
    // the ClickHouse overwrite contract, executable on DuckDB: a table
    // prepared out-of-band (custom column type standing in for the
    // MergeTree ENGINE clause Spark can't emit) must SURVIVE an
    // overwrite run when truncate is requested
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-jdbc-trunc")
    val url = s"jdbc:duckdb:${dir.resolve("t.db")}"
    // embedded DuckDB is single-writer: under full-suite load a raw
    // open can race Spark's just-released write handle on the same
    // file (transient startup deserialize error) — retry briefly
    def withConn[A](f: java.sql.Connection => A): A = {
      var last: Throwable = null
      for (_ <- 1 to 10) {
        try {
          val c = java.sql.DriverManager.getConnection(url)
          try return f(c) finally c.close()
        } catch {
          case e: java.sql.SQLException => last = e; Thread.sleep(500)
        }
      }
      throw last
    }
    // Spark's own JDBC opens (resolveTable / savePartition) race the
    // same single-writer file under full-suite load — same transient
    // startup deserialize error, same brief retry
    def retryJdbc[A](f: => A): A = {
      var last: Throwable = null
      for (_ <- 1 to 10) {
        try return f
        catch {
          case e: Throwable
              if Option(e.getMessage).exists(m =>
                m.contains("Failed to deserialize") ||
                  m.contains("Serialization Error")) =>
            last = e; Thread.sleep(500)
        }
      }
      throw last
    }
    def colType(): String = withConn { c =>
      val rs = c.createStatement().executeQuery(
        "SELECT data_type FROM information_schema.columns " +
          "WHERE table_name = 't1' AND column_name = 'v'")
      rs.next(); rs.getString(1)
    }
    withConn(_.createStatement().execute(
      "CREATE TABLE t1 (k BIGINT, v DECIMAL(20,3))"))
    val df = Seq((1L, 2.5), (2L, 3.5)).toDF("k", "v")
    retryJdbc(JdbcSink.write(df, url, "t1", driver, mode = "overwrite",
      numPartitions = Some(1), truncate = true))
    assert(colType() == "DECIMAL(20,3)", "truncate path dropped the table")
    assert(retryJdbc(JdbcSink.read(spark, url, "t1", driver).count()) == 2L)
    // idempotent re-run: truncated, not appended
    retryJdbc(JdbcSink.write(df, url, "t1", driver, mode = "overwrite",
      numPartitions = Some(1), truncate = true))
    assert(retryJdbc(JdbcSink.read(spark, url, "t1", driver).count()) == 2L)
    // the default overwrite re-creates with Spark's own types — the
    // behavior that is INVALID on ClickHouse, hence the Ingest mapping
    retryJdbc(JdbcSink.write(df, url, "t1", driver, mode = "overwrite",
      numPartitions = Some(1)))
    assert(colType() != "DECIMAL(20,3)")
  }

  test("Ingest maps overwrite to truncate for ClickHouse DSNs only") {
    assert(graft.Ingest.truncateForOverwrite("jdbc:clickhouse://h:8123/db", "overwrite"))
    assert(graft.Ingest.truncateForOverwrite("jdbc:ch://h:8123/db", "Overwrite"))
    assert(!graft.Ingest.truncateForOverwrite("jdbc:clickhouse://h:8123/db", "append"))
    assert(!graft.Ingest.truncateForOverwrite("jdbc:duckdb:/tmp/x.db", "overwrite"))
  }
}
