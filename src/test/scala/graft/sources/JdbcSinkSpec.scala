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
}
