package graft.sources

import graft.SparkTestSession
import graft.slowlog.{SlowLogSource, SlowLogTable}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Offline tests of everything the ClickHouse dialect GENERATES — type
  * mapping, quoting, MergeTree DDL, insert shape. The wire round-trip
  * needs a live server and so lives outside this environment (README);
  * the executable round-trip contract is proven against DuckDB in
  * JdbcSinkSpec with the same writer code path. */
class ClickHouseDialectSpec extends AnyFunSuite with SparkTestSession {

  test("dialect claims clickhouse URLs and quotes identifiers with backticks") {
    assert(ClickHouseDialect.canHandle("jdbc:clickhouse://ch:8123/qan"))
    assert(ClickHouseDialect.canHandle("jdbc:ch://ch:8123/qan"))
    assert(!ClickHouseDialect.canHandle("jdbc:duckdb:/tmp/x.db"))
    assert(ClickHouseDialect.quoteIdentifier("db") == "`db`")
    // embedded backtick escapes by doubling, not truncation
    assert(ClickHouseDialect.quoteIdentifier("we`ird") == "`we``ird`")
  }

  test("truncate contract: non-cascading, standard TRUNCATE TABLE statement") {
    // lets Spark's JDBC writer take the truncate=true overwrite path —
    // the only overwrite valid against a live server (drop-recreate
    // would re-issue an ENGINE-less CREATE TABLE)
    assert(ClickHouseDialect.isCascadingTruncateTable().contains(false))
    assert(ClickHouseDialect.getTruncateQuery("`queries`") ==
      "TRUNCATE TABLE `queries`")
  }

  test("type mapping covers the wide table and wraps nullable as Nullable(T)") {
    def t(dt: DataType, nullable: Boolean = false): String =
      ClickHouseDialect.clickHouseType(StructField("c", dt, nullable))
    assert(t(StringType) == "String")
    assert(t(BooleanType) == "UInt8")
    assert(t(LongType) == "Int64")
    assert(t(DoubleType) == "Float64")
    assert(t(FloatType) == "Float32")
    assert(t(IntegerType) == "Int32")
    assert(t(TimestampType) == "DateTime64(6)")
    assert(t(DateType) == "Date")
    assert(t(StringType, nullable = true) == "Nullable(String)")
    assert(t(TimestampType, nullable = true) == "Nullable(DateTime64(6))")
    // unmappable types fail loudly at DDL-generation time, not on insert
    intercept[IllegalArgumentException] {
      t(ArrayType(FloatType))
    }
  }

  test("wide-table DDL is a month-partitioned MergeTree ordered by (digest, ts)") {
    // the REAL wide schema, not a toy: flatten one event and generate
    val dir = Files.createTempDirectory("graft-ch-ddl")
    Files.writeString(dir.resolve("one.log"),
      """# Time: 2024-02-01T08:00:00.000000Z
        |# User@Host: u[u] @ h [10.0.0.1]
        |# Query_time: 0.100000  Lock_time: 0.000001 Rows_sent: 1  Rows_examined: 1
        |SET timestamp=1706774400;
        |SELECT 1;
        |""".stripMargin)
    val wide = SlowLogTable.flatten(SlowLogSource.readRaw(spark, dir.toString))
    val ddl = ClickHouseDialect.createTableDdl(wide.schema, "queries")
    assert(ddl.startsWith("CREATE TABLE IF NOT EXISTS `queries` ("))
    assert(ddl.contains("ENGINE = MergeTree()"))
    assert(ddl.contains("PARTITION BY toYYYYMM(ts)"))
    assert(ddl.contains("ORDER BY (`digest`, `ts`)"))
    // metric columns are coalesced NOT-NULL in flatten, so they map bare;
    // identity fields that can be absent (db/user) stay Nullable
    assert(ddl.contains("`query_time` Float64"))
    assert(!ddl.contains("`query_time` Nullable"))
    assert(ddl.contains("`rows_examined` Int64"))
    assert(ddl.contains("`db` Nullable(String)"))
    assert(ddl.contains("`rate_limit` Int64"))
    // every wide column is present exactly once
    wide.schema.fieldNames.foreach { f =>
      assert(ddl.linesIterator.count(_.contains(s"`$f` ")) == 1, f)
    }
  }

  test("insert SQL enumerates every column with a placeholder each") {
    val schema = StructType(Seq(
      StructField("digest", StringType, nullable = false),
      StructField("query_time", DoubleType, nullable = false)))
    assert(ClickHouseDialect.insertSql(schema, "queries") ==
      "INSERT INTO `queries` (`digest`, `query_time`) VALUES (?, ?)")
  }

  test("missing-table classifier matches ClickHouse UNKNOWN_TABLE shapes only") {
    import java.sql.SQLException
    assert(ClickHouseDialect.isObjectNotFoundException(
      new SQLException("Code: 60. DB::Exception: Table qan.queries doesn't exist. (UNKNOWN_TABLE)")))
    // error-code path, message-independent
    assert(ClickHouseDialect.isObjectNotFoundException(
      new SQLException("anything", "HY000", 60)))
    // unrelated server errors must NOT be classified as missing-table
    assert(!ClickHouseDialect.isObjectNotFoundException(
      new SQLException("Code: 47. DB::Exception: Missing columns: 'x'")))
  }

  test("golden conformance: generated DDL + INSERT for the full wide schema match the committed corpus") {
    // The offline integration boundary (VERDICT r13 stretch 9): no
    // network means no live ClickHouse round trip and no re-fetch of
    // the upstream README's DDL text, so the next-best proof is a
    // COMMITTED golden of the generated statements for the real wide
    // schema — any drift in flatten's schema, the type mapping, the
    // quoting, or the MergeTree clause fails this diff. Regenerate
    // deliberately via `runMain graft.DdlDump` when the schema is
    // MEANT to change.
    val dir = Files.createTempDirectory("graft-ch-golden")
    Files.writeString(dir.resolve("one.log"),
      """# Time: 2024-02-01T08:00:00.000000Z
        |# User@Host: u[u] @ h [10.0.0.1]
        |# Query_time: 0.100000  Lock_time: 0.000001 Rows_sent: 1  Rows_examined: 1
        |SET timestamp=1706774400;
        |SELECT 1;
        |""".stripMargin)
    val wide = SlowLogTable.flatten(SlowLogSource.readRaw(spark, dir.toString))
    val generated = "=== DDL ===\n" +
      ClickHouseDialect.createTableDdl(wide.schema, "queries") + "\n" +
      "=== INSERT ===\n" +
      ClickHouseDialect.insertSql(wide.schema, "queries") + "\n"
    val golden = new String(Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/clickhouse_wide_schema.golden").toURI)),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(generated == golden,
      "generated DDL/INSERT drifted from src/test/resources/" +
        "clickhouse_wide_schema.golden — regenerate via graft.DdlDump " +
        "only if the wide schema change is intentional")
  }
}
